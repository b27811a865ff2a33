package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Assoc, Dedup, DiskUsageOp, Graph, Hygiene, Joins, Layout, Multimodal, Similarity, Splits, Temporal, TextAnalysis}
import graft.SparkEntry._

/** deduplication rows — mechanically split out of the monolithic SparkEntry registry
  * (it had passed 10k lines); entry bodies and oracle SQL are unchanged,
  * shared helpers stay on [[graft.SparkEntry]]. The CoreSpec source
  * tripwire scans every file in this package.
  */
private[graft] object DedupQueries {
  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // -------- dedup (SURVEY §2.12)
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents")).orderBy(col("text_hash"))),
    "dedup_exact_normalized" -> ((s, dir) => {
      // normalization-robust exact dedup: the fixture corpus is ASCII, so
      // the Unicode variant surface is PLANTED deterministically in BOTH
      // engines (the pii-stats residue discipline) — residues 0/1/2 of
      // each 4-block render the same text as precomposed, combining-mark,
      // and uppercase+extra-space variants (collapsing to one key via
      // lower → ws-collapse → NFC), residue 3 stays unique
      val docs = t(s, dir, "documents")
      val g = ((col("doc_id") - pmod(col("doc_id"), lit(4))) / 4).cast("long")
      val variant = when(pmod(col("doc_id"), lit(4)) === 0,
          concat(lit("Café   doc "), g))
        .when(pmod(col("doc_id"), lit(4)) === 1,
          concat(lit("Café doc "), g))
        .when(pmod(col("doc_id"), lit(4)) === 2,
          concat(lit("CAFÉ doc "), g))
        .otherwise(concat(lit("unique "), col("doc_id")))
      Dedup.exactNormalized(docs.select(col("doc_id"), variant.as("text")))
        .orderBy(col("text_key"))
    }),
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 3, tau = 0.6)
        .orderBy(col("doc_a"), col("doc_b"))),
    "dedup_ngram_jaccard_pruned" -> ((s, dir) =>
      // document-frequency-pruned exact Jaccard: shingles in > 10 docs are
      // dropped BEFORE the self-join, capping the join's per-key fan-out (the
      // viral-shingle scale-killer); the oracle applies the identical df cap
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 3, tau = 0.6, maxDf = Some(10L))
        .orderBy(col("doc_a"), col("doc_b"))),
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(t(s, dir, "documents"), n = 3, tau = 0.6)
        .orderBy(col("doc_a"), col("doc_b"))),
    "dedup_simhash" -> ((s, dir) =>
      // direct single-stage plan: the fixture corpus is ~99.8% distinct
      // texts, where the dup-collapse rewrite is pure fixed overhead (≈6
      // extra tiny-stage exchanges that only amortize at cluster scale).
      // The collapse path — the library DEFAULT, structurally required on
      // dup-heavy corpora — is benched + oracle-checked separately as
      // dedup_simhash_collapse; both emit the identical exact-verified set.
      Dedup.simhashPairs(t(s, dir, "documents"), n = 3, tau = 0.6, maxHamming = 6,
          collapseExactDups = false)
        .orderBy(col("doc_a"), col("doc_b"))),
    "dedup_simhash_collapse" -> ((s, dir) =>
      // the dup-safe default: collapse exact duplicates to one
      // representative per distinct text BEFORE fingerprinting (bounding
      // the pigeonhole join's hot keys), expand groups back afterwards;
      // published as the shared [[simhashPairsArt]] artifact
      simhashPairsArt(s, dir)
        .orderBy(col("doc_a"), col("doc_b"))),
    "dedup_block_skew" -> ((s, dir) =>
      // candidate-pressure audit of the pigeonhole block join — the
      // operational go/no-go BEFORE running simhash dedup at corpus
      // scale: the hottest (blk, blk_val) keys, their member counts and
      // exact pair pressure n·(n−1)/2 (a viral key = a straggler task).
      // A 28-rows-per-doc map-side-combined count over the shared
      // raw-corpus fingerprint artifact (simhashSigArt — the build stays
      // priced by dedup_simhash's direct chain); raw corpus, no dup
      // collapse: the audit prices the join shape the direct plan faces,
      // and collapsing first would hide exactly the hot keys it exists
      // to surface.
      Dedup.blockSkewWith(simhashSigArt(s, dir), topN = 20)),
    "dedup_simhash_recall" -> ((s, dir) =>
      // prefilter-quality audit at the SHIPPED simhash config: recall of
      // the Hamming-6 pair set vs the exact-Jaccard truth at the same tau
      // (emitted ⊆ truth because simhash pairs are Jaccard-verified);
      // BOTH sides are shared artifacts — emitted is the collapse row's
      // pair set, truth is the exact n-gram set dedup_ngram_jaccard
      // prices at the identical (n, tau) — so the audit is one
      // pair-keyed join, not a third derivation of either chain
      Dedup.pairRecallEval(ngramTruthArt(s, dir), simhashPairsArt(s, dir))),
    "dedup_embedding_cosine" -> ((s, dir) =>
      Similarity.nearDupPairs(t(s, dir, "embeddings"), tau = 0.4)
        .orderBy(col("id_a"), col("id_b"))),

    "dedup_embedding_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val planes = Similarity.prepared(emb.filter(col("vec_id") < 4), "vec_id", "embedding")
        .select(col("id").as("plane_id"), col("v").as("pv"))
      Similarity.nearDupPairsBucketed(emb, planes, tau = 0.4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "dedup_embedding_lsh_banded" -> ((s, dir) => {
      // multi-probe near-dup: candidates collide in ANY of 2 bands × 2
      // planes — the recall knob the single-bucket near-dup probe lacks
      val emb = t(s, dir, "embeddings")
      val planes = Similarity.prepared(emb.filter(col("vec_id") < 4), "vec_id", "embedding")
        .select(col("id").as("plane_id"), col("v").as("pv"))
      Similarity.nearDupPairsBanded(emb, planes, bands = 2, tau = 0.4)
        .orderBy(col("id_a"), col("id_b"))
    }),
    "dedup_semantic" -> ((s, dir) =>
      // SemDeDup (Abbas et al. 2023): deterministic k-means clusters bound
      // the pair space (Σ|cell|²/2, never corpus²); a vector is a semantic
      // dup when a lower-id same-cluster vector has rounded cosine ≥ tau.
      // The oracle replays the full Lloyd's training + final assignment +
      // in-cluster pair scan as CTEs — train→cluster→prune value-checked.
      Similarity.semDedup(t(s, dir, "embeddings"),
          k = semDedupK, iters = semDedupIters, tau = semDedupTau)
        .orderBy(col("vec_id"))),
    "dedup_semantic_rep" -> ((s, dir) => {
      // keep-policy COMPOSITION for the semantic family: semDedup's dup
      // verdicts become edges into the same components × quality-argmax
      // pipeline every other dedup family uses (dedup_best_rep) — each
      // semantic dup cluster keeps its highest-QUALITY aligned document
      // (embeddings are vec_id-aligned with documents), not its lowest id.
      // Scale shape: the edge set is ≤ one edge per non-keep vector (tiny
      // vs the corpus), components runs on that graph only, and the
      // quality join is keyed on the doc id.
      val sem = semDedupArt(s, dir)
      val pairs = sem.filter(col("dup_of").isNotNull)
        .select(col("dup_of").as("doc_a"), col("vec_id").as("doc_b"))
      val comp = Dedup.components(pairs)
      val q = TextAnalysis.qualityScore(t(s, dir, "documents"))
        .select(col("doc_id"), col("quality_score"))
      comp.join(q, Seq("doc_id"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("component"))
            .orderBy(col("quality_score").desc, col("doc_id"))))
        .filter(col("rn") === 1)
        .select(col("component"), col("doc_id").as("rep_id"), col("quality_score"))
        .orderBy(col("component"))
    }),
    "dedup_survivors" -> ((s, dir) => {
      // rides the banded-LSH path (the 100 TB shape) via the shared pair
      // artifact; output is proven equal to the exact quadratic form at
      // these parameters (EngineSpec), so the oracle stays the
      // exact-Jaccard SQL
      val docs = t(s, dir, "documents")
      Dedup.survivors(docs, lshPairs(s, dir))
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),
    "dedup_contamination" -> ((s, dir) => {
      // benchmark decontamination: training docs sharing >= 5 distinct
      // 3-gram shingles with any doc of the (stand-in) eval slice
      val docs = t(s, dir, "documents")
      Dedup.contaminationPairs(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0),
          n = 3, minShared = 5L)
        .orderBy(col("train_id"), col("eval_id"))
    }),
    "dedup_cross_jaccard" -> ((s, dir) => {
      // FUZZY decontamination: whole-document Jaccard across the
      // train/eval boundary — catches paraphrased/re-wrapped eval docs the
      // absolute shared-count screen isn't aimed at; same two-sided
      // inverted-index join, eval side broadcast-small
      val docs = t(s, dir, "documents")
      Dedup.crossJaccardPairs(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0),
          n = 3, tau = 0.5)
        .orderBy(col("train_id"), col("eval_id"))
    }),
    "dedup_containment" -> ((s, dir) => {
      // ASYMMETRIC decontamination: |train ∩ eval| / |eval| — fires on an
      // eval doc QUOTED INSIDE a larger training doc where symmetric
      // Jaccard is diluted by the training doc's own size; same two-sided
      // inverted-index join as the other two cross-corpus screens
      val docs = t(s, dir, "documents")
      Dedup.containmentPairs(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0),
          n = 3, tau = 0.6)
        .orderBy(col("train_id"), col("eval_id"))
    }),
    "dedup_semantic_contamination" -> ((s, dir) => {
      // PARAPHRASE-proof decontamination: the three lexical screens above
      // (shared-shingle count, cross Jaccard, containment) cannot see an
      // eval doc REWRITTEN in new words — its embedding still lands next
      // to its train twin. Same-cell rounded cosine across the split
      // boundary under the SHARED trained quantizer (coarseCents4 — the
      // serving surface the IVF family reads; trained once on the corpus
      // before any split), one row per eval vector, nothing dropped.
      // vec_id % 4 = 0 is the eval slice — coarser than the lexical
      // screens' % 10 so the audited boundary differs from theirs, and
      // the eval side stays the broadcast-small one (the real shape:
      // benchmarks are thousands of rows vs a 100 TB train corpus).
      val emb = t(s, dir, "embeddings")
      Similarity.semanticContamination(
          emb.filter(col("vec_id") % 4 =!= 0),
          emb.filter(col("vec_id") % 4 === 0),
          coarseCents4(s, dir), tau = semContamTau)
        .orderBy(col("vec_id"))
    }),
    "dedup_contamination_bloom" -> ((s, dir) => {
      // the scale form: eval shingles fold into ONE broadcast Bloom filter
      // that pre-filters the (huge) training side before any join; the
      // exact inverted-index verify after makes the output IDENTICAL to
      // dedup_contamination — so the oracle is the same exact SQL
      val docs = t(s, dir, "documents")
      Dedup.contaminationPairsBloom(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0),
          n = 3, minShared = 5L)
        .orderBy(col("train_id"), col("eval_id"))
    }),
    "dedup_threshold_sweep" -> ((s, dir) =>
      // the tau-tuning read before committing a dedup threshold: pairs
      // at or above each Jaccard decile, one pass, exact integer deciles
      Dedup.thresholdSweep(t(s, dir, "documents")).orderBy(col("tau_e1"))),
    "dedup_minhash_calibration" -> ((s, dir) =>
      // the ESTIMATOR audit under the minhash stack: per exact-Jaccard
      // decile, integer-ppm error of the 16-permutation md5 minhash
      // estimate vs the exact value — the signature-length pricing read.
      // The oracle replays the md5 permutation minima bit-for-bit, so
      // the estimator itself is value-verified, never self-compared.
      Dedup.minhashCalibration(t(s, dir, "documents")).orderBy(col("j_e1"))),
    "dedup_incremental_probe" -> ((s, dir) => {
      // the daily-dedup economics as an artifact: build the persisted
      // band/sets index on the BASE corpus (doc_id >= 50), then probe
      // the delta (doc_id < 50) against it — only the delta is shingled;
      // oracle = the exact-Jaccard batch pairs restricted to cross
      // (delta, base) pairs, so probe ≡ full batch run is value-pinned.
      // Per-process scratch path; build's overwrite resets the artifact
      // each invocation so bench iterations cannot double-append.
      val docs = t(s, dir, "documents")
      val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
        s"/graft_dedup_index_${ProcessHandle.current().pid()}"
      graft.sources.DedupIndex.build(docs.filter(col("doc_id") >= 50), path)
      val idx = graft.sources.DedupIndex.load(s, path)
      graft.sources.DedupIndex.probe(idx, docs.filter(col("doc_id") < 50))
        .orderBy(col("doc_a"), col("doc_b"))
    }),
    "dedup_components" -> ((s, dir) =>
      // exact dup-cluster canonicalization: min-label propagation to a
      // fixpoint over the near-dup pair graph (LSH-generated pairs, proven
      // equal to exact at these parameters); oracle recomputes reachability
      // with a recursive CTE; serves the shared pair+components artifacts
      lshComponents(s, dir)
        .orderBy(col("doc_id"))),
    "dedup_components_incremental" -> ((s, dir) => {
      // the daily-refresh shape: yesterday's labels are a components()
      // fixpoint of the base edge set; today's delta pairs merge in via a
      // delta-sized label-graph closure + one broadcast-mapped scan —
      // never relabeling the full graph. Value contract: identical to the
      // full recompute, which IS the oracle (same SQL as dedup_components).
      // pairs from the SHARED artifact (one LSH materialization per sweep
      // for the three readers here: base filter, delta contraction, delta
      // new-node scan) and the SMALL third as the base: the operator's
      // cost story is the delta path, so the measured row should price
      // that, not a full base rebuild. Value contract unchanged — any
      // base/delta split of the same pair set merges to the identical
      // fixpoint.
      val pairs = lshPairs(s, dir)
      val base = pairs.filter((col("doc_a") + col("doc_b")) % 3 === 0)
      val delta = pairs.filter((col("doc_a") + col("doc_b")) % 3 =!= 0)
      Dedup.componentsIncremental(Dedup.components(base), delta)
        .orderBy(col("doc_id"))
    }),
    "dedup_best_rep" -> ((s, dir) => {
      // representative SELECTION policy over exact dup clusters: instead of
      // min-id-wins, keep each component's highest-QUALITY member (the
      // policy real pipelines want — the cleanest copy survives, not the
      // earliest-crawled). Composes components × qualityScore; ties break
      // on doc_id so the choice is total.
      val docs = t(s, dir, "documents")
      val comp = lshComponents(s, dir)
      val q = TextAnalysis.qualityScore(docs).select(col("doc_id"), col("quality_score"))
      comp.join(q, Seq("doc_id"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("component"))
            .orderBy(col("quality_score").desc, col("doc_id"))))
        .filter(col("rn") === 1)
        .select(col("component"), col("doc_id").as("rep_id"), col("quality_score"))
        .orderBy(col("component"))
    }),
    "dedup_stats" -> ((s, dir) => {
      // one-row corpus summary of the dedup pass — banded-LSH hot path,
      // exact-Jaccard oracle (outputs proven equal at these parameters)
      val docs = t(s, dir, "documents")
      val pairs = lshPairs(s, dir)
      val survivors = Dedup.survivors(docs, pairs)
      docs.agg(count(lit(1)).as("n_docs"))
        .crossJoin(pairs.agg(count(lit(1)).as("n_pairs")))
        .crossJoin(survivors.agg(count(lit(1)).as("n_survivors")))
    }),
    "dedup_cross_source_matrix" -> ((s, dir) => {
      // the PAIRWISE companion of dedup_rate_by_source: which source
      // pairs share duplicated content (the "does CC overlap C4" read
      // that decides which feed is redundant). Exact normalized-key
      // groups sized [2, 1000] pair within the group (bounded blow-up:
      // the df-cap discipline — a boilerplate key above the cap is a
      // cleanup finding, not a pair source), source pair canonicalized.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"),
        when(col("doc_id") % 10 === 0,
          concat(lit("leak "), expr("doc_id DIV 20").cast("string")))
          .otherwise(col("text")).as("text"))
      val keyed = Dedup.cached(docs.select(col("doc_id"), col("source"),
        Dedup.normalizedKey(col("text")).as("k")))
      val groups = keyed.groupBy(col("k")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2 && col("n") <= 1000).select(col("k"))
      val in2 = keyed.join(groups, Seq("k"))
      in2.as("x").join(in2.as("y"),
          col("x.k") === col("y.k") && col("x.doc_id") < col("y.doc_id"))
        .select(least(col("x.source"), col("y.source")).as("src_a"),
          greatest(col("x.source"), col("y.source")).as("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_dup_pairs"))
        .orderBy(col("src_a"), col("src_b"))
    }),
    "dedup_rate_by_source" -> ((s, dir) => {
      // the dedup DASHBOARD cut: duplicate mass per source over the
      // planted-twin corpus (the leakage-audit surface) — per source:
      // docs, docs whose normalized key repeats anywhere, integer ppm;
      // the number that tells you WHICH feed to fix
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"),
        when(col("doc_id") % 10 === 0,
          concat(lit("leak "), expr("doc_id DIV 20").cast("string")))
          .otherwise(col("text")).as("text"))
      val keyed = docs.select(col("doc_id"), col("source"),
        Dedup.normalizedKey(col("text")).as("k"))
      val groups = keyed.groupBy(col("k")).agg(count(lit(1)).as("n"))
      keyed.join(groups, Seq("k"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n") >= 2, 1L).otherwise(0L)).as("n_dup_docs"))
        .select(col("source"), col("n_docs"), col("n_dup_docs"),
          expr("CAST((n_dup_docs * 1000000) DIV n_docs AS BIGINT)")
            .as("dup_ppm"))
        .orderBy(col("source"))
    }),
    "dedup_chunks" -> ((s, dir) =>
      Dedup.chunkStats(t(s, dir, "documents")).orderBy(col("chunk_hash"))),
    "dedup_substring" -> ((s, dir) =>
      // Lee et al. 2022 ExactSubstr granularity: maximal spans whose every
      // 4-token OVERLAPPING window repeats corpus-wide (any offset — what
      // the k-aligned chunk pass cannot see)
      Dedup.substringSpans(t(s, dir, "documents"), k = 4)
        .orderBy(col("doc_id"), col("span_start"))),
    "dedup_substring_scrub" -> ((s, dir) =>
      // the remove-all-but-one application pass: canonical (corpus-first)
      // occurrence keeps its tokens, later occurrences lose exactly the
      // repeated ones
      Dedup.substringScrub(t(s, dir, "documents"), k = 4)
        .orderBy(col("doc_id"))),
    "dedup_line_scrub" -> ((s, dir) => {
      // cross-document boilerplate: four line-break injections give ~8
      // lines/doc; a planted newsletter footer on doc_id%4 and a copyright
      // line on %6 repeat across ~125/~84 docs — scrubbed everywhere; any
      // natural line repeating across >= 5 docs goes with them
      val docs = t(s, dir, "documents").select(
        col("doc_id"),
        concat(
          replace(replace(replace(replace(col("text"),
            lit("line "), lit("line\n")),
            lit("value "), lit("value\n")),
            lit("table "), lit("table\n")),
            lit("scan "), lit("scan\n")),
          when(col("doc_id") % 4 === 0,
            lit("\nSubscribe to our newsletter today")).otherwise(lit("")),
          when(col("doc_id") % 6 === 0,
            lit("\nCopyright 2026 Example Corp")).otherwise(lit("")))
          .as("text"))
      Dedup.lineScrub(docs).orderBy(col("doc_id"))
    }),
    "dedup_chunk_scrub" -> ((s, dir) =>
      // the APPLICATION pass over dedup_chunks' diagnosis: strip chunks
      // repeated across >1 distinct docs, reassemble the survivors in
      // order (+ the always-kept partial tail)
      Dedup.chunkScrub(t(s, dir, "documents"), k = 16, maxDocs = 1L)
        .orderBy(col("doc_id"))),
  )

  val oracles: Seq[(String, String)] = Seq(
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin,
    "dedup_exact_normalized" ->
      // identical residue planting via chr() (233 = precomposed é, 769 =
      // combining acute, 201 = É), then the identical key chain: lower →
      // explicit-class ws collapse → NFC → md5 (DuckDB's nfc_normalize
      // and the JDK normalizer both implement UAX #15 NFC)
      """WITH v AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 4 = 0
        |                THEN 'Caf'||chr(233)||'   doc '||CAST(doc_id//4 AS VARCHAR)
        |              WHEN doc_id % 4 = 1
        |                THEN 'Cafe'||chr(769)||' doc '||CAST(doc_id//4 AS VARCHAR)
        |              WHEN doc_id % 4 = 2
        |                THEN 'CAF'||chr(201)||' doc '||CAST(doc_id//4 AS VARCHAR)
        |              ELSE 'unique '||CAST(doc_id AS VARCHAR) END AS text
        |  FROM documents)
        |SELECT md5(nfc_normalize(regexp_replace(trim(lower(text)), '[ \t\n\r]+', ' ', 'g')))
        |         AS text_key,
        |       MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM v GROUP BY 1 ORDER BY text_key""".stripMargin,
    "dedup_ngram_jaccard" -> jaccardOracle(0.6),
    "dedup_ngram_jaccard_pruned" -> (shingleCte +
      """, keep AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 10),
        |sh2 AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)),
        |nn2 AS (SELECT doc_id, COUNT(*) AS n FROM sh2 GROUP BY doc_id),
        |p2 AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
        |       FROM sh2 x JOIN sh2 y ON x.s=y.s AND x.doc_id<y.doc_id GROUP BY 1,2)
        |SELECT p2.a AS doc_a, p2.b AS doc_b,
        |       CAST(p2.c AS DOUBLE)/(na.n+nb.n-p2.c) AS jaccard
        |FROM p2 JOIN nn2 na ON na.doc_id=p2.a JOIN nn2 nb ON nb.doc_id=p2.b
        |WHERE CAST(p2.c AS DOUBLE)/(na.n+nb.n-p2.c) >= 0.6
        |ORDER BY doc_a, doc_b""".stripMargin),
    "dedup_minhash_lsh" -> jaccardOracle(0.6),
    "dedup_threshold_sweep" -> (shingleCte +
      // integer decile: (10·c) // union ≥ k ⟺ J ≥ k/10 exactly; fixed
      // 6-row spine so empty deciles emit 0
      """,bk AS (
        |  SELECT (10*p.c) // (na.n+nb.n-p.c) AS b
        |  FROM p JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b)
        |SELECT CAST(sp.t AS BIGINT) AS tau_e1,
        |       CAST((SELECT COUNT(*) FROM bk WHERE bk.b >= sp.t) AS BIGINT)
        |         AS n_pairs_ge
        |FROM range(5, 11) sp(t) ORDER BY tau_e1""".stripMargin),
    "dedup_minhash_calibration" -> (shingleCte + {
      // the md5 permutation minima replayed over the shingle STRING
      // universe; integer ppm everywhere (est: matches × 62500 exact;
      // exact: (1e6·c) // union), sums CAST to BIGINT per the HUGEINT
      // discipline
      val sigCols = (0 until 16).map(p =>
        s"MIN(CAST(('0x'||substring(md5('mh$p:'||s),1,15)) AS BIGINT)) AS sig$p")
        .mkString(", ")
      val matchSum = (0 until 16).map(p =>
        s"CASE WHEN sa.sig$p = sb.sig$p THEN 1 ELSE 0 END").mkString(" + ")
      s""",sig AS (SELECT doc_id, $sigCols FROM sh GROUP BY doc_id),
         |sc AS (
         |  SELECT (10*p.c) // (na.n+nb.n-p.c) AS j_e1,
         |         (1000000*p.c) // (na.n+nb.n-p.c) AS exact_ppm,
         |         CAST(($matchSum) * 62500 AS BIGINT) AS est_ppm
         |  FROM p JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b
         |         JOIN sig sa ON sa.doc_id=p.a JOIN sig sb ON sb.doc_id=p.b)
         |SELECT CAST(j_e1 AS BIGINT) AS j_e1,
         |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |       CAST(SUM(exact_ppm) AS BIGINT) AS sum_exact_ppm,
         |       CAST(SUM(est_ppm) AS BIGINT) AS sum_est_ppm,
         |       CAST(SUM(abs(est_ppm - exact_ppm)) AS BIGINT) AS sum_abs_err_ppm,
         |       CAST(MAX(abs(est_ppm - exact_ppm)) AS BIGINT) AS max_abs_err_ppm
         |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin
    }),
    "dedup_incremental_probe" -> (shingleCte +
      // the same exact-Jaccard pair universe, restricted to cross
      // (delta < 50, base >= 50) pairs — canonical a < b makes the split
      // predicate one-sided
      """SELECT p.a AS doc_a, p.b AS doc_b,
        |       CAST(p.c AS DOUBLE)/(na.n+nb.n-p.c) AS jaccard
        |FROM p JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b
        |WHERE CAST(p.c AS DOUBLE)/(na.n+nb.n-p.c) >= 0.6
        |  AND p.a < 50 AND p.b >= 50
        |ORDER BY doc_a, doc_b""".stripMargin),
    "dedup_simhash" -> simhashOracle(0.6, 6),
    "dedup_simhash_recall" -> simhashRecallOracle(0.6, 6),
    // identical oracle by design: the collapse rewrite must never change
    // the emitted pair set, only the plan shape
    "dedup_simhash_collapse" -> simhashOracle(0.6, 6),
    "dedup_block_skew" -> (shingleCte + simhashCtes + {
      // block keys rebuilt from the oracle's per-bit fingerprint columns:
      // byte(j) = Σ t_{8j+b}·2^b, key = byte(j1)·256 + byte(j2), blk index
      // = lexicographic rank of (j1, j2) among the C(8,2) ordered pairs
      val bytes = (0 until 8).map(j =>
        (0 until 8).map(b => s"${1 << b}*t${8 * j + b}").mkString(" + ") +
          s" AS by$j").mkString(", ")
      def sel(v: String) =
        "CASE " + (0 until 8).map(j => s"WHEN $v = $j THEN by$j").mkString(" ") + " END"
      s""", bytes AS (SELECT doc_id, $bytes FROM bits),
         |blocks AS (
         |  SELECT b.doc_id,
         |         CAST(p1.j*(15-p1.j)//2 + (p2.j-p1.j-1) AS BIGINT) AS blk,
         |         CAST((${sel("p1.j")})*256 + (${sel("p2.j")}) AS BIGINT) AS blk_val
         |  FROM bytes b
         |  CROSS JOIN range(0,8) p1(j)
         |  CROSS JOIN range(0,8) p2(j)
         |  WHERE p2.j > p1.j)
         |SELECT blk, blk_val,
         |       CAST(COUNT(*) AS BIGINT) AS n_members,
         |       CAST(COUNT(*)*(COUNT(*)-1)//2 AS BIGINT) AS pair_pressure
         |FROM blocks GROUP BY 1, 2
         |ORDER BY n_members DESC, blk, blk_val
         |LIMIT 20""".stripMargin
    }),
    "dedup_embedding_cosine" -> (embCte +
      """, d AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, list_reduce(list(a.v*b.v ORDER BY a.i), (x,y) -> x+y) AS dot
        |  FROM f a JOIN f b ON a.i=b.i AND a.vec_id<b.vec_id GROUP BY 1,2)
        |SELECT id_a, id_b, ROUND(dot/(x.nrm*y.nrm),4)+0.0 AS cosine
        |FROM d JOIN nrm x ON x.vec_id=id_a JOIN nrm y ON y.vec_id=id_b
        |WHERE ROUND(dot/(x.nrm*y.nrm),4) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin),
    "dedup_embedding_lsh" -> (embCte +
      """, hp AS (SELECT vec_id AS plane_id, i, v FROM f WHERE vec_id < 4),
        |pd AS (
        |  SELECT f.vec_id, hp.plane_id, list_reduce(list(f.v*hp.v ORDER BY f.i), (x,y) -> x+y) AS d
        |  FROM f JOIN hp ON f.i=hp.i GROUP BY 1,2),
        |bk AS (
        |  SELECT vec_id, CAST(SUM(CASE WHEN d > 0 THEN 1<<plane_id ELSE 0 END) AS BIGINT) AS bucket
        |  FROM pd GROUP BY 1),
        |cand AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM bk a JOIN bk b ON a.bucket=b.bucket AND a.vec_id<b.vec_id),
        |d AS (
        |  SELECT c.id_a, c.id_b, list_reduce(list(x.v*y.v ORDER BY x.i), (p,q) -> p+q) AS dot
        |  FROM cand c
        |  JOIN f x ON x.vec_id=c.id_a
        |  JOIN f y ON y.vec_id=c.id_b AND x.i=y.i
        |  GROUP BY 1,2)
        |SELECT id_a, id_b, ROUND(dot/(nx.nrm*ny.nrm),4)+0.0 AS cosine
        |FROM d JOIN nrm nx ON nx.vec_id=id_a JOIN nrm ny ON ny.vec_id=id_b
        |WHERE ROUND(dot/(nx.nrm*ny.nrm),4) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin),
    "dedup_embedding_lsh_banded" -> (embCte +
      """, hp AS (SELECT vec_id AS plane_id, i, v FROM f WHERE vec_id < 4),
        |pd AS (
        |  SELECT f.vec_id, hp.plane_id, list_reduce(list(f.v*hp.v ORDER BY f.i), (x,y) -> x+y) AS d
        |  FROM f JOIN hp ON f.i=hp.i GROUP BY 1,2),
        |bkb AS (
        |  SELECT vec_id, CAST(floor(plane_id/2.0) AS BIGINT) AS band,
        |         CAST(SUM(CASE WHEN d > 0 THEN 1<<(plane_id % 2) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM pd GROUP BY 1,2),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM bkb a JOIN bkb b ON a.band=b.band AND a.bucket=b.bucket AND a.vec_id<b.vec_id),
        |d AS (
        |  SELECT c.id_a, c.id_b, list_reduce(list(x.v*y.v ORDER BY x.i), (p,q) -> p+q) AS dot
        |  FROM cand c
        |  JOIN f x ON x.vec_id=c.id_a
        |  JOIN f y ON y.vec_id=c.id_b AND x.i=y.i
        |  GROUP BY 1,2)
        |SELECT id_a, id_b, ROUND(dot/(nx.nrm*ny.nrm),4)+0.0 AS cosine
        |FROM d JOIN nrm nx ON nx.vec_id=id_a JOIN nrm ny ON ny.vec_id=id_b
        |WHERE ROUND(dot/(nx.nrm*ny.nrm),4) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin),
    // all dots (final assignment AND pair scan) are ORDERED sequential
    // folds (list_reduce over i-ordered lists), mirroring the Spark side's
    // left-assoc ArrayDotProduct / NearestCentroidCells fold bit-for-bit —
    // an unordered SUM can flip the 4th rounded decimal on boundary values
    // (non-associative double addition), which here could flip a cluster
    // assignment and cascade into different keep/dup_of flags
    "dedup_semantic" -> (embCte +
      Similarity.kmeansOracleCtes(k = semDedupK, iters = semDedupIters) +
      semDedupPairCtes +
      """SELECT n.vec_id, n.cell, (dup.id_a IS NULL) AS keep,
        |       dup.dup_of, dup.max_cosine
        |FROM ncell n LEFT JOIN dup ON dup.id_a = n.vec_id
        |ORDER BY n.vec_id""".stripMargin),
    // keep-policy composition: semDedup dup edges → recursive reachability
    // (the componentsOracle discipline) → quality argmax (the best_rep
    // discipline) — the oracle composes the two EXISTING verified shapes
    "dedup_semantic_rep" -> ((embCte.replaceFirst("^WITH ", "WITH RECURSIVE ") +
      Similarity.kmeansOracleCtes(k = semDedupK, iters = semDedupIters) +
      semDedupPairCtes +
      """,e AS (SELECT dup_of AS src, id_a AS dst FROM dup
        |       UNION ALL SELECT id_a, dup_of FROM dup),
        |reach(node, lbl) AS (
        |  SELECT DISTINCT src, src FROM e
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
        |comp AS (SELECT node AS doc_id, MIN(lbl) AS component FROM reach GROUP BY node),
        |q AS (
        |  SELECT doc_id,
        |         ROUND(least(1.0, CAST(len(string_split(lower(text),' ')) AS DOUBLE)/100.0)*0.5 +
        |               CAST(length(regexp_replace(lower(text),'[^a-z]','','g')) AS DOUBLE)/CAST(length(text) AS BIGINT)*0.5,
        |               6) AS quality_score
        |  FROM documents),
        |r AS (
        |  SELECT comp.component, comp.doc_id, q.quality_score,
        |         row_number() OVER (PARTITION BY comp.component
        |                            ORDER BY q.quality_score DESC, comp.doc_id) AS rn
        |  FROM comp JOIN q USING (doc_id))
        |SELECT component, doc_id AS rep_id, quality_score
        |FROM r WHERE rn = 1 ORDER BY component""".stripMargin)),
    "dedup_survivors" -> (shingleCte +
      """SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (
        |  SELECT p.b FROM p
        |  JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b
        |  WHERE CAST(p.c AS DOUBLE)/(na.n+nb.n-p.c) >= 0.6)
        |ORDER BY doc_id""".stripMargin),
    "dedup_contamination" -> (shingleCte +
      """SELECT t.doc_id AS train_id, e.doc_id AS eval_id,
        |       COUNT(*) AS n_shared
        |FROM sh t JOIN sh e ON t.s = e.s
        |WHERE t.doc_id % 10 <> 0 AND e.doc_id % 10 = 0
        |GROUP BY 1, 2 HAVING COUNT(*) >= 5
        |ORDER BY train_id, eval_id""".stripMargin),
    // the pair CTE keeps doc_a < doc_b, so a cross pair's orientation is
    // recovered by which side is the eval residue (exactly one is, by the
    // WHERE xor); jaccard is the same single exact double division
    "dedup_cross_jaccard" -> (shingleCte +
      """,cj AS (
        |  SELECT CASE WHEN p.a % 10 <> 0 THEN p.a ELSE p.b END AS train_id,
        |         CASE WHEN p.a % 10 = 0 THEN p.a ELSE p.b END AS eval_id,
        |         CAST(p.c AS DOUBLE)/(na.n+nb.n-p.c) AS jaccard
        |  FROM p JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b
        |  WHERE (p.a % 10 = 0) <> (p.b % 10 = 0))
        |SELECT train_id, eval_id, jaccard FROM cj WHERE jaccard >= 0.5
        |ORDER BY train_id, eval_id""".stripMargin),
    "dedup_containment" -> (shingleCte +
      // orientation recovered as in cj; the denominator is the EVAL side's
      // own distinct-shingle count (p carries a < b, so pick whichever of
      // na/nb sits on the eval residue)
      """,ct AS (
        |  SELECT CASE WHEN p.a % 10 <> 0 THEN p.a ELSE p.b END AS train_id,
        |         CASE WHEN p.a % 10 = 0 THEN p.a ELSE p.b END AS eval_id,
        |         CAST(p.c AS DOUBLE) /
        |           (CASE WHEN p.a % 10 = 0 THEN na.n ELSE nb.n END) AS containment
        |  FROM p JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b
        |  WHERE (p.a % 10 = 0) <> (p.b % 10 = 0))
        |SELECT train_id, eval_id, containment FROM ct WHERE containment >= 0.6
        |ORDER BY train_id, eval_id""".stripMargin),
    // full replay of the semantic screen: Lloyd's training on the whole
    // corpus (the coarseCents4 params, k=4 iters=2) + final assignment
    // (shared dfin/rfin/ncell CTEs) + the CROSS-boundary same-cell pair
    // scan — dots are ordered list_reduce folds (the semDedup fencing)
    "dedup_semantic_contamination" -> (embCte +
      Similarity.kmeansOracleCtes(k = 4, iters = 2) +
      kmeansFinalAssignCtes +
      s""",
        |cprs AS MATERIALIZED (
        |  SELECT ct.vec_id AS id_t, ce.vec_id AS id_e
        |  FROM ncell ct JOIN ncell ce ON ce.cell=ct.cell
        |  WHERE ct.vec_id % 4 <> 0 AND ce.vec_id % 4 = 0),
        |cpd AS MATERIALIZED (
        |  SELECT cprs.id_t, cprs.id_e,
        |         list_reduce(list(a.v*b.v ORDER BY a.i), (x,y) -> x+y) AS dot
        |  FROM cprs
        |  JOIN f a ON a.vec_id=cprs.id_t
        |  JOIN f b ON b.vec_id=cprs.id_e AND b.i=a.i
        |  GROUP BY 1,2),
        |csc AS (
        |  SELECT cpd.id_e, cpd.id_t, ROUND(cpd.dot/(na.nrm*nb.nrm),4)+0.0 AS cosine
        |  FROM cpd JOIN nrm na ON na.vec_id=cpd.id_t
        |           JOIN nrm nb ON nb.vec_id=cpd.id_e),
        |chit AS (
        |  SELECT id_e, MIN(id_t) AS train_match, MAX(cosine) AS max_cosine
        |  FROM csc WHERE cosine >= $semContamTau GROUP BY 1)
        |SELECT n.vec_id, n.cell, (h.id_e IS NOT NULL) AS contaminated,
        |       h.train_match, h.max_cosine
        |FROM ncell n LEFT JOIN chit h ON h.id_e = n.vec_id
        |WHERE n.vec_id % 4 = 0
        |ORDER BY n.vec_id""".stripMargin),
    // identical oracle by design: the Bloom pre-filter must never change
    // the emitted pair set, only the join's input volume
    "dedup_contamination_bloom" -> (shingleCte +
      """SELECT t.doc_id AS train_id, e.doc_id AS eval_id,
        |       COUNT(*) AS n_shared
        |FROM sh t JOIN sh e ON t.s = e.s
        |WHERE t.doc_id % 10 <> 0 AND e.doc_id % 10 = 0
        |GROUP BY 1, 2 HAVING COUNT(*) >= 5
        |ORDER BY train_id, eval_id""".stripMargin),
    "dedup_components" -> componentsOracle,
    // identical oracle BY DESIGN: the incremental merge must be
    // value-identical to the full recompute over all pairs
    "dedup_components_incremental" -> componentsOracle,
    "dedup_best_rep" -> (shingleCteMat.replaceFirst("^WITH ", "WITH RECURSIVE ") +
      """,qp AS MATERIALIZED (
        |  SELECT p.a, p.b FROM p
        |  JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b
        |  WHERE CAST(p.c AS DOUBLE)/(na.n+nb.n-p.c) >= 0.6),
        |e AS MATERIALIZED (SELECT a AS src, b AS dst FROM qp UNION ALL SELECT b, a FROM qp),
        |reach(node, lbl) AS (
        |  SELECT DISTINCT src, src FROM e
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
        |comp AS (SELECT node AS doc_id, MIN(lbl) AS component FROM reach GROUP BY node),
        |q AS (
        |  SELECT doc_id,
        |         ROUND(least(1.0, CAST(len(string_split(lower(text),' ')) AS DOUBLE)/100.0)*0.5 +
        |               CAST(length(regexp_replace(lower(text),'[^a-z]','','g')) AS DOUBLE)/CAST(length(text) AS BIGINT)*0.5,
        |               6) AS quality_score
        |  FROM documents),
        |r AS (
        |  SELECT comp.component, comp.doc_id, q.quality_score,
        |         row_number() OVER (PARTITION BY comp.component
        |                            ORDER BY q.quality_score DESC, comp.doc_id) AS rn
        |  FROM comp JOIN q USING (doc_id))
        |SELECT component, doc_id AS rep_id, quality_score
        |FROM r WHERE rn = 1 ORDER BY component""".stripMargin),
    "dedup_stats" -> (shingleCte +
      """SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
        |       (SELECT COUNT(*) FROM p
        |        JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b
        |        WHERE CAST(p.c AS DOUBLE)/(na.n+nb.n-p.c) >= 0.6) AS n_pairs,
        |       (SELECT COUNT(*) FROM documents WHERE doc_id NOT IN (
        |          SELECT p.b FROM p
        |          JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b
        |          WHERE CAST(p.c AS DOUBLE)/(na.n+nb.n-p.c) >= 0.6)) AS n_survivors""".stripMargin),
    "dedup_cross_source_matrix" ->
      // same normalized key, [2,1000]-sized groups, canonical source
      // pair over within-group doc pairs
      """WITH v AS (
        |  SELECT doc_id, source,
        |         CASE WHEN doc_id % 10 = 0
        |              THEN 'leak '||CAST(doc_id//20 AS VARCHAR)
        |              ELSE text END AS text
        |  FROM documents),
        |kk AS (SELECT doc_id, source,
        |              md5(nfc_normalize(regexp_replace(trim(lower(text)),
        |                '[ \t\n\r]+', ' ', 'g'))) AS k
        |       FROM v),
        |g AS (SELECT k FROM (SELECT k, COUNT(*) AS n FROM kk GROUP BY 1)
        |      WHERE n >= 2 AND n <= 1000),
        |in2 AS (SELECT kk.doc_id, kk.source, kk.k FROM kk JOIN g ON g.k = kk.k)
        |SELECT least(x.source, y.source) AS src_a,
        |       greatest(x.source, y.source) AS src_b,
        |       COUNT(*) AS n_dup_pairs
        |FROM in2 x JOIN in2 y ON x.k = y.k AND x.doc_id < y.doc_id
        |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin,
    "dedup_rate_by_source" ->
      """WITH v AS (
        |  SELECT doc_id, source,
        |         CASE WHEN doc_id % 10 = 0
        |              THEN 'leak '||CAST(doc_id//20 AS VARCHAR)
        |              ELSE text END AS text
        |  FROM documents),
        |kk AS (SELECT doc_id, source,
        |              md5(nfc_normalize(regexp_replace(trim(lower(text)),
        |                '[ \t\n\r]+', ' ', 'g'))) AS k
        |       FROM v),
        |g AS (SELECT k, COUNT(*) AS n FROM kk GROUP BY 1)
        |SELECT kk.source, COUNT(*) AS n_docs,
        |       CAST(SUM(CASE WHEN g.n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_dup_docs,
        |       CAST((CAST(SUM(CASE WHEN g.n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |             * 1000000) // COUNT(*) AS BIGINT) AS dup_ppm
        |FROM kk JOIN g ON g.k = kk.k
        |GROUP BY 1 ORDER BY source""".stripMargin,
    "dedup_chunks" ->
      // non-overlapping 16-token chunks aligned at multiples of 16;
      // trailing partial chunks skipped (same universe as Dedup.chunkStats)
      """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
        |idx AS (
        |  SELECT doc_id, ts, unnest(range(0, len(ts) // 16)) AS i
        |  FROM toks WHERE len(ts) >= 16),
        |chunks AS (
        |  SELECT doc_id, array_to_string(ts[i*16+1 : i*16+16], ' ') AS chunk FROM idx)
        |SELECT md5(chunk) AS chunk_hash, COUNT(*) AS n_occurrences,
        |       COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS first_doc
        |FROM chunks GROUP BY 1 ORDER BY chunk_hash""".stripMargin,
    "dedup_chunk_scrub" ->
      // same chunk universe as dedup_chunks; scrub = chunks in >1 distinct
      // docs; rewrite = kept chunks in order + the partial tail (lossless
      // reassembly for unaffected docs)
      """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
        |idx AS (
        |  SELECT doc_id, ts, unnest(range(0, len(ts) // 16)) AS i
        |  FROM toks WHERE len(ts) >= 16),
        |chunks AS (
        |  SELECT doc_id, i, array_to_string(ts[i*16+1 : i*16+16], ' ') AS chunk FROM idx),
        |scrub AS (
        |  SELECT md5(chunk) AS ch FROM chunks GROUP BY 1
        |  HAVING COUNT(DISTINCT doc_id) > 1),
        |kept AS (
        |  SELECT doc_id, string_agg(chunk, ' ' ORDER BY i) AS kept_txt,
        |         COUNT(*) AS n_kept
        |  FROM chunks WHERE md5(chunk) NOT IN (SELECT ch FROM scrub)
        |  GROUP BY doc_id),
        |base AS (
        |  -- COALESCE: DuckDB's array_to_string of an EMPTY list is NULL
        |  -- where Spark's array_join is '' (exact-multiple docs have an
        |  -- empty tail slice; fully-scrubbed docs an empty filter result)
        |  SELECT doc_id, len(ts) // 16 AS n_chunks,
        |         COALESCE(array_to_string(ts[(len(ts) // 16) * 16 + 1 : len(ts)], ' '), '') AS tail_txt
        |  FROM toks)
        |SELECT b.doc_id,
        |       COALESCE(array_to_string(
        |         list_filter([COALESCE(k.kept_txt, ''), b.tail_txt], p -> len(p) > 0),
        |         ' '), '') AS scrubbed_text,
        |       CAST(b.n_chunks AS BIGINT) AS n_chunks,
        |       CAST(b.n_chunks - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed
        |FROM base b LEFT JOIN kept k USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,
    "dedup_substring" ->
      // every OVERLAPPING 4-token window position whose window text repeats
      // corpus-wide (COUNT over the window md5 ≥ 2), merged per doc into
      // maximal intervals via running-max break detection — identical rule
      // to Dedup.substringSpans. Positions 1-based; the -1000000000 break
      // sentinel matches the Spark side (p ≥ 1 always)
      """WITH toks AS (SELECT doc_id, string_split(lower(text),' ') AS ts FROM documents),
        |g AS (
        |  SELECT doc_id, p, md5(array_to_string(ts[p:p+3], ' ')) AS gh
        |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts)-3)) AS p
        |        FROM toks WHERE len(ts) >= 4)),
        |occ AS (
        |  SELECT doc_id, p FROM
        |    (SELECT doc_id, p, COUNT(*) OVER (PARTITION BY gh) AS c FROM g)
        |  WHERE c >= 2),
        |isl AS (
        |  SELECT doc_id, p,
        |         CASE WHEN p > COALESCE(MAX(p) OVER (PARTITION BY doc_id ORDER BY p
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1000000000) + 4
        |              THEN 1 ELSE 0 END AS brk
        |  FROM occ),
        |i2 AS (
        |  SELECT doc_id, p,
        |         SUM(brk) OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING) AS island
        |  FROM isl)
        |SELECT doc_id, CAST(MIN(p) AS BIGINT) AS span_start,
        |       CAST(MAX(p)+3 AS BIGINT) AS span_end,
        |       CAST(MAX(p)+3-MIN(p)+1 AS BIGINT) AS n_tokens
        |FROM i2 GROUP BY doc_id, island ORDER BY doc_id, span_start""".stripMargin,
    "dedup_substring_scrub" ->
      // same duplicated-window universe; canonical occurrence = row_number 1
      // by (doc_id, p) within the window hash; a token survives iff not
      // covered by any duplicated window OR covered by a canonical one
      """WITH toks AS (SELECT doc_id, string_split(lower(text),' ') AS ts FROM documents),
        |tok AS (SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts,1) AS q FROM toks),
        |g AS (
        |  SELECT doc_id, p, md5(array_to_string(ts[p:p+3], ' ')) AS gh
        |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts)-3)) AS p
        |        FROM toks WHERE len(ts) >= 4)),
        |docc AS (
        |  SELECT doc_id, p,
        |         COUNT(*) OVER (PARTITION BY gh) AS c,
        |         ROW_NUMBER() OVER (PARTITION BY gh ORDER BY doc_id, p) AS rn
        |  FROM g),
        |dup AS (SELECT doc_id, p, (rn = 1) AS canon FROM docc WHERE c >= 2),
        |cover AS (
        |  SELECT doc_id, p + off AS q, MAX(canon) AS canon_cover
        |  FROM (SELECT doc_id, p, canon, unnest(generate_series(0, 3)) AS off FROM dup)
        |  GROUP BY 1, 2),
        |keepj AS (
        |  SELECT t.doc_id, t.q, t.tok, COALESCE(c.canon_cover, TRUE) AS keep
        |  FROM tok t LEFT JOIN cover c ON c.doc_id = t.doc_id AND c.q = t.q)
        |SELECT doc_id,
        |       COALESCE(string_agg(CASE WHEN keep THEN tok END, ' ' ORDER BY q), '') AS scrubbed_text,
        |       COUNT(*) AS n_tokens,
        |       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
        |FROM keepj GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_line_scrub" ->
      // identical line-ification + boilerplate planting; the boilerplate
      // set is a relational GROUP BY ... HAVING over distinct doc counts,
      // the scrub a LEFT JOIN + ordered string_agg — same strings, same
      // integers
      """WITH syn AS (
        |  SELECT doc_id,
        |         replace(replace(replace(replace(text,
        |           'line ', 'line' || chr(10)),
        |           'value ', 'value' || chr(10)),
        |           'table ', 'table' || chr(10)),
        |           'scan ', 'scan' || chr(10)) ||
        |         CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'Subscribe to our newsletter today' ELSE '' END ||
        |         CASE WHEN doc_id % 6 = 0 THEN chr(10) || 'Copyright 2026 Example Corp' ELSE '' END AS text
        |  FROM documents),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS la FROM syn),
        |l AS (SELECT doc_id, unnest(la) AS line, generate_subscripts(la, 1) AS pos FROM ls),
        |b AS (SELECT line FROM l WHERE strlen(trim(line)) > 0
        |      GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 5),
        |f AS (SELECT l.doc_id, l.pos, l.line, (b.line IS NULL) AS keep
        |      FROM l LEFT JOIN b ON l.line = b.line)
        |SELECT doc_id,
        |       COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), '') AS clean_text,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines,
        |       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
        |       CAST(SUM(CASE WHEN keep THEN 0 ELSE strlen(line) END) AS BIGINT) AS removed_chars
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )
}
