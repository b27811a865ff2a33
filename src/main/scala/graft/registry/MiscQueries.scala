package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Assoc, Dedup, DiskUsageOp, Graph, Hygiene, Joins, Layout, Multimodal, Similarity, Splits, Temporal, TextAnalysis}
import graft.SparkEntry._

/** embedding-health, retrieval, hygiene and pipeline rows — mechanically split out of the monolithic SparkEntry registry
  * (it had passed 10k lines); entry bodies and oracle SQL are unchanged,
  * shared helpers stay on [[graft.SparkEntry]]. The CoreSpec source
  * tripwire scans every file in this package.
  */
private[graft] object MiscQueries {
  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "emb_cluster_drift" -> ((s, dir) => {
      // embedding-space drift between two dumps (even vec_ids = the
      // reference dump, odd = the new one): quantizer trained on A only,
      // both assigned under the FROZEN centroids, per-cell occupancy
      // shares in exact integer ppm — the semantic twin of
      // q_drift_report. The oracle reuses the trainPred k-means CTEs
      // (the ann_index_upsert form) + the full-corpus assignment chain.
      val emb = t(s, dir, "embeddings")
      Similarity.clusterDrift(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1), k = 4, iters = 2)
        .orderBy(col("cell"))
    }),
    "emb_int8_quant" -> ((s, dir) =>
      // scalar int8 storage audit: per-dim max-abs scales (collected as a
      // bounded dims-length global decision, folded back as ONE literal
      // array), then a single narrow row-local coding pass — integer sums
      // and an order-independent max error, so no ordered float folds
      Similarity.int8Quantize(t(s, dir, "embeddings"))
        .orderBy(col("vec_id"))),
    "emb_cluster_stats" -> ((s, dir) =>
      // the k-tuning audit for the IVF/SemDeDup family: per-cell size
      // (skew = the unsplittable probe/pair-scan unit) and coherence
      // (integer-summed rounded cosine + min/max spread); same trained
      // quantizer as ann_ivf_trained_topk, so the oracle replays the
      // identical Lloyd's CTEs plus a k-row aggregation
      Similarity.clusterStats(t(s, dir, "embeddings"), k = 4, iters = 2)
        .orderBy(col("cell"))),
    "emb_dim_stats" -> ((s, dir) =>
      // per-DIMENSION health audit: collapsed/dead coordinates and scale
      // drift, caught before an index is built. Values are fenced to
      // micro-unit integers first (explicit half-away-from-zero — the
      // int8 idiom), so every aggregate is an order-independent integer
      // fold; one explode + one dims-bounded map-side-combined agg
      Similarity.dimStats(t(s, dir, "embeddings"))
        .orderBy(col("i"))),
    "emb_dim_covariance" -> ((s, dir) =>
      // pairwise dimension redundancy screen: ONE corpus pass through the
      // bounded-buffer GramMatrixAgg (homogeneous coordinate carries the
      // first moments and n in the same 17 KB triangle — no explode, no
      // per-pair row blowup), then dims²-bounded local arithmetic; exact
      // integer covariance numerators, fenced-chain Pearson corr at 4 dp
      Similarity.dimCovariance(t(s, dir, "embeddings"), dims = 64)
        .orderBy(col("i"), col("j"))),
    "emb_effective_rank" -> ((s, dir) =>
      // participation ratio trace²/Σcov²: the one-number effective-
      // dimensionality screen (1 = collapsed, dims = isotropic) from the
      // same single Gram pass — read before pcaTop's loadings
      Similarity.effectiveRank(t(s, dir, "embeddings"), dims = 64,
        covDiv = pcaCovDiv)),
    "emb_pca_top" -> ((s, dir) =>
      // anisotropy screen: top-principal-component loadings + variance
      // share by fixed-round power iteration over the INTEGER-SCALED
      // covariance (sign·(|cov| DIV covDiv) — the float seam fenced away
      // before any float op); same single Gram pass as emb_dim_covariance,
      // then a d²-bounded driver decision; oracle unrolls the identical
      // three iterations with ordered list_reduce norms
      Similarity.pcaTop(t(s, dir, "embeddings"), dims = 64, covDiv = pcaCovDiv)
        .orderBy(col("i"))),
    "emb_anisotropy" -> ((s, dir) =>
      // common-direction bias census (cone concentration around the
      // corpus mean) — the check before trusting raw cosine scores;
      // integer-fenced mean direction, ordered-fold cosines, one row
      Similarity.anisotropy(t(s, dir, "embeddings"))),
    "emb_mean_pool" -> ((s, dir) =>
      // chunk→document pooling: 5 consecutive vecs per synthetic doc,
      // exact-decimal per-dimension means rounded at 6 dp, emitted
      // exploded (doc_id, i, v) — one explode + one keyed agg
      Similarity.meanPool(
        t(s, dir, "embeddings").select(
          expr("vec_id DIV 5").as("doc_id"), col("embedding")),
        "doc_id")
        .select(col("doc_id"), col("i"), (col("v") + lit(0.0)).as("v"))
        .orderBy(col("doc_id"), col("i"))),
    "hygiene_url_dedup" -> ((s, dir) =>
      Hygiene.urlDedup(withSyntheticUrl(t(s, dir, "documents")))
        .orderBy(col("canonical_url"))),
    "hygiene_domain_filter" -> ((s, dir) => {
      import s.implicits._
      Hygiene.domainFilter(
        withSyntheticUrl(t(s, dir, "documents")),
        Seq("example.org", "ads.invalid").toDF("domain"))
        .orderBy(col("doc_id"))
    }),

    "pipeline_prep" -> ((s, dir) =>
      // the composed corpus-prep flow: dedup → quality filter → splits;
      // the dedup stage serves the shared LSH pair artifact (same
      // (n, tau, banding) parameters — lshPairs' scaladoc)
      graft.operators.Pipeline.prepareCorpus(t(s, dir, "documents"),
          precomputedPairs = Some(lshPairs(s, dir)))
        .orderBy(col("doc_id"))),
    "pipeline_curate" -> ((s, dir) => {
      // the round-10 curation chain COMPOSED: normalization-robust exact
      // dedup (keep each normalized group's min id) → within-doc entropy
      // screen (≥ 2.8, the fixture's discriminating tail cut) → fixed
      // k-per-language sample via the two-level bounded-heap merge —
      // dedup → quality → sample, every stage independently verified,
      // the whole chain value-checked by ONE oracle. Entropy is
      // within-doc, so scoring the full corpus and intersecting with the
      // dedup keeps is identical to scoring the deduped set.
      val docs = t(s, dir, "documents")
      val keep = Dedup.exactNormalized(docs).select(col("keep_id").as("doc_id"))
      val kept = TextAnalysis.entropyStats(docs.join(keep, Seq("doc_id")))
        .filter(col("entropy") >= 2.8).select(col("doc_id"))
      // kept ⊆ keep by construction (its rows come from docs ⋈ keep), so
      // re-joining keep here was a redundant second execution of the
      // whole normalized-dedup subtree — one semi-filter by kept is the
      // identical row set (r20, guide §2.4: remove the exchange outright)
      val screened = docs.join(kept, Seq("doc_id"))
        .select(col("doc_id"), col("lang"))
      Splits.samplePerStratum(screened, "doc_id", "lang", k = 25, shards = 4, seed = 11)
        .select(col("doc_id"), col("lang"), col("sample_key"))
        .orderBy(col("lang"), col("sample_key"), col("doc_id"))
    }),
    "ret_eval" -> ((s, dir) => {
      // the ranking scorecard: BM25 top-10 per query evaluated against a
      // deterministic relevance set (docs sharing >= 2 distinct query
      // terms), integer MRR / precision@10 / recall@10; query 5's
      // relevance set is empty (zebra is OOV) — recall NULLs, not lies
      import s.implicits._
      val qs = Seq(
        (0L, "fast table scan"), (1L, "join query order"),
        (2L, "stream window batch"), (3L, "slow merge"),
        (4L, "customer value vector"), (5L, "zebra hash")
      ).toDF("query_id", "q_text")
      val docs = t(s, dir, "documents")
      // the BM25 top-10 list is the SHARED bm25Lex10 artifact (identical
      // query set and k; text_bm25_topk prices the inverted-index build)
      // — this row prices the qrels derivation + the scorecard join, not
      // a third BM25 build per sweep (r19 reroute)
      val results = bm25Lex10(s, dir)
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      val qt = qs.select(col("query_id"),
        explode(array_distinct(TextAnalysis.tokens(col("q_text")))).as("term"))
      val qrels = docs
        .select(col("doc_id"),
          explode(array_distinct(TextAnalysis.tokens(col("text")))).as("term"))
        .join(broadcast(qt), Seq("term"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(countDistinct(col("term")).as("nt"))
        .filter(col("nt") >= 2L)
        .select(col("query_id"), col("doc_id"))
      TextAnalysis.retrievalEval(results, qrels, k = 10)
        .orderBy(col("query_id"))
    }),
    "ret_phrase_topk" -> ((s, dir) => {
      // positional retrieval: exact occurrence counts of CONSECUTIVE
      // token sequences (what bag-of-words scoring cannot express), two
      // phrase lengths in one call, one query phrase absent from the
      // corpus (emits nothing — exact semantics). The oracle rebuilds
      // positional 2-/3-gram postings and replays the count + cut.
      import s.implicits._
      val qs = Seq(
        (0L, "fast table"), (1L, "table table"), (2L, "batch window spark"),
        (3L, "value fast merge"), (4L, "zebra hash stripe")
      ).toDF("query_id", "q_text")
      TextAnalysis.phraseTopK(t(s, dir, "documents"), qs, k = 10)
        .orderBy(col("query_id"), col("n_occurrences").desc, col("doc_id"))
    }),
    "ret_rrf_fusion" -> ((s, dir) => {
      // hybrid retrieval: BM25 lexical top-10 ∪ brute-cosine semantic
      // top-10 (queries 0-5: the q_text frame lexically, the id-aligned
      // embedding semantically), fused by integer reciprocal-rank —
      // rewards docs surfacing in EITHER modality without comparing
      // incomparable scores; fusion moves only queries × k × 2 rows
      // the lexical list is the shared bm25Lex10 artifact (standard
      // 6-query set defined there; text_bm25_topk prices the build)
      val lexW = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("doc_id"))
      val lex = bm25Lex10(s, dir)
        .withColumn("rank", row_number().over(lexW).cast("long"))
        .select(col("query_id"), col("doc_id"), col("rank"))
      val emb = t(s, dir, "embeddings")
      val sem = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 6), k = 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank").cast("long").as("rank"))
      TextAnalysis.rrfFuse(Seq(lex, sem), k = 5)
        .orderBy(col("query_id"), col("rrf_ppb").desc, col("doc_id"))
    }),
  )

  val oracles: Seq[(String, String)] = Seq(
    // training restricted to the even-parity reference dump (the
    // ann_index_upsert trainPred form); the serve chain's rfin/ncell
    // assign the FULL corpus under the frozen centroids, then parity
    // splits the per-cell counts and integer ppm shares compare them
    "emb_cluster_drift" -> (embCte +
      Similarity.kmeansOracleCtes(k = 4, iters = 2, trainPred = "vec_id % 2 = 0") +
      ivfTrainedServeCtes +
      """,pcounts AS (
        |  SELECT ncell.cell,
        |         CAST(SUM(CASE WHEN ncell.vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(SUM(CASE WHEN ncell.vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM ncell GROUP BY 1),
        |tt AS (SELECT CAST(SUM(n_a) AS BIGINT) AS ta, CAST(SUM(n_b) AS BIGINT) AS tb
        |       FROM pcounts)
        |SELECT p.cell, p.n_a, p.n_b,
        |       CAST((1000000 * p.n_a) // tt.ta AS BIGINT) AS share_a_ppm,
        |       CAST((1000000 * p.n_b) // tt.tb AS BIGINT) AS share_b_ppm,
        |       CAST(abs((1000000 * p.n_a) // tt.ta - (1000000 * p.n_b) // tt.tb) AS BIGINT)
        |         AS abs_drift_ppm
        |FROM pcounts p, tt ORDER BY p.cell""".stripMargin),
    "emb_int8_quant" -> (embCte +
      // identical IEEE-double expression order (abs(v)/s*127 + 0.5) and
      // explicit half-away-from-zero floor — no reliance on either
      // engine's round() tie rule; sums are integer, error is MAX
      """, sc AS (SELECT i, MAX(abs(v)) AS s FROM f GROUP BY 1),
        |cq AS (
        |  SELECT f.vec_id, f.v, sc.s,
        |         CASE WHEN sc.s = 0 THEN 0
        |              ELSE CAST(sign(f.v) * floor(abs(f.v)/sc.s*127 + 0.5) AS BIGINT)
        |         END AS code
        |  FROM f JOIN sc USING (i))
        |SELECT vec_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_dims,
        |       CAST(SUM(code) AS BIGINT) AS sum_code,
        |       CAST(SUM(abs(code)) AS BIGINT) AS sum_abs_code,
        |       CAST(SUM(CASE WHEN abs(code) = 127 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_saturated,
        |       ROUND(MAX(abs(v - code*s/127)), 6)+0.0 AS max_abs_err
        |FROM cq GROUP BY 1 ORDER BY vec_id""".stripMargin),
    "emb_cluster_stats" -> (embCte +
      Similarity.kmeansOracleCtes(k = 4, iters = 2) + ivfTrainedServeCtes +
      // dfin/cn2 from the shared serving chain: per-(vec, cell) dots under
      // the final centroids; rn = 1 is the assignment, its rounded cosine
      // the audited coherence (summed as exact integers ×10⁴)
      """, vcs AS (
        |  SELECT dfin.vec_id, dfin.cell,
        |         ROUND(dfin.dot/(nrm.nrm*cn2.cnrm),4)+0.0 AS cosine,
        |         row_number() OVER (PARTITION BY dfin.vec_id
        |           ORDER BY ROUND(dfin.dot/(nrm.nrm*cn2.cnrm),4) DESC, dfin.cell) AS rn
        |  FROM dfin JOIN nrm ON nrm.vec_id=dfin.vec_id
        |            JOIN cn2 ON cn2.cell=dfin.cell)
        |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |       CAST(SUM(CAST(ROUND(cosine*10000) AS BIGINT)) AS BIGINT) AS sum_cos_e4,
        |       MIN(cosine)+0.0 AS min_cos, MAX(cosine)+0.0 AS max_cos
        |FROM vcs WHERE rn = 1 GROUP BY 1 ORDER BY cell""".stripMargin),
    "emb_dim_stats" -> (embCte +
      // identical IEEE-double fencing expression on both sides
      // (sign(v)·floor(|v|·10⁶ + 0.5) — no engine round() tie rule), then
      // pure integer aggregates; sums CAST from DuckDB's HUGEINT
      """, g AS (
        |  SELECT CAST(i AS BIGINT) AS i,
        |         CAST(sign(v) * floor(abs(v)*1000000 + 0.5) AS BIGINT) AS v6
        |  FROM f)
        |SELECT i, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CASE WHEN v6 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dead,
        |       CAST(SUM(v6) AS BIGINT) AS sum_e6,
        |       CAST(SUM(v6*v6) AS BIGINT) AS sum_sq_e12,
        |       MIN(v6) AS min_e6, MAX(v6) AS max_e6
        |FROM g GROUP BY 1 ORDER BY i""".stripMargin),
    "emb_dim_covariance" -> (embCte + dimMomentCtes +
      // covariance numerators in HUGEINT cast to BIGINT, corr as the
      // identical fixed-order IEEE chain (int→double casts correctly
      // rounded in both engines), ROUND(…,4)+0.0
      """SELECT p.i, p.j, CAST(si.n AS BIGINT) AS n,
        |       CAST(p.s_ij AS BIGINT) AS sum_ij_e12,
        |       CAST(si.n*p.s_ij - si.s1*sj.s1 AS BIGINT) AS cov_e12,
        |       CASE WHEN si.n*si.s2 - si.s1*si.s1 = 0 OR sj.n*sj.s2 - sj.s1*sj.s1 = 0
        |            THEN NULL
        |            ELSE ROUND(CAST(si.n*p.s_ij - si.s1*sj.s1 AS DOUBLE) /
        |                 sqrt(CAST(si.n*si.s2 - si.s1*si.s1 AS DOUBLE) *
        |                      CAST(sj.n*sj.s2 - sj.s1*sj.s1 AS DOUBLE)), 4) + 0.0
        |       END AS corr
        |FROM p JOIN st si ON si.i = p.i JOIN st sj ON sj.i = p.j
        |ORDER BY p.i, p.j""".stripMargin),
    "emb_effective_rank" -> (embCte + dimMomentCtes +
      // upper triangle + diagonal of the SCALED integer covariance (the
      // pcaTop sign·(|c| // covDiv) fence — raw numerators square past
      // INT128); the Frobenius fold counts off-diagonal cells twice; one
      // positive HUGEINT floor at the end
      s""",cvr AS (
         |  SELECT p.i AS i, p.j AS j, si.n*p.s_ij - si.s1*sj.s1 AS c
         |  FROM p JOIN st si ON si.i = p.i JOIN st sj ON sj.i = p.j
         |  UNION ALL
         |  SELECT i, i, n*s2 - s1*s1 FROM st),
         |cv AS (
         |  SELECT i, j,
         |         CASE WHEN c < 0 THEN -((-c) // $pcaCovDiv) ELSE c // $pcaCovDiv END AS c
         |  FROM cvr),
         |""".stripMargin +
      """aggm AS (SELECT
        |    SUM(CASE WHEN i = j THEN c ELSE 0 END) AS tr,
        |    SUM(CASE WHEN i = j THEN c*c ELSE 2*c*c END) AS ss
        |  FROM cv),
        |n1 AS (SELECT CAST(MIN(n) AS BIGINT) AS nv FROM st)
        |SELECT CAST(64 AS BIGINT) AS dims, n1.nv AS n_vecs,
        |       CASE WHEN aggm.ss = 0 THEN NULL
        |            ELSE CAST((1000000 * aggm.tr * aggm.tr) // aggm.ss AS BIGINT)
        |       END AS eff_rank_ppm
        |FROM aggm, n1""".stripMargin),
    "emb_pca_top" -> (embCte + dimMomentCtes +
      // full scaled-integer covariance (both triangles + diagonal; `//` on
      // the non-negative abs = truncation toward zero in both engines),
      // deterministic non-uniform seed, three unrolled power-iteration
      // rounds, then Rayleigh/trace as an ordered (i, j) double fold
      s""",covfull AS MATERIALIZED (
         |  SELECT i, j,
         |         CASE WHEN c < 0 THEN -((-c) // $pcaCovDiv) ELSE c // $pcaCovDiv END AS cv
         |  FROM (
         |    SELECT p.i AS i, p.j AS j, si.n*p.s_ij - si.s1*sj.s1 AS c
         |    FROM p JOIN st si ON si.i = p.i JOIN st sj ON sj.i = p.j
         |    UNION ALL
         |    SELECT p.j, p.i, si.n*p.s_ij - si.s1*sj.s1
         |    FROM p JOIN st si ON si.i = p.i JOIN st sj ON sj.i = p.j
         |    UNION ALL
         |    SELECT i, i, n*s2 - s1*s1 FROM st) raw),
         |v0 AS MATERIALIZED (
         |       SELECT CAST(r.i AS BIGINT) AS i, CAST(1000000 + 1000*r.i AS HUGEINT) AS x
         |       FROM range(1, ${rpInDims + 1}) r(i)),
         |""".stripMargin + pcaIterCtes(3) +
      """ray AS (SELECT list_reduce(
        |          list(CAST(cf.cv AS DOUBLE) * CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)
        |               ORDER BY cf.i, cf.j), (x,y) -> x+y) AS num
        |        FROM covfull cf JOIN v3 a ON a.i = cf.i JOIN v3 b ON b.i = cf.j),
        |dn AS (SELECT CAST(SUM(x*x) AS DOUBLE) AS den FROM v3),
        |tr AS (SELECT CAST(SUM(CASE WHEN i = j THEN cv ELSE 0 END) AS DOUBLE) AS t FROM covfull)
        |SELECT CAST(v3.i AS BIGINT) AS i, CAST(v3.x AS BIGINT) AS loading_e6,
        |       CASE WHEN dn.den = 0 OR tr.t = 0 THEN NULL
        |            ELSE CAST(sign(ray.num / dn.den / tr.t) *
        |                 floor(abs(ray.num / dn.den / tr.t) * 1000000 + 0.5) AS BIGINT)
        |       END AS var_top_ppm
        |FROM v3, ray, dn, tr ORDER BY i""".stripMargin),
    "emb_anisotropy" -> (embCte +
      // μ fenced to exact integer e-4 per dim (sign-safe floor division —
      // abs before // so engine division semantics never meet a negative),
      // then the house ordered-fold cosine at 4 dp vs exact literals
      """, g AS (
        |  SELECT vec_id, i,
        |         CAST(sign(v) * floor(abs(v)*10000 + 0.5) AS BIGINT) AS x
        |  FROM f),
        |mu AS (
        |  SELECT i, CAST(sign(SUM(x)) * (abs(SUM(x)) // COUNT(*)) AS BIGINT) AS m4
        |  FROM g GROUP BY i),
        |mun AS (
        |  SELECT sqrt(list_reduce(
        |           list((CAST(m4 AS DOUBLE)/10000.0)*(CAST(m4 AS DOUBLE)/10000.0)
        |                ORDER BY i), (a, b) -> a + b)) AS munrm,
        |         CAST(SUM(m4*m4) AS BIGINT) AS mu_norm_sq_e8
        |  FROM mu),
        |d AS (
        |  SELECT f.vec_id,
        |         list_reduce(list(f.v * (CAST(mu.m4 AS DOUBLE)/10000.0)
        |                          ORDER BY f.i), (a, b) -> a + b) AS dot
        |  FROM f JOIN mu ON mu.i = f.i GROUP BY 1),
        |c AS (
        |  SELECT ROUND(d.dot/(nrm.nrm * mun.munrm), 4) AS cs
        |  FROM d JOIN nrm ON nrm.vec_id = d.vec_id CROSS JOIN mun)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |       (SELECT mu_norm_sq_e8 FROM mun) AS mu_norm_sq_e8,
        |       CAST(SUM(CASE WHEN cs < 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cos_lt_0,
        |       CAST(SUM(CASE WHEN cs >= 0.25 THEN 1 ELSE 0 END) AS BIGINT) AS n_cos_ge_25,
        |       CAST(SUM(CASE WHEN cs >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_cos_ge_50,
        |       CAST(SUM(CASE WHEN cs >= 0.75 THEN 1 ELSE 0 END) AS BIGINT) AS n_cos_ge_75,
        |       CAST(SUM(CASE WHEN cs >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_cos_ge_90
        |FROM c""".stripMargin),
    "emb_mean_pool" -> (embCte +
      // the kmeans c{r} per-dimension decimal-mean formula applied to
      // the DIV-5 grouping; i is 1-based on both sides
      """SELECT vec_id // 5 AS doc_id, i,
        |       ROUND(CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*), 6)+0.0
        |         AS v
        |FROM f GROUP BY 1, 2 ORDER BY doc_id, i""".stripMargin),
    "pipeline_prep" -> (shingleCte + {
      val splitCase = graft.operators.Splits.splitCaseSql(
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      s""", dropped AS (
         |  SELECT DISTINCT p.b AS doc_id
         |  FROM p JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b
         |  WHERE CAST(p.c AS DOUBLE)/(na.n+nb.n-p.c) >= 0.6),
         |q AS (
         |  SELECT doc_id, lang,
         |         CAST(len(string_split(lower(text),' ')) AS BIGINT) AS n_tokens,
         |         CAST(length(regexp_replace(lower(text),'[^a-z]','','g')) AS DOUBLE)/CAST(length(text) AS BIGINT) AS alpha_ratio
         |  FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),
         |sc AS (
         |  SELECT doc_id, lang, n_tokens,
         |         ROUND(least(1.0, CAST(n_tokens AS DOUBLE)/100.0)*0.5 + alpha_ratio*0.5, 6) AS quality_score
         |  FROM q)
         |SELECT doc_id, $splitCase AS split, lang, n_tokens, quality_score
         |FROM sc WHERE quality_score >= 0.55 ORDER BY doc_id""".stripMargin
    }),
    // the identical rounding chain as Splits.temperatureMix: exact p, powers
    // ROUNDED to 6 before anything downstream, DECIMAL normalizer sum,
    // single rounded divisions for q and sample_rate
    "pipeline_curate" ->
      // replays the three verified stages as one chain: the normalized
      // dedup key, the fenced-ln entropy (computed corpus-wide —
      // within-doc, so intersecting with the keeps is identical), and
      // the per-stratum sample window
      """WITH nk AS (
        |  SELECT doc_id,
        |         md5(nfc_normalize(regexp_replace(trim(lower(text)), '[ \t\n\r]+', ' ', 'g'))) AS k
        |  FROM documents),
        |keep AS (SELECT MIN(doc_id) AS doc_id FROM nk GROUP BY k),
        |tok AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS w FROM documents),
        |wc AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY 1,2),
        |nd AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM wc GROUP BY 1),
        |tm AS (
        |  SELECT wc.doc_id, nd.n,
        |         ROUND(CAST(wc.c AS DOUBLE) *
        |           (ROUND(ln(CAST(wc.c AS DOUBLE)),6) - ROUND(ln(CAST(nd.n AS DOUBLE)),6)),
        |           6) AS term
        |  FROM wc JOIN nd USING (doc_id)),
        |ent AS (
        |  SELECT doc_id FROM tm GROUP BY doc_id
        |  HAVING ROUND(-CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE)/MAX(n), 6)+0.0
        |         >= 2.8),
        |sel AS (
        |  SELECT d.doc_id, d.lang FROM documents d
        |  JOIN keep USING (doc_id) JOIN ent USING (doc_id))
        |SELECT doc_id, lang, sample_key FROM (
        |  SELECT doc_id, lang,
        |         md5(CAST(doc_id AS VARCHAR)||':11') AS sample_key,
        |         row_number() OVER (
        |           PARTITION BY lang
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)||':11'), doc_id) AS rn
        |  FROM sel)
        |WHERE rn <= 25 ORDER BY lang, sample_key, doc_id""".stripMargin,
    "hygiene_url_dedup" ->
      // the synthetic-url CASE mirrors withSyntheticUrl; the
      // canonicalization CTE chain mirrors Hygiene.canonicalizeUrl step
      // for step (fragment, lower scheme/host, default port, www,
      // tracked params, trailing ?/). DuckDB regexp_replace needs the
      // explicit 'g' flag where Spark replaces all matches
      """WITH raw AS (
        |  SELECT doc_id,
        |    CASE doc_id % 5
        |      WHEN 0 THEN 'https://example.com/articles/' || CAST(doc_id % 8 AS VARCHAR)
        |      WHEN 1 THEN 'HTTPS://WWW.EXAMPLE.COM/articles/' || CAST(doc_id % 8 AS VARCHAR) || '/'
        |      WHEN 2 THEN 'https://example.com:443/articles/' || CAST(doc_id % 8 AS VARCHAR) || '?utm_source=feed&utm_medium=rss'
        |      WHEN 3 THEN 'https://example.com/articles/' || CAST(doc_id % 8 AS VARCHAR) || '?utm_campaign=x&id=' || CAST(doc_id % 7 AS VARCHAR) || '#frag'
        |      ELSE 'http://tracker.example.org:80/articles/' || CAST(doc_id % 8 AS VARCHAR) || '?fbclid=abc'
        |    END AS url
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(url, '#.*', '') AS f FROM raw),
        |s2 AS (SELECT doc_id, f,
        |       lower(regexp_extract(f, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |       lower(regexp_extract(f, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport
        |       FROM s1),
        |s3 AS (SELECT doc_id, scheme,
        |       CASE WHEN scheme = 'http' AND hostport LIKE '%:80' THEN substr(hostport, 1, length(hostport)-3)
        |            WHEN scheme = 'https' AND hostport LIKE '%:443' THEN substr(hostport, 1, length(hostport)-4)
        |            ELSE hostport END AS h1,
        |       CASE WHEN scheme = '' THEN f
        |            ELSE substr(f, length(scheme) + 3 + length(hostport) + 1) END AS rest
        |       FROM s2),
        |s4 AS (SELECT doc_id, scheme,
        |       CASE WHEN h1 LIKE 'www.%' THEN substr(h1, 5) ELSE h1 END AS host,
        |       regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |         rest, '&(utm_[^=&]*|fbclid|gclid)=[^&]*', '', 'g'),
        |         '\?(utm_[^=&]*|fbclid|gclid)=[^&]*&', '?'),
        |         '\?(utm_[^=&]*|fbclid|gclid)=[^&]*$', ''),
        |         '\?$', '') AS r
        |       FROM s3),
        |s5 AS (SELECT doc_id,
        |       CASE WHEN scheme = '' THEN r ELSE scheme || '://' || host || r END AS j
        |       FROM s4),
        |canon AS (SELECT doc_id,
        |       CASE WHEN j LIKE '%/' AND j NOT LIKE '%://' THEN substr(j, 1, length(j)-1) ELSE j END AS canonical_url
        |       FROM s5)
        |SELECT canonical_url, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM canon GROUP BY 1 ORDER BY 1""".stripMargin,
    "hygiene_domain_filter" ->
      // same canonicalization chain; registered domain = last two
      // dot-labels of the (port-stripped) host; blocklist anti-join
      """WITH raw AS (
        |  SELECT doc_id,
        |    CASE doc_id % 5
        |      WHEN 0 THEN 'https://example.com/articles/' || CAST(doc_id % 8 AS VARCHAR)
        |      WHEN 1 THEN 'HTTPS://WWW.EXAMPLE.COM/articles/' || CAST(doc_id % 8 AS VARCHAR) || '/'
        |      WHEN 2 THEN 'https://example.com:443/articles/' || CAST(doc_id % 8 AS VARCHAR) || '?utm_source=feed&utm_medium=rss'
        |      WHEN 3 THEN 'https://example.com/articles/' || CAST(doc_id % 8 AS VARCHAR) || '?utm_campaign=x&id=' || CAST(doc_id % 7 AS VARCHAR) || '#frag'
        |      ELSE 'http://tracker.example.org:80/articles/' || CAST(doc_id % 8 AS VARCHAR) || '?fbclid=abc'
        |    END AS url
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(url, '#.*', '') AS f FROM raw),
        |s2 AS (SELECT doc_id, f,
        |       lower(regexp_extract(f, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |       lower(regexp_extract(f, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport
        |       FROM s1),
        |s3 AS (SELECT doc_id, scheme,
        |       CASE WHEN scheme = 'http' AND hostport LIKE '%:80' THEN substr(hostport, 1, length(hostport)-3)
        |            WHEN scheme = 'https' AND hostport LIKE '%:443' THEN substr(hostport, 1, length(hostport)-4)
        |            ELSE hostport END AS h1,
        |       CASE WHEN scheme = '' THEN f
        |            ELSE substr(f, length(scheme) + 3 + length(hostport) + 1) END AS rest
        |       FROM s2),
        |s4 AS (SELECT doc_id, scheme,
        |       CASE WHEN h1 LIKE 'www.%' THEN substr(h1, 5) ELSE h1 END AS host,
        |       regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |         rest, '&(utm_[^=&]*|fbclid|gclid)=[^&]*', '', 'g'),
        |         '\?(utm_[^=&]*|fbclid|gclid)=[^&]*&', '?'),
        |         '\?(utm_[^=&]*|fbclid|gclid)=[^&]*$', ''),
        |         '\?$', '') AS r
        |       FROM s3),
        |s5 AS (SELECT doc_id,
        |       CASE WHEN scheme = '' THEN r ELSE scheme || '://' || host || r END AS j
        |       FROM s4),
        |canon AS (SELECT doc_id,
        |       CASE WHEN j LIKE '%/' AND j NOT LIKE '%://' THEN substr(j, 1, length(j)-1) ELSE j END AS canonical_url
        |       FROM s5),
        |dom AS (SELECT doc_id, canonical_url,
        |       regexp_extract(regexp_replace(
        |         regexp_extract(canonical_url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
        |         ':[0-9]+$', ''), '([^.]+\.[^.]+)$', 1) AS domain
        |       FROM canon)
        |SELECT doc_id, canonical_url, domain FROM dom
        |WHERE domain NOT IN ('example.org', 'ads.invalid')
        |ORDER BY doc_id""".stripMargin,
    "ret_eval" -> (bm25OracleCtes +
      // the eval tail: relevance = docs sharing >= 2 distinct query
      // terms, then the integer MRR / precision@10 / recall@10 algebra
      // over the full outer of per-query relevance and result aggs
      """,
        |res AS (SELECT query_id, doc_id, CAST(rn AS BIGINT) AS rnk
        |        FROM rk WHERE rn <= 10),
        |dt AS (SELECT doc_id,
        |              unnest(list_distinct(string_split(lower(text), ' '))) AS term
        |       FROM documents),
        |qr AS (SELECT qt.query_id, dt.doc_id
        |       FROM dt JOIN qt USING (term)
        |       GROUP BY 1, 2 HAVING COUNT(DISTINCT term) >= 2),
        |nr AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
        |       FROM qr GROUP BY 1),
        |mk AS (SELECT res.query_id, res.rnk,
        |              CASE WHEN qr.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_rel
        |       FROM res LEFT JOIN qr ON qr.query_id = res.query_id
        |                            AND qr.doc_id = res.doc_id),
        |pq AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_results,
        |              CAST(MIN(CASE WHEN is_rel = 1 THEN rnk END) AS BIGINT)
        |                AS first_rel_rank,
        |              CAST(SUM(CASE WHEN is_rel = 1 AND rnk <= 10 THEN 1 ELSE 0 END)
        |                AS BIGINT) AS hits_at_k
        |       FROM mk GROUP BY 1)
        |SELECT CAST(query_id AS BIGINT) AS query_id,
        |       COALESCE(pq.n_results, 0) AS n_results,
        |       COALESCE(nr.n_rel, 0) AS n_rel,
        |       pq.first_rel_rank,
        |       CAST(CASE WHEN pq.first_rel_rank IS NOT NULL
        |            THEN 1000000 // pq.first_rel_rank END AS BIGINT) AS mrr_ppm,
        |       COALESCE(pq.hits_at_k, 0) AS hits_at_k,
        |       CAST((1000000 * COALESCE(pq.hits_at_k, 0)) // 10 AS BIGINT)
        |         AS precision_at_k_ppm,
        |       CAST(CASE WHEN COALESCE(nr.n_rel, 0) > 0
        |            THEN (1000000 * COALESCE(pq.hits_at_k, 0)) // nr.n_rel
        |            END AS BIGINT) AS recall_at_k_ppm
        |FROM nr FULL OUTER JOIN pq USING (query_id)
        |ORDER BY query_id""".stripMargin),
    "ret_phrase_topk" ->
      // positional postings from token subscripts; 2- and 3-gram lanes
      // unioned (phrase equality cannot cross lengths — the space counts
      // differ); integer occurrence counts, rank cut at 10
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text),' ')) AS w,
        |         generate_subscripts(string_split(lower(text),' '),1) AS i
        |  FROM documents),
        |g2 AS (SELECT a.doc_id, a.w||' '||b.w AS phrase
        |       FROM tok a JOIN tok b ON a.doc_id=b.doc_id AND b.i=a.i+1),
        |g3 AS (SELECT a.doc_id, a.w||' '||b.w||' '||c.w AS phrase
        |       FROM tok a JOIN tok b ON a.doc_id=b.doc_id AND b.i=a.i+1
        |                  JOIN tok c ON a.doc_id=c.doc_id AND c.i=a.i+2),
        |q(query_id, phrase) AS (VALUES
        |  (0, 'fast table'), (1, 'table table'), (2, 'batch window spark'),
        |  (3, 'value fast merge'), (4, 'zebra hash stripe')),
        |h AS (SELECT q.query_id, g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        |      FROM (SELECT * FROM g2 UNION ALL SELECT * FROM g3) g
        |      JOIN q ON q.phrase = g.phrase GROUP BY 1, 2),
        |r AS (SELECT query_id, doc_id, n_occurrences,
        |             row_number() OVER (PARTITION BY query_id
        |                                ORDER BY n_occurrences DESC, doc_id) AS rn
        |      FROM h)
        |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, n_occurrences
        |FROM r WHERE rn <= 10
        |ORDER BY query_id, n_occurrences DESC, doc_id""".stripMargin,
    "ret_rrf_fusion" -> (embCte +
      // hybrid fusion oracle: the text_bm25_topk chain (same query VALUES,
      // same 6-dp ln/contrib fences) ranked to top-10, the ann_cosine_topk
      // chain restricted to queries 0-5 ranked to top-10, then INTEGER
      // reciprocal-rank fusion (10⁹ // (60+rank), BIGINT sums — no float
      // in the fusion anywhere) cut to top-5 per query
      """, q(query_id, q_text) AS (VALUES
        |  (0, 'fast table scan'), (1, 'join query order'),
        |  (2, 'stream window batch'), (3, 'slow merge'),
        |  (4, 'customer value vector'), (5, 'zebra hash')),
        |qt AS (SELECT query_id,
        |              unnest(list_distinct(string_split(lower(q_text), ' '))) AS term
        |       FROM q),
        |t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM t),
        |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl),
        |tok AS (SELECT doc_id, unnest(w) AS term FROM t),
        |p AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
        |      WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2),
        |dfq AS (SELECT term, COUNT(*) AS df FROM p GROUP BY 1),
        |contrib AS (
        |  SELECT qt.query_id, p.doc_id,
        |         ROUND(ROUND(ln(1.0 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)), 6) *
        |           (CAST(p.tf AS DOUBLE) * (1.2 + 1.0)) /
        |           (p.tf + 1.2 * (1.0 - 0.75 +
        |             0.75 * dl.dl / (CAST(s.total_dl AS DOUBLE) / s.n_docs))), 6) AS c
        |  FROM p
        |  JOIN qt USING (term) JOIN dfq USING (term) JOIN dl USING (doc_id)
        |  CROSS JOIN stats s),
        |sc AS (SELECT query_id, doc_id,
        |       ROUND(CAST(SUM(CAST(c AS DECIMAL(28,12))) AS DOUBLE), 6) AS score
        |       FROM contrib GROUP BY 1, 2),
        |lexr AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
        |                CAST(row_number() OVER (PARTITION BY query_id
        |                     ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
        |         FROM sc),
        |lex AS (SELECT query_id, doc_id, rnk FROM lexr WHERE rnk <= 10),
        |semd AS (SELECT qf.vec_id AS query_id, nf.vec_id AS doc_id,
        |                list_reduce(list(qf.v*nf.v ORDER BY qf.i), (x,y) -> x+y) AS dot
        |         FROM f qf JOIN f nf ON qf.i=nf.i AND qf.vec_id<6 AND qf.vec_id<>nf.vec_id
        |         GROUP BY 1,2),
        |sems AS (SELECT query_id, doc_id, ROUND(dot/(nq.nrm*nn2.nrm),4)+0.0 AS score
        |         FROM semd JOIN nrm nq ON nq.vec_id=semd.query_id
        |                   JOIN nrm nn2 ON nn2.vec_id=semd.doc_id),
        |semr AS (SELECT query_id, doc_id,
        |                CAST(row_number() OVER (PARTITION BY query_id
        |                     ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
        |         FROM sems),
        |sem AS (SELECT query_id, doc_id, rnk FROM semr WHERE rnk <= 10),
        |u AS (SELECT query_id, doc_id, 1000000000 // (60 + rnk) AS c
        |      FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem)),
        |fz AS (SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS rrf_ppb,
        |              CAST(COUNT(*) AS BIGINT) AS n_lists
        |       FROM u GROUP BY 1,2),
        |rrk AS (SELECT fz.*, row_number() OVER (PARTITION BY query_id
        |               ORDER BY rrf_ppb DESC, doc_id) AS rr FROM fz)
        |SELECT query_id, doc_id, rrf_ppb, n_lists
        |FROM rrk WHERE rr <= 5 ORDER BY query_id, rrf_ppb DESC, doc_id""".stripMargin),
  )
}
