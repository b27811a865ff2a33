package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Assoc, Dedup, DiskUsageOp, Graph, Hygiene, Joins, Layout, Multimodal, Similarity, Splits, Temporal, TextAnalysis}
import graft.SparkEntry._

/** approximate-nearest-neighbor rows — mechanically split out of the monolithic SparkEntry registry
  * (it had passed 10k lines); entry bodies and oracle SQL are unchanged,
  * shared helpers stay on [[graft.SparkEntry]]. The CoreSpec source
  * tripwire scans every file in this package.
  */
private[graft] object AnnQueries {
  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // -------- similarity search (SURVEY §2.12)
    "ann_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
        .select(col("query_id"), col("neighbor_id"), col("score"), col("rank").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_lsh_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val planes = Similarity.prepared(emb.filter(col("vec_id") < 4), "vec_id", "embedding")
        .select(col("id").as("plane_id"), col("v").as("pv"))
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), planes, k = 3)
        .select(col("query_id"), col("neighbor_id"), col("score"), col("rank").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),

    "ann_lsh_banded_topk" -> ((s, dir) => {
      // band-OR multi-probe: candidates collide in ANY of 2 bands × 2 planes
      // — the recall knob the single-bucket probe lacks
      val emb = t(s, dir, "embeddings")
      val planes = Similarity.prepared(emb.filter(col("vec_id") < 4), "vec_id", "embedding")
        .select(col("id").as("plane_id"), col("v").as("pv"))
      Similarity.lshTopKBanded(emb, emb.filter(col("vec_id") < 10), planes, bands = 2, k = 3)
        .select(col("query_id"), col("neighbor_id"), col("score"), col("rank").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = Similarity.prepared(emb.filter(col("vec_id") < 4), "vec_id", "embedding")
        .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), cents, k = 3)
        .select(col("query_id"), col("neighbor_id"), col("score"), col("rank").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_filtered_topk" -> ((s, dir) => {
      // metadata-FILTERED serving: top-3 among label=1 vectors only — the
      // predicate prunes the index side BEFORE the cell join (pushdown on
      // a persisted index), queries stay unfiltered. Oracle replays the
      // identical probe with the label join on the candidate side.
      val emb = t(s, dir, "embeddings")
      val cents = Similarity.prepared(emb.filter(col("vec_id") < 4), "vec_id", "embedding")
        .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
      Similarity.filteredIvfTopK(emb, emb.filter(col("vec_id") < 10), cents,
          k = 3, pred = col("label") === 1)
        .select(col("query_id"), col("neighbor_id"), col("score"), col("rank").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_ivf_trained_topk" -> ((s, dir) => {
      // END-TO-END IVF: deterministic k-means quantizer training (2 Lloyd's
      // rounds, md5-bucket init) + nprobe=2 multi-probe serving — the oracle
      // replays the identical training loop in SQL (decimal-exact means,
      // rounded-cosine assignment), so the full train→index→query path is
      // value-checked, not just the serving join
      val emb = t(s, dir, "embeddings")
      val cents = coarseCents4(s, dir)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), cents, k = 3, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"), col("score"), col("rank").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_index_upsert" -> ((s, dir) => {
      // index GROWTH: build the persisted artifact on the base corpus
      // (quantizer trained on vec_id < 400 only), append the delta with
      // the FROZEN quantizer, serve off the grown artifact. The oracle
      // restricts training to the same base predicate and serves the full
      // corpus — grown-index serving is value-pinned ≡ a union rebuild
      // under the same centroids. Per-process scratch path; build's
      // overwrite resets the corpus dir each invocation, so bench
      // iterations cannot double-append.
      val emb = t(s, dir, "embeddings")
      val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
        s"/graft_ann_upsert_${ProcessHandle.current().pid()}"
      graft.sources.AnnIndex.build(
        emb.filter(col("vec_id") < 400), k = 4, iters = 2, path)
      graft.sources.AnnIndex.append(s, path, emb.filter(col("vec_id") >= 400))
      val idx = graft.sources.AnnIndex.load(s, path)
      graft.sources.AnnIndex.topK(idx, emb.filter(col("vec_id") < 10), k = 3, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"), col("score"), col("rank").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_recall_eval_pq" -> ((s, dir) => {
      // completes the recall suite (ivf/lsh/matryoshka/rp/pq): per-query
      // recall of the IVF-PQ serving path against the exact-L2 brute
      // baseline — L2, not cosine, because that is the metric PQ serves
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val model = pqModel2(s, dir, 1.0)
      val approx = Similarity.pqServe(pqCodes(s, dir, 1.0),
        Similarity.pqQueryTables(q, model, nprobe = 2),
        preparedEmb(s, dir), q, k = 3, rerank = 50, model)
      Similarity.recallAt(approx, Similarity.bruteForceTopKL2(emb, q, k = 3))
        .orderBy(col("query_id"))
    }),
    "ann_recall_eval" -> ((s, dir) => {
      // the ANN TUNING measurement as a first-class operator: per-query
      // recall of the trained-IVF serving path against exact brute force —
      // the number a deployment sweeps nprobe/k' against. Both sides are
      // the registry's own verified operators; the oracle replays both
      // chains and the same recall join.
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val cents = coarseCents4(s, dir)
      val approx = Similarity.ivfTopK(emb, q, cents, k = 3, nprobe = 2)
      Similarity.recallAt(approx, bruteTruth3(s, dir))
        .orderBy(col("query_id"))
    }),
    "ann_recall_eval_lsh" -> ((s, dir) => {
      // the same recall measurement swept over a SECOND approximate
      // family: banded-LSH serving vs the identical exact baseline.
      // recallAt takes any two top-k frames — this row keeps its oracle
      // honest about that (not coupled to the trained-IVF chain alone).
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val planes = Similarity.prepared(emb.filter(col("vec_id") < 4), "vec_id", "embedding")
        .select(col("id").as("plane_id"), col("v").as("pv"))
      val approx = Similarity.lshTopKBanded(emb, q, planes, bands = 2, k = 3)
      Similarity.recallAt(approx, bruteTruth3(s, dir))
        .orderBy(col("query_id"))
    }),
    "ann_binary_topk" -> ((s, dir) => {
      // binary-quantization serving: 16-byte sign codes, integer Hamming
      // shortlist (top-20), exact cosine rerank to top-3 — the memory-
      // tier ANN trade, oracle-replayed bit-for-bit (codes, xor
      // bit_count, both rank stages)
      val emb = t(s, dir, "embeddings")
      Similarity.binaryHammingTopK(emb, emb.filter(col("vec_id") < 10),
          k = 3, rerank = 20)
        .select(col("query_id"), col("neighbor_id"), col("hamming"),
          col("score"), col("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_binary_banded_topk" -> ((s, dir) => {
      // the binary family's SCALE path: byte-slice band collisions (8
      // bands × 8 bits, the simhash pigeonhole — Hamming < 8 is
      // candidate-guaranteed) replace the full code scan; shared
      // shortlist/rerank tail, value-pinned by the banded oracle chain
      val emb = t(s, dir, "embeddings")
      Similarity.binaryHammingTopKBanded(emb, emb.filter(col("vec_id") < 10),
          k = 3, rerank = 20, bands = 8)
        .select(col("query_id"), col("neighbor_id"), col("hamming"),
          col("score"), col("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_recall_eval_binary_banded" -> ((s, dir) => {
      // the banded form's own recall row: prices BOTH trades at once
      // (sign-code quantization + band-collision candidate loss) against
      // the exact float baseline — the number that decides whether the
      // scale path is safe for a given corpus
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val approx = Similarity.binaryHammingTopKBanded(emb, q, k = 3, rerank = 20, bands = 8)
      Similarity.recallAt(approx, bruteTruth3(s, dir))
        .orderBy(col("query_id"))
    }),
    "ann_recall_eval_binary" -> ((s, dir) => {
      // the binary family through the same recall tail as ivf/lsh/
      // matryoshka/rp/pq — every approximate family ships with its
      // measured recall row
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val approx = Similarity.binaryHammingTopK(emb, q, k = 3, rerank = 20)
      Similarity.recallAt(approx, bruteTruth3(s, dir))
        .orderBy(col("query_id"))
    }),
    "ann_nprobe_sweep" -> ((s, dir) => {
      // the IVF TUNING SURFACE as one verified frame: recall vs candidate
      // volume swept over the probe knob (nprobe = 1..3) against the exact
      // brute baseline — the dedup_threshold_sweep discipline applied to
      // the ANN serving family. Exact scoring is paid ONCE at maxNprobe;
      // each sweep point re-ranks the probe_rank-filtered candidates
      // (exactly ivfTopK at that nprobe — EngineSpec pins the equivalence
      // per point). The oracle replays training, the ranked probe
      // assignment, the shared-scoring fan-out, and the micro-averaged
      // recall tail.
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val cents = coarseCents4(s, dir)
      Similarity.nprobeSweep(emb, q, cents, k = 3, maxNprobe = 3)
        .orderBy(col("nprobe"))
    }),
    "ann_matryoshka_recall" -> ((s, dir) => {
      // truncated-dimension serving audit (the Matryoshka representation
      // trade: serve on a prefix of the embedding, pay with recall):
      // cosine top-k over the first 48 of 64 dims — prefix norms, prefix
      // dots, nothing renormalized ahead of time — measured by the same
      // recallAt operator against the full-dim exact top-k. At 100 TB a
      // prefix scan cuts vector bytes read, shuffled, and multiplied
      // proportionally; this row is the number that decides whether that
      // trade is safe for a given corpus.
      val emb = t(s, dir, "embeddings")
      val trunc = emb.select(col("vec_id"),
        slice(col("embedding"), 1, matryoshkaDims).as("embedding"))
      val q = emb.filter(col("vec_id") < 10)
      val approx = Similarity.bruteForceTopK(trunc, trunc.filter(col("vec_id") < 10), k = 3)
      Similarity.recallAt(approx, bruteTruth3(s, dir))
        .orderBy(col("query_id"))
    }),
    "ann_rp_recall" -> ((s, dir) => {
      // the MODEL-FREE dimension-reduction trade (Johnson–Lindenstrauss
      // ±1 projection, 64 → 32): signs are md5("rp:j:i") parity — a pure
      // function of the coordinate pair, so the oracle re-derives the
      // identical sign matrix and the projection needs no trained model,
      // no stored planes, and no data pass before the rewrite. Serving on
      // the projected vectors is measured by the same recallAt operator
      // against the full-dim exact top-k (the matryoshka row's prefix
      // trade, without requiring matryoshka-trained embeddings).
      val emb = t(s, dir, "embeddings")
      val proj = Similarity.rpProject(emb, outDims = rpDims, inDims = rpInDims)
      val approx = Similarity.bruteForceTopK(proj, proj.filter(col("vec_id") < 10), k = 3)
      Similarity.recallAt(approx, bruteTruth3(s, dir))
        .orderBy(col("query_id"))
    }),
    "ann_ivfpq_topk" -> ((s, dir) => {
      // IVF-PQ with refine: coarse cells bound what a query scans,
      // product-quantized residual codes bound what each scanned candidate
      // costs (m codeword ids + ADC table lookups — no per-candidate vector
      // math), and exact L2 re-ranks only the ADC shortlist. All training
      // (coarse Lloyd's + per-subspace codebook Lloyd's) is deterministic
      // and replayed by the oracle as CTEs; corpus side stays narrow.
      // pqIters = 2 (not the 3 default): each extra Lloyd's round costs m
      // reassignment joins and dominated this registry row's cost; the
      // oracle replays the same 2 rounds, so the exact-replay contract is
      // unchanged (codebook quality only affects the ADC shortlist, and
      // the exact refine re-ranks it either way)
      val q = t(s, dir, "embeddings").filter(col("vec_id") < 10)
      val model = pqModel2(s, dir, 1.0)
      Similarity.pqServe(pqCodes(s, dir, 1.0),
          Similarity.pqQueryTables(q, model, nprobe = 2),
          preparedEmb(s, dir), q, k = 3, rerank = 50, model)
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_ivfpq_sampled" -> ((s, dir) => {
      // the PRODUCTION IVF-PQ training economics: codebooks trained on a
      // 50% md5-bucket sample of the corpus (the bpe_sampled discipline —
      // pure function of the id, so the oracle re-draws the identical
      // sample), everything ENCODED and served full-corpus. The pqIters
      // training aggregations now scan the sample, not the corpus — at
      // 100 TB that is the entire feasibility of in-pipeline PQ training
      val q = t(s, dir, "embeddings").filter(col("vec_id") < 10)
      val model = pqModel2(s, dir, 0.5)
      Similarity.pqServe(pqCodes(s, dir, 0.5),
          Similarity.pqQueryTables(q, model, nprobe = 2),
          preparedEmb(s, dir), q, k = 3, rerank = 50, model)
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_centroid_outlier" -> ((s, dir) =>
      // embedding-sanity screen: rounded cosine of every vector to the
      // corpus's decimal-exact mean vector (one distributed aggregation +
      // a broadcast narrow scoring map)
      Similarity.centroidOutliers(t(s, dir, "embeddings"))
        .orderBy(col("vec_id"))),
    "ann_knn_graph" -> ((s, dir) => {
      // mutual-kNN graph: each vector's top-4 among its banded-LSH
      // candidates, kept only where the relation is mutual (hub one-way
      // edges pruned) — the structure semantic clustering / diversity
      // sampling starts from; candidates are band-bucketed, never
      // all-pairs, and both mutuality sides are k-bounded
      // mutual closure over the shared bandedKnn4 artifact (one
      // candidate-join + scoring pass serving this row and the label
      // audit below)
      Similarity.knnGraphWith(bandedKnn4(s, dir))
        .select(col("id_a"), col("id_b"),
          (col("cosine") + lit(0.0)).as("cosine"),
          col("rank_ab"), col("rank_ba"))
        .orderBy(col("id_a"), col("id_b"))
    }),
    "ann_label_noise" -> ((s, dir) => {
      // kNN-disagreement label audit: a label is suspect when a strict
      // majority of the vector's top-4 banded-LSH neighbors carry one
      // other label (count-plurality, smallest-label tie-break) — the
      // confident-learning-style screen run before trusting `label` as
      // supervision; candidates band-bucketed, never all-pairs
      // neighbor vote over the same shared bandedKnn4 artifact
      Similarity.labelNoiseWith(bandedKnn4(s, dir),
          t(s, dir, "embeddings").select(col("vec_id").as("id"),
            col("label").cast("long").as("lbl")))
        .orderBy(col("vec_id"))
    }),
    "ann_hard_negatives" -> ((s, dir) => {
      // contrastive hard-negative mining: nearest different-LABEL vectors
      // per query — the label constraint applies before ranking. Brute
      // form over the sampled query set is the verified baseline; the
      // banded-LSH form (EngineSpec) is the 100 TB candidate path.
      val emb = t(s, dir, "embeddings")
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 10), k = 5)
        .select(col("query_id"), col("neighbor_id"), col("neg_label"),
          col("score"), col("rank").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_mmr_rerank" -> ((s, dir) =>
      // diversity-aware serving (Carbonell & Goldstein MMR, λ=½ as pure
      // int64 rel−maxsim): distributed shortlist + pairwise sims, then
      // the bounded driver greedy; oracle unrolls the identical k picks
      Similarity.mmrRerank(t(s, dir, "embeddings"),
          t(s, dir, "embeddings").filter(col("vec_id") < 6),
          shortlist = 12, k = 4)
        .orderBy(col("query_id"), col("mmr_step"))),
    "ann_mmr_rerank_lsh" -> ((s, dir) => {
      // MMR's SCALE form: the shortlist is FED from the banded sign-LSH
      // serving chain (rel = round(score·10⁴) int64) instead of the brute
      // queries×corpus θ-join — no BroadcastNestedLoopJoin anywhere in
      // the plan (EngineSpec-pinned); the oracle replays the identical
      // LSH chain, trim, pair sims, and greedy picks
      // the shared mmrFedPicks artifact (the recall row below grades the
      // SAME chain — one LSH serve + greedy for both)
      mmrFedPicks(s, dir).orderBy(col("query_id"), col("mmr_step"))
    }),
    "ann_mmr_recall" -> ((s, dir) => {
      // the QUALITY number for the fed form: per-query recall of the
      // LSH-fed MMR picks against the brute-shortlist MMR picks — the
      // same recallAt measurement every other approximate family carries
      // (the tuning read: how much diversity-aware serving quality the
      // θ-join-free shortlist costs). Oracle composes BOTH greedy chains
      // (namespaced step CTEs) with the recall join.
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val fed = mmrFedPicks(s, dir)
      val brute = Similarity.mmrRerank(emb, q, shortlist = 12, k = 4)
      Similarity.recallAt(fed, brute).orderBy(col("query_id"))
    }),
  )

  val oracles: Seq[(String, String)] = Seq(
    "ann_cosine_topk" -> (embCte +
      """, d AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, list_reduce(list(q.v*n.v ORDER BY q.i), (x,y) -> x+y) AS dot
        |  FROM f q JOIN f n ON q.i=n.i AND q.vec_id<10 AND q.vec_id<>n.vec_id
        |  GROUP BY 1,2),
        |s AS (
        |  SELECT query_id, neighbor_id, ROUND(dot/(nq.nrm*nn2.nrm),4)+0.0 AS score
        |  FROM d JOIN nrm nq ON nq.vec_id=d.query_id
        |         JOIN nrm nn2 ON nn2.vec_id=d.neighbor_id),
        |r AS (
        |  SELECT query_id, neighbor_id, score,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
        |  FROM s)
        |SELECT query_id, neighbor_id, score, rnk FROM r
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin),
    "ann_lsh_topk" -> (embCte +
      """, hp AS MATERIALIZED (SELECT vec_id AS plane_id, i, v FROM f WHERE vec_id < 4),
        |pd AS (
        |  SELECT f.vec_id, hp.plane_id, list_reduce(list(f.v*hp.v ORDER BY f.i), (x,y) -> x+y) AS d
        |  FROM f JOIN hp ON f.i=hp.i GROUP BY 1,2),
        |bk AS MATERIALIZED (
        |  SELECT vec_id, CAST(SUM(CASE WHEN d > 0 THEN 1<<plane_id ELSE 0 END) AS BIGINT) AS bucket
        |  FROM pd GROUP BY 1),
        |cand AS MATERIALIZED (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id
        |  FROM bk q JOIN bk n ON q.bucket=n.bucket AND q.vec_id<10 AND q.vec_id<>n.vec_id),
        |dd AS (
        |  SELECT c.query_id, c.neighbor_id, list_reduce(list(a.v*b.v ORDER BY a.i), (x,y) -> x+y) AS dot
        |  FROM cand c
        |  JOIN f a ON a.vec_id=c.query_id
        |  JOIN f b ON b.vec_id=c.neighbor_id AND a.i=b.i
        |  GROUP BY 1,2),
        |ss AS (
        |  SELECT query_id, neighbor_id, ROUND(dot/(nq.nrm*nn2.nrm),4)+0.0 AS score
        |  FROM dd JOIN nrm nq ON nq.vec_id=dd.query_id
        |          JOIN nrm nn2 ON nn2.vec_id=dd.neighbor_id),
        |rr AS (
        |  SELECT query_id, neighbor_id, score,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
        |  FROM ss)
        |SELECT query_id, neighbor_id, score, rnk FROM rr
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin),
    "ann_lsh_banded_topk" -> (embCte + lshBandedServeCtes +
      """SELECT query_id, neighbor_id, score, rnk FROM rr
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin),
    "ann_ivf_topk" -> (embCte +
      """, cd AS (SELECT vec_id AS cid, i, v FROM f WHERE vec_id < 4),
        |cdot AS (
        |  SELECT f.vec_id, cd.cid, list_reduce(list(f.v*cd.v ORDER BY f.i), (x,y) -> x+y) AS d
        |  FROM f JOIN cd ON f.i=cd.i GROUP BY 1,2),
        |cscore AS (
        |  SELECT cdot.vec_id, cdot.cid, ROUND(d/(nv.nrm*nc.nrm),4) AS cs
        |  FROM cdot JOIN nrm nv ON nv.vec_id=cdot.vec_id
        |          JOIN nrm nc ON nc.vec_id=cdot.cid),
        |cell AS (
        |  SELECT vec_id, cid AS cell FROM (
        |    SELECT vec_id, cid,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS crn
        |    FROM cscore)
        |  WHERE crn = 1),
        |cand AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id
        |  FROM cell q JOIN cell n ON q.cell=n.cell AND q.vec_id<10 AND q.vec_id<>n.vec_id),
        |dd AS (
        |  SELECT c.query_id, c.neighbor_id, list_reduce(list(a.v*b.v ORDER BY a.i), (x,y) -> x+y) AS dot
        |  FROM cand c
        |  JOIN f a ON a.vec_id=c.query_id
        |  JOIN f b ON b.vec_id=c.neighbor_id AND a.i=b.i
        |  GROUP BY 1,2),
        |ss AS (
        |  SELECT query_id, neighbor_id, ROUND(dot/(nq.nrm*nn2.nrm),4)+0.0 AS score
        |  FROM dd JOIN nrm nq ON nq.vec_id=dd.query_id
        |          JOIN nrm nn2 ON nn2.vec_id=dd.neighbor_id),
        |rr AS (
        |  SELECT query_id, neighbor_id, score,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
        |  FROM ss)
        |SELECT query_id, neighbor_id, score, rnk FROM rr
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin),
    "ann_filtered_topk" -> (embCte +
      // the ann_ivf_topk probe with the metadata predicate joined onto
      // the CANDIDATE side (cell assignment is row-local, so filtering
      // candidates ≡ filtering the index before assignment)
      """, cd AS (SELECT vec_id AS cid, i, v FROM f WHERE vec_id < 4),
        |cdot AS (
        |  SELECT f.vec_id, cd.cid, list_reduce(list(f.v*cd.v ORDER BY f.i), (x,y) -> x+y) AS d
        |  FROM f JOIN cd ON f.i=cd.i GROUP BY 1,2),
        |cscore AS (
        |  SELECT cdot.vec_id, cdot.cid, ROUND(d/(nv.nrm*nc.nrm),4) AS cs
        |  FROM cdot JOIN nrm nv ON nv.vec_id=cdot.vec_id
        |          JOIN nrm nc ON nc.vec_id=cdot.cid),
        |cell AS (
        |  SELECT vec_id, cid AS cell FROM (
        |    SELECT vec_id, cid,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS crn
        |    FROM cscore)
        |  WHERE crn = 1),
        |cand AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id
        |  FROM cell q
        |  JOIN cell n ON q.cell=n.cell AND q.vec_id<10 AND q.vec_id<>n.vec_id
        |  JOIN embeddings me ON me.vec_id = n.vec_id AND me.label = 1),
        |dd AS (
        |  SELECT c.query_id, c.neighbor_id, list_reduce(list(a.v*b.v ORDER BY a.i), (x,y) -> x+y) AS dot
        |  FROM cand c
        |  JOIN f a ON a.vec_id=c.query_id
        |  JOIN f b ON b.vec_id=c.neighbor_id AND a.i=b.i
        |  GROUP BY 1,2),
        |ss AS (
        |  SELECT query_id, neighbor_id, ROUND(dot/(nq.nrm*nn2.nrm),4)+0.0 AS score
        |  FROM dd JOIN nrm nq ON nq.vec_id=dd.query_id
        |          JOIN nrm nn2 ON nn2.vec_id=dd.neighbor_id),
        |rr AS (
        |  SELECT query_id, neighbor_id, score,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
        |  FROM ss)
        |SELECT query_id, neighbor_id, score, rnk FROM rr
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin),
    "ann_ivf_trained_topk" -> (embCte +
      Similarity.kmeansOracleCtes(k = 4, iters = 2) +
      ivfTrainedServeCtes +
      """SELECT query_id, neighbor_id, score, rnk FROM rr
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin),
    "ann_index_upsert" -> (embCte +
      // training (init + every re-assignment round) restricted to the
      // base; serving assigns the FULL corpus under the frozen centroids
      // — exactly build(base) + append(delta) + topK
      Similarity.kmeansOracleCtes(k = 4, iters = 2, trainPred = "vec_id < 400") +
      ivfTrainedServeCtes +
      """SELECT query_id, neighbor_id, score, rnk FROM rr
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin),
    // both chains replayed (the trained-IVF serving CTEs + a fresh-named
    // brute-force chain over the same queries), then the identical
    // exact-set left join and per-query hit count
    "ann_recall_eval" -> (embCte +
      Similarity.kmeansOracleCtes(k = 4, iters = 2) +
      ivfTrainedServeCtes +
      recallTailCtes),
    // same recall tail over a DIFFERENT serving family: the banded-LSH
    // chain defines `rr`, the tail replays brute force + the hit join —
    // proving the recall operator is family-agnostic, not IVF-coupled
    "ann_recall_eval_lsh" -> (embCte + lshBandedServeCtes + recallTailCtes),
    "ann_binary_topk" -> (embCte + binaryServeCtes +
      """SELECT query_id, neighbor_id, hamming, score, rnk FROM rr
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin),
    "ann_binary_banded_topk" -> (embCte + binaryBandedServeCtes +
      """SELECT query_id, neighbor_id, hamming, score, rnk FROM rr
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin),
    // the binary-quantization family through the same family-agnostic
    // recall tail as ivf/lsh/matryoshka/rp
    "ann_recall_eval_binary" -> (embCte + binaryServeCtes + recallTailCtes),
    "ann_recall_eval_binary_banded" -> (embCte + binaryBandedServeCtes + recallTailCtes),
    // sweep over the probe knob: training + the serve chain's rfin/ncell
    // reused, then the ranked-probe shared-scoring sweep tail
    "ann_nprobe_sweep" -> (embCte +
      Similarity.kmeansOracleCtes(k = 4, iters = 2) +
      ivfTrainedServeCtes + nprobeSweepTailCtes),
    // a THIRD serving family through the same tail: prefix-dim brute
    // force (ordered prefix folds for dots AND norms) defines `rr`
    "ann_matryoshka_recall" -> (embCte +
      s""",td AS MATERIALIZED (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |         list_reduce(list(q.v*n.v ORDER BY q.i), (x,y) -> x+y) AS dot
         |  FROM f q JOIN f n ON q.i=n.i AND q.i<=$matryoshkaDims
         |   AND q.vec_id<10 AND q.vec_id<>n.vec_id
         |  GROUP BY 1,2),
         |nrmt AS MATERIALIZED (
         |  SELECT vec_id, sqrt(list_reduce(list(v*v ORDER BY i), (x,y) -> x+y)) AS nrm
         |  FROM f WHERE i<=$matryoshkaDims GROUP BY 1),
         |ts AS (
         |  SELECT query_id, neighbor_id, ROUND(dot/(nq.nrm*nn2.nrm),4)+0.0 AS score
         |  FROM td JOIN nrmt nq ON nq.vec_id=td.query_id
         |          JOIN nrmt nn2 ON nn2.vec_id=td.neighbor_id),
         |rr AS MATERIALIZED (
         |  SELECT query_id, neighbor_id, score,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
         |  FROM ts)
         |""".stripMargin + recallTailCtes),
    // a FOURTH serving family through the same recall tail: ±1
    // random-projection brute force. `sgn` re-derives the identical
    // md5-parity sign matrix (pure function of (j, i) — no model, no
    // plane table), `fp` replays the projection as ordered folds (±1.0
    // products are exact IEEE sign flips, so projected values match the
    // Spark side bit-for-bit), then projected-space norms/dots/rank feed
    // the shared brute-force-vs-rr tail
    "ann_rp_recall" -> (embCte +
      s""",sgn AS (
         |  SELECT j.j, i.i,
         |         CASE WHEN CAST(('0x'||substring(md5('rp:'||CAST(j.j AS VARCHAR)||':'||CAST(i.i AS VARCHAR)),1,15)) AS BIGINT) % 2 = 0
         |              THEN 1.0 ELSE -1.0 END AS s
         |  FROM range(0,$rpDims) j(j), range(1,${rpInDims + 1}) i(i)),
         |fp AS (
         |  SELECT f.vec_id, sgn.j AS i,
         |         list_reduce(list(f.v*sgn.s ORDER BY f.i), (x,y) -> x+y) AS v
         |  FROM f JOIN sgn ON f.i=sgn.i GROUP BY 1,2),
         |nrmp AS (SELECT vec_id, sqrt(list_reduce(list(v*v ORDER BY i), (x,y) -> x+y)) AS nrm
         |         FROM fp GROUP BY 1),
         |td AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |         list_reduce(list(q.v*n.v ORDER BY q.i), (x,y) -> x+y) AS dot
         |  FROM fp q JOIN fp n ON q.i=n.i AND q.vec_id<10 AND q.vec_id<>n.vec_id
         |  GROUP BY 1,2),
         |ts AS (
         |  SELECT query_id, neighbor_id, ROUND(dot/(nq.nrm*nn2.nrm),4)+0.0 AS score
         |  FROM td JOIN nrmp nq ON nq.vec_id=td.query_id
         |          JOIN nrmp nn2 ON nn2.vec_id=td.neighbor_id),
         |rr AS (
         |  SELECT query_id, neighbor_id, score,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
         |  FROM ts)
         |""".stripMargin + recallTailCtes),
    "ann_ivfpq_topk" -> (embCte +
      Similarity.ivfPqOracleSql(
        k = 3, kCoarse = 4, coarseIters = 2, m = 8, ksub = 8, dsub = 8,
        pqIters = 2, nprobe = 2, rerank = 50, maxQueryId = 10L)),
    "ann_ivfpq_sampled" -> (embCte +
      Similarity.ivfPqOracleSql(
        k = 3, kCoarse = 4, coarseIters = 2, m = 8, ksub = 8, dsub = 8,
        pqIters = 2, nprobe = 2, rerank = 50, maxQueryId = 10L,
        trainFrac = 0.5)),
    "ann_recall_eval_pq" -> (embCte +
      Similarity.ivfPqRecallOracleSql(
        k = 3, kCoarse = 4, coarseIters = 2, m = 8, ksub = 8, dsub = 8,
        pqIters = 2, nprobe = 2, rerank = 50, maxQueryId = 10L)),
    // dot and norm-of-mean are ORDERED sequential folds (list_reduce over
    // index-ordered lists), mirroring the Spark side's left-to-right double
    // fold bit-for-bit — an unordered SUM(f.v*m.m) can flip the 4th rounded
    // decimal on boundary values (non-associative double addition)
    "ann_centroid_outlier" -> (embCte +
      """, m AS (
        |  SELECT i, CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*) AS m
        |  FROM f GROUP BY 1),
        |mn AS (
        |  SELECT sqrt(list_reduce(list(m*m ORDER BY i), (a,b) -> a+b)) AS mnrm
        |  FROM m),
        |d AS (
        |  SELECT f.vec_id,
        |         list_reduce(list(f.v*m.m ORDER BY f.i), (a,b) -> a+b) AS dot
        |  FROM f JOIN m USING (i) GROUP BY 1)
        |SELECT d.vec_id, ROUND(d.dot/(nrm.nrm*mn.mnrm),4)+0.0 AS centroid_cosine
        |FROM d JOIN nrm USING (vec_id) CROSS JOIN mn
        |ORDER BY vec_id""".stripMargin),
    "ann_knn_graph" -> (embCte +
      // the banded-bucket candidate CTEs (the lsh_banded discipline),
      // DIRECTED candidate pairs, per-node rank window, then the mutual
      // self-join on the reversed pair with both ranks k-bounded
      """, hp AS (SELECT vec_id AS plane_id, i, v FROM f WHERE vec_id < 4),
        |pd AS (
        |  SELECT f.vec_id, hp.plane_id, list_reduce(list(f.v*hp.v ORDER BY f.i), (x,y) -> x+y) AS d
        |  FROM f JOIN hp ON f.i=hp.i GROUP BY 1,2),
        |bkb AS (
        |  SELECT vec_id, CAST(floor(plane_id/2.0) AS BIGINT) AS band,
        |         CAST(SUM(CASE WHEN d > 0 THEN 1<<(plane_id % 2) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM pd GROUP BY 1,2),
        |cand AS MATERIALIZED (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM bkb a JOIN bkb b ON a.band=b.band AND a.bucket=b.bucket AND a.vec_id<>b.vec_id),
        |vl AS MATERIALIZED (SELECT vec_id, list(v ORDER BY i) AS vl FROM f GROUP BY 1),
        |d AS (
        |  SELECT c.id_a, c.id_b,
        |         list_reduce(list_transform(list_zip(a.vl, b.vl), s -> s[1] * s[2]),
        |                     (p,q) -> p+q) AS dot
        |  FROM cand c JOIN vl a ON a.vec_id=c.id_a JOIN vl b ON b.vec_id=c.id_b),
        |sc AS (
        |  SELECT id_a, id_b, ROUND(dot/(nx.nrm*ny.nrm),4)+0.0 AS cosine
        |  FROM d JOIN nrm nx ON nx.vec_id=id_a JOIN nrm ny ON ny.vec_id=id_b),
        |kn AS MATERIALIZED (
        |  SELECT id_a, id_b, cosine,
        |         CAST(row_number() OVER (PARTITION BY id_a
        |                                 ORDER BY cosine DESC, id_b) AS BIGINT) AS rnk
        |  FROM sc)
        |SELECT k1.id_a, k1.id_b, k1.cosine, k1.rnk AS rank_ab, k2.rnk AS rank_ba
        |FROM kn k1 JOIN kn k2 ON k2.id_a=k1.id_b AND k2.id_b=k1.id_a
        |WHERE k1.rnk <= 4 AND k2.rnk <= 4 AND k1.id_a < k1.id_b
        |ORDER BY k1.id_a, k1.id_b""".stripMargin),
    "ann_label_noise" -> (embCte +
      // the knn_graph banded candidate chain (hp/pd/bkb/cand), directed
      // top-4 window, then label joins + plurality argmax replayed with
      // the identical (count DESC, label) tie-break
      """, hp AS (SELECT vec_id AS plane_id, i, v FROM f WHERE vec_id < 4),
        |pd AS (
        |  SELECT f.vec_id, hp.plane_id, list_reduce(list(f.v*hp.v ORDER BY f.i), (x,y) -> x+y) AS d
        |  FROM f JOIN hp ON f.i=hp.i GROUP BY 1,2),
        |bkb AS (
        |  SELECT vec_id, CAST(floor(plane_id/2.0) AS BIGINT) AS band,
        |         CAST(SUM(CASE WHEN d > 0 THEN 1<<(plane_id % 2) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM pd GROUP BY 1,2),
        |cand AS MATERIALIZED (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM bkb a JOIN bkb b ON a.band=b.band AND a.bucket=b.bucket AND a.vec_id<>b.vec_id),
        |vl AS MATERIALIZED (SELECT vec_id, list(v ORDER BY i) AS vl FROM f GROUP BY 1),
        |d AS (
        |  SELECT c.id_a, c.id_b,
        |         list_reduce(list_transform(list_zip(a.vl, b.vl), s -> s[1] * s[2]),
        |                     (p,q) -> p+q) AS dot
        |  FROM cand c JOIN vl a ON a.vec_id=c.id_a JOIN vl b ON b.vec_id=c.id_b),
        |sc AS (
        |  SELECT id_a, id_b, ROUND(dot/(nx.nrm*ny.nrm),4)+0.0 AS cosine
        |  FROM d JOIN nrm nx ON nx.vec_id=id_a JOIN nrm ny ON ny.vec_id=id_b),
        |kn AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT id_a, id_b,
        |           row_number() OVER (PARTITION BY id_a
        |                              ORDER BY cosine DESC, id_b) AS rnk
        |    FROM sc) WHERE rnk <= 4),
        |lb AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
        |wl AS (SELECT kn.id_a, lo.label AS own_label, ln2.label AS nbr_lbl
        |       FROM kn JOIN lb lo ON lo.vec_id = kn.id_a
        |               JOIN lb ln2 ON ln2.vec_id = kn.id_b),
        |cts AS MATERIALIZED (SELECT id_a, own_label, nbr_lbl, COUNT(*) AS c
        |        FROM wl GROUP BY 1,2,3),
        |pl AS (SELECT id_a, nbr_lbl AS plurality_label, c AS plurality_n,
        |              row_number() OVER (PARTITION BY id_a
        |                                 ORDER BY c DESC, nbr_lbl) AS rn
        |       FROM cts),
        |ag AS (SELECT id_a, own_label,
        |              CAST(SUM(c) AS BIGINT) AS n_nbrs,
        |              CAST(SUM(CASE WHEN nbr_lbl <> own_label THEN c ELSE 0 END) AS BIGINT)
        |                AS n_disagree
        |       FROM cts GROUP BY 1,2)
        |SELECT ag.id_a AS vec_id, ag.own_label AS label, ag.n_nbrs, ag.n_disagree,
        |       pl.plurality_label, CAST(pl.plurality_n AS BIGINT) AS plurality_n,
        |       (pl.plurality_label <> ag.own_label AND pl.plurality_n * 2 > ag.n_nbrs)
        |         AS suspect
        |FROM ag JOIN pl ON pl.id_a = ag.id_a AND pl.rn = 1
        |ORDER BY vec_id""".stripMargin),
    "ann_hard_negatives" -> (embCte +
      // the brute chain with the label inequality applied BEFORE the
      // per-query window — ordered dot folds, rounded scores, id tie-break
      """, lb AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
        |hd AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |         list_reduce(list(q.v*n.v ORDER BY q.i), (x,y) -> x+y) AS dot
        |  FROM f q JOIN f n ON q.i=n.i AND q.vec_id<10 AND q.vec_id<>n.vec_id
        |  GROUP BY 1,2),
        |hs AS (
        |  SELECT hd.query_id, hd.neighbor_id, ln2.label AS neg_label,
        |         ROUND(hd.dot/(nq.nrm*nn2.nrm),4)+0.0 AS score
        |  FROM hd JOIN nrm nq ON nq.vec_id=hd.query_id
        |          JOIN nrm nn2 ON nn2.vec_id=hd.neighbor_id
        |          JOIN lb lq ON lq.vec_id=hd.query_id
        |          JOIN lb ln2 ON ln2.vec_id=hd.neighbor_id
        |  WHERE lq.label <> ln2.label),
        |hr AS (
        |  SELECT query_id, neighbor_id, neg_label, score,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
        |  FROM hs)
        |SELECT query_id, neighbor_id, neg_label, score, rnk
        |FROM hr WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin),
    "ann_mmr_rerank" -> (
      """WITH u AS (SELECT vec_id, unnest(embedding) AS v,
        |                  generate_subscripts(embedding, 1) AS i FROM embeddings),
        |nrm AS (SELECT vec_id, sqrt(list_reduce(list(v*v ORDER BY i),
        |               (x,y) -> x+y)) AS nrm
        |        FROM u GROUP BY 1),
        |dots AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
        |                list_reduce(list(a.v*b.v ORDER BY a.i), (x,y) -> x+y) AS dot
        |         FROM u a JOIN u b ON b.i = a.i AND b.vec_id <> a.vec_id
        |         WHERE a.vec_id < 6 GROUP BY 1, 2),
        |c0 AS (SELECT d.qid, d.nid,
        |              CAST(round(10000 * d.dot / (qn.nrm * nn.nrm), 0) AS BIGINT)
        |                AS rel,
        |              row_number() OVER (PARTITION BY d.qid
        |                ORDER BY round(10000 * d.dot / (qn.nrm * nn.nrm), 0) DESC,
        |                         d.nid) AS rnk
        |       FROM dots d JOIN nrm qn ON qn.vec_id = d.qid
        |                   JOIN nrm nn ON nn.vec_id = d.nid),
        |cand AS (SELECT qid, nid, rel FROM c0 WHERE rnk <= 12),
        |pd AS (SELECT c1.qid, c1.nid AS cid, c2.nid AS oid,
        |              list_reduce(list(x.v*y.v ORDER BY x.i), (a,b) -> a+b) AS dot
        |       FROM cand c1 JOIN cand c2
        |         ON c2.qid = c1.qid AND c2.nid <> c1.nid
        |       JOIN u x ON x.vec_id = c1.nid
        |       JOIN u y ON y.vec_id = c2.nid AND y.i = x.i
        |       GROUP BY 1, 2, 3),
        |pairs AS (SELECT pd.qid, pd.cid, pd.oid,
        |                 CAST(round(10000 * pd.dot / (na.nrm * nb.nrm), 0) AS BIGINT)
        |                   AS sim
        |          FROM pd JOIN nrm na ON na.vec_id = pd.cid
        |                  JOIN nrm nb ON nb.vec_id = pd.oid),
        |""".stripMargin + mmrOracleSteps(4) + "\n" +
      """SELECT qid AS query_id, nid AS neighbor_id,
        |       CAST(step AS BIGINT) AS mmr_step, obj AS objective
        |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
        |      UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4)
        |ORDER BY query_id, mmr_step""".stripMargin),
    "ann_mmr_rerank_lsh" -> (embCte + lshBandedServeCtes +
      """,
        |mcand AS MATERIALIZED (SELECT query_id AS qid, neighbor_id AS nid,
        |                 CAST(round(score * 10000, 0) AS BIGINT) AS rel
        |          FROM rr WHERE rnk <= 12),
        |mpd AS MATERIALIZED (SELECT c1.qid, c1.nid AS cid, c2.nid AS oid,
        |               list_reduce(list(x.v*y.v ORDER BY x.i), (a,b) -> a+b) AS dot
        |        FROM mcand c1 JOIN mcand c2
        |          ON c2.qid = c1.qid AND c2.nid <> c1.nid
        |        JOIN f x ON x.vec_id = c1.nid
        |        JOIN f y ON y.vec_id = c2.nid AND y.i = x.i
        |        GROUP BY 1, 2, 3),
        |mpairs AS MATERIALIZED (SELECT mpd.qid, mpd.cid, mpd.oid,
        |                  CAST(round(10000 * mpd.dot / (na.nrm * nb.nrm), 0) AS BIGINT)
        |                    AS sim
        |           FROM mpd JOIN nrm na ON na.vec_id = mpd.cid
        |                    JOIN nrm nb ON nb.vec_id = mpd.oid),
        |""".stripMargin + mmrOracleSteps(4, "mcand", "mpairs") + "\n" +
      """SELECT qid AS query_id, nid AS neighbor_id,
        |       CAST(step AS BIGINT) AS mmr_step, obj AS objective
        |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
        |      UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4)
        |ORDER BY query_id, mmr_step""".stripMargin),
    "ann_mmr_recall" -> (embCte + lshBandedServeCtes +
      """,
        |mcand AS MATERIALIZED (SELECT query_id AS qid, neighbor_id AS nid,
        |                 CAST(round(score * 10000, 0) AS BIGINT) AS rel
        |          FROM rr WHERE rnk <= 12),
        |mpd AS MATERIALIZED (SELECT c1.qid, c1.nid AS cid, c2.nid AS oid,
        |               list_reduce(list(x.v*y.v ORDER BY x.i), (a,b) -> a+b) AS dot
        |        FROM mcand c1 JOIN mcand c2
        |          ON c2.qid = c1.qid AND c2.nid <> c1.nid
        |        JOIN f x ON x.vec_id = c1.nid
        |        JOIN f y ON y.vec_id = c2.nid AND y.i = x.i
        |        GROUP BY 1, 2, 3),
        |mpairs AS MATERIALIZED (SELECT mpd.qid, mpd.cid, mpd.oid,
        |                  CAST(round(10000 * mpd.dot / (na.nrm * nb.nrm), 0) AS BIGINT)
        |                    AS sim
        |           FROM mpd JOIN nrm na ON na.vec_id = mpd.cid
        |                    JOIN nrm nb ON nb.vec_id = mpd.oid),
        |bdot AS MATERIALIZED (SELECT q.vec_id AS qid, n.vec_id AS nid,
        |                list_reduce(list(q.v*n.v ORDER BY q.i), (x,y) -> x+y) AS dot
        |         FROM f q JOIN f n ON q.i=n.i AND q.vec_id<10 AND q.vec_id<>n.vec_id
        |         GROUP BY 1, 2),
        |bc0 AS MATERIALIZED (SELECT d.qid, d.nid,
        |               CAST(round(10000 * d.dot / (qn.nrm * nn.nrm), 0) AS BIGINT)
        |                 AS rel,
        |               row_number() OVER (PARTITION BY d.qid
        |                 ORDER BY round(10000 * d.dot / (qn.nrm * nn.nrm), 0) DESC,
        |                          d.nid) AS rnk
        |        FROM bdot d JOIN nrm qn ON qn.vec_id = d.qid
        |                    JOIN nrm nn ON nn.vec_id = d.nid),
        |bcand AS MATERIALIZED (SELECT qid, nid, rel FROM bc0 WHERE rnk <= 12),
        |bpd AS MATERIALIZED (SELECT c1.qid, c1.nid AS cid, c2.nid AS oid,
        |               list_reduce(list(x.v*y.v ORDER BY x.i), (a,b) -> a+b) AS dot
        |        FROM bcand c1 JOIN bcand c2
        |          ON c2.qid = c1.qid AND c2.nid <> c1.nid
        |        JOIN f x ON x.vec_id = c1.nid
        |        JOIN f y ON y.vec_id = c2.nid AND y.i = x.i
        |        GROUP BY 1, 2, 3),
        |bpairs AS MATERIALIZED (SELECT bpd.qid, bpd.cid, bpd.oid,
        |                  CAST(round(10000 * bpd.dot / (na.nrm * nb.nrm), 0) AS BIGINT)
        |                    AS sim
        |           FROM bpd JOIN nrm na ON na.vec_id = bpd.cid
        |                    JOIN nrm nb ON nb.vec_id = bpd.oid),
        |""".stripMargin +
      mmrOracleSteps(4, "mcand", "mpairs", prefix = "a") + ",\n" +
      mmrOracleSteps(4, "bcand", "bpairs", prefix = "b") + "\n" +
      """SELECT e.qid AS query_id, COUNT(*) AS k_exact,
        |       CAST(SUM(CASE WHEN a.nid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_hits,
        |       CAST(SUM(CASE WHEN a.nid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |         / COUNT(*) AS recall
        |FROM (SELECT qid, nid FROM bs1 UNION ALL SELECT qid, nid FROM bs2
        |      UNION ALL SELECT qid, nid FROM bs3 UNION ALL SELECT qid, nid FROM bs4) e
        |LEFT JOIN (SELECT qid, nid FROM as1 UNION ALL SELECT qid, nid FROM as2
        |           UNION ALL SELECT qid, nid FROM as3 UNION ALL SELECT qid, nid FROM as4) a
        |       ON a.qid = e.qid AND a.nid = e.nid
        |GROUP BY 1 ORDER BY query_id""".stripMargin),
  )
}
