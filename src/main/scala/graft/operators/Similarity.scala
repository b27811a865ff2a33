package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — the 100%-recall baseline every
  *    approximate method is judged against. Cost O(|Q|·|N|·d); right when the
  *    query set is small or as the per-bucket kernel below.
  *  - [[lshTopK]]: random-hyperplane LSH — sign-bit bucketing so each query
  *    only scans its own bucket. This is the scale path: with b hyperplanes,
  *    expected bucket size is |N|/2^b, and the bucket join replaces the full
  *    cross product. Hyperplanes are passed in as a small DataFrame and
  *    broadcast — at 100 TB the candidate join stays shuffle-free on the big
  *    side.
  *  - [[nearDupPairs]]: embedding-cosine near-duplicate pairs at threshold.
  *
  * Numeric determinism: elements are cast float→double first; the dot product
  * is a sequential left fold over the array (`aggregate`), so scores are
  * reproducible run-to-run; emitted scores are rounded to 4 decimals and
  * thresholds/rankings apply to the rounded value with an id tie-break, which
  * makes results stable across engines that sum in a different order.
  */
object Similarity {

  /** array<float> → array<double>, the deterministic compute representation. */
  def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential-fold dot product — fused codegen expression
    * ([[graft.functions.ArrayDotProduct]]); bit-identical to [[dotBuiltin]].
    */
  def dot(a: Column, b: Column): Column = graft.functions.ArrayDotProduct(a, b)

  /** Built-in-composition dot product (reference implementation; the custom
    * expression is validated against this in tests).
    */
  def dotBuiltin(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm of an array<double> column. */
  def norm(c: Column): Column = sqrt(aggregate(c, lit(0.0), (acc, x) => acc + x * x))

  /** (id, v: array<double>, nrm) from (idCol, embCol: array<float>). */
  def prepared(emb: DataFrame, idCol: String, embCol: String): DataFrame =
    emb.select(col(idCol).as("id"), toDouble(col(embCol)).as("v"))
      .withColumn("nrm", norm(col("v")))

  private def rankWindow = Window.partitionBy(col("query_id"))
    .orderBy(col("score").desc, col("neighbor_id"))

  /** Exact cosine top-k: for each query vector, the k nearest neighbors by
    * cosine similarity (self excluded), rank 1-based, rounded score.
    */
  def bruteForceTopK(
      emb: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val n = prepared(emb, idCol, embCol)
    val q = prepared(queries, idCol, embCol)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    q.join(n, col("query_id") =!= col("id"))
      .select(
        col("query_id"),
        col("id").as("neighbor_id"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 4).as("score"))
      .withColumn("rank", row_number().over(rankWindow).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Exact L2 top-k — the metric-matched brute baseline for the IVF-PQ
    * family ([[ivfPqTopK]] serves L2 distances, so a cosine baseline
    * would mis-score its recall). Same θ-join shape and same 100%-recall
    * oracle-baseline role as [[bruteForceTopK]]; the identical
    * left-assoc `aggregate(zip_with(...))` fold and 6-dp fencing as the
    * PQ refine stage, so ties break the same way on both sides.
    */
  def bruteForceTopKL2(
      emb: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val n = prepared(emb, idCol, embCol).select(col("id"), col("v"))
    val q = prepared(queries, idCol, embCol)
      .select(col("id").as("query_id"), col("v").as("qv"))
    q.join(n, col("query_id") =!= col("id"))
      .select(
        col("query_id"),
        col("id").as("neighbor_id"),
        (round(
          aggregate(zip_with(col("qv"), col("v"), (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, t) => acc + t), 6) + lit(0.0)).as("l2_dist"))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("l2_dist"), col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Collect the (small by contract) hyperplane table to the driver once —
    * note this is EAGER: building a bucketed plan executes the (tiny)
    * planes query immediately. `pv` may be array<float> or array<double>;
    * it is cast to the double compute representation here.
    */
  private[graft] def collectPlanes(planes: DataFrame): Seq[(Int, Seq[Double])] =
    planes.select(col("plane_id").cast("int"), toDouble(col("pv"))).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toVector: Seq[Double])).toSeq

  private def requireValidPlaneIds(ps: Seq[(Int, Seq[Double])]): Unit = {
    require(ps.nonEmpty, "planes must be non-empty")
    // fail fast: a negative id would wrap via shift masking and a duplicate
    // id would double-set its bit — both silently corrupt bucket ids
    require(ps.forall(p => p._1 >= 0 && p._1 < 63),
      s"plane_id must be in [0, 63), got ${ps.map(_._1).filterNot(i => i >= 0 && i < 63)}")
    require(ps.map(_._1).distinct.size == ps.size,
      s"plane_ids must be distinct, got ${ps.map(_._1)}")
  }

  /** Sign-bit bucket id from hyperplane dot products, as ONE row-local
    * projection: the bucket is computed with zero shuffle and zero vector
    * duplication. (The round-1 form crossJoined |N|×planes rows carrying
    * the full vectors and then re-grouped by id just to sum sign bits — a
    * ×planes shuffle amplification this projection removes.) The plane
    * matrix rides a Spark BROADCAST consumed by the codegen'd
    * [[graft.functions.PlaneSignBuckets]] expression — at production ANN
    * settings (say 64 planes × 768 dims) inlining every component as a
    * plan literal would blow generated methods past the JVM's 64 KB limit
    * (dropping to interpreted row processing) and re-ship the matrix with
    * every task; as a broadcast it moves once per executor and the
    * generated loop stays a few hundred bytes. Each `planes` row:
    * (plane_id, pv).
    */
  def withBuckets(vectors: DataFrame, planes: DataFrame): DataFrame = {
    val ps = collectPlanes(planes)
    requireValidPlaneIds(ps)
    val bc = vectors.sparkSession.sparkContext.broadcast(
      graft.functions.PlaneMatrix(
        ps.map(_._2.toArray).toArray,
        ps.map(p => 1L << p._1).toArray,
        Array.fill(ps.size)(0),
        numBands = 1))
    vectors.select(col("id"), col("v"), col("nrm"),
      element_at(graft.functions.PlaneSignBuckets(col("v"), bc), 1).as("bucket"))
  }

  /** Band-OR sign buckets — the multi-probe recall knob. Planes are split
    * into `bands` contiguous groups (by plane_id order); each vector emits
    * one (band, bucket) key per band, and two vectors are candidates if they
    * collide in ANY band (mirroring [[Dedup.minhashLshPairs]] banding). With
    * per-bit disagreement probability p = θ/π, a true neighbor is missed
    * only if every band contains a disagreeing bit: P[miss] = (1-(1-p)^r)^b
    * for r planes per band — strictly better recall than the single
    * all-planes bucket's 1-(1-p)^(rb), at the cost of b keys per vector.
    * All bands' buckets come from ONE pass over the broadcast plane matrix
    * (see [[withBuckets]] for why broadcast beats plan literals).
    */
  def withBandBuckets(vectors: DataFrame, planes: DataFrame, bands: Int): DataFrame = {
    val ps = collectPlanes(planes).sortBy(_._1)
    requireValidPlaneIds(ps)
    require(bands >= 1 && ps.size % bands == 0,
      s"bands ($bands) must evenly divide the plane count (${ps.size})")
    val perBand = ps.size / bands
    val bc = vectors.sparkSession.sparkContext.broadcast(
      graft.functions.PlaneMatrix(
        ps.map(_._2.toArray).toArray,
        Array.tabulate(ps.size)(i => 1L << (i % perBand)),
        Array.tabulate(ps.size)(i => i / perBand),
        numBands = bands))
    vectors.select(col("id"), col("v"), col("nrm"),
      posexplode(graft.functions.PlaneSignBuckets(col("v"), bc))
        .as(Seq("band", "bucket")))
  }

  /** Approximate top-k: queries only compare against neighbors in their own
    * hyperplane-sign bucket. planes: (plane_id int, pv array<double>).
    */
  def lshTopK(
      emb: DataFrame, queries: DataFrame, planes: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val n = withBuckets(prepared(emb, idCol, embCol), planes)
    val q = withBuckets(prepared(queries, idCol, embCol), planes)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("bucket").as("qbucket"))
    q.join(n, col("query_id") =!= col("id") && col("qbucket") === col("bucket"))
      .select(
        col("query_id"),
        col("id").as("neighbor_id"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 4).as("score"))
      .withColumn("rank", row_number().over(rankWindow).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Banded approximate top-k: a query compares against neighbors sharing
    * ANY band's bucket (see [[withBandBuckets]]). Candidate ids are made
    * distinct over a narrow (id, band, bucket) projection — vectors are
    * joined back only for the final scoring, so the distinct never carries
    * array payloads.
    */
  def lshTopKBanded(
      emb: DataFrame, queries: DataFrame, planes: DataFrame, bands: Int, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val np = prepared(emb, idCol, embCol)
    val qp = prepared(queries, idCol, embCol)
    val cand = withBandBuckets(qp, planes, bands)
      .select(col("id").as("query_id"), col("band"), col("bucket"))
      .join(withBandBuckets(np, planes, bands)
        .select(col("id").as("neighbor_id"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    cand
      .join(qp.select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn")),
        Seq("query_id"))
      .join(np.select(col("id").as("neighbor_id"), col("v"), col("nrm")),
        Seq("neighbor_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 4).as("score"))
      .withColumn("rank", row_number().over(rankWindow).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Hard-negative mining — the contrastive-training data step (DPR /
    * SimCSE practice): for each query vector, the k most semantically
    * similar vectors whose LABEL differs (class, source, or cluster id —
    * whatever the `labelCol` encodes). Random negatives
    * ([[graft.operators.Splits.negativePairs]]) are easy; the negatives
    * that actually move a contrastive loss are the near-misses this
    * operator surfaces. Output: (query_id, neighbor_id, neg_label, score,
    * rank), rank 1-based within query over (rounded score desc,
    * neighbor_id) — the [[bruteForceTopK]] determinism contract with the
    * label constraint applied BEFORE ranking.
    *
    * `planes = None` is the exact brute form (the verified baseline, right
    * for sampled query sets). `planes = Some(...)` + `bands` rides the
    * banded sign-LSH candidate join ([[lshTopKBanded]]) with the same
    * label filter — the 100 TB form: candidates come from band-bucket
    * collisions instead of the cross product, labels travel on the narrow
    * candidate frame, and scores/ranks agree with brute wherever the
    * candidate set contains the true top-k (the usual LSH recall
    * contract, measurable with [[recallAt]]).
    */
  def hardNegatives(
      emb: DataFrame, queries: DataFrame, k: Int,
      planes: Option[DataFrame] = None, bands: Int = 1,
      idCol: String = "vec_id", embCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val n = emb.select(col(idCol).as("neighbor_id"),
        toDouble(col(embCol)).as("v"), col(labelCol).cast("long").as("neg_label"))
      .withColumn("nrm", norm(col("v")))
    val q = queries.select(col(idCol).as("query_id"),
        toDouble(col(embCol)).as("qv"), col(labelCol).cast("long").as("qlabel"))
      .withColumn("qn", norm(col("qv")))
    val paired = planes match {
      case None =>
        q.join(n, col("query_id") =!= col("neighbor_id") &&
          col("qlabel") =!= col("neg_label"))
      case Some(pl) =>
        val qb = withBandBuckets(prepared(queries, idCol, embCol), pl, bands)
          .select(col("id").as("query_id"), col("band"), col("bucket"))
        val nb = withBandBuckets(prepared(emb, idCol, embCol), pl, bands)
          .select(col("id").as("neighbor_id"), col("band"), col("bucket"))
        qb.join(nb, Seq("band", "bucket"))
          .filter(col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"))
          .distinct()
          .join(q, Seq("query_id"))
          .join(n, Seq("neighbor_id"))
          .filter(col("qlabel") =!= col("neg_label"))
    }
    paired
      .select(col("query_id"), col("neighbor_id"), col("neg_label"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 4).as("score"))
      .withColumn("rank", row_number().over(rankWindow).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Collect the (small by contract — k×dims) centroid table to the driver
    * once, sorted by cid. EAGER like [[collectPlanes]]: building an
    * IVF-probed plan executes the (tiny) centroid query immediately.
    */
  private[graft] def collectCentroids(centroids: DataFrame): Seq[(Long, Array[Double], Double)] =
    centroids.select(col("cid").cast("long"), toDouble(col("cv")), col("cnrm").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1).toSeq

  /** Nearest-centroid cell assignment: each vector in `vecs` ((id, v, nrm))
    * gets its `nprobe` closest cells by rounded cosine (centroid-id
    * tie-break), emitted as one (id, v, nrm, cell) row per probed cell.
    *
    * ZERO-EXCHANGE: the top-nprobe selection folds over the broadcast
    * centroid matrix inside the row
    * ([[graft.functions.NearestCentroidCells]], the [[withBuckets]]
    * broadcast-matrix discipline), so the whole pass is one narrow
    * projection + explode — no exchange anywhere below the probe join.
    * The previous form ranked cells with a per-id `row_number` window after
    * `crossJoin(broadcast(centroids))`, which shuffled corpus × k rows each
    * carrying the full embedding array — a ~k× corpus shuffle inside what
    * should be a map, paid again every Lloyd's training round. EngineSpec
    * pins the no-Exchange plan.
    */
  private[graft] def assignCells(vecs: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame =
    assignCellsLocal(vecs, collectCentroids(centroids), nprobe)

  /** [[assignCells]] over driver-held centroid rows ((cid, cv, cnrm)) —
    * the form the Lloyd's loop uses directly, skipping a per-round
    * DataFrame round-trip of centroids it already holds.
    */
  private[graft] def assignCellsLocal(
      vecs: DataFrame, cents: Seq[(Long, Array[Double], Double)], nprobe: Int): DataFrame =
    assignCellsLocalTracked(vecs, cents, nprobe)._1

  /** [[assignCellsLocal]] returning the centroid-matrix broadcast handle
    * alongside the plan, so callers that MATERIALIZE the assignment within
    * a bounded scope (the Lloyd's loop: one assignment per round, consumed
    * by that round's means aggregation) can `unpersist` it eagerly instead
    * of leaking one broadcast per round to ContextCleaner GC. Callers that
    * return the lazy plan (serving, [[ivfTopK]]) must NOT unpersist — the
    * broadcast has to outlive every execution of the returned plan.
    */
  private[graft] def assignCellsLocalTracked(
      vecs: DataFrame, cents: Seq[(Long, Array[Double], Double)], nprobe: Int)
      : (DataFrame, org.apache.spark.broadcast.Broadcast[graft.functions.CentroidMatrix]) = {
    require(cents.nonEmpty, "centroids must be non-empty")
    require(cents.map(_._1).distinct.size == cents.size,
      s"centroid ids must be distinct, got ${cents.map(_._1)}")
    val sorted = cents.sortBy(_._1)
    val bc = vecs.sparkSession.sparkContext.broadcast(
      graft.functions.CentroidMatrix(
        sorted.map(_._1).toArray,
        sorted.map(_._2).toArray,
        sorted.map(_._3).toArray,
        nprobe))
    (vecs.select(col("id"), col("v"), col("nrm"),
      explode(graft.functions.NearestCentroidCells(col("v"), col("nrm"), bc)).as("cell")),
      bc)
  }

  /** (cid, cv, cnrm) DataFrame from driver-held centroid rows. */
  private def centroidFrame(
      spark: org.apache.spark.sql.SparkSession,
      cents: Seq[(Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    cents.toDF("cid", "cv").withColumn("cnrm", norm(col("cv")))
  }

  /** Deterministic k-means coarse-quantizer training (Lloyd's iterations) —
    * what makes [[ivfTopK]] usable END-TO-END instead of demanding
    * caller-supplied centroids. Fully deterministic, no RNG:
    *
    *  - init: cell(id) = md5-prefix(id) mod k — the same engine-portable
    *    md5-bucket discipline as [[Splits]] (15 hex digits < 2⁶⁰, so the
    *    arithmetic is overflow-free and non-negative for any id);
    *  - each round: centroid = per-dimension MEAN of its members, summed
    *    through DECIMAL(28,12) (exact, order-insensitive) and divided once —
    *    bit-identical across engines and partitionings; then re-assign by
    *    rounded cosine with centroid-id tie-break (same rule as the serving
    *    path, so train and query agree on boundaries).
    *
    * Distribution contract: the per-round O(corpus) work — the dimension
    * explode and (cell, dim) hash aggregation — is fully distributed
    * (k·dims cells ≪ corpus); only the k×dims centroid table crosses to the
    * driver each round, which IS the algorithm's global synchronization
    * point (the [[graft.operators.TextAnalysis.bpeVocab]] argmax precedent:
    * a tiny global decision, not a data collect). Re-assignment is a narrow
    * broadcast map. Note training is an ACTION (it runs `iters` jobs when
    * called), not a lazy plan — like any iterative fixpoint operator here.
    *
    * A cell that loses all members simply disappears (k shrinks) — the
    * deterministic behavior a SQL oracle reproduces, rather than a random
    * re-seed it could not. Returns (cid, cv: array<double>, cnrm).
    */
  def trainCentroids(
      emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(iters >= 1, "iters must be >= 1")
    import org.apache.spark.sql.types.DecimalType
    val spark = emb.sparkSession
    val p = prepared(emb, idCol, embCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def means(assigned: DataFrame): Seq[(Long, Seq[Double])] = assigned
      .select(col("cell"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("cell"), col("i"))
      .agg((sum(col("x").cast(DecimalType(28, 12))).cast("double") /
        count(lit(1))).as("m"))
      .groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(i, m))), s -> s.m)").as("cv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toVector: Seq[Double])).toSeq
    // driver-side L2 norm, the same sequential fold as the norm() column —
    // bit-identical, so train-time assignment agrees with serving exactly
    def withNorms(cs: Seq[(Long, Seq[Double])]): Seq[(Long, Array[Double], Double)] =
      cs.map { case (cid, cv) =>
        (cid, cv.toArray, math.sqrt(cv.foldLeft(0.0)((acc, x) => acc + x * x)))
      }
    var assigned = p.select(col("id"), col("v"), col("nrm"),
      (conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10).cast("long") % k)
        .as("cell"))
    var cents = means(assigned)
    (2 to iters).foreach { _ =>
      // row-local re-assignment (assignCellsLocal): each Lloyd's round is
      // one narrow map over the corpus — the round's only exchange is the
      // (cell, dim) mean aggregation, which IS the algorithm. The round's
      // centroid broadcast is released as soon as the means materialize,
      // so long-lived sessions don't accumulate one blob per iteration.
      val (reassigned, bc) = assignCellsLocalTracked(p, withNorms(cents), nprobe = 1)
      assigned = reassigned
      cents = means(assigned)
      bc.unpersist(blocking = false)
    }
    p.unpersist(blocking = false)
    centroidFrame(spark, cents)
  }

  /** IVF approximate top-k: vectors are partitioned into cells by nearest
    * centroid (cosine, rounded, centroid-id tie-break); each query probes
    * its `nprobe` nearest cells — the recall knob (a query straddling a
    * cell boundary finds neighbors in the adjacent cell at nprobe ≥ 2,
    * mirroring what banding does for [[lshTopKBanded]]). `centroids` is
    * small ((cid, cv, cnrm)) and broadcast — train it with
    * [[trainCentroids]] or supply domain centroids. At 100 TB the
    * assignment pass is a narrow broadcast map and the probe join shuffles
    * only by cell id; candidate volume scales with nprobe/k of the corpus
    * per query.
    */
  def ivfTopK(
      emb: DataFrame, queries: DataFrame, centroids: DataFrame, k: Int,
      nprobe: Int = 1,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(nprobe >= 1, "nprobe must be >= 1")
    val cents = collectCentroids(centroids) // once, shared by both sides
    val n = assignCellsLocal(prepared(emb, idCol, embCol), cents, nprobe = 1)
    val q = assignCellsLocal(prepared(queries, idCol, embCol), cents, nprobe)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("cell").as("qcell"))
    // each neighbor lives in exactly ONE cell and a query's probed cells
    // are distinct, so a (query, neighbor) pair meets on at most one key —
    // no candidate dedup needed at any nprobe
    q.join(n, col("query_id") =!= col("id") && col("qcell") === col("cell"))
      .select(
        col("query_id"),
        col("id").as("neighbor_id"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 4).as("score"))
      .withColumn("rank", row_number().over(rankWindow).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Metadata-FILTERED IVF serving — the query shape vector search runs
    * in production: "top-k neighbors of q WHERE label = …" (language,
    * quality band, license, tenant). The predicate applies to the INDEX
    * side BEFORE the cell join — cell assignment is row-local, so
    * filter-then-assign ≡ assign-then-filter, and on a persisted
    * [[graft.sources.AnnIndex]] the predicate lands in the parquet scan
    * next to the cell partition filter (pushdown) instead of paying
    * rank-then-discard. Exactness contract is [[ivfTopK]]'s, restricted
    * to the filtered corpus: results equal brute force over the
    * predicate's survivors within the probed cells. A highly selective
    * predicate THINS cells (fewer than k survivors in-probe); raise
    * `nprobe` to recover recall — the classic post-filter trade, priced
    * here explicitly rather than hidden in a serving default.
    */
  def filteredIvfTopK(
      emb: DataFrame, queries: DataFrame, centroids: DataFrame, k: Int,
      pred: Column, nprobe: Int = 1,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    ivfTopK(emb.filter(pred), queries, centroids, k, nprobe, idCol, embCol)

  /** [[assignCellsLocal]] keeping the PROBE RANK: one (id, v, nrm, cell,
    * probe_rank) row per probed cell, probe_rank 1-based in nearest-first
    * order ([[graft.functions.NearestCentroidCells]] emits ids in rank
    * order, so `posexplode` recovers the rank the plain `explode` drops).
    * Same zero-exchange shape — a narrow projection + explode, no shuffle.
    */
  private[graft] def assignCellsLocalRanked(
      vecs: DataFrame, cents: Seq[(Long, Array[Double], Double)], nprobe: Int): DataFrame = {
    require(cents.nonEmpty, "centroids must be non-empty")
    require(cents.map(_._1).distinct.size == cents.size,
      s"centroid ids must be distinct, got ${cents.map(_._1)}")
    val sorted = cents.sortBy(_._1)
    val bc = vecs.sparkSession.sparkContext.broadcast(
      graft.functions.CentroidMatrix(
        sorted.map(_._1).toArray,
        sorted.map(_._2).toArray,
        sorted.map(_._3).toArray,
        nprobe))
    vecs.select(col("id"), col("v"), col("nrm"),
      posexplode(graft.functions.NearestCentroidCells(col("v"), col("nrm"), bc)))
      .select(col("id"), col("v"), col("nrm"), col("col").as("cell"),
        (col("pos") + 1L).cast("long").as("probe_rank"))
  }

  /** The IVF tuning surface as ONE verified frame: recall vs candidate
    * volume, swept over the probe knob (nprobe = 1..`maxNprobe`) against
    * the exact brute-force baseline — the `dedup_threshold_sweep`
    * discipline applied to the ANN serving family. Emits one row per
    * sweep point: `(nprobe, n_queries, n_cands, sum_hits, sum_exact,
    * recall)` where `n_cands` is the candidate-pair count actually scored
    * at that nprobe (the COST axis a deployment trades against recall)
    * and `recall` is micro-averaged (`sum_hits / sum_exact` — one integer
    * division, engine-portable; never a mean of per-query doubles).
    *
    * Scale shape: exact scoring is paid ONCE, at `maxNprobe` — each
    * candidate pair meets on exactly one cell (a neighbor lives in one
    * cell, a query's probed cells are distinct), carries the rank of the
    * probe that found it, and fans out only as narrow
    * (nprobe, query, neighbor, score) rows via `sequence`+`explode`.
    * Re-ranking candidates restricted to `probe_rank <= n` is exactly
    * [[ivfTopK]] at nprobe = n (spec-pinned), so the sweep never re-runs
    * the serving join per point. The brute baseline is |Q|-bounded, and
    * the final per-point aggregate moves maxNprobe × |Q| × k rows.
    */
  def nprobeSweep(
      emb: DataFrame, queries: DataFrame, centroids: DataFrame, k: Int,
      maxNprobe: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(maxNprobe >= 1, "maxNprobe must be >= 1")
    val cents = collectCentroids(centroids)
    val n = assignCellsLocal(prepared(emb, idCol, embCol), cents, nprobe = 1)
    val q = assignCellsLocalRanked(prepared(queries, idCol, embCol), cents, maxNprobe)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("cell").as("qcell"), col("probe_rank"))
    val scored = q.join(n, col("query_id") =!= col("id") && col("qcell") === col("cell"))
      .select(
        col("query_id"),
        col("id").as("neighbor_id"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 4).as("score"),
        col("probe_rank"))
    // a candidate found at probe rank r participates in every sweep point
    // n >= r — narrow fan-out of the already-scored rows, never a rescore
    val swept = scored.withColumn(
      "nprobe", explode(sequence(col("probe_rank"), lit(maxNprobe.toLong))))
    val w = Window.partitionBy(col("nprobe"), col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    val approx = swept
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("nprobe"), col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    val exact = bruteForceTopK(emb, queries, k, idCol, embCol)
      .select(col("query_id"), col("neighbor_id"))
    val nps = emb.sparkSession.range(1, maxNprobe + 1).select(col("id").as("nprobe"))
    val cands = swept.groupBy(col("nprobe")).agg(count(lit(1)).as("n_cands"))
    nps.crossJoin(exact)
      .join(approx, Seq("nprobe", "query_id", "neighbor_id"), "left")
      .groupBy(col("nprobe"))
      .agg(
        countDistinct(col("query_id")).as("n_queries"),
        sum(coalesce(col("hit"), lit(0L))).cast("long").as("sum_hits"),
        count(lit(1)).as("sum_exact"))
      .join(cands, Seq("nprobe"))
      .select(col("nprobe"), col("n_queries"), col("n_cands"),
        col("sum_hits"), col("sum_exact"),
        round(col("sum_hits").cast("double") / col("sum_exact"), 4).as("recall"))
  }

  /** Embedding-space distribution drift between two corpora (dump A vs
    * dump B — the semantic twin of the token-level `q_drift_report`):
    * train the deterministic quantizer on the REFERENCE corpus A, assign
    * both corpora under the frozen centroids, and compare per-cell
    * occupancy shares in exact integer ppm — the read that catches an
    * embedding-model change, a source-mix shift, or a topic drift before
    * an index built on A serves B badly. Emits one row per occupied
    * cell: `(cell, n_a, n_b, share_a_ppm, share_b_ppm, abs_drift_ppm)`
    * (Σ abs_drift_ppm / 2 is the total-variation distance over cells,
    * derivable by the caller in one k-row sum).
    *
    * Both corpora must be non-empty (drift needs two sides; integer
    * shares divide by each total). Scale shape: training reads A
    * (Lloyd's — the usual per-round mean exchanges), both assignments
    * are zero-exchange broadcast-matrix maps, and everything after is
    * k-bounded: two k-row aggregates, a k-row full-outer join, a 1-row
    * totals broadcast. Integer ppm end to end — nothing to fence.
    */
  def clusterDrift(embA: DataFrame, embB: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val cs = collectCentroids(trainCentroids(embA, k, iters, idCol, embCol))
    def cellCounts(df: DataFrame, out: String) =
      assignCellsLocal(prepared(df, idCol, embCol), cs, nprobe = 1)
        .groupBy(col("cell")).agg(count(lit(1)).as(out))
    val joined = cellCounts(embA, "n_a")
      .join(cellCounts(embB, "n_b"), Seq("cell"), "full_outer")
      .select(col("cell"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val totals = joined.agg(
      sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
    joined.crossJoin(broadcast(totals))
      .select(col("cell"), col("n_a"), col("n_b"),
        expr("(1000000L * n_a) div ta").as("share_a_ppm"),
        expr("(1000000L * n_b) div tb").as("share_b_ppm"),
        abs(expr("(1000000L * n_a) div ta") - expr("(1000000L * n_b) div tb"))
          .as("abs_drift_ppm"))
  }

  /** Sign-bit binary codes: dimension i sets bit i iff v[i] > 0, packed
    * into two BIGINT halves `(code_lo` = bits 0–31, `code_hi` = bits
    * 32–63`)` — the [[Multimodal.imageAHash]] hi/lo packing precedent,
    * which also keeps every value inside non-overflowing positive-long
    * arithmetic (a single long's bit 63 is the sign bit). Requires
    * dims ≤ 64 — ENFORCED row-local via `assert_true` folded into each
    * half's initial accumulator (shiftleft past the width would wrap mod
    * 64 and silently alias high dimensions onto low bits, corrupting
    * every downstream Hamming distance with no error). One narrow
    * row-local fold per half; no shuffle.
    */
  private[graft] def binaryCodes(p: DataFrame): DataFrame = {
    val fence = "coalesce(CAST(assert_true(size(v) <= 64, " +
      "'binaryCodes requires dims <= 64') AS BIGINT), 0L)"
    p.select(col("id"), col("v"), col("nrm"),
      expr("aggregate(filter(sequence(0, size(v)-1), " +
        s"i -> i < 32 AND element_at(v, i+1) > 0d), $fence, " +
        "(acc, i) -> acc + shiftleft(1L, i))").as("code_lo"),
      expr("aggregate(filter(sequence(0, size(v)-1), " +
        s"i -> i >= 32 AND element_at(v, i+1) > 0d), $fence, " +
        "(acc, i) -> acc + shiftleft(1L, i - 32))").as("code_hi"))
  }

  /** Binary-quantization ANN serving — the memory-tier trade every large
    * vector deployment prices (Hamming over sign-bit codes, then exact
    * rerank): each vector collapses to 16 BYTES (two packed longs — a
    * 32× read/shuffle reduction at 64 float dims), the shortlist stage
    * ranks candidates by Hamming distance (`bit_count(xor)` per half —
    * integer, engine-portable), and the top-`rerank` shortlist is
    * re-scored with exact rounded cosine over the full vectors — the
    * [[ivfPqTopK]] refine discipline, so only queries × rerank vectors
    * are ever touched at full width.
    *
    * The shortlist stage here scans all codes per query (the
    * oracle-parity baseline form, exactly like [[bruteForceTopK]] for
    * the float family) — at corpus scale, band the code bytes into
    * buckets first ([[lshTopKBanded]]'s candidate shape; sign-bit codes
    * ARE hyperplane-LSH signatures with the axis planes, so the same
    * banding math applies). Measured by [[recallAt]] in
    * `ann_recall_eval_binary`.
    *
    * Determinism: Hamming is integer; the rerank cosine is the house
    * rounded-4dp fold; ties break (hamming asc, id) then (score desc,
    * id) — both engines replay every step.
    */
  def binaryHammingTopK(
      emb: DataFrame, queries: DataFrame, k: Int, rerank: Int = 20,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(k >= 1 && rerank >= k, s"need rerank >= k >= 1, got k=$k rerank=$rerank")
    val np = prepared(emb, idCol, embCol)
    val qp = prepared(queries, idCol, embCol)
    // the Hamming stage moves ONLY (query_id, neighbor_id, hamming) —
    // 24-byte rows — through its exchange/window; full vectors join back
    // for the ≤ rerank shortlist alone (the nearDupPairsBanded "vectors
    // join back only for scoring" discipline). Carrying the arrays
    // through the shortlist window erases the 16-byte-code win
    // (A/B'd: 10.5 s vs 5.0 s at 20k × 200 queries).
    val ham = binaryCodes(qp)
      .select(col("id").as("query_id"),
        col("code_lo").as("q_lo"), col("code_hi").as("q_hi"))
      .join(binaryCodes(np).select(col("id"), col("code_lo"), col("code_hi")),
        col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        (expr("CAST(bit_count(q_lo ^ code_lo) AS BIGINT)") +
          expr("CAST(bit_count(q_hi ^ code_hi) AS BIGINT)")).as("hamming"))
    hammingRerank(ham, np, qp, k, rerank)
  }

  /** Shared Hamming-shortlist → exact-cosine rerank tail of the binary
    * family: rank the narrow (query_id, neighbor_id, hamming) frame,
    * keep `rerank` per query, join vectors back for those alone, exact
    * rounded-cosine final rank to `k`.
    */
  private def hammingRerank(ham: DataFrame, np: DataFrame, qp: DataFrame,
      k: Int, rerank: Int): DataFrame = {
    val wH = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("neighbor_id"))
    val short = ham.withColumn("hrnk", row_number().over(wH))
      .filter(col("hrnk") <= rerank)
      .select(col("query_id"), col("neighbor_id"), col("hamming"))
    short
      .join(np.select(col("id").as("neighbor_id"), col("v"), col("nrm")),
        Seq("neighbor_id"))
      .join(qp.select(col("id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn")), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("hamming"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 4).as("score"))
      .withColumn("rnk", row_number().over(rankWindow).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** The SCALE path of [[binaryHammingTopK]]: candidates come from
    * band collisions over the code itself (split the 64 bits into
    * `bands` equal slices; a pair is a candidate iff ANY slice matches
    * exactly) instead of a full code scan per query — the
    * [[Dedup.simhashPairs]] pigeonhole: a pair within Hamming <
    * `bands` corrupts at most Hamming slices, so at least one stays
    * intact and the pair is GUARANTEED a candidate (spec-pinned);
    * farther pairs are found with probability falling in their
    * distance, which is the standard banding trade. Candidate
    * generation is an equi-join on (band, slice-value) over narrow
    * (id, band, bval) rows — at corpus scale the exchange is keyed and
    * bounded by collision volume, never |Q|·|N|. The shortlist/rerank
    * tail is shared with the exhaustive form.
    *
    * `bands` ∈ {2, 4, 8, 16, 32} (slices must tile the two 32-bit
    * halves). bands=8 → byte slices: 256-way selectivity per band.
    */
  /** The banded slicing of a packed (lo, hi) 64-bit code — extracted as a
    * seam so the structural pin (EngineSpec "codeBandSlices: band j…") can
    * feed literal codes and compare every (band, bval) row against an
    * independent Scala recomputation (the r17 mutation lesson — see
    * [[graft.operators.Dedup.simhashBlockKeys]]).
    *
    * Contract: with w = 64/bands bits per slice and half = bands/2, band
    * j < half is bits [j·w, (j+1)·w) of `lo` and band j ≥ half is bits
    * [(j−half)·w, (j−half+1)·w) of `hi` — both halves hold their 32 bits
    * in the low word (see [[binaryCodes]]), so plain shiftright + mask
    * never touches a sign bit.
    */
  private[graft] def codeBandSlices(
      codes: DataFrame, idc: String, lo: String, hi: String,
      bands: Int): DataFrame = {
    require(Set(2, 4, 8, 16, 32)(bands), s"bands must tile 32-bit halves, got $bands")
    val w = 64 / bands
    val mask = (1L << w) - 1
    val half = bands / 2
    codes.select(col(idc), posexplode(expr(
      s"transform(sequence(0, ${bands - 1}), j -> " +
        s"CASE WHEN j < $half THEN shiftright($lo, j * $w) & $mask " +
        s"ELSE shiftright($hi, (j - $half) * $w) & $mask END)"))
      .as(Seq("band", "bval")))
  }

  def binaryHammingTopKBanded(
      emb: DataFrame, queries: DataFrame, k: Int, rerank: Int = 20,
      bands: Int = 8,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(k >= 1 && rerank >= k, s"need rerank >= k >= 1, got k=$k rerank=$rerank")
    val np = prepared(emb, idCol, embCol)
    val qp = prepared(queries, idCol, embCol)
    val nc = binaryCodes(np).select(col("id"), col("code_lo"), col("code_hi"))
    val qc = binaryCodes(qp).select(col("id").as("query_id"),
      col("code_lo").as("q_lo"), col("code_hi").as("q_hi"))
    val cand = codeBandSlices(qc, "query_id", "q_lo", "q_hi", bands)
      .join(codeBandSlices(nc, "id", "code_lo", "code_hi", bands), Seq("band", "bval"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"))
      .distinct()
    val ham = cand
      .join(qc, Seq("query_id"))
      .join(nc.withColumnRenamed("id", "neighbor_id"), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (expr("CAST(bit_count(q_lo ^ code_lo) AS BIGINT)") +
          expr("CAST(bit_count(q_hi ^ code_hi) AS BIGINT)")).as("hamming"))
    hammingRerank(ham, np, qp, k, rerank)
  }

  /** Bucketed near-dup pairs: only same-hyperplane-bucket pairs are scored —
    * the scale form of [[nearDupPairs]]: candidate count drops by ~2^planes
    * while sign-LSH keeps high-cosine pairs co-bucketed with high
    * probability. The emitted set is exactly "same bucket AND rounded
    * cosine ≥ tau" (deterministic, oracle-reproducible).
    */
  def nearDupPairsBucketed(
      emb: DataFrame, planes: DataFrame, tau: Double,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val b = withBuckets(prepared(emb, idCol, embCol), planes)
    val l = b.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"), col("bucket"))
    val r = b.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"),
      col("bucket").as("bucket_b"))
    l.join(r, col("id_a") < col("id_b") && col("bucket") === col("bucket_b"))
      .select(
        col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4).as("cosine"))
      .filter(col("cosine") >= tau)
  }

  /** Banded near-dup pairs: candidates collide in ANY band's bucket (see
    * [[withBandBuckets]]), then exact rounded-cosine verification at `tau` —
    * the multi-probe upgrade of [[nearDupPairsBucketed]]: a high-cosine pair
    * straddling one sign boundary is no longer lost, it only needs ONE band
    * of agreeing bits. Candidate distinct runs over the narrow
    * (id, band, bucket) projection; vectors join back only for scoring.
    */
  def nearDupPairsBanded(
      emb: DataFrame, planes: DataFrame, bands: Int, tau: Double,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val p = prepared(emb, idCol, embCol)
    val bb = withBandBuckets(p, planes, bands)
    val cand = bb.select(col("id").as("id_a"), col("band"), col("bucket"))
      .join(bb.select(col("id").as("id_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    cand
      .join(p.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")),
        Seq("id_a"))
      .join(p.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")),
        Seq("id_b"))
      .select(
        col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4).as("cosine"))
      .filter(col("cosine") >= tau)
  }

  /** Mutual-kNN graph over the corpus — the structure semantic-dedup
    * clustering, diversity sampling, and label propagation all start from
    * (e.g. SemDeDup's cluster graphs, k-center coreset selection): each
    * vector's k nearest neighbors by rounded cosine among its banded-LSH
    * candidates, kept only where the relation is MUTUAL (a in kNN(b) and
    * b in kNN(a)) — the standard symmetrization that prunes hub nodes'
    * one-way edges. Emits canonical (id_a < id_b) edges with the cosine
    * and both directed ranks.
    *
    * Scale shape: the self-join is band-bucketed (never all-pairs — the
    * [[nearDupPairsBanded]] contract; bands × planes tune bucket
    * granularity to keep collision lists bounded), the candidate distinct
    * runs over the narrow id-pair projection, vectors join back only for
    * scoring, and the per-node top-k is a rank window over candidate
    * edges only (swap in [[graft.plans.TopKPerKey]] when candidate lists
    * grow deep). The mutuality check is a self-join of the kNN edge list
    * on the reversed pair — kNN output is |V|·k rows, so both sides are
    * already k-bounded.
    */
  /** Chunk-to-document mean pooling — the aggregation step of every
    * long-document embedding pipeline (chunks are what the encoder can
    * eat; ONE vector per document is what dedup/ANN/clustering
    * consume): per (group, dimension), the exact-decimal mean of the
    * member vectors' coordinates, rounded at 6 dp. Emitted EXPLODED as
    * (group, i, v) — the relational form downstream dimension audits
    * ([[dimStats]]' shape) read directly; re-assemble with
    * `sort_array(collect_list(struct(i, v)))` when an array is needed.
    *
    * Determinism fencing: coordinates cast to DECIMAL(28,12) BEFORE the
    * sum (order-free addition — the [[trainCentroids]] per-dimension
    * mean discipline), one IEEE divide by the member count, ROUND at 6.
    * Scale shape: one explode + one (group, dim)-keyed map-side-combined
    * agg — dims are bounded, groups shard freely; no vector is ever
    * materialized whole in an aggregation buffer.
    */
  def meanPool(emb: DataFrame, keyCol: String,
      embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    emb.select(col(keyCol), posexplode(col(embCol)).as(Seq("p", "x")))
      .select(col(keyCol), (col("p") + 1).cast("long").as("i"),
        col("x").cast("double").as("x"))
      .groupBy(col(keyCol), col("i"))
      .agg(round(
        sum(col("x").cast(DecimalType(28, 12))).cast("double") / count(lit(1)),
        6).as("v"))
  }

  /** The banded directed-candidate scoring stage [[knnGraph]] and
    * [[labelNoise]] share — band-bucketed self-join (never all-pairs),
    * vectors joined back only for scoring: (id_a, id_b, cosine) over
    * DIRECTED candidate pairs. Factored so the two consumers cannot
    * drift.
    */
  private def bandedScoredCandidates(
      p: DataFrame, planes: DataFrame, bands: Int): DataFrame = {
    val bb = withBandBuckets(p, planes, bands)
    val cand = bb.select(col("id").as("id_a"), col("band"), col("bucket"))
      .join(bb.select(col("id").as("id_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    cand
      .join(p.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")),
        Seq("id_a"))
      .join(p.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4).as("cosine"))
  }

  /** The banded top-k neighbor list (id_a, id_b, cosine, rnk) BOTH
    * [[knnGraph]] and [[labelNoise]] rank over — exposed so a registry
    * can build it once and serve the two consumers through the seams
    * below (rank ties broken (cosine desc, id_b), the house
    * determinism).
    */
  def bandedTopK(
      emb: DataFrame, planes: DataFrame, bands: Int, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val p = prepared(emb, idCol, embCol)
    val w = Window.partitionBy(col("id_a"))
      .orderBy(col("cosine").desc, col("id_b"))
    bandedScoredCandidates(p, planes, bands)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  def knnGraph(
      emb: DataFrame, planes: DataFrame, bands: Int, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    knnGraphWith(bandedTopK(emb, planes, bands, k, idCol, embCol))

  /** [[knnGraph]] over an ALREADY-BUILT [[bandedTopK]] list — the
    * mutuality join + canonicalization only. `knn` must be a bandedTopK
    * output (per-id_a top-k with its rnk); a frame with more than k
    * rows per id silently widens the graph, a re-ranked one silently
    * changes which edges count as mutual.
    */
  def knnGraphWith(knn: DataFrame): DataFrame = {
    val rev = knn.select(col("id_b").as("id_a"), col("id_a").as("id_b"),
      col("rnk").as("rank_ba"))
    knn.join(rev, Seq("id_a", "id_b"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("cosine"),
        col("rnk").as("rank_ab"), col("rank_ba"))
  }

  /** kNN-disagreement label-noise audit (the kernel of confident
    * learning, Northcutt et al. 2021, and of classic edited-NN cleaning,
    * Wilson 1972): a label is SUSPECT when a STRICT MAJORITY of the
    * vector's k nearest neighbors carry one other label — mislabeled
    * points sit inside another class's neighborhood, so the k-ball vote
    * flags them without training a model. The row a curation pipeline
    * reads before trusting `label` as supervision.
    *
    * Per vector: neighbor count among its banded-LSH candidates (≤ k —
    * LSH sparsity may yield fewer), disagreement count, the PLURALITY
    * neighbor label (count-majority, smallest-label tie-break — the
    * [[graft.operators.Graph.labelPropagation]] determinism), and the
    * suspect flag `plurality ≠ own ∧ 2·plurality_n > n_nbrs`.
    *
    * Scale shape identical to [[knnGraph]] (whose candidate stage this
    * reuses): band-bucketed self-join — never all-pairs — vectors join
    * back only for scoring, per-node top-k is a window over candidate
    * edges only, and everything after is k-bounded label counting on
    * |V|·k rows. Integer/boolean output; no float crosses the gate.
    */
  def labelNoise(
      emb: DataFrame, planes: DataFrame, bands: Int, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      labelCol: String = "label"): DataFrame =
    labelNoiseWith(
      bandedTopK(emb, planes, bands, k, idCol, embCol),
      emb.select(col(idCol).as("id"), col(labelCol).cast("long").as("lbl")))

  /** [[labelNoise]] over an ALREADY-BUILT [[bandedTopK]] list and an
    * (id, lbl) label frame — the neighbor-vote read only. Same caller
    * contract (and silent widening failure) as [[knnGraphWith]]; `labels`
    * must cover every id in `knn` or those vectors silently drop from
    * the audit (inner joins).
    */
  def labelNoiseWith(knn: DataFrame, labels: DataFrame): DataFrame = {
    val lab = labels.select(col("id"), col("lbl"))
    val withLbl = knn
      .join(lab.select(col("id").as("id_a"), col("lbl").as("own_label")), Seq("id_a"))
      .join(lab.select(col("id").as("id_b"), col("lbl").as("nbr_lbl")), Seq("id_b"))
    withLbl.groupBy(col("id_a"), col("own_label"), col("nbr_lbl"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("id_a"), col("own_label"))
      .agg(sum(col("c")).as("n_nbrs"),
        sum(when(col("nbr_lbl") =!= col("own_label"), col("c")).otherwise(0L))
          .as("n_disagree"),
        max(struct(col("c").as("c"), (-col("nbr_lbl")).as("nl"))).as("top"))
      .select(col("id_a").as("vec_id"), col("own_label").as("label"),
        col("n_nbrs"), col("n_disagree"),
        (-col("top.nl")).as("plurality_label"), col("top.c").as("plurality_n"))
      .withColumn("suspect",
        col("plurality_label") =!= col("label") &&
          col("plurality_n") * 2 > col("n_nbrs"))
  }

  /** The same [[trainCentroids]] loop as SQL CTE text, for oracle mirroring
    * (unrolled like [[TextAnalysis.bpeVocabSql]]). Expects the caller's WITH
    * chain to already define `f` (vec_id, i, v: the flattened doubles) and
    * `nrm` (vec_id, nrm); emits `a0` (md5-bucket init) and per round r the
    * per-dimension decimal-exact means `c{r}` (cell, i, m), centroid norms
    * `cn{r}`, and (before the last round) the rounded-cosine re-assignment
    * `a{r}`. The final centroid tables are `c{iters}`/`cn{iters}`.
    *
    * `trainPred` (a predicate over `vec_id`, e.g. `"vec_id < 400"`)
    * restricts TRAINING — init and every re-assignment round — to a base
    * subset, mirroring an index built on the base and grown by appends
    * with the frozen quantizer; serving chains appended afterwards still
    * range over the full corpus.
    */
  def kmeansOracleCtes(k: Int, iters: Int, trainPred: String = ""): String = {
    require(k >= 1 && iters >= 1)
    val where = if (trainPred.isEmpty) "" else s" WHERE $trainPred"
    val sb = new StringBuilder
    sb ++= s""", a0 AS MATERIALIZED (
              |  SELECT vec_id,
              |         CAST(('0x'||substring(md5(CAST(vec_id AS VARCHAR)),1,15)) AS BIGINT) % $k AS cell
              |  FROM embeddings$where)""".stripMargin
    (1 to iters).foreach { r =>
      sb ++= s""",
                |c$r AS MATERIALIZED (
                |  SELECT a${r - 1}.cell, f.i,
                |         CAST(SUM(CAST(f.v AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*) AS m
                |  FROM f JOIN a${r - 1} USING (vec_id) GROUP BY 1,2),
                |cn$r AS MATERIALIZED (SELECT cell, sqrt(list_reduce(list(m*m ORDER BY i), (x,y) -> x+y)) AS cnrm
                |         FROM c$r GROUP BY 1)""".stripMargin
      if (r < iters) {
        sb ++= s""",
                  |d$r AS (
                  |  SELECT f.vec_id, c$r.cell,
                  |         list_reduce(list(f.v*c$r.m ORDER BY f.i), (x,y) -> x+y) AS dot
                  |  FROM f JOIN c$r ON f.i=c$r.i$where GROUP BY 1,2),
                  |a$r AS MATERIALIZED (
                  |  SELECT vec_id, cell FROM (
                  |    SELECT d$r.vec_id, d$r.cell,
                  |           row_number() OVER (PARTITION BY d$r.vec_id
                  |             ORDER BY ROUND(d$r.dot/(nrm.nrm*cn$r.cnrm),4) DESC, d$r.cell) AS rn
                  |    FROM d$r JOIN nrm ON nrm.vec_id=d$r.vec_id
                  |              JOIN cn$r ON cn$r.cell=d$r.cell)
                  |  WHERE rn = 1)""".stripMargin
      }
    }
    sb.toString
  }

  /** Corpus-centroid outlier scoring: each vector's rounded cosine to the
    * corpus MEAN vector — the cheap embedding-sanity screen of a training
    * pipeline (corrupt, zeroed, or wrong-modality vectors score far from
    * the bulk; thresholding is downstream policy). The mean is the
    * per-dimension DECIMAL(28,12)-exact average (order-insensitive, the
    * [[trainCentroids]] discipline), aggregated to ONE dims-length row
    * that broadcasts into a narrow scoring map — plan is one distributed
    * aggregation plus a shuffle-free projection at any corpus size.
    */
  def centroidOutliers(
      emb: DataFrame, idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val p = prepared(emb, idCol, embCol)
    val meanVec = p.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg((sum(col("x").cast(DecimalType(28, 12))).cast("double") /
        count(lit(1))).as("m"))
      .agg(expr("transform(array_sort(collect_list(struct(i, m))), s -> s.m)").as("cv"))
      .select(col("cv"), norm(col("cv")).as("cnrm"))
    p.crossJoin(broadcast(meanVec))
      .select(
        col("id").as(idCol),
        // + 0.0 normalizes a possible negative zero (scores here can take
        // any sign, unlike the tau-thresholded pair queries)
        (round(dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")), 4) + lit(0.0))
          .as("centroid_cosine"))
  }

  /** Per-dimension symmetric int8 quantization audit — the STORAGE leg of
    * the embedding pipeline next to [[ivfPqTopK]]'s codebook leg: scalar
    * int8 (code = round(v/scale·127), scale = per-dim max |v|) is what
    * production vector stores ship when 4× compression with near-lossless
    * cosine is enough and codebook training is not wanted. The operator
    * emits the per-vector audit a curation run needs before committing to
    * the format: code mass, saturation count, and the worst per-element
    * reconstruction error.
    *
    * Determinism contract (engine-portable, no ordered float folds
    * needed): scales are per-dim MAX of |v| (max is exact and
    * order-independent, unlike a float sum); codes are integers via
    * explicit half-away-from-zero rounding `sgn(v)·⌊|v|/s·127 + 0.5⌋`
    * (both engines evaluate the identical IEEE-double expression — no
    * reliance on either engine's round() tie rule); per-vector outputs are
    * integer sums and an order-independent MAX error, rounded once at the
    * edge. An all-zero dimension has scale 0 and codes 0 (its elements are
    * all 0, so the formula's 0/0 is guarded to 0).
    *
    * Scale shape: the scale pass is one explode + (dim → max) hash
    * aggregation — map-side combine collapses every task to ≤ dims rows
    * before the exchange — and `dims` doubles cross to the driver (the
    * bounded-global-decision pattern: centroids/BPE/CMS precedent), folded
    * back as ONE array literal. Coding + auditing is then a single narrow
    * row-local pass: at 100 TB the corpus is scanned twice and never
    * exchanged beyond dims-row partials.
    */
  def int8Quantize(
      emb: DataFrame, idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val p = prepared(emb, idCol, embCol)
    val scales = p.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(max(abs(col("x"))).as("s"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    require(scales.nonEmpty, "int8Quantize: empty corpus or empty vectors")
    require(scales.map(_._1).toSeq == scales.indices.toSeq,
      s"int8Quantize: ragged dimension index set ${scales.map(_._1).mkString(",")}")
    val sArr = array(scales.map(s => lit(s._2)): _*)
    val code = (x: Column, sc: Column) =>
      when(sc === 0.0, lit(0L))
        .otherwise((signum(x) * floor(abs(x) / sc * lit(127.0) + lit(0.5))).cast("long"))
    val zs = zip_with(col("v"), sArr, (x, sc) => struct(x.as("x"), sc.as("s")))
    p.select(
      col("id").as(idCol),
      size(col("v")).cast("long").as("n_dims"),
      aggregate(zs, lit(0L), (acc, t) =>
        acc + code(t.getField("x"), t.getField("s"))).as("sum_code"),
      aggregate(zs, lit(0L), (acc, t) =>
        acc + abs(code(t.getField("x"), t.getField("s")))).as("sum_abs_code"),
      aggregate(zs, lit(0L), (acc, t) =>
        acc + when(abs(code(t.getField("x"), t.getField("s"))) === 127L, 1L)
          .otherwise(0L)).as("n_saturated"),
      (round(
        aggregate(zs, lit(0.0), (acc, t) => greatest(acc,
          abs(t.getField("x") -
            code(t.getField("x"), t.getField("s")).cast("double") *
              t.getField("s") / lit(127.0)))),
        6) + lit(0.0)).as("max_abs_err"))
  }

  /** Deterministic ±1 random projection (the Achlioptas-style
    * Johnson–Lindenstrauss sketch): output dimension j of `outDims` is the
    * signed sum Σᵢ s(j,i)·vᵢ with s(j,i) ∈ {+1,−1} drawn from the md5
    * parity of "rp:j:i" — a pure function of the coordinate pair, so both
    * engines (and any later re-run) derive the identical projection with
    * NO trained model, no stored plane table, and no data pass before the
    * rewrite. Cosine in the projected space concentrates around the
    * original cosine, so a projected serve is the model-free counterpart
    * of the matryoshka prefix trade (`ann_matryoshka_recall`), measured
    * the same way with [[recallAt]] (`ann_rp_recall`).
    *
    * Scale shape: the sign matrix is outDims×inDims literals built on the
    * driver from the md5 formula alone (nothing collected from data); the
    * projection is ONE row-local narrow map — outDims sequential-fold dots
    * via the codegen'd [[graft.functions.ArrayDotProduct]] — with zero
    * exchanges, so at 100 TB it rewrites vector bytes ∝ outDims/inDims at
    * scan throughput. Fold order is i ascending per output dim, mirrored
    * by the oracle's ordered `list_reduce`, and ±1.0 products are exact
    * IEEE sign flips, so projected values are bit-identical across
    * engines. `inDims` must equal the stored vector width (the literal
    * plane length is fixed at plan time).
    */
  def rpProject(
      emb: DataFrame, outDims: Int, inDims: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(outDims > 0 && inDims > 0, "rpProject: dims must be positive")
    val v = toDouble(col(embCol))
    val planes = (0 until outDims).map { j =>
      array((1 to inDims).map(i => lit(rpSign(j, i).toDouble)): _*)
    }
    emb.select(col(idCol), array(planes.map(p => dot(v, p)): _*).as(embCol))
  }

  /** ±1 sign for projection cell (j, i): md5("rp:j:i") 15-hex-digit parity
    * — the [[trainCentroids]] md5-bucket discipline applied to a coordinate
    * pair (i is 1-based to match SQL `generate_subscripts`). The oracle
    * replays it as `CAST(('0x'||substring(md5(…),1,15)) AS BIGINT) % 2`.
    */
  private[graft] def rpSign(j: Int, i: Int): Int = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp:$j:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = digest.map(b => f"$b%02x").mkString.take(15)
    if ((java.lang.Long.parseLong(hex, 16) & 1L) == 0L) 1 else -1
  }

  /** Per-DIMENSION embedding health audit: for each coordinate i — row
    * count, dead-coordinate count (value rounds to 0 at micro-unit
    * precision), micro-unit sum and square sum, and min/max. This is the
    * screen that catches collapsed dimensions (variance ≈ 0: the dim
    * carries no information yet costs bytes and FLOPs in every dot
    * product, and misleads [[int8Quantize]] scales) and scale drift
    * between embedding batches BEFORE an index is built on them. Mean and
    * variance are exact integer arithmetic downstream:
    * mean = sum_e6/n·10⁻⁶, var = (n·sum_sq_e12 − sum_e6²)/n²·10⁻¹².
    *
    * Determinism: values are fenced to micro-unit integers FIRST (explicit
    * half-away-from-zero — the [[int8Quantize]] idiom), so every aggregate
    * is an order-independent integer fold, engine-exact with no ordered
    * float folds. Overflow boundary: sum_sq_e12 sums ≤10¹² addends in
    * int64 — exact past 9·10⁶ rows/dim at |v| ≤ 1; wider corpora lift the
    * two sums to DECIMAL(38,0) (the aggregateFractional carrier) with the
    * same shape.
    *
    * Scale shape: one explode + one (dim → stats) hash aggregation —
    * map-side combine collapses every task to ≤ dims rows before the
    * single exchange; output is dims-bounded.
    */
  /** Anisotropy audit — the common-direction bias check (Ethayarajh 2019's
    * embedding-geometry finding): how concentrated the corpus is around
    * its own MEAN direction. Contextual/encoder embeddings routinely
    * collapse into a narrow cone (average cosine-to-mean ≫ 0), which
    * silently inflates every cosine similarity an ANN index serves; this
    * row is the one-pass census a pipeline reads before trusting raw
    * cosine scores. Complements the spectrum screens ([[pcaTop]] /
    * [[effectiveRank]] measure variance shape AFTER centering; this
    * measures the uncentered mean-direction bias those screens remove).
    *
    * Output (one row, integers only): n_vecs, the mean vector's squared
    * norm in e-8 units (exact — 0 ⟺ perfectly balanced corpus), and a
    * fixed-threshold census of per-vector cosine-to-mean (< 0, ≥ .25,
    * ≥ .5, ≥ .75, ≥ .9).
    *
    * Determinism: the mean direction is fenced to an exact integer e-4
    * vector FIRST (per-dim sign-safe floor division, the [[dimStats]]
    * idiom — engine `div` vs `//` semantics never touch a negative), so
    * both engines agree on μ bit-for-bit; per-vector cosines then follow
    * the house ordered-fold + round-4dp discipline, and the census
    * compares rounded values against exactly-representable literals.
    *
    * Scale shape: one explode + dims-bounded agg for μ (map-side
    * combined), the tiny μ row broadcast, then one row-local projection
    * + one global count agg — no corpus-keyed exchange at all.
    */
  def anisotropy(
      emb: DataFrame, idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val p = prepared(emb, idCol, embCol)
    val v4 = expr(
      "transform(v, x -> CAST(sign(x) * floor(abs(x) * 10000 + 0.5) AS BIGINT))")
    val mu = p.select(posexplode(v4).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .select(col("i"),
        expr("CAST(sign(s) * (abs(s) div n) AS BIGINT)").as("m4"))
      .agg(
        expr("transform(array_sort(collect_list(struct(i, m4))), " +
          "e -> CAST(e.m4 AS DOUBLE) / 10000.0)").as("mud"),
        expr("aggregate(collect_list(m4 * m4), 0L, (a, x) -> a + x)")
          .as("mu_norm_sq_e8"))
    // try_divide: a zero-mean (perfectly balanced) corpus or a zero-norm
    // vector makes cosine-to-mean undefined → NULL, counted in no census
    // bucket — DuckDB's x/0.0 is NULL too, so parity is exact
    val cos = round(
      try_divide(dot(col("v"), col("mud")),
        col("nrm") * sqrt(expr("aggregate(mud, 0d, (a, x) -> a + x * x)"))),
      4)
    p.crossJoin(broadcast(mu))
      .select(col("mu_norm_sq_e8"), cos.as("c"))
      .agg(
        count(lit(1)).as("n_vecs"),
        max(col("mu_norm_sq_e8")).as("mu_norm_sq_e8"),
        sum(when(col("c") < 0.0, 1L).otherwise(0L)).as("n_cos_lt_0"),
        sum(when(col("c") >= 0.25, 1L).otherwise(0L)).as("n_cos_ge_25"),
        sum(when(col("c") >= 0.5, 1L).otherwise(0L)).as("n_cos_ge_50"),
        sum(when(col("c") >= 0.75, 1L).otherwise(0L)).as("n_cos_ge_75"),
        sum(when(col("c") >= 0.9, 1L).otherwise(0L)).as("n_cos_ge_90"))
  }

  def dimStats(
      emb: DataFrame, idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val p = prepared(emb, idCol, embCol)
    val v6 = (signum(col("v")) * floor(abs(col("v")) * lit(1e6) + lit(0.5))).cast("long")
    p.select(posexplode(col("v")).as(Seq("i0", "v")))
      .select((col("i0") + 1).cast("long").as("i"), v6.as("v6"))
      .groupBy(col("i"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("v6") === 0L, 1L).otherwise(0L)).as("n_dead"),
        sum(col("v6")).as("sum_e6"),
        sum(col("v6") * col("v6")).as("sum_sq_e12"),
        min(col("v6")).as("min_e6"),
        max(col("v6")).as("max_e6"))
  }

  /** Pairwise dimension covariance/correlation audit — the REDUNDANCY
    * screen completing [[dimStats]]'s per-dim view: a near-±1 correlated
    * dimension pair means the corpus pays bytes, FLOPs, and index quality
    * for a coordinate carrying (almost) no independent information (and a
    * candidate for [[rpProject]]/matryoshka-style width reduction). For
    * every pair i < j: n, the micro-unit cross-moment Σvᵢvⱼ, the exact
    * integer covariance numerator n·Σvᵢvⱼ − Σvᵢ·Σvⱼ, and Pearson
    * correlation rounded at 4 dp (NULL where either variance is 0 — a dead
    * dim correlates with nothing).
    *
    * Scale shape: ONE corpus pass, zero explodes — the fenced vector gets
    * a constant-1 homogeneous coordinate and folds through
    * [[graft.functions.GramMatrixAgg]], whose task-local buffer
    * ((d+1)(d+2)/2 longs ≈ 17 KB at d=64) carries ALL sufficient
    * statistics (cross-moments, first moments at cells (i, d), n at
    * (d, d)); the exchange moves one buffer per task. The compositional
    * alternative explodes each row into d(d+1)/2 pair rows before
    * aggregating — the corpus multiplied ~2000× at d=64 (A/B'd in
    * ScaleSmoke). Everything downstream of the 1-row agg result is
    * dims²-bounded local arithmetic.
    *
    * Determinism: micro-unit fencing first (the [[dimStats]] idiom), so
    * every sum is an order-free integer fold; covariance numerators in
    * DECIMAL(38,0) (n·Σvᵢvⱼ nears int64 at the fixture already); corr is
    * a fixed-order IEEE chain (int→double casts are correctly rounded in
    * both engines) rounded at 4 with `+0.0`. Int64 Gram-cell boundary:
    * exact past 9·10⁶ rows at |v| ≤ 1 (the GramMatrixAgg contract).
    *
    * Eager like [[trainCentroids]]: the Gram buffer is collected (ONE
    * action, ONE corpus pass — re-deriving per-pair frames from the lazy
    * agg would replan the corpus aggregation once per consumer), and the
    * dims²-bounded tail is local arithmetic over literal rows.
    */
  /** One corpus pass: micro-unit fencing + homogeneous coordinate through
    * [[graft.functions.GramMatrixAgg]], collected (a (d+1)(d+2)/2-long
    * bounded global decision — the [[trainCentroids]] discipline). Returns
    * the cell accessor over the (d+1)-triangle: (i, j) for i ≤ j ≤ dims,
    * where column `dims` is the homogeneous coordinate (first moments at
    * (i, dims), n at (dims, dims)).
    */
  private def gramCells(
      emb: DataFrame, dims: Int, embCol: String): (Int, Int) => Long = {
    val bigD = dims + 1
    val v6 = transform(toDouble(col(embCol)),
      x => (signum(x) * floor(abs(x) * lit(1e6) + lit(0.5))).cast("long"))
    val gramArr = emb.select(concat(v6, array(lit(1L))).as("v6"))
      .agg(graft.functions.GramMatrix(col("v6"), bigD).as("g"))
      .head.getSeq[Long](0)
    (i: Int, j: Int) => gramArr(graft.functions.GramMatrix.flatIndex(i, j, bigD))
  }

  def dimCovariance(
      emb: DataFrame, dims: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(dims > 0, "dimCovariance: dims must be positive")
    val sp = emb.sparkSession
    import sp.implicits._
    val cell = gramCells(emb, dims, embCol)
    val n = cell(dims, dims)
    val rows = for { i <- 0 until dims; j <- (i + 1) until dims }
      yield (i + 1L, j + 1L, cell(i, j), cell(i, dims), cell(i, i), cell(j, dims), cell(j, j))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val nd = dec(lit(n))
    val cov = nd * dec(col("s_ij")) - dec(col("s1_i")) * dec(col("s1_j"))
    val vri = nd * dec(col("s2_i")) - dec(col("s1_i")) * dec(col("s1_i"))
    val vrj = nd * dec(col("s2_j")) - dec(col("s1_j")) * dec(col("s1_j"))
    rows.toDF("i", "j", "s_ij", "s1_i", "s2_i", "s1_j", "s2_j")
      .select(
        col("i"), col("j"), lit(n).as("n"), col("s_ij").as("sum_ij_e12"),
        cov.cast("long").as("cov_e12"),
        when(vri === dec(lit(0)) || vrj === dec(lit(0)), lit(null).cast("double"))
          .otherwise(round(cov.cast("double") /
            sqrt(vri.cast("double") * vrj.cast("double")), 4) + lit(0.0))
          .as("corr"))
  }

  /** Top-principal-component audit (fixed-round power iteration over the
    * integer covariance): per dimension the micro-unit loading of the
    * dominant eigenvector, plus the ppm share of total variance that
    * component explains (Rayleigh quotient / trace). This is the
    * ANISOTROPY screen completing the embedding-health suite
    * ([[dimStats]]: per-dim, [[dimCovariance]]: pairwise): a high
    * `var_top_ppm` means the corpus collapses toward one direction (the
    * common-direction pathology that wrecks cosine contrast and IVF cell
    * balance) and the loadings name the dimensions carrying it — the
    * go/no-go before trusting an index or a [[semDedup]] threshold on
    * these vectors.
    *
    * Scale shape: the SAME single corpus pass as [[dimCovariance]] (the
    * collected Gram triangle); everything after is driver arithmetic on
    * the d×d integer matrix — a bounded global decision (d² longs), never
    * touching the corpus again. Output is a dims-row local frame.
    *
    * Determinism: the covariance is scaled by integer division
    * `sign·(|cov| / covDiv)` FIRST (exact in both engines — the float
    * seam is fenced away before any float op), and every subsequent step
    * is either exact integer arithmetic (mat-vec products in big-integer
    * space) or a fixed-order IEEE chain on exactly-representable doubles:
    * component sums stay below 2⁵³ when d·(n²·10¹²/covDiv)·10⁶ < 2⁵³ —
    * covDiv is the knob, 10¹² holds past n = 3·10⁵ rows and larger
    * corpora raise it; norms/Rayleigh fold in ascending (i, j) order
    * (mirrored by the oracle's ordered `list_reduce`); loadings re-fence
    * to micro-units each round. Seed 10⁶ + 1000·i (deterministic,
    * non-uniform so data axes orthogonal to a flat seed don't zero the
    * iteration). Degenerate inputs (zero scaled covariance) yield zero
    * loadings and NULL `var_top_ppm` rather than NaN.
    */
  def pcaTop(
      emb: DataFrame, dims: Int, iters: Int = 3,
      covDiv: Long = 1000000000000L,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(dims > 0 && iters > 0 && covDiv > 0, "pcaTop: positive args required")
    val sp = emb.sparkSession
    import sp.implicits._
    val cell = gramCells(emb, dims, embCol)
    val nB = BigInt(cell(dims, dims))
    def s1(i: Int) = BigInt(cell(i, dims))
    def rawCov(i: Int, j: Int) =
      nB * BigInt(if (i <= j) cell(i, j) else cell(j, i)) - s1(i) * s1(j)
    // scaled integer covariance: sign·(|cov| / covDiv) — truncation toward
    // zero in both engines (DuckDB // on the non-negative abs)
    val covS = Array.tabulate(dims, dims) { (i, j) =>
      val c = rawCov(i, j)
      (c.sign, c.abs / covDiv) match { case (s, m) => s * m }
    }
    var v = Array.tabulate(dims)(i => BigInt(1000000L + 1000L * (i + 1)))
    var degenerate = false
    var it = 0
    while (it < iters && !degenerate) {
      val comp = Array.tabulate(dims) { i =>
        (0 until dims).foldLeft(BigInt(0))((acc, j) => acc + covS(i)(j) * v(j))
      }
      val compD = comp.map(_.toDouble)
      val nrm = math.sqrt(compD.foldLeft(0.0)((acc, x) => acc + x * x))
      if (nrm == 0.0) degenerate = true
      else v = compD.map(x =>
        BigInt((math.signum(x) * math.floor(math.abs(x / nrm) * 1e6 + 0.5)).toLong))
      it += 1
    }
    val loadings = if (degenerate) Array.fill(dims)(0L) else v.map(_.toLong)
    val varTop: Option[Long] = if (degenerate) None else {
      // Rayleigh/trace in a fixed-order double fold over (i, j) ascending —
      // each product one IEEE op on exact inputs, mirrored by the oracle
      var num = 0.0
      var i = 0
      while (i < dims) {
        var j = 0
        while (j < dims) {
          num += covS(i)(j).toDouble * loadings(i).toDouble * loadings(j).toDouble
          j += 1
        }
        i += 1
      }
      val den = loadings.foldLeft(BigInt(0))((acc, x) => acc + BigInt(x) * BigInt(x))
      val trace = (0 until dims).foldLeft(BigInt(0))((acc, i) => acc + covS(i)(i))
      if (den == 0 || trace == 0) None
      else {
        val ve = num / den.toDouble / trace.toDouble
        Some((math.signum(ve) * math.floor(math.abs(ve) * 1e6 + 0.5)).toLong)
      }
    }
    (1 to dims).map(i => (i.toLong, loadings(i - 1), varTop))
      .toDF("i", "loading_e6", "var_top_ppm")
  }

  /** Effective rank (participation ratio) of the embedding covariance —
    * (Σλ)² / Σλ² = trace(C)² / Σᵢⱼ Cᵢⱼ², the standard "how many
    * dimensions actually carry variance" number, computed WITHOUT any
    * eigendecomposition: both trace and the squared Frobenius norm are
    * exact integer functionals of the covariance numerators. Ranges from
    * 1 (rank-collapsed — the [[pcaTop]] pathology at its extreme) to
    * dims (isotropic); the one-number screen read before the loadings.
    *
    * Scale shape: the SAME single [[graft.functions.GramMatrixAgg]]
    * corpus pass as [[dimCovariance]]/[[pcaTop]]; everything after is
    * exact BigInt driver arithmetic on the d² integers — a bounded
    * global decision. Output is one row.
    *
    * Determinism: covariance numerators are scaled FIRST by integer
    * division — sign·(|n·Sᵢⱼ − sᵢsⱼ| div covDiv), the [[pcaTop]] fence —
    * which also keeps the oracle's squares inside HUGEINT (the raw
    * numerators square past 2¹²⁷); then eff_rank_ppm = (10⁶·trace²) div
    * Σcov² — one positive integral floor, mirrored exactly. NULL on a
    * zero scaled covariance (no variance anywhere at this covDiv).
    */
  def effectiveRank(
      emb: DataFrame, dims: Int, covDiv: Long = 1000000000L,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(dims > 0 && covDiv > 0, "effectiveRank: positive args required")
    val sp = emb.sparkSession
    import sp.implicits._
    val cell = gramCells(emb, dims, embCol)
    val nB = BigInt(cell(dims, dims))
    def s1(i: Int) = BigInt(cell(i, dims))
    def cov(i: Int, j: Int) = {
      val c = nB * BigInt(if (i <= j) cell(i, j) else cell(j, i)) - s1(i) * s1(j)
      c.sign * (c.abs / covDiv)
    }
    val trace = (0 until dims).foldLeft(BigInt(0))((a, i) => a + cov(i, i))
    val sumSq = (for { i <- 0 until dims; j <- 0 until dims } yield cov(i, j))
      .foldLeft(BigInt(0))((a, c) => a + c * c)
    val effPpm: Option[Long] =
      if (sumSq == 0) None
      else Some(((trace * trace * 1000000L) / sumSq).toLong)
    Seq((dims.toLong, nB.toLong, effPpm))
      .toDF("dims", "n_vecs", "eff_rank_ppm")
  }

  /** Per-cell quality/balance audit of a trained coarse quantizer — the
    * measurement that decides k before committing an [[ivfTopK]] index or
    * a [[semDedup]] run: cell SIZE skew bounds both of them (a cell is an
    * unsplittable probe/pair-scan unit — [[semDedup]]'s cost is
    * Σ|cell|²/2), and cell COHERENCE (the member→centroid cosine spread)
    * tells whether k is large enough for the corpus. Emits one row per
    * surviving cell: member count, integer-summed rounded cosine (÷10⁴ =
    * mean coherence; summed as integers so the aggregate is
    * order-independent and engine-exact — the per-member cosine is already
    * rounded to 4 dp, so ×10⁴ is integral), and the min/max member cosine.
    *
    * Scale shape: training is [[trainCentroids]] (its documented
    * contract); the audit itself is one zero-exchange assignment pass
    * ([[graft.functions.NearestCentroidCells]]), a broadcast join against
    * the k-row centroid table for scoring, and a k-row hash aggregation —
    * map-side combine collapses every task to ≤ k rows, so the audit adds
    * one narrow scan at any corpus size.
    */
  def clusterStats(
      emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val cents = trainCentroids(emb, k, iters, idCol, embCol)
    val assigned = assignCells(prepared(emb, idCol, embCol), cents, nprobe = 1)
    assigned.join(broadcast(cents), col("cell") === col("cid"))
      .withColumn("cosine",
        round(dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")), 4) + lit(0.0))
      .groupBy(col("cell"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(round(col("cosine") * 10000).cast("long")).as("sum_cos_e4"),
        (min(col("cosine")) + lit(0.0)).as("min_cos"),
        (max(col("cosine")) + lit(0.0)).as("max_cos"))
  }

  /** IVF-PQ — the MEMORY leg of the 100 TB ANN story. [[ivfTopK]] bounds
    * how much of the corpus a query scans (nprobe/k cells); product
    * quantization bounds how many BYTES each scanned vector costs: every
    * corpus vector is stored as `m` small codeword ids (here m codes into
    * `ksub`-entry codebooks — 4 bytes/vector at the defaults vs 256 bytes
    * of raw doubles), and queries rank candidates with asymmetric distance
    * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011): per probed cell the query builds an m×ksub
    * lookup table of exact subvector distances ONCE, then each candidate
    * costs m table lookups — no vector arithmetic per candidate.
    *
    * Residual quantization: codes quantize `v − centroid(cell(v))`, not the
    * raw vector — residuals concentrate near 0 so the same codebook budget
    * buys more precision (the IVF-PQ pairing from the paper).
    *
    * A PQ shortlist is approximate by construction (quantization error is
    * in the SCORE, not just the candidate set), so the operator finishes
    * with the production refine stage: ADC keeps the cheap top-`rerank`
    * shortlist per query, then EXACT L2 on raw vectors ranks the final
    * top-k — only `rerank` full vectors per query are ever touched, which
    * is the whole point of carrying codes instead of vectors through the
    * scan.
    *
    * Every training decision is deterministic and engine-replayable, the
    * [[trainCentroids]] discipline throughout: coarse cells = Lloyd's
    * rounds from md5-bucket init (decimal-exact means, rounded-cosine
    * re-assignment); codebooks = per-subspace Lloyd's over residuals
    * (md5-bucket init, decimal-exact means, rounded-L2 re-assignment with
    * codeword-id tie-break, emptied codewords keep their previous value);
    * encode = argmin of squared L2 built as the same left-assoc double
    * fold in both engines; ADC sums tables in subspace order; refine is an
    * ordered exact fold. The oracle replays all of it as CTEs
    * ([[ivfPqOracleSql]]).
    *
    * Plan shape: corpus assignment + residual + encode are one narrow
    * projection (centroids and codebooks ride in as literals — tiny by
    * contract); the ADC tables live on the (queries × nprobe)-row side and
    * broadcast into the candidate join, so the corpus side never
    * exchanges before the per-query rank windows; the refine join
    * broadcasts the (queries × rerank)-row shortlist back onto the raw
    * vectors (EngineSpec pins the corpus side exchange-free). Codebook
    * TRAINING runs `pqIters` aggregation jobs over the corpus — at real
    * scale set `trainFrac < 1` to train on an md5-bucket sample and
    * encode everything (see [[trainPq]]; the `ann_ivfpq_sampled` row
    * oracle-verifies it), and persist the artifact with
    * [[graft.sources.AnnIndex.buildPq]] so serving scans codes, not
    * vectors.
    */
  def ivfPqTopK(
      emb: DataFrame, queries: DataFrame, k: Int,
      kCoarse: Int = 4, coarseIters: Int = 2,
      m: Int = 8, ksub: Int = 8, pqIters: Int = 3,
      nprobe: Int = 2, rerank: Int = 50, trainFrac: Double = 1.0,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(k >= 1 && nprobe >= 1 && rerank >= k,
      s"bad IVF-PQ parameters: k=$k nprobe=$nprobe rerank=$rerank")
    val model = trainPq(emb, kCoarse, coarseIters, m, ksub, pqIters,
      trainFrac, idCol, embCol)
    ivfPqTopKWith(model, emb, queries, k, nprobe, rerank, idCol, embCol)
  }

  /** The SERVE half of [[ivfPqTopK]] against an ALREADY-TRAINED model —
    * encode + ADC shortlist + exact refine, no training jobs. This is
    * the build-once/serve-many seam: train the model once (per corpus,
    * per parameterization), serve every query batch through it.
    */
  def ivfPqTopKWith(
      model: PqModel, emb: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int = 2, rerank: Int = 50,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(k >= 1 && nprobe >= 1 && rerank >= k,
      s"bad IVF-PQ parameters: k=$k nprobe=$nprobe rerank=$rerank")
    // one prepared corpus frame shared by the encode pass AND the exact
    // refine (training caches its own internally) — without the persist
    // each stage would re-derive and re-scan the corpus
    val p = prepared(emb, idCol, embCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val encoded = encodePqPrepared(p, model)
    val qtab = pqQueryTables(queries, model, nprobe, idCol, embCol)
    val out = pqServe(encoded, qtab, p, queries, k, rerank,
      model, idCol, embCol)
    p.unpersist(blocking = false)
    out
  }

  /** Trained IVF-PQ model — coarse centroids, embedding geometry, and the
    * codebook map keyed (subspace, codeword, within-subspace dim). Tiny
    * by contract (kCoarse·dims + m·ksub·dsub doubles): it travels into
    * plans as literals/broadcast, and persists as two small parquet
    * tables in [[graft.sources.AnnIndex]]'s PQ artifact.
    */
  final case class PqModel(cents: Seq[(Long, Array[Double], Double)],
      dims: Int, m: Int, ksub: Int, cb: Map[(Int, Int, Int), Double]) {
    def dsub: Int = dims / m
  }

  /** The TRAINING half of [[ivfPqTopK]]: coarse Lloyd's + per-subspace
    * codebook Lloyd's over residuals, all deterministic (md5-bucket init,
    * decimal-exact means, rounded re-assignment, keep-previous on emptied
    * codewords). `trainFrac < 1` trains the CODEBOOKS on an md5-bucket
    * sample of the corpus (the [[TextAnalysis.bpeVocabSampled]]
    * discipline — a pure function of the id, so a SQL oracle re-draws the
    * identical sample): codebook statistics are distribution-dominated,
    * so the production path is "train on a sample, ENCODE everywhere",
    * cutting the `pqIters` corpus-sized training aggregations to
    * sample-sized while the encode/serve math is unchanged.
    * `trainFrac = 1` keeps every row and reproduces the full training
    * bit-for-bit.
    */
  def trainPq(
      emb: DataFrame, kCoarse: Int = 4, coarseIters: Int = 2,
      m: Int = 8, ksub: Int = 8, pqIters: Int = 3, trainFrac: Double = 1.0,
      idCol: String = "vec_id", embCol: String = "embedding"): PqModel = {
    require(kCoarse >= 1 && coarseIters >= 1,
      s"bad IVF-PQ parameters: kCoarse=$kCoarse coarseIters=$coarseIters")
    trainPqWith(
      collectCentroids(
        trainCentroids(emb, kCoarse, iters = coarseIters, idCol, embCol)),
      emb, m, ksub, pqIters, trainFrac, idCol, embCol)
  }

  /** [[trainPq]] with the coarse quantizer ALREADY trained — the seam
    * that lets a registry/serving layer train the coarse centroids once
    * and share them across every IVF consumer (plain IVF serving, the
    * full-train PQ model, the sampled-train PQ model) instead of
    * re-running coarse Lloyd's per caller. Value-identical to
    * [[trainPq]] when `cents` came from the same
    * [[trainCentroids]](kCoarse, coarseIters) call.
    */
  def trainPqWith(
      cents: Seq[(Long, Array[Double], Double)], emb: DataFrame,
      m: Int = 8, ksub: Int = 8, pqIters: Int = 3, trainFrac: Double = 1.0,
      idCol: String = "vec_id", embCol: String = "embedding"): PqModel = {
    require(cents.nonEmpty && m >= 1 && ksub >= 2 && pqIters >= 1,
      s"bad IVF-PQ parameters: kCoarse=${cents.size} m=$m ksub=$ksub " +
        s"pqIters=$pqIters")
    require(trainFrac > 0.0 && trainFrac <= 1.0,
      s"trainFrac must be in (0,1], got $trainFrac")
    val p = prepared(emb, idCol, embCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dims = p.select(size(col("v"))).first().getInt(0)
    require(dims % m == 0, s"dims=$dims not divisible by m=$m subspaces")
    val dsub = dims / m

    val sorted = cents.sortBy(_._1)

    val assigned = assignCellsLocal(p, cents, nprobe = 1)

    // training representation: one row per SAMPLED vector carrying its
    // full residual ARRAY. Re-assignment is then a ROW-LOCAL argmin per
    // subspace (the encode stage's least(struct) over the identical
    // left-assoc j-ascending fold), and only the means aggregation
    // explodes to (s, cw, j) rows. The previous form exploded residuals
    // up front and paid a broadcast join + collect_list re-sort per
    // Lloyd's round just to rebuild this fold order; row-local distances
    // make each round one narrow projection + one map-side-combined mean
    // agg over the SAME values in the SAME association order, with the
    // same round(·,6) + codeword-id tie-break — assignments and means
    // are value-identical, so the oracle replay is unchanged (the full
    // gate re-verified bit-exact after this rewrite).
    val sampled =
      if (trainFrac >= 1.0) lit(true)
      else substring(md5(col("id").cast("string")), 1, 2) <
        lit(Splits.fractionThreshold(trainFrac))
    import org.apache.spark.sql.types.DecimalType
    val cellIdx = sorted.map(_._1).zipWithIndex.tail
      .foldLeft(when(col("cell") === sorted.head._1, lit(0))) {
        case (acc, (cid, idx)) => acc.when(col("cell") === cid, lit(idx))
      }
    val centMatrix = typedlit(sorted.map(_._2.toSeq))
    val base = assigned
      .filter(sampled)
      .select(col("id"),
        zip_with(col("v"), element_at(centMatrix, cellIdx + 1),
          (x, c) => x - c).as("rv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // decimal-exact per-(subspace, codeword, dim) means of a frame
    // carrying `cws` (assigned codeword per subspace, array<int>)
    def decMean(df: DataFrame): Map[(Int, Int, Int), Double] = df
      .select(col("cws"), posexplode(col("rv")).as(Seq("i", "x")))
      .groupBy(
        expr(s"i div $dsub").cast("int").as("s"),
        element_at(col("cws"), expr(s"i div $dsub").cast("int") + 1).as("cw"),
        expr(s"i % $dsub").cast("int").as("j"))
      .agg((sum(col("x").cast(DecimalType(28, 12))).cast("double") /
        count(lit(1))).as("cm"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getDouble(3)))
      .toMap
    // round 1: md5-bucket init (one bucket per VECTOR, every subspace) →
    // decimal-exact means
    var cbMap = decMean(base.withColumn("cws",
      array_repeat(
        (conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
          .cast("long") % ksub).cast("int"), m)))
    require((0 until m).forall(s => (0 until ksub).forall(cw =>
      (0 until dsub).forall(j => cbMap.contains((s, cw, j))))),
      "every (subspace, codeword) init bucket must be populated — corpus too small for ksub")
    // Lloyd's rounds over residual subvectors: re-assign to the nearest
    // codeword (rounded squared L2, codeword-id tie-break — the round's
    // codebook rides as plan literals, m·ksub·dsub doubles), re-average.
    (2 to pqIters).foreach { _ =>
      def sqd(rv: Column, s: Int, cw: Int): Column =
        (0 until dsub).map { j =>
          val t = rv(s * dsub + j) - lit(cbMap((s, cw, j)))
          t * t
        }.reduceLeft(_ + _)
      val asn = base.withColumn("cws", array((0 until m).map { s =>
        least((0 until ksub).map(cw =>
          struct(round(sqd(col("rv"), s, cw), 6).as("d"), lit(cw).as("c"))): _*)
          .getField("c")
      }: _*))
      val newMeans = decMean(asn)
      // a codeword that lost every member keeps its previous value — the
      // deterministic rule a SQL oracle reproduces (vs a random re-seed)
      cbMap = cbMap.map { case (key, prev) => key -> newMeans.getOrElse(key, prev) }
    }
    base.unpersist(blocking = false)
    p.unpersist(blocking = false)
    PqModel(cents, dims, m, ksub, cbMap)
  }

  /** The coarse-cell residual of `v` under the model's centroids, as one
    * row-local projection (centroid matrix rides as a plan literal —
    * kCoarse·dims doubles, tiny by contract).
    */
  private def pqResidCol(model: PqModel): Column = {
    val sorted = model.cents.sortBy(_._1)
    val cellIdx = sorted.map(_._1).zipWithIndex.tail
      .foldLeft(when(col("cell") === sorted.head._1, lit(0))) {
        case (acc, (cid, idx)) => acc.when(col("cell") === cid, lit(idx))
      }
    val centMatrix = typedlit(sorted.map(_._2.toSeq))
    zip_with(col("v"), element_at(centMatrix, cellIdx + 1), (x, c) => x - c)
  }

  /** Squared-L2 distance of a residual subvector to a codeword, built as
    * the left-assoc fold both engines replay term-for-term.
    */
  private def pqSqDist(model: PqModel, rv: Column, s: Int, cw: Int): Column =
    (0 until model.dsub).map { j =>
      val t = rv(s * model.dsub + j) - lit(model.cb((s, cw, j)))
      t * t
    }.reduceLeft(_ + _)

  /** The ENCODE half of [[ivfPqTopK]]: narrow assignment + residual + PQ
    * code per subspace (nearest codeword, id tie-break via lexicographic
    * struct min) — one row-local projection per vector, `(id, cell,
    * code_0..code_{m-1})`. This is the representation the PQ artifact
    * persists: m small ints per vector instead of dims doubles.
    */
  def encodePq(emb: DataFrame, model: PqModel,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    encodePqPrepared(prepared(emb, idCol, embCol), model)

  /** [[encodePq]] over an already-prepared `(id, v, nrm)` frame — lets
    * [[ivfPqTopK]] share one persisted corpus frame across encode and
    * refine instead of re-deriving it per stage.
    */
  private[graft] def encodePqPrepared(p: DataFrame, model: PqModel): DataFrame = {
    val assigned = assignCellsLocal(p, model.cents, nprobe = 1)
    (0 until model.m).foldLeft(
      assigned.withColumn("rv", pqResidCol(model))) { (df, s) =>
        df.withColumn(s"code_$s",
          least((0 until model.ksub).map(cw =>
            struct(pqSqDist(model, col("rv"), s, cw).as("d"), lit(cw).as("c"))): _*)
            .getField("c"))
      }
      .select(col("id") +: col("cell") +:
        (0 until model.m).map(s => col(s"code_$s")): _*)
  }

  /** The query side of [[ivfPqTopK]] serving: nprobe probed cells, one
    * ADC lookup table per (query, cell, subspace) — queries × nprobe
    * rows, meant to broadcast into the candidate join.
    */
  def pqQueryTables(queries: DataFrame, model: PqModel, nprobe: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val qp = prepared(queries, idCol, embCol)
    (0 until model.m).foldLeft(
      assignCellsLocal(qp, model.cents, nprobe)
        .withColumn("rv", pqResidCol(model))) { (df, s) =>
        df.withColumn(s"tab_$s",
          array((0 until model.ksub).map(cw =>
            pqSqDist(model, col("rv"), s, cw)): _*))
      }
      .select(col("id").as("query_id") +: col("cell") +:
        (0 until model.m).map(s => col(s"tab_$s")): _*)
  }

  /** The SERVE half of [[ivfPqTopK]]: ADC shortlist over the encoded
    * corpus (codes join broadcast query tables — the corpus side never
    * exchanges), then exact-L2 refine over the raw vectors of the
    * shortlist only. `encoded` is [[encodePq]]'s output (in memory or
    * read back from the persisted artifact); `vectors` is the raw-vector
    * frame `(id, v, …)` the refine stage scans.
    */
  def pqServe(encoded: DataFrame, qtab: DataFrame, vectors: DataFrame,
      queries: DataFrame, k: Int, rerank: Int, model: PqModel,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(k >= 1 && rerank >= k, s"need rerank >= k >= 1: $rerank/$k")
    val m = model.m
    val adc = (0 until m).map(s =>
      element_at(col(s"tab_$s"), col(s"code_$s") + 1)).reduceLeft(_ + _)
    val shortlist = encoded
      .join(broadcast(qtab), Seq("cell"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        (round(adc, 6) + lit(0.0)).as("adc_dist"))
      .withColumn("rn_adc",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("adc_dist"), col("neighbor_id"))))
      .filter(col("rn_adc") <= rerank)
      .select(col("query_id"), col("neighbor_id"))

    // refine: exact L2 on the raw vectors of the shortlist only — the
    // shortlist (queries × rerank rows) broadcasts onto the corpus scan
    val qp = prepared(queries, idCol, embCol)
    vectors.select(col("id").as("neighbor_id"), col("v").as("nv"))
      .join(broadcast(shortlist), Seq("neighbor_id"))
      .join(broadcast(qp.select(col("id").as("query_id"), col("v").as("qv"))),
        Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (round(
          aggregate(zip_with(col("qv"), col("nv"), (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, t) => acc + t), 6) + lit(0.0)).as("l2_dist"))
      .withColumn("rnk",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("l2_dist"), col("neighbor_id"))).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** The full IVF-PQ pipeline as oracle SQL: coarse training + assignment
    * (the [[kmeansOracleCtes]] skeleton), residuals, `pqIters` codebook
    * Lloyd's rounds (keep-previous on emptied codewords), encode argmin,
    * ADC tables, the shortlist rank, and the exact-L2 refine — scoring
    * folds ordered (list_reduce) to match the Spark side bit-for-bit,
    * training distances rounded to 6 like the Spark side. Expects the
    * standard `f`/`nrm` embedding CTEs upstream. `trainFrac < 1` re-draws
    * the Spark side's md5-bucket codebook-training sample (`residT`) and
    * restricts every TRAINING CTE to it; assignment, encode, and serving
    * stay full-corpus, exactly like [[trainPq]].
    */
  def ivfPqOracleSql(
      k: Int, kCoarse: Int, coarseIters: Int, m: Int, ksub: Int, dsub: Int,
      pqIters: Int, nprobe: Int, rerank: Int, maxQueryId: Long,
      trainFrac: Double = 1.0): String =
    ivfPqServeSql(kCoarse, coarseIters, m, ksub, dsub, pqIters, nprobe,
      rerank, maxQueryId, trainFrac) +
      s"""
         |SELECT query_id, neighbor_id, l2_dist, rnk FROM fin
         |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  /** The serving chain with a RECALL tail instead of the top-k select:
    * exact-L2 brute ranking (the metric-matched baseline — PQ serves L2,
    * so cosine brute would mis-score it) + the hit join; the oracle for
    * `ann_recall_eval_pq`.
    */
  def ivfPqRecallOracleSql(
      k: Int, kCoarse: Int, coarseIters: Int, m: Int, ksub: Int, dsub: Int,
      pqIters: Int, nprobe: Int, rerank: Int, maxQueryId: Long,
      trainFrac: Double = 1.0): String =
    ivfPqServeSql(kCoarse, coarseIters, m, ksub, dsub, pqIters, nprobe,
      rerank, maxQueryId, trainFrac) +
      s""",
         |bd AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |         list_reduce(list((q.v-n.v)*(q.v-n.v) ORDER BY q.i), (x,y) -> x+y) AS dist
         |  FROM f q JOIN f n ON q.i=n.i AND q.vec_id<$maxQueryId AND q.vec_id<>n.vec_id
         |  GROUP BY 1,2),
         |br AS (
         |  SELECT query_id, neighbor_id,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY ROUND(dist,6)+0.0, neighbor_id) AS rnk
         |  FROM bd)
         |SELECT e.query_id, COUNT(*) AS k_exact,
         |       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
         |       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |         / COUNT(*) AS recall
         |FROM (SELECT query_id, neighbor_id FROM br WHERE rnk <= $k) e
         |LEFT JOIN (SELECT query_id, neighbor_id FROM fin WHERE rnk <= $k) a
         |       ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
         |GROUP BY 1 ORDER BY e.query_id""".stripMargin

  private def ivfPqServeSql(
      kCoarse: Int, coarseIters: Int, m: Int, ksub: Int, dsub: Int,
      pqIters: Int, nprobe: Int, rerank: Int, maxQueryId: Long,
      trainFrac: Double): String = {
    val cl = s"c$coarseIters"
    val cnl = s"cn$coarseIters"
    val trainSrc = if (trainFrac >= 1.0) "resid" else "residT"
    val residTCte =
      if (trainFrac >= 1.0) ""
      else
        s""",
           |residT AS (
           |  SELECT * FROM resid
           |  WHERE substring(md5(CAST(vec_id AS VARCHAR)),1,2) < '${Splits.fractionThreshold(trainFrac)}')""".stripMargin
    val pqRounds = (2 to pqIters).map { r =>
      s""",
         |pd${r - 1} AS (
         |  SELECT resid.vec_id, resid.s, cb${r - 1}.cw,
         |         ROUND(list_reduce(
         |           list((resid.rv-cb${r - 1}.m)*(resid.rv-cb${r - 1}.m) ORDER BY resid.j),
         |           (a,b) -> a+b),6) AS d
         |  FROM $trainSrc resid JOIN cb${r - 1} ON cb${r - 1}.s=resid.s AND cb${r - 1}.j=resid.j
         |  GROUP BY 1,2,3),
         |pa${r - 1} AS (
         |  SELECT vec_id, s, cw FROM (
         |    SELECT vec_id, s, cw,
         |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d, cw) AS rn
         |    FROM pd${r - 1})
         |  WHERE rn = 1),
         |nm$r AS (
         |  SELECT resid.s, pa${r - 1}.cw, resid.j,
         |         CAST(SUM(CAST(resid.rv AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*) AS m
         |  FROM $trainSrc resid JOIN pa${r - 1} ON pa${r - 1}.vec_id=resid.vec_id AND pa${r - 1}.s=resid.s
         |  GROUP BY 1,2,3),
         |cb$r AS (
         |  SELECT cb${r - 1}.s, cb${r - 1}.cw, cb${r - 1}.j,
         |         COALESCE(nm$r.m, cb${r - 1}.m) AS m
         |  FROM cb${r - 1} LEFT JOIN nm$r
         |    ON nm$r.s=cb${r - 1}.s AND nm$r.cw=cb${r - 1}.cw AND nm$r.j=cb${r - 1}.j)""".stripMargin
    }.mkString
    val cbl = s"cb$pqIters"
    kmeansOracleCtes(kCoarse, iters = coarseIters) +
      s""",
        |dfin AS (
        |  SELECT f.vec_id, $cl.cell,
        |         list_reduce(list(f.v*$cl.m ORDER BY f.i), (x,y) -> x+y) AS dot
        |  FROM f JOIN $cl ON f.i=$cl.i GROUP BY 1,2),
        |rfin AS MATERIALIZED (
        |  SELECT dfin.vec_id, dfin.cell,
        |         row_number() OVER (PARTITION BY dfin.vec_id
        |           ORDER BY ROUND(dfin.dot/(nrm.nrm*$cnl.cnrm),4) DESC, dfin.cell) AS rn
        |  FROM dfin JOIN nrm ON nrm.vec_id=dfin.vec_id
        |            JOIN $cnl ON $cnl.cell=dfin.cell),
        |ncell AS MATERIALIZED (SELECT vec_id, cell FROM rfin WHERE rn = 1),
        |qcell AS MATERIALIZED (SELECT vec_id, cell FROM rfin WHERE rn <= $nprobe AND vec_id < $maxQueryId),
        |resid AS MATERIALIZED (
        |  SELECT f.vec_id, (f.i-1) // $dsub AS s, (f.i-1) % $dsub AS j,
        |         f.v - $cl.m AS rv
        |  FROM f JOIN ncell USING (vec_id)
        |         JOIN $cl ON $cl.cell=ncell.cell AND $cl.i=f.i),
        |pw0 AS (
        |  SELECT vec_id,
        |         CAST(('0x'||substring(md5(CAST(vec_id AS VARCHAR)),1,15)) AS BIGINT) % $ksub AS cw
        |  FROM embeddings)""".stripMargin +
      residTCte +
      s""",
        |cb1 AS (
        |  SELECT resid.s, pw0.cw, resid.j,
        |         CAST(SUM(CAST(resid.rv AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*) AS m
        |  FROM $trainSrc resid JOIN pw0 USING (vec_id) GROUP BY 1,2,3)""".stripMargin +
      pqRounds +
      s""",
        |ed AS MATERIALIZED (
        |  SELECT resid.vec_id, resid.s, $cbl.cw,
        |         list_reduce(list((resid.rv-$cbl.m)*(resid.rv-$cbl.m) ORDER BY resid.j),
        |                     (a,b) -> a+b) AS d
        |  FROM resid JOIN $cbl ON $cbl.s=resid.s AND $cbl.j=resid.j
        |  GROUP BY 1,2,3),
        |code AS MATERIALIZED (
        |  SELECT vec_id, s, cw FROM (
        |    SELECT vec_id, s, cw,
        |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d, cw) AS rn
        |    FROM ed)
        |  WHERE rn = 1),
        |qresid AS MATERIALIZED (
        |  SELECT f.vec_id, qcell.cell, (f.i-1) // $dsub AS s, (f.i-1) % $dsub AS j,
        |         f.v - $cl.m AS rv
        |  FROM f JOIN qcell USING (vec_id)
        |         JOIN $cl ON $cl.cell=qcell.cell AND $cl.i=f.i),
        |qd AS MATERIALIZED (
        |  SELECT qresid.vec_id AS query_id, qresid.cell, qresid.s, $cbl.cw,
        |         list_reduce(list((qresid.rv-$cbl.m)*(qresid.rv-$cbl.m) ORDER BY qresid.j),
        |                     (a,b) -> a+b) AS d
        |  FROM qresid JOIN $cbl ON $cbl.s=qresid.s AND $cbl.j=qresid.j
        |  GROUP BY 1,2,3,4),
        |cand AS MATERIALIZED (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, n.cell
        |  FROM qcell q JOIN ncell n ON q.cell=n.cell AND q.vec_id<>n.vec_id),
        |adc AS MATERIALIZED (
        |  SELECT c.query_id, c.neighbor_id,
        |         list_reduce(list(qd.d ORDER BY qd.s), (a,b) -> a+b) AS dist
        |  FROM cand c
        |  JOIN code ON code.vec_id=c.neighbor_id
        |  JOIN qd ON qd.query_id=c.query_id AND qd.cell=c.cell
        |         AND qd.s=code.s AND qd.cw=code.cw
        |  GROUP BY 1,2),
        |short AS MATERIALIZED (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id
        |             ORDER BY ROUND(dist,6)+0.0, neighbor_id) AS rn
        |    FROM adc)
        |  WHERE rn <= $rerank),
        |ex AS (
        |  SELECT s.query_id, s.neighbor_id,
        |         list_reduce(list((a.v-b.v)*(a.v-b.v) ORDER BY a.i), (x,y) -> x+y) AS dist
        |  FROM short s
        |  JOIN f a ON a.vec_id=s.query_id
        |  JOIN f b ON b.vec_id=s.neighbor_id AND b.i=a.i
        |  GROUP BY 1,2),
        |fin AS (
        |  SELECT query_id, neighbor_id, ROUND(dist,6)+0.0 AS l2_dist,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |           ORDER BY ROUND(dist,6)+0.0, neighbor_id) AS BIGINT) AS rnk
        |  FROM ex)""".stripMargin
  }

  /** ANN quality evaluation — per-query recall of an approximate top-k
    * result against the exact one: `|approx ∩ exact| / |exact|` per query.
    * The tuning loop every production ANN deployment runs (sweep nprobe /
    * bands / k' on a query sample, read the recall curve, pick the knee);
    * here it is itself a first-class distributed operator instead of a
    * test-only assertion.
    *
    * Both inputs are (queryCol, neighborCol, …) top-k frames — any of
    * [[ivfTopK]], [[ivfPqTopK]], [[lshTopK]], [[lshTopKBanded]] against
    * [[bruteForceTopK]], or any two of them against each other. One keyed
    * left join + one per-query aggregation; cost is |queries|·k rows —
    * negligible next to either input's own computation at any scale.
    */
  def recallAt(
      approx: DataFrame, exact: DataFrame,
      queryCol: String = "query_id", neighborCol: String = "neighbor_id"): DataFrame =
    exact.select(col(queryCol), col(neighborCol))
      .join(
        approx.select(col(queryCol), col(neighborCol)).withColumn("hit", lit(1L)),
        Seq(queryCol, neighborCol), "left")
      .groupBy(col(queryCol))
      .agg(
        count(lit(1)).as("k_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col(queryCol), col("k_exact"), col("n_hits"),
        (col("n_hits").cast("double") / col("k_exact")).as("recall"))

  /** All pairs (a<b) with rounded cosine ≥ tau. Brute-force form; at scale,
    * use [[nearDupPairsBanded]]/[[nearDupPairsBucketed]] or
    * [[Dedup.minhashLshPairs]]-style banding over sign bits.
    */
  def nearDupPairs(
      emb: DataFrame, tau: Double,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val p = prepared(emb, idCol, embCol)
    // spread the STREAM side of the theta join: the `<` predicate plans
    // as a nested-loop whose per-task cost is |stream-partition| · |N|
    // dot products — on the unsplittable bench fixture that was ONE task
    // scoring every pair (identity at real scale — see
    // [[graft.operators.Dedup.spreadNarrowScan]])
    val a = graft.operators.Dedup.spreadNarrowScan(
      p.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")),
      col("id_a"))
    val b = p.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(
        col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4).as("cosine"))
      .filter(col("cosine") >= tau)
  }

  /** SemDeDup — SEMANTIC deduplication via cluster-bounded cosine pruning
    * (Abbas, Tirumala, Simig, Ganguli, Morcos, "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication", 2023): cluster
    * the embedding space with the deterministic [[trainCentroids]] Lloyd's
    * loop, then compare vectors ONLY within their cluster — a row is a
    * semantic duplicate when some lower-id vector in the same cluster has
    * rounded cosine ≥ tau (the library's keep-lowest-id survivor rule,
    * same as [[Dedup.survivors]]).
    *
    * This is the embedding-space answer to MinHash banding: the quadratic
    * pair space is bounded per CLUSTER (k knobs the bound), never corpus² —
    * at 100 TB the pair join's exchange is keyed on the cell id, candidate
    * volume is Σ|cell|²/2 ≈ N²/(2k), and the final survivor flag is one
    * left join keyed on the vector id. Assignment itself is the
    * zero-exchange broadcast-matrix map ([[assignCellsLocal]]).
    *
    * SCALE CONTRACT — k must scale with N: the cell id is BOTH the pair
    * join's shuffle key (k is the effective parallelism — k=8 means 8
    * productive shuffle partitions no matter the cluster size) and the
    * per-cell candidate bound (mean |cell| = N/k, per-cell work
    * (N/k)²/2). Pick k ∝ N (SemDeDup used k≈110k for its 5B-embedding
    * corpus, N/k ≈ 45k); a small fixed k on a large corpus serializes the
    * pair scan onto a handful of tasks AND blows up per-task candidate
    * volume. The tiny fixture k here is valid only because N is tiny.
    *
    * Returns one row PER INPUT VECTOR (nothing silently dropped):
    * (idCol, cell, keep, dup_of, max_cosine) — `dup_of` the smallest
    * same-cell lower id at ≥ tau (null when keep), `max_cosine` the
    * strongest such lower-id similarity.
    */
  def semDedup(
      emb: DataFrame, k: Int, iters: Int, tau: Double,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val cents = trainCentroids(emb, k, iters, idCol, embCol)
    val p = prepared(emb, idCol, embCol)
    val assigned = assignCells(p, cents, nprobe = 1)
    val a = assigned.select(col("cell"), col("id").as("id_a"), col("v").as("va"),
      col("nrm").as("na"))
    val b = assigned.select(col("cell"), col("id").as("id_b"), col("v").as("vb"),
      col("nrm").as("nb"))
    val dups = a.join(b, Seq("cell"))
      .filter(col("id_b") < col("id_a"))
      .select(col("id_a"),
        col("id_b"),
        (round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4) + lit(0.0))
          .as("cosine"))
      .filter(col("cosine") >= tau)
      .groupBy(col("id_a"))
      .agg(min(col("id_b")).as("dup_of"), max(col("cosine")).as("max_cosine"))
    assigned.select(col("id"), col("cell"))
      .join(dups.withColumnRenamed("id_a", "id"), Seq("id"), "left")
      .select(col("id").as(idCol), col("cell"),
        col("dup_of").isNull.as("keep"), col("dup_of"), col("max_cosine"))
  }

  /** Cross-split SEMANTIC contamination audit — the embedding-space
    * answer to [[graft.operators.Dedup.contaminationPairs]]: n-gram
    * decontamination (the Brown et al. 2020 appendix-C practice) cannot
    * see a PARAPHRASED eval document, whose rewrite shares no shingles
    * with its train twin but lands next to it in embedding space. For
    * each eval vector: the same-cell train-side cosines under a shared
    * trained quantizer (the [[semDedup]] cluster-bounded pair pruning,
    * Abbas et al. 2023, §SemDeDup — applied across the split boundary
    * instead of within the corpus), flagged at rounded cosine ≥ tau.
    *
    * This is the pre-eval go/no-go a training pipeline reads: a
    * contaminated=true row names the train document whose presence
    * invalidates the eval example BEFORE any benchmark number ships.
    *
    * Returns one row PER EVAL vector (nothing silently dropped):
    * `(idCol, cell, contaminated, train_match, max_cosine)` —
    * `train_match` the smallest same-cell train id at ≥ tau (null when
    * clean; the [[semDedup]] dup_of convention), `max_cosine` the
    * strongest such similarity.
    *
    * Scale shape: both assignments are the zero-exchange broadcast-
    * matrix map ([[assignCellsLocal]]); the only wide ops are the
    * cell-keyed cross join — candidate volume Σ|cell_t|·|cell_e|, and
    * the EVAL side is the small one by construction (benchmarks are
    * thousands of rows against a 100 TB train corpus), so each cell's
    * probe set broadcasts — and the eval-id-keyed reduce + left join
    * (eval-sized, not corpus-sized). k must scale with the TRAIN corpus
    * exactly as [[semDedup]]'s scale contract prescribes.
    */
  def semanticContamination(
      train: DataFrame, eval: DataFrame, centroids: DataFrame, tau: Double,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val at = assignCells(prepared(train, idCol, embCol), centroids, nprobe = 1)
    val ae = assignCells(prepared(eval, idCol, embCol), centroids, nprobe = 1)
    val hits = ae.select(col("cell"), col("id").as("id_e"), col("v").as("ve"),
        col("nrm").as("ne"))
      .join(at.select(col("cell"), col("id").as("id_t"), col("v").as("vt"),
        col("nrm").as("nt")), Seq("cell"))
      .select(col("id_e"), col("id_t"),
        (round(dot(col("ve"), col("vt")) / (col("ne") * col("nt")), 4) + lit(0.0))
          .as("cosine"))
      .filter(col("cosine") >= tau)
      .groupBy(col("id_e"))
      .agg(min(col("id_t")).as("train_match"), max(col("cosine")).as("max_cosine"))
    ae.select(col("id"), col("cell"))
      .join(hits.withColumnRenamed("id_e", "id"), Seq("id"), "left")
      .select(col("id").as(idCol), col("cell"),
        col("train_match").isNotNull.as("contaminated"),
        col("train_match"), col("max_cosine"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
    * diversity-aware serving: from each query's relevance-ranked
    * shortlist, greedily pick items maximizing
    * `λ·rel − (1−λ)·max-sim-to-already-picked`; at λ = ½ the ordering is
    * exactly `rel − maxsim`, kept here as pure int64 (similarities in
    * 10⁻⁴ cosine units), so every pick is a deterministic integer argmax
    * with an id tie-break. This is the serving-side answer to the
    * near-dup problem the dedup family measures: a top-k full of
    * one document's variants carries one document of information.
    *
    * Scale shape: the DISTRIBUTED work is the shortlist build and the
    * shortlist² pairwise similarities; the greedy loop itself runs on
    * the driver over nq·s² COLLECTED integers — bounded by contract
    * (s = `shortlist`), the Lloyd's/BPE bounded-global-decision pattern:
    * each pick IS a global decision over a tiny frame, and unrolling it
    * as k distributed joins would grow a 3^k lineage for no
    * data-parallel gain.
    *
    * CANDIDATE SOURCE — the scale knob: with `candidates = None` the
    * shortlist is the brute per-query score of EVERY corpus vector (a
    * queries×corpus nested-loop θ-join — the 100%-recall oracle
    * baseline, right only for sampled query sets). At corpus scale pass
    * `candidates = Some(frame)` with a pre-computed
    * `(query_id, neighbor_id, rel)` relevance frame from any verified
    * ANN chain — [[lshTopKBanded]] / [[ivfTopK]] / [[ivfPqTopK]] with
    * `rel = round(score·10⁴)` — and NO θ-join appears anywhere in the
    * plan: the frame is trimmed to the top-`shortlist` per query by
    * (rel desc, id) and only the s² pair scoring (an equi-join on the
    * query id) touches vectors. Diversity quality of the fed form is
    * measurable with [[recallAt]] against the brute form's picks.
    */
  def mmrRerank(emb: DataFrame, queries: DataFrame, shortlist: Int = 12,
      k: Int = 4, idCol: String = "vec_id",
      embCol: String = "embedding",
      candidates: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && shortlist >= k, s"need shortlist >= k >= 1: $shortlist/$k")
    val spark = emb.sparkSession
    import spark.implicits._
    val (cand, pairs) =
      mmrFrames(emb, queries, shortlist, idCol, embCol, candidates)
    val cs = cand.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sims = pairs.collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    cs.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (qid, rows) =>
      var rem = rows.map(c => (c._2, c._3)).toVector
      var sel = List.empty[Long]
      var step = 1L
      while (step <= k && rem.nonEmpty) {
        val scored = rem.map { case (nid, rel) =>
          val obj =
            if (sel.isEmpty) rel
            else rel - sel.map(o => sims((qid, nid, o))).max
          (nid, obj)
        }
        val best = scored.minBy { case (nid, obj) => (-obj, nid) }
        out += ((qid, best._1, step, best._2))
        sel = best._1 :: sel
        rem = rem.filterNot(_._1 == best._1)
        step += 1
      }
    }
    out.toSeq.toDF("query_id", "neighbor_id", "mmr_step", "objective")
  }

  /** [[mmrRerank]]'s two distributed frames, exposed for plan audits:
    * `cand(qid, nid, rel)` — the per-query shortlist (brute θ-join when
    * `candidates` is None, a rank-trim of the supplied ANN frame
    * otherwise) — and `pairs(qid, cid, oid, sim)` — the shortlist²
    * pairwise similarities, an EQUI-join on qid in both modes.
    */
  private[graft] def mmrFrames(
      emb: DataFrame, queries: DataFrame, shortlist: Int,
      idCol: String, embCol: String,
      candidates: Option[DataFrame]): (DataFrame, DataFrame) = {
    val n = prepared(emb, idCol, embCol)
    val base = candidates match {
      case Some(c) =>
        // candidates whose id is no longer in the corpus (a stale or
        // grown ANN artifact serving against a newer emb) are DROPPED
        // before ranking: they could win a shortlist slot but have no
        // vector for the pairwise stage, and the greedy's sims lookup
        // would throw on the driver mid-loop otherwise
        c.select(col("query_id").as("qid"), col("neighbor_id").as("nid"),
            col("rel").cast("long").as("rel"))
          .join(n.select(col("id").as("nid")), Seq("nid"), "left_semi")
          // Seq-key joins move the key FIRST; the greedy's positional
          // collect needs (qid, nid, rel) — re-pin the order
          .select(col("qid"), col("nid"), col("rel"))
      case None =>
        val q = prepared(queries, idCol, embCol)
          .select(col("id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
        q.join(n, col("qid") =!= col("id"))
          .select(col("qid"), col("id").as("nid"),
            round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")) * 10000, 0)
              .cast("long").as("rel"))
    }
    val cand = Dedup.cached(base
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("rel").desc, col("nid"))))
      .filter(col("rnk") <= shortlist).drop("rnk"))
    val withV = cand.join(
      n.select(col("id").as("nid"), col("v"), col("nrm")), Seq("nid"))
    val pairs = withV.as("x").join(withV.as("y"),
        col("x.qid") === col("y.qid") && col("x.nid") =!= col("y.nid"))
      .select(col("x.qid").as("qid"), col("x.nid").as("cid"),
        col("y.nid").as("oid"),
        round(dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm")) * 10000, 0)
          .cast("long").as("sim"))
    (cand, pairs)
  }
}
