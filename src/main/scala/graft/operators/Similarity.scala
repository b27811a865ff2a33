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

  /** The same [[trainCentroids]] loop as SQL CTE text, for oracle mirroring
    * (unrolled like [[TextAnalysis.bpeVocabSql]]). Expects the caller's WITH
    * chain to already define `f` (vec_id, i, v: the flattened doubles) and
    * `nrm` (vec_id, nrm); emits `a0` (md5-bucket init) and per round r the
    * per-dimension decimal-exact means `c{r}` (cell, i, m), centroid norms
    * `cn{r}`, and (before the last round) the rounded-cosine re-assignment
    * `a{r}`. The final centroid tables are `c{iters}`/`cn{iters}`.
    */
  def kmeansOracleCtes(k: Int, iters: Int): String = {
    require(k >= 1 && iters >= 1)
    val sb = new StringBuilder
    sb ++= s""", a0 AS (
              |  SELECT vec_id,
              |         CAST(('0x'||substring(md5(CAST(vec_id AS VARCHAR)),1,15)) AS BIGINT) % $k AS cell
              |  FROM embeddings)""".stripMargin
    (1 to iters).foreach { r =>
      sb ++= s""",
                |c$r AS (
                |  SELECT a${r - 1}.cell, f.i,
                |         CAST(SUM(CAST(f.v AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*) AS m
                |  FROM f JOIN a${r - 1} USING (vec_id) GROUP BY 1,2),
                |cn$r AS (SELECT cell, sqrt(SUM(m*m)) AS cnrm FROM c$r GROUP BY 1)""".stripMargin
      if (r < iters) {
        sb ++= s""",
                  |d$r AS (
                  |  SELECT f.vec_id, c$r.cell, SUM(f.v*c$r.m) AS dot
                  |  FROM f JOIN c$r ON f.i=c$r.i GROUP BY 1,2),
                  |a$r AS (
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

  /** All pairs (a<b) with rounded cosine ≥ tau. Brute-force form; at scale,
    * use [[nearDupPairsBanded]]/[[nearDupPairsBucketed]] or
    * [[Dedup.minhashLshPairs]]-style banding over sign bits.
    */
  def nearDupPairs(
      emb: DataFrame, tau: Double,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val p = prepared(emb, idCol, embCol)
    val a = p.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = p.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(
        col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4).as("cosine"))
      .filter(col("cosine") >= tau)
  }
}
