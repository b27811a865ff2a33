package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each built from
  * codegen'd built-ins only (no UDFs):
  *
  *  - [[exact]]: hash-group-by exact dedup.
  *  - [[ngramJaccardPairs]]: exact n-gram Jaccard all-pairs — the 100%-recall
  *    form, used as the correctness oracle for the approximate paths.
  *  - [[minhashLshPairs]]: MinHash + banded LSH candidate generation, then
  *    exact verification of candidates only. This is the 100 TB scale path:
  *    cost is O(docs × shingles) for signatures plus the bucket join, never
  *    all-pairs.
  *  - [[simhashPairs]]: 32-bit md5-derived SimHash fingerprints; candidates
  *    from the pair-of-blocks pigeonhole join (guaranteed recall to Hamming
  *    ≤ 6 — see the method doc), Hamming-filtered, then exact-verified.
  *
  * Approximate paths verify candidates with true Jaccard before emitting, so
  * their output equals the exact operator's whenever recall is complete —
  * which the band/row parameters are chosen to guarantee for near-duplicates
  * (e.g. 16 bands × 2 rows ⇒ P[miss | J=0.8] ≈ 8·10⁻⁸).
  *
  * Caching: each pair operator persists its shingle index (several readers
  * per query). The cache is session-tracked, so batch jobs are unaffected;
  * a LONG-LIVED session recomputing dedup repeatedly should call
  * [[uncacheAll]] between rounds to release old indexes.
  */
object Dedup {

  /** Exact dedup: group identical texts, keep the smallest id as canonical. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** (id, shingle, h) distinct word-n-grams — see [[TextAnalysis.shingles]]
    * — with `h = xxhash64(shingle)`. All self-joins key on the fixed-width
    * 64-bit hash (cheaper shuffle + comparison than variable-length
    * strings; collision odds over a shingle vocabulary V are ~V²/2⁶⁵ —
    * ~10⁻¹¹ at 27k, still <10⁻⁷ at billion-shingle corpus scale); the
    * string stays available for the md5-based SimHash bits. Persisted
    * (memory-and-disk, so it spills rather than OOMs at scale): every pair
    * operator reads the index several times (sizes, intersection sides,
    * signatures) and recomputing the explode per use dominated the runtime.
    */
  private val persisted =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  private def sh(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val df = TextAnalysis.shingles(docs, idCol, textCol, n).withColumnRenamed(idCol, "id")
      .withColumn("h", xxhash64(col("shingle")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    persisted.add(df)
    df
  }

  /** (doc_a, doc_b, jaccard ≥ tau) from an intersection-count DataFrame
    * (doc_a, doc_b, common) plus per-doc shingle counts.
    */
  private def jaccardFromIntersections(
      inter: DataFrame, sizes: DataFrame, tau: Double): DataFrame =
    inter
      .join(sizes.as("na"), col("doc_a") === col("na.id"))
      .join(sizes.as("nb"), col("doc_b") === col("nb.id"))
      .select(
        col("doc_a"),
        col("doc_b"),
        (col("common").cast("double") /
          (col("na.n") + col("nb.n") - col("common"))).as("jaccard"))
      .filter(col("jaccard") >= tau)

  /** Jaccard for given candidate pairs (cand: doc_a < doc_b), computing
    * shingle intersections only for candidates — candidate-driven, so the
    * expensive part stays proportional to the candidate count, not all-pairs.
    */
  private def verifyJaccard(
      shingled: DataFrame,
      cand: DataFrame,
      tau: Double): DataFrame = {
    val sizes = shingled.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = shingled.as("x")
      .join(cand, col("x.id") === col("doc_a"))
      .join(shingled.as("y"),
        col("y.id") === col("doc_b") && col("x.h") === col("y.h"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("common"))
    jaccardFromIntersections(inter, sizes, tau)
  }

  /** Exact n-gram Jaccard near-dup pairs: every pair (a<b) with J ≥ tau.
    * Single pass over the inverted shingle index: the self-join on shingle
    * directly yields intersection counts (no separate candidate + re-verify
    * scan). At scale, cap the fan-out of ultra-common shingles
    * (document-frequency pruning) or switch to [[minhashLshPairs]] — the LSH
    * path exists exactly because this join is quadratic in per-shingle
    * document frequency.
    */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, tau: Double = 0.6): DataFrame = {
    val shingled = sh(docs, idCol, textCol, n)
    val sizes = shingled.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = shingled.as("l")
      .join(shingled.as("r"), col("l.h") === col("r.h") && col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("doc_a"), col("r.id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    jaccardFromIntersections(inter, sizes, tau)
  }

  /** MinHash signatures (numHashes = bands × rows) via the
    * [[graft.functions.MinHashSketch]] `TypedImperativeAggregate` — one
    * sketch buffer per group instead of numHashes independent min()
    * aggregates — then banded LSH bucket join for candidates, exact
    * verification. (Minhash internals never cross the oracle boundary: the
    * emitted pairs are exact-Jaccard-verified.)
    */
  def minhashLshPairs(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, tau: Double = 0.6, bands: Int = 16, rows: Int = 2): DataFrame = {
    val numHashes = bands * rows
    val shingled = sh(docs, idCol, textCol, n)
    val sig = shingled
      .groupBy(col("id"))
      .agg(graft.functions.MinHashSketch(col("h"), numHashes).as("sig"))
    val bandCols = (0 until bands).map(b => hash(slice(col("sig"), b * rows + 1, rows)))
    val banded = sig.select(col("id"), posexplode(array(bandCols: _*)).as(Seq("band", "sig")))
    val cand = banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("doc_a"), col("r.id").as("doc_b"))
      .distinct()
    verifyJaccard(shingled, cand, tau)
  }

  /** 32-bit SimHash per doc: bit k is the sign of Σ_shingles (±1 by whether
    * hex digit k of md5(shingle) is ≥ '8'). md5 (not xxhash64) so the
    * fingerprint is bit-identical in any engine — the DuckDB oracle
    * recomputes the same SimHash, making the emitted set exact by definition
    * (pairs with Hamming ≤ maxHamming AND Jaccard ≥ tau) instead of
    * recall-dependent. Candidates come from a pair-of-blocks pigeonhole
    * join: the 32-bit fingerprint splits into 8 nibbles, and each doc emits
    * the C(8,2)=28 (block-pair-id, 8-bit value) keys. A pair within
    * Hamming ≤ 6 touches at most 6 blocks, leaving ≥2 intact, so it shares
    * at least one exact pair-key — guaranteed recall with ~256-way key
    * selectivity instead of the 16-way single-nibble join (which measured
    * ~6.4M candidates on the 5k-doc fixture; pair-keys cut that ~10×).
    * Candidates are then Hamming-filtered and exact-Jaccard-verified.
    */
  def simhashPairs(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, tau: Double = 0.6, maxHamming: Int = 6): DataFrame = {
    require(maxHamming <= 6, "pair-of-blocks pigeonhole guarantees recall only to Hamming 6")
    val shingled = sh(docs, idCol, textCol, n)
    val hashed = shingled.select(col("id"), md5(col("shingle")).as("h"))
    val bitCols = (0 until 32).map { k =>
      sum(when(substring(col("h"), k + 1, 1) >= "8", 1).otherwise(-1)).as(s"b$k")
    }
    val sig = hashed.groupBy(col("id")).agg(bitCols.head, bitCols.tail: _*)
      .select(
        col("id"),
        (0 until 32)
          .map(k => when(col(s"b$k") > 0, shiftleft(lit(1L), k)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
    val pairKeys = for {
      j1 <- 0 until 8
      j2 <- (j1 + 1) until 8
    } yield shiftrightunsigned(col("simhash"), j1 * 4).bitwiseAND(lit(15L)) * 16 +
      shiftrightunsigned(col("simhash"), j2 * 4).bitwiseAND(lit(15L))
    val blocks = sig.select(
      col("id"), col("simhash"),
      posexplode(array(pairKeys: _*)).as(Seq("blk", "blk_val")))
    val cand = blocks.as("l")
      .join(blocks.as("r"),
        col("l.blk") === col("r.blk") && col("l.blk_val") === col("r.blk_val") &&
          col("l.id") < col("r.id"))
      .select(
        col("l.id").as("doc_a"), col("r.id").as("doc_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    verifyJaccard(shingled, cand.select(col("doc_a"), col("doc_b")), tau)
      .join(cand, Seq("doc_a", "doc_b"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"), col("hamming"))
  }

  /** Release exactly the shingle indexes this object has persisted — call
    * between dedup rounds in long-lived services so superseded indexes
    * don't accumulate in the block manager. Touches nothing else the
    * session may have cached.
    */
  def uncacheAll(): Unit = {
    var df = persisted.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = persisted.poll()
    }
  }

  /** Survivor set from a pair list: a document is dropped iff it appears as
    * the larger id of any near-dup pair (greedy min-id-wins policy — the
    * standard one-pass approximation of connected components, exact when dup
    * clusters are cliques, which J ≥ tau near-dup clusters essentially are).
    */
  def survivors(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.join(pairs.select(col("doc_b").as(idCol)).distinct(), Seq(idCol), "left_anti")
}
