package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Persisted text inverted index — the build-once / serve-many artifact
  * around [[TextAnalysis.bm25TopK]]'s scoring chain, the lexical mirror
  * of [[AnnIndex]].
  *
  * The artifact is three parquet tables under one directory:
  *   - `postings/` — (term, doc_id, dl, tf), PARTITIONED BY `bucket` =
  *     `xxhash64(term) mod nBuckets`;
  *   - `df/` — per-term document frequency, same bucket partitioning;
  *   - `stats/` — ONE row (n_docs, total_dl).
  *
  * Bucket partitioning is the point: a query's terms hash to a handful
  * of buckets, so serving reads prune to those partition directories at
  * the STORAGE layer (`PartitionFilters` on the postings scan —
  * spec-pinned) instead of scanning the full posting list. The bucket
  * set for a query is derived from the query terms alone (bounded by
  * nBuckets — the bounded global-decision pattern), never from data.
  *
  * Tokenization/aggregation happens ONCE at build; serving's per-query
  * work is the query-term explode, the pruned postings join, and the
  * decimal-fenced BM25 sum — result-identical to running
  * [[TextAnalysis.bm25TopK]] over the original corpus (spec-asserted),
  * because df over the full index restricted to query terms equals df
  * computed from a query-pruned corpus.
  */
object TextIndex {

  /** Tokenize, aggregate and write the artifact. Deterministic: same
    * corpus + params → same artifact content.
    */
  def build(docs: DataFrame, dir: String, nBuckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    val toks = docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("w"))
      .select(col(idCol), size(col("w")).cast("long").as("dl"),
        explode(col("w")).as("term"))
    val postings = toks
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
    postings.write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$dir/postings")
    postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$dir/df")
    docs.select(size(TextAnalysis.tokens(col(textCol))).cast("long").as("d"))
      .agg(count(lit(1)).as("n_docs"), sum(col("d")).as("total_dl"))
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** The loaded artifact. `nBuckets` must match the build (it is a
    * property of the hash layout, carried by the caller like AnnIndex's
    * quantizer params).
    */
  final case class Loaded(postings: DataFrame, df: DataFrame,
      stats: DataFrame, nBuckets: Int)

  def load(spark: SparkSession, dir: String, nBuckets: Int = 64): Loaded =
    Loaded(
      spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/df"),
      spark.read.parquet(s"$dir/stats"),
      nBuckets)

  /** BM25 top-k serving against the loaded index — the identical fenced
    * scoring chain as [[TextAnalysis.bm25TopK]] (same rounding, same
    * decimal sum, same [[graft.plans.TopK]] serve), with the corpus-side
    * tokenize/aggregate replaced by the pruned postings read.
    */
  def bm25TopK(index: Loaded, queries: DataFrame, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75, idCol: String = "doc_id",
      qidCol: String = "query_id", qtextCol: String = "q_text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val qterms = queries.select(col(qidCol),
      explode(array_distinct(TextAnalysis.tokens(col(qtextCol)))).as("term"))
    val qset = qterms.select(col("term")).distinct()
    // the probed bucket ids are a pure function of the query terms —
    // literal partition filters, bounded by nBuckets
    val buckets = qset
      .select(pmod(xxhash64(col("term")), lit(index.nBuckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0))
    val p = index.postings
      .filter(col("bucket").isin(buckets.map(Long.box): _*))
      .join(broadcast(qset), Seq("term"))
    val dfq = index.df
      .filter(col("bucket").isin(buckets.map(Long.box): _*))
      .join(broadcast(qset), Seq("term"))
      .select(col("term"), col("df"))
    val contrib = p
      .join(broadcast(dfq), Seq("term"))
      .crossJoin(broadcast(index.stats))
      .join(broadcast(qterms), Seq("term"))
      .select(col(qidCol), col(idCol),
        round(
          round(log(lit(1.0) +
            (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)), 6) *
          (col("tf").cast("double") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
            lit(b) * col("dl") / (col("total_dl").cast("double") / col("n_docs")))),
          6).as("c"))
    import org.apache.spark.sql.types.DecimalType
    val scored = contrib
      .groupBy(col(qidCol), col(idCol))
      .agg(round(sum(col("c").cast(DecimalType(28, 12))).cast("double"), 6).as("score"))
    graft.plans.TopK.perKey(scored, keyCols = Seq(qidCol),
      orderCols = Seq("score" -> false, idCol -> true), k = k)
  }
}
