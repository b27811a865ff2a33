package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Schema-enforced JSONL / CSV ingestion with a CORRUPT-RECORD LANE —
  * the crawl-dump entry point of a training-data pipeline. The reference
  * consumes parquet listings only (`types.go:9-20`); web-scale text
  * corpora overwhelmingly arrive as (gzipped) JSONL and CSV, where some
  * fraction of lines is always malformed. The ingestion contract here is
  * the [[graft.operators.Multimodal]] corrupt-payload stance applied to
  * rows: a broken line NEVER throws and is NEVER silently dropped — it
  * lands in an explicit `_corrupt` column, visible to the
  * [[corruptAudit]] row the pipeline ships with.
  *
  * Mechanics: PERMISSIVE mode with `columnNameOfCorruptRecord`; the
  * caller's schema is extended with the string `_corrupt` field (Spark
  * requires it declared). The parsed frame is CACHED before any audit —
  * Spark disallows queries whose referenced columns are ONLY the
  * internal corrupt-record column on the raw file relation (SPARK-21610:
  * the lazily-parsed raw line would otherwise be gone by the time the
  * filter runs), and materializing first is the documented pattern
  * (registered in the shared [[graft.operators.Dedup.cached]] pool so
  * the harness's uncacheAll releases it between queries).
  *
  * Scale: both readers are splittable line formats — partitioned by
  * byte ranges exactly like any text source, schema projection pushes
  * into the parser, and the corrupt lane is row-local. Gzip inputs are
  * per-FILE parallel (a .gz member is one stream — ship many files).
  */
object Ingest {

  private def withCorrupt(schema: StructType): StructType =
    schema.add("_corrupt", StringType, nullable = true)

  /** Read JSONL under `schema` with the corrupt lane; returns the
    * materialized frame (clean columns + `_corrupt`).
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val df = spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
    graft.operators.Dedup.cached(df)
  }

  /** Read headered CSV under `schema` with the corrupt lane. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val df = spark.read
      .schema(withCorrupt(schema))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)
    graft.operators.Dedup.cached(df)
  }

  /** The go/no-go ingestion row: total lines, clean lines, corrupt
    * lines, corrupt ppm (integer). A spike in corrupt_ppm between dumps
    * is the earliest schema-drift signal a pipeline gets.
    */
  def corruptAudit(df: DataFrame): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("_corrupt").isNull, 1L).otherwise(0L)).as("n_clean"),
      sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L)).as("n_corrupt"))
      .select(col("n_rows"), col("n_clean"), col("n_corrupt"),
        expr("CAST((n_corrupt * 1000000) DIV n_rows AS BIGINT)")
          .as("corrupt_ppm"))

  /** Only the rows that parsed clean, with the lane column dropped. */
  def clean(df: DataFrame): DataFrame =
    df.filter(col("_corrupt").isNull).drop("_corrupt")

  /** Streaming form of [[readJsonl]] — the drop-directory topology: new
    * JSONL files land in `path`, each micro-batch carries clean rows +
    * the corrupt lane, and downstream foreachBatch stores fold audits or
    * content exactly like the batch frame (the corrupt lane is row-local
    * so streamed union ≡ batch read — no state, no watermark needed).
    * `maxFilesPerTrigger` bounds batch size for backfill bursts.
    */
  def streamJsonl(spark: SparkSession, path: String, schema: StructType,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)
}
