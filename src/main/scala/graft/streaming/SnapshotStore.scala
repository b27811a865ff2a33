package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared durable-snapshot machinery for the bounded sketch stores
  * ([[CmsStream.SketchStore]], [[HeavyHittersStream.MgStore]]): one
  * `upto=<batchId>` parquet directory per applied batch, `_SUCCESS`-gated
  * completeness, pruned to the newest two (the newest serves restore,
  * the previous survives a torn newest write).
  *
  * Listing and deletion go through Hadoop's `FileSystem` resolved FROM
  * THE SNAPSHOT PATH — the same API the parquet writer uses — so the
  * snapshot dir may live on any Spark-writable scheme (`hdfs://`,
  * `s3a://`, `file:`, a bare local path). A `java.io.File` lister would
  * silently see nothing on a remote scheme and a restart would
  * cold-start while the checkpoint marks batches delivered — exactly
  * the loss the durability contract exists to prevent.
  */
private[streaming] object SnapshotStore {

  private def fs(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Complete snapshots under `dir`, ascending batch id. */
  def snapshotIds(spark: SparkSession, dir: String): Seq[(Long, Path)] = {
    val (f, p) = fs(spark, dir)
    if (!f.exists(p)) return Seq.empty
    f.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("upto="))
      .filter(st => f.exists(new Path(st.getPath, "_SUCCESS")))
      .map(st => st.getPath.getName.stripPrefix("upto=").toLong -> st.getPath)
      .sortBy(_._1)
  }

  /** Write a bounded counter table as the `batchId` snapshot (one file —
    * the tables are KBs by contract), then prune to the newest two.
    */
  def write(spark: SparkSession, dir: String, df: DataFrame,
      batchId: Long): Unit = {
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/upto=$batchId")
    val (f, _) = fs(spark, dir)
    snapshotIds(spark, dir).dropRight(2).foreach { case (_, p) =>
      f.delete(p, true)
    }
  }

  /** The newest complete snapshot as (batchId, rows), if any. */
  def newest(spark: SparkSession, dir: String): Option[(Long, DataFrame)] =
    snapshotIds(spark, dir).lastOption.map { case (id, p) =>
      id -> spark.read.parquet(p.toString)
    }
}
