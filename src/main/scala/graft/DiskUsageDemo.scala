package graft

import java.nio.file.Files

import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.DiskUsageHandler
import graft.streaming.DiskUsageStream

/** Runnable sample of the two serving modes of the disk-usage pipeline —
  * the scheduled-batch handler (reference-faithful) and the Structured
  * Streaming refresh. `sbt "runMain graft.DiskUsageDemo"`.
  */
object DiskUsageDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("disk-usage-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = Files.createTempDirectory("demo-inv").toString
    Seq(("alice/a.bin", 100L), ("bob/b.bin", 7L), ("noslash", 1L))
      .toDF("key", "size").write.parquet(s"$dir/drop")

    // --- scheduled-batch handler: blocking first refresh, point lookups
    val h = new DiskUsageHandler(
      () => spark.read.schema("key STRING, size BIGINT").parquet(s"$dir/drop"),
      refreshEvery = 1.minute)
    println(s"HANDLER alice=${h.getDiskUsage("alice")} missing=${h.getDiskUsage("nobody")}")
    h.close()

    // --- streaming refresh: complete-mode snapshot, accumulates new files
    val q = DiskUsageStream.start(spark, s"$dir/drop", "key STRING, size BIGINT",
      queryName = "du_live")
    q.processAllAvailable()
    println("STREAM SNAPSHOT1 = " +
      spark.table("du_live").orderBy("address").collect().mkString("; "))
    Seq(("alice/c.bin", 900L)).toDF("key", "size")
      .write.mode("append").parquet(s"$dir/drop")
    q.processAllAvailable()
    println("STREAM SNAPSHOT2 = " +
      spark.table("du_live").orderBy("address").collect().mkString("; "))
    q.stop()
    spark.stop()
  }
}
