package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual registry queries cold, in the given order.
  * `sbt "runMain graft.TimeQueries [sfDir] name1 name2 …"` — complements
  * Bench (which runs the whole registry) when isolating one query's cost.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val (dir, names) =
      if (args.nonEmpty && args.head.startsWith("/")) (args.head, args.tail.toSeq)
      else ("/root/testdata/sf0.1", args.toSeq)
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[timeq] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.1f s")
      operators.Dedup.uncacheAll()
    }
    spark.stop()
  }
}
