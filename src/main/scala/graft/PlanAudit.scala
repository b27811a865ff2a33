package graft

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of selected registry queries —
  * the review loop for shuffle count, broadcast choice, pushdown, and
  * whole-stage-codegen coverage. `sbt "runMain graft.PlanAudit [names…]"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("plan-audit")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("du_by_address", "q1_pricing_summary", "q3_join_revenue",
        "dedup_minhash_lsh", "ann_cosine_topk", "dedup_embedding_cosine")
    names.foreach { name =>
      println(s"\n================= $name =================")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
