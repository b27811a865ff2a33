package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // default to every available core (target environment is local[32])
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // declared up front (not leaked mid-run by q_sessionize): nanos
      // parquet columns read as long instead of failing the scan
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_VERIFY_FILTER=<name,name,...>: narrow the dumped set for
    // local iteration (never set by the driver — oracle_sql.json still
    // carries every query so tools/check.py can be pointed at a full dir)
    val queries = sys.env.get("SPARK_GRAFT_VERIFY_FILTER") match {
      case Some(f) =>
        val keep = f.split(',').map(_.trim).filter(_.nonEmpty).toSet
        SparkEntry.queries.filter { case (k, _) => keep(k) }
      case None => SparkEntry.queries
    }
    SparkEntry.clearMemoTouches()
    val completed = Set.newBuilder[String]
    queries.foreach { case (name, fn) =>
      // label the row for the runtime pricing tripwire: every
      // memoFrame/memoModel/bpeMerges call below logs against `name`
      try {
        SparkEntry.recordingMemoTouches(name) {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
        }
        completed += name
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally graft.operators.Dedup.uncacheAll() // drop superseded shingle indexes
    }
    // Runtime pricing tripwire (full pass only — a filtered run skips
    // serving rows by design): assert the recorded memo touches against
    // the manifest. This is the check the CoreSpec source scan cannot
    // do — a pricing row served through a renamed helper lands here.
    val pricingViolations =
      if (sys.env.contains("SPARK_GRAFT_VERIFY_FILTER")) Seq.empty
      else graft.registry.PricingManifest.runtimeViolations(
        completed.result(), SparkEntry.memoTouchSnapshot())
    pricingViolations.foreach(v =>
      System.err.println(s"[verify] pricing tripwire: $v"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // throw AFTER the dump + oracle_sql.json land, so the correctness
    // artifacts survive for diagnosis — but the run still fails loudly
    if (pricingViolations.nonEmpty)
      throw new IllegalStateException(
        s"pricing tripwire: ${pricingViolations.size} violation(s) — see [verify] lines")
  }
}
