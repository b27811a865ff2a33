package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the train/val/test assignment step of
  * a training-data pipeline. Assignment hashes the stable record id with
  * md5 and thresholds the first two hex digits (256 buckets), so:
  *  - the split is a pure function of the id (stable across runs, engines,
  *    partitionings, and data order — no RNG, no state);
  *  - membership is decided row-locally (narrow plan, no shuffle);
  *  - fractions are honored to 1/256 granularity, which is the right
  *    trade-off for corpus-scale splits (use four digits for 1/65536).
  */
object Splits {

  /** Cumulative thresholds as 2-char strings comparable against a 2-hex
    * md5 prefix. A cumulative fraction reaching 1.0 maps to 256, whose
    * natural "%02x" would be the 3-char "100" — lexicographically SMALLER
    * than "ff", silently inverting the comparison — so it is clamped to
    * "zz", which every 2-hex string is below.
    */
  private def thresholds(splits: Seq[(String, Double)]): Seq[String] =
    splits.init.scanLeft(0.0)(_ + _._2).tail.map { c =>
      val bucket = (c * 256).toInt
      if (bucket >= 256) "zz" else f"$bucket%02x"
    }

  /** (name, fraction) pairs → a CASE column over the id. Fractions must sum
    * to 1; the last split absorbs rounding.
    */
  def splitColumn(idCol: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val hex = substring(md5(idCol.cast("string")), 1, 2)
    splits.init.zip(thresholds(splits)).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), t)) =>
        when(hex < t, lit(name)).otherwise(acc)
      }
  }

  /** The same thresholds as SQL text, for oracle mirroring. */
  def splitCaseSql(idExpr: String, splits: Seq[(String, Double)]): String = {
    val whens = splits.init.zip(thresholds(splits))
      .map { case ((name, _), t) =>
        s"WHEN substring(md5(CAST($idExpr AS VARCHAR)),1,2) < '$t' THEN '$name'"
      }
      .mkString(" ")
    s"CASE $whens ELSE '${splits.last._1}' END"
  }

  /** df + a `split` column. */
  def assign(df: DataFrame, idCol: String, splits: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", splitColumn(col(idCol), splits))
}
