package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMPORARY r19-optimization phase profiler — not part of the driver
  * contract; deleted before the round closes.
  */
object OptProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qs = args.toSeq
    qs.foreach { q =>
      try SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => println(s"[probe] warm $q FAILED: $e") }
      graft.operators.Dedup.uncacheAll()
    }
    (1 to 3).foreach { i =>
      qs.foreach { q =>
        t(s"$q iter$i") { SparkEntry.queries(q)(spark, dir).count() }
        graft.operators.Dedup.uncacheAll()
      }
    }
    if (sys.env.contains("SPARK_GRAFT_PROBE_CAL")) {
      import graft.operators.{Dedup, TextAnalysis}
      val docs = SparkEntry.t(spark, dir, "documents")
      (1 to 2).foreach { i =>
        val shingled = t(s"cal$i: shingle+hash persist count") {
          val df = TextAnalysis.shingles(docs, "doc_id", "text", 3)
            .withColumnRenamed("doc_id", "id")
            .withColumn("h", xxhash64(col("shingle")))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          df.count(); df
        }
        val permCols = (0 until 16).map { p =>
          min(conv(substring(md5(concat_ws(":", lit(s"mh$p"), col("shingle"))), 1, 15), 16, 10)
            .cast("long")).as(s"sig$p")
        }
        t(s"cal$i: combined props agg (noop)") {
          shingled.groupBy(col("id")).agg(count(lit(1)).as("n"), permCols: _*)
            .write.format("noop").mode("overwrite").save()
        }
        t(s"cal$i: inter self-join agg (noop)") {
          shingled.as("l")
            .join(shingled.as("r"),
              col("l.h") === col("r.h") && col("l.id") < col("r.id"))
            .groupBy(col("l.id").as("doc_a"), col("r.id").as("doc_b"))
            .agg(count(lit(1)).as("common"))
            .write.format("noop").mode("overwrite").save()
        }
        t(s"cal$i: full row count") {
          Dedup.minhashCalibration(docs).orderBy(col("j_e1")).count()
        }
        Dedup.uncacheAll()
      }
    }
    if (sys.env.contains("SPARK_GRAFT_PROBE_DEDUP")) {
      val docs = SparkEntry.t(spark, dir, "documents")
      val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_probe_idx"
      (1 to 2).foreach { i =>
        t(s"DedupIndex.build (base) $i") {
          graft.sources.DedupIndex.build(docs.filter(col("doc_id") >= 50), path)
        }
        val idx = graft.sources.DedupIndex.load(spark, path)
        t(s"DedupIndex.probe (delta) count $i") {
          graft.sources.DedupIndex.probe(idx, docs.filter(col("doc_id") < 50))
            .orderBy(col("doc_a"), col("doc_b")).count()
        }
        graft.operators.Dedup.uncacheAll()
      }
      import scala.sys.process._
      println("[probe] index files: " + (s"find $path -type f" #| "wc -l").!!.trim)
    }
    if (sys.env.contains("SPARK_GRAFT_PROBE_GRAPH")) {
      t("prEdges memo warm count") { SparkEntry.prEdges(spark, dir).count() }
      val ed = SparkEntry.prEdges(spark, dir)
      val deg = SparkEntry.prDeg(spark, dir)
      t("gate agg") {
        ed.agg(count(lit(1)),
          count(when(col("src").isNull || col("dst").isNull, 1))).collect()
      }
      t("collect 3 long cols (rdd mapPartitions)") {
        val parts = ed.select(col("src"), col("dst"), col("deg"))
          .rdd.mapPartitions { it =>
            val bs = Array.fill(3)(Array.newBuilder[Long])
            it.foreach { r =>
              var c = 0
              while (c < 3) { bs(c) += r.getLong(c); c += 1 }
            }
            Iterator.single(bs.map(_.result()))
          }.collect()
        parts.iterator.map(_(0).length).sum
      }
      val r1 = t("pageRankWith construct (gate+collect+loop+df)") {
        graft.operators.Graph.pageRankWith(ed, deg, 3)
      }
      t("pageRank result count") { r1.count() }
      t("pageRank orderBy limit100 count") {
        r1.orderBy(col("rank").desc, col("node")).limit(100).count()
      }
      val he = SparkEntry.incidenceEdges(spark, dir)
        .select(col("a").as("src"), col("b").as("dst"))
      val r2 = t("hitsWith construct") {
        graft.operators.Graph.hitsWith(he, 3)
      }
      t("hits result count") { r2.count() }
    }
    spark.stop()
  }
}
