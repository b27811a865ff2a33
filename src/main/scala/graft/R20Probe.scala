package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMPORARY r20-optimization phase profiler — never committed; deleted
  * before the round closes (the OptProbe lesson: its replacement must not
  * outlive the round either).
  */
object R20Probe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name%-52s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
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
    if (sys.env.contains("SPARK_GRAFT_PROBE_PQ")) {
      import graft.operators.Similarity
      val q = SparkEntry.t(spark, dir, "embeddings").filter(col("vec_id") < 10)
      val model = SparkEntry.pqModel2(spark, dir, 1.0)
      (1 to 2).foreach { i =>
        val qtab = t(s"pq$i: pqQueryTables construct") {
          Similarity.pqQueryTables(q, model, nprobe = 2)
        }
        t(s"pq$i: qtab count") { qtab.count() }
        val served = t(s"pq$i: pqServe construct") {
          Similarity.pqServe(SparkEntry.pqCodes(spark, dir, 1.0), qtab,
            SparkEntry.preparedEmb(spark, dir), q, k = 3, rerank = 50, model)
        }
        t(s"pq$i: serve count") { served.count() }
        t(s"pq$i: serve orderBy count") {
          served.orderBy(col("query_id"), col("rnk")).count()
        }
        graft.operators.Dedup.uncacheAll()
      }
    }
    if (sys.env.contains("SPARK_GRAFT_PROBE_ANN")) {
      val emb = SparkEntry.t(spark, dir, "embeddings")
      println(s"[probe] emb scan partitions = ${emb.rdd.getNumPartitions}")
      println(s"[probe] emb filtered partitions = ${emb.filter(col("vec_id") < 400).rdd.getNumPartitions}")
      val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_probe_ann"
      (1 to 2).foreach { i =>
        t(s"ann$i: build") {
          graft.sources.AnnIndex.build(emb.filter(col("vec_id") < 400), k = 4, iters = 2, path)
        }
        t(s"ann$i: append") {
          graft.sources.AnnIndex.append(spark, path, emb.filter(col("vec_id") >= 400))
        }
        val idx = t(s"ann$i: load") { graft.sources.AnnIndex.load(spark, path) }
        t(s"ann$i: topK count") {
          graft.sources.AnnIndex.topK(idx, emb.filter(col("vec_id") < 10), k = 3, nprobe = 2).count()
        }
        import scala.sys.process._
        println("[probe] corpus files: " + (s"find $path/corpus -type f" #| "wc -l").!!.trim)
        graft.operators.Dedup.uncacheAll()
      }
    }
    if (sys.env.contains("SPARK_GRAFT_PROBE_PQ2")) {
      import graft.operators.Similarity
      import org.apache.spark.sql.expressions.Window
      val q = SparkEntry.t(spark, dir, "embeddings").filter(col("vec_id") < 10)
      val model = SparkEntry.pqModel2(spark, dir, 1.0)
      val m = model.m
      (1 to 2).foreach { i =>
        val qtab = Similarity.pqQueryTables(q, model, nprobe = 2)
        val adc = (0 until m).map(s =>
          element_at(col(s"tab_$s"), col(s"code_$s") + 1)).reduceLeft(_ + _)
        val encoded = SparkEntry.pqCodes(spark, dir, 1.0)
        val joined = encoded.join(broadcast(qtab), Seq("cell"))
          .filter(col("query_id") =!= col("id"))
          .select(col("query_id"), col("id").as("neighbor_id"),
            (round(adc, 6) + lit(0.0)).as("adc_dist"))
        t(s"pq2-$i: codes x qtab join+adc (no window)") { joined.count() }
        val shortlist = joined
          .withColumn("rn_adc",
            row_number().over(Window.partitionBy(col("query_id"))
              .orderBy(col("adc_dist"), col("neighbor_id"))))
          .filter(col("rn_adc") <= 50)
          .select(col("query_id"), col("neighbor_id"))
        t(s"pq2-$i: shortlist (join+adc+window)") { shortlist.count() }
        val qp = Similarity.prepared(q, "vec_id", "embedding")
        val refined = SparkEntry.preparedEmb(spark, dir)
          .select(col("id").as("neighbor_id"), col("v").as("nv"))
          .join(broadcast(shortlist), Seq("neighbor_id"))
          .join(broadcast(qp.select(col("id").as("query_id"), col("v").as("qv"))),
            Seq("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            (round(
              aggregate(zip_with(col("qv"), col("nv"), (x, y) => (x - y) * (x - y)),
                lit(0.0), (acc, t) => acc + t), 6) + lit(0.0)).as("l2_dist"))
          .withColumn("rnk",
            row_number().over(Window.partitionBy(col("query_id"))
              .orderBy(col("l2_dist"), col("neighbor_id"))).cast("long"))
          .filter(col("rnk") <= 3)
        t(s"pq2-$i: full refine count") { refined.count() }
        graft.operators.Dedup.uncacheAll()
      }
    }
    if (sys.env.contains("SPARK_GRAFT_PROBE_MAD")) {
      import graft.operators.Hygiene
      val ev = SparkEntry.t(spark, dir, "events")
      (1 to 2).foreach { i =>
        val vAll = t(s"mad$i: cache (k,v) count") {
          val f = graft.operators.Dedup.cached(ev.select(col("event_type").as("k"),
            round(col("value") * lit(1000000L), 0).cast("long").as("v")))
          f.count(); f
        }
        val v = vAll.filter(col("v").isNotNull)
        val ranks = t(s"mad$i: middleRanks collect-free count") {
          val r = v.groupBy(col("k"))
            .agg(count(lit(1)).as("nn"), min(col("v")).as("lo"), max(col("v")).as("hi"))
            .select(col("k"), col("lo"), col("hi"),
              explode(array(
                struct(lit(1L).as("rid"), expr("(nn - 1) DIV 2").as("target")),
                struct(lit(2L).as("rid"), expr("nn DIV 2").as("target")))).as("r"))
            .select(col("k"), col("r.rid").as("rid"), col("r.target").as("target"),
              col("lo"), col("hi"))
          r.count(); r
        }
        t(s"mad$i: groupedSelectRanks med") {
          Hygiene.groupedSelectRanks(v, ranks).count()
        }
        // internals replicated for phase attribution
        locally {
          import org.apache.spark.sql.expressions.Window
          val binsPerPass = 4096; val exactThreshold = 262144L
          val widthE = expr(s"(hi - lo) DIV $binsPerPass + 1")
          var ranges = t(s"mad$i-in: initial checkpoint") {
            val r = ranks.select(col("k"), col("rid"), col("target"),
              col("lo"), col("hi"), lit(0L).as("below")).localCheckpoint()
            r.count(); r
          }
          val isActive = col("hi") - col("lo") >= exactThreshold
          var pass = 0
          while (t(s"mad$i-in: loop cond count p$pass") {
            ranges.filter(isActive).limit(1).count() > 0 }) {
            val active = ranges.filter(isActive)
            val hist = v.join(active, Seq("k"))
              .filter(col("v") >= col("lo") && col("v") <= col("hi"))
              .withColumn("w", widthE)
              .groupBy(col("k"), col("rid"), col("target"), col("lo"), col("hi"),
                col("below"), col("w"), expr("(v - lo) DIV w").as("bin"))
              .agg(count(lit(1)).as("c"))
            val cumW = Window.partitionBy(col("k"), col("rid")).orderBy(col("bin"))
              .rowsBetween(Window.unboundedPreceding, -1)
            val narrowed = hist
              .withColumn("cum", coalesce(sum(col("c")).over(cumW), lit(0L)) + col("below"))
              .filter(col("cum") <= col("target") &&
                col("target") < col("cum") + col("c"))
              .select(col("k"), col("rid"), col("target"),
                (col("lo") + col("bin") * col("w")).as("lo"),
                least(col("hi"), col("lo") + (col("bin") + 1) * col("w") - 1).as("hi"),
                col("cum").as("below"))
            ranges = t(s"mad$i-in: hist pass p$pass checkpoint") {
              val r = ranges.filter(!isActive).unionByName(narrowed).localCheckpoint()
              r.count(); r
            }
            pass += 1
          }
          t(s"mad$i-in: final exact selection count") {
            val fin = v.join(ranges, Seq("k"))
              .filter(col("v") >= col("lo") && col("v") <= col("hi"))
              .groupBy(col("k"), col("rid"), col("target"), col("below"), col("v"))
              .agg(count(lit(1)).as("c"))
            val valW = Window.partitionBy(col("k"), col("rid")).orderBy(col("v"))
              .rowsBetween(Window.unboundedPreceding, -1)
            fin.withColumn("cum",
                coalesce(sum(col("c")).over(valW), lit(0L)) + col("below"))
              .filter(col("cum") <= col("target") && col("target") < col("cum") + col("c"))
              .select(col("k"), col("rid"), col("v").as("sel")).count()
          }
        }
        t(s"mad$i: full row count") {
          Hygiene.madOutliersScalable(ev, "event_type", "value")
            .orderBy(col("event_type")).count()
        }
        graft.operators.Dedup.uncacheAll()
      }
    }
    spark.stop()
  }
}
