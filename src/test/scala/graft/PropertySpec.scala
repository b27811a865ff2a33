package graft

import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DiskUsageOp
import graft.sources.Manifest

/** Property tests (SURVEY.md §5.2): F1 path-segment extraction over
  * adversarial keys, A1 aggregation vs a naive fold, and the Go-layout date
  * formatter. Spark properties run one job over a generated batch rather
  * than one job per ScalaCheck case; generators are plain ScalaCheck `Gen`.
  */
class PropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("property-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val segmentGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.const(""),
    Gen.const("ünïcødé-名前"),
    Gen.const("a b c"),
    Gen.const("."))
  private val keyGen: Gen[String] = for {
    nSegs <- Gen.choose(1, 5)
    segs <- Gen.listOfN(nSegs, segmentGen)
  } yield segs.mkString("/")

  test("F1: first-segment extraction matches the reference model on adversarial keys") {
    import spark.implicits._
    val keys = Gen.listOfN(400, keyGen).sample.get.distinct
    val got = keys.toDF("key")
      .select(col("key"), substring_index(col("key"), "/", 1).as("seg"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    keys.foreach { k =>
      val expected = k.split("/", 2)(0) // handler.go:234,239: Split + [0]
      assert(got(k) == expected, s"key=$k")
    }
  }

  test("A1: aggregate equals a naive in-memory fold on generated data") {
    import spark.implicits._
    val rowGen = for {
      user <- Gen.choose(0, 20)
      hasSlash <- Gen.frequency(9 -> true, 1 -> false)
      leaf <- Gen.alphaNumStr.map(_.take(6))
      size <- Gen.choose(0L, 1000000L)
    } yield (if (hasSlash) s"u$user/$leaf" else s"u$user", size)
    val rows = Gen.listOfN(2000, rowGen).sample.get
    val expected = rows
      .filter(_._1.contains("/"))
      .groupBy(_._1.split("/", 2)(0))
      .map { case (addr, rs) => (addr, rs.map(_._2).sum, rs.size.toLong) }
      .toSet
    val got = DiskUsageOp.aggregate(rows.toDF("key", "size"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // salted variant: identical result on the same data
    val salted = DiskUsageOp.aggregateSalted(rows.toDF("key", "size"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == expected)
  }

  test("operator edge cases: short docs, single-event sessions, empty frames") {
    import spark.implicits._
    import graft.operators.{Dedup, Multimodal, Temporal, TextAnalysis}
    // docs shorter than n words contribute no shingles and no pairs
    val tiny = Seq((1L, "one two"), (2L, "one two"), (3L, "a b c d e")).toDF("doc_id", "text")
    assert(TextAnalysis.shingles(tiny, "doc_id", "text", 3).count() == 3) // only doc 3
    assert(Dedup.ngramJaccardPairs(tiny, tau = 0.1).count() == 0)
    // single-event users produce single-event sessions
    val ev = Seq((1L, 1000L, 7L), (2L, 2000L, 8L), (3L, 999999999L, 8L))
      .toDF("event_id", "ts_us", "user_id")
    val sess = Temporal.sessionize(ev, "user_id", "ts_us", "event_id", gapMicros = 1000000)
      .orderBy("user_id", "session_idx").collect()
    assert(sess.length == 3 && sess.forall(_.getAs[Long]("n_events") == 1))
    // empty payload: one empty frame, zero-length resize
    val empty = Seq((1L, "")).toDF("doc_id", "text")
    val frames = Multimodal.frameSample(empty).collect()
    assert(frames.length == 1 && frames(0).getAs[Long]("frame_bytes") == 0)
    assert(Multimodal.resize(Multimodal.withBinaryPayload(empty), 4)
      .collect()(0).getAs[Long]("byte_len") == 0)
  }

  test("TopKPerKey equals the window form on random keyed data") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val data = Gen.listOfN(3000,
        for { k <- Gen.choose(0, 40); v <- Gen.choose(-1000, 1000) } yield (k, v))
      .sample.get.zipWithIndex
      .map { case ((k, v), id) => (k.toLong, v.toLong, id.toLong) }
    val df = data.toDF("k", "v", "id")
    for (kk <- Seq(1, 3, 7)) {
      val custom = graft.plans.TopK.perKey(df, Seq("k"), Seq("v" -> false, "id" -> true), kk)
        .collect().map(_.toSeq).toSet
      val window = df.withColumn("rn", row_number().over(
          Window.partitionBy(col("k")).orderBy(col("v").desc, col("id"))))
        .filter(col("rn") <= kk).drop("rn")
        .collect().map(_.toSeq).toSet
      assert(custom == window, s"k=$kk: ${custom.size} vs ${window.size} rows")
    }
  }

  test("array_dot matches the built-in fold on nulls and length mismatch") {
    import graft.operators.Similarity
    val rows = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1.0d, 2.0d),       array(3.0d, 4.0d)),
        |  (array(1.0d, CAST(NULL AS DOUBLE)), array(2.0d, 3.0d)),
        |  (array(1.0d, 2.0d, 5.0d), array(3.0d, 4.0d)),
        |  (CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS t(a, b)""".stripMargin)
    val got = rows.select(
        Similarity.dot(org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b")).as("fused"),
        Similarity.dotBuiltin(org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b")).as("builtin"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null disagreement: fused=${r.get(0)} builtin=${r.get(1)}")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    assert(got(0).getDouble(0) == 11.0 && got(1).isNullAt(0) &&
      got(2).isNullAt(0) && got(3).isNullAt(0))
  }

  test("split thresholds survive degenerate fractions (1.0 cumulative)") {
    import spark.implicits._
    import graft.operators.Splits
    val df = (0L until 500L).toDF("id")
    val all = Splits.assign(df, "id", Seq("train" -> 1.0, "test" -> 0.0))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all == Map("train" -> 500L), s"got $all")
    val fracs = Splits.assign(df, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fracs.values.sum == 500L && fracs("train") > 350 && fracs("train") < 450, s"got $fracs")
  }

  test("temperature mix: alpha=1 identity, tail up-weighting monotone, max rate 1, guard") {
    import spark.implicits._
    import graft.operators.Splits
    // skewed 4-stratum corpus: 600/250/100/50
    val docs = ((1 to 600).map(i => (i.toLong, "en")) ++
      (601 to 850).map(i => (i.toLong, "de")) ++
      (851 to 950).map(i => (i.toLong, "fr")) ++
      (951 to 1000).map(i => (i.toLong, "es"))).toDF("doc_id", "lang")
    // alpha = 1: q must equal p (both rounded 6) and every rate is 1 —
    // the natural mix needs no resampling
    val id = Splits.temperatureMix(docs, "lang", alpha = 1.0).collect()
    id.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) <= 2e-6,
        s"alpha=1: q != p for ${r.getString(0)}")
      assert(r.getDouble(4) == 1.0, s"alpha=1: rate != 1 for ${r.getString(0)}")
    }
    // alpha < 1: shares still sum to ~1; boost (q/p) strictly rises as the
    // stratum shrinks (tail languages up-weighted); the SMALLEST stratum
    // anchors rate = 1 and rates fall monotonically with stratum size
    val sm = Splits.temperatureMix(docs, "lang", alpha = 0.3)
      .orderBy(col("n_docs").desc).collect()
    assert(math.abs(sm.map(_.getDouble(3)).sum - 1.0) < 1e-4, "q must sum to ~1")
    val boosts = sm.map(r => r.getDouble(3) / r.getDouble(2)) // q/p, size-desc
    assert(boosts.zip(boosts.tail).forall { case (b, s) => b < s },
      s"boost must rise as strata shrink: ${boosts.toSeq}")
    val rates = sm.map(_.getDouble(4))
    assert(rates.last == 1.0 && rates.zip(rates.tail).forall { case (a, b) => a < b },
      s"rates must rise to 1 at the smallest stratum: ${rates.toSeq}")
    // expected head-language rate in closed form: (q_en/p_en)/(q_es/p_es)
    // with q from 6-rounded powers — replay the operator's own chain
    val n = Map("en" -> 600.0, "de" -> 250.0, "fr" -> 100.0, "es" -> 50.0)
    val pw = n.map { case (k, v) => k -> BigDecimal(math.pow(v / 1000.0, 0.3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }
    val z = pw.values.sum
    def q(k: String) = BigDecimal(pw(k) / z)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val boost = n.keys.map(k => k -> q(k) / (n(k) / 1000.0)).toMap
    val expectEn = BigDecimal(boost("en") / boost("es"))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(sm.head.getDouble(4) - expectEn) <= 1e-6,
      s"en rate ${sm.head.getDouble(4)} != closed-form $expectEn")
    intercept[IllegalArgumentException](Splits.temperatureMix(docs, "lang", 0.0))
    intercept[IllegalArgumentException](Splits.temperatureMix(docs, "lang", 1.5))
  }

  test("stratified sample: degenerate fractions, stability, and stratum isolation") {
    import spark.implicits._
    import graft.operators.Splits
    import org.apache.spark.sql.functions.{col, lit, when}
    val df = (0L until 600L).toDF("id")
      .withColumn("g", when(col("id") % 3 === 0, lit("a"))
        .when(col("id") % 3 === 1, lit("b")).otherwise(lit("c")))
    // fraction 1.0 keeps everything; 0.0 removes the stratum entirely
    assert(Splits.stratifiedSample(df, "id", "g", Map.empty).count() == 600L)
    val cut = Splits.stratifiedSample(df, "id", "g", Map("a" -> 0.0, "b" -> 0.5))
    val byG = cut.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byG.contains("a"), s"stratum a must be empty: $byG")
    assert(byG("c") == 200L, s"untouched stratum must be whole: $byG")
    assert(byG("b") > 60 && byG("b") < 140, s"b should be ~half: $byG")
    // determinism: the survivor set is a pure function of the id
    val again = Splits.stratifiedSample(df, "id", "g", Map("a" -> 0.0, "b" -> 0.5))
    assert(cut.except(again).isEmpty && again.except(cut).isEmpty)
  }

  test("pack batches: contiguous fill respects the budget up to one straddler") {
    import spark.implicits._
    import graft.operators.Splits
    import org.apache.spark.sql.functions.{col, max, sum}
    val docs = (0L until 200L).map(i => (i, "s", 10L + (i * 7) % 50)).toDF("id", "g", "n_tok")
    val packed = Splits.packBatches(docs, "g", "id", "n_tok", budget = 100L)
    // every doc assigned; batch ids contiguous from 0
    assert(packed.count() == 200L)
    val stats = packed.groupBy(col("batch_id"))
      .agg(sum(col("n_tok")).as("tok"), max(col("n_tok")).as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ids = stats.map(_._1).sorted
    assert(ids.head == 0L && ids.last == ids.length - 1L, s"batch ids not contiguous: ${ids.toSeq}")
    // greedy contract: a batch exceeds the budget by less than its last
    // (straddling) document, and non-final batches are at least budget-full
    stats.foreach { case (b, tok, mx) =>
      assert(tok < 100L + mx, s"batch $b overshoots beyond one straddler: tok=$tok mx=$mx")
    }
    val fullBatches = stats.filter(_._1 < ids.last)
    assert(fullBatches.forall(_._2 >= 100L - 59), "non-final batch suspiciously empty")
  }

  test("pack efficiency sweep: arithmetic pinned against its own packer; monotone invariants") {
    import spark.implicits._
    import graft.operators.Splits
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val docs = (0L until 300L).map(i =>
      (i, if (i % 3 == 0) "a" else "b", 5L + (i * 11) % 60)).toDF("id", "g", "n_tok")
    val budgets = Seq(64L, 128L, 256L)
    val got = Splits.packEfficiencySweep(docs, "g", "id", "n_tok", budgets, shards = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == budgets.toSet)
    val totalTok = docs.agg(sum(col("n_tok"))).collect().head.getLong(0)
    budgets.foreach { b =>
      val (nb, cap, tok, fill, over) = got(b)
      // each summary row recomputed independently from the packer output
      val batches = Splits.packBatchesSharded(docs, "g", "id", "n_tok", b, shards = 4)
        .groupBy(col("g"), col("batch_id")).agg(sum(col("n_tok")).as("bt"))
        .collect().map(_.getLong(2))
      assert(nb == batches.length.toLong, s"budget $b batch count")
      assert(tok == totalTok, s"budget $b must account every token")
      assert(cap == nb * b && fill == 1000000L * tok / cap, s"budget $b arithmetic")
      assert(over == batches.count(_ > b).toLong, s"budget $b overshoot census")
    }
    // a larger budget can only pack tighter or equal: batch count non-increasing
    assert(got(64L)._1 >= got(128L)._1 && got(128L)._1 >= got(256L)._1)
  }

  test("pack efficiency sweep: fill_ppm exact past the Long 1e6 scale-up bound") {
    import spark.implicits._
    import graft.operators.Splits
    // multi-trillion-token fixture: sum_tokens = 1.2e13, so the naive
    // 1000000 * sum_tokens = 1.2e19 exceeds Long.MaxValue (~9.22e18) —
    // the DECIMAL(38,0) carrier must still produce the exact floor ppm
    val docs = (0L until 4L).map(i => (i, "g", 3000000000000L)).toDF("id", "g", "n_tok")
    val row = Splits.packEfficiencySweep(
        docs, "g", "id", "n_tok", budgets = Seq(5000000000000L), shards = 1)
      .collect().head
    val (nb, cap, tok, fill) =
      (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
    assert(tok == 12000000000000L)
    assert(cap == nb * 5000000000000L)
    val exact = (BigInt(1000000) * BigInt(tok) / BigInt(cap)).toLong
    assert(fill == exact, s"fill_ppm $fill != BigInt-exact $exact")
    // the fixture overfills (overshoot batches), so fill > 1e6 — the
    // regime where the wrapped Long product would have gone negative
    assert(fill > 1000000L)
  }

  test("sharded pack batches: per-shard straddler bound, contiguous ids, shards=1 ≡ baseline") {
    import spark.implicits._
    import graft.operators.Splits
    import org.apache.spark.sql.functions.{col, max, sum}
    val docs = (0L until 400L).map(i => (i, if (i % 3 == 0) "a" else "b", 10L + (i * 7) % 50))
      .toDF("id", "g", "n_tok")
    val packed = Splits.packBatchesSharded(docs, "g", "id", "n_tok", budget = 100L, shards = 4)
    assert(packed.count() == 400L, "every doc must be assigned")
    // budget contract holds PER BATCH (each batch lives inside one shard):
    // overshoot bounded by the batch's one straddling document
    val stats = packed.groupBy(col("g"), col("batch_id"))
      .agg(sum(col("n_tok")).as("tok"), max(col("n_tok")).as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    stats.foreach { case (g, b, tok, mx) =>
      assert(tok < 100L + mx, s"stratum $g batch $b overshoots beyond one straddler: tok=$tok mx=$mx")
    }
    // batch ids contiguous from 0 within each stratum (offsets stitch shards)
    stats.groupBy(_._1).foreach { case (g, rows) =>
      val ids = rows.map(_._2).sorted
      assert(ids.head == 0L && ids.last == ids.length - 1L,
        s"stratum $g batch ids not contiguous: ${ids.toSeq}")
    }
    // each batch is wholly inside one shard
    val mixed = packed.groupBy(col("g"), col("batch_id"))
      .agg(org.apache.spark.sql.functions.countDistinct(col("pack_shard")).as("n_sh"))
      .filter(col("n_sh") > 1).count()
    assert(mixed == 0L, "a batch crossed shard boundaries")
    // degenerate case: one shard reproduces the sequential baseline exactly
    val base = Splits.packBatches(docs, "g", "id", "n_tok", budget = 100L)
      .select(col("id"), col("batch_id"))
    val one = Splits.packBatchesSharded(docs, "g", "id", "n_tok", budget = 100L, shards = 1)
      .select(col("id"), col("batch_id"))
    assert(base.except(one).isEmpty && one.except(base).isEmpty,
      "shards=1 must reproduce packBatches bit-for-bit")
  }

  test("negative sampling: a dense id block near 2^62 still emits its full k negatives") {
    import spark.implicits._
    import graft.operators.Splits
    // the earlier Knuth-multiplicative candidate wrapped NEGATIVE for ids
    // >= ~2^33 and silently emitted fewer than k rows; the range-relative
    // md5 form must land every candidate inside [min_id, max_id] anywhere
    // in the long domain
    val base = Long.MaxValue / 2 // ≈ 2^62
    val ids = (0L until 400L).map(base + _)
    val df = ids.toDF("doc_id")
    val out = Splits.negativePairs(df, "doc_id", k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every candidate hits the dense block, so only hash-self-collisions
    // (expected ~4 of 1600) are dropped
    assert(out.length >= 1590 && out.length <= 1600, s"emitted ${out.length}/1600")
    assert(out.forall { case (_, _, neg) => neg >= base && neg < base + 400 },
      "negative outside the id block")
    assert(out.forall { case (doc, _, neg) => neg != doc }, "self-pair leaked")
    // retry-stability: the pair set is a pure function of (id, k, seed)
    val again = Splits.negativePairs(df, "doc_id", k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet == again.toSet, "non-deterministic pair set")
  }

  test("weighted sample: size, determinism, monotone weight advantage, loud bounds guard") {
    import spark.implicits._
    import graft.operators.Splits
    // two equal-sized groups, weight 8 vs weight 1: a weight-8 row's key is
    // the min of 8 draws vs 1, so it wins a pairwise comparison with
    // probability 8/9 — the sample must skew hard toward the heavy group.
    // md5 makes the outcome a FIXED number, so the assert cannot flake.
    val df = (0L until 2000L).map(i => (i, if (i < 1000L) 8 else 1)).toDF("id", "w")
    val out = Splits.weightedSample(df, "id", col("w"), k = 200, maxWeight = 8)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(rows.length == 200, s"sample size ${rows.length}")
    val heavy = rows.count(_._1 < 1000L)
    assert(heavy > 140, s"heavy-weight group under-sampled: $heavy/200 (expect ~8/9)")
    // pure function of (id, weight, k, seed): a re-run is identical, and the
    // selection is exactly the k globally-smallest keys
    val again = Splits.weightedSample(df, "id", col("w"), k = 200, maxWeight = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(rows.toSeq == again.toSeq, "non-deterministic sample")
    val maxSampled = rows.map(_._3).max
    val better = Splits.weightedSample(df, "id", col("w"), k = 2000, maxWeight = 8)
      .collect().map(r => (r.getLong(0), r.getString(3))).filter(_._2 < maxSampled)
    assert(better.length <= 200, "a smaller key exists outside the sample")
    // k >= n degenerates to the full set; out-of-bounds weights fail loudly
    assert(Splits.weightedSample(df, "id", col("w"), k = 5000, maxWeight = 8).count() == 2000L)
    val bad = intercept[Exception] {
      Splits.weightedSample(df, "id", col("w") * 100, k = 10, maxWeight = 8).collect()
    }
    assert(bad.getMessage.contains("weightedSample"), s"guard message: ${bad.getMessage}")
  }

  test("components: driver union-find equals the distributed fixpoint") {
    import spark.implicits._
    import graft.operators.Dedup
    val rnd = new scala.util.Random(19)
    // chain + clique + self-contained mixture with duplicate and reversed
    // pairs — the shapes where min-label semantics could diverge
    val chains = (0L until 300L).filter(_ % 10 != 9).map(i => (i, i + 1))
    val cliques = for {
      c <- 0 until 10; a <- 0 until 5; b <- (a + 1) until 5
    } yield (1000L + c * 10 + a, 1000L + c * 10 + b)
    val random = (0 until 200).map(_ =>
      (2000L + rnd.nextInt(100), 2000L + rnd.nextInt(100)))
      .filter { case (a, b) => a != b }
    val reversed = chains.take(20).map(_.swap)
    val pairs = (chains ++ cliques ++ random ++ reversed)
      .toDF("doc_a", "doc_b")
    def labels(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = labels(Dedup.components(pairs)) // under the default cutover
    val saved = Dedup.localMaxEdges
    Dedup.localMaxEdges = 0L
    try {
      val dist = labels(Dedup.components(pairs))
      assert(local == dist, "union-find fast path diverges from the fixpoint")
    } finally { Dedup.localMaxEdges = saved }
    Dedup.uncacheAll()
  }

  test("kCore: driver peel simulation equals the distributed peel") {
    import spark.implicits._
    import graft.operators.{Dedup, Graph}
    val rnd = new scala.util.Random(29)
    // a K6 core + degree-2 fringe chains hanging off it + random noise
    val core = for (a <- 0 until 6; b <- (a + 1) until 6) yield (a.toLong, b.toLong)
    val fringe = (0 until 30).map(i => ((i % 6).toLong, 100L + i)) ++
      (0 until 30).map(i => (100L + i, 200L + i))
    val noise = (0 until 60).map(_ =>
      (300L + rnd.nextInt(40), 300L + rnd.nextInt(40))).filter(p => p._1 != p._2)
    val edges = (core ++ fringe ++ noise).toDF("a", "b")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (k <- Seq(2, 3, 5); rounds <- Seq(1, 3, 6)) {
      val local = key(Graph.kCore(edges, k, rounds))
      val saved = Dedup.localMaxEdges
      Dedup.localMaxEdges = 0L
      try {
        val dist = key(Graph.kCore(edges, k, rounds))
        assert(local == dist, s"k=$k rounds=$rounds: peel simulation diverges")
      } finally { Dedup.localMaxEdges = saved }
    }
    Dedup.uncacheAll()
  }

  test("hits: driver half-step replica is BIT-identical to the distributed form") {
    import spark.implicits._
    import graft.operators.{Dedup, Graph}
    val rnd = new scala.util.Random(43)
    // bipartite-ish hubs, pure sources, pure sinks, and random noise —
    // the shapes where dropped-out score maps could diverge
    val star = (1L to 20L).map(i => (0L, i))
    val chain = (100L until 140L).map(i => (i, i + 1))
    val noise = (0 until 150).map(_ =>
      (rnd.nextInt(60).toLong, (60 + rnd.nextInt(60)).toLong))
    val edges = (star ++ chain ++ noise).toDF("a", "b")
    // doubles compared EXACTLY — the cutover claims bit-identity, so any
    // ulp of drift in the replicated decimal/round fences must fail here
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    for (iters <- Seq(1, 3, 4)) {
      val local = key(Graph.hits(edges, iters))
      val saved = Dedup.localMaxEdges
      Dedup.localMaxEdges = 0L
      try {
        val dist = key(Graph.hits(edges, iters))
        assert(local == dist, s"iters=$iters: local HITS diverges")
      } finally { Dedup.localMaxEdges = saved }
      Dedup.uncacheAll()
    }
    // string-keyed graphs take the cutover too (the textrank shape)
    val sEdges = Seq(("x", "y"), ("y", "z"), ("x", "z")).toDF("a", "b")
    val sLocal = Graph.hits(sEdges, 2).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    Dedup.localMaxEdges = 0L
    try {
      val sDist = Graph.hits(sEdges, 2).collect()
        .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      assert(sLocal == sDist, "string-keyed local HITS diverges")
    } finally { Dedup.localMaxEdges = 1L << 22 }
    Dedup.uncacheAll()
  }

  test("pageRank/PPR: driver replicas are BIT-identical to the distributed forms") {
    import spark.implicits._
    import graft.operators.{Dedup, Graph}
    val rnd = new scala.util.Random(47)
    val star = (1L to 15L).map(i => (0L, i))
    val chain = (100L until 130L).map(i => (i, i + 1))
    val noise = (0 until 120).map(_ =>
      (rnd.nextInt(50).toLong, (50 + rnd.nextInt(50)).toLong))
    val edges = (star ++ chain ++ noise).toDF("a", "b")
    def keyD(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (iters <- Seq(1, 3)) {
      val prL = keyD(Graph.pageRank(edges, iters))
      val pprL = keyD(Graph.personalizedPageRank(edges, seed = 0L, iters))
      val pprMissL = keyD(Graph.personalizedPageRank(edges, seed = -5L, iters))
      val saved = Dedup.localMaxEdges
      Dedup.localMaxEdges = 0L
      try {
        assert(keyD(Graph.pageRank(edges, iters)) == prL,
          s"iters=$iters: local pageRank diverges")
        assert(keyD(Graph.personalizedPageRank(edges, 0L, iters)) == pprL,
          s"iters=$iters: local PPR diverges")
        assert(keyD(Graph.personalizedPageRank(edges, -5L, iters)) == pprMissL,
          s"iters=$iters: local PPR (absent seed) diverges")
      } finally { Dedup.localMaxEdges = saved }
      Dedup.uncacheAll()
    }
  }

  test("PPR: non-Long node ids keep the distributed loop (no boxed-equality seed miss)") {
    import spark.implicits._
    import graft.operators.{Dedup, Graph}
    // INTEGER ids — under the old Any-keyed cutover, degMap.containsKey(5L)
    // missed Integer(5) by boxed equality and the local path silently
    // returned a seedless/empty result while the distributed join
    // (numerically coerced) found the seed (ADVICE r15, medium)
    val edges = Seq((5, 6), (6, 7), (5, 7), (7, 8))
      .toDF("a", "b")
      .select(col("a").cast("int").as("a"), col("b").cast("int").as("b"))
    def keyD(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.get(0).toString -> r.getDouble(1)).toMap
    val dflt = keyD(Graph.personalizedPageRank(edges, seed = 5L, iters = 2))
    assert(dflt.nonEmpty, "int-id PPR with an in-graph seed must rank nodes")
    val saved = Dedup.localMaxEdges
    Dedup.localMaxEdges = 0L
    try {
      val dist = keyD(Graph.personalizedPageRank(edges, seed = 5L, iters = 2))
      assert(dflt == dist, "int-id PPR diverges between default and forced-distributed")
    } finally { Dedup.localMaxEdges = saved }
    Dedup.uncacheAll()
  }

  test("components/damped cutovers: NULL ids fall back to the distributed loop") {
    import graft.operators.{Dedup, Graph}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_a", LongType, nullable = true),
      StructField("doc_b", LongType, nullable = true)))
    val rows = java.util.Arrays.asList(
      Row(1L, 2L), Row(2L, 3L), Row(null, 4L), Row(5L, null), Row(6L, 7L))
    val pairs = spark.createDataFrame(rows, schema)
    def labels(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => Option(r.get(0)).map(_.toString).orNull ->
        Option(r.get(1)).map(_.toString).orNull).toSet
    // before the fix this NPE'd in the union-find's getLong walk; now the
    // null-id graph keeps the distributed fixpoint on BOTH settings
    val dflt = labels(Dedup.components(pairs))
    val saved = Dedup.localMaxEdges
    Dedup.localMaxEdges = 0L
    try assert(dflt == labels(Dedup.components(pairs)),
      "null-id components diverge between default and forced-distributed")
    finally { Dedup.localMaxEdges = saved }
    Dedup.uncacheAll()
    // same guard on the damped-iteration family (hits boxes NULL keys into
    // its score maps where the distributed join would drop them)
    val eSchema = StructType(Seq(
      StructField("a", LongType, nullable = true),
      StructField("b", LongType, nullable = true)))
    val eRows = java.util.Arrays.asList(Row(1L, 2L), Row(null, 3L), Row(2L, 3L))
    val edges = spark.createDataFrame(eRows, eSchema)
    def hkey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => Option(r.get(0)).map(_.toString).orNull ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    val hDflt = hkey(Graph.hits(edges, 2))
    Dedup.localMaxEdges = 0L
    try assert(hDflt == hkey(Graph.hits(edges, 2)),
      "null-id HITS diverges between default and forced-distributed")
    finally { Dedup.localMaxEdges = saved }
    Dedup.uncacheAll()
  }

  test("damped replicas: unscaled-long overflow falls back to the exact decimal fold") {
    import graft.operators.Graph
    // a 93k-source star: the hub's first HITS authority half-step
    // accumulates 93 000 × 10¹⁴ unscaled > 2⁶³, so the long fast path
    // must throw and the JBD fallback must produce the identical result
    // — compared against the distributed form, which never overflows
    // (DECIMAL(28,14) sums)
    val spark2 = spark
    import org.apache.spark.sql.functions.{col, lit}
    val star = spark2.range(93000L)
      .select((col("id") + 10L).as("a"), lit(0L).as("b"))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val local = key(Graph.hits(star, iters = 2))
    val saved = graft.operators.Dedup.localMaxEdges
    graft.operators.Dedup.localMaxEdges = 0L
    try assert(key(Graph.hits(star, iters = 2)) == local,
      "overflow-fallback replica diverges from the distributed form")
    finally { graft.operators.Dedup.localMaxEdges = saved }
    graft.operators.Dedup.uncacheAll()
  }

  test("ShardedFold rejects order-sensitive (floating) sum columns") {
    import spark.implicits._
    import graft.operators.ShardedFold
    val df = Seq((1L, 1.5), (2L, 2.5)).toDF("bucket", "v")
    val e = intercept[IllegalArgumentException] {
      ShardedFold.prefix(df, Nil, Seq("bucket"),
        sums = Seq("v" -> "cum"), idxCol = None, shards = 4)
    }
    assert(e.getMessage.contains("integral or decimal"))
    // the decimal-fenced form is the supported spelling
    val ok = ShardedFold.prefix(
      df.select(col("bucket"), col("v").cast("decimal(18,4)").as("v")),
      Nil, Seq("bucket"), sums = Seq("v" -> "cum"), idxCol = None, shards = 4)
    assert(ok.collect().map(_.getDecimal(2).doubleValue()).sorted.toSeq
      == Seq(1.5, 4.0))
  }

  test("blocked fuzzy join prefilters are lossless on adversarial strings") {
    import spark.implicits._
    import graft.operators.Joins
    val rnd = new scala.util.Random(73)
    // adversarial mix for the length / digit-bag lower bounds: id-like
    // numeric suffixes (transpositions keep the bag EQUAL — must survive
    // to the DP), >63 repeats of one digit (the 6-bit cap saturates —
    // capping must stay a valid lower bound), multi-byte letters, empty
    // strings, and NULLs
    val strs = Seq("", "é1ü2", "1" * 70, "1" * 70 + "2", null) ++
      (0 until 120).map { i =>
        val base = f"Customer#${rnd.nextInt(100000)}%09d"
        rnd.nextInt(4) match {
          case 0 => base
          case 1 => val a = base.toCharArray; // transposition
            val p = 10 + rnd.nextInt(7); val t = a(p); a(p) = a(p + 1); a(p + 1) = t
            new String(a)
          case 2 => base.dropRight(rnd.nextInt(3)) // length change
          case _ => base + rnd.nextInt(10)
        }
      }
    val df = strs.zipWithIndex
      .map { case (nm, i) => (i.toLong, (i % 3).toLong, nm) }
      .toDF("id", "blk", "nm")
    for (maxDist <- Seq(0, 1, 2, 3)) {
      val got = Joins.blockedFuzzyJoin(df, Seq("blk"), "id", "nm", maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
      // naive oracle: every in-block pair through unbounded levenshtein
      val naive = df.as("a").join(df.as("b"), col("a.blk") === col("b.blk"))
        .filter(col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"),
          levenshtein(col("a.nm"), col("b.nm")).as("d"))
        .filter(col("d") <= maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
      assert(got == naive, s"maxDist=$maxDist: prefilter dropped or added pairs")
    }
  }

  test("global order: dense permutation equal to the single-window rank for any shard count") {
    import spark.implicits._
    import graft.operators.Splits
    // sparse, unordered, duplicated-free ids across the long domain
    val ids = ((0L until 500L).map(_ * 7919L) ++ (0L until 300L).map(Long.MaxValue / 3 + _))
    val df = ids.toDF("doc_id")
    val expected = {
      // oracle form: one global window over the same md5 key
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("shuffle_key"), col("doc_id"))
      df.withColumn("shuffle_key", md5(concat_ws(":", col("doc_id"), lit(12345L))))
        .withColumn("shuffle_pos", row_number().over(w).cast("long") - 1L)
        .select(col("doc_id"), col("shuffle_pos"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    }
    for (shards <- Seq(1, 16, 256)) {
      val got = Splits.globalOrder(df, "doc_id", shards = shards)
        .select(col("doc_id"), col("shuffle_pos"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.map(_._2).sorted.toSeq == (0L until ids.length).toSeq,
        s"shards=$shards: positions are not a dense 0..n-1 permutation")
      assert(got.toMap == expected, s"shards=$shards: order differs from the global rank")
    }
  }

  test("chunk windows: every token covered, stride geometry, short final window") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val wordGen = Gen.oneOf("x", "yy", "zzz", "w")
    val docGen = for {
      n <- Gen.choose(1, 40)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws.mkString(" ")
    val docs = Gen.listOfN(60, docGen).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val winSize = 7
    val stride = 4
    val got = TextAnalysis.chunkWindows(df, winSize = winSize, stride = stride)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3), r.getString(4)))
      .groupBy(_._1)
    docs.foreach { case (id, text) =>
      val toks = text.toLowerCase.split(" ", -1)
      val n = toks.length
      val wins = got(id).sortBy(_._2)
      assert(wins.length == (n - 1) / stride + 1, s"doc $id: window count")
      wins.foreach { case (_, wid, wtok, first, last) =>
        val start = (wid * stride).toInt
        assert(wtok == math.min(winSize, n - start), s"doc $id win $wid: length")
        assert(first == toks(start), s"doc $id win $wid: first token")
        assert(last == toks(start + wtok - 1), s"doc $id win $wid: last token")
      }
      // coverage: the union of [start, start+len) is exactly [0, n)
      val covered = wins.flatMap { case (_, wid, wtok, _, _) =>
        (wid * stride).toInt until ((wid * stride).toInt + wtok) }.toSet
      assert(covered == (0 until n).toSet, s"doc $id: coverage gap")
    }
  }

  test("BPE encode is a lossless segmentation for any corpus and any trained merge count") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // random word corpora over a tiny alphabet — small vocab forces real
    // merges (repeated pairs) instead of degenerate all-distinct streams
    val wordGen = Gen.oneOf("aa", "bb", "ab", "cd", "a", "b")
    val textGen = for {
      n <- Gen.choose(1, 12)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws.mkString(" ")
    val texts = Gen.listOfN(40, textGen).sample.get
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // identity: with no merges, the token stream IS the whitespace split
    val idTokens = TextAnalysis.bpeEncode(docs, Nil).orderBy("doc_id", "pos")
      .collect().map(r => (r.getLong(0), r.getString(2)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(idTokens(i.toLong) == t.split(" ").toSeq, s"doc $i identity")
    }
    for (merges <- Seq(1, 3)) {
      val m = TextAnalysis.bpeVocab(docs, merges = merges).orderBy("merge_round")
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      val enc = TextAnalysis.bpeEncode(docs, m).orderBy("doc_id", "pos")
        .collect().map(r => (r.getLong(0), r.getString(2)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
      texts.zipWithIndex.foreach { case (t, i) =>
        // LOSSLESS SEGMENTATION: re-splitting every (possibly merged)
        // token on spaces reconstructs the original token stream exactly —
        // encoding may only group adjacent tokens, never alter or drop
        val flat = enc.getOrElse(i.toLong, Seq.empty).flatMap(_.split(" ").toSeq)
        assert(flat == t.split(" ").toSeq, s"doc $i merges=$merges: $flat")
      }
    }
  }

  test("bpeVocab 40-merge training (chunked fold) equals a pure-Scala replay") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // enough pair mass to learn 40 real merges — crosses the foldEvery=16
    // re-materialization boundary twice, so the chunk fold itself is what
    // this test exercises
    val rnd = new scala.util.Random(11)
    val syms = Vector("a", "b", "c", "d", "e", "ab", "cd", "ee")
    val texts = (0 until 60).map(_ =>
      (0 until (4 + rnd.nextInt(10))).map(_ => syms(rnd.nextInt(syms.size)))
        .mkString(" "))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeVocab(docs, merges = 40).orderBy("merge_round")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // pure-Scala reference: overlapping adjacent-pair counts, argmax by
    // (n desc, lhs, rhs), left-to-right non-overlapping merge application
    var corpus = texts.map(_.split(" ").toList)
    val expect = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var stop = false
    for (_ <- 1 to 40 if !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      corpus.foreach(ts => ts.zip(ts.drop(1)).foreach(p =>
        counts(p) = counts.getOrElse(p, 0L) + 1L))
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), n) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
        expect += ((l, r, n))
        corpus = corpus.map { ts =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < ts.length) {
            if (i + 1 < ts.length && ts(i) == l && ts(i + 1) == r) {
              out += s"$l $r"; i += 2
            } else { out += ts(i); i += 1 }
          }
          out.toList
        }
      }
    }
    assert(got.size == expect.size, s"${got.size} vs ${expect.size} merges learned")
    got.zip(expect).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"merge ${i + 1}: $g vs $e")
    }
    assert(got.size == 40, "fixture must actually learn 40 merges")
  }

  test("per-stratum sample: window-form equality for any shard count; k saturation") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Splits
    val data = Gen.listOfN(2000,
        for { s <- Gen.choose(0, 6); id <- Gen.choose(0L, 1000000L) } yield (s, id))
      .sample.get.distinct
      .map { case (s, id) => (s"s$s", id) }
    val df = data.toDF("stratum", "doc_id").dropDuplicates("doc_id")
    val w = Window.partitionBy(col("stratum"))
      .orderBy(col("sample_key"), col("doc_id"))
    for (k <- Seq(1, 5); shards <- Seq(1, 3, 16)) {
      val got = Splits.samplePerStratum(df, "doc_id", "stratum", k, shards, seed = 9)
        .select("stratum", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val want = df
        .withColumn("sample_key", md5(concat_ws(":", col("doc_id"), lit(9))))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select("stratum", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want, s"k=$k shards=$shards")
    }
    // k beyond every stratum's population returns the whole corpus
    val all = Splits.samplePerStratum(df, "doc_id", "stratum", k = 100000, shards = 4)
      .count()
    assert(all == df.count())
  }

  test("weighted stratum sample: raising one row's weight never evicts it; sizes hold") {
    import spark.implicits._
    import graft.operators.Splits
    val rows = Gen.listOfN(800,
        for { s <- Gen.choose(0, 3); id <- Gen.choose(0L, 500000L); w <- Gen.choose(1L, 6L) }
          yield (s, id, w))
      .sample.get.map { case (s, id, w) => (s"s$s", id, w) }
    val df = rows.toDF("stratum", "doc_id", "w").dropDuplicates("doc_id").cache()
    val k = 4
    def pick(wc: org.apache.spark.sql.Column) =
      Splits.weightedSamplePerStratum(df, "doc_id", "stratum", wc, k, maxWeight = 12)
        .select("stratum", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val base = pick(col("w"))
    // doubling every weight only ADDS draws per row — a selected row's key
    // can only shrink relative to others' keys shrinking too; the clean
    // invariant is on a SINGLE row: raise one selected row's weight, all
    // else equal, and it must stay selected (its key is min over a
    // superset of its previous draws, others' keys are unchanged)
    val (st, id) = base.head
    val boosted = pick(when(col("doc_id") === id, col("w") + 6L).otherwise(col("w")))
    assert(boosted.contains((st, id)), s"boosted row ($st,$id) was evicted")
    val pops = df.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = base.groupBy(_._1).view.mapValues(_.size).toMap
    pops.foreach { case (s, n) =>
      assert(sizes.getOrElse(s, 0) == math.min(k.toLong, n), s"stratum $s")
    }
    df.unpersist()
  }

  test("int8 quantization: audit bounds hold for adversarial vectors") {
    import spark.implicits._
    import graft.operators.Similarity
    val vecs = Gen.listOfN(200, Gen.listOfN(8,
        Gen.oneOf(Gen.choose(-4.0, 4.0), Gen.const(0.0), Gen.const(1e-30), Gen.const(-3.5))))
      .sample.get.zipWithIndex.map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
    val df = vecs.toDF("vec_id", "embedding")
    val scales = vecs.flatMap(_._2.zipWithIndex.map { case (x, i) => (i, math.abs(x.toDouble)) })
      .groupBy(_._1).map { case (_, xs) => xs.map(_._2).max }
    val worstStep = (if (scales.isEmpty) 0.0 else scales.max) / 254
    Similarity.int8Quantize(df).collect().foreach { r =>
      val (n, sum, sabs, sat, err) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(n == 8)
      assert(math.abs(sum) <= sabs && sabs <= 127L * n, s"code mass out of range: $r")
      assert(sat >= 0 && sat <= n)
      assert(err >= 0.0 && err <= worstStep + 1e-9, s"error above half a step: $r")
    }
  }

  test("entropy: 0 ≤ H ≤ ln(n_distinct) within fencing slack for random corpora") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val word = Gen.oneOf("a", "b", "c", "dd", "eee", "zq")
    val docsGen = Gen.listOfN(150, Gen.choose(1, 40).flatMap(Gen.listOfN(_, word)))
      .sample.get.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    val out = TextAnalysis.entropyStats(docsGen.toDF("doc_id", "text")).collect()
    assert(out.length == docsGen.length)
    out.foreach { r =>
      val (nTok, nDist, h) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      // fencing rounds each ln to 6 dp and each term once more, so the
      // theoretical bounds hold up to n_tokens · 1.5e-6 of accumulated slack
      val slack = nTok * 1.5e-6
      assert(h >= -slack, s"negative entropy: $r")
      assert(h <= math.log(nDist.toDouble.max(1.0)) + slack ||
        nDist == 1L && h == 0.0, s"above the ln(n_distinct) ceiling: $r")
      assert(nDist <= nTok)
    }
  }

  test("heavy hitters: MG two-pass equals the brute threshold for random skewed corpora") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // random corpora with a zipf-ish head: a few planted hot tokens at
    // random rates + unique tail; s chosen so the threshold cuts inside
    // the head sometimes and above it sometimes
    val rng = new scala.util.Random(42)
    for (trial <- 0 until 4) {
      val hot = (0 until 3).map(i => s"hot$i" -> (50 + rng.nextInt(400)))
      val toks = hot.flatMap { case (t, n) => Seq.fill(n)(t) } ++
        (0 until 2000 + rng.nextInt(3000)).map(i => s"u${trial}_$i")
      val docs = rng.shuffle(toks).grouped(25).zipWithIndex
        .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
        .toDF("doc_id", "text")
      val s = 20 + rng.nextInt(60)
      val tok = docs.select(explode(split(lower(col("text")), " ")).as("token"))
      val n = tok.count()
      val brute = tok.groupBy("token").count().collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .filter { case (_, c) => c * s >= n }.toMap
      val got = TextAnalysis.heavyHitters(docs, s = s).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == brute, s"trial=$trial s=$s n=$n: $got vs $brute")
    }
  }

  test("z-order: same-bucket points share their high coordinate bits for random points") {
    import spark.implicits._
    import graft.operators.Layout
    val rng = new scala.util.Random(7)
    val pts = (0 until 3000).map(_ =>
      (rng.nextInt(1 << 16).toLong, rng.nextInt(1 << 16).toLong))
    // bucket = top 8 Morton bits = top 4 bits of EACH coordinate: every
    // bucket is exactly a 4096×4096 tile, for ANY point distribution
    val rows = pts.toDF("x", "y")
      .select(Layout.zOrderKey(col("x"), col("y"), 16).as("zk"), col("x"), col("y"))
      .select(shiftright(col("zk"), 24).as("b"), col("x"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (b, grp) =>
      assert(grp.map(_._2 >> 12).distinct.size == 1, s"bucket $b mixes x tiles")
      assert(grp.map(_._3 >> 12).distinct.size == 1, s"bucket $b mixes y tiles")
    }
  }

  test("nprobe sweep: points are maxNprobe-invariant prefixes; hits bounded by exact") {
    import spark.implicits._
    import graft.operators.Similarity
    val rng = new scala.util.Random(13)
    val vecs = (0L until 120L).map(i =>
      (i, Seq.fill(8)(rng.nextDouble().toFloat * 2f - 1f)))
    val emb = vecs.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 8)
    val cents = Similarity.trainCentroids(emb, k = 4, iters = 2)
    def rowsOf(maxNp: Int) =
      Similarity.nprobeSweep(emb, q, cents, k = 3, maxNprobe = maxNp)
        .orderBy("nprobe").collect().map(_.toSeq).toSeq
    val s3 = rowsOf(3)
    // a sweep point depends only on its own nprobe, never on maxNprobe:
    // shallower sweeps are exact prefixes of deeper ones (shared scoring
    // fans out rows, it never changes a point's candidate set)
    assert(rowsOf(1) == s3.take(1), "maxNprobe=1 must be the 3-deep prefix")
    assert(rowsOf(2) == s3.take(2), "maxNprobe=2 must be the 3-deep prefix")
    // the cost axis is non-decreasing in nprobe; hits never exceed exact
    val cands = s3.map(_(2).asInstanceOf[Long])
    assert(cands == cands.sorted, s"candidate volume must be monotone: $cands")
    s3.foreach { r =>
      assert(r(3).asInstanceOf[Long] <= r(4).asInstanceOf[Long], s"hits>exact in $r")
    }
  }

  test("kfold: folds partition any id set and are stable under re-derivation") {
    import spark.implicits._
    import graft.operators.Splits
    val ids = Gen.listOfN(800, Gen.choose(Long.MinValue / 2, Long.MaxValue / 2))
      .sample.get.distinct
    for (k <- Seq(2, 5, 9)) {
      val folded = Splits.kfold(ids.toDF("doc_id"), "doc_id", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      assert(folded.length == ids.length, "no row gained or lost")
      assert(folded.forall { case (_, f) => f >= 0 && f < k }, "fold in range")
      // derivation is pure: the same ids map to the same folds again
      val again = Splits.kfold(ids.toDF("doc_id"), "doc_id", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      assert(folded.toMap == again.toMap)
    }
  }

  test("date formatter: layout shape, 01:00 pin, and one-day arithmetic hold for any instant") {
    val layout = """\d{4}-\d{2}-\d{2}T01-00Z""".r
    Gen.listOfN(500, Gen.choose(0L, 4102444800L)).sample.get.foreach { epochSec =>
      val ts = Instant.ofEpochSecond(epochSec)
      val s = Manifest.formatKeyDate(ts)
      assert(layout.matches(s), s"bad layout: $s")
      assert(s.startsWith(ts.toString.take(10))) // same calendar day
      val pinned = Manifest.pinTo0100Utc(ts)
      assert(Manifest.pinTo0100Utc(pinned) == pinned) // idempotent
      assert(pinned.minus(java.time.Duration.ofDays(1)) ==
        Manifest.pinTo0100Utc(ts.minus(java.time.Duration.ofDays(1))))
    }
  }

  test("kcore at fixpoint: every survivor keeps >= k neighbors, removed nodes don't") {
    import spark.implicits._
    import graft.operators.Graph
    val rnd = new scala.util.Random(29)
    for (trial <- 0 until 3) {
      val n = 40
      val edges = (0 until 150).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).distinct
      val g = edges.toDF("a", "b")
      val core = Graph.kCore(g, k = 3, rounds = 20).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // at fixpoint the k-core property holds: every surviving node has
      // >= k neighbors INSIDE the surviving set
      assert(core.values.forall(_ >= 3L), s"trial $trial: $core")
      // and the survivor set is consistent: recomputing degrees over the
      // induced subgraph reproduces core_deg exactly
      val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter(e => e._1 != e._2).distinct
      val induced = und.filter(e => core.contains(e._1) && core.contains(e._2))
      val degs = induced.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
      assert(core == degs, s"trial $trial: core=$core degs=$degs")
    }
  }

  test("blockSkewWith over the fingerprint seam equals the self-deriving wrapper") {
    import spark.implicits._
    import graft.operators.Dedup
    // the simhashSig artifact seam: serving the audit from a precomputed
    // fingerprint frame must reproduce the wrapper EXACTLY — the
    // equivalence the dedup_block_skew rewiring rests on
    val rnd = new scala.util.Random(47)
    val words = Array("alpha", "beta", "gamma", "delta", "echo", "fox", "golf")
    val docs = (0L until 40L).map { i =>
      val text =
        if (i % 4 == 0) "alpha beta gamma delta echo fox golf alpha beta"
        else (0 until 8).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
    val direct = Dedup.blockSkew(docs, topN = 20).collect().map(_.toSeq).toSeq
    val served = Dedup.blockSkewWith(
      Dedup.simhashFingerprints(docs), topN = 20).collect().map(_.toSeq).toSeq
    assert(direct == served, "fingerprint seam drifted from the wrapper")
    Dedup.uncacheAll()
  }

  test("canonical graph seams equal their public wrappers on random graphs") {
    import spark.implicits._
    import graft.operators.{Dedup, Graph}
    // the r17 artifact seams (triangleCountsWith / neighborJaccardWith /
    // clusteringCoefficientWithDeg) take caller-owned canonical-edge and
    // degree contracts; this pins that honoring the contract reproduces
    // the self-deriving wrapper EXACTLY — the equivalence the registry
    // rewiring rests on
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 3) {
      val n = 30
      val g = (0 until 120).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).toDF("a", "b")
      val canonical = Dedup.cached(g.select(
          least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b")).distinct())
      val deg = Dedup.cached(Graph.canonicalDegrees(canonical))
      def set(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
        df.collect().map(_.toSeq).toSet
      assert(set(Graph.triangleCountsWith(canonical, deg)) ==
        set(Graph.triangleCounts(g)), s"trial $trial: triangles")
      assert(set(Graph.neighborJaccardWith(canonical, deg, Some(5L))) ==
        set(Graph.neighborJaccard(g, Some(5L))), s"trial $trial: jaccard")
      val tri = Graph.triangleCounts(g)
      assert(set(Graph.clusteringCoefficientWithDeg(deg, tri)) ==
        set(Graph.clusteringCoefficientWith(g, tri)), s"trial $trial: cc")
      Dedup.uncacheAll()
    }
  }

  test("pairRulesDistinct on a deduped incidence equals pairRules on its raw form") {
    import spark.implicits._
    import graft.operators.{Assoc, Dedup}
    val rnd = new scala.util.Random(37)
    for (trial <- 0 until 3) {
      val raw = (0 until 300).map(_ =>
        (rnd.nextInt(40).toLong, s"i${rnd.nextInt(12)}")).toDF("basket", "item")
      val distinctInc = Dedup.cached(
        raw.select(col("basket"), col("item")).distinct())
      def set(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
        df.collect().map(_.toSeq).toSet
      assert(set(Assoc.pairRulesDistinct(distinctInc, minPairN = 2)) ==
        set(Assoc.pairRules(raw, minPairN = 2)), s"trial $trial: rules")
      assert(set(Assoc.oversizedBasketsDistinct(distinctInc, 5)) ==
        set(Assoc.oversizedBaskets(raw, maxBasketItems = 5)),
        s"trial $trial: audit")
      Dedup.uncacheAll()
    }
  }

  test("cms join-size estimate: always an upper bound; exact when collision-free") {
    import spark.implicits._
    import graft.operators.Joins
    val rng = new scala.util.Random(23)
    for (_ <- 0 until 3) {
      val l = (0 until 400).map(_ => rng.nextInt(30).toLong).map(Tuple1(_)).toDF("k")
      val r = (0 until 300).map(_ => rng.nextInt(30).toLong).map(Tuple1(_)).toDF("k")
      val row = Joins.cmsJoinSizeEstimate(l, r, "k", width = 64, depth = 3)
        .collect().head
      val exact = l.join(r, "k").count()
      assert(row.getLong(0) == exact, row.toString)
      assert(row.getLong(1) >= exact && row.getBoolean(2), row.toString)
    }
    // 8 distinct keys in a 4096-wide sketch: collision odds negligible in
    // EVERY row → the min-row estimate is exact
    val l8 = (0 until 100).map(i => (i % 8).toLong).map(Tuple1(_)).toDF("k")
    val row = Joins.cmsJoinSizeEstimate(l8, l8, "k", width = 4096, depth = 3)
      .collect().head
    assert(row.getLong(0) == row.getLong(1), row.toString)
  }

  test("median2Pass equals sorted-middle selection under forced multi-pass narrowing", SlowTest) {
    import spark.implicits._
    import graft.operators.Hygiene
    val rng = new scala.util.Random(19)
    for (trial <- 0 until 4) {
      // wide-range values + heavy duplicates + odd/even counts; a tiny
      // exactThreshold forces several histogram passes
      val n = 51 + trial * 100 + rng.nextInt(50)
      val vals = (0 until n).map { _ =>
        if (rng.nextBoolean()) rng.nextInt(5).toDouble // dup cluster
        else rng.nextDouble() * 1e6 - 5e5
      }
      val got = Hygiene.median2Pass(vals.map(Tuple1(_)).toDF("x"), "x",
          binsPerPass = 16, exactThreshold = 64L)
        .collect().head
      val u6 = vals.map(v => math.round(v * 1e6)).sorted
      val exp2 = u6((n - 1) / 2) + u6(n / 2)
      assert(got.getLong(0) == n.toLong, got.toString)
      assert(got.getLong(1) == exp2, s"trial $trial: got $got expected $exp2")
    }
  }

  test("madOutliersScalable equals exact madOutliers under forced multi-pass narrowing", SlowTest) {
    import spark.implicits._
    import graft.operators.Hygiene
    val rng = new scala.util.Random(23)
    // mixed group shapes: wide-range, duplicate-heavy, constant,
    // singleton, odd/even counts — tiny bins/threshold force several
    // distributed narrowing passes per (group, rank) unit
    val rows = Seq.newBuilder[(String, Double)]
    for (g <- 0 until 6) {
      val n = 1 + rng.nextInt(40) + (if (g % 2 == 0) 1 else 0)
      for (_ <- 0 until n) rows += (s"g$g" -> (g match {
        case 0 => 7.25 // constant group → MAD 0
        case 1 => rng.nextInt(3).toDouble // heavy dups
        case _ => rng.nextDouble() * 1e5 - 5e4
      }))
    }
    val df = rows.result().toDF("grp", "x")
    def key(r: org.apache.spark.sql.Row) =
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val exact = Hygiene.madOutliers(df, "grp", "x").collect().map(key).toMap
    val scal = Hygiene.madOutliersScalable(df, "grp", "x",
      binsPerPass = 8, exactThreshold = 32L).collect().map(key).toMap
    assert(scal == exact, s"scal=$scal\nexact=$exact")

    // the general quantile surface over the same selector: every
    // (group, q) equals the sorted-middle lower order statistic at
    // rank ⌊q·(n−1)⌋, still under forced multi-pass narrowing
    val qPpms = Seq(0L, 250000L, 500000L, 900000L, 1000000L)
    val got = Hygiene.groupedQuantiles(df, "grp", "x", qPpms,
        binsPerPass = 8, exactThreshold = 32L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val byGrp = rows.result().groupBy(_._1)
      .view.mapValues(_.map(t => math.round(t._2 * 1e6)).sorted).toMap
    val expQ = (for {
      (g, vs) <- byGrp; qp <- qPpms
    } yield (g, qp) -> vs(math.floor((qp / 1000000.0) * (vs.size - 1)).toInt))
      .toMap
    assert(got == expQ, s"got=$got\nexp=$expQ")
  }

  test("scd2 invariants on random histories: tiling, versions, run compression") {
    import spark.implicits._
    import graft.operators.Temporal
    val rng = new scala.util.Random(11)
    val events = (1L to 20L).flatMap { k =>
      (0 until 1 + rng.nextInt(15)).map(i =>
        (k, ('A' + rng.nextInt(3)).toChar.toString, 100L * (i + 1), k * 100 + i))
    }
    val h = Temporal.scd2History(
        events.toDF("user_id", "event_type", "ts_us", "event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
      .groupBy(_._1)
    h.foreach { case (k, rows) =>
      val sorted = rows.sortBy(_._2)
      // versions are 1..n dense
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"key $k")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // intervals tile: each valid_to equals the successor's valid_from
          assert(a._5.contains(b._4), s"key $k: $a !tile $b")
          // run compression: consecutive intervals never share the attr
          assert(a._3 != b._3, s"key $k: uncompressed run $a $b")
        case _ => ()
      }
      // exactly the last interval is open
      assert(sorted.last._5.isEmpty && sorted.init.forall(_._5.nonEmpty), s"key $k")
    }
  }

  test("ewma stays within its window's min/max for random series") {
    import spark.implicits._
    import graft.operators.Temporal
    val rng = new scala.util.Random(13)
    val span = 8
    val rows = (1L to 10L).flatMap { k =>
      (0 until 30).map(i => (k, 10L + i, k * 100 + i, rng.nextDouble() * 400))
    }
    val out = Temporal.ewmaSmooth(
        rows.toDF("user_id", "ts_us", "event_id", "value"), span = span)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    out.foreach { case (k, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((_, _, _, ew), i) =>
        val frame = sorted.slice(math.max(0, i - span + 1), i + 1).map(_._3)
        // a convex fold of frame values (floor-div loses < 1 per step)
        assert(ew >= frame.min - span && ew <= frame.max, s"key $k idx $i")
      }
      // first row's ewma IS its value
      assert(sorted.head._4 == sorted.head._3, s"key $k")
    }
  }

  test("cdc chunks on random payloads: tiling, determinism, prefix resync") {
    import spark.implicits._
    import graft.operators.Multimodal
    val rng = new scala.util.Random(29)
    // random ASCII payloads of random lengths (including sub-window)
    val bodies = (1L to 12L).map { id =>
      val n = 1 + rng.nextInt(400)
      id -> (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    }
    val docs = bodies.toDF("doc_id", "text")
    val chunks = Multimodal.cdcChunks(docs, divisor = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    bodies.foreach { case (id, txt) =>
      val own = chunks.filter(_._1 == id).sortBy(_._2)
      assert(own.nonEmpty && own.map(_._4).sum == txt.length.toLong,
        s"doc $id tiling")
      assert(own.head._3 == 1L && own.map(_._2).toSeq == own.indices.map(_.toLong),
        s"doc $id indices")
      own.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._4, s"doc $id contiguity")
        case _ => ()
      }
    }
    // determinism: a second run chunks identically
    val again = Multimodal.cdcChunks(docs, divisor = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    assert(chunks.toSet == again.toSet)
    // prefix resync: shifting every payload behind a random 1-9 byte
    // prefix must reproduce each doc's chunk-hash TAIL (all chunks after
    // the first shared boundary are content-determined)
    val shifted = bodies.map { case (id, txt) =>
      id -> (("#" * (1 + rng.nextInt(9))) + txt)
    }.toDF("doc_id", "text")
    val sc = Multimodal.cdcChunks(shifted, divisor = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(4)))
    bodies.foreach { case (id, txt) =>
      val orig = chunks.filter(_._1 == id).sortBy(_._2).map(_._5)
      val shif = sc.filter(_._1 == id).sortBy(_._2).map(_._3)
      // if the original had >= 3 chunks, at least its LAST chunk hash
      // must reappear in the shifted version (resync happened)
      if (orig.length >= 3)
        assert(shif.contains(orig.last), s"doc $id never re-synced")
    }
  }

  test("drift tvd is a bounded symmetric floor-share metric") {
    import spark.implicits._
    import graft.operators.Hygiene
    val rng = new scala.util.Random(41)
    def dump(seed: Int) = {
      val r = new scala.util.Random(seed)
      (0 until 50 + r.nextInt(100)).map(_ => (s"v${r.nextInt(8)}", 1L))
    }
    for (trial <- 0 until 3) {
      val a = dump(trial * 2).toDF("cat", "x")
      val b = dump(trial * 2 + 1).toDF("cat", "x")
      def tvd(x: org.apache.spark.sql.DataFrame,
          y: org.apache.spark.sql.DataFrame) =
        Hygiene.driftReport(x, y, Seq("cat")).collect().head.getLong(4)
      val ab = tvd(a, b)
      assert(ab >= 0L && ab <= 1000000L, s"trial $trial: tvd $ab out of range")
      // |pa − pb| is symmetric even though each side floors its own share
      assert(ab == tvd(b, a), s"trial $trial: asymmetric")
      assert(tvd(a, a) == 0L && tvd(b, b) == 0L, s"trial $trial: self-drift")
      val _ = rng // keep the seed param shape uniform with sibling tests
    }
  }

  test("transition ppm masses: per-prev sums land in (1e6 - fanout, 1e6]") {
    import spark.implicits._
    import graft.operators.Temporal
    val rng = new scala.util.Random(17)
    val rows = (1L to 25L).flatMap { k =>
      (0 until 1 + rng.nextInt(12)).map(i =>
        (k, s"t${rng.nextInt(5)}", 100L * (i + 1), k * 100 + i))
    }
    val tr = Temporal.eventTransitions(
        rows.toDF("user_id", "event_type", "ts_us", "event_id"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    tr.groupBy(_._1).foreach { case (prev, rs) =>
      val mass = rs.map(_._3).sum
      // each DIV floors away < 1 ppm unit per next-state
      assert(mass <= 1000000L && mass > 1000000L - rs.length,
        s"$prev: mass $mass over ${rs.length} states")
      rs.foreach { case (_, n, p) => assert(n >= 1 && p >= 0) }
    }
  }

  test("compactionPlan on random inventories: bytes conserved, bins contiguous, ids ordered") {
    import spark.implicits._
    val invGen = for {
      nFiles <- Gen.choose(1, 300)
      rows <- Gen.listOfN(nFiles, for {
        p <- Gen.choose(0, 4)
        sz <- Gen.choose(1L, 500L)
      } yield (s"p$p", sz))
    } yield rows.zipWithIndex.map { case ((p, sz), i) => (p, i.toLong, sz) }
    val inv = invGen.sample.get
    val target = 800L
    val got = graft.operators.Layout
      .compactionPlan(inv.toDF("prefix", "key", "size"), target)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // conservation: every file lands in exactly one bin
    assert(got.map(_._4).sum == inv.map(_._3).sum, "bytes must be conserved")
    assert(got.map(_._3).sum == inv.size.toLong, "files must be conserved")
    // contiguity: within a prefix, bins' key ranges never interleave and
    // bin ids increase with the key ranges
    got.groupBy(_._1).foreach { case (p, bins) =>
      val ordered = bins.sortBy(_._2)
      ordered.sliding(2).foreach {
        case Array((_, b1, _, _, _, last1), (_, b2, _, _, first2, _)) =>
          assert(b1 < b2 && last1 < first2,
            s"$p: bins $b1/$b2 interleave ($last1 vs $first2)")
        case _ => ()
      }
      // a non-final bin is undersized only when an OVERSIZED file follows
      // it immediately (it pushed the exclusive cumsum past a boundary)
      val sizes = inv.filter(_._1 == p).sortBy(_._2).map(_._3)
      assert(ordered.map(_._4).sum == sizes.sum)
    }
  }

  test("hilbert key: bijection and unit-step adjacency at bits=4; rrf fusion list-order invariant") {
    import spark.implicits._
    // 16×16 grid: key must biject onto 0..255 with every consecutive pair
    // of curve positions grid-adjacent — the locality property at a depth
    // above the EngineSpec fixture
    val grid = (for { x <- 0 until 16; y <- 0 until 16 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val keyed = grid
      .withColumn("hkey", graft.operators.Layout.hilbertKey(col("x"), col("y"), 4))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1)))).sortBy(_._1)
    assert(keyed.map(_._1).toSeq == (0L until 256L))
    keyed.sliding(2).foreach { case Array((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1)
    }
    // RRF is a sum over lists — fusing [lex, sem] and [sem, lex] must be
    // row-identical
    val lex = Seq((0L, 1L, 1L), (0L, 2L, 2L), (1L, 5L, 1L)).toDF("query_id", "doc_id", "rank")
    val sem = Seq((0L, 2L, 1L), (0L, 3L, 2L), (1L, 6L, 1L)).toDF("query_id", "doc_id", "rank")
    def rows(dfs: Seq[org.apache.spark.sql.DataFrame]) =
      graft.operators.TextAnalysis.rrfFuse(dfs, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows(Seq(lex, sem)) == rows(Seq(sem, lex)))
  }

  test("radius join: blocked equals brute over random geometries, radii, and cells") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    // three geometry regimes: dense positive, sparse signed, clustered
    val regimes = Seq(
      (1 to 300).map(i => (i.toLong, rnd.nextInt(400).toLong, rnd.nextInt(400).toLong)),
      (1 to 200).map(i => (i.toLong, rnd.nextInt(2000).toLong - 1000L,
        rnd.nextInt(2000).toLong - 1000L)),
      (1 to 200).map(i => (i.toLong,
        (i % 4) * 500L + rnd.nextInt(30), (i % 4) * 500L + rnd.nextInt(30))))
    for ((pts, idx) <- regimes.zipWithIndex; (radius, cell) <- Seq((25L, 25L), (40L, 64L))) {
      val df = pts.toDF("id", "x", "y")
      val blocked = graft.operators.Joins.radiusJoinBlocked(df, radius, cell)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = pts.flatMap { case (i, xi, yi) =>
        pts.collect { case (j, xj, yj)
          if i < j && (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj) <= radius * radius =>
          (i, j)
        }
      }.toSet
      assert(blocked == brute,
        s"regime $idx r=$radius cell=$cell: ${blocked.size} vs ${brute.size}")
    }
  }

  test("cusum: last statistic is exactly zero and total is split-invariant") {
    import spark.implicits._
    // Σ(x − x̄) telescopes to 0 — scaled: n·cum_n − n·T ≡ 0 for ANY series
    val rnd = new scala.util.Random(5)
    val s = (1L to 50L).map(i => (i, rnd.nextInt(1000).toLong - 300L)).toDF("bucket", "v")
    val rows = graft.operators.Temporal.cusumChangepoints(s)
      .orderBy(col("bucket")).collect()
    assert(rows.last.getLong(2) == 0L, "CUSUM must telescope to zero")
    assert(rows.count(_.getBoolean(3)) == 1, "exactly one flagged changepoint")
    graft.operators.Dedup.uncacheAll()
  }

  test("t-closeness: the corpus as one group scores EMD exactly zero") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = (1 to 200).map(_ => ("all", rnd.nextInt(7).toLong)).toDF("g", "lvl")
    val r = graft.operators.Hygiene.tClosenessAudit(df, Seq("g"), "lvl", tPpm = 0)
      .collect()
    assert(r.length == 1 && r.head.getLong(2) == 0L, r.mkString(","))
    graft.operators.Dedup.uncacheAll()
  }

  test("scoreAuc equals the brute pairwise count on random scored labels") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // heavy ties on purpose: 12 distinct scores over 300 rows
    val rows = (1 to 300).map(_ => (rnd.nextInt(12).toLong * 7L,
      if (rnd.nextInt(3) == 0) 1L else 0L))
    val r = graft.operators.Hygiene.scoreAuc(rows.toDF("s", "y"), "s", "y").head
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    // brute 2U: every (pos, neg) pair contributes 2, 1 on ties, 0
    val u2 = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((pos.size.toLong, neg.size.toLong, u2)), r.toString)
    assert(r.getLong(3) ==
      (BigInt(1000000) * u2 / (2L * pos.size * neg.size)).toLong)
  }

  test("cusum by key: every key telescopes to zero and flags exactly once") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val s = (for (k <- 1 to 8; b <- 1L to 40L)
      yield (s"k$k", b, rnd.nextInt(1000).toLong - 300L))
      .toDF("key", "bucket", "v")
    val rows = graft.operators.Temporal.cusumChangepointsByKey(s).collect()
      .groupBy(_.getString(0))
    assert(rows.size == 8)
    rows.foreach { case (k, rs) =>
      val last = rs.maxBy(_.getLong(1))
      assert(last.getLong(3) == 0L, s"$k: per-key CUSUM must telescope to zero")
      assert(rs.count(_.getBoolean(4)) == 1, s"$k: exactly one flagged changepoint")
    }
  }

  test("radiusJoin2 equals brute force across random geometry regimes") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // mixed quadrants, coincident points, and a cluster tighter than one cell
    val pts = ((1 to 150).map(i => (i.toLong,
      rnd.nextInt(400).toLong - 200L, rnd.nextInt(400).toLong - 200L)) ++
      Seq((900L, -33L, -33L), (901L, -33L, -33L))).toDF("id", "x", "y")
    val sites = (1 to 30).map(i => (i.toLong,
      rnd.nextInt(400).toLong - 200L, rnd.nextInt(400).toLong - 200L))
      .toDF("id", "x", "y")
    for (radius <- Seq(0L, 7L, 40L)) {
      val cell = math.max(radius, 1L) * 2
      val blocked = graft.operators.Joins.radiusJoin2(pts, sites, radius, cell)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val brute = pts.select(col("id").as("point_id"), col("x").as("xa"), col("y").as("ya"))
        .crossJoin(sites.select(col("id").as("site_id"), col("x").as("xb"), col("y").as("yb")))
        .select(col("point_id"), col("site_id"),
          ((col("xa") - col("xb")) * (col("xa") - col("xb")) +
            (col("ya") - col("yb")) * (col("ya") - col("yb"))).as("dist2"))
        .filter(col("dist2") <= radius * radius)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(blocked == brute, s"radius=$radius: ${blocked.size} vs ${brute.size}")
    }
  }

  test("kaplanMeier: survival is non-increasing, starts below 1e6, ends at 0") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val ev = (1 to 120).map(i => (i.toLong, rnd.nextInt(15).toLong))
      .toDF("user_id", "day")
    val rows = graft.operators.Temporal.kaplanMeier(ev, "user_id", "day")
      .orderBy(col("day")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(rows.head._4 <= 1000000L)
    assert(rows.sliding(2).forall {
      case Array(a, b) => b._4 <= a._4; case _ => true
    }, "survival must be non-increasing")
    assert(rows.last._4 == 0L, "uncensored model: everyone eventually churns")
    // at-risk counts are the descending cumulative of events
    assert(rows.map(_._3).sum == 120L)
    assert(rows.head._2 == 120L)
  }

  test("association rules: lift identity and support symmetry on random baskets") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val bi = (1 to 400).map(_ => (rnd.nextInt(60).toLong, s"i${rnd.nextInt(8)}"))
      .toDF("basket", "item")
    val nB = bi.select(col("basket")).distinct().count()
    graft.operators.Assoc.pairRules(bi).collect().foreach { r =>
      val (np, na, nb2) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(np <= math.min(na, nb2), "pair count bounded by either item")
      assert(r.getLong(5) == np * 1000000L / nB, "support identity")
      assert(r.getLong(8) == np * nB * 1000000L / (na * nb2), "lift identity")
    }
    graft.operators.Dedup.uncacheAll()
  }

  test("spearman: symmetric, and exactly invariant under strictly monotone maps") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // tie-heavy on purpose: small codomains exercise the avg-rank fold
    val rows = (1 to 300).map(_ =>
      (rnd.nextInt(12).toLong, rnd.nextInt(40).toLong)).toDF("x", "y")
    def rho(df: org.apache.spark.sql.DataFrame): Any =
      graft.operators.Hygiene.spearmanCorr(df, "x", "y").collect().head.get(1)
    val base = rho(rows)
    // ranks are all that matter: an affine positive map changes nothing,
    // EXACTLY (integer rank algebra, not approximately)
    assert(rho(rows.select((col("x") * 7L + 3L).as("x"), col("y"))) == base)
    // symmetry: corr(x,y) = corr(y,x)
    assert(rho(rows.select(col("y").as("x"), col("x").as("y"))) == base)
    // bounded: |ρ| ≤ 1
    assert(math.abs(base.asInstanceOf[Double]) <= 1.0)
  }

  test("gini: scale-invariant, bounded, and 0 for constants on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vs = (1 to 500).map(_ => rnd.nextInt(100000).toLong.abs)
    def g(xs: Seq[Long]): Option[Long] = Option(graft.operators.Hygiene
      .giniIndex(xs.toDF("v"), "v").collect().head.get(2))
      .map(_.asInstanceOf[Long])
    val base = g(vs)
    // multiplying every unit by the same positive constant cancels in
    // the (2S − (n+1)T)/(nT) rational EXACTLY, floors included
    assert(g(vs.map(_ * 13L)) == base)
    assert(base.exists(x => x >= 0L && x < 1000000L))
    assert(g(Seq.fill(100)(42L)).contains(0L))
  }

  test("benford: digit masses partition the positive rows, ppm sums to ~1e6") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = (1 to 400).map(_ => BigDecimal(rnd.nextInt(2000000) - 500000) / 100)
      .toDF("v")
    val nPos = rows.filter(col("v") > 0).count()
    val out = graft.operators.Hygiene.benfordAudit(rows, "v").collect()
    assert(out.map(_.getLong(1)).sum == nPos, "every positive row lands in one digit")
    val obs = out.map(_.getLong(2)).sum
    assert(obs <= 1000000L && obs > 1000000L - 9L, s"floor-share total: $obs")
    assert(out.map(_.getLong(3)).sum == 1000000L)
  }

  test("cramers v matrix: v2 bounded in [0, 1e6] over random tables") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (1 to 500).map(_ => (s"a${rnd.nextInt(5)}", s"b${rnd.nextInt(4)}",
      s"c${rnd.nextInt(3)}")).toDF("x", "y", "z")
    graft.operators.Hygiene.cramersVMatrix(rows, Seq("x", "y", "z"))
      .collect().foreach { r =>
        val v2 = Option(r.get(6)).map(_.asInstanceOf[Long])
        assert(v2.forall(v => v >= 0L && v <= 1000000L), r.toString)
      }
  }

  test("acf: bounded by ±1e6 on random series; theil-sen exactly shift-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val series = (0 until 200).flatMap { i =>
      Seq((s"k${i % 5}", (i / 5).toLong, rnd.nextInt(1000).toLong))
    }
    // |r_ℓ| ≤ 1 is Cauchy–Schwarz on the truncated numerator — the
    // integer fold must respect it for every key and lag
    graft.operators.Temporal.acfByKey(series.toDF("key", "bucket", "v"),
      maxLag = 5).collect().foreach { r =>
      val a = Option(r.get(4)).map(_.asInstanceOf[Long])
      assert(a.forall(v => math.abs(v) <= 1000000L), r.toString)
    }
    // slopes depend only on differences: shifting every day index and
    // every value by constants changes NOTHING, exactly
    val day = 86400000000L
    val ev = (0 until 120).map { i =>
      (s"u${i % 4}", (i / 4).toLong * day + 17L, rnd.nextInt(500).toLong)
    }
    def ts(rows: Seq[(String, Long, Long)]) = graft.operators.Temporal
      .theilSenTrend(rows.toDF("user_id", "ts_us", "value"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), Option(r.get(3)), Option(r.get(4)))).toMap
    assert(ts(ev) == ts(ev.map { case (k, t, v) => (k, t + 3L * day, v + 250L) }))
  }

  test("cellsCumByKey equals the per-key window fold for any shard count") {
    import spark.implicits._
    val rnd = new scala.util.Random(14)
    // hot key "h" with many distinct values, 30 normal keys with heavy
    // ties, AND a NULL key wide enough to straddle shard boundaries —
    // groupBy/Window keep the NULL group, so the fold's internal joins
    // must be null-safe or the null stratum's offsets silently vanish
    val rows = (0 until 4000).map(_ => ("h", rnd.nextInt(3000).toLong)) ++
      (0 until 4000).map(_ => (s"k${rnd.nextInt(30)}", rnd.nextInt(40).toLong)) ++
      (0 until 3000).map(_ => (null.asInstanceOf[String], rnd.nextInt(2500).toLong))
    val kv = rows.toDF("k", "v")
    val expected = {
      val cells = kv.groupBy(col("k"), col("v")).agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("v"))
      cells.withColumn("cumc", sum(col("c")).over(w))
        .collect().map(r => (Option(r.getString(0)), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
    }
    // force the sharded machinery at fixture scale (the adaptive floor
    // would legitimately collapse every shard count to the single-window
    // fallback); shards = 1 still exercises the fallback plan
    val savedFloor = graft.operators.ShardedFold.minRowsPerShard
    graft.operators.ShardedFold.minRowsPerShard = 1L
    try {
      for (shards <- Seq(1, 7, 64, 512)) {
        val got = graft.operators.Hygiene.cellsCumByKey(kv, shards)
          .collect().map(r => (Option(r.getString(0)), r.getLong(1)) ->
            ((r.getLong(2), r.getLong(3)))).toMap
        assert(got == expected, s"shards=$shards: sharded keyed fold diverges")
      }
    } finally { graft.operators.ShardedFold.minRowsPerShard = savedFloor }
    // and the adaptive floor itself: default floor at fixture scale ≡
    // the same answers through the fallback dispatch
    val adaptive = graft.operators.Hygiene.cellsCumByKey(kv, 64)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(adaptive == expected, "adaptive fallback diverges")
  }

  test("shardedPrefix equals the global ordered window for any shard count") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // sparse unordered buckets, signed values
    val rows = rnd.shuffle((0 until 3000).map(i =>
      (i * 13L + (i % 7), rnd.nextInt(2001).toLong - 1000L)).toList)
    val s = rows.toDF("bucket", "v")
    val expected = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      s.withColumn("i", row_number().over(w).cast("long"))
        .withColumn("cum", sum(col("v")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    }
    val savedFloor = graft.operators.ShardedFold.minRowsPerShard
    graft.operators.ShardedFold.minRowsPerShard = 1L
    try {
      for (shards <- Seq(1, 16, 256)) {
        val got = graft.operators.Temporal.shardedPrefix(s, shards)
          .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
        assert(got == expected, s"shards=$shards: sharded prefix diverges")
      }
    } finally { graft.operators.ShardedFold.minRowsPerShard = savedFloor }
    val adaptive = graft.operators.Temporal.shardedPrefix(s, 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(adaptive == expected, "adaptive fallback diverges")
  }

  test("sums-only SIGNED sharded fold keeps negative spanning offsets") {
    import spark.implicits._
    // no idxCol: the offsets frame has no count column, so a spanning
    // group whose lower-shard mass is NEGATIVE must still emit its
    // offset row (a > 0 filter would drop it and shift the whole tail)
    val rows = (0 until 2000).map(i => (i.toLong, -5L)) ++
      (2000 until 4000).map(i => (i.toLong, 3L))
    val s = rows.toDF("bucket", "v")
    val expected = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      s.withColumn("cum", sum(col("v")).over(w))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    }
    val savedFloor = graft.operators.ShardedFold.minRowsPerShard
    graft.operators.ShardedFold.minRowsPerShard = 1L
    try {
      val got = graft.operators.ShardedFold.prefix(s,
          keyCols = Nil, orderCols = Seq("bucket"),
          sums = Seq("v" -> "cum"), idxCol = None, shards = 16)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == expected, "signed sums-only fold diverges")
    } finally { graft.operators.ShardedFold.minRowsPerShard = savedFloor }
  }

  test("sharded unkeyed segmentation equals the keyed-loop form on random series") {
    import spark.implicits._
    import graft.operators.Temporal
    val rnd = new scala.util.Random(7)
    // random walk with two planted level shifts
    var lvl = 0L
    val rows = (0L until 600L).map { b =>
      if (b == 200L) lvl += 4000L
      if (b == 430L) lvl -= 2500L
      (b, lvl + rnd.nextInt(200).toLong)
    }
    val s = rows.toDF("bucket", "v")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5)))).toMap
    val savedFloor = graft.operators.ShardedFold.minRowsPerShard
    for (depth <- 1 to 3; forceSharded <- Seq(true, false)) {
      // the keyed loop (old per-segment-window shape) on a constant key
      // IS the pre-r14 formulation of the unkeyed operator; run the
      // unkeyed operator BOTH forced-sharded and through its adaptive
      // fallback (fixture scale → the cusumSegLoop window plan)
      graft.operators.ShardedFold.minRowsPerShard =
        if (forceSharded) 1L else savedFloor
      try {
        val keyed = Temporal.cusumSegmentsByKey(
            s.withColumn("key", lit("only")), depth)
          .select(col("bucket"), col("v"), col("segment"), col("seg_n"),
            col("seg_sum"), col("is_boundary"), col("key"))
          .drop("key")
        val unkeyed = Temporal.cusumSegments(s, depth)
          .select(col("bucket"), col("v"), col("segment"), col("seg_n"),
            col("seg_sum"), col("is_boundary"))
        assert(key(unkeyed) == key(keyed),
          s"depth=$depth forceSharded=$forceSharded: sharded loop diverges")
      } finally { graft.operators.ShardedFold.minRowsPerShard = savedFloor }
    }
  }

  test("vocab growth: curves monotone and beta positive on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val docs = (1L to 80L).map { i =>
      val toks = (0 until 20).map(_ => s"w${rnd.nextInt(300)}")
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.vocabGrowth(docs)
      .orderBy("k_num").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.sliding(2).forall(p => p(0)._1 <= p(1)._1 && p(0)._2 <= p(1)._2))
    assert(out.last._1 == 80L * 20L)
    // a growing corpus with a bounded type pool: 0 < β < 1 strictly
    assert(out.head._3 > 0L && out.head._3 < 1000000L, out.head.toString)
  }
}
