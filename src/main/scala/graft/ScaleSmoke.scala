package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DiskUsageOp}

/** Scale smoke: replicates the sf0.1 fixtures (events ×50 → 5M rows,
  * documents ×10 → 50k docs with a per-replica marker token so replicas
  * stay near-dups rather than exact dups) into /tmp, then times the
  * flagship aggregate and the MinHash-LSH dedup at that scale. Manual
  * evidence that the chosen plans behave at 10-50× bench volume —
  * `sbt "runMain graft.ScaleSmoke"`; results recorded in PLANS.md.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("scale-smoke")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = "/root/testdata/sf0.1"
    val dir = "/tmp/graft_scale"

    if (!new java.io.File(s"$dir/events").exists()) {
      spark.read
        .schema("event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
        .parquet(s"$base/events.parquet")
        .withColumn("rep", explode(sequence(lit(0), lit(49))))
        .select(
          (col("event_id") * 50 + col("rep")).as("event_id"),
          (col("user_id") * 50 + col("rep") % 7).as("user_id"),
          col("event_type"), col("value"), col("props"))
        .write.mode("overwrite").parquet(s"$dir/events")
      spark.read.parquet(s"$base/documents.parquet")
        .withColumn("rep", explode(sequence(lit(0), lit(9))))
        .select(
          (col("doc_id") * 10 + col("rep")).as("doc_id"),
          concat(col("text"), lit(" marker"), col("rep")).as("text"),
          col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$dir/documents")
    }

    // SPARK_GRAFT_SMOKE_ONLY=<substring> runs only the sections whose label
    // contains it (fixture prep still runs). The full sweep is ~6 min and
    // single-shot ±2× host variance; re-measuring ONE section in a quiet
    // window shouldn't pay for the other twenty.
    val only = sys.env.get("SPARK_GRAFT_SMOKE_ONLY")
    def enabled(name: String): Boolean = only.forall(name.contains)
    def timed(name: String)(f: => Long): Unit = if (enabled(name)) {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale-smoke] $name%-28s rows=$n%-10d ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val events = spark.read.parquet(s"$dir/events")
    println(s"[scale-smoke] events rows = ${events.count()}")
    timed("du aggregate (5M rows)") {
      DiskUsageOp.aggregateFractional(
        events.select(concat_ws("/", col("user_id"), col("event_id")).as("key"),
          col("value").as("size"))).count()
    }
    timed("du salted (5M rows)") {
      DiskUsageOp.aggregateSalted(
        events.select(concat_ws("/", col("user_id"), col("event_id")).as("key"),
          (col("value") * 100).cast("long").as("size"))).count()
    }
    val docs = spark.read.parquet(s"$dir/documents")
    println(s"[scale-smoke] documents rows = ${docs.count()}")
    timed("minhash LSH pairs (50k docs)") {
      Dedup.minhashLshPairs(docs, tau = 0.6).count()
    }
    Dedup.uncacheAll()
    // connected components: force the DISTRIBUTED fixpoint (these smokes
    // witness the hook+jump loop's scale shape — the r15 small-graph
    // union-find cutover would otherwise absorb both fixture graphs)
    val savedLocalMax = Dedup.localMaxEdges
    Dedup.localMaxEdges = 0L
    // over the 250k-pair near-dup graph: replica cliques have diameter 1,
    // so label propagation converges in 2 rounds
    timed("components over LSH pairs (50k)") {
      Dedup.components(Dedup.minhashLshPairs(docs, tau = 0.6)).count()
    }
    Dedup.uncacheAll()
    // chain-shaped dup graph: 1000 planted 50-link chains over 50k nodes
    // (diameter 49) — the adversarial shape where hook-only label
    // propagation needs 49 rounds (and previously exceeded the 25-round
    // budget outright); pointer jumping converges it in ~7 rounds at one
    // extra keyed self-join per round
    timed("components 1000 x 50-link chains (50k)") {
      val chain = spark.range(0, 50000)
        .filter(col("id") % 50 =!= 49)
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      Dedup.components(chain).count()
    }
    Dedup.localMaxEdges = savedLocalMax
    Dedup.uncacheAll()
    // decontamination: 45k-doc training slice vs 5k-doc eval slice — the
    // two-sided index join is Σ df_train·df_eval, linear in the training
    // corpus for a fixed eval set
    timed("contamination 45k train x 5k eval") {
      Dedup.contaminationPairs(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0), minShared = 5L).count()
    }
    Dedup.uncacheAll()
    // the Bloom-prefiltered form on the SAME slices: this replica corpus is
    // the adversarial ALL-OVERLAP case (nearly every training shingle IS in
    // the eval set), so the filter drops almost nothing and its build +
    // per-shingle probe cost is pure overhead — the honest negative control
    timed("contamination bloom, all-overlap") {
      Dedup.contaminationPairsBloom(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0), minShared = 5L).count()
    }
    Dedup.uncacheAll()
    // the operator's WIN CONDITION — low overlap, the real decontamination
    // regime (web corpus vs a small benchmark suite): 5k eval docs of
    // synthetic tokens disjoint from the corpus, plus 45 genuinely
    // contaminated train texts planted in. The bloom drops ~99% of
    // training shingles BEFORE any join; the exact form shuffles them all.
    val evalLow = spark.range(0, 5000)
      .select(col("id").as("doc_id"),
        expr("array_join(transform(sequence(0, 39), i -> concat('ev', id, 'x', i)), ' ')")
          .as("text"))
      .unionAll(docs.filter(col("doc_id") % 1000 === 7)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    timed("contamination exact, low-overlap") {
      Dedup.contaminationPairs(docs, evalLow, minShared = 5L).count()
    }
    Dedup.uncacheAll()
    timed("contamination bloom, low-overlap") {
      Dedup.contaminationPairsBloom(docs, evalLow, minShared = 5L).count()
    }
    Dedup.uncacheAll()
    timed("simhash pairs, collapse (50k docs)") {
      Dedup.simhashPairs(docs, tau = 0.6).count()
    }
    Dedup.uncacheAll()
    // the marker-token corpus is 100% distinct texts — the regime where the
    // dup-collapse rewrite is pure overhead; the direct form is the right
    // pick here and the delta IS the cost of dup-safety
    timed("simhash pairs, direct (50k docs)") {
      Dedup.simhashPairs(docs, tau = 0.6, collapseExactDups = false).count()
    }
    Dedup.uncacheAll()
    // dup-heavy corpus: 5k distinct texts × 10 EXACT copies — the SimHash
    // skew case (identical fingerprints pile into the same 28 pair-keys).
    // The collapse-first rewrite runs candidates once per distinct text.
    val dupHeavy = spark.read.parquet(s"$base/documents.parquet")
      .withColumn("rep", explode(sequence(lit(0), lit(9))))
      .select((col("doc_id") * 10 + col("rep")).as("doc_id"), col("text"), col("lang"))
    timed("simhash pairs, dup-heavy (50k docs)") {
      Dedup.simhashPairs(dupHeavy, tau = 0.6).count()
    }
    Dedup.uncacheAll()
    // planted viral shingle: boilerplate 3-grams shared by EVERY doc — the
    // exact join's O(df²) bomb (50k docs → >1B join rows from those keys,
    // and the tail shingles around the marker token go viral too).
    // df-pruning drops them before the join; the unpruned form is only run
    // on a 1k subset (~1.5M pair rows) to keep the smoke finite — already
    // there the quadratic shape dwarfs the pruned 50k run.
    val planted = docs.select(col("doc_id"),
      concat(col("text"), lit(" xviral yviral zviral")).as("text"))
    // cap 50: organic shingles (df ≈ 10-30 after ×10 replication) survive,
    // the planted boilerplate (df = 50k) and marker-tail shingles
    // (df = 5k) die BEFORE the join. A 1000 cap demonstrably does NOT
    // bound this corpus — its template-generated texts put many shingles
    // in the df 100-1000 band, and Σ df² with df ~ 10³ spins for hours.
    // The cap is the operator's scale contract: it must be sized to the
    // corpus's shingle-frequency distribution, not "big enough to ignore".
    timed("exact jaccard, viral, df<=50 (50k)") {
      Dedup.ngramJaccardPairs(planted, tau = 0.6, maxDf = Some(50L)).count()
    }
    Dedup.uncacheAll()
    timed("exact jaccard, viral, unpruned (1k)") {
      Dedup.ngramJaccardPairs(planted.filter(col("doc_id") % 50 === 0), tau = 0.6).count()
    }
    Dedup.uncacheAll()
    // gram-novelty skew A/B on the same viral corpus: every doc carries the
    // planted boilerplate shingles (df = 50k) plus marker-tail shingles
    // (df = 5k). The shipped form's df aggregation combines MAP-SIDE, so
    // each hot shingle collapses to one row per task before its exchange;
    // the rejected count-over-window form lands all 50k occurrences of
    // each viral shingle in ONE window partition (no partial aggregation,
    // and AQE skew-splitting applies to joins, not windows).
    timed("gram novelty agg+join, viral (50k)") {
      graft.operators.TextAnalysis.gramNovelty(planted).count()
    }
    timed("gram novelty window, viral (50k)") {
      import org.apache.spark.sql.expressions.Window
      graft.operators.TextAnalysis.shingles(planted, "doc_id", "text", 3)
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("df") >= 2, lit(1L)).otherwise(lit(0L))).as("n_shared"))
        .count()
    }
    // the contested STAGE in isolation: 2M docs each carrying one
    // corpus-wide shingle (df = 2M — a third of all exploded rows on ONE
    // key), one mid-df shingle, and one unique; the exploded input is
    // cached so both
    // forms pay identical upstream cost. The window must move all 500k
    // occurrences of the hot key into one task's sort; the agg form
    // collapses them map-side to one row per task before the exchange.
    locally {
      import org.apache.spark.sql.expressions.Window
      val skewDocs = spark.range(2000000).select(col("id").as("doc_id"),
        concat(lit("xviral yviral zviral w"), col("id") % 1000, lit(" u"), col("id"))
          .as("text"))
      val sk = graft.operators.TextAnalysis
        .shingles(skewDocs, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      if (enabled("novelty df stage")) sk.count()
      timed("novelty df stage, window (6M, hot 2M)") {
        sk.withColumn("df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("df") >= 2, lit(1L)).otherwise(lit(0L))).as("n_shared"))
          .count()
      }
      timed("novelty df stage, agg (6M, hot 2M)") {
        sk.groupBy(col("shingle"))
          .agg(count(lit(1)).as("df"), min(col("doc_id")).as("only_doc"))
          .filter(col("df") === 1)
          .groupBy(col("only_doc")).agg(count(lit(1)).as("n_unique"))
          .count()
      }
      sk.unpersist(blocking = false)
    }
    // custom TopKPerKey vs the window form on the same 5M-row input
    timed("top-3/user via window (5M)") {
      import org.apache.spark.sql.expressions.Window
      events.withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("value").desc, col("event_id"))))
        .filter(col("rn") <= 3).count()
    }
    timed("top-3/user via TopKPerKey (5M)") {
      graft.plans.TopK.perKey(events, Seq("user_id"),
        Seq("value" -> false, "event_id" -> true), k = 3).count()
    }
    // ultra-high-cardinality keys (2M distinct) with a deliberately small
    // spill threshold: every task writes sorted runs and merges them —
    // the path that previously OOM'd instead of degrading to disk
    timed("top-3/2M-keys spill-forced (5M)") {
      graft.plans.TopK.perKey(
        events.withColumn("hk", col("event_id") % 2000000L),
        Seq("hk"), Seq("value" -> false, "event_id" -> true), k = 3,
        spillThresholdRows = 50000).count()
    }
    // banded embedding LSH at 10× volume: replicas are EXACT vector copies,
    // so each source vector becomes a 10-clique of cosine-1.0 near-dups —
    // the dup-heavy ANN regime (hot buckets) plus organic neighbors
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
      .withColumn("rep", explode(sequence(lit(0), lit(9))))
      .select((col("vec_id") * 10 + col("rep")).as("vec_id"), col("embedding"))
    println(s"[scale-smoke] embeddings rows = ${emb.count()}")
    // 16 DISTINCT source vectors as hyperplanes (replicas are exact copies,
    // so vec_id<16 would yield near-duplicate planes — i.e. one effective
    // sign bit and near-quadratic candidates), 2 bands × 8 bits: expected
    // random-collision rate ≈ 2/256, so candidates stay ~1% of all-pairs
    // while every replica clique still collides in both bands
    val planes = graft.operators.Similarity
      .prepared(
        emb.filter(col("vec_id") % 10 === 0 && col("vec_id") < 160), "vec_id", "embedding")
      .select((col("id") / 10).cast("int").as("plane_id"), col("v").as("pv"))
    timed("banded near-dup pairs tau=.97 (20k vecs)") {
      graft.operators.Similarity.nearDupPairsBanded(emb, planes, bands = 2, tau = 0.97).count()
    }
    timed("banded ANN top-5, 200 queries (20k vecs)") {
      graft.operators.Similarity.lshTopKBanded(
        emb, emb.filter(col("vec_id") % 100 === 0), planes, bands = 2, k = 5).count()
    }
    // IVF assignment at 64 cells — the round-5 zero-exchange rewrite: the
    // top-nprobe fold over the broadcast centroid matrix is a narrow map,
    // so wall time must scale ~linearly in the corpus (2k → 20k ≈ 10×,
    // modulo fixed job overhead). The replaced windowed form shuffled
    // corpus × 64 rows carrying full vectors here.
    val cents64 = graft.operators.Similarity
      .prepared(
        emb.filter(col("vec_id") % 10 === 0 && col("vec_id") < 640), "vec_id", "embedding")
      .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    val prepped = graft.operators.Similarity.prepared(emb, "vec_id", "embedding")
    timed("ivf assign 64 cells (2k vecs)") {
      graft.operators.Similarity
        .assignCells(prepped.filter(col("id") % 10 === 0), cents64, nprobe = 2).count()
    }
    timed("ivf assign 64 cells (20k vecs)") {
      graft.operators.Similarity.assignCells(prepped, cents64, nprobe = 2).count()
    }
    // Lloyd's training at 64 cells × 20k vectors: per round, one narrow
    // re-assignment + one (cell, dim) mean aggregation — the aggregation
    // IS the algorithm's only exchange
    timed("ivf train k=64 iters=2 (20k)") {
      graft.operators.Similarity.trainCentroids(emb, k = 64, iters = 2).count()
    }
    // nprobe tuning surface at 64 cells × 20k corpus × 200 queries: the
    // shared-scoring sweep pays the probe join + exact scoring ONCE at
    // maxNprobe=4 and the brute baseline once; the naive per-point loop —
    // what a deployment without the operator actually runs — re-executes
    // the probe join, the scoring, AND the brute baseline per point. The
    // gap widens with sweep depth (the saved cost is ~(points-1) serving
    // passes + (points-1) brute passes).
    // binary-quantization shortlist at 20k vectors × 200 queries: the
    // Hamming stage compares 16-byte codes (integer xor+popcount) where
    // the float brute force folds 64-dim double dots — the memory-tier
    // trade as wall time; both end in identical exact top-5 semantics
    // only when rerank covers the corpus (spec-pinned), here rerank=50
    val binQ = emb.filter(col("vec_id") % 100 === 0)
    timed("binary hamming top-5 (20k)") {
      graft.operators.Similarity.binaryHammingTopK(emb, binQ, k = 5, rerank = 50).count()
    }
    timed("float brute top-5 (20k)") {
      graft.operators.Similarity.bruteForceTopK(emb, binQ, k = 5).count()
    }
    val sweepQ = emb.filter(col("vec_id") % 100 === 0)
    timed("nprobe sweep 1..4, shared scoring") {
      graft.operators.Similarity
        .nprobeSweep(emb, sweepQ, cents64, k = 5, maxNprobe = 4).count()
    }
    timed("nprobe sweep 1..4, per-point loop") {
      (1 to 4).map { np =>
        graft.operators.Similarity.recallAt(
          graft.operators.Similarity.ivfTopK(emb, sweepQ, cents64, k = 5, nprobe = np),
          graft.operators.Similarity.bruteForceTopK(emb, sweepQ, k = 5)).count()
      }.sum
    }
    // sequence packing, ONE stratum × 30M docs — the adversarial shape for
    // the per-stratum window (a single task sorts and cumsums everything;
    // at 100 TB that task is "all of English"). The sharded form runs 32
    // parallel (stratum, shard) windows plus a 32-row offset aggregate —
    // same per-batch budget contract, wall time bounded by a shard. (At
    // ~2M rows the single-task sort is ~1 s and the sharded form's extra
    // aggregate only shows overhead — the win needs the sort to dominate,
    // which is precisely the 100 TB regime this row stands in for.)
    val packDocs = spark.range(0, 30000000L)
      .select(col("id"), lit("en").as("lang"), (lit(10L) + col("id") % 50L).as("n_tok"))
    timed("pack 30M docs, 1 stratum, window") {
      graft.operators.Splits.packBatches(packDocs, "lang", "id", "n_tok", budget = 2048L)
        .groupBy(col("batch_id")).count().count()
    }
    timed("pack 30M docs, 32 shards") {
      graft.operators.Splits
        .packBatchesSharded(packDocs, "lang", "id", "n_tok", budget = 2048L, shards = 32)
        .groupBy(col("batch_id")).count().count()
    }
    // CMS vs exact counting at HIGH DISTINCT CARDINALITY (the sketch's win
    // regime): 20M tokens, all distinct — the exact count's hash-agg state
    // and shuffle are 20M keys; the CMS collapses every task to <= d·w
    // partials before the exchange (here 3×1024), so its cost is the scan
    val cmsDocs = spark.range(0, 2000000L).select(
      col("id").as("doc_id"),
      expr("array_join(transform(sequence(0, 9), j -> concat('tok', id * 10 + j)), ' ')")
        .as("text"))
    timed("exact token count 20M distinct") {
      cmsDocs.select(explode(split(lower(col("text")), " ")).as("t"))
        .groupBy(col("t")).count().count()
    }
    timed("cms sketch 20M distinct (3x1024)") {
      graft.operators.TextAnalysis.cmsTokenEstimates(
        cmsDocs,
        spark.createDataFrame(Seq(Tuple1("tok7"), Tuple1("tok42"), Tuple1("absent")))
          .toDF("token"),
        width = 1024, depth = 3).count()
    }
    // heavy hitters on the same unique-heavy regime (round 11): one
    // planted token at ~9% of 22M tokens among 20M singletons. The exact
    // plan shuffles a 20M-key aggregation to answer a <= s-row question;
    // the two-pass MG holds s counters per task and shuffles only the
    // candidate recount. Both timed; PLANS.md records where the constants
    // land locally vs what bounds at 100 TB.
    val mgDocs = spark.range(0, 2000000L).select(
      col("id").as("doc_id"),
      expr("concat('common ', array_join(transform(sequence(0, 9), j -> concat('tok', id * 10 + j)), ' '))")
        .as("text"))
    timed("heavy hitters 22M toks: exact agg") {
      val tok = mgDocs.select(explode(split(lower(col("text")), " ")).as("token"))
      val tot = tok.agg(count(lit(1)).as("n_total"))
      tok.groupBy(col("token")).agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .filter(col("n") * 40 >= col("n_total")).count()
    }
    timed("heavy hitters 22M toks: 2-pass MG") {
      graft.operators.TextAnalysis.heavyHitters(mgDocs, s = 40).count()
    }
    // interval-join flash crowd: 1M cold events spread 20/bin over 50k
    // bins, plus ONE bin holding 150k events at a single microsecond (the
    // duplicate-timestamp burst shape — equal-ts pairs are excluded by the
    // operator, so OUTPUT stays bounded while the join INPUT is violently
    // skewed: that bin's hash partition carries ~13% of the whole stream
    // and ~2×10¹⁰ probe×build pairs enumerated inside one sort-merge
    // group). The binned rewrite is a plain shuffle equi-join, which is
    // exactly what lets AQE's skew-join split chop the hot partition
    // across tasks — the A/B below is the evidence for the range-join doc
    // comment's claim. Two traps make a naive version of this smoke
    // silently measure nothing, both worth recording because they apply
    // to any skew experiment:
    //  1. At smoke scale the pruned build side fits under the broadcast
    //     threshold, so AQE re-plans BOTH legs as BroadcastHashJoin and
    //     the skew config is irrelevant. At 100 TB neither side
    //     broadcasts — so the smoke forces the shuffle path to measure
    //     the regime the claim is about.
    //  2. Skew detection is BYTE-based (map output sizes). A `count()`
    //     prunes every varying column, the hot partition's constant
    //     (bin, ts) rows compress to almost nothing, and the 13%-of-rows
    //     partition looks tiny — the consumer must keep a varying column
    //     (here the eid payload) flowing through the shuffle for the
    //     skew to be visible in bytes, exactly as a real pipeline would.
    // Thresholds are lowered because the smoke's hot partition is
    // megabytes, not the 256 MB production default.
    val w = 1000000L
    val coldEv = spark.range(0, 1000000L).select(
      ((col("id") % 50000L) * w + (col("id") * 37L) % w).as("ts_us"),
      col("id").as("eid"))
    val hotEv = spark.range(0, 150000L).select(
      lit(60000L * w + 123L).as("ts_us"), (col("id") + 10000000L).as("eid"))
    val skewed = coldEv.unionAll(hotEv)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // ccnet bucket stage A/B (round 9): per-language quantile bucketing
    // over 8M pre-scored docs with a REALISTIC language skew (a web corpus
    // is ~90% head language: en 90%, three tails) — the shipped
    // threshold-broadcast path (approx_percentile agg + broadcast join +
    // row-local compare) vs the per-language ntile window. The window's
    // structural problem: each language's FULL history sorts inside one
    // task chain, so effective parallelism = #languages and the head
    // language's partition = 90% of the corpus in ONE task (at 100 TB
    // that partition is tens of TB — not slow, impossible). The smoke
    // uses the production accuracy regime (1e4 ⇒ rank error ≤ n/1e4 =
    // 0.01%, buffer bounded), not the registry row's rank-exact 1e6 —
    // exactness there exists for the DuckDB oracle, not for scale.
    // Scores are synthetic: the A/B isolates the bucketing stage, which
    // is where the design choice lives.
    val scored = spark.range(0, 8000000L).select(
      col("id").as("doc_id"),
      when(col("id") % 10 < 7, lit("en"))
        .when(col("id") % 10 === 7, lit("de"))
        .when(col("id") % 10 === 8, lit("fr"))
        .otherwise(lit("es")).as("lang"),
      ((col("id") * 2654435761L) % 1000003L).cast("double").as("score"))
    timed("ccnet 8M skewed: threshold") {
      val th = scored.groupBy(col("lang")).agg(
        percentile_approx(col("score"), lit(1.0 / 3), lit(10000)).as("t_low"),
        percentile_approx(col("score"), lit(2.0 / 3), lit(10000)).as("t_high"))
      scored.join(broadcast(th), Seq("lang"))
        .select(
          when(col("score") > col("t_high"), "head")
            .when(col("score") > col("t_low"), "middle")
            .otherwise("tail").as("bucket"))
        .groupBy(col("bucket")).count().count()
    }
    timed("ccnet 8M skewed: ntile window") {
      import org.apache.spark.sql.expressions.Window
      scored
        .withColumn("nt", ntile(3).over(
          Window.partitionBy(col("lang")).orderBy(col("score"), col("doc_id"))))
        .groupBy(col("nt")).count().count()
    }
    // per-stratum k-sample A/B (round 10) on the SAME 8M skewed corpus
    // (en = 70%): the shipped two-level TopKPerKey merge (hot stratum
    // split 32 ways into bounded heaps, then a tiny second-level merge)
    // vs the per-stratum row_number window, whose head-language partition
    // sorts 5.6M rows in ONE task (at 100 TB: tens of TB, unsplittable).
    timed("sample-k 8M skewed: 2-level topk") {
      graft.operators.Splits
        .samplePerStratum(scored, "doc_id", "lang", k = 1000, shards = 32)
        .count()
    }
    // round-10 row-local passes at volume: the int8 audit's coding pass
    // (after the dims-bounded scale decision) and the entropy screen over
    // the replica corpus — both must stay near scan throughput
    timed("int8 quantize audit (replica emb)") {
      graft.operators.Similarity.int8Quantize(emb).count()
    }
    timed("entropy screen (50k docs)") {
      graft.operators.TextAnalysis.entropyStats(docs).count()
    }
    timed("sample-k 8M skewed: window") {
      import org.apache.spark.sql.expressions.Window
      scored
        .withColumn("sample_key", md5(concat_ws(":", col("doc_id"), lit(12345L))))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("sample_key"), col("doc_id"))))
        .filter(col("rn") <= 1000).count()
    }
    //  3. (round-12 lesson) Skew is relative to the MEDIAN partition, so
    //     the A/B only measures something when partitions ≫ bins-per-
    //     partition — at shuffle.partitions = 8 the hot bin lands in a
    //     partition already carrying ~6k cold bins and reads ~2× median
    //     bytes, under the detection factor, and NEITHER leg splits (the
    //     r12 sweep caught exactly this). Production is always in the
    //     many-partitions regime (thousands of partitions, one hot bin),
    //     so the section pins partitions = 64 and restores after.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    if (enabled("interval join hot bin"))
      spark.conf.set("spark.sql.shuffle.partitions", "64")
    for (skew <- Seq("false", "true") if enabled("interval join hot bin")) {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew)
      val agg = graft.operators.Temporal.pairsWithin(skewed, "ts_us", w, Seq("eid"))
        .agg(sum(col("a_eid") + col("b_eid")))
      val t0 = System.nanoTime()
      val checksum = agg.collect().head.get(0)
      val split = agg.queryExecution.executedPlan.toString.toLowerCase.contains("skew")
      println(f"[scale-smoke] interval join hot bin, skew split $skew%-5s " +
        f"checksum=$checksum split-fired=$split ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    // round-11 additions: the windowed temporal pair (one exchange + one
    // sort each) and the buffer-free median A/B'd against percentile
    val ev5 = spark.read.parquet(s"$dir/events")
      .withColumn("ts_us", col("event_id"))
    timed("scd2 history (5M events)") {
      graft.operators.Temporal.scd2History(ev5).count()
    }
    timed("event transitions (5M)") {
      graft.operators.Temporal.eventTransitions(ev5).count()
    }
    if (enabled("median 2pass vs percentile")) {
      val t0 = System.nanoTime()
      val m2 = graft.operators.Hygiene.median2Pass(ev5, "value")
        .collect().head.getLong(1)
      val t1 = System.nanoTime()
      val p = ev5.agg(
        (expr("percentile(CAST(round(value * 1000000, 0) AS BIGINT), 0.5)") * 2)
          .cast("long")).collect().head.getLong(0)
      val t2 = System.nanoTime()
      println(f"[scale-smoke] median 2pass vs percentile (5M): equal=${m2 == p} " +
        f"2pass=${(t1 - t0) / 1e9}%.1f s percentile=${(t2 - t1) / 1e9}%.1f s")
    }
    // round-12: grouped Hampel screen with ONE HOT GROUP — 5M events
    // remapped to 6 groups where one holds ~2.6M rows (the per-domain
    // web-scale shape). The exact form buffers that group's 2.6M values
    // inside a single percentile aggregation state ON ONE TASK (twice —
    // values then deviations); the scalable form's biggest single-task
    // structure is a ≤4096-row histogram partition regardless of group
    // size. Equality is asserted, not assumed.
    if (enabled("mad hot-group")) {
      val hot = ev5.select(
        when(col("event_id") % 2 === 0, "hot")
          .otherwise(concat(lit("g"), col("event_id") % 5)).as("grp"),
        col("value"))
      def key(r: org.apache.spark.sql.Row) = r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val t0 = System.nanoTime()
      val exact = graft.operators.Hygiene.madOutliers(hot, "grp", "value")
        .collect().map(key).toMap
      val t1 = System.nanoTime()
      val scal = graft.operators.Hygiene
        .madOutliersScalable(hot, "grp", "value")
        .collect().map(key).toMap
      val t2 = System.nanoTime()
      println(f"[scale-smoke] mad hot-group (5M, hot 2.6M): equal=${exact == scal} " +
        f"exact=${(t1 - t0) / 1e9}%.1f s scalable=${(t2 - t1) / 1e9}%.1f s")
    }
    // round-12: all-pairs dimension cross-moments, 500k rows × 32 dims —
    // GramMatrixAgg folds each row into one 561-long task buffer (the
    // exchange carries one buffer per task); the compositional form
    // explodes each row into 528 pair rows BEFORE aggregating (264M rows
    // through the agg — the shape that multiplies a 100 TB corpus ~2000×
    // at d=64). Equality of every cell is asserted, not assumed.
    if (enabled("dim covariance gram")) {
      val d = 32
      val base = spark.range(500000).select(
        transform(sequence(lit(1), lit(d)),
          j => pmod(xxhash64(col("id") * lit(37) + j), lit(2000001L)) - lit(1000000L))
          .as("v6"))
      val t0 = System.nanoTime()
      val gram = base.select(concat(col("v6"), array(lit(1L))).as("v6"))
        .agg(graft.functions.GramMatrix(col("v6"), d + 1)).head.getSeq[Long](0)
      val t1 = System.nanoTime()
      val exploded = base
        .select(col("v6"), posexplode(col("v6")).as(Seq("i", "x")))
        .select(col("i"), col("x"), posexplode(col("v6")).as(Seq("j", "y")))
        .filter(col("i") <= col("j"))
        .groupBy("i", "j").agg(sum(col("x") * col("y")).as("s"))
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
      val t2 = System.nanoTime()
      val equal = (0 until d).forall(i => (i until d).forall(j =>
        gram(graft.functions.GramMatrix.flatIndex(i, j, d + 1)) == exploded((i, j))))
      println(f"[scale-smoke] dim covariance gram (500k x 32): equal=$equal " +
        f"gram=${(t1 - t0) / 1e9}%.1f s explode=${(t2 - t1) / 1e9}%.1f s")
    }

    // daily-dedup economics: probing a 45k-doc persisted index with a 5k
    // delta vs re-running the full batch pairs over all 50k — the delta
    // path must win by roughly corpus/delta on the shingle+sign stages
    // (identical output on the cross pairs is spec-pinned; this prices it)
    if (enabled("dedup index probe")) {
      val docs = spark.read.parquet(s"$dir/documents")
      val base = docs.filter(col("doc_id") % 10 =!= 0)
      val delta = docs.filter(col("doc_id") % 10 === 0)
      val idxDir = s"$dir/dedup_index"
      graft.sources.DedupIndex.build(base, idxDir)
      graft.operators.Dedup.uncacheAll()
      val t0 = System.nanoTime()
      val idx = graft.sources.DedupIndex.load(spark, idxDir)
      val nProbe = graft.sources.DedupIndex.probe(idx, delta).count()
      val t1 = System.nanoTime()
      graft.operators.Dedup.uncacheAll()
      val nFull = graft.operators.Dedup.minhashLshPairs(docs)
        .filter((col("doc_a") % 10 === 0) =!= (col("doc_b") % 10 === 0)).count()
      val t2 = System.nanoTime()
      graft.operators.Dedup.uncacheAll()
      println(f"[scale-smoke] dedup index probe (45k+5k): cross=$nProbe full=$nFull " +
        f"equal=${nProbe == nFull} probe=${(t1 - t0) / 1e9}%.1f s recompute=${(t2 - t1) / 1e9}%.1f s")
    }

    // compaction planning at lake shape: 10M files over 5k prefixes
    // (2k files/prefix — directory fan-out, not corpus scale, bounds the
    // per-prefix window sort). One prefix exchange + window + agg; the
    // bin count must land at ⌈Σsize/target⌉-ish, never at file count.
    if (enabled("compaction plan")) {
      timed("compaction plan (10M files)") {
        val inv = spark.range(10000000L).select(
          (col("id") % 5000L).cast("string").as("prefix"),
          col("id").as("key"),
          (pmod(xxhash64(col("id")), lit(200000L)) + 1L).as("size"))
        graft.operators.Layout.compactionPlan(inv, targetBytes = 128L * 1024 * 1024)
          .count()
      }
    }
    // spatial radius join at point-cloud scale: 2M points over a 1M×1M
    // grid, cell 1024 → ~1M cells at ~2 points each — candidate volume
    // rides density (Σ 9·|cell|²), never N²; blocked ≡ brute is
    // property-pinned at test scale, this section prices the plan
    if (enabled("radius join")) {
      timed("radius join (2M pts)") {
        val pts = spark.range(2000000L).select(
          col("id"),
          pmod(xxhash64(col("id")), lit(1000000L)).as("x"),
          pmod(xxhash64(col("id") + 7L), lit(1000000L)).as("y"))
        graft.operators.Joins.radiusJoinBlocked(pts, radius = 512, cell = 1024)
          .count()
      }
    }

    // score calibration on a HOT source: 5M rows, 98% in one source —
    // the rank form sorts the hot source's 4.9M rows in one partition
    // chain; the histogram form never ranks rows (bounded bins only).
    // This is the measured basis for quantileNormalizeHist's contract.
    if (enabled("calibrate")) {
      val scored = spark.range(5000000L).select(
        col("id").as("doc_id"),
        when(col("id") % 50L === 0L, lit("rare")).otherwise(lit("hot")).as("source"),
        pmod(xxhash64(col("id")), lit(100000L)).as("score"))
      timed("calibrate rank (5M, hot src)") {
        graft.operators.Hygiene.quantileNormalize(
          scored, "source", "score", Seq("doc_id")).count()
      }
      timed("calibrate hist (5M, hot src)") {
        val n = graft.operators.Hygiene.quantileNormalizeHist(
          scored, "source", "score", Seq("doc_id")).count()
        graft.operators.Dedup.uncacheAll()
        n
      }
    }

    // round-13 additions priced at scale:
    // (a) cross-frame radius join — 2M points × 100k sites, same grid
    //     discipline: candidate volume Σ 9·|cellP|·|cellS| rides density
    //     of BOTH clouds, and the small site side is the natural build
    //     side of the cell join;
    // (b) per-key CUSUM over 200k keys × 100 buckets (20M rows): ONE
    //     (key)-partitioned exchange carries totals + prefix + argmax —
    //     the claim the operator's scaladoc makes, priced;
    // (c) per-key depth-2 segmentation over the same frame (each level
    //     one (key, seg) exchange);
    // (d) exact Mann–Whitney AUC over 20M rows with a full 10⁶-value
    //     score codomain — the window runs over the DISTINCT-score
    //     frame, never the corpus.
    if (enabled("r13")) {
      timed("r13 radius join 2M x 100k") {
        val pts = spark.range(2000000L).select(
          col("id"),
          pmod(xxhash64(col("id")), lit(1000000L)).as("x"),
          pmod(xxhash64(col("id") + 7L), lit(1000000L)).as("y"))
        val sites = spark.range(100000L).select(
          col("id"),
          pmod(xxhash64(col("id") + 13L), lit(1000000L)).as("x"),
          pmod(xxhash64(col("id") + 29L), lit(1000000L)).as("y"))
        graft.operators.Joins.radiusJoin2(pts, sites, radius = 512, cell = 1024)
          .count()
      }
      val keyed = spark.range(20000000L).select(
        (col("id") % 200000L).as("key"),
        (col("id") / 200000L).as("bucket"),
        (pmod(xxhash64(col("id")), lit(1000L)) +
          when(col("id") / 200000L >= 50L, 5000L).otherwise(0L)).as("v"))
      // filter on the computed flag so Catalyst cannot prune the window
      // chain out of a bare count (a cardinality-only read would)
      timed("r13 cusum by key 200k x 100") {
        graft.operators.Temporal.cusumChangepointsByKey(keyed)
          .filter(col("is_changepoint")).count()
      }
      timed("r13 segments by key depth 2") {
        graft.operators.Temporal.cusumSegmentsByKey(keyed, depth = 2)
          .filter(col("is_boundary")).count()
      }
      timed("r13 auc 20M rows 1e6 scores") {
        val sc = spark.range(20000000L).select(
          pmod(xxhash64(col("id")), lit(1000001L)).as("s"),
          (col("id") % 3L === 0L).cast("long").as("y"))
        graft.operators.Hygiene.scoreAuc(sc, "s", "y")
          .select(col("auc_ppm")).collect().head.getLong(0)
      }
    }

    // Round-13 extras: the audit/statistics family at 5–20M rows. Every
    // shape is either a map-side-combined agg onto a bounded frame
    // (benford: 9 digits; cramérs: NDV-product cells), an explode whose
    // shuffle is replica-bounded (bootstrap: partitions×B partial rows),
    // or a rank fold whose ordered window runs on the DISTINCT-value
    // frame — spearman/gini price that contract honestly at 10⁶/5·10⁶
    // distinct values (single-task sort of the bounded frame, never the
    // corpus). Consumers filter ON computed columns (the r13 lesson:
    // a bare count lets Catalyst prune the chain).
    if (enabled("r13x")) {
      timed("r13x benford 20M") {
        val d = spark.range(20000000L)
          .select((pmod(xxhash64(col("id")), lit(999983L)) + 1L).as("v"))
        graft.operators.Hygiene.benfordAudit(d, "v")
          .filter(col("obs_ppm") >= 0L).count()
      }
      timed("r13x bootstrap ci 5M x B40") {
        val d = spark.range(5000000L).select(col("id"),
          pmod(xxhash64(col("id")), lit(100000L)).as("x"))
        graft.operators.Splits.bootstrapCiMean(d, "id", "x", b = 40)
          .filter(col("hi_ppm") >= col("lo_ppm")).count()
      }
      timed("r13x spearman 20M x 1e6 ndv") {
        val d = spark.range(20000000L)
          .select(pmod(xxhash64(col("id")), lit(1000000L)).as("x0"))
          .select(col("x0"), (col("x0") * 3L +
            pmod(xxhash64(col("x0") + 5L), lit(500000L))).as("y0"))
        graft.operators.Hygiene.spearmanCorr(d, "x0", "y0")
          .filter(col("rho").isNotNull).count()
      }
      timed("r13x cramers 20M 3cols") {
        // ka/kb/kc: chiSquareAudit uses ra/cb internally for margins —
        // a user column literally named "cb" would be ambiguous
        val d = spark.range(20000000L).select(
          pmod(xxhash64(col("id")), lit(7L)).cast("string").as("ka"),
          pmod(xxhash64(col("id") + 3L), lit(5L)).cast("string").as("kb"),
          (pmod(xxhash64(col("id")), lit(7L)) % 3L).cast("string").as("kc"))
        graft.operators.Hygiene.cramersVMatrix(d, Seq("ka", "kb", "kc"))
          .filter(col("v2_ppm").isNotNull).count()
      }
      timed("r13x gini 5M units") {
        val d = spark.range(5000000L)
          .select(pmod(xxhash64(col("id")), lit(10000000L)).as("v"))
        graft.operators.Hygiene.giniIndex(d, "v")
          .filter(col("gini_ppm").isNotNull).count()
      }
      timed("r13x vocab growth 50k docs") {
        graft.operators.TextAnalysis
          .vocabGrowth(spark.read.parquet(s"$dir/documents"))
          .filter(col("n_tokens") >= 0L).count()
      }
    }

    // Round-13 temporal/statistics extras: theil-sen prices its per-key
    // QUADRATIC honestly (200k keys × 50 dailies = 245M pair slopes
    // through one keyed self-join + bounded collect_list); acf is the
    // linear (key, b+lag) equi-join shape; trimmed mean rides the shared
    // range-sharded cellsCum fold at 10⁷ distinct values.
    if (enabled("r13y")) {
      timed("r13y theil-sen 200k x 50d") {
        val daily = spark.range(10000000L).select(
          (col("id") % 200000L).as("k"), expr("id DIV 200000").as("x"),
          (pmod(xxhash64(col("id")), lit(1000L)) +
            expr("id DIV 200000") * 10L).as("y"))
        graft.operators.Temporal.theilSenFromDaily(daily, "k")
          .filter(col("ts_slope_ppm").isNotNull).count()
      }
      timed("r13y acf 200k x 100d lag7") {
        val s2 = spark.range(20000000L).select(
          (col("id") % 200000L).as("k"), expr("id DIV 200000").as("b"),
          (pmod(xxhash64(col("id")), lit(1000L)) +
            when(expr("id DIV 200000") % 7L === 0L, 500L).otherwise(0L)).as("v"))
        graft.operators.Temporal.acfByKey(s2, "k", "b", "v", maxLag = 7)
          .filter(col("acf_ppm").isNotNull).count()
      }
      timed("r13y trimmed mean 20M") {
        val d = spark.range(20000000L)
          .select(pmod(xxhash64(col("id")), lit(10000000L)).as("v"))
        graft.operators.Hygiene.trimmedMean(d, "v")
          .filter(col("trimmed_mean_ppm").isNotNull).count()
      }
    }

    // Round-14: the keyed gini hot-key A/B — one VIRAL key carrying 5M
    // distinct values next to 500 normal keys. The sharded cellsCumByKey
    // fold spreads the viral key's cells across range shards (broadcast
    // boundary offsets), where the old Window.partitionBy(key) shape pins
    // the whole 5M-cell sort on ONE task. Both shapes run and must agree
    // exactly — the A/B is a correctness witness, not just a stopwatch.
    if (enabled("r14")) {
      def hotKeyFrame = spark.range(6000000L).select(
        when(col("id") < 5000000L, lit("viral"))
          .otherwise(concat(lit("k"), (col("id") % 500L).cast("string"))).as("k"),
        when(col("id") < 5000000L, col("id") * 3L)
          .otherwise(pmod(xxhash64(col("id")), lit(1000L))).as("v"))
      var sharded: Map[String, Long] = Map.empty
      timed("r14 giniByKey hot 5M-ndv SHARDED") {
        val r = graft.operators.Hygiene.giniByKey(hotKeyFrame, "k", "v")
          .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
        sharded = r
        r.size.toLong
      }
      timed("r14 giniByKey hot 5M-ndv OLD one-task window") {
        val cells = hotKeyFrame.groupBy(col("k"), col("v"))
          .agg(count(lit(1)).as("c"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("k")).orderBy(col("v"))
        val r = cells.withColumn("cumc", sum(col("c")).over(w))
          .groupBy(col("k"))
          .agg(sum(col("c")).as("n"),
            sum((col("v") * col("c")).cast("decimal(38,0)")).as("t"),
            sum(expr(
              "CAST(v AS DECIMAL(38,0)) * (CAST(c AS DECIMAL(38,0)) *" +
                " CAST(cumc - c AS DECIMAL(38,0)) + (CAST(c AS DECIMAL(38,0)) *" +
                " CAST(c + 1 AS DECIMAL(38,0))) div 2)")).as("s"))
          .select(col("k"), expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * (2 * s - (CAST(n AS" +
              " DECIMAL(38,0)) + 1) * t)) div (CAST(n AS DECIMAL(38,0)) * t)" +
              " AS BIGINT)").as("g"))
          .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
        require(r == sharded,
          s"sharded/window gini mismatch: ${r.size} vs ${sharded.size} keys")
        r.size.toLong
      }
      // the global bucketed-series family at 5M buckets — the r14 range-
      // sharded folds (prefix CUSUM, prefix-difference moving average)
      // must survive a series 3 orders past the hours-per-year contract
      def series5m = spark.range(5000000L).select(col("id").as("bucket"),
        (pmod(xxhash64(col("id")), lit(1000L)) +
          when(col("id") >= 2500000L, 800L).otherwise(0L)).as("v"))
      timed("r14 cusum changepoints 5M buckets") {
        graft.operators.Temporal.cusumChangepoints(series5m)
          .filter(col("is_changepoint")).count()
      }
      timed("r14 cusum segments d3 5M buckets") {
        graft.operators.Temporal.cusumSegments(series5m, depth = 3)
          .filter(col("is_boundary")).count()
      }
      timed("r14 seasonal decompose 5M s=24") {
        graft.operators.Temporal.seasonalDecompose(series5m, season = 24)
          .filter(col("residual_e6").isNotNull).count()
      }
      timed("r14 forecast baselines 5M s=24") {
        graft.operators.Temporal.forecastBaselines(series5m, season = 24)
          .filter(col("n_eval") > 0L).count()
      }
      timed("r14 bpe encode 50k docs") {
        // the encode pass over the scaled (10×) corpus: row-local merge fold +
        // the range-sharded vocabulary rank (the r14 reroute under test)
        graft.operators.TextAnalysis.bpeEncode(
            spark.read.parquet(s"$dir/documents"),
            Seq(("the", "quick"), ("brown", "fox")))
          .filter(col("token_id") > 0L).count()
      }
    }

    // DISTRIBUTED graph family at ~6M edges (r16): the fixture graphs all
    // sit under Dedup.localMaxEdges (2²²), so at bench scale the damped
    // iterations / peel / wedge machinery run as driver replicas — these
    // sections build a bipartite incidence graph that EXCEEDS the bound
    // (no forcing needed; the cutovers gate themselves off) and witness
    // the real per-iteration edge-keyed join+agg loops, the synchronous
    // peel, and the Σ deg² wedge shuffle at 10× bench volume.
    if (enabled("r16 graph")) {
      val inc6m = spark.range(0, 6000000L)
        .select(
          pmod(xxhash64(col("id")), lit(600000L)).as("a"),
          (lit(1000000000L) + pmod(xxhash64(col("id") + 7L), lit(50000L))).as("b"))
        .distinct()
        .localCheckpoint()
      val nE = inc6m.count()
      require(nE > Dedup.localMaxEdges,
        s"graph smoke must exceed the cutover bound, got $nE")
      println(s"[scale-smoke] graph edges = $nE (> 2^22 = ${Dedup.localMaxEdges})")
      val seed = inc6m.select(col("a")).limit(1).collect()(0).getLong(0)
      timed("r16 graph pagerank 6M edges dist") {
        graft.operators.Graph.pageRank(inc6m, iters = 3).count()
      }
      Dedup.uncacheAll()
      timed("r16 graph ppr 6M edges dist") {
        graft.operators.Graph.personalizedPageRank(inc6m, seed, iters = 3).count()
      }
      Dedup.uncacheAll()
      timed("r16 graph hits 6M edges dist") {
        graft.operators.Graph.hits(inc6m, iters = 3).count()
      }
      Dedup.uncacheAll()
      timed("r16 graph kcore k=15 6M edges dist") {
        graft.operators.Graph.kCore(inc6m, k = 15, rounds = 3).count()
      }
      timed("r16 graph triangles 6M edges") {
        graft.operators.Graph.triangleCounts(inc6m).count()
      }
      Dedup.uncacheAll()
      timed("r16 graph neighbor jaccard cap20 6M") {
        graft.operators.Graph.neighborJaccard(inc6m,
          maxCenterDeg = Some(20L)).count()
      }
      Dedup.uncacheAll()
    }

    // Perceptron epoch shape at 10× bench volume (r17): the restructured
    // operator's per-epoch cost is one scan of the cached per-doc
    // (bucket, cnt) arrays + a ≤ dims+1-row bucket exchange — this
    // section witnesses that the 50k-doc corpus holds that shape (the
    // old form paid a doc-keyed margin exchange + a features join per
    // epoch, which at 10× volume would grow linearly in the exchanges).
    if (enabled("r17 perceptron")) {
      timed("r17 perceptron 50k docs e3") {
        graft.operators.TextAnalysis.perceptronQuality(
          spark.read.parquet(s"$dir/documents"),
          labelCol = when(pmod(col("doc_id"), lit(2L)) === 0L, 1L)
            .otherwise(-1L),
          dims = 64, epochs = 3)
          .filter(col("correct")).count()
      }
      Dedup.uncacheAll()
    }

    // VIRAL-BASKET guard A/B (r17): one pathological 10⁵-item basket —
    // unguarded it would expand C(1e5,2) ≈ 5·10⁹ pairs inside ONE task
    // (hours / OOM; deliberately NOT run); with the default cap (10⁴) the
    // hot basket costs one linear array build and is excluded, so the
    // section completes in seconds and the worst surviving task is
    // bounded at C(maxBasketItems,2). 100k normal baskets (≤6 items)
    // pair alongside it untouched.
    if (enabled("r17 assoc")) {
      val hot = spark.range(0, 100000L)
        .select(lit(0L).as("basket"), col("id").as("item"))
      val normal = spark.range(0, 600000L)
        .select((pmod(xxhash64(col("id")), lit(100000L)) + 1L).as("basket"),
          pmod(xxhash64(col("id") + 3L), lit(500L)).as("item"))
      val bi = hot.unionAll(normal).localCheckpoint()
      timed("r17 assoc guarded hot-basket 1e5") {
        graft.operators.Assoc.pairRules(bi, minPairN = 2).count()
      }
      timed("r17 assoc oversized audit") {
        val a = graft.operators.Assoc.oversizedBaskets(bi)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        require(a.toSeq == Seq((0L, 100000L)),
          s"audit must name exactly the hot basket: ${a.toSeq}")
        a.length.toLong
      }
      Dedup.uncacheAll()
    }

    // r18: the BlockSkewStream twin at 10× bench volume — 50k docs folded
    // in 10 micro-batches. Evidence sought: (a) held state stays at its
    // key-space bound (≪ corpus), (b) per-batch merge cost is flat (the
    // fold joins two bounded count tables, never the corpus), (c) the
    // streamed census equals the one-shot batch audit row-for-row.
    if (enabled("r18 blockskew stream")) {
      val docs = spark.read.parquet(s"$dir/documents")
        .select(col("doc_id"), col("text")).localCheckpoint()
      val nDocs = docs.count()
      val store = new graft.streaming.BlockSkewStream.SkewStore(spark)
      timed(s"r18 blockskew stream $nDocs docs x10") {
        (0 until 10).foreach { b =>
          val t0 = System.nanoTime()
          store.merge(docs.filter(pmod(col("doc_id"), lit(10)) === b), b.toLong)
          println(f"[scale-smoke]   batch $b merge ${(System.nanoTime() - t0) / 1e9}%.1f s " +
            s"state=${store.counts.count()} rows")
        }
        store.counts.count()
      }
      timed("r18 blockskew streamed==batch") {
        val streamed = store.current(topN = 20).collect().map(_.toSeq).toSeq
        val batch = Dedup.blockSkew(docs, topN = 20).collect().map(_.toSeq).toSeq
        require(streamed == batch,
          s"streamed census diverged from batch:\n$streamed\nvs\n$batch")
        streamed.length.toLong
      }
      Dedup.uncacheAll()
    }

    // r19: cross-split semantic contamination at 10× volume — 20k vectors,
    // 64-cell quantizer, TWO eval sizes (200 and 2k). Replicas are EXACT
    // copies of their source vector, so every eval vector has cosine-1.0
    // twins on the train side IN ITS OWN CELL — the smoke REQUIRES all of
    // them to flag (a recall hole in the cell bounding would surface here
    // as a clean row). The A/B demonstrates the SCALING LAW, not a fixed
    // speedup: the unbounded eval×train cross scan pays |eval|·|train|
    // dots (grows 10× with the eval side), while the celled path pays a
    // |train|-linear assignment plus ~1/64 of the cross's pairs (near-flat
    // in |eval|) — at 200 eval rows the two roughly break even, and the
    // cell bound's win appears exactly as the eval side grows.
    if (enabled("r19 semcontam")) {
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
        .withColumn("rep", explode(sequence(lit(0), lit(9))))
        .select((col("vec_id") * 10 + col("rep")).as("vec_id"), col("embedding"))
        .localCheckpoint()
      val cents64 = graft.operators.Similarity
        .prepared(
          emb.filter(col("vec_id") % 10 === 0 && col("vec_id") < 640),
          "vec_id", "embedding")
        .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
        .localCheckpoint()
      for (evalMod <- Seq(100, 10)) {
        val train = emb.filter(col("vec_id") % evalMod =!= 0)
        val evalSide = emb.filter(col("vec_id") % evalMod === 0)
        val nEval = evalSide.count()
        var out: org.apache.spark.sql.DataFrame = null
        timed(s"r19 semcontam celled (20k x $nEval)") {
          out = graft.operators.Similarity
            .semanticContamination(train, evalSide, cents64, tau = 0.97)
            .localCheckpoint() // one materialization = the timed compute
          nEval
        }
        require(out.count() == nEval, "one row per eval vector")
        val flagged = out.filter(col("contaminated")).count()
        require(flagged == nEval,
          s"every eval vector has exact twins in-cell on the train side; " +
            s"only $flagged/$nEval flagged")
        timed(s"r19 semcontam brute cross (20k x $nEval)") {
          // the shape the cell bound replaces: every eval vector scored
          // against the WHOLE train side (the brute decontamination pass)
          val pt = graft.operators.Similarity.prepared(train, "vec_id", "embedding")
          val pe = graft.operators.Similarity.prepared(evalSide, "vec_id", "embedding")
          pe.select(col("id").as("id_e"), col("v").as("ve"), col("nrm").as("ne"))
            .crossJoin(pt.select(col("id").as("id_t"), col("v").as("vt"),
              col("nrm").as("nt")))
            .select(col("id_e"),
              (round(graft.operators.Similarity.dot(col("ve"), col("vt")) /
                (col("ne") * col("nt")), 4) + lit(0.0)).as("cosine"))
            .filter(col("cosine") >= 0.97)
            .groupBy(col("id_e")).agg(count(lit(1)).as("n"))
            .count()
        }
      }
      Dedup.uncacheAll()
    }
    spark.stop()
  }
}
