package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Assoc, Dedup, DiskUsageOp, Graph, Hygiene, Joins, Layout, Multimodal, Similarity, Splits, Temporal, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query is paired with an ANSI-SQL oracle executed by DuckDB over the
  * same parquet tables. Cross-engine determinism rules used throughout:
  *  - double SUMs go through DECIMAL(18,s) (exact, order-insensitive), then
  *    back to double;
  *  - cosine/jaccard scores are emitted rounded (and `+ 0.0` to normalize a
  *    possible negative zero), with thresholds/ranks applied to the rounded
  *    value and id tie-breaks;
  *  - md5/sha2 are the only hash functions that cross the oracle boundary;
  *  - every result carries an explicit deterministic total ORDER BY.
  */
object SparkEntry {

  /** `events.ts`'s PHYSICAL unit is the driver's choice and has changed
    * between fixture regenerations (timestamp[ns] rounds 1–7 — which
    * Spark's reader rejects at schema inference without the nanosAsLong
    * flag — then timestamp[us]/NTZ). No query using this helper needs
    * `ts`, so events reads carry an explicit projected schema omitting it
    * (which also skips footer schema merging). Queries that DO need event
    * time go through [[graft.operators.Temporal.eventsMicros]], the
    * type-driven seam.
    */
  private[graft] val eventsSchema =
    "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"

  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") s.read.schema(eventsSchema).parquet(s"$dir/$name.parquet")
    else s.read.parquet(s"$dir/$name.parquet")

  /** Exact order-insensitive sum of a double column, returned as double. */
  private[graft] def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** SHARED DERIVED ARTIFACTS — deterministic intermediates that several
    * registry rows describe (the LPA labeling, the minhash-LSH near-dup
    * pair set and its components fixpoint, the trained BPE merge list).
    * Each is a pure function of the immutable dump under `dir`, so
    * recomputing it per consumer row is pure duplicate work — exactly the
    * build-once/serve-many artifact shape a production pipeline runs
    * (train the tokenizer once, label the dup graph once, serve both
    * everywhere). Memoized per (session, sfDir) as materialized,
    * lineage-cut persisted tables (the LabelStore swap discipline). The
    * ORACLE side is untouched — every consumer's oracle still re-derives
    * the artifact independently, so sharing can never mask a parity break.
    *
    * Cache key is a per-session UUID (stable, never reused —
    * `identityHashCode` can collide across GC'd sessions); a sweep
    * driver that regenerates the data under a dir mid-session must call
    * [[invalidateArtifactCaches]] or the cached artifacts are stale by
    * design (they memoize reads of immutable dump artifacts).
    */
  private[graft] final class CachedFrame(val df: DataFrame, val bytes: Long) {
    val lastUse = new java.util.concurrent.atomic.AtomicLong(0L)
  }

  private[graft] val artifactCache =
    new java.util.concurrent.ConcurrentHashMap[String, CachedFrame]()

  /** Total-bytes budget for the memoized artifact frames. The r15 cache
    * pinned ~15 MEMORY_AND_DISK frames with NO cap — residency grew with
    * the registry and forced the bench heap from 16g to 32g (GC storms
    * were the symptom, unbounded cache the cause). When an insert pushes
    * resident artifact bytes past this budget, the COLDEST entries
    * (least-recently-served, never the one just inserted) are unpersisted
    * and dropped until under budget. Eviction can never affect
    * correctness by construction: a consumer's next call misses and
    * re-derives the artifact from the immutable dump — it costs a
    * rebuild, nothing else. Mutable ONLY so tests can force eviction on
    * fixture-sized artifacts.
    */
  @volatile private[graft] var artifactBudgetBytes: Long = 8L << 30

  /** Monotone access clock for the LRU order (wall time would tie under
    * burst access).
    */
  private[graft] val useTick = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Evictions performed so far — bench telemetry. */
  private[graft] val evictionCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** (live artifact frames, resident bytes, evictions so far) across all
    * sessions — the bench residency line.
    */
  def artifactResidency(): (Int, Long, Long) = {
    var n = 0; var b = 0L
    artifactCache.values().forEach { e => n += 1; b += e.bytes }
    (n, b, evictionCount.get())
  }

  private[graft] def unpersistQuietly(df: DataFrame): Unit =
    // an entry may belong to a since-stopped session whose block manager
    // is gone — nothing to release there; a throw here must not abort
    // the caller's sweep
    try df.unpersist(blocking = false)
    catch {
      case _: InterruptedException => Thread.currentThread().interrupt()
      case scala.util.control.NonFatal(_) => ()
    }

  /** Unpersist-coldest until resident artifact bytes fit the budget.
    * `keep` (the key just inserted) is never evicted — the budget is a
    * pressure valve, not an admission policy; a single artifact larger
    * than the whole budget still serves its consumers and simply evicts
    * everything else.
    */
  private[graft] def enforceArtifactBudget(keep: String): Unit = {
    var total = 0L
    artifactCache.values().forEach(e => total += e.bytes)
    if (total <= artifactBudgetBytes) return
    val victims = new java.util.ArrayList[(String, CachedFrame)]()
    artifactCache.forEach { (k, e) => if (k != keep) victims.add((k, e)); () }
    victims.sort((a, b) => java.lang.Long.compare(
      a._2.lastUse.get(), b._2.lastUse.get()))
    val it = victims.iterator()
    while (total > artifactBudgetBytes && it.hasNext) {
      val (k, e) = it.next()
      // remove(k, e) not remove(k): a concurrent re-insert under the same
      // key must not lose its fresh entry to this sweep
      if (artifactCache.remove(k, e)) {
        unpersistQuietly(e.df)
        total -= e.bytes
        evictionCount.incrementAndGet()
      }
    }
  }

  /** Actual cached size of a persisted-and-materialized frame: the
    * InMemoryRelation's accumulated batch statistics, read off the
    * optimized plan (cache substitution has already resolved by the time
    * this runs, right after the materializing count). Falls back to 0 —
    * an unknown size must not block caching, it just escapes the budget.
    */
  private[graft] def cachedPlanBytes(df: DataFrame): Long =
    try {
      val s = df.queryExecution.optimizedPlan.stats.sizeInBytes
      // an implausible size (BigInt beyond Long, or the
      // defaultSizeInBytes = Long.MaxValue estimator fallback when cache
      // substitution didn't resolve) must degrade to "unknown → escapes
      // the budget" (0), NOT poison the running total — a MaxValue entry
      // would either evict everything forever or overflow the sum
      // negative and silently disable enforcement
      if (s.isValidLong && s.toLong != Long.MaxValue && s.toLong >= 0L)
        s.toLong
      else 0L
    } catch { case scala.util.control.NonFatal(_) => 0L }

  /** Drop every memoized derived artifact and unpersist its blocks — the
    * invalidation hook for long-lived sessions whose dump dirs get
    * regenerated (the reference engine is a refresh loop; a refreshed
    * dump must not serve the previous dump's labels).
    */
  def invalidateArtifactCaches(): Unit = {
    val it = artifactCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      unpersistQuietly(e.getValue.df)
      it.remove()
    }
    bpeMergeCache.clear()
    modelCache.clear()
  }

  /** Back-compat alias for [[invalidateArtifactCaches]]. */
  def invalidateLpaCache(): Unit = invalidateArtifactCaches()

  // a fresh UUID per live session, weakly keyed on the session object —
  // unlike identityHashCode it cannot collide across GC'd sessions, and
  // the entry disappears with the session
  private[graft] val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  private[graft] def sessionKey(s: SparkSession): String =
    sessionIds.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)

  // Memoized frames strongly reference their SparkSession through the
  // persisted plan, so WITHOUT an eviction hook a stopped session (and
  // every artifact built on it) would stay reachable until someone calls
  // invalidateArtifactCaches() by hand. A listener on the session's
  // context drops that session's cache entries at application end; the
  // blocks themselves die with the context, so only the references need
  // releasing there.
  private[graft] val cleanupRegistered =
    java.util.Collections.synchronizedSet(new java.util.HashSet[String]())

  /** Test seam + listener body: drop one session's memoized artifacts. */
  private[graft] def dropSessionCaches(s: SparkSession): Unit =
    dropSessionCaches(sessionKey(s))

  /** Count of live memoized entries for a session (test observability). */
  private[graft] def cachedEntryCount(s: SparkSession): Int = {
    val prefix = sessionKey(s) + ":"
    var n = 0
    val it = artifactCache.keySet().iterator()
    while (it.hasNext) if (it.next().startsWith(prefix)) n += 1
    val it2 = modelCache.keySet().iterator()
    while (it2.hasNext) if (it2.next().startsWith(prefix)) n += 1
    n
  }

  private[graft] def dropSessionCaches(key: String): Unit = {
    val prefix = key + ":"
    val it = artifactCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(prefix)) {
        unpersistQuietly(e.getValue.df)
        it.remove()
      }
    }
    def dropKeys(m: java.util.concurrent.ConcurrentHashMap[String, _]): Unit = {
      val ks = m.keySet().iterator()
      while (ks.hasNext) if (ks.next().startsWith(prefix)) ks.remove()
    }
    dropKeys(modelCache)
    dropKeys(bpeMergeCache)
    cleanupRegistered.remove(key)
  }

  private[graft] def registerSessionCleanup(s: SparkSession): Unit = {
    val key = sessionKey(s)
    if (cleanupRegistered.add(key)) {
      try s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
            dropSessionCaches(key)
        })
      catch {
        // a context already stopping cannot register — nothing to leak
        // then either
        case scala.util.control.NonFatal(_) => cleanupRegistered.remove(key)
      }
    }
  }

  // ------------------------------------------------------------------
  // Runtime pricing tripwire (r19 — upgrades the CoreSpec text scan):
  // while a registry-row label is set on the thread, every memo accessor
  // call is logged against that row, hit or miss — "serving is serving"
  // even when the cache is warm, and a pricing row that reaches a memo
  // through a renamed helper (invisible to the source scan) is caught by
  // construction. Verify wraps each row in [[recordingMemoTouches]] and
  // asserts the log against [[graft.registry.PricingManifest]].
  private[graft] val memoTouches = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.Set[String]]()
  private val memoTouchRow = new ThreadLocal[String]()

  /** Run `body` with memo-accessor logging credited to registry row
    * `row`. Nests (inner label wins, outer restored) — though in
    * practice rows run flat and sequentially.
    */
  private[graft] def recordingMemoTouches[T](row: String)(body: => T): T = {
    val prev = memoTouchRow.get()
    memoTouchRow.set(row)
    try body
    finally if (prev eq null) memoTouchRow.remove() else memoTouchRow.set(prev)
  }

  private def recordMemoTouch(name: String): Unit = {
    val row = memoTouchRow.get()
    if (row ne null)
      memoTouches.computeIfAbsent(row, _ => java.util.concurrent
        .ConcurrentHashMap.newKeySet[String]()).add(name)
  }

  private[graft] def memoTouchSnapshot(): Map[String, Set[String]] = {
    import scala.jdk.CollectionConverters._
    memoTouches.asScala.map { case (r, s) => r -> s.asScala.toSet }.toMap
  }

  private[graft] def clearMemoTouches(): Unit = memoTouches.clear()

  /** Memoize `build`'s result as a materialized, lineage-cut, persisted
    * table keyed on (session, dir, name). The lineage cut
    * (`createDataFrame(rdd, schema)`) makes the cached frame independent
    * of any operator-internal persisted frames the build registered
    * (which `Dedup.uncacheAll()` drops between rows) and keeps consumer
    * plans constant-size.
    */
  private[graft] def memoFrame(s: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame = {
    // NOT computeIfAbsent: builds nest (lshComponents builds FROM
    // lshPairs), and a recursive computeIfAbsent on one ConcurrentHashMap
    // is undefined (IllegalStateException or a stuck bin, depending on
    // where the keys hash). Get-then-putIfAbsent holds no lock during the
    // build; a concurrent duplicate build is benign — the loser unpersists
    // its copy and adopts the winner's.
    registerSessionCleanup(s)
    recordMemoTouch(name)
    val key = s"${sessionKey(s)}:$dir:$name"
    val existing = artifactCache.get(key)
    if (existing != null) {
      existing.lastUse.set(useTick.incrementAndGet())
      return existing.df
    }
    val df = build
    val cut = s.createDataFrame(df.rdd, df.schema)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cut.count()
    val entry = new CachedFrame(cut, cachedPlanBytes(cut))
    entry.lastUse.set(useTick.incrementAndGet())
    val prev = artifactCache.putIfAbsent(key, entry)
    if (prev != null) {
      cut.unpersist(blocking = false)
      prev.lastUse.set(useTick.incrementAndGet())
      prev.df
    } else {
      enforceArtifactBudget(keep = key)
      cut
    }
  }

  /** Driver-side trained-model memo (PQ models: tiny case classes of
    * centroids + codebooks) — the [[memoFrame]] discipline for values
    * that are not DataFrames. Same get-then-putIfAbsent nesting rule.
    */
  private[graft] val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  private[graft] def memoModel[T <: AnyRef](s: SparkSession, dir: String,
      name: String)(build: => T): T = {
    registerSessionCleanup(s)
    recordMemoTouch(name)
    val key = s"${sessionKey(s)}:$dir:$name"
    val existing = modelCache.get(key)
    if (existing != null) return existing.asInstanceOf[T]
    val m = build
    val prev = modelCache.putIfAbsent(key, m)
    if (prev != null) prev.asInstanceOf[T] else m
  }

  /** The shared coarse IVF quantizer (k = 4, 2 Lloyd's rounds) over the
    * `embeddings` table — trained once per (session, dir) and served to
    * every IVF-family consumer: plain trained serving
    * (`ann_ivf_trained_topk`), the recall row, the nprobe sweep, and
    * BOTH PQ models' coarse stage. Training is deterministic, so each
    * row's oracle keeps replaying it independently.
    */
  private[graft] def coarseCents4(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "cents_k4_i2") {
      Similarity.trainCentroids(t(s, dir, "embeddings"), k = 4, iters = 2)
    }

  /** The shared trained IVF-PQ model at the registry parameterization
    * (m = 8, ksub = 8, pqIters = 2) — `trainFrac` keys the memo, so the
    * full-train model serves `ann_ivfpq_topk` + `ann_recall_eval_pq`
    * and the sampled-train model serves `ann_ivfpq_sampled`; the first
    * consumer prices the (sample-)training, later consumers are
    * serve-only. Coarse centroids come from [[coarseCents4]].
    */
  private[graft] def pqModel2(s: SparkSession, dir: String,
      trainFrac: Double): Similarity.PqModel =
    memoModel[Similarity.PqModel](s, dir, s"pq_i2_f$trainFrac") {
      Similarity.trainPqWith(
        Similarity.collectCentroids(coarseCents4(s, dir)),
        t(s, dir, "embeddings"), m = 8, ksub = 8, pqIters = 2,
        trainFrac = trainFrac)
    }

  /** The prepared `(id, v, nrm)` embedding frame — the raw-vector side
    * every ANN serve stage (refine, brute baselines) re-derives; one
    * artifact per (session, dir).
    */
  private[graft] def preparedEmb(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "prepared_emb") {
      Similarity.prepared(t(s, dir, "embeddings"), "vec_id", "embedding")
    }

  /** The ENCODED PQ corpus (m codeword ids per vector) for the shared
    * [[pqModel2]] — the in-session twin of the
    * [[graft.sources.AnnIndex.buildPq]] artifact: encode once, serve
    * every query batch off the codes. The encode projection's literal
    * codebook expressions are planning-heavy, which is exactly why
    * production persists codes instead of re-deriving them per query.
    */
  private[graft] def pqCodes(s: SparkSession, dir: String,
      trainFrac: Double): DataFrame =
    memoFrame(s, dir, s"pq_codes_f$trainFrac") {
      Similarity.encodePq(t(s, dir, "embeddings"), pqModel2(s, dir, trainFrac))
    }

  /** The shared LPA labeling over the order—part incidence graph —
    * `q_label_propagation` censuses it, `q_modularity` audits it; the
    * labeling is deterministic (min-label tie-break), so both rows
    * describe the SAME artifact (~6 s duplicate work at bench scale
    * otherwise); |nodes| rows, trivially resident.
    */
  /** The canonical order—part incidence edge frame (parts offset into a
    * disjoint id space), deduplicated once — the graph family's shared
    * input (pagerank, HITS, PPR, jaccard, assortativity, LPA,
    * modularity all walk THIS frame; rebuilding the distinct per row
    * paid the lineitem scan + dedup exchange seven times per sweep).
    */
  private[graft] def incidenceEdges(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "incidenceEdges") {
      t(s, dir, "lineitem")
        .select(col("l_orderkey").as("a"),
          (col("l_partkey") + 1000000000L).as("b"))
        .distinct()
    }

  /** The part co-occurrence edge frame (parts sharing an order, a < b,
    * deduplicated) — the triangle/clustering/k-core family's shared
    * input; its build is itself an order-keyed self-join, the most
    * expensive edge derivation in the registry.
    */
  private[graft] def partCoEdges(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "partCoEdges") {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
    }

  /** The `(n, d)` degree table of [[partCoEdges]] — one degree pass
    * serving the whole co-occurrence-graph family (triangle orientation,
    * clustering-coefficient denominators) instead of each operator
    * re-aggregating it privately over the same shared edge artifact.
    */
  private[graft] def coDeg(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "coDeg") {
      Graph.canonicalDegrees(partCoEdges(s, dir))
    }

  /** The banded-LSH top-4 neighbor list at the registry's standard
    * parameterization (planes = vectors 0-3, bands = 2) — `ann_knn_graph`
    * takes its mutual closure, `ann_label_noise` its neighbor vote; the
    * band-bucketed candidate join + scoring is the expensive stage, one
    * build, two readers.
    */
  private[graft] def bandedKnn4(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "bandedKnn4") {
      val emb = t(s, dir, "embeddings")
      val planes = graft.operators.Similarity
        .prepared(emb.filter(col("vec_id") < 4), "vec_id", "embedding")
        .select(col("id").as("plane_id"), col("v").as("pv"))
      graft.operators.Similarity.bandedTopK(emb, planes, bands = 2, k = 4)
    }

  /** The exact cosine top-3 truth set at the registry's standard recall
    * parameterization (queries 0-9 against the full corpus) — the
    * baseline side of SIX recall rows (ivf, lsh, binary, binary-banded,
    * matryoshka, rp); each previously re-ran the brute queries×corpus
    * scoring privately. The PQ recall row keeps its own L2 baseline
    * (different metric), and `ann_cosine_topk` keeps pricing the brute
    * scan itself at its own k.
    */
  private[graft] def bruteTruth3(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "bruteTruth3") {
      val emb = t(s, dir, "embeddings")
      graft.operators.Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") < 10), k = 3)
    }

  /** The LSH-fed MMR pick chain at the registry's standard
    * parameterization (queries 0-9, planes 0-3, bands = 2, shortlist 12,
    * k = 4) — `ann_mmr_rerank_lsh` publishes it, `ann_mmr_recall` grades
    * it against the brute chain; the LSH serve + pair sims + driver
    * greedy runs once for both.
    */
  private[graft] def mmrFedPicks(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "mmrFedPicks") {
      import graft.operators.Similarity
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val planes = Similarity.prepared(emb.filter(col("vec_id") < 4),
          "vec_id", "embedding")
        .select(col("id").as("plane_id"), col("v").as("pv"))
      val short = Similarity.lshTopKBanded(emb, q, planes, bands = 2, k = 12)
        .select(col("query_id"), col("neighbor_id"),
          round(col("score") * 10000, 0).cast("long").as("rel"))
      Similarity.mmrRerank(emb, q, shortlist = 12, k = 4,
        candidates = Some(short))
    }

  /** The BM25 lexical top-10 list at the registry's standard query set —
    * `ret_rrf_fusion` fuses it with the semantic list; `text_bm25_topk`
    * deliberately does NOT read this cache (it PRICES the inverted-index
    * probe + scoring build, the [[lshPairs]] pricing-row convention) —
    * one build, one priced row, consumers serve-only.
    */
  private[graft] def bm25Lex10(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "bm25Lex10") {
      import s.implicits._
      val qs = Seq(
        (0L, "fast table scan"), (1L, "join query order"),
        (2L, "stream window batch"), (3L, "slow merge"),
        (4L, "customer value vector"), (5L, "zebra hash")
      ).toDF("query_id", "q_text")
      graft.operators.TextAnalysis.bm25TopK(t(s, dir, "documents"), qs, k = 10)
    }

  /** The deduped (order, brand) incidence frame — the assoc family's
    * shared input: `q_assoc_rules` mines it, `q_assoc_basket_audit`
    * audits it; rebuilding the lineitem+part join + distinct per row
    * paid the family's most expensive derivation twice per sweep.
    */
  private[graft] def brandBaskets(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "brandBaskets") {
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
        .distinct()
    }

  /** Per-node triangle counts over [[partCoEdges]] — the expensive
    * degree-oriented wedge-closing pass `q_triangle_counts` censuses and
    * `q_clustering_coeff` normalizes; one count, two readers. Served
    * through the canonical seam: [[partCoEdges]] is already distinct
    * a < b and [[coDeg]] already holds its degrees, so the operator
    * skips both the re-canonicalizing exchange and the degree agg.
    */
  private[graft] def triCounts(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "triCounts") {
      Graph.triangleCountsWith(partCoEdges(s, dir), coDeg(s, dir))
    }

  /** The degree-annotated directed edge frame (`src, dst, deg(src)` —
    * both directions) the damped-iteration family walks: `q_pagerank`
    * and `q_ppr` run the same |E|-row degree join before their
    * iterations; one build, two consumers. [[prDeg]] derives the degree
    * table from it (every edge endpoint appears as `src`).
    */
  private[graft] def prEdges(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "prEdges") {
      Graph.degreeAnnotatedEdges(incidenceEdges(s, dir))._1
    }

  private[graft] def prDeg(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "prDeg") {
      prEdges(s, dir).select(col("src"), col("deg")).distinct()
    }

  private[graft] def lpaLabels(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "lpa") {
      Graph.labelPropagation(incidenceEdges(s, dir), rounds = 3)
    }

  /** The shared minhash-LSH near-dup pair set over `documents` at the
    * registry's standard parameters (n=3, tau=0.6, 32×2 banding) — seven
    * rows consume it (`dedup_minhash_lsh` prices the build itself and
    * deliberately does NOT read this cache; `dedup_survivors`,
    * `dedup_components*`, `dedup_best_rep`, `dedup_stats`,
    * `split_dedup_reweighted`, `pipeline_prep` are its serve-side
    * consumers). Pair count is candidate-bounded (band-bucket collisions),
    * resident at any sane dup rate.
    */
  private[graft] def lshPairs(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "lshPairs") {
      Dedup.minhashLshPairs(t(s, dir, "documents"), n = 3, tau = 0.6)
    }

  /** The semDedup verdict frame at the registry parameterization —
    * `dedup_semantic` deliberately prices the full train→cluster→prune
    * build itself (the minhash-LSH canonical-row discipline);
    * `dedup_semantic_rep` and `q_crossmodal_agreement` are its
    * serve-side consumers.
    */
  private[graft] def semDedupArt(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "semDedup") {
      Similarity.semDedup(t(s, dir, "embeddings"),
        k = semDedupK, iters = semDedupIters, tau = semDedupTau)
    }

  /** The window-5 / support-20 PMI collocation table —
    * `text_collocations` publishes it, `text_textrank` builds its word
    * graph from it; one co-occurrence scan instead of two.
    */
  private[graft] def collocationsArt(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "collocations") {
      TextAnalysis.collocations(t(s, dir, "documents"), window = 5,
        minCount = 20)
    }

  /** The SimHash near-dup pair set (collapse path, the library default)
    * at the registry parameterization — `dedup_simhash_collapse`
    * publishes it, `dedup_simhash_recall` audits it; one fingerprint +
    * block-join scan instead of two. (`dedup_simhash` deliberately keeps
    * pricing the DIRECT single-stage build — that row exists to bench
    * the alternative plan, not to consume this artifact.)
    */
  private[graft] def simhashPairsArt(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "simhashPairs") {
      Dedup.simhashPairs(t(s, dir, "documents"), n = 3, tau = 0.6,
        maxHamming = 6)
    }

  /** The raw-corpus (id, simhash) fingerprint frame at the registry
    * parameterization (n = 3, no dup collapse) — `dedup_block_skew`
    * serves its candidate-pressure census from it; the fingerprint build
    * itself stays priced by `dedup_simhash`'s direct chain (which
    * re-derives the identical signatures inside its own plan every
    * iteration — the [[bruteTruth3]] "the scan is the cost" convention).
    */
  private[graft] def simhashSigArt(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "simhashSig") {
      Dedup.simhashFingerprints(t(s, dir, "documents"), n = 3)
    }

  /** The exact n-gram Jaccard truth pair set at the registry
    * parameterization (n = 3, tau = 0.6) — `dedup_ngram_jaccard`
    * deliberately prices the full inverted-index build itself (the
    * minhash-LSH canonical-row discipline); `dedup_simhash_recall`'s
    * truth side is its serve-side consumer (the recall audit previously
    * re-derived this whole set per call — the r15 simhash-trio
    * cost finding).
    */
  private[graft] def ngramTruthArt(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "ngramTruth") {
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 3, tau = 0.6)
    }

  /** The blocked-Levenshtein candidate pair set over `customer` at the
    * registry parameterization — `q_fuzzy_blocked` publishes it,
    * `q_entity_resolution` clusters it; one (nation, segment)-blocked
    * DP scan instead of two.
    */
  private[graft] def fuzzyPairs(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "fuzzyPairs") {
      Joins.blockedFuzzyJoin(t(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), "c_custkey", "c_name",
        maxDist = 2)
    }

  /** The components fixpoint of [[lshPairs]] — the dup-cluster labeling
    * `dedup_components`, `dedup_best_rep` and `split_dedup_reweighted`
    * all describe. Sharing it removes two redundant fixpoint loops per
    * sweep (each a multi-round driver-coordinated shape that inflates
    * badly under host load — the r13 contention finding).
    */
  private[graft] def lshComponents(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "lshComponents") {
      Dedup.components(lshPairs(s, dir))
    }

  /** The trained 4-merge full-corpus BPE merge table, collected —
    * `text_bpe_vocab` publishes it, `text_bpe_encode` applies it; the
    * training loop is deterministic, so both rows describe the same
    * artifact and the encode row should price ENCODING, not a second
    * training run (train-once/apply-everywhere is the operator's own
    * scale story). Rows are (merge_round, lhs, rhs, n_occurrences);
    * merges-sized, trivially driver-resident.
    */
  private[graft] val bpeMergeCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(Long, String, String, Long)]]()
  private[graft] def bpeMerges(s: SparkSession, dir: String): Seq[(Long, String, String, Long)] = {
    registerSessionCleanup(s)
    recordMemoTouch("bpeMerges")
    bpeMergeCache.computeIfAbsent(s"${sessionKey(s)}:$dir", _ =>
      TextAnalysis.bpeVocab(t(s, dir, "documents"), merges = 4)
        .orderBy(col("merge_round")).collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))))
  }

  /** The trained SAMPLED-corpus BPE merge list (25% md5-bucket sample,
    * 4 merges), collected — the shipped-tokenizer twin of [[bpeMerges]]:
    * `text_bpe_sampled` prices the sampled training DIRECTLY (the
    * training economics are that row's point), `text_fertility_sampled`
    * audits fertility under the SAME shipped vocabulary and serves this
    * memo instead of re-running the whole sampled training per call
    * (r19 reroute; the training is deterministic, so the oracle keeps
    * replaying it independently).
    */
  private[graft] def bpeMergesSampled(s: SparkSession,
      dir: String): Seq[(String, String)] =
    // no explicit type param: the CoreSpec census regex reads the memo
    // name off the call form, and nested type-param brackets break it
    memoModel(s, dir, "bpeMergesSampled") {
      TextAnalysis.bpeVocabSampled(t(s, dir, "documents"), merges = 4,
          sampleFrac = 0.25)
        .orderBy(col("merge_round")).collect().toSeq
        .map(r => (r.getString(1), r.getString(2)))
    }

  /** '/'-joined key with NULL-PROPAGATING semantics: one null segment nulls
    * the whole key, exactly like the oracle's `||`. (concat_ws would skip
    * null segments and silently diverge from the oracle on null inputs —
    * the fixtures are null-free today, but the semantics should not depend
    * on that.)
    */
  private[graft] def slashKey(cols: Column*): Column =
    concat(cols.map(_.cast("string")).flatMap(c => Seq(c, lit("/"))).dropRight(1): _*)

  /** The documents fixture carries no URL column, so the hygiene rows
    * derive a deterministic MESSY url per doc — five variant families
    * (clean / upper+www+trailing-slash / default-port+utm / id-param+utm+
    * fragment / other-domain+port+fbclid) chosen so canonicalization
    * genuinely merges cross-family (same path, different mess) and the
    * domain filter has a blocked family. The oracle builds the identical
    * CASE.
    */
  private[graft] def withSyntheticUrl(docs: DataFrame): DataFrame = {
    val p = (col("doc_id") % 8).cast("string")
    val q = (col("doc_id") % 7).cast("string")
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 5 === 0,
        concat(lit("https://example.com/articles/"), p))
        .when(col("doc_id") % 5 === 1,
          concat(lit("HTTPS://WWW.EXAMPLE.COM/articles/"), p, lit("/")))
        .when(col("doc_id") % 5 === 2,
          concat(lit("https://example.com:443/articles/"), p,
            lit("?utm_source=feed&utm_medium=rss")))
        .when(col("doc_id") % 5 === 3,
          // tracked param FIRST, real param after: exercises the r2
          // '?'-handoff scrub step the r19 hygiene mutation found
          // untested by any fixture (canonical output is ?id=q either
          // way, so only a scrub bug changes the groups)
          concat(lit("https://example.com/articles/"), p,
            lit("?utm_campaign=x&id="), q, lit("#frag")))
        .otherwise(
          concat(lit("http://tracker.example.org:80/articles/"), p,
            lit("?fbclid=abc")))
        .as("url"))
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("du_by_address")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  /** The per-family registry files (r15 verdict task #7: the
    * monolithic map passed 10k lines). Splitting is mechanical —
    * entry bodies are byte-identical — and .toMap keeps the same
    * last-key-wins semantics the CoreSpec source tripwire guards.
    */
  private[graft] def registryParts: Seq[(Seq[(String, (SparkSession, String) => DataFrame)], Seq[(String, String)])] = Seq(
    (graft.registry.DuQueries.queries, graft.registry.DuQueries.oracles),
    (graft.registry.CoreQueriesA.queries, graft.registry.CoreQueriesA.oracles),
    (graft.registry.CoreQueriesB.queries, graft.registry.CoreQueriesB.oracles),
    (graft.registry.TextQueries.queries, graft.registry.TextQueries.oracles),
    (graft.registry.DedupQueries.queries, graft.registry.DedupQueries.oracles),
    (graft.registry.AnnQueries.queries, graft.registry.AnnQueries.oracles),
    (graft.registry.SplitQueries.queries, graft.registry.SplitQueries.oracles),
    (graft.registry.MmQueries.queries, graft.registry.MmQueries.oracles),
    (graft.registry.MiscQueries.queries, graft.registry.MiscQueries.oracles),
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registryParts.flatMap(_._1).toMap


  // ------------------------------------------------------------ oracle SQL

  /** Shared PageRank oracle CTE chain — appended after a `WITH`-block
    * defining `e0(a, b)` (the undirected distinct edge list, ANY node
    * type): symmetrized edges, degrees, node count, uniform start, and
    * THREE unrolled decimal-fenced iterations ending in `r3(node, r)` —
    * mirroring Graph.pageRank's fencing exactly (contributions
    * round(r/deg, 14) summed in DECIMAL(28,14), update
    * round(round(0.15/n,14) + 0.85·sum, 12)). Ends with a newline so
    * consumers append their final SELECT.
    */
  private[graft] lazy val pageRankOracleIters: String = {
    def iter(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT e.dst AS node,
         |         ROUND(ROUND(0.15/MIN(nn.n), 14) +
         |               0.85 * CAST(SUM(CAST(ROUND($prev.r/deg.deg, 14) AS DECIMAL(28,14))) AS DOUBLE),
         |               12) AS r
         |  FROM e JOIN $prev ON $prev.node = e.src
         |         JOIN deg ON deg.src = e.src
         |         CROSS JOIN nn
         |  GROUP BY 1)""".stripMargin
    s""",e AS (SELECT a AS src, b AS dst FROM e0
       |      UNION ALL SELECT b AS src, a AS dst FROM e0),
       |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
       |nn AS (SELECT COUNT(*) AS n FROM deg),
       |r0 AS (SELECT deg.src AS node, ROUND(1.0/nn.n, 12) AS r
       |       FROM deg CROSS JOIN nn),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")}
       |""".stripMargin
  }

  /** DuckDB CTE chain unrolling
    * [[graft.operators.Graph.personalizedPageRank]]: contributions with
    * the identical ROUND/DECIMAL fences, then the union-agg that adds
    * the 0.15 restart mass on the seed. Expects `e0(a, b)`; emits
    * `pr0..pr{iters}`.
    */
  private[graft] def pprOracleIters(seed: Long, iters: Int): String = {
    def iter(prev: String, c: String, out: String): String =
      s"""$c AS (
         |  SELECT e.dst AS node,
         |         ROUND(0.85 * CAST(SUM(CAST(ROUND($prev.r/deg.deg, 14)
         |               AS DECIMAL(28,14))) AS DOUBLE), 12) AS r
         |  FROM e JOIN $prev ON $prev.node = e.src
         |         JOIN deg ON deg.src = e.src
         |  GROUP BY 1),
         |$out AS (
         |  SELECT node, ROUND(CAST(SUM(CAST(r AS DECIMAL(28,14))) AS DOUBLE), 12) AS r
         |  FROM (SELECT * FROM $c UNION ALL
         |        SELECT src AS node, 0.15 AS r FROM deg WHERE src = $seed)
         |  GROUP BY 1)""".stripMargin
    s"""e AS (SELECT a AS src, b AS dst FROM e0
       |      UNION ALL SELECT b AS src, a AS dst FROM e0),
       |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
       |pr0 AS (SELECT src AS node, 1.0 AS r FROM deg WHERE src = $seed),
       |${(1 to iters).map(i => iter(s"pr${i - 1}", s"c$i", s"pr$i")).mkString(",\n")}
       |""".stripMargin
  }

  /** DuckDB CTE chain replaying [[graft.operators.Graph.labelPropagation]]
    * (3 sync rounds, min-label tie-break). Expects `e0(a, b)`; emits
    * `adj`, `l0..l3`. Shared by the LPA census row and the modularity
    * audit so both replay the identical labeling. No trailing comma.
    */
  private[graft] lazy val lpOracleCtes: String =
    """adj AS MATERIALIZED (SELECT a AS n, b AS m FROM e0
      |       UNION ALL SELECT b AS n, a AS m FROM e0),
      |l0 AS (SELECT DISTINCT n, n AS label FROM adj),
      |""".stripMargin +
    (1 to 3).map { i =>
      s"""c$i AS (SELECT adj.n, l.label, COUNT(*) AS cnt
         |       FROM adj JOIN l${i - 1} l ON l.n = adj.m
         |       GROUP BY 1, 2),
         |r$i AS (SELECT n, label,
         |              row_number() OVER (PARTITION BY n
         |                ORDER BY cnt DESC, label) AS rn
         |       FROM c$i),
         |l$i AS MATERIALIZED (SELECT n, label FROM r$i WHERE rn = 1)""".stripMargin
    }.mkString(",\n")

  /** DuckDB CTE chain unrolling [[graft.operators.Graph.hits]]: per
    * iteration an authority half-step (contributions from hubs over
    * in-edges, decimal-exact sum, one-scalar L1 normalize) then the
    * mirror hub half-step — every ROUND/DECIMAL fence identical to the
    * Spark side. Expects `e0(a, b)` directed a→b; emits `eh`, `h0`,
    * `a1..a{iters}`, `h1..h{iters}`. Ends WITHOUT a trailing comma.
    */
  private[graft] def hitsOracleIters(iters: Int): String =
    """eh AS MATERIALIZED (SELECT a AS src, b AS dst FROM e0),
      |h0 AS (SELECT DISTINCT node, 1.0 AS h
      |       FROM (SELECT src AS node FROM eh UNION ALL SELECT dst FROM eh)),
      |""".stripMargin +
    (1 to iters).map { i =>
      s"""ar$i AS (SELECT e.dst AS node,
         |             CAST(SUM(CAST(h.h AS DECIMAL(28,14))) AS DOUBLE) AS v
         |       FROM eh e JOIN h${i - 1} h ON h.node = e.src GROUP BY 1),
         |at$i AS (SELECT CAST(SUM(CAST(v AS DECIMAL(28,14))) AS DOUBLE) AS t
         |       FROM ar$i),
         |a$i AS MATERIALIZED (SELECT node, ROUND(v / t, 12) AS a
         |       FROM ar$i CROSS JOIN at$i),
         |hr$i AS (SELECT e.src AS node,
         |             CAST(SUM(CAST(a.a AS DECIMAL(28,14))) AS DOUBLE) AS v
         |       FROM eh e JOIN a$i a ON a.node = e.dst GROUP BY 1),
         |ht$i AS (SELECT CAST(SUM(CAST(v AS DECIMAL(28,14))) AS DOUBLE) AS t
         |       FROM hr$i),
         |h$i AS MATERIALIZED (SELECT node, ROUND(v / t, 12) AS h
         |       FROM hr$i CROSS JOIN ht$i)""".stripMargin
    }.mkString(",\n")

  /** DuckDB CTE chain replaying [[graft.operators.Graph.kCore]]'s
    * synchronous peel: each round recomputes degrees over the surviving
    * edge set and keeps only edges whose BOTH endpoints have degree ≥ k.
    * Expects `e0(a, b)` (canonical distinct undirected edges); emits
    * `e1..e{rounds}`. Ends without a trailing comma so consumers append
    * their final SELECT over `e{rounds}`.
    */
  private[graft] def kCoreOracleRounds(k: Int, rounds: Int): String =
    // AS MATERIALIZED pins each round to compute ONCE: every round
    // references its predecessor five times, so an inlining planner
    // otherwise re-expands the chain 5^rounds times — the exact
    // exponential the Spark side cuts with per-round localCheckpoint
    (1 to rounds).map { i =>
      val prev = if (i == 1) "e0" else s"e${i - 1}"
      s"""kp$i AS MATERIALIZED (SELECT n FROM (
         |    SELECT n, COUNT(*) AS d
         |    FROM (SELECT a AS n FROM $prev UNION ALL SELECT b FROM $prev)
         |    GROUP BY 1) WHERE d >= $k),
         |e$i AS MATERIALIZED (SELECT e.a, e.b FROM $prev e
         |  JOIN kp$i x ON x.n = e.a JOIN kp$i y ON y.n = e.b)""".stripMargin
    }.mkString(",\n")

  /** DuckDB CTE chain unrolling [[graft.operators.Similarity.mmrRerank]]'s
    * greedy picks: step 1 is the pure-relevance argmax; each later step
    * excludes already-picked ids, computes max-sim-to-picked from the
    * `pairs` CTE, and argmaxes `rel − maxsim` with the id tie-break.
    * Expects `cand(qid, nid, rel)` and `pairs(qid, cid, oid, sim)` —
    * names overridable so a consumer whose serving chain already binds
    * `cand` (the banded-LSH CTEs) can feed differently-named frames;
    * emits `{prefix}s1..{prefix}s{k}` (qid, nid, step, obj). `prefix`
    * namespaces every step CTE so TWO greedy chains (brute + fed, the
    * recall row) can coexist in one WITH clause. Step CTEs are
    * MATERIALIZED: DuckDB inlines plain CTEs, and the sel_j unions
    * reference earlier steps multiply — un-materialized, the re-derived
    * upstream grows exponentially in k (the label-propagation oracle's
    * lesson; composing two chains OOM'd without this).
    */
  private[graft] def mmrOracleSteps(k: Int, cand: String = "cand",
      pairs: String = "pairs", prefix: String = ""): String = {
    val first =
      s"""${prefix}r1 AS MATERIALIZED (SELECT qid, nid, rel AS obj,
         |             row_number() OVER (PARTITION BY qid
         |               ORDER BY rel DESC, nid) AS rn
         |      FROM $cand),
         |${prefix}s1 AS MATERIALIZED (SELECT qid, nid, 1 AS step, obj FROM ${prefix}r1 WHERE rn = 1)""".stripMargin
    val rest = (2 to k).map { j =>
      val selPrev = (1 until j).map(i => s"SELECT qid, nid FROM ${prefix}s$i")
        .mkString(" UNION ALL ")
      s"""${prefix}sel${j - 1} AS MATERIALIZED ($selPrev),
         |${prefix}m$j AS MATERIALIZED (SELECT p.qid, p.cid AS nid, MAX(p.sim) AS ms
         |        FROM $pairs p JOIN ${prefix}sel${j - 1} s
         |          ON s.qid = p.qid AND s.nid = p.oid
         |        GROUP BY 1, 2),
         |${prefix}r$j AS MATERIALIZED (SELECT c.qid, c.nid, c.rel - m.ms AS obj,
         |               row_number() OVER (PARTITION BY c.qid
         |                 ORDER BY (c.rel - m.ms) DESC, c.nid) AS rn
         |        FROM $cand c JOIN ${prefix}m$j m ON m.qid = c.qid AND m.nid = c.nid
         |        WHERE NOT EXISTS (SELECT 1 FROM ${prefix}sel${j - 1} s
         |                          WHERE s.qid = c.qid AND s.nid = c.nid)),
         |${prefix}s$j AS MATERIALIZED (SELECT qid, nid, $j AS step, obj FROM ${prefix}r$j WHERE rn = 1)""".stripMargin
    }
    (first +: rest).mkString(",\n")
  }

  /** Shared DuckDB CTE chain for language ID: per-doc stopword hit counts
    * (`c`) and the argmax/tie-break prediction (`p`) — consumed by both
    * the per-doc `text_langid` row and the `text_lang_confusion` matrix.
    */
  private[graft] val langidCtes =
    """WITH c AS (
      |  SELECT doc_id, lang AS actual_lang,
      |         CAST(len(list_filter(string_split(lower(text),' '), w -> w IN ('der','die','das','und','ist','ein'))) AS BIGINT) AS c_de,
      |         CAST(len(list_filter(string_split(lower(text),' '), w -> w IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS c_en,
      |         CAST(len(list_filter(string_split(lower(text),' '), w -> w IN ('el','los','y','es','una','en'))) AS BIGINT) AS c_es,
      |         CAST(len(list_filter(string_split(lower(text),' '), w -> w IN ('le','les','et','est','une','dans'))) AS BIGINT) AS c_fr
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, c_de, c_en, c_es, c_fr, actual_lang,
      |         CASE WHEN greatest(c_de,c_en,c_es,c_fr) = 0 THEN 'und'
      |              WHEN c_de = greatest(c_de,c_en,c_es,c_fr) THEN 'de'
      |              WHEN c_en = greatest(c_de,c_en,c_es,c_fr) THEN 'en'
      |              WHEN c_es = greatest(c_de,c_en,c_es,c_fr) THEN 'es'
      |              ELSE 'fr' END AS predicted_lang
      |  FROM c)
      |""".stripMargin

  /** Shared DuckDB CTE: distinct word-3-gram shingles of documents. */
  private[graft] val shingleCte =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(lower(text),' ')) AS w,
      |         generate_subscripts(string_split(lower(text),' '),1) AS i
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT a.doc_id, a.w||' '||b.w||' '||c.w AS s
      |  FROM tok a
      |  JOIN tok b ON a.doc_id=b.doc_id AND b.i=a.i+1
      |  JOIN tok c ON a.doc_id=c.doc_id AND c.i=a.i+2),
      |nn AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |p AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
      |      FROM sh x JOIN sh y ON x.s=y.s AND x.doc_id<y.doc_id GROUP BY 1,2)
      |""".stripMargin

  private[graft] def jaccardOracle(tau: Double): String =
    shingleCte +
      s"""SELECT p.a AS doc_a, p.b AS doc_b,
         |       CAST(p.c AS DOUBLE)/(na.n+nb.n-p.c) AS jaccard
         |FROM p JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b
         |WHERE CAST(p.c AS DOUBLE)/(na.n+nb.n-p.c) >= $tau
         |ORDER BY doc_a, doc_b""".stripMargin

  /** SimHash oracle: recomputes the md5-hex 32-bit SimHash in SQL, so the
    * result set (Hamming ≤ 7 AND Jaccard ≥ tau) is exact by definition.
    */
  /** Shared simhash CTE chain (appended after [[shingleCte]]): recomputes
    * the 64-bit md5-hex SimHash digit-by-digit — bit 2k from digit bit 3
    * (≥ '8'), bit 2k+1 from digit bit 2 (4-7 or c-f), mirroring
    * Dedup.simhashCore exactly — ending in `ham` (all-pairs Hamming) and
    * `jac` (all-pairs exact Jaccard).
    */
  private[graft] lazy val simhashCtes: String = {
    def bitPred(k: Int): String = {
      val d = s"substring(md5(s),${k / 2 + 1},1)"
      if (k % 2 == 0) s"$d >= '8'"
      else s"(($d >= '4' AND $d <= '7') OR $d >= 'c')"
    }
    val bsums = (0 until 64)
      .map(k => s"SUM(CASE WHEN ${bitPred(k)} THEN 1 ELSE -1 END) AS b$k")
      .mkString(", ")
    val bits = (0 until 64)
      .map(k => s"CASE WHEN b$k > 0 THEN 1 ELSE 0 END AS t$k")
      .mkString(", ")
    val hamExpr = (0 until 64)
      .map(k => s"CASE WHEN x.t$k <> y.t$k THEN 1 ELSE 0 END")
      .mkString(" + ")
    s""", sig AS (SELECT doc_id, $bsums FROM sh GROUP BY doc_id),
       |bits AS (SELECT doc_id, $bits FROM sig),
       |ham AS (SELECT x.doc_id AS a, y.doc_id AS b, CAST($hamExpr AS BIGINT) AS hamming
       |        FROM bits x JOIN bits y ON x.doc_id < y.doc_id),
       |jac AS (SELECT p.a, p.b, CAST(p.c AS DOUBLE)/(na.n+nb.n-p.c) AS jaccard
       |        FROM p JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b)
       |""".stripMargin
  }

  private[graft] def simhashOracle(tau: Double, maxHamming: Int): String =
    shingleCte + simhashCtes +
      s"""SELECT jac.a AS doc_a, jac.b AS doc_b, jac.jaccard, ham.hamming
         |FROM jac JOIN ham ON ham.a=jac.a AND ham.b=jac.b
         |WHERE jac.jaccard >= $tau AND ham.hamming <= $maxHamming
         |ORDER BY doc_a, doc_b""".stripMargin

  /** Recall audit oracle: truth = exact Jaccard ≥ tau pairs, emitted =
    * those also within the Hamming radius (the simhash operator's
    * Jaccard-verified output is a subset of truth by construction).
    */
  private[graft] def simhashRecallOracle(tau: Double, maxHamming: Int): String =
    shingleCte + simhashCtes +
      s""", truth AS (
         |  SELECT ham.hamming
         |  FROM jac JOIN ham ON ham.a=jac.a AND ham.b=jac.b
         |  WHERE jac.jaccard >= $tau)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
         |       CAST(COALESCE(SUM(CASE WHEN hamming <= $maxHamming THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_emitted,
         |       CAST(COALESCE(SUM(CASE WHEN hamming > $maxHamming THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_missed,
         |       CAST(CASE WHEN COUNT(*) = 0 THEN 1000000
         |            ELSE (SUM(CASE WHEN hamming <= $maxHamming THEN 1 ELSE 0 END) * 1000000) // COUNT(*)
         |            END AS BIGINT) AS recall_ppm
         |FROM truth""".stripMargin

  /** SemDeDup knobs, shared by the `dedup_semantic*` Spark calls AND their
    * oracle SQL — hoisted so op/oracle parity cannot drift on a constant
    * edit (the oracle interpolates these; nothing is hard-coded twice).
    */
  private[graft] val semDedupK = 8
  private[graft] val semDedupIters = 2
  private[graft] val semDedupTau = 0.4
  // cross-split semantic-contamination threshold (dedup_semantic_contamination)
  private[graft] val semContamTau = 0.4

  /** Heavy-hitter support denominator: emit tokens with freq ≥ n_total/s.
    * Shared by the `text_heavy_hitters` operator call and its oracle's
    * HAVING clause so the threshold can't drift between engines.
    */
  private[graft] val heavyHitterS = 40

  /** Matryoshka audit prefix width — shared by the
    * `ann_matryoshka_recall` Spark call and its oracle CTEs. 48 of 64 on
    * the RANDOM fixture vectors sits mid-curve (mean recall ≈ 0.4, spread
    * across queries) — random embeddings decorrelate prefixes far faster
    * than trained Matryoshka ones, so smaller prefixes pin recall to 0
    * and audit nothing.
    */
  private[graft] val matryoshkaDims = 48

  /** Random-projection audit widths — shared by the `ann_rp_recall` Spark
    * call and its oracle CTEs. 48 of 64 matches the matryoshka row's
    * mid-curve intent on the random fixture (at 32 the measured recall
    * pins near 0 and audits nothing — random vectors decorrelate under
    * sign mixing even faster than under prefix truncation); `rpInDims`
    * must equal the fixture vector width —
    * [[graft.operators.Similarity.rpProject]] fixes the literal plane
    * length at plan time.
    */
  private[graft] val rpDims = 48
  private[graft] val rpInDims = 64

  /** Shared DuckDB CTE: embeddings flattened to (vec_id, i, v) + L2 norms. */
  /** Shared C4 oracle CTEs (`d` line synthesis, `k` kept lists) — opens
    * the WITH block; consumed by `text_c4_filter` and `text_filter_kappa`.
    */
  private[graft] lazy val c4OracleCtes =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         string_split(replace(replace(text, 'line ', 'line.' || chr(10)),
       |           'value ', 'value' || chr(10)), chr(10)) AS lines
       |  FROM documents),
       |k AS (
       |  SELECT doc_id, len(lines) AS n_lines,
       |         list_filter(lines, ${TextAnalysis.c4KeepLambdaSql()}) AS kept
       |  FROM d)""".stripMargin

  /** Shared Gopher oracle CTEs (`syn` structure synthesis, `m` token/line
    * lists, `c` integer rule counters) — NO leading `WITH`/comma, so the
    * standalone row prefixes `WITH ` and `text_filter_kappa` appends it
    * after the C4 chain.
    */
  private[graft] lazy val gopherOracleCtes =
    """syn AS (
      |  SELECT doc_id,
      |         replace(replace(replace(replace(text || ' ',
      |           'customer ', 'customer with '),
      |           'line ', 'line.' || chr(10)),
      |           'slow ', 'slow...' || chr(10)),
      |           'value ', chr(10) || '- value ') AS text
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '[ \n]'), w -> w <> '') AS ws,
      |    string_split(text, chr(10)) AS lines, text AS txt
      |  FROM syn),
      |c AS (
      |  SELECT doc_id,
      |    CAST(len(ws) AS BIGINT) AS n_words,
      |    CAST(list_sum(list_transform(ws, w -> strlen(w))) AS BIGINT) AS sum_word_len,
      |    CAST(strlen(txt) - strlen(replace(txt, '#', '')) AS BIGINT)
      |      + CAST((strlen(txt) - strlen(replace(txt, '...', ''))) / 3 AS BIGINT) AS n_symbols,
      |    CAST(len(lines) AS BIGINT) AS n_lines,
      |    CAST(len(list_filter(lines, l -> l LIKE '- %' OR l LIKE '* %')) AS BIGINT) AS n_bullet_lines,
      |    CAST(len(list_filter(lines, l -> l LIKE '%...')) AS BIGINT) AS n_ellipsis_lines,
      |    CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS n_alpha_words,
      |    CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
      |      w -> list_contains(ws, w))) AS BIGINT) AS stop_hits
      |  FROM m)""".stripMargin

  /** The Gopher keep predicate over `c`'s counters — shared by the
    * standalone row and the kappa row's verdict CTE.
    */
  private[graft] val gopherKeepSql =
    """(n_words BETWEEN 30 AND 120 AND sum_word_len BETWEEN 3*n_words AND 10*n_words
      |        AND n_symbols*100 <= n_words*10 AND n_bullet_lines*100 <= n_lines*40
      |        AND n_ellipsis_lines*100 <= n_lines*30 AND n_alpha_words*100 >= n_words*94
      |        AND stop_hits >= 2)""".stripMargin

  // f/nrm are MATERIALIZED: DuckDB inlines plain CTEs and re-derives the
  // full unnest per consumer — ann_* chains consume f three to five times
  // each, and the r12 driver gate OOMed on cumulative transient peak
  // (ann_lsh_topk / ann_lsh_banded_topk / ann_matryoshka_recall). Pinning
  // them to compute once bounds each oracle's footprint to one unnest.
  private[graft] val embCte =
    """WITH f AS MATERIALIZED (
      |  SELECT vec_id, CAST(u.e AS DOUBLE) AS v, u.i AS i
      |  FROM (SELECT vec_id, unnest(embedding) AS e,
      |               generate_subscripts(embedding,1) AS i FROM embeddings) u),
      |nrm AS MATERIALIZED (
      |  SELECT vec_id, sqrt(list_reduce(list(v*v ORDER BY i), (x,y) -> x+y)) AS nrm
      |  FROM f GROUP BY 1)
      |""".stripMargin

  /** Shared oracle CTEs for the dimension-moment family (appended after
    * `embCte`; consumed by `emb_dim_covariance` and `emb_pca_top`): the
    * emb_dim_stats micro-unit fencing, per-dim moments `st`, and the i<j
    * cross-moment self-join `p` — the oracle CAN afford the pair blowup at
    * fixture scale; the Spark side's GramMatrixAgg exists precisely so
    * production never pays it. Ends with a trailing newline, no comma.
    */
  /** Covariance scale divisor for `emb_pca_top` — shared by the Spark call
    * and the oracle's `//` CTE. 10⁹ keeps the fixture's off-diagonal mass
    * (|cov| down to ~7·10⁸ at n = 500) while every scaled entry stays far
    * below the 2⁵³ exactness boundary (max |covS| ≈ 4·10⁶ here; the
    * operator default 10¹² is the conservative large-corpus setting).
    */
  private[graft] val pcaCovDiv = 1000000000L

  /** Unrolled power-iteration oracle CTEs (appended after `covfull` and a
    * seed `v0`): each round is one exact integer mat-vec (`SUM(cv·x)`
    * HUGEINT, cast to DOUBLE only once the value is exactly
    * representable), an ORDERED list_reduce norm, and the micro-unit
    * re-fence — the identical fixed-order IEEE chain the Spark driver
    * loop runs. Emits trailing commas; consumers append the tail.
    */
  /** The BM25 ranking chain shared by `text_bm25_topk` (final cut) and
    * `ret_eval` (evaluation tail): identical association order everywhere
    * a double is touched; ln rounded to 6 dp per term, per-term
    * contributions rounded then decimal-summed (the lmScore discipline).
    * Ends at `rk` (per-query row_number), no trailing comma.
    */
  private[graft] lazy val bm25OracleCtes =
    """WITH q(query_id, q_text) AS (VALUES
      |  (0, 'fast table scan'), (1, 'join query order'),
      |  (2, 'stream window batch'), (3, 'slow merge'),
      |  (4, 'customer value vector'), (5, 'zebra hash')),
      |qt AS (SELECT query_id,
      |              unnest(list_distinct(string_split(lower(q_text), ' '))) AS term
      |       FROM q),
      |t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM t),
      |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl),
      |tok AS (SELECT doc_id, unnest(w) AS term FROM t),
      |p AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
      |      WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2),
      |dfq AS (SELECT term, COUNT(*) AS df FROM p GROUP BY 1),
      |contrib AS (
      |  SELECT qt.query_id, p.doc_id,
      |         ROUND(ROUND(ln(1.0 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)), 6) *
      |           (CAST(p.tf AS DOUBLE) * (1.2 + 1.0)) /
      |           (p.tf + 1.2 * (1.0 - 0.75 +
      |             0.75 * dl.dl / (CAST(s.total_dl AS DOUBLE) / s.n_docs))), 6) AS c
      |  FROM p
      |  JOIN qt USING (term) JOIN dfq USING (term) JOIN dl USING (doc_id)
      |  CROSS JOIN stats s),
      |sc AS (SELECT query_id, doc_id,
      |       ROUND(CAST(SUM(CAST(c AS DECIMAL(28,12))) AS DOUBLE), 6) AS score
      |       FROM contrib GROUP BY 1, 2),
      |rk AS MATERIALIZED (
      |       SELECT query_id, doc_id, score,
      |       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
      |       FROM sc)""".stripMargin

  /** The seasonal-decomposition chain shared by `q_seasonal_decompose`
    * (final select) and `q_seasonal_anomalies` (Hampel tail): hourly
    * decimal-fenced buckets, centered 24-row trend window (12 preceding,
    * 11 following), sign·abs divisions everywhere a value is signed,
    * per-phase detrended means. Ends at `seas`, no trailing comma.
    */
  /** The q_acf chain (n-scaled centered carrier → per-lag numerators +
    * per-key denominator), shared with q_ljung_box so the ACF algebra
    * cannot drift between the two oracles.
    */
  private[graft] lazy val acfOracleCtes: String =
    """WITH e AS (
      |  SELECT event_type,
      |         CAST(epoch_us(ts) // 86400000000 AS BIGINT) - 19723 AS b,
      |         CAST(floor(value * 100) AS BIGINT) AS v
      |  FROM events),
      |d AS (SELECT event_type, b, CAST(SUM(v) AS BIGINT) AS x
      |      FROM e GROUP BY 1, 2),
      |tt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |              CAST(SUM(x) AS BIGINT) AS t
      |       FROM d GROUP BY 1),
      |c AS (SELECT d.event_type, d.b, CAST(tt.n AS HUGEINT) * d.x - tt.t AS dd
      |      FROM d JOIN tt USING (event_type)),
      |den AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_buckets,
      |               SUM(dd * dd) AS den
      |        FROM c GROUP BY 1),
      |lg AS (SELECT c.event_type, r.lag_n, c.b + r.lag_n AS b, c.dd AS d_prev
      |       FROM c CROSS JOIN
      |         (SELECT CAST(range AS BIGINT) AS lag_n FROM range(1, 8)) r),
      |nm AS (SELECT c.event_type, lg.lag_n, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |              SUM(lg.d_prev * c.dd) AS num
      |       FROM c JOIN lg ON c.event_type = lg.event_type AND c.b = lg.b
      |       GROUP BY 1, 2),
      |acf AS (
      |  SELECT nm.event_type, nm.lag_n, den.n_buckets, nm.n_pairs,
      |         CAST(CASE WHEN den.den > 0 THEN CAST(sign(nm.num) AS BIGINT) *
      |              CAST((CAST(1000000 AS HUGEINT) * abs(nm.num)) // den.den
      |                AS BIGINT) END AS BIGINT) AS acf_ppm
      |  FROM nm JOIN den USING (event_type))""".stripMargin

  private[graft] lazy val seasonalOracleCtes =
    """WITH e AS (SELECT epoch_us(ts) // 3600000000 AS bucket,
      |                  CAST(value AS DECIMAL(18,4)) AS dv
      |           FROM events),
      |b AS MATERIALIZED (
      |      SELECT bucket, CAST(SUM(dv) * 10000 AS BIGINT) AS v
      |      FROM e GROUP BY 1),
      |base AS MATERIALIZED (
      |  SELECT bucket, v, bucket % 24 AS phase,
      |         COUNT(*) OVER win AS wn, SUM(v) OVER win AS wsum
      |  FROM b WINDOW win AS (ORDER BY bucket
      |    ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)),
      |t3 AS MATERIALIZED (
      |  SELECT bucket, v, phase, trend_e6, v * 1000000 - trend_e6 AS det_e6
      |  FROM (SELECT bucket, v, phase,
      |               CASE WHEN wn = 24 THEN CAST(sign(wsum) AS BIGINT) *
      |                    ((1000000 * abs(wsum)) // 24) END AS trend_e6
      |        FROM base)),
      |seas AS MATERIALIZED (
      |  SELECT phase, CAST(sign(SUM(det_e6)) AS BIGINT) *
      |         (abs(SUM(det_e6)) // COUNT(*)) AS seasonal_e6
      |  FROM t3 WHERE det_e6 IS NOT NULL GROUP BY 1)""".stripMargin

  /** One binary-segmentation level for the `q_cusum_segments` oracle:
    * `src`(bucket, v, seg) → `out` with the per-segment n·S_i peak split
    * applied — the exact algebra of [[graft.operators.Temporal
    * .cusumSegments]]'s loop body. MATERIALIZED per level (each level is
    * consumed by the next's four stacked windows).
    */
  private[graft] def cusumSegLevelSql(src: String, out: String,
      keyCols: Seq[String] = Nil): String = {
    val ks = keyCols.map(_ + ", ").mkString
    val part = (keyCols :+ "seg").mkString(", ")
    s"""$out AS MATERIALIZED (
       |  SELECT ${ks}bucket, v,
       |         CASE WHEN mx > 0 AND bucket > pb THEN pb + 1 ELSE seg END AS seg
       |  FROM (
       |    SELECT ${ks}bucket, v, seg, mx,
       |           MIN(CASE WHEN abs(cusum_n) = mx THEN bucket END)
       |             OVER (PARTITION BY $part) AS pb
       |    FROM (
       |      SELECT ${ks}bucket, v, seg, cusum_n,
       |             MAX(abs(cusum_n)) OVER (PARTITION BY $part) AS mx
       |      FROM (
       |        SELECT ${ks}bucket, v, seg,
       |               (COUNT(*) OVER (PARTITION BY $part)) *
       |               (SUM(v) OVER (PARTITION BY $part ORDER BY bucket
       |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |               - (row_number() OVER (PARTITION BY $part ORDER BY bucket)) *
       |                 (SUM(v) OVER (PARTITION BY $part)) AS cusum_n
       |        FROM $src))))""".stripMargin
  }

  // Every level here is MATERIALIZED: c_r is consumed by BOTH n_r and
  // v_r, so plain CTEs re-derive the full upstream chain (covfull → p's
  // 1M-row self-join) 2^r times — the DuckDB inline-per-consumer trap
  // that turned a 64-row-per-level power iteration into the gate's
  // worst memory hog. Pinned, each level is one 64-row table.
  private[graft] def pcaIterCtes(rounds: Int): String =
    (1 to rounds).map { r =>
      s"""c$r AS MATERIALIZED (
         |        SELECT cf.i, CAST(SUM(cf.cv * v.x) AS DOUBLE) AS comp
         |        FROM covfull cf JOIN v${r - 1} v ON v.i = cf.j GROUP BY 1),
         |n$r AS MATERIALIZED (
         |        SELECT sqrt(list_reduce(list(comp*comp ORDER BY i), (a,b) -> a+b)) AS nrm
         |        FROM c$r),
         |v$r AS MATERIALIZED (
         |        SELECT i, CAST(sign(comp) * floor(abs(comp / nrm) * 1000000 + 0.5) AS HUGEINT) AS x
         |        FROM c$r, n$r),
         |""".stripMargin
    }.mkString

  // st and p are MATERIALIZED: covfull's three-way UNION references each
  // twice-plus, and p is the d²·N-row moment self-join — re-deriving it
  // per consumer is the transient-peak shape the r12 driver OOM taught.
  private[graft] val dimMomentCtes =
    """, g AS (
      |  SELECT vec_id, CAST(i AS BIGINT) AS i,
      |         CAST(sign(v) * floor(abs(v)*1000000 + 0.5) AS BIGINT) AS v6
      |  FROM f),
      |st AS MATERIALIZED (
      |  SELECT i, CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(v6) AS HUGEINT) AS s1,
      |         CAST(SUM(v6*v6) AS HUGEINT) AS s2
      |  FROM g GROUP BY 1),
      |p AS MATERIALIZED (
      |  SELECT a.i AS i, b.i AS j, CAST(SUM(a.v6*b.v6) AS HUGEINT) AS s_ij
      |  FROM g a JOIN g b ON a.vec_id = b.vec_id AND a.i < b.i
      |  GROUP BY 1, 2)
      |""".stripMargin

  /** Shared oracle CTE chain for the trained-IVF SERVING path (appended
    * after `embCte` + `kmeansOracleCtes(4, 2)`): final cell assignment,
    * nprobe=2 query cells (vec_id < 10), cell-join candidates, exact
    * rescoring, rank (`rr`). Ends WITHOUT a trailing comma: consumers
    * append the final SELECT (`ann_ivf_trained_topk`) or `,bd AS …`
    * (`ann_recall_eval`'s brute chain + recall join).
    */
  private[graft] lazy val ivfTrainedServeCtes =
    """,
      |dfin AS (
      |  SELECT f.vec_id, c2.cell, list_reduce(list(f.v*c2.m ORDER BY f.i), (x,y) -> x+y) AS dot
      |  FROM f JOIN c2 ON f.i=c2.i GROUP BY 1,2),
      |rfin AS MATERIALIZED (
      |  SELECT dfin.vec_id, dfin.cell,
      |         row_number() OVER (PARTITION BY dfin.vec_id
      |           ORDER BY ROUND(dfin.dot/(nrm.nrm*cn2.cnrm),4) DESC, dfin.cell) AS rn
      |  FROM dfin JOIN nrm ON nrm.vec_id=dfin.vec_id
      |            JOIN cn2 ON cn2.cell=dfin.cell),
      |ncell AS MATERIALIZED (SELECT vec_id, cell FROM rfin WHERE rn = 1),
      |qcell AS MATERIALIZED (SELECT vec_id, cell FROM rfin WHERE rn <= 2 AND vec_id < 10),
      |cand AS MATERIALIZED (
      |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id
      |  FROM qcell q JOIN ncell n ON q.cell=n.cell AND q.vec_id<>n.vec_id),
      |dd AS (
      |  SELECT c.query_id, c.neighbor_id, list_reduce(list(a.v*b.v ORDER BY a.i), (x,y) -> x+y) AS dot
      |  FROM cand c
      |  JOIN f a ON a.vec_id=c.query_id
      |  JOIN f b ON b.vec_id=c.neighbor_id AND a.i=b.i
      |  GROUP BY 1,2),
      |ss AS (
      |  SELECT query_id, neighbor_id, ROUND(dot/(nq.nrm*nn2.nrm),4)+0.0 AS score
      |  FROM dd JOIN nrm nq ON nq.vec_id=dd.query_id
      |          JOIN nrm nn2 ON nn2.vec_id=dd.neighbor_id),
      |rr AS (
      |  SELECT query_id, neighbor_id, score,
      |         CAST(row_number() OVER (PARTITION BY query_id
      |                                 ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
      |  FROM ss)
      |""".stripMargin

  /** Shared oracle CTE chain for the banded-LSH SERVING path (appended
    * after `embCte`): sign-bit plane dots, 2 bands × 2 bits buckets,
    * band-OR candidates (vec_id < 10 queries), exact rescoring, rank
    * (`rr`). Ends WITHOUT a trailing comma — consumers append the top-k
    * SELECT (`ann_lsh_banded_topk`) or [[recallTailCtes]]
    * (`ann_recall_eval_lsh`).
    */
  private[graft] lazy val lshBandedServeCtes =
    """, hp AS MATERIALIZED (SELECT vec_id AS plane_id, i, v FROM f WHERE vec_id < 4),
      |pd AS (
      |  SELECT f.vec_id, hp.plane_id, list_reduce(list(f.v*hp.v ORDER BY f.i), (x,y) -> x+y) AS d
      |  FROM f JOIN hp ON f.i=hp.i GROUP BY 1,2),
      |bkb AS MATERIALIZED (
      |  SELECT vec_id, CAST(floor(plane_id/2.0) AS BIGINT) AS band,
      |         CAST(SUM(CASE WHEN d > 0 THEN 1<<(plane_id % 2) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM pd GROUP BY 1,2),
      |cand AS MATERIALIZED (
      |  SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
      |  FROM bkb q JOIN bkb n ON q.band=n.band AND q.bucket=n.bucket
      |  WHERE q.vec_id<10 AND q.vec_id<>n.vec_id),
      |dd AS (
      |  SELECT c.query_id, c.neighbor_id, list_reduce(list(a.v*b.v ORDER BY a.i), (x,y) -> x+y) AS dot
      |  FROM cand c
      |  JOIN f a ON a.vec_id=c.query_id
      |  JOIN f b ON b.vec_id=c.neighbor_id AND a.i=b.i
      |  GROUP BY 1,2),
      |ss AS (
      |  SELECT query_id, neighbor_id, ROUND(dot/(nq.nrm*nn2.nrm),4)+0.0 AS score
      |  FROM dd JOIN nrm nq ON nq.vec_id=dd.query_id
      |          JOIN nrm nn2 ON nn2.vec_id=dd.neighbor_id),
      |rr AS MATERIALIZED (
      |  SELECT query_id, neighbor_id, score,
      |         CAST(row_number() OVER (PARTITION BY query_id
      |                                 ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
      |  FROM ss)
      |""".stripMargin

  /** Shared oracle recall tail (appended after any serving chain that
    * defines `rr` with a `rnk` column): a fresh-named brute-force exact
    * chain over the same queries (`bd`/`bs`/`br`, ordered dot folds),
    * then the exact-set left join and per-query hit count — the
    * [[graft.operators.Similarity.recallAt]] semantics. Family-agnostic
    * by construction: `ann_recall_eval` appends it to the trained-IVF
    * chain, `ann_recall_eval_lsh` to the banded-LSH chain.
    */
  private[graft] lazy val recallTailCtes =
    """,bd AS MATERIALIZED (
      |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, list_reduce(list(q.v*n.v ORDER BY q.i), (x,y) -> x+y) AS dot
      |  FROM f q JOIN f n ON q.i=n.i AND q.vec_id<10 AND q.vec_id<>n.vec_id
      |  GROUP BY 1,2),
      |bs AS (
      |  SELECT query_id, neighbor_id, ROUND(dot/(nq.nrm*nn2.nrm),4)+0.0 AS score
      |  FROM bd JOIN nrm nq ON nq.vec_id=bd.query_id
      |          JOIN nrm nn2 ON nn2.vec_id=bd.neighbor_id),
      |br AS (
      |  SELECT query_id, neighbor_id,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY score DESC, neighbor_id) AS rnk
      |  FROM bs)
      |SELECT e.query_id, COUNT(*) AS k_exact,
      |       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
      |       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |         / COUNT(*) AS recall
      |FROM (SELECT query_id, neighbor_id FROM br WHERE rnk <= 3) e
      |LEFT JOIN (SELECT query_id, neighbor_id FROM rr WHERE rnk <= 3) a
      |       ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
      |GROUP BY 1 ORDER BY e.query_id""".stripMargin

  /** Shared oracle CTE chain for the BINARY-quantization serving path
    * (appended after `embCte`): sign-bit code packing into two BIGINT
    * halves (1-based `i` — bit i−1; the hi/lo split keeps bit 63 out of
    * the long sign position), integer Hamming via per-half
    * `bit_count(xor(...))`, top-20 Hamming shortlist, exact-cosine
    * rerank, rank (`rr`). Ends WITHOUT a trailing comma — consumers
    * append the final SELECT (`ann_binary_topk`) or [[recallTailCtes]]
    * (`ann_recall_eval_binary`).
    */
  private[graft] lazy val binaryCodesCte =
    """,bc AS (
      |  SELECT vec_id,
      |         CAST(SUM(CASE WHEN i <= 32 AND v > 0 THEN (CAST(1 AS BIGINT) << (i-1)) ELSE 0 END) AS BIGINT) AS code_lo,
      |         CAST(SUM(CASE WHEN i >= 33 AND v > 0 THEN (CAST(1 AS BIGINT) << (i-33)) ELSE 0 END) AS BIGINT) AS code_hi
      |  FROM f GROUP BY 1)
      |""".stripMargin

  /** Tail of the binary serving oracles (consumes any `hm` of
    * (query_id, neighbor_id, hamming)): Hamming shortlist (top-20),
    * exact-cosine rerank, rank (`rr`) — shared by the exhaustive
    * (`ann_binary_topk`) and banded (`ann_binary_banded_topk`) chains.
    */
  private[graft] lazy val binaryTailCtes =
    """,shb AS (
      |  SELECT query_id, neighbor_id, hamming,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY hamming, neighbor_id) AS hrnk
      |  FROM hm),
      |cnb AS (SELECT query_id, neighbor_id, hamming FROM shb WHERE hrnk <= 20),
      |ddb AS (
      |  SELECT c.query_id, c.neighbor_id, c.hamming,
      |         list_reduce(list(a.v*b.v ORDER BY a.i), (x,y) -> x+y) AS dot
      |  FROM cnb c
      |  JOIN f a ON a.vec_id=c.query_id
      |  JOIN f b ON b.vec_id=c.neighbor_id AND a.i=b.i
      |  GROUP BY 1,2,3),
      |ssb AS (
      |  SELECT query_id, neighbor_id, hamming,
      |         ROUND(dot/(nq.nrm*nn2.nrm),4)+0.0 AS score
      |  FROM ddb JOIN nrm nq ON nq.vec_id=ddb.query_id
      |           JOIN nrm nn2 ON nn2.vec_id=ddb.neighbor_id),
      |rr AS (
      |  SELECT query_id, neighbor_id, hamming, score,
      |         CAST(row_number() OVER (PARTITION BY query_id
      |                                 ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
      |  FROM ssb)
      |""".stripMargin

  /** Exhaustive binary chain: codes + all-pairs Hamming + shared tail. */
  private[graft] lazy val binaryServeCtes = binaryCodesCte +
    """,hm AS (
      |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
      |         CAST(bit_count(xor(q.code_lo, n.code_lo)) AS BIGINT)
      |         + CAST(bit_count(xor(q.code_hi, n.code_hi)) AS BIGINT) AS hamming
      |  FROM bc q JOIN bc n ON q.vec_id < 10 AND q.vec_id <> n.vec_id)
      |""".stripMargin + binaryTailCtes

  /** Banded binary chain: codes + byte-slice band collisions (8 bands ×
    * 8 bits — the simhash pigeonhole) restrict the Hamming stage to
    * candidates, then the shared tail.
    */
  private[graft] lazy val binaryBandedServeCtes = binaryCodesCte +
    """,sl AS (
      |  SELECT vec_id, j.j AS band,
      |         CASE WHEN j.j < 4 THEN (code_lo >> (j.j*8)) & 255
      |              ELSE (code_hi >> ((j.j-4)*8)) & 255 END AS bval
      |  FROM bc, range(0,8) j(j)),
      |cdb AS (
      |  SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
      |  FROM sl q JOIN sl n ON q.band=n.band AND q.bval=n.bval
      |  WHERE q.vec_id < 10 AND q.vec_id <> n.vec_id),
      |hm AS (
      |  SELECT c.query_id, c.neighbor_id,
      |         CAST(bit_count(xor(q.code_lo, n.code_lo)) AS BIGINT)
      |         + CAST(bit_count(xor(q.code_hi, n.code_hi)) AS BIGINT) AS hamming
      |  FROM cdb c JOIN bc q ON q.vec_id=c.query_id
      |             JOIN bc n ON n.vec_id=c.neighbor_id)
      |""".stripMargin + binaryTailCtes

  /** Oracle tail for `ann_nprobe_sweep` (appended after `embCte` +
    * `kmeansOracleCtes` + [[ivfTrainedServeCtes]], reusing its `rfin` /
    * `ncell`; DuckDB inlines CTEs, so the serve chain's unreferenced
    * `qcell`/`cand`/`dd`/`ss`/`rr` are never executed): ranked probe
    * assignment (`rn` IS the probe rank), shared scoring paid once at
    * maxNprobe = 3, `range(1,4)` sweep fan-out, per-point re-rank, and
    * the micro-averaged recall tail against the brute baseline — the
    * [[graft.operators.Similarity.nprobeSweep]] semantics, value-exact.
    */
  private[graft] lazy val nprobeSweepTailCtes =
    """,qcellp AS MATERIALIZED (
      |  SELECT vec_id, cell, CAST(rn AS BIGINT) AS probe_rank
      |  FROM rfin WHERE rn <= 3 AND vec_id < 10),
      |candp AS MATERIALIZED (
      |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, q.probe_rank
      |  FROM qcellp q JOIN ncell n ON q.cell=n.cell AND q.vec_id<>n.vec_id),
      |ddp AS (
      |  SELECT c.query_id, c.neighbor_id, c.probe_rank,
      |         list_reduce(list(a.v*b.v ORDER BY a.i), (x,y) -> x+y) AS dot
      |  FROM candp c
      |  JOIN f a ON a.vec_id=c.query_id
      |  JOIN f b ON b.vec_id=c.neighbor_id AND a.i=b.i
      |  GROUP BY 1,2,3),
      |ssp AS (
      |  SELECT query_id, neighbor_id, probe_rank,
      |         ROUND(dot/(nq.nrm*nn2.nrm),4)+0.0 AS score
      |  FROM ddp JOIN nrm nq ON nq.vec_id=ddp.query_id
      |           JOIN nrm nn2 ON nn2.vec_id=ddp.neighbor_id),
      |sw AS (SELECT np.np AS nprobe, s.query_id, s.neighbor_id, s.score
      |       FROM range(1,4) np(np) JOIN ssp s ON s.probe_rank <= np.np),
      |rrp AS (
      |  SELECT nprobe, query_id, neighbor_id,
      |         row_number() OVER (PARTITION BY nprobe, query_id
      |                            ORDER BY score DESC, neighbor_id) AS rnk
      |  FROM sw),
      |topa AS MATERIALIZED (SELECT nprobe, query_id, neighbor_id FROM rrp WHERE rnk <= 3),
      |bd AS MATERIALIZED (
      |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
      |         list_reduce(list(q.v*n.v ORDER BY q.i), (x,y) -> x+y) AS dot
      |  FROM f q JOIN f n ON q.i=n.i AND q.vec_id<10 AND q.vec_id<>n.vec_id
      |  GROUP BY 1,2),
      |bs AS (
      |  SELECT query_id, neighbor_id, ROUND(dot/(nq.nrm*nn2.nrm),4)+0.0 AS score
      |  FROM bd JOIN nrm nq ON nq.vec_id=bd.query_id
      |          JOIN nrm nn2 ON nn2.vec_id=bd.neighbor_id),
      |br AS (
      |  SELECT query_id, neighbor_id,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY score DESC, neighbor_id) AS rnk
      |  FROM bs),
      |ex AS (SELECT query_id, neighbor_id FROM br WHERE rnk <= 3),
      |cn AS (SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS n_cands FROM sw GROUP BY 1),
      |hv AS (
      |  SELECT np.np AS nprobe, e.query_id,
      |         CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
      |  FROM range(1,4) np(np) CROSS JOIN ex e
      |  LEFT JOIN topa a ON a.nprobe=np.np AND a.query_id=e.query_id
      |                  AND a.neighbor_id=e.neighbor_id)
      |SELECT h.nprobe,
      |       CAST(COUNT(DISTINCT h.query_id) AS BIGINT) AS n_queries,
      |       cn.n_cands,
      |       CAST(SUM(h.hit) AS BIGINT) AS sum_hits,
      |       CAST(COUNT(*) AS BIGINT) AS sum_exact,
      |       ROUND(CAST(SUM(h.hit) AS DOUBLE)/COUNT(*),4)+0.0 AS recall
      |FROM hv h JOIN cn ON cn.nprobe=h.nprobe
      |GROUP BY 1, cn.n_cands ORDER BY 1""".stripMargin

  /** Shared oracle CTE chain for the SEMANTIC dedup family (appended after
    * `embCte` + `kmeansOracleCtes`): final cluster assignment with ordered
    * dot folds → in-cluster pair scan → per-row min-lower-id dup verdicts
    * (`ncell`, `dup`). All dots are ordered `list_reduce` folds mirroring
    * the Spark side's left-assoc ArrayDotProduct / NearestCentroidCells
    * fold bit-for-bit — an unordered SUM can flip the 4th rounded decimal
    * on boundary values and cascade into different keep/dup_of flags.
    * Ends WITHOUT a trailing comma: consumers append either the final
    * SELECT (`dedup_semantic`) or `,e AS …` (`dedup_semantic_rep`).
    */
  /** Final-assignment CTEs under a 2-round Lloyd's replay (`dfin` →
    * `rfin` → `ncell`) — the piece of [[semDedupPairCtes]] every
    * cell-reading oracle shares (k is whatever the preceding
    * `kmeansOracleCtes` built; these reference its `c2`/`cn2`). Ends
    * WITHOUT a trailing comma.
    */
  private[graft] lazy val kmeansFinalAssignCtes =
    s""",
      |dfin AS (
      |  SELECT f.vec_id, c2.cell,
      |         list_reduce(list(f.v*c2.m ORDER BY f.i), (x,y) -> x+y) AS dot
      |  FROM f JOIN c2 ON f.i=c2.i GROUP BY 1,2),
      |rfin AS (
      |  SELECT dfin.vec_id, dfin.cell,
      |         row_number() OVER (PARTITION BY dfin.vec_id
      |           ORDER BY ROUND(dfin.dot/(nrm.nrm*cn2.cnrm),4) DESC, dfin.cell) AS rn
      |  FROM dfin JOIN nrm ON nrm.vec_id=dfin.vec_id
      |            JOIN cn2 ON cn2.cell=dfin.cell),
      |ncell AS MATERIALIZED (SELECT vec_id, cell FROM rfin WHERE rn = 1)""".stripMargin

  private[graft] lazy val semDedupPairCtes =
    kmeansFinalAssignCtes + s""",
      |prs AS MATERIALIZED (
      |  SELECT ca.vec_id AS id_a, cb.vec_id AS id_b
      |  FROM ncell ca JOIN ncell cb ON cb.cell=ca.cell AND cb.vec_id < ca.vec_id),
      |pd AS MATERIALIZED (
      |  SELECT prs.id_a, prs.id_b,
      |         list_reduce(list(a.v*b.v ORDER BY a.i), (x,y) -> x+y) AS dot
      |  FROM prs
      |  JOIN f a ON a.vec_id=prs.id_a
      |  JOIN f b ON b.vec_id=prs.id_b AND b.i=a.i
      |  GROUP BY 1,2),
      |sc AS MATERIALIZED (
      |  SELECT pd.id_a, pd.id_b, ROUND(pd.dot/(na.nrm*nb.nrm),4)+0.0 AS cosine
      |  FROM pd JOIN nrm na ON na.vec_id=pd.id_a
      |          JOIN nrm nb ON nb.vec_id=pd.id_b),
      |dup AS (
      |  SELECT id_a, MIN(id_b) AS dup_of, MAX(cosine) AS max_cosine
      |  FROM sc WHERE cosine >= $semDedupTau GROUP BY 1)
      |""".stripMargin

  /** Full-recompute reachability over ALL qualifying near-dup pairs —
    * shared by `dedup_components` and `dedup_components_incremental` (the
    * incremental merge's value contract is exact equality with this).
    */
  /** [[shingleCte]] with its three consumed-more-than-once stages pinned
    * MATERIALIZED — `sh` feeds nn AND both sides of p's self-join, and
    * the recursive `reach` re-reads `e` every iteration, so plain CTEs
    * re-derive the shingle self-join per fixpoint round (the r12
    * oracle-OOM shape). Applied only where every stage IS consumed:
    * DuckDB evaluates MATERIALIZED CTEs even when unreferenced, so the
    * shared [[shingleCte]] itself stays plain for the single-pass rows.
    */
  private[graft] lazy val shingleCteMat = shingleCte
    .replace("sh AS (", "sh AS MATERIALIZED (")
    .replace("nn AS (SELECT", "nn AS MATERIALIZED (SELECT")
    .replace("p AS (SELECT x.doc_id", "p AS MATERIALIZED (SELECT x.doc_id")

  private[graft] lazy val componentsOracleCtes =
    shingleCteMat.replaceFirst("^WITH ", "WITH RECURSIVE ") +
      """,qp AS MATERIALIZED (
        |  SELECT p.a, p.b FROM p
        |  JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b
        |  WHERE CAST(p.c AS DOUBLE)/(na.n+nb.n-p.c) >= 0.6),
        |e AS MATERIALIZED (SELECT a AS src, b AS dst FROM qp UNION ALL SELECT b, a FROM qp),
        |reach(node, lbl) AS (
        |  SELECT DISTINCT src, src FROM e
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node)""".stripMargin

  private[graft] lazy val componentsOracle =
    componentsOracleCtes +
      """
        |SELECT node AS doc_id, MIN(lbl) AS component
        |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin

  def oracleSql: Map[String, String] =
    registryParts.flatMap(_._2).toMap
}
