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
  private val eventsSchema =
    "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") s.read.schema(eventsSchema).parquet(s"$dir/$name.parquet")
    else s.read.parquet(s"$dir/$name.parquet")

  /** Exact order-insensitive sum of a double column, returned as double. */
  private def dsum(c: Column, scale: Int = 4): Column =
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
  private final class CachedFrame(val df: DataFrame, val bytes: Long) {
    val lastUse = new java.util.concurrent.atomic.AtomicLong(0L)
  }

  private val artifactCache =
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
  private val useTick = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Evictions performed so far — bench telemetry. */
  private val evictionCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** (live artifact frames, resident bytes, evictions so far) across all
    * sessions — the bench residency line.
    */
  def artifactResidency(): (Int, Long, Long) = {
    var n = 0; var b = 0L
    artifactCache.values().forEach { e => n += 1; b += e.bytes }
    (n, b, evictionCount.get())
  }

  private def unpersistQuietly(df: DataFrame): Unit =
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
  private def enforceArtifactBudget(keep: String): Unit = {
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
  private def cachedPlanBytes(df: DataFrame): Long =
    try {
      val s = df.queryExecution.optimizedPlan.stats.sizeInBytes
      if (s.isValidLong) s.toLong else Long.MaxValue
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
  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  private def sessionKey(s: SparkSession): String =
    sessionIds.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)

  // Memoized frames strongly reference their SparkSession through the
  // persisted plan, so WITHOUT an eviction hook a stopped session (and
  // every artifact built on it) would stay reachable until someone calls
  // invalidateArtifactCaches() by hand. A listener on the session's
  // context drops that session's cache entries at application end; the
  // blocks themselves die with the context, so only the references need
  // releasing there.
  private val cleanupRegistered =
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

  private def dropSessionCaches(key: String): Unit = {
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

  private def registerSessionCleanup(s: SparkSession): Unit = {
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

  /** Memoize `build`'s result as a materialized, lineage-cut, persisted
    * table keyed on (session, dir, name). The lineage cut
    * (`createDataFrame(rdd, schema)`) makes the cached frame independent
    * of any operator-internal persisted frames the build registered
    * (which `Dedup.uncacheAll()` drops between rows) and keeps consumer
    * plans constant-size.
    */
  private def memoFrame(s: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame = {
    // NOT computeIfAbsent: builds nest (lshComponents builds FROM
    // lshPairs), and a recursive computeIfAbsent on one ConcurrentHashMap
    // is undefined (IllegalStateException or a stuck bin, depending on
    // where the keys hash). Get-then-putIfAbsent holds no lock during the
    // build; a concurrent duplicate build is benign — the loser unpersists
    // its copy and adopts the winner's.
    registerSessionCleanup(s)
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
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  private def memoModel[T <: AnyRef](s: SparkSession, dir: String,
      name: String)(build: => T): T = {
    registerSessionCleanup(s)
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
  private def coarseCents4(s: SparkSession, dir: String): DataFrame =
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
  private def pqModel2(s: SparkSession, dir: String,
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
  private def preparedEmb(s: SparkSession, dir: String): DataFrame =
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
  private def pqCodes(s: SparkSession, dir: String,
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
  private def incidenceEdges(s: SparkSession, dir: String): DataFrame =
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
  private def partCoEdges(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "partCoEdges") {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
    }

  /** Per-node triangle counts over [[partCoEdges]] — the expensive
    * degree-oriented wedge-closing pass `q_triangle_counts` censuses and
    * `q_clustering_coeff` normalizes; one count, two readers.
    */
  private def triCounts(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "triCounts") {
      Graph.triangleCounts(partCoEdges(s, dir))
    }

  /** The degree-annotated directed edge frame (`src, dst, deg(src)` —
    * both directions) the damped-iteration family walks: `q_pagerank`
    * and `q_ppr` run the same |E|-row degree join before their
    * iterations; one build, two consumers. [[prDeg]] derives the degree
    * table from it (every edge endpoint appears as `src`).
    */
  private def prEdges(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "prEdges") {
      Graph.degreeAnnotatedEdges(incidenceEdges(s, dir))._1
    }

  private def prDeg(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "prDeg") {
      prEdges(s, dir).select(col("src"), col("deg")).distinct()
    }

  private def lpaLabels(s: SparkSession, dir: String): DataFrame =
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
  private def lshPairs(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "lshPairs") {
      Dedup.minhashLshPairs(t(s, dir, "documents"), n = 3, tau = 0.6)
    }

  /** The semDedup verdict frame at the registry parameterization —
    * `dedup_semantic` deliberately prices the full train→cluster→prune
    * build itself (the minhash-LSH canonical-row discipline);
    * `dedup_semantic_rep` and `q_crossmodal_agreement` are its
    * serve-side consumers.
    */
  private def semDedupArt(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "semDedup") {
      Similarity.semDedup(t(s, dir, "embeddings"),
        k = semDedupK, iters = semDedupIters, tau = semDedupTau)
    }

  /** The window-5 / support-20 PMI collocation table —
    * `text_collocations` publishes it, `text_textrank` builds its word
    * graph from it; one co-occurrence scan instead of two.
    */
  private def collocationsArt(s: SparkSession, dir: String): DataFrame =
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
  private def simhashPairsArt(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "simhashPairs") {
      Dedup.simhashPairs(t(s, dir, "documents"), n = 3, tau = 0.6,
        maxHamming = 6)
    }

  /** The exact n-gram Jaccard truth pair set at the registry
    * parameterization (n = 3, tau = 0.6) — `dedup_ngram_jaccard`
    * deliberately prices the full inverted-index build itself (the
    * minhash-LSH canonical-row discipline); `dedup_simhash_recall`'s
    * truth side is its serve-side consumer (the recall audit previously
    * re-derived this whole set per call — the r15 simhash-trio
    * cost finding).
    */
  private def ngramTruthArt(s: SparkSession, dir: String): DataFrame =
    memoFrame(s, dir, "ngramTruth") {
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 3, tau = 0.6)
    }

  /** The blocked-Levenshtein candidate pair set over `customer` at the
    * registry parameterization — `q_fuzzy_blocked` publishes it,
    * `q_entity_resolution` clusters it; one (nation, segment)-blocked
    * DP scan instead of two.
    */
  private def fuzzyPairs(s: SparkSession, dir: String): DataFrame =
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
  private def lshComponents(s: SparkSession, dir: String): DataFrame =
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
  private val bpeMergeCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(Long, String, String, Long)]]()
  private def bpeMerges(s: SparkSession, dir: String): Seq[(Long, String, String, Long)] = {
    registerSessionCleanup(s)
    bpeMergeCache.computeIfAbsent(s"${sessionKey(s)}:$dir", _ =>
      TextAnalysis.bpeVocab(t(s, dir, "documents"), merges = 4)
        .orderBy(col("merge_round")).collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))))
  }

  /** '/'-joined key with NULL-PROPAGATING semantics: one null segment nulls
    * the whole key, exactly like the oracle's `||`. (concat_ws would skip
    * null segments and silently diverge from the oracle on null inputs —
    * the fixtures are null-free today, but the semantics should not depend
    * on that.)
    */
  private def slashKey(cols: Column*): Column =
    concat(cols.map(_.cast("string")).flatMap(c => Seq(c, lit("/"))).dropRight(1): _*)

  /** The documents fixture carries no URL column, so the hygiene rows
    * derive a deterministic MESSY url per doc — five variant families
    * (clean / upper+www+trailing-slash / default-port+utm / id-param+utm+
    * fragment / other-domain+port+fbclid) chosen so canonicalization
    * genuinely merges cross-family (same path, different mess) and the
    * domain filter has a blocked family. The oracle builds the identical
    * CASE.
    */
  private def withSyntheticUrl(docs: DataFrame): DataFrame = {
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
          concat(lit("https://example.com/articles/"), p, lit("?id="), q,
            lit("&utm_campaign=x#frag")))
        .otherwise(
          concat(lit("http://tracker.example.org:80/articles/"), p,
            lit("?fbclid=abc")))
        .as("url"))
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("du_by_address")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -------- parity: the reference pipeline (SURVEY §2.1-2.4, §2.8)
    "du_by_address" -> ((s, dir) => {
      // handler.go:170-252 end-to-end: scan → project → malformed filter →
      // split key → SUM/COUNT by address. Key synthesized as
      // user_id/event_type/event_id to exercise the split exactly.
      val inv = t(s, dir, "events").select(
        slashKey(col("user_id"), col("event_type"), col("event_id")).as("key"),
        col("value").as("size"))
      DiskUsageOp.aggregateFractional(inv).orderBy(col("address"))
    }),
    "du_group_by_user" -> ((s, dir) =>
      // A1 in its pure form (handler.go:231-251): hash group-by, SUM + COUNT.
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(dsum(col("value")).as("total_value"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))),
    "du_gini" -> ((s, dir) =>
      // how unevenly is usage spread across addresses: exact-ppm Gini
      // over the A1 per-user rollup (x10k micro-units) — the ordered
      // fold runs on the UNIT frame, never raw objects
      Hygiene.giniIndex(
        t(s, dir, "events")
          .select(col("user_id"),
            (col("value").cast(DecimalType(18, 4)) * 10000)
              .cast("long").as("v"))
          .groupBy(col("user_id")).agg(sum(col("v")).as("v")),
        "v")),
    "du_point_lookup" -> ((s, dir) => {
      // GetDiskUsage equality probe (handler.go:257-262) as an engine predicate.
      val inv = t(s, dir, "events").select(
        slashKey(col("user_id"), col("event_type"), col("event_id")).as("key"),
        col("value").as("size"))
      DiskUsageOp.aggregateFractional(inv)
        .filter(col("address") === lit("42"))
        .orderBy(col("address"))
    }),
    "du_malformed_filter" -> ((s, dir) =>
      // P2 (handler.go:234-238): drop keys without '/'.
      t(s, dir, "events")
        .select(
          col("event_id"),
          when(col("event_id") % 7 === 0, col("event_type"))
            .otherwise(slashKey(col("user_id"), col("event_id"))).as("key"))
        .filter(col("key").contains("/"))
        .orderBy(col("event_id"))),
    "du_path_extract" -> ((s, dir) =>
      // F1-F3 (handler.go:109-115,234,239): segment extraction + prefix strip.
      t(s, dir, "events")
        .select(
          col("event_id"),
          slashKey(col("user_id"), col("event_type"), col("event_id")).as("key"))
        .select(
          col("event_id"),
          substring_index(col("key"), "/", 1).as("address"),
          element_at(split(col("key"), "/"), 2).as("mid_segment"),
          element_at(split(col("key"), "/"), 3).as("leaf_segment"),
          regexp_replace(concat(lit("s3://bkt/"), col("key")), "^s3://", "").as("stripped"))
        .orderBy(col("event_id"))),
    "du_date_ops" -> ((s, dir) =>
      // F4-F7 (handler.go:105-125): 01:00-UTC pin, Go-layout format, date-1.
      t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("order_day"))
        .agg(count(lit(1)).as("n_orders"))
        .select(
          col("order_day"),
          (col("order_day").cast("timestamp") + expr("INTERVAL 1 HOUR")).as("pinned_ts"),
          concat(
            lit("inv/"),
            date_format(col("order_day").cast("timestamp") + expr("INTERVAL 1 HOUR"),
              "yyyy-MM-dd'T'HH-mm'Z'"),
            lit("/manifest.json")).as("manifest_key"),
          date_sub(col("order_day"), 1).as("prev_day"),
          col("n_orders"))
        .orderBy(col("order_day"))),
    "du_union_all" -> ((s, dir) => {
      // §2.8: the implicit UNION ALL of per-manifest-file scans.
      val e = t(s, dir, "events")
      e.filter(col("value") < 5)
        .unionAll(e.filter(col("value") >= 5))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),
    "du_projection_pushdown" -> ((s, dir) =>
      // P1 (handler.go:205-221): 2-column projection + predicate, both pushed
      // into the parquet scan by Catalyst (verified in plan tests).
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(100)),

    // -------- relational breadth (engine library beyond the reference)
    "q_zorder_layout" -> ((s, dir) =>
      // data-layout audit: Morton-interleave (l_orderkey, l_partkey),
      // bucket by the key's top bits (each bucket = one would-be file of
      // a clustered write) and emit the per-bucket min/max rectangle —
      // the zone-map statistics two-column file skipping runs on. The
      // oracle's Morton arithmetic comes from Layout.zOrderSql with the
      // same parameters; an EngineSpec pin holds the column fold and the
      // SQL string value-identical.
      Layout.zOrderStats(t(s, dir, "lineitem"), "l_orderkey", "l_partkey",
          bits = 16, bucketShift = 20)
        .orderBy(col("z_bucket"))),
    "q_hilbert_layout" -> ((s, dir) =>
      // the same zone-map audit on the HILBERT key: one row-local
      // bit-round fold per bit (linear chained projections, one codegen
      // stage), then the per-bucket rectangle agg; oracle replays the
      // identical fold as a generated CTE chain
      Layout.hilbertStats(t(s, dir, "lineitem"), "l_orderkey", "l_partkey",
          bits = 16, bucketShift = 20)
        .orderBy(col("h_bucket"))),
    "q_curve_locality" -> ((s, dir) =>
      // measured Morton-vs-Hilbert locality on real keys: per curve the
      // bucket count + summed/max bounding-rectangle areas — the evidence
      // for choosing a clustering key instead of taking the Hilbert
      // guarantee on faith
      Layout.curveLocality(t(s, dir, "lineitem"), "l_orderkey", "l_partkey",
          bits = 16, numFiles = 32)
        .orderBy(col("curve"))),
    "q1_pricing_summary" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(expr("l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6)
            .as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),
    "q3_join_revenue" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("order_date"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    }),
    "q_join_broadcast_nation" -> ((s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))),
    "q_topk_custom_operator" -> ((s, dir) =>
      // the custom TopKPerKey physical operator (bounded per-key heaps);
      // oracle = the window-function SQL, which is semantics-identical
      // under the total (o_totalprice DESC, o_orderkey) order
      graft.plans.TopK.perKey(
          t(s, dir, "orders"),
          keyCols = Seq("o_custkey"),
          orderCols = Seq("o_totalprice" -> false, "o_orderkey" -> true),
          k = 2)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))),
    "q_window_toporder" -> ((s, dir) =>
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"))),
    "q_running_sum" -> ((s, dir) =>
      t(s, dir, "events")
        .select(
          col("event_id"), col("user_id"),
          sum(col("value").cast(DecimalType(18, 4)))
            .over(Window.partitionBy(col("user_id")).orderBy(col("event_id"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_value"))
        .orderBy(col("event_id"))),
    "q_window_range_frame" -> ((s, dir) =>
      // RANGE frame over a numeric ordering: events within 100 event-ids back
      t(s, dir, "events")
        .select(
          col("event_id"), col("user_id"),
          count(lit(1)).over(
            Window.partitionBy(col("user_id")).orderBy(col("event_id"))
              .rangeBetween(-100, Window.currentRow)).as("n_recent"))
        .orderBy(col("event_id"))),
    "q_window_lead_ntile" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      t(s, dir, "orders")
        .select(
          col("o_orderkey"), col("o_custkey"),
          lead(col("o_orderkey"), 1).over(w).as("next_orderkey"),
          first_value(col("o_orderkey")).over(w).as("first_orderkey"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),
    "q_scalar_subquery" -> ((s, dir) => {
      // price > 1.2·avg phrased as 5·price·n > 6·Σprice with a decimal-exact
      // sum and integer literals, so the threshold is identical across
      // engines. (1.2× — not 2× — keeps the result set non-empty and
      // discriminating on the fixtures: a silently-broken subquery can no
      // longer pass by trivially agreeing on zero rows.)
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      t(s, dir, "customer").createOrReplaceTempView("customer_sv")
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM orders_v
          |WHERE o_totalprice * (SELECT COUNT(*) FROM orders_v) * 5
          |      > 6 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) FROM orders_v)
          |  AND o_custkey IN (SELECT c_custkey FROM customer_sv WHERE c_mktsegment = 'BUILDING')
          |ORDER BY o_orderkey""".stripMargin)
    }),
    "q_topk_acctbal" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .limit(10)),
    "q_intersect_users" -> ((s, dir) =>
      t(s, dir, "events").select(col("user_id").as("id"))
        .intersect(t(s, dir, "customer").select(col("c_custkey").as("id")))
        .orderBy(col("id"))),
    "q_except_users" -> ((s, dir) =>
      // customers minus event users — the direction that is NON-EMPTY on the
      // fixtures (1350 rows at sf0.01), so a broken EXCEPT cannot pass by
      // trivially agreeing on an empty result
      t(s, dir, "customer").select(col("c_custkey").as("id"))
        .except(t(s, dir, "events").select(col("user_id").as("id")))
        .orderBy(col("id"))),
    "q_rollup_lineitem" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n_items"), col("sum_qty"))
        .orderBy(col("returnflag"), col("linestatus"))),
    "q_distinct_count" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"))
        .orderBy(col("l_returnflag"))),
    "q_json_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy(col("k_mod"))),

    "q_having" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
        .filter(col("n_cust") >= 50)
        .orderBy(col("c_nationkey"))),
    "q_date_parts" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("long").as("y"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("d"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("y"), col("q"), col("m"), col("d"))),
    "q_filtered_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(when(col("l_quantity") > 25, 1)).as("n_heavy"),
          sum(when(col("l_discount") > 0.05, 1).otherwise(0)).cast("long").as("n_discounted"))
        .orderBy(col("l_returnflag"))),
    "q_union_distinct" -> ((s, dir) =>
      t(s, dir, "events").select(col("user_id").as("id"))
        .union(t(s, dir, "customer").select(col("c_custkey").as("id")))
        .distinct()
        .orderBy(col("id"))),
    "q_grouping_sets" -> ((s, dir) => {
      // SQL entry point: GROUPING SETS has no DataFrame-API form
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT COALESCE(l_returnflag,'ALL') AS returnflag,
          |       COALESCE(l_linestatus,'ALL') AS linestatus,
          |       COUNT(*) AS n_items
          |FROM lineitem_v
          |GROUP BY GROUPING SETS ((l_returnflag),(l_linestatus))
          |ORDER BY returnflag, linestatus""".stripMargin)
    }),
    "q_correlated_subquery" -> ((s, dir) => {
      // Catalyst decorrelates the scalar subqueries into aggregates + joins.
      // "above the nation average" is phrased as bal·n > Σbal with a
      // decimal-exact sum — an order-insensitive equivalent (a raw AVG of
      // doubles differs in final ulps between engines).
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      s.sql(
        """SELECT c_custkey, c_acctbal FROM customer_v c
          |WHERE c_acctbal * (SELECT COUNT(*) FROM customer_v c2
          |                   WHERE c2.c_nationkey = c.c_nationkey)
          |      > (SELECT CAST(SUM(CAST(c3.c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
          |         FROM customer_v c3 WHERE c3.c_nationkey = c.c_nationkey)
          |ORDER BY c_custkey""".stripMargin)
    }),
    "q_try_arith" -> ((s, dir) =>
      // NULL-on-error ingestion semantics (the robust-ETL surface):
      // try_divide's divide-by-zero → NULL matches DuckDB's x/0 → NULL;
      // try_cast failure → NULL, whitespace-trimmed success round-trips —
      // dirty numeric columns degrade to NULLs instead of killing the job
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          try_divide(col("c_acctbal"), col("c_custkey") % 7).as("div7"),
          expr("try_cast(c_mktsegment AS BIGINT)").as("seg_num"),
          expr("try_cast(concat(' ', CAST(c_custkey AS STRING), ' ') AS BIGINT)")
            .as("key_roundtrip"))
        .orderBy(col("c_custkey"))),
    "q_string_funcs" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("upper_name"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          regexp_replace(col("c_name"), "Customer#", "C-").as("replaced"),
          levenshtein(col("c_mktsegment"), lit("BUILDING")).cast("long").as("lev"),
          length(trim(col("c_name"))).cast("long").as("trimmed_len"))
        .orderBy(col("c_custkey"))),
    "q_math_funcs" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_q"),
          round(pow(col("l_discount") + 1, 2), 6).as("pow_d"),
          abs(col("l_quantity") - 25.0).as("abs_q"),
          round(exp(col("l_discount")), 6).as("exp_d"),
          round(log(col("l_extendedprice")), 6).as("ln_p"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),
    "q_array_funcs" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dims"),
          array_max(col("embedding")).cast("double").as("arr_max"),
          array_min(col("embedding")).cast("double").as("arr_min"),
          element_at(col("embedding"), 1).cast("double").as("first_val"))
        .orderBy(col("vec_id"))),
    "q_rolling" -> ((s, dir) => {
      // rolling event-time aggregate per user (beyond-reference window
      // breadth): a RANGE frame over the µs long — equal-ts peers share
      // the frame in BOTH engines — with integer-only measures; the
      // per-user partition is the same bounded-key discipline as
      // q_sessionize (user activity, never corpus-keyed)
      val ev = Temporal.eventsMicros(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          (col("event_id") % 100).cast("long").as("m"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-600000000L, 0L)
      ev.select(col("user_id"), col("event_id"), col("ts_us"),
          count(lit(1)).over(w).as("n_window"),
          sum(col("m")).over(w).as("sum_m"))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    }),
    "q_sessionize" -> ((s, dir) => {
      // event-time sessionization. The ts column's PHYSICAL unit is the
      // export's choice (fixtures have shipped both timestamp[ns] and
      // timestamp[us]), so extraction is type-driven: Temporal.eventsMicros
      // reads without a forced schema and picks unix_micros (TimestampType)
      // vs div-1000 (LongType, the nanosAsLong legacy path — that flag
      // remains a declared session config of every harness builder, only
      // exercised if the fixture regenerates as ns again).
      val ev = Temporal.eventsMicros(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_us"))
      Temporal.sessionize(ev, "user_id", "ts_us", "event_id", gapMicros = 30L * 60 * 1000000)
        .orderBy(col("user_id"), col("session_idx"))
    }),
    "q_session_window" -> ((s, dir) => {
      // the BUILT-IN gap-session operator (session_window, batch form of the
      // streaming one) checked against the same DuckDB lag/cumsum oracle
      // formulation as q_sessionize — two independent sessionization
      // implementations (built-in merge-windows vs window-function
      // composition) pinned to one oracle. ts unit: type-driven (see
      // q_sessionize / Temporal.eventsMicros).
      val ev = Temporal.eventsMicros(s, dir)
        .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"))
      ev.groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          col("user_id"),
          unix_micros(col("w.start")).as("session_start_us"),
          // session_window's end is exclusive (last event + gap); subtract
          // the gap back so the emitted bound is the last event time,
          // matching the lag/cumsum oracle exactly
          (unix_micros(col("w.end")) - lit(1800L * 1000000L)).as("session_end_us"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start_us"))
    }),
    "q_sessionize_capped" -> ((s, dir) => {
      // the gap+cap policy of the custom-state streaming sessionizer in its
      // batch form (sessions split on a 30-min gap AND after 2 events —
      // cap 2 because the fixtures' largest gap-session has 3 events, so
      // the cap path is exercised by the data, not just the unit test) —
      // this row gives the POLICY itself a DuckDB oracle; EngineSpec
      // separately asserts streaming output equals this operator's.
      // ts unit: type-driven (see q_sessionize / Temporal.eventsMicros).
      val ev = Temporal.eventsMicros(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_us"))
      Temporal.sessionizeCapped(ev, "user_id", "ts_us", "event_id",
          gapMicros = 30L * 60 * 1000000, maxEvents = 2L)
        .orderBy(col("user_id"), col("session_start_us"))
    }),
    "q_asof_prev_order" -> ((s, dir) =>
      Temporal.previousByKey(t(s, dir, "orders"), "o_custkey", "o_orderdate", "o_orderkey")
        .select(
          col("o_orderkey"), col("o_custkey"),
          col("prev_o_orderkey").as("prev_orderkey"),
          to_date(col("prev_o_orderdate")).as("prev_date"),
          datediff(to_date(col("o_orderdate")), to_date(col("prev_o_orderdate")))
            .cast("long").as("gap_days"))
        .filter(col("prev_orderkey").isNotNull) // first order per key has no as-of match
        .orderBy(col("o_custkey"), col("o_orderkey"))),
    "q_range_join" -> ((s, dir) => {
      // interval/theta join done scale-safe: the binned equi-join rewrite
      // (Temporal.pairsWithin) instead of the O(n²) nested-loop the naive
      // BETWEEN formulation plans to. Co-occurrence counts of event-type
      // pairs within a 60-second window. ts unit: type-driven (see
      // q_sessionize / Temporal.eventsMicros).
      val ev = Temporal.eventsMicros(s, dir)
        .select(col("event_type"), col("ts_us").as("us"))
      Temporal.pairsWithin(ev, "us", 60L * 1000000L, Seq("event_type"))
        .groupBy(col("a_event_type").as("type_a"), col("b_event_type").as("type_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("type_a"), col("type_b"))
    }),
    "q_asof_join_2table" -> ((s, dir) => {
      // true two-table AS-OF join (union-and-sweep rewrite, one exchange):
      // each click joined to the user's most recent at-or-before purchase.
      // The purchase side is pre-aggregated to unique (user, time) so tie
      // resolution is well-defined in both engines; DuckDB's native ASOF
      // LEFT JOIN is the oracle. ts unit: type-driven (Temporal.eventsMicros).
      val ev = Temporal.eventsMicros(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts_us").as("us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("us"))
        .agg(max(col("event_id")).as("p_id"))
      Temporal.asofJoin(clicks, purchases, "user_id", "us", "event_id", "p_id")
        .orderBy(col("user_id"), col("event_id"))
    }),
    "q_asof_tolerance" -> ((s, dir) => {
      // as-of with MAX STALENESS (pandas merge_asof tolerance): a matched
      // purchase older than one day reads as no match — the sweep already
      // found the nearest, so the tolerance is a row-local null-out, not
      // a re-sweep. Mix at sf0.01: ~700 kept / ~1100 stale / ~140 bare.
      val ev = Temporal.eventsMicros(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts_us").as("us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("us"))
        .agg(max(col("event_id")).as("p_id"))
      Temporal.asofJoin(clicks, purchases, "user_id", "us", "event_id", "p_id",
          toleranceMicros = Some(86400000000L))
        .orderBy(col("user_id"), col("event_id"))
    }),
    "q_asof_join_forward" -> ((s, dir) => {
      // FORWARD as-of: each click joined to the user's EARLIEST
      // at-or-after purchase (the next-delivery lookup) — the mirrored
      // union-and-sweep, still one exchange, no join node
      val ev = Temporal.eventsMicros(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts_us").as("us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("us"))
        .agg(max(col("event_id")).as("p_id"))
      Temporal.asofJoin(clicks, purchases, "user_id", "us", "event_id", "p_id",
          direction = "forward")
        .orderBy(col("user_id"), col("event_id"))
    }),
    "q_asof_join_payload" -> ((s, dir) => {
      // as-of join WITH payload carry-through: the matched purchase's value
      // arrives on the same single-exchange sweep (struct-atomic last), not
      // via a second join back on asof_rid. Purchase side pre-aggregated to
      // unique (user, time) with MAX id/value so tie resolution is
      // well-defined in both engines; DuckDB native ASOF LEFT JOIN oracle.
      // ts unit: type-driven (see q_sessionize / Temporal.eventsMicros).
      val ev = Temporal.eventsMicros(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
          col("ts_us").as("us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("us"))
        .agg(max(col("event_id")).as("p_id"), max(col("value")).as("p_value"))
      Temporal.asofJoin(clicks, purchases, "user_id", "us", "event_id", "p_id",
          payload = Seq("p_value"))
        .orderBy(col("user_id"), col("event_id"))
    }),
    "q_interval_join_2stream" -> ((s, dir) => {
      // the stream-stream interval join's PLAN over batch frames — the same
      // graft.streaming.StreamJoin.joinWithin function registered here so
      // the two-stream policy has its own DuckDB range-join oracle row
      // (EngineSpec separately asserts streaming output equals this batch
      // form on the same rows; the watermark is a no-op on batch plans).
      // ts unit: type-driven (see q_sessionize / Temporal.eventsMicros).
      val ev = Temporal.eventsMicros(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          timestamp_micros(col("ts_us")).as("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.streaming.StreamJoin
        .joinWithin(clicks, purchases, watermarkDelay = "10 minutes", withinSeconds = 86400L)
        .select(
          col("key").as("user_id"),
          col("l_id").as("click_id"), unix_micros(col("ts")).as("click_us"),
          col("r_id").as("purchase_id"), unix_micros(col("r_ts")).as("purchase_us"))
        .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
    }),
    "q_interval_coalesce" -> ((s, dir) => {
      // the interval-algebra primitive: per-customer order spans (start =
      // order date as epoch days, length = orderkey-derived 1..10 days)
      // merged into maximal disjoint spans; touching spans merge (closed
      // intervals — the documented contract). Oracle replays the running-
      // max flag, the span cumsum, and the aggregation verbatim.
      val iv = t(s, dir, "orders").select(
        col("o_custkey"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("s"),
        (datediff(col("o_orderdate"), lit("1970-01-01")).cast("long") +
          col("o_orderkey") % 10 + 1).as("e"))
      Temporal.coalesceIntervals(iv, "o_custkey", "s", "e")
        .select(col("o_custkey"), col("span_idx"),
          col("span_start"), col("span_end"), col("n_intervals"))
        .orderBy(col("o_custkey"), col("span_idx"))
    }),
    "q_interval_join_outer" -> ((s, dir) => {
      // the LEFT OUTER form: clicks with no in-window purchase survive with
      // NULL purchase columns — on a stream these rows emit once both
      // watermarks prove no match can still arrive; this batch plan is the
      // identical join. ts unit: type-driven (Temporal.eventsMicros).
      val ev = Temporal.eventsMicros(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          timestamp_micros(col("ts_us")).as("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.streaming.StreamJoin
        .joinWithin(clicks, purchases, watermarkDelay = "10 minutes",
          withinSeconds = 86400L, joinType = "left_outer")
        .select(
          col("key").as("user_id"),
          col("l_id").as("click_id"), unix_micros(col("ts")).as("click_us"),
          col("r_id").as("purchase_id"), unix_micros(col("r_ts")).as("purchase_us"))
        .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
    }),
    "q_lateral_topk" -> ((s, dir) => {
      // correlated LATERAL table subquery (SQL surface the DataFrame API
      // cannot express): each customer's two priciest orders via a
      // per-row subquery with ORDER BY + LIMIT — Catalyst decorrelates it
      // into a ranked join; DuckDB executes the same text natively
      t(s, dir, "customer").createOrReplaceTempView("customer_lv")
      t(s, dir, "orders").createOrReplaceTempView("orders_lv")
      s.sql(
        """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
          |FROM customer_lv c, LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM orders_lv
          |  WHERE o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
    }),
    "q_semi_join" -> ((s, dir) =>
      // EXISTS: customers that placed at least one order
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),
    "q_anti_join" -> ((s, dir) =>
      // NOT EXISTS: customers with no orders in 1997-H1. Every fixture
      // customer has SOME order, so the unfiltered anti-join is empty and
      // non-discriminating; the date window makes the result non-empty
      // (701 rows at sf0.01) while keeping the anti-join shape.
      t(s, dir, "customer")
        .join(
          t(s, dir, "orders").filter(
            col("o_orderdate") >= lit("1997-01-01") &&
              col("o_orderdate") < lit("1997-07-01")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),
    "q_cube_lineitem" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_items"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n_items"))
        .orderBy(col("returnflag"), col("linestatus"))),
    "q_pivot_events" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id"))),
    "q_window_tumbling" -> ((s, dir) =>
      // batch form of the streaming tumbling window (7-day, epoch-aligned)
      t(s, dir, "orders")
        .groupBy(window(col("o_orderdate"), "7 days").as("w"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .select(
          unix_timestamp(col("w.start")).as("win_start_epoch"),
          col("n_orders"), col("revenue"))
        .orderBy(col("win_start_epoch"))),
    "q_window_ranks" -> ((s, dir) => {
      // the full ranking-function family in one pass; percent_rank and
      // cume_dist are rank arithmetic (single exact divisions), so the
      // doubles verify bit-exact cross-engine
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer")
        .select(
          col("c_custkey"), col("c_mktsegment"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"))
        .orderBy(col("c_custkey"))
    }),
    "q_collect_agg" -> ((s, dir) =>
      // order-insensitive list aggregation made deterministic: collect,
      // SORT, then join — the only portable way to verify an agg whose
      // input order is partitioning-dependent
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          array_join(sort_array(collect_list(col("o_orderkey"))), ",").as("orderkeys"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_custkey"))),
    "q_null_semantics" -> ((s, dir) =>
      // null-handling semantics pinned cross-engine: NULLIF injection,
      // COALESCE recovery, null-safe equality (<=> / IS NOT DISTINCT FROM),
      // and null-aware conditional counting
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_returnflag"), lit("N")).as("rf_null"))
        .select(
          col("l_orderkey"), col("l_linenumber"), col("rf_null"),
          coalesce(col("rf_null"), lit("NONE")).as("rf_filled"),
          (col("rf_null") <=> lit("R")).as("is_r_nullsafe"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),
    "q_window_sliding" -> ((s, dir) =>
      // sliding (hopping) windows: 14-day duration, 7-day slide — every
      // order lands in exactly two epoch-aligned windows
      t(s, dir, "orders")
        .groupBy(window(col("o_orderdate"), "14 days", "7 days").as("w"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .select(
          unix_timestamp(col("w.start")).as("win_start_epoch"),
          col("n_orders"), col("revenue"))
        .orderBy(col("win_start_epoch"))),
    "q_percentile" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.95)").as("p95_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))),
    "q_bool_agg" -> ((s, dir) =>
      // boolean aggregates (bool_and/bool_or) — deterministic regardless of
      // evaluation order, pinned cross-engine
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("bool_and(l_quantity > 1)").as("all_gt1"),
          expr("bool_or(l_discount > 0.09)").as("any_deep_discount"),
          expr("bool_and(l_quantity <= 50)").as("all_le50"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))),
    "q_bitwise_agg" -> ((s, dir) =>
      // bitwise aggregates — exact integer results at any evaluation order
      t(s, dir, "events")
        .groupBy((col("user_id") % 16).as("user_bucket"))
        .agg(
          expr("bit_and(event_id)").as("band"),
          expr("bit_or(event_id)").as("bor"),
          expr("bit_xor(event_id)").as("bxor"),
          count(lit(1)).as("n"))
        .orderBy(col("user_bucket"))),
    "q_stddev_var" -> ((s, dir) =>
      // population variance/stddev from decimal-EXACT first and second
      // moments (one formula, identical token-for-token in the oracle) —
      // the built-in stddev aggregates sum doubles in partition order and
      // do not verify bit-exact across engines
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double").as("sx"),
          sum((col("l_quantity") * col("l_quantity")).cast(DecimalType(28, 8)))
            .cast("double").as("sxx"))
        .select(
          col("l_returnflag"), col("n"),
          round(col("sx") / col("n"), 6).as("mean_qty"),
          round(col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n")), 6)
            .as("var_pop"),
          round(sqrt(col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n"))), 6)
            .as("stddev_pop"))
        .orderBy(col("l_returnflag"))),
    "q_datetime_funcs" -> ((s, dir) =>
      // calendar function surface: month truncation, month end, day counts,
      // day-of-week (normalized to DuckDB's Sunday=0 convention)
      t(s, dir, "orders")
        .groupBy(trunc(to_date(col("o_orderdate")), "month").as("month_start"))
        .agg(count(lit(1)).as("n_orders"))
        .select(
          col("month_start"),
          last_day(col("month_start")).as("month_end"),
          dayofmonth(last_day(col("month_start"))).cast("long").as("days_in_month"),
          (dayofweek(col("month_start")) - 1).cast("long").as("dow_start"),
          col("n_orders"))
        .orderBy(col("month_start"))),
    "q_percentile_approx" -> ((s, dir) =>
      // The 100 TB percentile: approx_percentile's summary buffer is BOUNDED
      // (~O(accuracy·log n) entries, Greenwald-Khanna), unlike exact
      // `percentile`, whose buffer holds every distinct value per group and
      // cannot spill gracefully. With accuracy ≥ group cardinality the
      // summary never drops a sample, so the result is rank-EXACT — the
      // smallest value with ≥ p·n values at or below it, which is DuckDB's
      // quantile_disc — making the oracle a true value-level check at every
      // harness scale (≤ 600 k rows < the 10⁶ accuracy here). Beyond that n
      // the same query keeps running in bounded memory with rank error
      // ≤ n/accuracy — the property exact percentile cannot offer.
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("approx_percentile(l_quantity, 0.5, 1000000)").as("median_qty"),
          expr("approx_percentile(l_quantity, 0.95, 1000000)").as("p95_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))),

    // -------- dedup (SURVEY §2.12)
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents")).orderBy(col("text_hash"))),
    "dedup_exact_normalized" -> ((s, dir) => {
      // normalization-robust exact dedup: the fixture corpus is ASCII, so
      // the Unicode variant surface is PLANTED deterministically in BOTH
      // engines (the pii-stats residue discipline) — residues 0/1/2 of
      // each 4-block render the same text as precomposed, combining-mark,
      // and uppercase+extra-space variants (collapsing to one key via
      // lower → ws-collapse → NFC), residue 3 stays unique
      val docs = t(s, dir, "documents")
      val g = ((col("doc_id") - pmod(col("doc_id"), lit(4))) / 4).cast("long")
      val variant = when(pmod(col("doc_id"), lit(4)) === 0,
          concat(lit("Café   doc "), g))
        .when(pmod(col("doc_id"), lit(4)) === 1,
          concat(lit("Café doc "), g))
        .when(pmod(col("doc_id"), lit(4)) === 2,
          concat(lit("CAFÉ doc "), g))
        .otherwise(concat(lit("unique "), col("doc_id")))
      Dedup.exactNormalized(docs.select(col("doc_id"), variant.as("text")))
        .orderBy(col("text_key"))
    }),
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 3, tau = 0.6)
        .orderBy(col("doc_a"), col("doc_b"))),
    "dedup_ngram_jaccard_pruned" -> ((s, dir) =>
      // document-frequency-pruned exact Jaccard: shingles in > 10 docs are
      // dropped BEFORE the self-join, capping the join's per-key fan-out (the
      // viral-shingle scale-killer); the oracle applies the identical df cap
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 3, tau = 0.6, maxDf = Some(10L))
        .orderBy(col("doc_a"), col("doc_b"))),
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(t(s, dir, "documents"), n = 3, tau = 0.6)
        .orderBy(col("doc_a"), col("doc_b"))),
    "dedup_simhash" -> ((s, dir) =>
      // direct single-stage plan: the fixture corpus is ~99.8% distinct
      // texts, where the dup-collapse rewrite is pure fixed overhead (≈6
      // extra tiny-stage exchanges that only amortize at cluster scale).
      // The collapse path — the library DEFAULT, structurally required on
      // dup-heavy corpora — is benched + oracle-checked separately as
      // dedup_simhash_collapse; both emit the identical exact-verified set.
      Dedup.simhashPairs(t(s, dir, "documents"), n = 3, tau = 0.6, maxHamming = 6,
          collapseExactDups = false)
        .orderBy(col("doc_a"), col("doc_b"))),
    "dedup_simhash_collapse" -> ((s, dir) =>
      // the dup-safe default: collapse exact duplicates to one
      // representative per distinct text BEFORE fingerprinting (bounding
      // the pigeonhole join's hot keys), expand groups back afterwards;
      // published as the shared [[simhashPairsArt]] artifact
      simhashPairsArt(s, dir)
        .orderBy(col("doc_a"), col("doc_b"))),
    "dedup_simhash_recall" -> ((s, dir) =>
      // prefilter-quality audit at the SHIPPED simhash config: recall of
      // the Hamming-6 pair set vs the exact-Jaccard truth at the same tau
      // (emitted ⊆ truth because simhash pairs are Jaccard-verified);
      // BOTH sides are shared artifacts — emitted is the collapse row's
      // pair set, truth is the exact n-gram set dedup_ngram_jaccard
      // prices at the identical (n, tau) — so the audit is one
      // pair-keyed join, not a third derivation of either chain
      Dedup.pairRecallEval(ngramTruthArt(s, dir), simhashPairsArt(s, dir))),
    "dedup_embedding_cosine" -> ((s, dir) =>
      Similarity.nearDupPairs(t(s, dir, "embeddings"), tau = 0.4)
        .orderBy(col("id_a"), col("id_b"))),

    "dedup_embedding_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val planes = Similarity.prepared(emb.filter(col("vec_id") < 4), "vec_id", "embedding")
        .select(col("id").as("plane_id"), col("v").as("pv"))
      Similarity.nearDupPairsBucketed(emb, planes, tau = 0.4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "dedup_embedding_lsh_banded" -> ((s, dir) => {
      // multi-probe near-dup: candidates collide in ANY of 2 bands × 2
      // planes — the recall knob the single-bucket near-dup probe lacks
      val emb = t(s, dir, "embeddings")
      val planes = Similarity.prepared(emb.filter(col("vec_id") < 4), "vec_id", "embedding")
        .select(col("id").as("plane_id"), col("v").as("pv"))
      Similarity.nearDupPairsBanded(emb, planes, bands = 2, tau = 0.4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // -------- similarity search (SURVEY §2.12)
    "ann_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
        .select(col("query_id"), col("neighbor_id"), col("score"), col("rank").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_lsh_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val planes = Similarity.prepared(emb.filter(col("vec_id") < 4), "vec_id", "embedding")
        .select(col("id").as("plane_id"), col("v").as("pv"))
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), planes, k = 3)
        .select(col("query_id"), col("neighbor_id"), col("score"), col("rank").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),

    "ann_lsh_banded_topk" -> ((s, dir) => {
      // band-OR multi-probe: candidates collide in ANY of 2 bands × 2 planes
      // — the recall knob the single-bucket probe lacks
      val emb = t(s, dir, "embeddings")
      val planes = Similarity.prepared(emb.filter(col("vec_id") < 4), "vec_id", "embedding")
        .select(col("id").as("plane_id"), col("v").as("pv"))
      Similarity.lshTopKBanded(emb, emb.filter(col("vec_id") < 10), planes, bands = 2, k = 3)
        .select(col("query_id"), col("neighbor_id"), col("score"), col("rank").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = Similarity.prepared(emb.filter(col("vec_id") < 4), "vec_id", "embedding")
        .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), cents, k = 3)
        .select(col("query_id"), col("neighbor_id"), col("score"), col("rank").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_filtered_topk" -> ((s, dir) => {
      // metadata-FILTERED serving: top-3 among label=1 vectors only — the
      // predicate prunes the index side BEFORE the cell join (pushdown on
      // a persisted index), queries stay unfiltered. Oracle replays the
      // identical probe with the label join on the candidate side.
      val emb = t(s, dir, "embeddings")
      val cents = Similarity.prepared(emb.filter(col("vec_id") < 4), "vec_id", "embedding")
        .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
      Similarity.filteredIvfTopK(emb, emb.filter(col("vec_id") < 10), cents,
          k = 3, pred = col("label") === 1)
        .select(col("query_id"), col("neighbor_id"), col("score"), col("rank").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_ivf_trained_topk" -> ((s, dir) => {
      // END-TO-END IVF: deterministic k-means quantizer training (2 Lloyd's
      // rounds, md5-bucket init) + nprobe=2 multi-probe serving — the oracle
      // replays the identical training loop in SQL (decimal-exact means,
      // rounded-cosine assignment), so the full train→index→query path is
      // value-checked, not just the serving join
      val emb = t(s, dir, "embeddings")
      val cents = coarseCents4(s, dir)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), cents, k = 3, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"), col("score"), col("rank").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_index_upsert" -> ((s, dir) => {
      // index GROWTH: build the persisted artifact on the base corpus
      // (quantizer trained on vec_id < 400 only), append the delta with
      // the FROZEN quantizer, serve off the grown artifact. The oracle
      // restricts training to the same base predicate and serves the full
      // corpus — grown-index serving is value-pinned ≡ a union rebuild
      // under the same centroids. Per-process scratch path; build's
      // overwrite resets the corpus dir each invocation, so bench
      // iterations cannot double-append.
      val emb = t(s, dir, "embeddings")
      val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
        s"/graft_ann_upsert_${ProcessHandle.current().pid()}"
      graft.sources.AnnIndex.build(
        emb.filter(col("vec_id") < 400), k = 4, iters = 2, path)
      graft.sources.AnnIndex.append(s, path, emb.filter(col("vec_id") >= 400))
      val idx = graft.sources.AnnIndex.load(s, path)
      graft.sources.AnnIndex.topK(idx, emb.filter(col("vec_id") < 10), k = 3, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"), col("score"), col("rank").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_recall_eval_pq" -> ((s, dir) => {
      // completes the recall suite (ivf/lsh/matryoshka/rp/pq): per-query
      // recall of the IVF-PQ serving path against the exact-L2 brute
      // baseline — L2, not cosine, because that is the metric PQ serves
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val model = pqModel2(s, dir, 1.0)
      val approx = Similarity.pqServe(pqCodes(s, dir, 1.0),
        Similarity.pqQueryTables(q, model, nprobe = 2),
        preparedEmb(s, dir), q, k = 3, rerank = 50, model)
      Similarity.recallAt(approx, Similarity.bruteForceTopKL2(emb, q, k = 3))
        .orderBy(col("query_id"))
    }),
    "ann_recall_eval" -> ((s, dir) => {
      // the ANN TUNING measurement as a first-class operator: per-query
      // recall of the trained-IVF serving path against exact brute force —
      // the number a deployment sweeps nprobe/k' against. Both sides are
      // the registry's own verified operators; the oracle replays both
      // chains and the same recall join.
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val cents = coarseCents4(s, dir)
      val approx = Similarity.ivfTopK(emb, q, cents, k = 3, nprobe = 2)
      Similarity.recallAt(approx, Similarity.bruteForceTopK(emb, q, k = 3))
        .orderBy(col("query_id"))
    }),
    "ann_recall_eval_lsh" -> ((s, dir) => {
      // the same recall measurement swept over a SECOND approximate
      // family: banded-LSH serving vs the identical exact baseline.
      // recallAt takes any two top-k frames — this row keeps its oracle
      // honest about that (not coupled to the trained-IVF chain alone).
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val planes = Similarity.prepared(emb.filter(col("vec_id") < 4), "vec_id", "embedding")
        .select(col("id").as("plane_id"), col("v").as("pv"))
      val approx = Similarity.lshTopKBanded(emb, q, planes, bands = 2, k = 3)
      Similarity.recallAt(approx, Similarity.bruteForceTopK(emb, q, k = 3))
        .orderBy(col("query_id"))
    }),
    "emb_cluster_drift" -> ((s, dir) => {
      // embedding-space drift between two dumps (even vec_ids = the
      // reference dump, odd = the new one): quantizer trained on A only,
      // both assigned under the FROZEN centroids, per-cell occupancy
      // shares in exact integer ppm — the semantic twin of
      // q_drift_report. The oracle reuses the trainPred k-means CTEs
      // (the ann_index_upsert form) + the full-corpus assignment chain.
      val emb = t(s, dir, "embeddings")
      Similarity.clusterDrift(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1), k = 4, iters = 2)
        .orderBy(col("cell"))
    }),
    "ann_binary_topk" -> ((s, dir) => {
      // binary-quantization serving: 16-byte sign codes, integer Hamming
      // shortlist (top-20), exact cosine rerank to top-3 — the memory-
      // tier ANN trade, oracle-replayed bit-for-bit (codes, xor
      // bit_count, both rank stages)
      val emb = t(s, dir, "embeddings")
      Similarity.binaryHammingTopK(emb, emb.filter(col("vec_id") < 10),
          k = 3, rerank = 20)
        .select(col("query_id"), col("neighbor_id"), col("hamming"),
          col("score"), col("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_binary_banded_topk" -> ((s, dir) => {
      // the binary family's SCALE path: byte-slice band collisions (8
      // bands × 8 bits, the simhash pigeonhole — Hamming < 8 is
      // candidate-guaranteed) replace the full code scan; shared
      // shortlist/rerank tail, value-pinned by the banded oracle chain
      val emb = t(s, dir, "embeddings")
      Similarity.binaryHammingTopKBanded(emb, emb.filter(col("vec_id") < 10),
          k = 3, rerank = 20, bands = 8)
        .select(col("query_id"), col("neighbor_id"), col("hamming"),
          col("score"), col("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_recall_eval_binary_banded" -> ((s, dir) => {
      // the banded form's own recall row: prices BOTH trades at once
      // (sign-code quantization + band-collision candidate loss) against
      // the exact float baseline — the number that decides whether the
      // scale path is safe for a given corpus
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val approx = Similarity.binaryHammingTopKBanded(emb, q, k = 3, rerank = 20, bands = 8)
      Similarity.recallAt(approx, Similarity.bruteForceTopK(emb, q, k = 3))
        .orderBy(col("query_id"))
    }),
    "ann_recall_eval_binary" -> ((s, dir) => {
      // the binary family through the same recall tail as ivf/lsh/
      // matryoshka/rp/pq — every approximate family ships with its
      // measured recall row
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val approx = Similarity.binaryHammingTopK(emb, q, k = 3, rerank = 20)
      Similarity.recallAt(approx, Similarity.bruteForceTopK(emb, q, k = 3))
        .orderBy(col("query_id"))
    }),
    "ann_nprobe_sweep" -> ((s, dir) => {
      // the IVF TUNING SURFACE as one verified frame: recall vs candidate
      // volume swept over the probe knob (nprobe = 1..3) against the exact
      // brute baseline — the dedup_threshold_sweep discipline applied to
      // the ANN serving family. Exact scoring is paid ONCE at maxNprobe;
      // each sweep point re-ranks the probe_rank-filtered candidates
      // (exactly ivfTopK at that nprobe — EngineSpec pins the equivalence
      // per point). The oracle replays training, the ranked probe
      // assignment, the shared-scoring fan-out, and the micro-averaged
      // recall tail.
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val cents = coarseCents4(s, dir)
      Similarity.nprobeSweep(emb, q, cents, k = 3, maxNprobe = 3)
        .orderBy(col("nprobe"))
    }),
    "ann_matryoshka_recall" -> ((s, dir) => {
      // truncated-dimension serving audit (the Matryoshka representation
      // trade: serve on a prefix of the embedding, pay with recall):
      // cosine top-k over the first 48 of 64 dims — prefix norms, prefix
      // dots, nothing renormalized ahead of time — measured by the same
      // recallAt operator against the full-dim exact top-k. At 100 TB a
      // prefix scan cuts vector bytes read, shuffled, and multiplied
      // proportionally; this row is the number that decides whether that
      // trade is safe for a given corpus.
      val emb = t(s, dir, "embeddings")
      val trunc = emb.select(col("vec_id"),
        slice(col("embedding"), 1, matryoshkaDims).as("embedding"))
      val q = emb.filter(col("vec_id") < 10)
      val approx = Similarity.bruteForceTopK(trunc, trunc.filter(col("vec_id") < 10), k = 3)
      Similarity.recallAt(approx, Similarity.bruteForceTopK(emb, q, k = 3))
        .orderBy(col("query_id"))
    }),
    "ann_rp_recall" -> ((s, dir) => {
      // the MODEL-FREE dimension-reduction trade (Johnson–Lindenstrauss
      // ±1 projection, 64 → 32): signs are md5("rp:j:i") parity — a pure
      // function of the coordinate pair, so the oracle re-derives the
      // identical sign matrix and the projection needs no trained model,
      // no stored planes, and no data pass before the rewrite. Serving on
      // the projected vectors is measured by the same recallAt operator
      // against the full-dim exact top-k (the matryoshka row's prefix
      // trade, without requiring matryoshka-trained embeddings).
      val emb = t(s, dir, "embeddings")
      val proj = Similarity.rpProject(emb, outDims = rpDims, inDims = rpInDims)
      val approx = Similarity.bruteForceTopK(proj, proj.filter(col("vec_id") < 10), k = 3)
      Similarity.recallAt(approx, Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 3))
        .orderBy(col("query_id"))
    }),
    "ann_ivfpq_topk" -> ((s, dir) => {
      // IVF-PQ with refine: coarse cells bound what a query scans,
      // product-quantized residual codes bound what each scanned candidate
      // costs (m codeword ids + ADC table lookups — no per-candidate vector
      // math), and exact L2 re-ranks only the ADC shortlist. All training
      // (coarse Lloyd's + per-subspace codebook Lloyd's) is deterministic
      // and replayed by the oracle as CTEs; corpus side stays narrow.
      // pqIters = 2 (not the 3 default): each extra Lloyd's round costs m
      // reassignment joins and dominated this registry row's cost; the
      // oracle replays the same 2 rounds, so the exact-replay contract is
      // unchanged (codebook quality only affects the ADC shortlist, and
      // the exact refine re-ranks it either way)
      val q = t(s, dir, "embeddings").filter(col("vec_id") < 10)
      val model = pqModel2(s, dir, 1.0)
      Similarity.pqServe(pqCodes(s, dir, 1.0),
          Similarity.pqQueryTables(q, model, nprobe = 2),
          preparedEmb(s, dir), q, k = 3, rerank = 50, model)
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_ivfpq_sampled" -> ((s, dir) => {
      // the PRODUCTION IVF-PQ training economics: codebooks trained on a
      // 50% md5-bucket sample of the corpus (the bpe_sampled discipline —
      // pure function of the id, so the oracle re-draws the identical
      // sample), everything ENCODED and served full-corpus. The pqIters
      // training aggregations now scan the sample, not the corpus — at
      // 100 TB that is the entire feasibility of in-pipeline PQ training
      val q = t(s, dir, "embeddings").filter(col("vec_id") < 10)
      val model = pqModel2(s, dir, 0.5)
      Similarity.pqServe(pqCodes(s, dir, 0.5),
          Similarity.pqQueryTables(q, model, nprobe = 2),
          preparedEmb(s, dir), q, k = 3, rerank = 50, model)
        .orderBy(col("query_id"), col("rnk"))
    }),
    "ann_centroid_outlier" -> ((s, dir) =>
      // embedding-sanity screen: rounded cosine of every vector to the
      // corpus's decimal-exact mean vector (one distributed aggregation +
      // a broadcast narrow scoring map)
      Similarity.centroidOutliers(t(s, dir, "embeddings"))
        .orderBy(col("vec_id"))),
    "emb_int8_quant" -> ((s, dir) =>
      // scalar int8 storage audit: per-dim max-abs scales (collected as a
      // bounded dims-length global decision, folded back as ONE literal
      // array), then a single narrow row-local coding pass — integer sums
      // and an order-independent max error, so no ordered float folds
      Similarity.int8Quantize(t(s, dir, "embeddings"))
        .orderBy(col("vec_id"))),
    "emb_cluster_stats" -> ((s, dir) =>
      // the k-tuning audit for the IVF/SemDeDup family: per-cell size
      // (skew = the unsplittable probe/pair-scan unit) and coherence
      // (integer-summed rounded cosine + min/max spread); same trained
      // quantizer as ann_ivf_trained_topk, so the oracle replays the
      // identical Lloyd's CTEs plus a k-row aggregation
      Similarity.clusterStats(t(s, dir, "embeddings"), k = 4, iters = 2)
        .orderBy(col("cell"))),
    "emb_dim_stats" -> ((s, dir) =>
      // per-DIMENSION health audit: collapsed/dead coordinates and scale
      // drift, caught before an index is built. Values are fenced to
      // micro-unit integers first (explicit half-away-from-zero — the
      // int8 idiom), so every aggregate is an order-independent integer
      // fold; one explode + one dims-bounded map-side-combined agg
      Similarity.dimStats(t(s, dir, "embeddings"))
        .orderBy(col("i"))),
    "emb_dim_covariance" -> ((s, dir) =>
      // pairwise dimension redundancy screen: ONE corpus pass through the
      // bounded-buffer GramMatrixAgg (homogeneous coordinate carries the
      // first moments and n in the same 17 KB triangle — no explode, no
      // per-pair row blowup), then dims²-bounded local arithmetic; exact
      // integer covariance numerators, fenced-chain Pearson corr at 4 dp
      Similarity.dimCovariance(t(s, dir, "embeddings"), dims = 64)
        .orderBy(col("i"), col("j"))),
    "emb_effective_rank" -> ((s, dir) =>
      // participation ratio trace²/Σcov²: the one-number effective-
      // dimensionality screen (1 = collapsed, dims = isotropic) from the
      // same single Gram pass — read before pcaTop's loadings
      Similarity.effectiveRank(t(s, dir, "embeddings"), dims = 64,
        covDiv = pcaCovDiv)),
    "emb_pca_top" -> ((s, dir) =>
      // anisotropy screen: top-principal-component loadings + variance
      // share by fixed-round power iteration over the INTEGER-SCALED
      // covariance (sign·(|cov| DIV covDiv) — the float seam fenced away
      // before any float op); same single Gram pass as emb_dim_covariance,
      // then a d²-bounded driver decision; oracle unrolls the identical
      // three iterations with ordered list_reduce norms
      Similarity.pcaTop(t(s, dir, "embeddings"), dims = 64, covDiv = pcaCovDiv)
        .orderBy(col("i"))),
    "ann_knn_graph" -> ((s, dir) => {
      // mutual-kNN graph: each vector's top-4 among its banded-LSH
      // candidates, kept only where the relation is mutual (hub one-way
      // edges pruned) — the structure semantic clustering / diversity
      // sampling starts from; candidates are band-bucketed, never
      // all-pairs, and both mutuality sides are k-bounded
      val emb = t(s, dir, "embeddings")
      val planes = Similarity.prepared(emb.filter(col("vec_id") < 4), "vec_id", "embedding")
        .select(col("id").as("plane_id"), col("v").as("pv"))
      Similarity.knnGraph(emb, planes, bands = 2, k = 4)
        .select(col("id_a"), col("id_b"),
          (col("cosine") + lit(0.0)).as("cosine"),
          col("rank_ab"), col("rank_ba"))
        .orderBy(col("id_a"), col("id_b"))
    }),
    "emb_mean_pool" -> ((s, dir) =>
      // chunk→document pooling: 5 consecutive vecs per synthetic doc,
      // exact-decimal per-dimension means rounded at 6 dp, emitted
      // exploded (doc_id, i, v) — one explode + one keyed agg
      Similarity.meanPool(
        t(s, dir, "embeddings").select(
          expr("vec_id DIV 5").as("doc_id"), col("embedding")),
        "doc_id")
        .select(col("doc_id"), col("i"), (col("v") + lit(0.0)).as("v"))
        .orderBy(col("doc_id"), col("i"))),
    "ann_label_noise" -> ((s, dir) => {
      // kNN-disagreement label audit: a label is suspect when a strict
      // majority of the vector's top-4 banded-LSH neighbors carry one
      // other label (count-plurality, smallest-label tie-break) — the
      // confident-learning-style screen run before trusting `label` as
      // supervision; candidates band-bucketed, never all-pairs
      val emb = t(s, dir, "embeddings")
      val planes = Similarity.prepared(emb.filter(col("vec_id") < 4), "vec_id", "embedding")
        .select(col("id").as("plane_id"), col("v").as("pv"))
      Similarity.labelNoise(emb, planes, bands = 2, k = 4)
        .orderBy(col("vec_id"))
    }),
    "ann_hard_negatives" -> ((s, dir) => {
      // contrastive hard-negative mining: nearest different-LABEL vectors
      // per query — the label constraint applies before ranking. Brute
      // form over the sampled query set is the verified baseline; the
      // banded-LSH form (EngineSpec) is the 100 TB candidate path.
      val emb = t(s, dir, "embeddings")
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 10), k = 5)
        .select(col("query_id"), col("neighbor_id"), col("neg_label"),
          col("score"), col("rank").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),
    "dedup_semantic" -> ((s, dir) =>
      // SemDeDup (Abbas et al. 2023): deterministic k-means clusters bound
      // the pair space (Σ|cell|²/2, never corpus²); a vector is a semantic
      // dup when a lower-id same-cluster vector has rounded cosine ≥ tau.
      // The oracle replays the full Lloyd's training + final assignment +
      // in-cluster pair scan as CTEs — train→cluster→prune value-checked.
      Similarity.semDedup(t(s, dir, "embeddings"),
          k = semDedupK, iters = semDedupIters, tau = semDedupTau)
        .orderBy(col("vec_id"))),
    "dedup_semantic_rep" -> ((s, dir) => {
      // keep-policy COMPOSITION for the semantic family: semDedup's dup
      // verdicts become edges into the same components × quality-argmax
      // pipeline every other dedup family uses (dedup_best_rep) — each
      // semantic dup cluster keeps its highest-QUALITY aligned document
      // (embeddings are vec_id-aligned with documents), not its lowest id.
      // Scale shape: the edge set is ≤ one edge per non-keep vector (tiny
      // vs the corpus), components runs on that graph only, and the
      // quality join is keyed on the doc id.
      val sem = semDedupArt(s, dir)
      val pairs = sem.filter(col("dup_of").isNotNull)
        .select(col("dup_of").as("doc_a"), col("vec_id").as("doc_b"))
      val comp = Dedup.components(pairs)
      val q = TextAnalysis.qualityScore(t(s, dir, "documents"))
        .select(col("doc_id"), col("quality_score"))
      comp.join(q, Seq("doc_id"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("component"))
            .orderBy(col("quality_score").desc, col("doc_id"))))
        .filter(col("rn") === 1)
        .select(col("component"), col("doc_id").as("rep_id"), col("quality_score"))
        .orderBy(col("component"))
    }),
    "q_crossmodal_agreement" -> ((s, dir) => {
      // CROSS-MODAL dedup agreement audit — the id-aligned embeddings ↔
      // documents contract (the one dedup_semantic_rep already exploits)
      // priced on one verified surface: per aligned id, would LEXICAL
      // dedup remove it (a lower-id doc shares its normalized key within
      // the aligned population, planted-twin corpus) vs would SEMANTIC
      // dedup remove it (semDedup keep = false)? The 2×2 agreement
      // matrix is the number that says whether embedding dedup can
      // replace — or must complement — the lexical pass on a corpus.
      // Shape: one key-agg + one id-keyed join on the lexical side, the
      // verified cluster-bounded semDedup on the semantic side.
      val sem = semDedupArt(s, dir)
        .select(col("vec_id").as("doc_id"), (!col("keep")).as("sem_removed"))
      val docs = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(lit("leak "), expr("doc_id DIV 20").cast("string")))
          .otherwise(col("text")).as("text"))
      val aligned = docs.join(sem, Seq("doc_id"))
        .select(col("doc_id"), Dedup.normalizedKey(col("text")).as("k"),
          col("sem_removed"))
      val groups = aligned.groupBy(col("k")).agg(min(col("doc_id")).as("keep_id"))
      aligned.join(groups, Seq("k"))
        .select(col("sem_removed"),
          (col("doc_id") =!= col("keep_id")).as("lex_removed"))
        .groupBy(col("lex_removed"), col("sem_removed"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lex_removed"), col("sem_removed"))
    }),
    "dedup_survivors" -> ((s, dir) => {
      // rides the banded-LSH path (the 100 TB shape) via the shared pair
      // artifact; output is proven equal to the exact quadratic form at
      // these parameters (EngineSpec), so the oracle stays the
      // exact-Jaccard SQL
      val docs = t(s, dir, "documents")
      Dedup.survivors(docs, lshPairs(s, dir))
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),
    "dedup_contamination" -> ((s, dir) => {
      // benchmark decontamination: training docs sharing >= 5 distinct
      // 3-gram shingles with any doc of the (stand-in) eval slice
      val docs = t(s, dir, "documents")
      Dedup.contaminationPairs(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0),
          n = 3, minShared = 5L)
        .orderBy(col("train_id"), col("eval_id"))
    }),
    "dedup_cross_jaccard" -> ((s, dir) => {
      // FUZZY decontamination: whole-document Jaccard across the
      // train/eval boundary — catches paraphrased/re-wrapped eval docs the
      // absolute shared-count screen isn't aimed at; same two-sided
      // inverted-index join, eval side broadcast-small
      val docs = t(s, dir, "documents")
      Dedup.crossJaccardPairs(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0),
          n = 3, tau = 0.5)
        .orderBy(col("train_id"), col("eval_id"))
    }),
    "dedup_containment" -> ((s, dir) => {
      // ASYMMETRIC decontamination: |train ∩ eval| / |eval| — fires on an
      // eval doc QUOTED INSIDE a larger training doc where symmetric
      // Jaccard is diluted by the training doc's own size; same two-sided
      // inverted-index join as the other two cross-corpus screens
      val docs = t(s, dir, "documents")
      Dedup.containmentPairs(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0),
          n = 3, tau = 0.6)
        .orderBy(col("train_id"), col("eval_id"))
    }),
    "dedup_contamination_bloom" -> ((s, dir) => {
      // the scale form: eval shingles fold into ONE broadcast Bloom filter
      // that pre-filters the (huge) training side before any join; the
      // exact inverted-index verify after makes the output IDENTICAL to
      // dedup_contamination — so the oracle is the same exact SQL
      val docs = t(s, dir, "documents")
      Dedup.contaminationPairsBloom(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0),
          n = 3, minShared = 5L)
        .orderBy(col("train_id"), col("eval_id"))
    }),
    "dedup_threshold_sweep" -> ((s, dir) =>
      // the tau-tuning read before committing a dedup threshold: pairs
      // at or above each Jaccard decile, one pass, exact integer deciles
      Dedup.thresholdSweep(t(s, dir, "documents")).orderBy(col("tau_e1"))),
    "dedup_minhash_calibration" -> ((s, dir) =>
      // the ESTIMATOR audit under the minhash stack: per exact-Jaccard
      // decile, integer-ppm error of the 16-permutation md5 minhash
      // estimate vs the exact value — the signature-length pricing read.
      // The oracle replays the md5 permutation minima bit-for-bit, so
      // the estimator itself is value-verified, never self-compared.
      Dedup.minhashCalibration(t(s, dir, "documents")).orderBy(col("j_e1"))),
    "text_hash_audit" -> ((s, dir) => {
      // the no-collision audit under the dedup stack: every shingle-hash
      // equality the LSH/exact-substring/chunk families treat as string
      // identity is verified here — n_collisions counts distinct shingle
      // STRINGS that share an xxhash64. The oracle pins 0 (string-side
      // counts recomputed independently): a real collision fails this
      // row loudly instead of silently merging two unrelated documents.
      // One distinct + one agg over the shingle universe.
      val shingled = TextAnalysis.shingles(
        t(s, dir, "documents"), "doc_id", "text", 3)
      shingled.select(col("shingle")).distinct()
        .agg(
          count(lit(1)).as("n_distinct_shingles"),
          countDistinct(xxhash64(col("shingle"))).as("n_distinct_hashes"))
        .select(col("n_distinct_shingles"), col("n_distinct_hashes"),
          (col("n_distinct_shingles") - col("n_distinct_hashes"))
            .as("n_collisions"))
    }),
    "dedup_incremental_probe" -> ((s, dir) => {
      // the daily-dedup economics as an artifact: build the persisted
      // band/sets index on the BASE corpus (doc_id >= 50), then probe
      // the delta (doc_id < 50) against it — only the delta is shingled;
      // oracle = the exact-Jaccard batch pairs restricted to cross
      // (delta, base) pairs, so probe ≡ full batch run is value-pinned.
      // Per-process scratch path; build's overwrite resets the artifact
      // each invocation so bench iterations cannot double-append.
      val docs = t(s, dir, "documents")
      val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
        s"/graft_dedup_index_${ProcessHandle.current().pid()}"
      graft.sources.DedupIndex.build(docs.filter(col("doc_id") >= 50), path)
      val idx = graft.sources.DedupIndex.load(s, path)
      graft.sources.DedupIndex.probe(idx, docs.filter(col("doc_id") < 50))
        .orderBy(col("doc_a"), col("doc_b"))
    }),
    "dedup_components" -> ((s, dir) =>
      // exact dup-cluster canonicalization: min-label propagation to a
      // fixpoint over the near-dup pair graph (LSH-generated pairs, proven
      // equal to exact at these parameters); oracle recomputes reachability
      // with a recursive CTE; serves the shared pair+components artifacts
      lshComponents(s, dir)
        .orderBy(col("doc_id"))),
    "dedup_components_incremental" -> ((s, dir) => {
      // the daily-refresh shape: yesterday's labels are a components()
      // fixpoint of the base edge set; today's delta pairs merge in via a
      // delta-sized label-graph closure + one broadcast-mapped scan —
      // never relabeling the full graph. Value contract: identical to the
      // full recompute, which IS the oracle (same SQL as dedup_components).
      // pairs from the SHARED artifact (one LSH materialization per sweep
      // for the three readers here: base filter, delta contraction, delta
      // new-node scan) and the SMALL third as the base: the operator's
      // cost story is the delta path, so the measured row should price
      // that, not a full base rebuild. Value contract unchanged — any
      // base/delta split of the same pair set merges to the identical
      // fixpoint.
      val pairs = lshPairs(s, dir)
      val base = pairs.filter((col("doc_a") + col("doc_b")) % 3 === 0)
      val delta = pairs.filter((col("doc_a") + col("doc_b")) % 3 =!= 0)
      Dedup.componentsIncremental(Dedup.components(base), delta)
        .orderBy(col("doc_id"))
    }),
    "dedup_best_rep" -> ((s, dir) => {
      // representative SELECTION policy over exact dup clusters: instead of
      // min-id-wins, keep each component's highest-QUALITY member (the
      // policy real pipelines want — the cleanest copy survives, not the
      // earliest-crawled). Composes components × qualityScore; ties break
      // on doc_id so the choice is total.
      val docs = t(s, dir, "documents")
      val comp = lshComponents(s, dir)
      val q = TextAnalysis.qualityScore(docs).select(col("doc_id"), col("quality_score"))
      comp.join(q, Seq("doc_id"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("component"))
            .orderBy(col("quality_score").desc, col("doc_id"))))
        .filter(col("rn") === 1)
        .select(col("component"), col("doc_id").as("rep_id"), col("quality_score"))
        .orderBy(col("component"))
    }),
    "q_explode_lateral" -> ((s, dir) =>
      // table-generating function surface: posexplode (LATERAL VIEW) with
      // positions — one row per token with its 0-based offset
      t(s, dir, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
          posexplode(split(lower(col("text")), " ")).as(Seq("pos", "word")))
        .orderBy(col("doc_id"), col("pos"))),
    "q_regexp_groups" -> ((s, dir) =>
      // regexp capture-group extraction + the empty-string-on-no-match
      // semantic pinned cross-engine
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "#(\\d+)", 1).as("cust_num"),
          regexp_extract(col("c_name"), "(Customer)#", 1).as("prefix"),
          regexp_extract(col("c_name"), "(zzz)(\\d+)", 2).as("no_match"))
        .orderBy(col("c_custkey"))),
    "du_size_histogram" -> ((s, dir) => {
      // operational distribution: how many addresses fall in each usage
      // band (exact integer thresholds — no float binning at the boundary)
      val inv = t(s, dir, "events").select(
        slashKey(col("user_id"), col("event_type"), col("event_id")).as("key"),
        floor(col("value") * 100).as("size"))
      DiskUsageOp.aggregate(inv)
        .select(
          when(col("size_bytes") < 10000, "small")
            .when(col("size_bytes") < 50000, "medium")
            .when(col("size_bytes") < 100000, "large")
            .otherwise("huge").as("band"),
          col("number_files"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_addresses"), sum(col("number_files")).as("n_files"))
        .orderBy(col("band"))
    }),
    "du_compaction_plan" -> ((s, dir) => {
      // small-file compaction planning over the object inventory: key-
      // contiguous target-size bins per prefix (event_type as the
      // directory, event_id as the unique file key) — one prefix exchange
      // + window pass, integral-div bin ids
      val inv = t(s, dir, "events").select(
        col("event_type").as("prefix"),
        col("event_id").as("key"),
        floor(col("value") * 100).cast("long").as("size"))
      Layout.compactionPlan(inv, targetBytes = 1000000L)
        .orderBy(col("prefix"), col("bin_id"))
    }),
    "du_tiering_plan" -> ((s, dir) => {
      // lifecycle-policy simulation on the object inventory: age each
      // object against the newest write (broadcast 1-row bounds agg),
      // route hot <7d / warm <21d / cold, and price the move — per-tier
      // object and byte census plus the per-tier monthly cost under a
      // 100/40/10 micro-unit rate card; one row-local tier expression +
      // one map-side-combined agg
      val ev = Temporal.eventsMicros(s, dir)
        .select(col("ts_us"), floor(col("value") * 100).cast("long").as("size"))
      val mx = ev.agg(max(col("ts_us")).as("mx"))
      ev.crossJoin(broadcast(mx))
        .withColumn("age_days", expr("(mx - ts_us) DIV 86400000000"))
        .withColumn("tier",
          when(col("age_days") < 7L, "hot")
            .when(col("age_days") < 21L, "warm").otherwise("cold"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n_objects"),
          sum(col("size")).as("total_bytes"),
          min(col("age_days")).as("min_age_days"),
          max(col("age_days")).as("max_age_days"))
        .withColumn("monthly_cost_micro",
          col("total_bytes") * when(col("tier") === "hot", 100L)
            .when(col("tier") === "warm", 40L).otherwise(10L))
        .orderBy(col("tier"))
    }),
    "du_prefix_rollup" -> ((s, dir) =>
      // THE disk-usage treemap query: hierarchical directory sizes over
      // the path levels (address / address+type), one ROLLUP lattice —
      // sentinel-coalesced keys, grouping_id levels, integer byte sums
      t(s, dir, "events")
        .select(col("user_id").cast("string").as("address"),
          col("event_type").as("prefix2"),
          floor(col("value") * 100).cast("long").as("size"))
        .rollup(col("address"), col("prefix2"))
        .agg(grouping_id().cast("long").as("lvl"),
          count(lit(1)).as("n_objects"),
          sum(col("size")).as("total_bytes"))
        .select(coalesce(col("address"), lit("<all>")).as("address"),
          coalesce(col("prefix2"), lit("<all>")).as("prefix2"),
          col("lvl"), col("n_objects"), col("total_bytes"))
        .orderBy(col("lvl"), col("address"), col("prefix2"))),
    "du_orphan_audit" -> ((s, dir) => {
      // storage-reconciliation audit on the reference domain: usage rows
      // whose address has no registered account (orphans — a storage
      // leak) vs registered accounts with no usage (idle — candidate
      // cleanup). Both directions as ONE full-outer aggregate join on
      // the key — never two separate anti-join scans of the big side.
      val usage = t(s, dir, "events")
        .groupBy(col("user_id").as("addr"))
        .agg(count(lit(1)).as("n_objects"),
          sum(floor(col("value") * 100).cast("long")).as("bytes"))
      val accounts = t(s, dir, "customer")
        .select(col("c_custkey").as("addr")).distinct()
        .withColumn("registered", lit(true))
      usage.join(accounts, Seq("addr"), "full_outer")
        .agg(
          sum(when(col("registered").isNull, 1L).otherwise(0L)).as("n_orphan_addrs"),
          sum(when(col("registered").isNull, col("bytes")).otherwise(0L)).as("orphan_bytes"),
          sum(when(col("n_objects").isNull, 1L).otherwise(0L)).as("n_idle_accounts"),
          sum(when(col("registered").isNotNull && col("n_objects").isNotNull, 1L)
            .otherwise(0L)).as("n_active_accounts"))
        .select(
          coalesce(col("n_orphan_addrs"), lit(0L)).as("n_orphan_addrs"),
          coalesce(col("orphan_bytes"), lit(0L)).as("orphan_bytes"),
          coalesce(col("n_idle_accounts"), lit(0L)).as("n_idle_accounts"),
          coalesce(col("n_active_accounts"), lit(0L)).as("n_active_accounts"))
    }),
    "du_top_objects_per_prefix" -> ((s, dir) => {
      // "which objects eat each directory": per-prefix top-3 by size
      // through the custom TopKPerKey physical operator — bounded heaps
      // per task, no per-prefix sort, no global window
      val inv = t(s, dir, "events").select(
        col("event_type").as("prefix"), col("event_id").as("key"),
        floor(col("value") * 100).cast("long").as("size"))
      graft.plans.TopK.perKey(inv, keyCols = Seq("prefix"),
          orderCols = Seq("size" -> false, "key" -> true), k = 3)
        .orderBy(col("prefix"), col("size").desc, col("key"))
    }),
    "du_growth_forecast" -> ((s, dir) => {
      // capacity planning on the reference domain: per-address
      // least-squares slope of DAILY usage totals (micro-units/day) —
      // which address grows fast enough to page someone. Day index
      // rebased to the fixture window start (2024-01-01 = epoch day
      // 19723) so the integer moments stay small; slope is
      // shift-invariant so the rebase is free.
      val ev = Temporal.eventsMicros(s, dir).select(
        col("user_id"), col("ts_us"),
        floor(col("value") * 100).cast("long").as("size"))
      Temporal.linearTrend(ev, keyCol = "user_id", valCol = "size",
          rebaseDay = 19723L)
        .orderBy(col("user_id"))
    }),
    "q_acf" -> ((s, dir) => {
      // which lag does usage echo at: per-event-type ACF of daily
      // totals to lag 7 — n-scaled integer moments, no window at all
      val daily = Temporal.dailyTotals(
        Temporal.eventsMicros(s, dir).select(col("event_type"),
          col("ts_us"), floor(col("value") * 100).cast("long").as("size")),
        keyCol = "event_type", valCol = "size", rebaseDay = 19723L)
      Temporal.acfByKey(daily, keyCol = "event_type", bucketCol = "x",
          valCol = "y", maxLag = 7)
        .orderBy(col("event_type"), col("lag_n"))
    }),
    "q_ljung_box" -> ((s, dir) => {
      // is per-type usage just noise? Ljung–Box Q over the q_acf lags —
      // one keyed fold on the same chain, χ²-comparable ppm output
      val daily = Temporal.dailyTotals(
        Temporal.eventsMicros(s, dir).select(col("event_type"),
          col("ts_us"), floor(col("value") * 100).cast("long").as("size")),
        keyCol = "event_type", valCol = "size", rebaseDay = 19723L)
      Temporal.ljungBoxByKey(daily, keyCol = "event_type", bucketCol = "x",
          valCol = "y", maxLag = 7)
        .orderBy(col("event_type"))
    }),
    "du_robust_trend" -> ((s, dir) => {
      // du_growth_forecast's robust twin: Theil–Sen median-of-slopes +
      // Mann–Kendall S per address — the forecast a single backfill
      // spike cannot own; pair space bounded by the daily-totals frame
      val ev = Temporal.eventsMicros(s, dir).select(
        col("user_id"), col("ts_us"),
        floor(col("value") * 100).cast("long").as("size"))
      Temporal.theilSenTrend(ev, keyCol = "user_id", valCol = "size",
          rebaseDay = 19723L)
        .orderBy(col("user_id"))
    }),
    "dedup_stats" -> ((s, dir) => {
      // one-row corpus summary of the dedup pass — banded-LSH hot path,
      // exact-Jaccard oracle (outputs proven equal at these parameters)
      val docs = t(s, dir, "documents")
      val pairs = lshPairs(s, dir)
      val survivors = Dedup.survivors(docs, pairs)
      docs.agg(count(lit(1)).as("n_docs"))
        .crossJoin(pairs.agg(count(lit(1)).as("n_pairs")))
        .crossJoin(survivors.agg(count(lit(1)).as("n_survivors")))
    }),
    "du_top_addresses" -> ((s, dir) => {
      // heavy-hitters: the operational "which users eat the bucket" query
      val inv = t(s, dir, "events").select(
        slashKey(col("user_id"), col("event_type"), col("event_id")).as("key"),
        col("value").as("size"))
      DiskUsageOp.aggregateFractional(inv)
        .orderBy(col("size_bytes").desc, col("address"))
        .limit(20)
    }),
    "text_ngrams_top" -> ((s, dir) =>
      // corpus document-frequency of shingles — the statistic that drives
      // common-shingle pruning of the exact-Jaccard join at scale
      TextAnalysis.shingles(t(s, dir, "documents"), "doc_id", "text", 3)
        .groupBy(col("shingle"))
        .agg(count(lit(1)).as("doc_freq"))
        .orderBy(col("doc_freq").desc, col("shingle"))
        .limit(20)),

    "split_assign" -> ((s, dir) =>
      // deterministic train/val/test assignment (pure function of doc_id)
      Splits.assign(t(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"))),
    "split_sampled_agg_ht" -> ((s, dir) =>
      // AQP priced: group sums from a deterministic 1/8 md5 sample with
      // the Horvitz–Thompson 1/p inflation, exact side and realized
      // err_ppm alongside — one conditional-agg scan computes both
      Splits.sampledAggHt(
        t(s, dir, "lineitem").select(
          (col("l_orderkey") * 10 + col("l_linenumber")).as("rid"),
          col("l_returnflag"), col("l_linestatus"),
          (col("l_quantity").cast(DecimalType(18, 4)) * 10000)
            .cast("long").as("qty_x10k")),
        "rid", Seq("l_returnflag", "l_linestatus"), "qty_x10k", num = 32)
        .orderBy(col("l_returnflag"), col("l_linestatus"))),
    "split_bootstrap_ci" -> ((s, dir) =>
      // the error bar for a corpus mean: 40 deterministic Poisson(1)
      // bootstrap replicas of mean price (cents), percentile 95% CI over
      // the replica means — one exploded map-side-combined agg
      Splits.bootstrapCiMean(
        t(s, dir, "lineitem").select(
          (col("l_orderkey") * 10 + col("l_linenumber")).as("rid"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("cents")),
        "rid", "cents", b = 40)),
    "split_stats" -> ((s, dir) =>
      // stratification check: split × language counts
      Splits.assign(t(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("split"), col("lang"))),
    "split_stratified" -> ((s, dir) =>
      // training-mix rebalancing: halve the over-represented language,
      // keep the rest — deterministic (md5-bucket) so the cut is stable
      // across engines and runs
      Splits.stratifiedSample(t(s, dir, "documents"), "doc_id", "lang",
          Map("en" -> 0.5))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))),
    "split_negative_pairs" -> ((s, dir) =>
      // contrastive negatives: 4 deterministic pseudo-random partners per
      // doc via integer arithmetic (engine-portable, retry-stable)
      Splits.negativePairs(t(s, dir, "documents"), "doc_id", k = 4)
        .orderBy(col("doc_id"), col("k_idx"))),
    "split_pack_batches" -> ((s, dir) =>
      // token-budget sequence packing, two-level (shard-parallel) form:
      // greedy fill per (language, md5-shard), shard-local batch ids made
      // stratum-global by per-shard offsets — strata × shards parallel
      // tasks instead of one task per language; emitted as per-batch stats
      Splits.packBatchesSharded(
          t(s, dir, "documents")
            .select(col("doc_id"), col("lang"),
              size(split(lower(col("text")), " ")).cast("long").as("n_tokens")),
          "lang", "doc_id", "n_tokens", budget = 2048L, shards = 8)
        .groupBy(col("lang"), col("batch_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("batch_tokens"))
        .orderBy(col("lang"), col("batch_id"))),
    "split_leakage_audit" -> ((s, dir) => {
      // train/eval contamination THROUGH DUPLICATES: a doc's near-twin
      // landing in a different split leaks training signal into eval —
      // the audit every split pipeline should ship with. Composition of
      // two verified pieces (normalized dedup keys × md5 split assign);
      // the fixture corpus is dup-free, so twin pairs are PLANTED
      // deterministically in both engines (residue-0 docs of each
      // 10-block share text pairwise — the dedup_exact_normalized
      // discipline). One key-agg + a one-row summary, all integers.
      val docs = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(lit("leak "), expr("doc_id DIV 20").cast("string")))
          .otherwise(col("text")).as("text"))
      val w = Splits.assign(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      val groups = w
        .select(Dedup.normalizedKey(col("text")).as("k"), col("split"))
        .groupBy(col("k")).agg(
          count(lit(1)).as("n"),
          countDistinct(col("split")).as("n_splits"),
          max(when(col("split") === "train", 1L).otherwise(0L)).as("has_train"),
          sum(when(col("split") =!= "train", 1L).otherwise(0L)).as("n_eval"))
      groups.agg(
        sum(when(col("n") >= 2, 1L).otherwise(0L)).as("n_dup_groups"),
        sum(when(col("n") >= 2 && col("n_splits") >= 2, 1L).otherwise(0L))
          .as("n_cross_split_groups"),
        sum(when(col("n") >= 2 && col("n_splits") >= 2, col("n")).otherwise(0L))
          .as("n_leaky_docs"),
        sum(when(col("n") >= 2 && col("has_train") === 1L, col("n_eval"))
          .otherwise(0L)).as("n_eval_contaminated"))
    }),
    "split_cluster_assign" -> ((s, dir) => {
      // the FIX for what split_leakage_audit measures: hash the split off
      // the near-dup CLUSTER's canonical label (singletons label
      // themselves), so a doc and its twins land in the SAME split by
      // construction — train/eval contamination through duplicates is
      // structurally impossible, not merely audited. Serves the shared
      // pair+components artifacts; one broadcast-able label join + a
      // row-local md5 bucket, no new exchange class.
      val docs = t(s, dir, "documents")
      val grouped = docs.select(col("doc_id"))
        .join(lshComponents(s, dir), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("group_id"))
      Splits.assign(grouped, "group_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("group_id"), col("split"))
        .orderBy(col("doc_id"))
    }),
    "split_kfold" -> ((s, dir) =>
      // cross-validation folds as a pure function of the id (md5 bucket
      // mod k): row-local, no shuffle, stable across engines and
      // partitionings; emitted as the fold × language balance audit
      Splits.kfold(t(s, dir, "documents"), "doc_id", k = 5)
        .groupBy(col("fold"), col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("fold"), col("lang"))),
    "split_curriculum" -> ((s, dir) => {
      // curriculum construction from two verified pieces: difficulty
      // bucket = decile floor of the quality score (row-local), then
      // token-budget batches packed WITHIN each bucket by the sharded
      // two-level packer — batches served easiest (highest score) first.
      val q = TextAnalysis.qualityScore(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_tokens"),
          floor(col("quality_score") * 10).cast("long").as("difficulty"))
      Splits.packBatchesSharded(q, "difficulty", "doc_id", "n_tokens",
          budget = 2048L, shards = 8)
        .groupBy(col("difficulty"), col("batch_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("batch_tokens"))
        .orderBy(col("difficulty").desc, col("batch_id"))
    }),
    "du_incremental_merge" -> ((s, dir) => {
      // incremental refresh: history snapshot + delta snapshot merged by
      // re-aggregating partials (decomposable SUM/COUNT) — value-identical
      // to the full recompute, which IS the oracle. The split on event_id
      // stands in for yesterday's inventory vs today's delta.
      val e = t(s, dir, "events")
      def inv(f: DataFrame) = f.select(
        slashKey(col("user_id"), col("event_type"), col("event_id")).as("key"),
        col("value").as("size"))
      // partials stay DECIMAL end-to-end; double only at the serving edge
      val history = DiskUsageOp.aggregateFractionalDecimal(inv(e.filter(col("event_id") % 5 =!= 0)))
      val delta = DiskUsageOp.aggregateFractionalDecimal(inv(e.filter(col("event_id") % 5 === 0)))
      DiskUsageOp.mergeSnapshots(history, delta)
        .withColumn("size_bytes", col("size_bytes").cast("double"))
        .orderBy(col("address"))
    }),
    "du_snapshot_delta" -> ((s, dir) => {
      // operational drift report between two snapshots via FULL OUTER join
      // (the join type the registry otherwise lacks): addresses appearing,
      // disappearing, and growing. Keys are per-event so all three outer
      // cases are exercised by the fixture (only-old, only-new, both).
      val e = t(s, dir, "events")
      def inv(f: DataFrame) = f.select(
        slashKey(col("event_id"), col("event_type")).as("key"),
        col("value").as("size"))
      val old = DiskUsageOp.aggregateFractional(inv(e.filter(col("event_id") % 3 =!= 0)))
      val neu = DiskUsageOp.aggregateFractional(inv(e.filter(col("event_id") % 3 =!= 1)))
      old.as("y").join(neu.as("t"), col("y.address") === col("t.address"), "full_outer")
        .select(
          coalesce(col("t.address"), col("y.address")).as("address"),
          (coalesce(col("t.size_bytes"), lit(0.0)) -
            coalesce(col("y.size_bytes"), lit(0.0))).as("growth_bytes"),
          (coalesce(col("t.number_files"), lit(0L)) -
            coalesce(col("y.number_files"), lit(0L))).as("growth_files"))
        .orderBy(col("address"))
    }),
    "du_salted_agg" -> ((s, dir) => {
      // the skew-hardened two-phase aggregate; result-identical to the
      // plain form, so the oracle is the plain GROUP BY
      // floor (not cast) for the double→long derivation: Spark's cast
      // truncates where DuckDB's rounds, floor is identical in both
      val inv = t(s, dir, "events").select(
        slashKey(col("user_id"), col("event_type"), col("event_id")).as("key"),
        floor(col("value") * 100).as("size"))
      DiskUsageOp.aggregateSalted(inv).orderBy(col("address"))
    }),

    "q_skew_report" -> ((s, dir) => {
      // the "should I salt this key?" measurement: per-key frequency
      // stats for a prospective join/agg key — key cardinality, max and
      // mean (basis points) per-key mass, and the skew ratio max/mean in
      // percent (integer floor). One map-side-combined agg + a one-row
      // summary; the operational companion of q_skew_join_salted.
      val counts = t(s, dir, "events")
        .groupBy(col("event_type")).agg(count(lit(1)).as("c"))
      counts.agg(
          count(lit(1)).as("n_keys"),
          sum(col("c")).as("n_rows"),
          max(col("c")).as("max_key_rows"))
        .select(col("n_keys"), col("n_rows"), col("max_key_rows"),
          expr("CAST(n_rows * 100 DIV n_keys AS BIGINT)").as("mean_key_rows_x100"),
          expr("CAST(max_key_rows * n_keys * 100 DIV n_rows AS BIGINT)")
            .as("skew_ratio_pct"))
    }),
    "q_skew_join_salted" -> ((s, dir) => {
      // the skew-hardened JOIN companion of du_salted_agg: an equi-join
      // on a ~5-value key (the canonical hot-key shape) where each key
      // splits across 8 salted tasks instead of serializing in one.
      // Result-identical to the plain join, which IS the oracle.
      val e = t(s, dir, "events")
      val dim = e.filter(col("event_id") % 2 === 0)
        .groupBy(col("event_type")).agg(count(lit(1)).as("type_even_n"))
      Joins.saltedEquiJoin(e, dim, "event_type", salts = 8, col("event_id"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).as("total_value"),
          min(col("type_even_n")).as("type_even_n"))
        .orderBy(col("event_type"))
    }),

    "q_pagerank" -> ((s, dir) => {
      // PageRank over the undirected order—part incidence graph (parts
      // offset into a disjoint id space): 3 damped iterations, each one
      // edge-keyed join + one decimal-fenced map-side-combined agg; top
      // 100 by (rank, node). The oracle unrolls the same three
      // iterations with the identical rounding fences.
      Graph.pageRankWith(prEdges(s, dir), prDeg(s, dir), iters = 3)
        .orderBy(col("rank").desc, col("node"))
        .limit(100)
    }),
    "q_triangle_counts" -> ((s, dir) => {
      // per-node triangle participation over the part co-occurrence
      // graph (parts sharing an order) via degree-oriented wedge
      // closing — each triangle counted exactly once, wedge volume
      // bounded by the orientation; top 50 by (count, node)
      triCounts(s, dir)
        .orderBy(col("n_triangles").desc, col("node"))
        .limit(50)
    }),
    "q_clustering_coeff" -> ((s, dir) => {
      // local cohesion per part: triangles / C(deg,2) in exact ppm over
      // the part co-occurrence graph — composes the degree-oriented
      // wedge closing with one degree agg; deg<2 nodes emit NULL
      Graph.clusteringCoefficientWith(partCoEdges(s, dir), triCounts(s, dir))
        .orderBy(col("node"))
    }),
    "q_neighbor_jaccard" -> ((s, dir) => {
      // link-prediction scores over the order—part bipartite graph:
      // common neighbors counted through wedges, union by inclusion–
      // exclusion, integer-exact ppm; top 100 by (score, pair). The
      // center cap 20 is the operator's scale contract in action:
      // wedge volume is Σ_centers deg², and the part side's 30–50-degree
      // hubs carry 6.7× the wedge mass of the ≤ 20 centers (measured:
      // 21.6M vs 3.2M at sf0.1) while being the least-informative
      // promiscuous routes — the cap bounds the pair table
      val edges = incidenceEdges(s, dir)
      Graph.neighborJaccard(edges, maxCenterDeg = Some(20L))
        .orderBy(col("jaccard_ppm").desc, col("u"), col("v"))
        .limit(100)
    }),
    "q_degree_assortativity" -> ((s, dir) => {
      // Newman degree-mixing audit over the order—part incidence graph:
      // one row of integer sufficient statistics (directed edge count,
      // Σd, Σd·d', Σd²) + the 6-dp coefficient — the structural read
      // before hub caps / skew salting. Bipartite incidence graphs mix
      // disassortatively, which the sign pins. The oracle replays the
      // identical degree joins and the same fixed-order expression.
      val edges = incidenceEdges(s, dir)
      Graph.degreeAssortativity(edges)
    }),
    "q_label_propagation" -> ((s, dir) => {
      // LPA communities over the order—part incidence graph, 3 sync
      // rounds with the deterministic min-label tie-break; emitted as
      // the community census (top 50 by size). The labeling itself is
      // the shared [[lpaLabels]] artifact (q_modularity audits the SAME
      // labeling — computing it twice per sweep is pure duplicate work)
      lpaLabels(s, dir)
        .groupBy(col("label")).agg(count(lit(1)).as("n_members"))
        .orderBy(col("n_members").desc, col("label"))
        .limit(50)
    }),
    "q_hits" -> ((s, dir) => {
      // HITS over the DIRECTED order→part incidence graph: 3 iterations
      // of fenced half-steps (decimal-exact contribution sums, broadcast
      // 1-row L1 normalizers); orders surface as hubs, parts as
      // authorities — top 100 by (auth, hub, node)
      val edges = incidenceEdges(s, dir)
      Graph.hits(edges, iters = 3)
        .orderBy(col("auth").desc, col("hub").desc, col("node"))
        .limit(100)
    }),
    "q_modularity" -> ((s, dir) => {
      // community-quality audit of the LPA labeling: Newman–Girvan Q
      // from integer sufficient statistics (intra edges, Σd_c²) — the
      // one-row read that decides whether q_label_propagation's
      // communities are structure or noise. Audits the SHARED
      // [[lpaLabels]] artifact — the deterministic labeling both rows
      // describe (the oracle side already shares lpOracleCtes)
      val edges = incidenceEdges(s, dir)
      Graph.modularity(edges, lpaLabels(s, dir))
    }),
    "q_ppr" -> ((s, dir) => {
      // personalized PageRank from part 0 over the order—part incidence
      // graph: the random-walk-with-restart proximity ranking — same
      // fenced iteration as q_pagerank, teleport mass pinned to the seed
      Graph.personalizedPageRankWith(prEdges(s, dir), prDeg(s, dir),
          seed = 1000000000L, iters = 3)
        .orderBy(col("rank").desc, col("node"))
        .limit(50)
    }),
    "q_kcore" -> ((s, dir) => {
      // k-core of the part co-occurrence graph by synchronous peeling:
      // k=80 cascades for 5 rounds on this fixture (108821 → 105232
      // edges) and round 5 IS the fixpoint — the oracle replays the
      // identical 5 peels; per round one degree agg + two semi-joins
      val edges = partCoEdges(s, dir)
      Graph.kCore(edges, k = 80, rounds = 5).orderBy(col("node"))
    }),
    "q_cusum_changepoints" -> ((s, dir) => {
      // WHERE does the event-value level shift? hourly decimal-fenced
      // bucket sums first (the series is bounded by the time range,
      // never the event count), then the integer-exact scaled CUSUM
      // n·S_i = n·cum_i − i·T with max-|·| argmax flagged (smallest
      // bucket on ties) — drift located on a timeline, the continuous
      // companion of q_drift_report's two-snapshot compare
      val ev = Temporal.eventsMicros(s, dir)
        .select(expr("ts_us DIV 3600000000").as("bucket"),
          col("value").cast(DecimalType(18, 4)).as("dv"))
        .groupBy(col("bucket"))
        .agg((sum(col("dv")) * 10000).cast("long").as("v"))
      Temporal.cusumChangepoints(ev).orderBy(col("bucket"))
    }),
    "q_cusum_by_key" -> ((s, dir) => {
      // the production form of the question: WHICH user's usage level
      // shifted, and when — per-user daily decimal-fenced totals, then
      // the same integer n_k·S_i algebra per key with a per-key argmax,
      // all windows sharing ONE partitionBy(key) exchange
      val ev = Temporal.eventsMicros(s, dir)
        .select(col("user_id").as("key"),
          expr("ts_us DIV 86400000000").as("bucket"),
          col("value").cast(DecimalType(18, 4)).as("dv"))
        .groupBy(col("key"), col("bucket"))
        .agg((sum(col("dv")) * 10000).cast("long").as("v"))
      Temporal.cusumChangepointsByKey(ev)
        .orderBy(col("key"), col("bucket"))
    }),
    "q_cusum_segments" -> ((s, dir) => {
      // how many TIMES did the level shift? binary segmentation (depth 2
      // → up to 4 segments) over the same integer n·S_i statistic and
      // the same hourly decimal-fenced series as q_cusum_changepoints
      val ev = Temporal.eventsMicros(s, dir)
        .select(expr("ts_us DIV 3600000000").as("bucket"),
          col("value").cast(DecimalType(18, 4)).as("dv"))
        .groupBy(col("bucket"))
        .agg((sum(col("dv")) * 10000).cast("long").as("v"))
      Temporal.cusumSegments(ev, depth = 2).orderBy(col("bucket"))
    }),
    "q_seasonal_decompose" -> ((s, dir) => {
      // trend / 24h-seasonal / residual split of the hourly value series
      // (the same decimal-fenced buckets as q_cusum_changepoints) —
      // anomaly detection should scan residual_e6, not raw v
      val ev = Temporal.eventsMicros(s, dir)
        .select(expr("ts_us DIV 3600000000").as("bucket"),
          col("value").cast(DecimalType(18, 4)).as("dv"))
        .groupBy(col("bucket"))
        .agg((sum(col("dv")) * 10000).cast("long").as("v"))
      Temporal.seasonalDecompose(ev, season = 24).orderBy(col("bucket"))
    }),
    "q_seasonal_anomalies" -> ((s, dir) => {
      // which hours are REALLY odd? Hampel flags on the decomposition's
      // residual — a nightly dip never false-alarms, a strange bucket
      // inside a normal level does; edge buckets are absent, not
      // silently normal
      val ev = Temporal.eventsMicros(s, dir)
        .select(expr("ts_us DIV 3600000000").as("bucket"),
          col("value").cast(DecimalType(18, 4)).as("dv"))
        .groupBy(col("bucket"))
        .agg((sum(col("dv")) * 10000).cast("long").as("v"))
      Temporal.seasonalAnomalies(ev, season = 24).orderBy(col("bucket"))
    }),
    "q_cusum_segments_by_key" -> ((s, dir) => {
      // how many times did EACH user's level shift? per-user daily
      // totals (the q_cusum_by_key input), depth-2 binary segmentation
      // per key — every window shares the (key, seg) exchange
      val ev = Temporal.eventsMicros(s, dir)
        .select(col("user_id").as("key"),
          expr("ts_us DIV 86400000000").as("bucket"),
          col("value").cast(DecimalType(18, 4)).as("dv"))
        .groupBy(col("key"), col("bucket"))
        .agg((sum(col("dv")) * 10000).cast("long").as("v"))
      Temporal.cusumSegmentsByKey(ev, depth = 2)
        .orderBy(col("key"), col("bucket"))
    }),
    "q_survival_curve" -> ((s, dir) =>
      // what fraction of users survive past day t? Kaplan–Meier over
      // last-activity churn days, survival e6-floored at every step —
      // the retention curve q_retention_cohorts' triangle summarizes
      Temporal.kaplanMeier(
        Temporal.eventsMicros(s, dir)
          .select(col("user_id"), expr("ts_us DIV 86400000000").as("day")),
        "user_id", "day")
        .orderBy(col("day"))),
    "q_mase_eval" -> ((s, dir) => {
      // is the hourly value series worth forecasting? persistence vs
      // 24h-seasonal-naive MAE + their ratio over the bucketed series —
      // the MASE go/no-go read before building anything fancier; same
      // decimal-fenced hourly sums as q_cusum_changepoints
      val ev = Temporal.eventsMicros(s, dir)
        .select(expr("ts_us DIV 3600000000").as("bucket"),
          col("value").cast(DecimalType(18, 4)).as("dv"))
        .groupBy(col("bucket"))
        .agg((sum(col("dv")) * 10000).cast("long").as("v"))
      Temporal.forecastBaselines(ev, season = 24)
    }),
    "q_funnel" -> ((s, dir) =>
      // ordered conversion funnel view → click → purchase: one user-keyed
      // filter+join+agg per step (greedy earliest-completion chain — no
      // window, no per-user history in one task)
      Temporal.funnel(Temporal.eventsMicros(s, dir),
          steps = Seq("view", "click", "purchase"))
        .orderBy(col("step_idx"))),
    "q_retention_cohorts" -> ((s, dir) =>
      // the retention triangle: first-activity epoch-week cohorts ×
      // weeks-since-cohort distinct-user counts; integer week arithmetic
      Temporal.retentionCohorts(Temporal.eventsMicros(s, dir))
        .orderBy(col("cohort_week"), col("age_weeks"))),
    "q_merge_upsert" -> ((s, dir) => {
      // lakehouse MERGE semantics without a table format: base FULL OUTER
      // delta on the key, op ∈ insert/update/keep, merged value prefers
      // the delta — the compaction step every incremental snapshot store
      // runs. Deterministic event_id splits stand in for the snapshots.
      val e = t(s, dir, "events")
      val base = e.filter(col("event_id") % 3 =!= 0)
        .select(col("event_id"), col("value").as("base_value"))
      val delta = e.filter(col("event_id") % 5 === 0)
        .select(col("event_id"), (col("value") * 2).as("delta_value"))
      base.join(delta, Seq("event_id"), "full_outer")
        .select(
          col("event_id"),
          when(col("base_value").isNull, "insert")
            .when(col("delta_value").isNull, "keep")
            .otherwise("update").as("op"),
          coalesce(col("delta_value"), col("base_value")).as("value"))
        .orderBy(col("event_id"))
    }),
    "q_gap_fill" -> ((s, dir) => {
      // time-series gap filling: hourly activity with EXPLICIT zero rows
      // for silent hours (the densified grid downstream joins need) —
      // grid exploded from a one-row bounds agg (the bounded
      // global-decision pattern), counts left-joined back on the hour key
      val ev = Temporal.eventsMicros(s, dir)
        .select(expr("ts_us DIV 3600000000").as("hour_idx"), col("value"))
      val byHour = ev.groupBy(col("hour_idx"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      val grid = byHour.agg(min("hour_idx").as("lo"), max("hour_idx").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("hour_idx"))
      grid.join(byHour, Seq("hour_idx"), "left")
        .select(col("hour_idx"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("total_value"), lit(0.0)).as("total_value"))
        .orderBy(col("hour_idx"))
    }),
    "q_cdc_compact" -> ((s, dir) => {
      // CDC log compaction: latest record per key WITHOUT a window —
      // argmax as max(struct(ts, tiebreak, payload)), which is map-side
      // combinable, so a hot key collapses to one row per task before the
      // exchange (a window would sort the key's whole history inside ONE
      // task; nothing splits a window partition)
      val ev = Temporal.eventsMicros(s, dir)
        .select(col("user_id"), col("event_type"), col("ts_us"),
          col("event_id"), col("value"))
      ev.groupBy(col("user_id"), col("event_type"))
        .agg(max(struct(col("ts_us"), col("event_id"), col("value"))).as("last"))
        .select(col("user_id"), col("event_type"),
          col("last.ts_us").as("last_ts_us"),
          col("last.event_id").as("last_event_id"),
          col("last.value").as("last_value"))
        .orderBy(col("user_id"), col("event_type"))
    }),
    "q_event_transitions" -> ((s, dir) =>
      // first-order Markov matrix over per-user event sequences: one lag
      // window + one map-side-combined pair count; probabilities are
      // integer ppm of the FROM state's outgoing mass
      Temporal.eventTransitions(Temporal.eventsMicros(s, dir))
        .orderBy(col("prev_type"), col("next_type"))),
    "q_kanon_audit" -> ((s, dir) =>
      // k-anonymity release audit on the (event_type, hour-of-day)
      // quasi-identifier: one QI-keyed agg + a one-row summary — the
      // suppression-cost number a privacy review wants
      Hygiene.kAnonAudit(
        Temporal.eventsMicros(s, dir).select(col("event_type"),
          expr("(ts_us DIV 3600000000) % 24").as("hour_of_day")),
        Seq("event_type", "hour_of_day"), k = 50)),
    "q_ldiversity_audit" -> ((s, dir) =>
      // the homogeneity-attack audit on the same release shape: per
      // (event_type, hour) group, how DIVERSE is the sensitive user set —
      // a 50-row group with one user leaks that user to anyone who can
      // name the group, which k-anonymity alone never catches
      Hygiene.lDiversityAudit(
        Temporal.eventsMicros(s, dir).select(col("event_type"),
          expr("(ts_us DIV 3600000000) % 24").as("hour_of_day"),
          col("user_id")),
        Seq("event_type", "hour_of_day"), "user_id", l = 10)),
    "q_assoc_rules" -> ((s, dir) => {
      // which part brands co-occur in orders beyond chance: A-priori
      // pairwise rules over (order, brand) baskets — within-basket pair
      // expansion bounded by basket size, support prune before the
      // per-item joins, integer-ppm support/confidence/lift; top 100 by
      // (lift, pair)
      val baskets = t(s, dir, "lineitem")
        .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
      Assoc.pairRules(baskets, minPairN = 20)
        .orderBy(col("lift_ppm").desc, col("item_a"), col("item_b"))
        .limit(100)
    }),
    "q_ess_weights" -> ((s, dir) =>
      // is the reweighted "sample" real? Kish effective sample size per
      // event_type over the decimal-scaled values-as-weights — ESS
      // collapsing toward 1 means a few rows carry all the weight
      Splits.effectiveSampleSize(
        Temporal.eventsMicros(s, dir).select(col("event_type"),
          (col("value").cast(DecimalType(18, 4)) * 10000)
            .cast("long").as("w")),
        Seq("event_type"), "w")
        .orderBy(col("event_type"))),
    "q_reliability_curve" -> ((s, dir) => {
      // is the quality score CALIBRATED? decile reliability curve of the
      // score (ppm) against the is-English label — gap_ppm per bin is
      // the signed miscalibration a score-threshold corpus cut inherits
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.qualityScore(docs)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(
          round(col("quality_score") * 1000000, 0).cast("long").as("s"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      Hygiene.reliabilityCurve(scored, "s", "y", buckets = 10)
        .orderBy(col("bin"))
    }),
    "q_score_auc" -> ((s, dir) => {
      // does the quality score DISCRIMINATE at all? exact Mann–Whitney
      // AUC of the same (score, is-English) frame — the companion
      // number to q_reliability_curve's calibration read
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.qualityScore(docs)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(
          round(col("quality_score") * 1000000, 0).cast("long").as("s"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      Hygiene.scoreAuc(scored, "s", "y")
    }),
    "q_score_auc_by_source" -> ((s, dir) => {
      // the mixture read: the same AUC per SOURCE — a scorer that only
      // discriminates on the easy source reads fine corpus-wide and
      // useless on the one that matters
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.qualityScore(docs)
        .join(docs.select(col("doc_id"), col("lang"), col("source")),
          Seq("doc_id"))
        .select(col("source").as("key"),
          round(col("quality_score") * 1000000, 0).cast("long").as("s"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      Hygiene.scoreAucByKey(scored, "key", "s", "y").orderBy(col("key"))
    }),
    "q_trimmed_mean" -> ((s, dir) =>
      // robust location of line price (cents): 5%-trimmed and
      // winsorized means next to the plain mean — interval arithmetic
      // over the sorted distinct-value fold, no per-row rank
      Hygiene.trimmedMean(
        t(s, dir, "lineitem").select(
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("cents")),
        "cents", trimPpm = 50000L)),
    "q_spearman" -> ((s, dir) =>
      // monotone association between quantity and line price: price is
      // qty·unit_price so ρ is strongly positive but well short of 1
      // (unit prices vary) — tie-heavy on the 50-value quantity side,
      // exercising the average-rank fold; both carriers NDV-bounded
      // (integral qty, cent prices)
      Hygiene.spearmanCorr(
        t(s, dir, "lineitem").select(
          col("l_quantity").cast("long").as("qty"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("cents")),
        "qty", "cents")),
    "q_dp_sensitivity" -> ((s, dir) =>
      // the pre-release read for a user-level DP aggregate: per
      // event_type, how hard can ONE user move the count (max_user_rows)
      // or the sum (max_user_abs_sum), and does any single user dominate
      // the group (top_user_share_ppm) — two stacked keyed aggs, exact
      // integers on the decimal-scaled value
      Hygiene.dpSensitivityAudit(
        Temporal.eventsMicros(s, dir).select(col("event_type"),
          col("user_id"),
          (col("value").cast(DecimalType(18, 4)) * 10000)
            .cast("long").as("v")),
        "user_id", Seq("event_type"), "v")
        .orderBy(col("event_type"))),
    "q_jackknife_ci" -> ((s, dir) =>
      // the error bar the per-type value means should ship with:
      // delete-one-md5-fold jackknife variance, deterministic folds,
      // exact integer moments — two keyed aggs + one keyed join, no
      // window, no group buffered anywhere
      Hygiene.jackknifeVariance(
        Temporal.eventsMicros(s, dir).select(col("event_type"),
          col("event_id"),
          (col("value").cast(DecimalType(18, 4)) * 10000)
            .cast("long").as("v")),
        // v already carries 10⁴: the residual 10² makes the means
        // micro-units of the ORIGINAL value and keeps Σm² ≪ 2⁶³
        "event_type", "v", "event_id", scale = 100L)
        .orderBy(col("event_type"))),
    "split_bootstrap_ci_by_key" -> ((s, dir) =>
      // the stratified error bar next to q_jackknife_ci's variance read:
      // per event_type, a 40-replica Poisson-bootstrap percentile CI of
      // the mean value (x10k units) — every stage keyed, rank windows
      // over B-bounded per-key partitions
      Splits.bootstrapCiMeanByKey(
        Temporal.eventsMicros(s, dir).select(col("event_type"),
          col("event_id"),
          (col("value").cast(DecimalType(18, 4)) * 10000)
            .cast("long").as("v")),
        "event_id", "event_type", "v", b = 40)
        .orderBy(col("event_type"))),
    "q_tcloseness_audit" -> ((s, dir) =>
      // the skew-leak audit completing the privacy ladder: per QI group,
      // ordered-EMD between the group's sensitive-level distribution and
      // the corpus-wide one, integer-exact ppm via cleared denominators —
      // a group can pass k-anonymity AND l-diversity and still flag here
      Hygiene.tClosenessAudit(
        Temporal.eventsMicros(s, dir).select(col("event_type"),
          expr("(ts_us DIV 3600000000) % 24").as("hour_of_day"),
          (col("user_id") % 10).as("lvl")),
        Seq("event_type", "hour_of_day"), "lvl", tPpm = 20000)
        .orderBy(col("event_type"), col("hour_of_day"))),
    "q_spatial_radius_join" -> ((s, dir) => {
      // grid-blocked proximity self-join (the 2D analog of banding):
      // synthetic integer coordinates from the customer key, exact
      // integer dist² ≤ r², 3×3 stencil with cell ≥ radius so the
      // blocking is a guarantee. The ORACLE is the all-pairs brute
      // force — the gate itself proves blocked ≡ exhaustive.
      val pts = t(s, dir, "customer").select(
        col("c_custkey").as("id"),
        (col("c_custkey") * 7919 % 2000).as("x"),
        (col("c_custkey") * 104729 % 2000).as("y"))
      Joins.radiusJoinBlocked(pts, radius = 60, cell = 64)
        .orderBy(col("id_a"), col("id_b"))
    }),
    "q_radius_join_2table" -> ((s, dir) => {
      // the cross-frame form of the proximity question — which SITES
      // (suppliers) are near each point (customer)? Both frames span all
      // four quadrants (offset −1000) so the floor-snap discipline is
      // exercised in the gate, not just the spec; oracle = all-pairs
      // brute force, proving blocked ≡ exhaustive cross-frame too
      val pts = t(s, dir, "customer").select(
        col("c_custkey").as("id"),
        (col("c_custkey") * 7919 % 2000 - 1000).as("x"),
        (col("c_custkey") * 104729 % 2000 - 1000).as("y"))
      val sites = t(s, dir, "supplier").select(
        col("s_suppkey").as("id"),
        (col("s_suppkey") * 12007 % 2000 - 1000).as("x"),
        (col("s_suppkey") * 30011 % 2000 - 1000).as("y"))
      Joins.radiusJoin2(pts, sites, radius = 80, cell = 96)
        .orderBy(col("point_id"), col("site_id"))
    }),
    "q_fuzzy_blocked" -> ((s, dir) =>
      // entity-resolution candidates: (nation, segment)-blocked customer
      // self-join scored by exact Levenshtein ≤ 2 — candidate volume is
      // Σ block², never all-pairs; the pair artifact is shared with
      // q_entity_resolution (build-once/consume-many)
      fuzzyPairs(s, dir)
        .orderBy(col("u_key"), col("v_key"))),
    "q_entity_resolution" -> ((s, dir) => {
      // record linkage end-to-end: blocked Levenshtein candidates →
      // connected components (transitive closure — A≈B, B≈C ⇒ one
      // entity) → canonical min-key entity ids with singletons kept as
      // their own entity; the census a dedupe-merge pipeline ships.
      // Every stage is its verified operator (q_fuzzy_blocked,
      // dedup_components) — this row pins the composition.
      val cust = t(s, dir, "customer")
      val pairs = fuzzyPairs(s, dir)
        .select(col("u_key").as("doc_a"), col("v_key").as("doc_b"))
      val comp = Dedup.components(pairs)
        .withColumnRenamed("doc_id", "c_custkey")
      cust.select(col("c_custkey"))
        .join(comp, Seq("c_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("component"), col("c_custkey")).as("entity"))
        .groupBy(col("entity"))
        .agg(count(lit(1)).as("n_members"),
          min(col("c_custkey")).as("min_member"),
          max(col("c_custkey")).as("max_member"))
        .orderBy(col("entity"))
    }),
    "q_churn_labels" -> ((s, dir) =>
      // leakage-free churn labels: features from ≤ cutoff only, label
      // from > cutoff only (cutoff = max ts − 7 days, a broadcast 1-row
      // bounds agg); one keyed agg + one keyed left join
      Temporal.churnLabels(Temporal.eventsMicros(s, dir),
          horizonUs = 7L * 86400L * 1000000L)
        .orderBy(col("user_id"))),
    "split_target_encode" -> ((s, dir) =>
      // leave-one-out target encoding (Micci-Barreca 2001): category agg
      // joined back row-local, own row excluded — integer micro-units,
      // singletons NULL; sampled to keep the registry row small
      Splits.looTargetEncode(
          t(s, dir, "events").filter(col("event_id") % 20 === 0),
          "event_type", "value", "event_id")
        .orderBy(col("event_id"))),
    "q_rfm_scores" -> ((s, dir) => {
      // RFM segmentation (the classic CRM scoring): per customer,
      // recency days from the corpus max date (one-row bounds agg),
      // order frequency, monetary total in cents — each bucketed 1-4 by
      // rank-exact sketch quartiles broadcast row-local (the equi-depth
      // discipline; never a corpus-ordered ntile window); rfm_code
      // summarizes, emitted as the segment census
      val o = t(s, dir, "orders")
      val bounds = o.agg(max(col("o_orderdate")).as("max_d"))
      val cust = o.crossJoin(broadcast(bounds))
        .groupBy(col("o_custkey"))
        .agg(min(datediff(col("max_d"), col("o_orderdate"))).as("recency_days"),
          count(lit(1)).as("frequency"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("monetary_c"))
      val edges = cust.agg(
        expr("approx_percentile(recency_days, array(0.25D,0.5D,0.75D), 1000000)").as("re"),
        expr("approx_percentile(frequency,    array(0.25D,0.5D,0.75D), 1000000)").as("fe"),
        expr("approx_percentile(monetary_c,   array(0.25D,0.5D,0.75D), 1000000)").as("me"))
      def bucket(c: Column, e: Column): Column =
        when(c <= element_at(e, 1), 1L).when(c <= element_at(e, 2), 2L)
          .when(c <= element_at(e, 3), 3L).otherwise(4L)
      cust.crossJoin(broadcast(edges))
        .select(
          // low recency_days = GOOD → invert the bucket for the R score
          (lit(5L) - bucket(col("recency_days"), col("re"))).as("r_score"),
          bucket(col("frequency"), col("fe")).as("f_score"),
          bucket(col("monetary_c"), col("me")).as("m_score"))
        .select((col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
          .as("rfm_code"))
        .groupBy(col("rfm_code")).agg(count(lit(1)).as("n_customers"))
        .orderBy(col("rfm_code"))
    }),
    "q_attribution" -> ((s, dir) => {
      // first-touch conversion attribution: sessions from the shared
      // gap-flag chain (one exchange + sort), the session's first event
      // as a struct-min (map-side combinable, no second window), then
      // purchases credited to their session's first touch
      val sess = Temporal.withSessionIds(Temporal.eventsMicros(s, dir),
        "user_id", "ts_us", "event_id", gapMicros = 1800000000L)
      val first = sess.groupBy(col("user_id"), col("session_idx"))
        .agg(min(struct(col("ts_us"), col("event_id"), col("event_type")))
          .as("f"))
        .select(col("user_id"), col("session_idx"),
          col("f.event_type").as("first_touch"))
      sess.filter(col("event_type") === "purchase")
        .join(first, Seq("user_id", "session_idx"))
        .groupBy(col("first_touch"))
        .agg(count(lit(1)).as("n_purchases"), dsum(col("value")).as("total_value"))
        .orderBy(col("first_touch"))
    }),
    "q_session_paths" -> ((s, dir) => {
      // session path mining: each session's first-3-event path (ordered
      // struct sort inside a per-session collect — bounded by session
      // length, never a corpus-ordered window), counted corpus-wide;
      // the "how do users start" product question
      val sess = Temporal.withSessionIds(Temporal.eventsMicros(s, dir),
        "user_id", "ts_us", "event_id", gapMicros = 1800000000L)
      sess.groupBy(col("user_id"), col("session_idx"))
        .agg(array_join(
          transform(
            slice(sort_array(collect_list(
              struct(col("ts_us"), col("event_id"), col("event_type")))), 1, 3),
            x => x.getField("event_type")), ">").as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(20)
    }),
    "ann_mmr_rerank" -> ((s, dir) =>
      // diversity-aware serving (Carbonell & Goldstein MMR, λ=½ as pure
      // int64 rel−maxsim): distributed shortlist + pairwise sims, then
      // the bounded driver greedy; oracle unrolls the identical k picks
      Similarity.mmrRerank(t(s, dir, "embeddings"),
          t(s, dir, "embeddings").filter(col("vec_id") < 6),
          shortlist = 12, k = 4)
        .orderBy(col("query_id"), col("mmr_step"))),
    "ann_mmr_rerank_lsh" -> ((s, dir) => {
      // MMR's SCALE form: the shortlist is FED from the banded sign-LSH
      // serving chain (rel = round(score·10⁴) int64) instead of the brute
      // queries×corpus θ-join — no BroadcastNestedLoopJoin anywhere in
      // the plan (EngineSpec-pinned); the oracle replays the identical
      // LSH chain, trim, pair sims, and greedy picks
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
        .orderBy(col("query_id"), col("mmr_step"))
    }),
    "ann_mmr_recall" -> ((s, dir) => {
      // the QUALITY number for the fed form: per-query recall of the
      // LSH-fed MMR picks against the brute-shortlist MMR picks — the
      // same recallAt measurement every other approximate family carries
      // (the tuning read: how much diversity-aware serving quality the
      // θ-join-free shortlist costs). Oracle composes BOTH greedy chains
      // (namespaced step CTEs) with the recall join.
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val planes = Similarity.prepared(emb.filter(col("vec_id") < 4),
          "vec_id", "embedding")
        .select(col("id").as("plane_id"), col("v").as("pv"))
      val short = Similarity.lshTopKBanded(emb, q, planes, bands = 2, k = 12)
        .select(col("query_id"), col("neighbor_id"),
          round(col("score") * 10000, 0).cast("long").as("rel"))
      val fed = Similarity.mmrRerank(emb, q, shortlist = 12, k = 4,
        candidates = Some(short))
      val brute = Similarity.mmrRerank(emb, q, shortlist = 12, k = 4)
      Similarity.recallAt(fed, brute).orderBy(col("query_id"))
    }),
    "q_recursive_bfs" -> ((s, dir) => {
      // WITH RECURSIVE (SQL surface new in Spark 4): BFS frontier
      // expansion over the part co-occurrence graph from the smallest
      // part — depth-bounded UNION ALL recursion (the engine-portable
      // form; cycles are tamed by the bound, min-depth dedup after),
      // then reachability census per hop count
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_rb")
      s.sql(
        """WITH RECURSIVE li AS (
          |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem_rb),
          |e AS (SELECT x.p AS a, y.p AS b FROM li x JOIN li y
          |      ON x.o = y.o AND x.p <> y.p),
          |seed AS (SELECT MIN(l_partkey) AS n FROM lineitem_rb),
          |bfs(n, d) AS (
          |  SELECT n, 0 FROM seed
          |  UNION ALL
          |  SELECT e.b, bfs.d + 1 FROM bfs JOIN e ON e.a = bfs.n
          |  WHERE bfs.d < 2),
          |m AS (SELECT n, MIN(d) AS depth FROM bfs GROUP BY n)
          |SELECT CAST(depth AS BIGINT) AS depth, COUNT(*) AS n_nodes
          |FROM m GROUP BY depth ORDER BY depth""".stripMargin)
    }),
    "q_unpivot_metrics" -> ((s, dir) =>
      // wide→long melt (the pivot row's inverse surface): three measure
      // columns unpivoted to (metric, value) rows — Spark's native
      // unpivot is a zero-shuffle row-local expand — then one keyed agg
      t(s, dir, "lineitem")
        .unpivot(Array(col("l_returnflag")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "value")
        .groupBy(col("l_returnflag"), col("metric"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy(col("l_returnflag"), col("metric"))),
    "q_time_weighted_avg" -> ((s, dir) =>
      // step-function integral mean per user — burst-proof telemetry
      // averaging in overflow-safe centi-unit × millisecond int64
      Temporal.timeWeightedAvg(Temporal.eventsMicros(s, dir))
        .orderBy(col("user_id"))),
    "q_histogram_equidepth" -> ((s, dir) => {
      // equi-depth histogram: quartile edges from the mergeable
      // approx_percentile sketch (rank-exact at accuracy ≥ n — the
      // q_percentile_approx contract), broadcast onto a row-local bucket
      // test, one map-side-combined count agg; micro-unit integers
      val v = t(s, dir, "lineitem")
        .select(round(col("l_extendedprice") * lit(1000000L), 0)
          .cast("long").as("v"))
      val e = v.agg(expr(
        "approx_percentile(v, array(0.25D, 0.5D, 0.75D), 1000000)").as("es"))
      v.crossJoin(broadcast(e))
        .select(col("v"),
          when(col("v") <= element_at(col("es"), 1), 0L)
            .when(col("v") <= element_at(col("es"), 2), 1L)
            .when(col("v") <= element_at(col("es"), 3), 2L)
            .otherwise(3L).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("v")).as("min_v"),
          max(col("v")).as("max_v"))
        .orderBy(col("bucket"))
    }),
    "q_table_profile" -> ((s, dir) =>
      // ANALYZE surface: null/NDV/min/max per column in ONE pass (Expand
      // for the multi-column distincts, native-type min/max stringified
      // after, stack pivot) — CBO inputs + the dump-drift numbers
      Hygiene.tableProfile(t(s, dir, "lineitem"),
          Seq("l_orderkey", "l_partkey", "l_returnflag", "l_linestatus"))
        .orderBy(col("col_name"))),
    "q_join_size_estimate" -> ((s, dir) => {
      // join cardinality from d×w sketch integers BEFORE any exchange:
      // CMS inner product, a deterministic upper bound on the exact size
      val e = t(s, dir, "events")
      Joins.cmsJoinSizeEstimate(
        e.filter(col("user_id") % 3 =!= 0),
        e.filter(col("user_id") % 5 === 0),
        "user_id", width = 256, depth = 3)
    }),
    "dedup_cross_source_matrix" -> ((s, dir) => {
      // the PAIRWISE companion of dedup_rate_by_source: which source
      // pairs share duplicated content (the "does CC overlap C4" read
      // that decides which feed is redundant). Exact normalized-key
      // groups sized [2, 1000] pair within the group (bounded blow-up:
      // the df-cap discipline — a boilerplate key above the cap is a
      // cleanup finding, not a pair source), source pair canonicalized.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"),
        when(col("doc_id") % 10 === 0,
          concat(lit("leak "), expr("doc_id DIV 20").cast("string")))
          .otherwise(col("text")).as("text"))
      val keyed = Dedup.cached(docs.select(col("doc_id"), col("source"),
        Dedup.normalizedKey(col("text")).as("k")))
      val groups = keyed.groupBy(col("k")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2 && col("n") <= 1000).select(col("k"))
      val in2 = keyed.join(groups, Seq("k"))
      in2.as("x").join(in2.as("y"),
          col("x.k") === col("y.k") && col("x.doc_id") < col("y.doc_id"))
        .select(least(col("x.source"), col("y.source")).as("src_a"),
          greatest(col("x.source"), col("y.source")).as("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_dup_pairs"))
        .orderBy(col("src_a"), col("src_b"))
    }),
    "dedup_rate_by_source" -> ((s, dir) => {
      // the dedup DASHBOARD cut: duplicate mass per source over the
      // planted-twin corpus (the leakage-audit surface) — per source:
      // docs, docs whose normalized key repeats anywhere, integer ppm;
      // the number that tells you WHICH feed to fix
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"),
        when(col("doc_id") % 10 === 0,
          concat(lit("leak "), expr("doc_id DIV 20").cast("string")))
          .otherwise(col("text")).as("text"))
      val keyed = docs.select(col("doc_id"), col("source"),
        Dedup.normalizedKey(col("text")).as("k"))
      val groups = keyed.groupBy(col("k")).agg(count(lit(1)).as("n"))
      keyed.join(groups, Seq("k"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n") >= 2, 1L).otherwise(0L)).as("n_dup_docs"))
        .select(col("source"), col("n_docs"), col("n_dup_docs"),
          expr("CAST((n_dup_docs * 1000000) DIV n_docs AS BIGINT)")
            .as("dup_ppm"))
        .orderBy(col("source"))
    }),
    "q_delete_closure" -> ((s, dir) => {
      // deletion-closure audit: a right-to-be-forgotten delete that
      // removes only the named doc leaves its near-twins serving the
      // same content — the closure is every doc sharing a normalized
      // dedup key with a tombstoned doc. Planted twin groups (the
      // leakage-audit surface) + a deterministic tombstone set; one
      // key-agg + a semi-join-shaped max flag + a one-row summary.
      val docs = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(lit("leak "), expr("doc_id DIV 20").cast("string")))
          .otherwise(col("text")).as("text"))
        .withColumn("tombstoned", (col("doc_id") % 40 === 0).cast("int"))
      val groups = docs
        .select(Dedup.normalizedKey(col("text")).as("k"), col("tombstoned"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("tombstoned")).as("n_tomb"))
      groups.agg(
        sum(col("n_tomb")).as("n_tombstones"),
        sum(when(col("n_tomb") > 0, col("n")).otherwise(0L)).as("n_closure_docs"),
        sum(when(col("n_tomb") > 0, col("n") - col("n_tomb")).otherwise(0L))
          .as("n_extra_deletes"))
    }),
    "q_jsonl_roundtrip" -> ((s, dir) => {
      // the ingestion contract under the oracle gate: documents written
      // as JSONL and read back through the corrupt-lane reader must
      // round-trip EVERY row losslessly (the oracle computes the same
      // integrity row straight from parquet — any lossy line breaks the
      // hash); per-PROCESS scratch path (pid-keyed, overwrite-idempotent
      // across this JVM's iterations) so concurrent harness runs on one
      // machine — bench + verify, parallel CI checkouts — cannot race on
      // a shared fixed path
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
        s"/graft_jsonl_roundtrip_${ProcessHandle.current().pid()}"
      docs.write.mode("overwrite").json(path)
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long").add("text", "string").add("lang", "string")
      val in = graft.sources.Ingest.readJsonl(s, path, schema)
      graft.sources.Ingest.clean(in).agg(
        count(lit(1)).as("n_clean"),
        sum(length(col("text"))).as("total_chars"),
        countDistinct(md5(col("text"))).as("n_distinct_texts"),
        countDistinct(col("lang")).as("n_langs"))
    }),
    "q_orc_roundtrip" -> ((s, dir) => {
      // the columnar-sibling lane: ORC write → native vectorized read →
      // the same integrity row (the oracle computes it straight from
      // parquet, so any lossy column breaks the hash)
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
        s"/graft_orc_roundtrip_${ProcessHandle.current().pid()}"
      docs.write.mode("overwrite").orc(path)
      s.read.orc(path).agg(
        count(lit(1)).as("n_clean"),
        sum(length(col("text"))).as("total_chars"),
        countDistinct(md5(col("text"))).as("n_distinct_texts"),
        countDistinct(col("lang")).as("n_langs"))
    }),
    "q_csv_roundtrip" -> ((s, dir) => {
      // the CSV lane of the same ingestion contract: headered CSV write
      // (quoting handled by the writer) → corrupt-lane read → the same
      // integrity row the oracle computes straight from parquet
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
        s"/graft_csv_roundtrip_${ProcessHandle.current().pid()}"
      docs.write.mode("overwrite").option("header", "true").csv(path)
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long").add("text", "string").add("lang", "string")
      val in = graft.sources.Ingest.readCsv(s, path, schema)
      graft.sources.Ingest.clean(in).agg(
        count(lit(1)).as("n_clean"),
        sum(length(col("text"))).as("total_chars"),
        countDistinct(md5(col("text"))).as("n_distinct_texts"),
        countDistinct(col("lang")).as("n_langs"))
    }),
    "q_median_scalable" -> ((s, dir) =>
      // exact global median WITHOUT percentile's value buffer: iterated
      // 4096-bin histogram selection (≤ 3 bounded passes for any int64
      // range) + a per-value exact walk — the corpus-scale median path
      Hygiene.median2Pass(t(s, dir, "lineitem"), "l_extendedprice")),
    "q_mad_outliers" -> ((s, dir) =>
      // robust per-type outlier screen: median/MAD (Hampel) carried as
      // DOUBLED micro-unit integers so the 3·MAD test is pure int64 —
      // no float compare can straddle an engine boundary
      Hygiene.madOutliers(t(s, dir, "events"), "event_type", "value")
        .orderBy(col("event_type"))),
    "q_mad_outliers_scalable" -> ((s, dir) =>
      // the SAME Hampel screen with both keyed medians selected by
      // distributed histogram narrowing (groupedSelectRanks) — no
      // aggregation buffer ever holds a group; oracle = the exact
      // form's SQL, row-for-row
      Hygiene.madOutliersScalable(t(s, dir, "events"), "event_type", "value")
        .orderBy(col("event_type"))),
    "q_group_quantiles_scalable" -> ((s, dir) =>
      // the GENERAL surface over the distributed rank selector: exact
      // per-group p25/p50/p75/p90 as lower order statistics at rank
      // ⌊q·(n−1)⌋ — engine-exact by construction (the oracle indexes a
      // sorted list at the same rank), no group ever buffered
      Hygiene.groupedQuantiles(t(s, dir, "events"), "event_type", "value",
          qPpms = Seq(250000L, 500000L, 750000L, 900000L))
        .orderBy(col("event_type"), col("q_ppm"))),
    "q_drift_report" -> ((s, dir) => {
      // between-dumps drift audit: lineitem split by orderkey parity as
      // two crawl dumps, with drift PLANTED in dump B (half its 'R'
      // returns dropped) — floor-share ppm total-variation distance per
      // column, pure int64 (no float TVD can straddle the engines).
      // l_returnflag reads high; the undrifted columns read near zero
      val li = t(s, dir, "lineitem")
      val dumpA = li.filter(col("l_orderkey") % 2 === 0)
      val dumpB = li.filter(col("l_orderkey") % 2 === 1 &&
        !(col("l_returnflag") === "R" && col("l_orderkey") % 4 === 1))
      Hygiene.driftReport(dumpA, dumpB,
          Seq("l_returnflag", "l_linestatus", "l_linenumber"))
        .orderBy(col("col_name"))
    }),
    "q_psi_drift" -> ((s, dir) => {
      // the PSI read over the same planted-drift dumps as
      // q_drift_report: TVD weights categories equally, PSI blows up on
      // appearing/vanishing ones — the model-monitoring number
      val li = t(s, dir, "lineitem")
      val dumpA = li.filter(col("l_orderkey") % 2 === 0)
      val dumpB = li.filter(col("l_orderkey") % 2 === 1 &&
        !(col("l_returnflag") === "R" && col("l_orderkey") % 4 === 1))
      Hygiene.psiDrift(dumpA, dumpB,
          Seq("l_returnflag", "l_linestatus", "l_linenumber"))
        .orderBy(col("col_name"))
    }),
    "q_column_entropy" -> ((s, dir) =>
      // the concentration read NDV can't give: per-column Shannon
      // entropy + H/ln(NDV) uniformity over the drift family's watched
      // columns — linenumber near-uniform, returnflag mass-skewed
      Hygiene.columnEntropy(t(s, dir, "lineitem"),
          Seq("l_returnflag", "l_linestatus", "l_linenumber"))
        .orderBy(col("col_name"))),
    "q_benford_audit" -> ((s, dir) => {
      // Benford first-digit forensics on extended price: per digit 1..9
      // the observed floor-share ppm vs round(1e6*log10(1+1/d)) and the
      // signed deviation — prices are qty-scaled retail values spanning
      // ~3 decades, so low digits dominate but the fit is imperfect (a
      // real audit read, not a planted pass)
      Hygiene.benfordAudit(t(s, dir, "lineitem"), "l_extendedprice")
        .orderBy(col("digit"))
    }),
    "q_drift_numeric" -> ((s, dir) => {
      // the documented NUMERIC seam of the drift report, oracled:
      // bucket first (closed-form fixed-width floor bins — engine-exact,
      // unlike sketch quantiles), then drift the bucket label. Dump B
      // carries a planted 10% price inflation on half its rows — the
      // upward mass shift the bucket drift must read
      val li = t(s, dir, "lineitem")
      val a = li.filter(col("l_orderkey") % 2 === 0)
        .select(expr("CAST(floor(l_extendedprice / 5000) AS BIGINT)")
          .as("price_bucket"))
      val b = li.filter(col("l_orderkey") % 2 === 1)
        .select((col("l_extendedprice") *
          when(col("l_linenumber") % 2 === 0, lit(1.1)).otherwise(lit(1.0)))
          .as("p"))
        .select(expr("CAST(floor(p / 5000) AS BIGINT)").as("price_bucket"))
      Hygiene.driftReport(a, b, Seq("price_bucket"))
    }),
    "q_anomaly_flags" -> ((s, dir) => {
      // leak-free anomaly screen: each point is judged against the
      // PREVIOUS row's EWMA (a forecast from strictly-past data), and
      // the alert threshold is the Hampel 3·MAD rule over the residual
      // distribution in doubled-integer algebra — ewmaSmooth ∘ lag ∘
      // madOutliers' test, three verified pieces composed
      val e = Temporal.ewmaSmooth(
        Temporal.eventsMicros(s, dir).filter(col("user_id") % 20 === 0))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val res = e.withColumn("pred", lag(col("ewma_u6"), 1).over(w))
        .filter(col("pred").isNotNull)
        .select((col("value_u6") - col("pred")).as("r"))
      val med = res.agg(
        (expr("percentile(r, 0.5)") * 2).cast("long").as("med2")).collect()
        .head.getLong(0)
      val d = res.select(col("r"), abs(col("r") * 2 - med).as("d"))
      val dmed = d.agg(
        (expr("percentile(d, 0.5)") * 2).cast("long").as("dmed2")).collect()
        .head.getLong(0)
      d.agg(count(lit(1)).as("n_scored"),
        sum(when(col("d") * 2 > lit(dmed) * 3, 1L).otherwise(0L))
          .as("n_flagged"))
        .select(col("n_scored"), col("n_flagged"),
          lit(med).as("med2"), lit(dmed).as("dmed2"))
    }),
    "q_scd2" -> ((s, dir) =>
      // SCD2 dimension build: per-user event_type runs compressed to
      // validity intervals with version numbers and an is_current flag —
      // one key exchange + one sort shared by all three window functions
      Temporal.scd2History(Temporal.eventsMicros(s, dir))
        .orderBy(col("user_id"), col("version"))),
    "q_ewma" -> ((s, dir) =>
      // rolling EWMA over each user's last 8 values as an ORDERED fold
      // (list_reduce-compatible: init = frame's first element) — fenced
      // rounding, no unordered float SUM; keyed window, O(span) per row
      // (the user_id pre-filter keeps the registry row small; per-user
      // windows are independent so pre- and post-filter agree)
      Temporal.ewmaSmooth(
          Temporal.eventsMicros(s, dir).filter(col("user_id") % 20 === 0))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))),

    // -------- text analysis (SURVEY §2.12)
    "text_tokens" -> ((s, dir) =>
      TextAnalysis.tokenStats(t(s, dir, "documents")).orderBy(col("doc_id"))),
    "text_quality" -> ((s, dir) =>
      TextAnalysis.qualityScore(t(s, dir, "documents")).orderBy(col("doc_id"))),
    "text_score_calibrate" -> ((s, dir) =>
      // cross-source score calibration: each doc's n_chars re-expressed
      // as its integer percentile WITHIN its source (ties share — equal
      // scores must calibrate identically) + the calibrated decile, so
      // one global "top X%" predicate means the same thing on every
      // source; two windows share one source-keyed exchange
      Hygiene.quantileNormalize(
        t(s, dir, "documents").select(col("doc_id"), col("source"),
          col("n_chars").as("score")),
        "source", "score", Seq("doc_id"))
        .orderBy(col("doc_id"))),
    "text_score_calibrate_hist" -> ((s, dir) =>
      // the SCALE form of text_score_calibrate: per-source equi-depth
      // decile boundaries via distributed histogram narrowing (no
      // per-source sort or window anywhere), then a row-local
      // boundaries-≤-score count against the broadcast (source × 9)
      // frame — the path to take when one source outgrows spill
      Hygiene.quantileNormalizeHist(
        t(s, dir, "documents").select(col("doc_id"), col("source"),
          col("n_chars").as("score")),
        "source", "score", Seq("doc_id"))
        .orderBy(col("doc_id"))),
    "text_langid" -> ((s, dir) =>
      TextAnalysis.languageId(t(s, dir, "documents"), actualLangCol = Some("lang"))
        .orderBy(col("doc_id"))),
    "text_lang_confusion" -> ((s, dir) =>
      // language-ID evaluation as a confusion matrix: one map-side-
      // combined agg over the row-local predictions — the per-language
      // shippability number for the heuristic
      TextAnalysis.languageId(t(s, dir, "documents"), actualLangCol = Some("lang"))
        .groupBy(col("actual_lang"), col("predicted_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("actual_lang"), col("predicted_lang"))),
    "text_corpus_datasheet" -> ((s, dir) =>
      // the corpus data card in one row: doc/lang/source cardinalities and
      // integer-exact size stats (mean in basis points to stay integer) —
      // one map-side-combined global agg, no shuffle wider than one row
      t(s, dir, "documents").agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(size(split(lower(col("text")), " ")).cast("long")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
        .select(col("n_docs"), col("n_langs"), col("n_sources"),
          col("total_tokens"), col("total_chars"), col("min_chars"), col("max_chars"),
          expr("CAST(total_chars * 100 DIV n_docs AS BIGINT)").as("mean_chars_x100"))),
    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(t(s, dir, "documents")).orderBy(col("doc_id"))),
    "text_scrub" -> ((s, dir) => {
      // synthesize text that actually contains PII so the redaction fires
      val raw = t(s, dir, "events").select(
        col("event_id"),
        concat(
          lit("user u"), col("user_id"),
          lit(" mail u"), col("user_id"), lit("@mail.example"),
          lit(" see http://site.example/e/"), col("event_id"),
          lit(" type "), col("event_type")).as("text"))
      TextAnalysis.scrub(raw, "event_id", "text").orderBy(col("event_id"))
    }),
    "text_cms_counts" -> ((s, dir) => {
      // Count-Min Sketch estimates (64 buckets x 3 rows) for a probe set
      // spanning hot template words, the top stopword, and an
      // out-of-vocabulary token (its estimate is pure collision mass) —
      // sketch build AND probe replayed by the oracle
      import s.implicits._
      val probes = Seq("table", "query", "the", "vector", "customer",
        "scan", "merge", "zebra").toDF("token")
      TextAnalysis.cmsTokenEstimates(t(s, dir, "documents"), probes,
          width = 64, depth = 3)
        .orderBy(col("token"))
    }),
    "text_hll_distinct" -> ((s, dir) =>
      // cardinality sketch over the corpus vocabulary: 256 registers,
      // integer-exact harmonic sum; the exact-distinct column is the
      // fixture-scale accuracy A/B
      TextAnalysis.hllDistinct(t(s, dir, "documents"))),
    "text_collocations" -> ((s, dir) =>
      // PMI collocation mining: window-5 co-occurrence, support >= 20,
      // fenced-ln scoring — top 50 strongest associations; published as
      // the shared [[collocationsArt]] artifact (text_textrank's graph)
      collocationsArt(s, dir)
        .orderBy(col("pmi").desc, col("w_a"), col("w_b"))
        .limit(50)),
    "text_textrank" -> ((s, dir) => {
      // TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
      // over the support-bounded word co-occurrence graph — two verified
      // operators composed; the ≥ 20 support filter bounds the graph
      // BEFORE any iteration touches it
      val edges = collocationsArt(s, dir)
        .filter(col("w_a") =!= col("w_b"))
        .select(col("w_a").as("a"), col("w_b").as("b"))
      Graph.pageRank(edges, iters = 3)
        .select(col("node").as("token"), col("rank"))
        .orderBy(col("rank").desc, col("token"))
        .limit(30)
    }),
    "text_heavy_hitters" -> ((s, dir) =>
      // two-pass Misra–Gries: bounded-state candidate pass (≤ s counters
      // per task, cardinality-independent), then an exact recount of the
      // tiny candidate set — output identical to the brute groupBy+HAVING
      // the oracle runs, by the MG superset guarantee
      TextAnalysis.heavyHitters(t(s, dir, "documents"), s = heavyHitterS)),
    "text_encoding_stats" -> ((s, dir) => {
      // mojibake screen over deterministic damage planting: U+FFFD pairs
      // on doc_id%6, C0 controls on %9, legitimate accents on %5 —
      // damaged/clean and ascii/non-ascii all exercised; counts are code
      // points in both engines
      val docs = t(s, dir, "documents").select(
        col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 6 === 0,
            lit(" damaged �� here")).otherwise(lit("")),
          when(col("doc_id") % 9 === 0,
            lit(" ctl  end")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            lit(" café naïve")).otherwise(lit("")))
          .as("text"))
      TextAnalysis.encodingStats(docs).orderBy(col("doc_id"))
    }),
    "text_repetition_lines" -> ((s, dir) => {
      // Gopher A1.1 line-level repetition: four line-break injections give
      // ~8 lines/doc and 77 of 500 docs a within-doc duplicated line —
      // dup and clean paths both exercised; all outputs integers
      val docs = t(s, dir, "documents").select(
        col("doc_id"),
        replace(replace(replace(replace(col("text"),
          lit("line "), lit("line\n")),
          lit("value "), lit("value\n")),
          lit("table "), lit("table\n")),
          lit("scan "), lit("scan\n")).as("text"))
      TextAnalysis.lineRepetitionStats(docs).orderBy(col("doc_id"))
    }),
    "text_pii_stats" -> ((s, dir) => {
      // deterministic PII planting (the corpus has none): emails on
      // doc_id%3, TEST-NET IPs on %4, formatted phones on %5, a
      // Luhn-VALID card on %7 and a Luhn-INVALID 16-digit run on %11 —
      // candidate counts vs validated cards discriminate exactly on the
      // integer mod-10 checksum
      val docs = t(s, dir, "documents").select(
        col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0, concat(lit(" contact user"),
            col("doc_id").cast("string"), lit("@example.invalid"))).otherwise(lit("")),
          when(col("doc_id") % 4 === 0, concat(lit(" from 203.0.113."),
            (col("doc_id") % 200).cast("string"))).otherwise(lit("")),
          when(col("doc_id") % 5 === 0, concat(lit(" call +1 555 010 "),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"))).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            lit(" card 4111111111111111 ok")).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit(" card 4111111111111112 bad")).otherwise(lit("")))
          .as("text"))
      TextAnalysis.piiStats(docs).orderBy(col("doc_id"))
    }),
    "text_tfidf" -> ((s, dir) =>
      TextAnalysis.tfIdf(t(s, dir, "documents")).orderBy(col("doc_id"), col("word"))),
    "text_rarity" -> ((s, dir) =>
      TextAnalysis.tokenRarity(t(s, dir, "documents")).orderBy(col("doc_id"))),
    "text_tfidf_topk" -> ((s, dir) =>
      // top-3 characteristic words per document: TF-IDF composed with the
      // custom TopKPerKey physical operator (bounded per-key heaps — no
      // per-key sort of the full posting list, the 100 TB shape for
      // "top terms per doc"); oracle = the window-function SQL
      graft.plans.TopK.perKey(
          TextAnalysis.tfIdf(t(s, dir, "documents")),
          keyCols = Seq("doc_id"),
          orderCols = Seq("tfidf" -> false, "word" -> true),
          k = 3)
        .select(col("doc_id"), col("word"), col("tf"), col("df"), col("tfidf"))
        .orderBy(col("doc_id"), col("tfidf").desc, col("word"))),
    "q_window_nth" -> ((s, dir) => {
      // window-surface breadth: nth_value over the running frame,
      // lag with a default, and last_value IGNORE NULLS — three semantics
      // pinned cross-engine
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      t(s, dir, "orders")
        .select(
          col("o_orderkey"), col("o_custkey"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_key"),
          lag(col("o_orderkey"), 1, -1L).over(w).as("prev_or_neg1"),
          last(when(col("o_orderkey") % 3 === 0, col("o_orderkey")), ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("last_div3"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),
    "q_window_dist" -> ((s, dir) => {
      // distribution window functions: percent_rank ((rank-1)/(n-1)) and
      // cume_dist (ties share the value) — both exact integer-ratio
      // divisions, bit-stable cross-engine even with double order keys
      val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal"))
      t(s, dir, "customer")
        .select(
          col("c_custkey"), col("c_nationkey").cast("long").as("nation"),
          col("c_acctbal"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy(col("c_custkey"))
    }),
    "q_rollup" -> ((s, dir) =>
      // ROLLUP subtotal lattice (beyond-reference SQL breadth, the q_
      // series): grouping keys COALESCE to a sentinel so NULL ordering
      // never differs cross-engine; grouping_id disambiguates levels
      // (leftmost key = most significant bit in BOTH engines); measures
      // are COUNT and an integer sum (exact, order-free)
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          grouping_id().cast("long").as("lvl"),
          count(lit(1)).as("n_orders"),
          sum((col("o_orderkey") % 1000).cast("long")).as("sum_key"))
        .select(
          coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
          coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
          col("lvl"), col("n_orders"), col("sum_key"))
        .orderBy(col("lvl"), col("status"), col("priority"))),
    "text_lm_score" -> ((s, dir) =>
      // bigram-LM quality scoring (CCNet lineage): mean log conditional
      // probability under the corpus's own MLE bigram model — per-term
      // ln over an exact integer ratio, rounded, decimal-summed
      TextAnalysis.lmScore(t(s, dir, "documents")).orderBy(col("doc_id"))),
    "text_entropy" -> ((s, dir) =>
      // within-doc token-distribution entropy: the quality screen for
      // keyword-stuffed/templated text that never literally repeats an
      // n-gram — 6-dp-fenced lns, decimal-summed terms, edge rounding
      TextAnalysis.entropyStats(t(s, dir, "documents")).orderBy(col("doc_id"))),
    "text_readability" -> ((s, dir) =>
      // Flesch reading ease in milli-points — three row-local counts +
      // integer floor-div formula, zero exchanges
      TextAnalysis.readability(t(s, dir, "documents"))
        .orderBy(col("doc_id"))),
    "text_zipf_fit" -> ((s, dir) =>
      // Zipf slope of the corpus rank–frequency curve: one map-side-
      // combined token count + a 500-row take-ordered head; regression
      // sums decimal-fenced — the corpus-datasheet naturalness signal
      TextAnalysis.zipfFit(t(s, dir, "documents"), topN = 500)),
    "text_vocab_growth" -> ((s, dir) =>
      // Heaps-law growth curve: 8 nested md5-prefix samples, vocab and
      // token mass per prefix plus the fitted β in exact ppm — one token
      // pass, everything after folds on ≤256-row frames
      TextAnalysis.vocabGrowth(t(s, dir, "documents"))
        .orderBy(col("k_num"))),
    "text_ccnet_buckets" -> ((s, dir) =>
      // CCNet head/middle/tail quality buckets: per-LANGUAGE score-quantile
      // thresholds (approx_percentile — bounded mergeable buffer, rank-exact
      // at accuracy ≥ group size) broadcast back onto a row-local bucket
      // comparison — never a per-language ntile window, which would
      // serialize each language's corpus onto one task chain
      TextAnalysis.ccnetBuckets(t(s, dir, "documents")).orderBy(col("doc_id"))),
    "text_markup_strip" -> ((s, dir) => {
      // markup hygiene with DETERMINISTIC planting (the pii-stats
      // discipline): docs get tag/entity wrapping by doc_id residue in
      // BOTH engines, then the strip chain runs — tags out, entities
      // decoded, whitespace collapsed, removal counts auditable
      val marked = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(lit("<p class=\"c\"> "), col("text"), lit(" </p><br/>")))
          .when(col("doc_id") % 5 === 1,
            concat(lit("<div id=\"d\">&nbsp;"), col("text"), lit(" &amp; more</div>")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.stripMarkup(marked).orderBy(col("doc_id"))
    }),
    "text_gram_novelty" -> ((s, dir) =>
      // corpus-duplicated shingle mass per doc. Skew-safe shape: row-local
      // n_shingles + the df-1 complement trick (unique shingles name their
      // owner via min(doc_id) inside the map-side-combining df agg), so no
      // shingle-keyed window/join ever sees a viral key's full row set
      TextAnalysis.gramNovelty(t(s, dir, "documents")).orderBy(col("doc_id"))),
    "text_repetition" -> ((s, dir) =>
      // Gopher-style repetition screen: duplicate-trigram fraction +
      // top-bigram share, computed entirely row-locally (zero exchanges)
      TextAnalysis.repetitionStats(t(s, dir, "documents")).orderBy(col("doc_id"))),
    "split_mix_weights" -> ((s, dir) =>
      // training-mix retargeting: per-language sampling fraction toward a
      // 40/20/20/20 en/de/fr/es mix (down-sample only, weight capped at 1)
      Splits.mixWeights(t(s, dir, "documents"), "lang",
          Map("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.2))
        .orderBy(col("lang"))),
    "split_epoch_plan" -> ((s, dir) =>
      // data-constrained epoch planning: a 10⁶-token budget against the
      // 40/20/20/20 target mix (zh unlisted → share 0, shown excluded);
      // n_chars is the token-mass column. Scarce strata repeat
      // (epochs_ppm > 1e6) — the number a pretraining run reads BEFORE
      // deciding the mix is affordable.
      Splits.epochPlan(t(s, dir, "documents"), "lang", "n_chars",
          Map("en" -> 400000L, "de" -> 200000L, "fr" -> 200000L,
            "es" -> 200000L),
          budgetTokens = 1000000L)
        .orderBy(col("lang"))),
    "split_temperature_mix" -> ((s, dir) =>
      // temperature-smoothed mix (mT5's alpha=0.3): target shares DERIVED
      // from the corpus (q ∝ p^α) instead of hand-written; sample_rate is
      // the down-sample-only realization (most up-weighted stratum = 1)
      Splits.temperatureMix(t(s, dir, "documents"), "lang", alpha = 0.3)
        .orderBy(col("lang"))),
    "text_bpe_vocab" -> ((s, dir) => {
      // tokenizer training: 4 BPE merge rounds — distributed pair counting,
      // driver argmax (the merge decision IS global), row-local merge
      // apply. Publishes the shared trained-merge artifact (bpeMerges);
      // the first sweep row to need it prices the training run.
      import s.implicits._
      bpeMerges(s, dir).toDF("merge_round", "lhs", "rhs", "n_occurrences")
        .orderBy(col("merge_round"))
    }),
    "text_bpe_encode" -> ((s, dir) => {
      // the APPLY side: encode a doc slice to (pos, token, token_id) with
      // the shared trained 4-merge vocabulary (bpeMerges — train once,
      // apply everywhere; the merge fold is row-local, ids are the
      // vocabulary's alphabetical dense rank). Oracle replays the
      // identical training rounds as unrolled CTEs and encodes the same
      // slice.
      val m = bpeMerges(s, dir).map { case (_, l, r, _) => (l, r) }
      TextAnalysis.bpeEncode(t(s, dir, "documents").filter(col("doc_id") < 40), m)
        .orderBy(col("doc_id"), col("pos"))
    }),
    "text_bpe_sampled" -> ((s, dir) => {
      // the PRODUCTION tokenizer shape: train the merge table on a
      // deterministic md5-bucket sample (25% of docs — the Splits
      // discipline, so the oracle re-draws the identical sample), then
      // encode with the row-local fold. Training cost scales with the
      // sample; the encode side is 100 TB-safe as-is.
      val docs = t(s, dir, "documents")
      val m = TextAnalysis.bpeVocabSampled(docs, merges = 4, sampleFrac = 0.25)
        .orderBy(col("merge_round")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bpeEncode(docs.filter(col("doc_id") < 40), m)
        .orderBy(col("doc_id"), col("pos"))
    }),
    "text_vocab_coverage" -> ((s, dir) => {
      // tokenizer-fit audit per source: OOV rate against the corpus' own
      // top-200 term vocabulary (count desc, term asc — deterministic),
      // plus the distinct-OOV driver count; the broadcast-vocab explode
      // is the plan a real 10^5-term vocab would use unchanged
      val docs = t(s, dir, "documents")
      val vocab = docs
        .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("term")).limit(200)
        .select(col("term"))
      TextAnalysis.vocabCoverage(docs, vocab).orderBy(col("source"))
    }),
    "text_fertility" -> ((s, dir) => {
      // tokenizer fairness across languages: tokens-per-byte (ppm,
      // integral div) under the trained 4-merge vocabulary, per lang —
      // row-local merge fold + one lang-keyed map-side-combined agg
      val docs = t(s, dir, "documents")
      val m = TextAnalysis.bpeVocab(docs, merges = 4)
        .orderBy(col("merge_round")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.tokenizerFertility(docs, m).orderBy(col("lang"))
    }),
    "text_fertility_sampled" -> ((s, dir) => {
      // the production pairing: fertility audited under the SAMPLED-
      // training vocabulary (the tokenizer a real pipeline actually
      // ships) — same md5-bucket sample as text_bpe_sampled, so the
      // oracle re-draws it exactly
      val docs = t(s, dir, "documents")
      val m = TextAnalysis.bpeVocabSampled(docs, merges = 4, sampleFrac = 0.25)
        .orderBy(col("merge_round")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.tokenizerFertility(docs, m).orderBy(col("lang"))
    }),
    "dedup_chunks" -> ((s, dir) =>
      Dedup.chunkStats(t(s, dir, "documents")).orderBy(col("chunk_hash"))),
    "dedup_substring" -> ((s, dir) =>
      // Lee et al. 2022 ExactSubstr granularity: maximal spans whose every
      // 4-token OVERLAPPING window repeats corpus-wide (any offset — what
      // the k-aligned chunk pass cannot see)
      Dedup.substringSpans(t(s, dir, "documents"), k = 4)
        .orderBy(col("doc_id"), col("span_start"))),
    "dedup_substring_scrub" -> ((s, dir) =>
      // the remove-all-but-one application pass: canonical (corpus-first)
      // occurrence keeps its tokens, later occurrences lose exactly the
      // repeated ones
      Dedup.substringScrub(t(s, dir, "documents"), k = 4)
        .orderBy(col("doc_id"))),
    "dedup_line_scrub" -> ((s, dir) => {
      // cross-document boilerplate: four line-break injections give ~8
      // lines/doc; a planted newsletter footer on doc_id%4 and a copyright
      // line on %6 repeat across ~125/~84 docs — scrubbed everywhere; any
      // natural line repeating across >= 5 docs goes with them
      val docs = t(s, dir, "documents").select(
        col("doc_id"),
        concat(
          replace(replace(replace(replace(col("text"),
            lit("line "), lit("line\n")),
            lit("value "), lit("value\n")),
            lit("table "), lit("table\n")),
            lit("scan "), lit("scan\n")),
          when(col("doc_id") % 4 === 0,
            lit("\nSubscribe to our newsletter today")).otherwise(lit("")),
          when(col("doc_id") % 6 === 0,
            lit("\nCopyright 2026 Example Corp")).otherwise(lit("")))
          .as("text"))
      Dedup.lineScrub(docs).orderBy(col("doc_id"))
    }),
    "hygiene_url_dedup" -> ((s, dir) =>
      Hygiene.urlDedup(withSyntheticUrl(t(s, dir, "documents")))
        .orderBy(col("canonical_url"))),
    "hygiene_domain_filter" -> ((s, dir) => {
      import s.implicits._
      Hygiene.domainFilter(
        withSyntheticUrl(t(s, dir, "documents")),
        Seq("example.org", "ads.invalid").toDF("domain"))
        .orderBy(col("doc_id"))
    }),
    "dedup_chunk_scrub" -> ((s, dir) =>
      // the APPLICATION pass over dedup_chunks' diagnosis: strip chunks
      // repeated across >1 distinct docs, reassemble the survivors in
      // order (+ the always-kept partial tail)
      Dedup.chunkScrub(t(s, dir, "documents"), k = 16, maxDocs = 1L)
        .orderBy(col("doc_id"))),
    "mm_frames" -> ((s, dir) =>
      Multimodal.frameSample(t(s, dir, "documents"))
        .orderBy(col("doc_id"), col("frame_idx"))),
    "mm_frame_dedup" -> ((s, dir) =>
      // repeated-frame diagnosis at 64-byte frames (97 dup groups in the
      // fixture): the chunk-dedup shape on the binary lane — one frame
      // explode, one hash agg on the frame hash
      Multimodal.frameDupStats(t(s, dir, "documents"), frameBytes = 64)
        .orderBy(col("frame_md5"))),

    "mm_scene_cuts" -> ((s, dir) =>
      // frame-lane change-point detection: per-frame mean-byte level
      // (per-mille, integer floor) + a payload-partitioned lag window —
      // cuts are jumps > 4000 between consecutive frames (≈11% of the
      // fixture's transitions; the window partition is bounded by
      // frames-per-payload, never corpus-keyed)
      Multimodal.sceneCuts(t(s, dir, "documents"), frameBytes = 64,
          jumpThreshold = 4000L)
        .orderBy(col("doc_id"))),

    "pipeline_prep" -> ((s, dir) =>
      // the composed corpus-prep flow: dedup → quality filter → splits;
      // the dedup stage serves the shared LSH pair artifact (same
      // (n, tau, banding) parameters — lshPairs' scaladoc)
      graft.operators.Pipeline.prepareCorpus(t(s, dir, "documents"),
          precomputedPairs = Some(lshPairs(s, dir)))
        .orderBy(col("doc_id"))),

    // -------- multimodal plumbing (SURVEY §2.12)
    "mm_binary_meta" -> ((s, dir) =>
      Multimodal.binaryMeta(t(s, dir, "documents")).orderBy(col("doc_id"))),
    "mm_phash_dup" -> ((s, dir) => {
      // PERCEPTUAL image dedup: gradient PNGs whose per-id brightness shift
      // changes every byte but cancels in the average-hash comparison —
      // byte-distinct payloads collapse into hash-equal groups (what
      // byte-exact frame hashing cannot do). DuckDB replays the pixel
      // closed forms, the integer bit rule, and the grouping.
      val hashed = Multimodal.imageAHash(
        Multimodal.synthesizeGradientPayloads(t(s, dir, "documents").select(col("doc_id"))))
      val groups = hashed.filter(col("ahash_hi") >= 0)
        .groupBy(col("ahash_hi"), col("ahash_lo"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_dups"))
      hashed.join(groups, Seq("ahash_hi", "ahash_lo"), "left")
        .select(col("doc_id"), col("ahash_hi"), col("ahash_lo"),
          col("rep_id"), col("n_dups"))
        .orderBy(col("doc_id"))
    }),
    "mm_image_features" -> ((s, dir) =>
      // REAL codec, oracle-checked: synthesize a solid-color PNG per doc id
      // (dims + channels closed-form in the id; every 10th payload corrupt),
      // decode with javax.imageio, emit exact integer dims + channel means.
      // DuckDB recomputes the same closed forms — the PNG encode → decode →
      // pixel-sum path is value-verified; corrupt rows surface as width=-1
      // (accounted, never dropped) on both sides.
      Multimodal.extractImageFeatures(
          Multimodal.synthesizeImagePayloads(t(s, dir, "documents").select(col("doc_id"))))
        .select(
          col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          round(col("mean_r")).cast("long").as("mean_r_int"),
          round(col("mean_g")).cast("long").as("mean_g_int"),
          round(col("mean_b")).cast("long").as("mean_b_int"))
        .orderBy(col("doc_id"))),
    "mm_audio_features" -> ((s, dir) =>
      // REAL audio decode, oracle-checked: synthesize a RIFF/WAVE PCM clip
      // per doc id (rate, sample count, every 16-bit sample closed-form in
      // the id; every 10th payload corrupt), parse the container and emit
      // EXACT integer sample stats. DuckDB recomputes the closed forms —
      // the WAV encode → RIFF parse → sample-sum path is value-verified;
      // corrupt rows surface as sample_rate=-1 on both sides.
      Multimodal.extractAudioFeatures(
          Multimodal.synthesizeAudioPayloads(t(s, dir, "documents").select(col("doc_id"))))
        .orderBy(col("doc_id"))),
    "mm_mp4_meta" -> ((s, dir) =>
      // REAL MP4 metadata decode, oracle-checked: synthesize a minimal
      // ISO-BMFF payload per doc id (mvhd timescale/duration and the trak
      // census closed-form in the id; id%10==0 garbage, id%10==5
      // truncated-box), box-walk it and emit exact integer metadata.
      // DuckDB recomputes the closed forms — the MP4 encode → box-walk
      // path is value-verified; both corruption classes surface as all
      // -1s on both sides.
      Multimodal.extractMp4Meta(
          Multimodal.synthesizeMp4Payloads(t(s, dir, "documents").select(col("doc_id"))))
        .orderBy(col("doc_id"))),
    "mm_features" -> ((s, dir) =>
      // mapPartitions byte-lane profile stage (real byte math). The raw
      // array<double> output is not oracle-hashable, so the verified shape
      // explodes each feature lane and de-scales it to the exact integer it
      // accumulates (lane value = Σ bytes/255.0 → ×255 → byte sum): every
      // emitted column is an exactly-comparable integer, and the DuckDB
      // oracle recomputes the same byte math over the ASCII corpus
      Multimodal.extractFeatures(Multimodal.withBinaryPayload(t(s, dir, "documents")))
        .select(col("doc_id"), col("byte_len"), col("n_frames"),
          posexplode(col("features")).as(Seq("i", "feature")))
        .select(
          col("doc_id"), col("byte_len"), col("n_frames"),
          col("i").cast("long").as("i"),
          round(col("feature") * 255.0).cast("long").as("lane_byte_sum"))
        .orderBy(col("doc_id"), col("i"))),
    "mm_container_sniff" -> ((s, dir) => {
      // the binary-lane ROUTER: payloads synthesized with a closed-form
      // magic prefix (doc_id % 9 picks RIFF/WAVE, RIFF/AVI, RIFF/other,
      // GIF, PDF, Ogg, ID3, ISO-BMFF ftyp, or none), sniffed at the BYTE
      // level, summarized per container. ASCII-expressible magics only so
      // the VARCHAR-lane oracle replays the same first-match CASE; the
      // non-ASCII branches (png/jpeg) are spec-pinned with real bytes.
      val magic = element_at(array(
        lit("RIFF0000WAVE"), lit("RIFF0000AVI "), lit("RIFF0000XXXX"),
        lit("GIF89a"), lit("%PDF-1.4"), lit("OggS"), lit("ID3v"),
        lit("0000ftypisom"), lit("")),
        (col("doc_id") % 9 + 1).cast("int"))
      val payloads = Multimodal.withBinaryPayload(
        t(s, dir, "documents").select(col("doc_id"),
          concat(magic, col("text")).as("text")))
      Multimodal.sniffContainer(payloads)
        .groupBy(col("container"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nbytes")).as("sum_bytes"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("container"))
    }),
    "mm_cdc_chunks" -> ((s, dir) => {
      // content-defined chunk dedup over a SHIFTED-duplicate fixture,
      // closed-form in the id: each payload = an id-varying prefix (0-9
      // bytes, id-varying char) + a group-shared segment body (ids DIV
      // 10). Fixed-offset frames can never match across the group (every
      // frame straddles the shift); the rolling-hash boundaries re-sync
      // inside the shared body, so its chunks dedup at DIFFERENT offsets
      // — the oracle replays the identical polynomial boundary selection
      val payloads = t(s, dir, "documents").select(col("doc_id"),
        concat(
          expr("repeat(chr(CAST(97 + doc_id % 5 AS INT)), CAST(doc_id % 10 AS INT))"),
          expr("repeat(concat('segment', CAST(doc_id DIV 10 AS STRING), ' '), 20)"))
          .as("text"))
      Multimodal.cdcDupStats(payloads)
        .orderBy(col("chunk_md5"))
    }),
    "mm_cdc_chunks_clamped" -> ((s, dir) => {
      // the PRODUCTION chunker (min-chunk greedy thinning over the same
      // rolling-hash candidates — shatter-proof on repetitive content)
      // over the same shifted-duplicate fixture, emitting the full chunk
      // table; the oracle replays the greedy fold via list_reduce over
      // transformed candidate structs (prefix-filter ≥ minChunk makes
      // DuckDB's first-element init equal Spark's fold-from-zero)
      val payloads = t(s, dir, "documents").select(col("doc_id"),
        concat(
          expr("repeat(chr(CAST(97 + doc_id % 5 AS INT)), CAST(doc_id % 10 AS INT))"),
          expr("repeat(concat('segment', CAST(doc_id DIV 10 AS STRING), ' '), 20)"))
          .as("text"))
      Multimodal.cdcChunksClamped(payloads, minChunk = 24)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),
    "mm_cdc_chunks_maxclamp" -> ((s, dir) => {
      // BOTH LBFS clamps: wherever no acceptable candidate lies within
      // maxChunk of the last boundary, boundaries are FORCED every 64
      // bytes — candidate-free payloads (whole fixture groups hash past
      // the divisor class) slice fixed-size instead of one giant chunk,
      // and every chunk obeys ≤ 64 B; the oracle's recursion picks
      // MIN(candidate in [last+24, last+64]) or forces last+64
      val payloads = t(s, dir, "documents").select(col("doc_id"),
        concat(
          expr("repeat(chr(CAST(97 + doc_id % 5 AS INT)), CAST(doc_id % 10 AS INT))"),
          expr("repeat(concat('segment', CAST(doc_id DIV 10 AS STRING), ' '), 20)"))
          .as("text"))
      Multimodal.cdcChunksClamped(payloads, minChunk = 24, maxChunk = 64)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),
    "split_dedup_reweighted" -> ((s, dir) => {
      // the dedup → reweight → sample pipeline as one verified row: LSH
      // pair graph → components (singletons label themselves) → one
      // REPRESENTATIVE per cluster carrying weight = min(cluster_size, 16)
      // → Efraimidis–Spirakis weighted draw. Training on the sample
      // preserves the pre-dedup distribution in expectation while storing
      // each text once — the reweight step real dedup pipelines need and
      // usually skip.
      val docs = t(s, dir, "documents")
      val comp = lshComponents(s, dir)
      val clusters = docs.select(col("doc_id"))
        .join(comp, Seq("doc_id"), "left")
        .select(coalesce(col("component"), col("doc_id")).as("doc_id"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("cluster_size"))
      Splits.weightedSample(clusters, "doc_id",
          least(col("cluster_size"), lit(16L)), k = 100, maxWeight = 16)
        .select(col("doc_id"), col("cluster_size"), col("weight"),
          col("sample_key"))
        .orderBy(col("sample_key"), col("doc_id"))
    }),
    "split_time_embargo" -> ((s, dir) =>
      // leakage-safe temporal split: train < day 19743, 3-day embargo
      // (labeled, never dropped), test from day 19746 — the split audit
      // (counts + day ranges per side) a time-series pipeline ships
      Splits.timeSplit(Temporal.eventsMicros(s, dir),
          cutDay = 19743L, embargoDays = 3L)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_events"),
          expr("CAST(MIN(ts_us DIV 86400000000) AS BIGINT)").as("first_day"),
          expr("CAST(MAX(ts_us DIV 86400000000) AS BIGINT)").as("last_day"))
        .orderBy(col("split"))),
    "split_weighted_sample" -> ((s, dir) =>
      // quality-weighted corpus cut: integer-exact Efraimidis–Spirakis
      // (row's key = min of w md5 draws, the k smallest keys win); the
      // weight is a deterministic 1..8 length bucket so both engines
      // re-draw the IDENTICAL sample; global top-k compiles to
      // TakeOrderedAndProject (per-partition heaps), never a full sort
      Splits.weightedSample(
          t(s, dir, "documents")
            .select(col("doc_id"), col("lang"),
              (lit(1L) + col("n_chars") % 8).as("w")),
          "doc_id", col("w"), k = 100, maxWeight = 8)
        .select(col("doc_id"), col("lang"), col("weight"), col("sample_key"))
        .orderBy(col("sample_key"), col("doc_id"))),
    "split_dsir_weights" -> ((s, dir) =>
      // importance weights toward the German slice as the target corpus:
      // docs whose hashed-bucket distribution looks de-like score high —
      // two dims-row collected count maps folded back as literals, the
      // raw corpus scored in ONE narrow row-local pass (no explode, no
      // exchange)
      Splits.dsirWeights(
        t(s, dir, "documents"),
        t(s, dir, "documents").filter(col("lang") === "de"), dims = 64)
        .orderBy(col("doc_id"))),
    "split_global_order" -> ((s, dir) =>
      // deterministic epoch shuffle: global rank in md5(id:seed) order via
      // monotone leading-byte shards — per-shard ranks + broadcast prefix
      // offsets compose to the exact global rank, no single-task sort
      Splits.globalOrder(
          t(s, dir, "documents").select(col("doc_id"), col("lang")),
          "doc_id", shards = 16)
        .select(col("doc_id"), col("shuffle_key"), col("shuffle_pos"))
        .orderBy(col("shuffle_pos"))),
    "split_sample_per_stratum" -> ((s, dir) =>
      // fixed k-per-language sample: two-level TopKPerKey (bounded heaps,
      // md5-uniform shard split for hot strata) — bit-identical to the
      // oracle's single per-stratum window at any shard count
      Splits.samplePerStratum(
          t(s, dir, "documents").select(col("doc_id"), col("lang")),
          "doc_id", "lang", k = 20, shards = 4, seed = 7)
        .select(col("doc_id"), col("lang"), col("sample_key"))
        .orderBy(col("lang"), col("sample_key"), col("doc_id"))),
    "pipeline_curate" -> ((s, dir) => {
      // the round-10 curation chain COMPOSED: normalization-robust exact
      // dedup (keep each normalized group's min id) → within-doc entropy
      // screen (≥ 2.8, the fixture's discriminating tail cut) → fixed
      // k-per-language sample via the two-level bounded-heap merge —
      // dedup → quality → sample, every stage independently verified,
      // the whole chain value-checked by ONE oracle. Entropy is
      // within-doc, so scoring the full corpus and intersecting with the
      // dedup keeps is identical to scoring the deduped set.
      val docs = t(s, dir, "documents")
      val keep = Dedup.exactNormalized(docs).select(col("keep_id").as("doc_id"))
      val kept = TextAnalysis.entropyStats(docs.join(keep, Seq("doc_id")))
        .filter(col("entropy") >= 2.8).select(col("doc_id"))
      val screened = docs.join(keep, Seq("doc_id")).join(kept, Seq("doc_id"))
        .select(col("doc_id"), col("lang"))
      Splits.samplePerStratum(screened, "doc_id", "lang", k = 25, shards = 4, seed = 11)
        .select(col("doc_id"), col("lang"), col("sample_key"))
        .orderBy(col("lang"), col("sample_key"), col("doc_id"))
    }),
    "split_mix_order" -> ((s, dir) => {
      // the COMPOSED mixing pipeline: temperature-smoothed rates derived
      // from the corpus (alpha = 0.3) → data-derived stratified sample →
      // deterministic global epoch order — train-ready, reproducible
      // corpus mixing in three verified pieces and one oracle
      val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      val rates = Splits.temperatureMix(docs, "lang", alpha = 0.3)
        .select(col("lang"), col("sample_rate"))
      val sampled = Splits.stratifiedSampleByRates(docs, "doc_id", "lang", rates)
      Splits.globalOrder(sampled, "doc_id", shards = 16)
        .select(col("doc_id"), col("lang"), col("shuffle_pos"))
        .orderBy(col("shuffle_pos"))
    }),
    "split_weighted_sample_stratum" -> ((s, dir) =>
      // quality-weighted k-per-language cut: the Efraimidis–Spirakis
      // min-of-w-draws key (split_weighted_sample's rule) selected through
      // the same two-level bounded-heap merge as the unweighted form
      Splits.weightedSamplePerStratum(
          t(s, dir, "documents")
            .select(col("doc_id"), col("lang"),
              (lit(1L) + col("n_chars") % 8).as("w")),
          "doc_id", "lang", col("w"), k = 10, maxWeight = 8, shards = 4)
        .select(col("doc_id"), col("lang"), col("weight"), col("sample_key"))
        .orderBy(col("lang"), col("sample_key"), col("doc_id"))),
    "text_c4_filter" -> ((s, dir) => {
      // C4-style boilerplate removal (keep lines with terminal punctuation
      // and ≥3 words; drop docs left with <3 lines). The fixture corpus has
      // no newlines, so line structure is synthesized deterministically in
      // BOTH engines: 'line ' ends a punctuated line, 'value ' an
      // unpunctuated one — kept/dropped lines and surviving/culled docs all
      // exercised (98 of 500 docs survive at sf0.01)
      val docs = t(s, dir, "documents").select(
        col("doc_id"),
        replace(replace(col("text"), lit("line "), lit("line.\n")),
          lit("value "), lit("value\n")).as("text"))
      TextAnalysis.c4LineFilter(docs)
        .select(col("doc_id"),
          col("n_lines").cast("long").as("n_lines"),
          col("n_kept").cast("long").as("n_kept"),
          col("clean_text"))
        .orderBy(col("doc_id"))
    }),
    "text_gopher_filter" -> ((s, dir) => {
      // Gopher document-level quality rules over a deterministically
      // synthesized structure (the corpus has no newlines/bullets):
      // 'customer' injects the required stopword 'with', 'line ' ends a
      // punctuated line, 'slow ' an ellipsis line, 'value ' starts a
      // bullet line. Thresholds sized so every discriminating rule fires
      // on the fixture: word bounds (93 docs out), symbol ratio (6),
      // ellipsis-line frac (210), bullet-line frac @40% (100), alpha-word
      // frac @94% (53), stopword hits (189) — 120 of 500 keep=true. All
      // verdicts are pure integer comparisons: no float in either engine.
      val docs = t(s, dir, "documents").select(
        col("doc_id"),
        replace(replace(replace(replace(concat(col("text"), lit(" ")),
          lit("customer "), lit("customer with ")),
          lit("line "), lit("line.\n")),
          lit("slow "), lit("slow...\n")),
          lit("value "), lit("\n- value ")).as("text"))
      TextAnalysis.gopherRules(docs, minWords = 30, maxWords = 120,
          maxBulletLinePct = 40, minAlphaWordPct = 94)
        .orderBy(col("doc_id"))
    }),
    "q_source_lang_chi2" -> ((s, dir) =>
      // mixture-design independence check: is language independent of
      // source in this corpus? Full-table chi² (unobserved cells folded
      // via Σe = n), exact ppm integers — a high value means per-source
      // language skew that temperature mixing must account for
      Hygiene.chiSquareAudit(t(s, dir, "documents"), "source", "lang")),
    "q_cramers_matrix" -> ((s, dir) =>
      // which metadata columns encode the same thing: the pairwise
      // Cramér's V² effect-size matrix over three lineitem categoricals
      // — returnflag↔linestatus are date-coupled (high V²), linenumber
      // is near-independent of both (V² ≈ 0, the clamp-at-zero edge)
      Hygiene.cramersVMatrix(t(s, dir, "lineitem"),
          Seq("l_returnflag", "l_linestatus", "l_linenumber"))
        .orderBy(col("col_a"), col("col_b"))),
    "q_gini_by_source" -> ((s, dir) =>
      // is document length skewed WITHIN each source, or only across
      // them: per-source exact-ppm Gini of n_chars — the stratified
      // inequality read next to text_source_concentration's HHI
      Hygiene.giniByKey(t(s, dir, "documents"), "source", "n_chars")
        .orderBy(col("source"))),
    "q_mi_matrix" -> ((s, dir) =>
      // the information-theoretic read of the same three columns: MI
      // sees any dependence structure, NMI = MI/min(H) lands on [0,1]
      Hygiene.mutualInfoMatrix(t(s, dir, "lineitem"),
          Seq("l_returnflag", "l_linestatus", "l_linenumber"))
        .orderBy(col("col_a"), col("col_b"))),
    "text_source_concentration" -> ((s, dir) =>
      // the datasheet concentration row: top-1/top-5 source shares + HHI
      // in exact ppm integers — catches the three-domain "web-scale"
      // corpus before it skews every downstream audit
      Hygiene.sourceConcentration(t(s, dir, "documents"))),
    "text_filter_kappa" -> ((s, dir) => {
      // filter-swap calibration: Cohen's kappa between the Gopher and C4
      // verdicts over the same corpus (each under its own synthesized
      // structure, verbatim from its row) — chance-corrected, so two
      // filters that both keep most docs can't fake agreement; one
      // 5-counter aggregation, integer-exact kappa
      val raw = t(s, dir, "documents")
      val g = TextAnalysis.gopherRules(
          raw.select(col("doc_id"),
            replace(replace(replace(replace(concat(col("text"), lit(" ")),
              lit("customer "), lit("customer with ")),
              lit("line "), lit("line.\n")),
              lit("slow "), lit("slow...\n")),
              lit("value "), lit("\n- value ")).as("text")),
          minWords = 30, maxWords = 120,
          maxBulletLinePct = 40, minAlphaWordPct = 94)
        .select(col("doc_id"), col("keep").as("a"))
      val c = TextAnalysis.c4LineFilter(
          raw.select(col("doc_id"),
            replace(replace(col("text"), lit("line "), lit("line.\n")),
              lit("value "), lit("value\n")).as("text")))
        .select(col("doc_id"), lit(true).as("b"))
      Hygiene.agreementKappa(
        g.join(c, Seq("doc_id"), "left")
          .select(col("a"), coalesce(col("b"), lit(false)).as("b")),
        "a", "b")
    }),
    "text_chunk_windows" -> ((s, dir) =>
      // overlapping context-window chunking: 12-token windows at stride 8
      // (4 tokens of overlap), every token in ≥1 window, short final window
      // kept — the count + boundary tokens identify each chunk without
      // duplicating its text through the pipeline
      TextAnalysis.chunkWindows(t(s, dir, "documents"), winSize = 12, stride = 8)
        .select(col("doc_id"), col("win_id"),
          col("win_tokens").cast("long").as("win_tokens"),
          col("first_tok"), col("last_tok"))
        .orderBy(col("doc_id"), col("win_id"))),
    "text_bm25_topk" -> ((s, dir) => {
      // BM25 lexical retrieval: top-10 docs per query through the custom
      // TopKPerKey operator; corpus pruned to query terms by a broadcast
      // semi-join BEFORE any shuffle (the inverted-index probe); query 5
      // carries an out-of-vocabulary term that must contribute nothing
      import s.implicits._
      val qs = Seq(
        (0L, "fast table scan"), (1L, "join query order"),
        (2L, "stream window batch"), (3L, "slow merge"),
        (4L, "customer value vector"), (5L, "zebra hash")
      ).toDF("query_id", "q_text")
      TextAnalysis.bm25TopK(t(s, dir, "documents"), qs, k = 10)
        .select(col("query_id"), col("doc_id"), col("score"))
        .orderBy(col("query_id"), col("score").desc, col("doc_id"))
    }),
    "ret_eval" -> ((s, dir) => {
      // the ranking scorecard: BM25 top-10 per query evaluated against a
      // deterministic relevance set (docs sharing >= 2 distinct query
      // terms), integer MRR / precision@10 / recall@10; query 5's
      // relevance set is empty (zebra is OOV) — recall NULLs, not lies
      import s.implicits._
      val qs = Seq(
        (0L, "fast table scan"), (1L, "join query order"),
        (2L, "stream window batch"), (3L, "slow merge"),
        (4L, "customer value vector"), (5L, "zebra hash")
      ).toDF("query_id", "q_text")
      val docs = t(s, dir, "documents")
      val results = TextAnalysis.bm25TopK(docs, qs, k = 10)
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      val qt = qs.select(col("query_id"),
        explode(array_distinct(TextAnalysis.tokens(col("q_text")))).as("term"))
      val qrels = docs
        .select(col("doc_id"),
          explode(array_distinct(TextAnalysis.tokens(col("text")))).as("term"))
        .join(broadcast(qt), Seq("term"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(countDistinct(col("term")).as("nt"))
        .filter(col("nt") >= 2L)
        .select(col("query_id"), col("doc_id"))
      TextAnalysis.retrievalEval(results, qrels, k = 10)
        .orderBy(col("query_id"))
    }),
    "ret_phrase_topk" -> ((s, dir) => {
      // positional retrieval: exact occurrence counts of CONSECUTIVE
      // token sequences (what bag-of-words scoring cannot express), two
      // phrase lengths in one call, one query phrase absent from the
      // corpus (emits nothing — exact semantics). The oracle rebuilds
      // positional 2-/3-gram postings and replays the count + cut.
      import s.implicits._
      val qs = Seq(
        (0L, "fast table"), (1L, "table table"), (2L, "batch window spark"),
        (3L, "value fast merge"), (4L, "zebra hash stripe")
      ).toDF("query_id", "q_text")
      TextAnalysis.phraseTopK(t(s, dir, "documents"), qs, k = 10)
        .orderBy(col("query_id"), col("n_occurrences").desc, col("doc_id"))
    }),
    "ret_rrf_fusion" -> ((s, dir) => {
      // hybrid retrieval: BM25 lexical top-10 ∪ brute-cosine semantic
      // top-10 (queries 0-5: the q_text frame lexically, the id-aligned
      // embedding semantically), fused by integer reciprocal-rank —
      // rewards docs surfacing in EITHER modality without comparing
      // incomparable scores; fusion moves only queries × k × 2 rows
      import s.implicits._
      val qs = Seq(
        (0L, "fast table scan"), (1L, "join query order"),
        (2L, "stream window batch"), (3L, "slow merge"),
        (4L, "customer value vector"), (5L, "zebra hash")
      ).toDF("query_id", "q_text")
      val lexW = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("doc_id"))
      val lex = TextAnalysis.bm25TopK(t(s, dir, "documents"), qs, k = 10)
        .withColumn("rank", row_number().over(lexW).cast("long"))
        .select(col("query_id"), col("doc_id"), col("rank"))
      val emb = t(s, dir, "embeddings")
      val sem = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 6), k = 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank").cast("long").as("rank"))
      TextAnalysis.rrfFuse(Seq(lex, sem), k = 5)
        .orderBy(col("query_id"), col("rrf_ppb").desc, col("doc_id"))
    }),
    "text_perceptron" -> ((s, dir) =>
      // model-in-the-loop quality filtering: integer-exact batch perceptron
      // over hashed bag-of-words, trained to separate English docs
      // (label +1 iff lang='en' — the English-stopword hash buckets make
      // the signal genuinely learnable). The oracle replays all 3 epochs
      // as CTEs over the identical md5 feature hash; batch summation makes
      // both sides independent of row order, so the margins match exactly.
      TextAnalysis.perceptronQuality(t(s, dir, "documents"),
          labelCol = when(col("lang") === "en", 1L).otherwise(-1L),
          dims = 64, epochs = 3)
        .orderBy(col("doc_id")))
  )

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
  private lazy val pageRankOracleIters: String = {
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
  private def pprOracleIters(seed: Long, iters: Int): String = {
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
  private lazy val lpOracleCtes: String =
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
  private def hitsOracleIters(iters: Int): String =
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
  private def kCoreOracleRounds(k: Int, rounds: Int): String =
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
  private def mmrOracleSteps(k: Int, cand: String = "cand",
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
  private val langidCtes =
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
  private val shingleCte =
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

  private def jaccardOracle(tau: Double): String =
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
  private lazy val simhashCtes: String = {
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

  private def simhashOracle(tau: Double, maxHamming: Int): String =
    shingleCte + simhashCtes +
      s"""SELECT jac.a AS doc_a, jac.b AS doc_b, jac.jaccard, ham.hamming
         |FROM jac JOIN ham ON ham.a=jac.a AND ham.b=jac.b
         |WHERE jac.jaccard >= $tau AND ham.hamming <= $maxHamming
         |ORDER BY doc_a, doc_b""".stripMargin

  /** Recall audit oracle: truth = exact Jaccard ≥ tau pairs, emitted =
    * those also within the Hamming radius (the simhash operator's
    * Jaccard-verified output is a subset of truth by construction).
    */
  private def simhashRecallOracle(tau: Double, maxHamming: Int): String =
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
  private val semDedupK = 8
  private val semDedupIters = 2
  private val semDedupTau = 0.4

  /** Heavy-hitter support denominator: emit tokens with freq ≥ n_total/s.
    * Shared by the `text_heavy_hitters` operator call and its oracle's
    * HAVING clause so the threshold can't drift between engines.
    */
  private val heavyHitterS = 40

  /** Matryoshka audit prefix width — shared by the
    * `ann_matryoshka_recall` Spark call and its oracle CTEs. 48 of 64 on
    * the RANDOM fixture vectors sits mid-curve (mean recall ≈ 0.4, spread
    * across queries) — random embeddings decorrelate prefixes far faster
    * than trained Matryoshka ones, so smaller prefixes pin recall to 0
    * and audit nothing.
    */
  private val matryoshkaDims = 48

  /** Random-projection audit widths — shared by the `ann_rp_recall` Spark
    * call and its oracle CTEs. 48 of 64 matches the matryoshka row's
    * mid-curve intent on the random fixture (at 32 the measured recall
    * pins near 0 and audits nothing — random vectors decorrelate under
    * sign mixing even faster than under prefix truncation); `rpInDims`
    * must equal the fixture vector width —
    * [[graft.operators.Similarity.rpProject]] fixes the literal plane
    * length at plan time.
    */
  private val rpDims = 48
  private val rpInDims = 64

  /** Shared DuckDB CTE: embeddings flattened to (vec_id, i, v) + L2 norms. */
  /** Shared C4 oracle CTEs (`d` line synthesis, `k` kept lists) — opens
    * the WITH block; consumed by `text_c4_filter` and `text_filter_kappa`.
    */
  private lazy val c4OracleCtes =
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
  private lazy val gopherOracleCtes =
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
  private val gopherKeepSql =
    """(n_words BETWEEN 30 AND 120 AND sum_word_len BETWEEN 3*n_words AND 10*n_words
      |        AND n_symbols*100 <= n_words*10 AND n_bullet_lines*100 <= n_lines*40
      |        AND n_ellipsis_lines*100 <= n_lines*30 AND n_alpha_words*100 >= n_words*94
      |        AND stop_hits >= 2)""".stripMargin

  // f/nrm are MATERIALIZED: DuckDB inlines plain CTEs and re-derives the
  // full unnest per consumer — ann_* chains consume f three to five times
  // each, and the r12 driver gate OOMed on cumulative transient peak
  // (ann_lsh_topk / ann_lsh_banded_topk / ann_matryoshka_recall). Pinning
  // them to compute once bounds each oracle's footprint to one unnest.
  private val embCte =
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
  private val pcaCovDiv = 1000000000L

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
  private lazy val bm25OracleCtes =
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
  private lazy val acfOracleCtes: String =
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

  private lazy val seasonalOracleCtes =
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
  private def cusumSegLevelSql(src: String, out: String,
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
  private def pcaIterCtes(rounds: Int): String =
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
  private val dimMomentCtes =
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
  private lazy val ivfTrainedServeCtes =
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
  private lazy val lshBandedServeCtes =
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
  private lazy val recallTailCtes =
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
  private lazy val binaryCodesCte =
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
  private lazy val binaryTailCtes =
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
  private lazy val binaryServeCtes = binaryCodesCte +
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
  private lazy val binaryBandedServeCtes = binaryCodesCte +
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
  private lazy val nprobeSweepTailCtes =
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
  private lazy val semDedupPairCtes =
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
      |ncell AS MATERIALIZED (SELECT vec_id, cell FROM rfin WHERE rn = 1),
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
  private lazy val shingleCteMat = shingleCte
    .replace("sh AS (", "sh AS MATERIALIZED (")
    .replace("nn AS (SELECT", "nn AS MATERIALIZED (SELECT")
    .replace("p AS (SELECT x.doc_id", "p AS MATERIALIZED (SELECT x.doc_id")

  private lazy val componentsOracleCtes =
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

  private lazy val componentsOracle =
    componentsOracleCtes +
      """
        |SELECT node AS doc_id, MIN(lbl) AS component
        |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "du_by_address" ->
      """WITH inv AS (
        |  SELECT CAST(user_id AS VARCHAR)||'/'||event_type||'/'||CAST(event_id AS VARCHAR) AS key,
        |         value AS size FROM events)
        |SELECT split_part(key,'/',1) AS address,
        |       CAST(SUM(CAST(size AS DECIMAL(18,4))) AS DOUBLE) AS size_bytes,
        |       COUNT(*) AS number_files
        |FROM inv WHERE key LIKE '%/%'
        |GROUP BY 1 ORDER BY address""".stripMargin,
    "du_gini" ->
      // identical distinct-value rank-mass fold in HUGEINT; // floors on
      // non-negatives exactly like Spark's decimal div
      """WITH u AS (
        |  SELECT user_id,
        |         CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT))
        |           AS BIGINT) AS v
        |  FROM events GROUP BY 1),
        |cells AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c
        |          FROM u WHERE v IS NOT NULL AND v >= 0 GROUP BY v),
        |cw AS (SELECT v, c, SUM(c) OVER (ORDER BY v) AS cumc FROM cells),
        |agg AS (SELECT CAST(SUM(c) AS HUGEINT) AS n,
        |               SUM(CAST(v AS HUGEINT) * c) AS t,
        |               SUM(CAST(v AS HUGEINT) * (CAST(c AS HUGEINT) * (cumc - c)
        |                   + (CAST(c AS HUGEINT) * (c + 1)) // 2)) AS s
        |        FROM cw)
        |SELECT CAST(n AS BIGINT) AS n_units, CAST(t AS BIGINT) AS total,
        |       CAST(CASE WHEN n > 0 AND t > 0
        |            THEN (CAST(1000000 AS HUGEINT) * (2 * s - (n + 1) * t))
        |                 // (n * t) END AS BIGINT) AS gini_ppm
        |FROM agg""".stripMargin,
    "du_group_by_user" ->
      """SELECT user_id,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
        |       COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin,
    "du_point_lookup" ->
      """WITH inv AS (
        |  SELECT CAST(user_id AS VARCHAR)||'/'||event_type||'/'||CAST(event_id AS VARCHAR) AS key,
        |         value AS size FROM events)
        |SELECT split_part(key,'/',1) AS address,
        |       CAST(SUM(CAST(size AS DECIMAL(18,4))) AS DOUBLE) AS size_bytes,
        |       COUNT(*) AS number_files
        |FROM inv WHERE key LIKE '%/%'
        |GROUP BY 1 HAVING split_part(key,'/',1) = '42' ORDER BY address""".stripMargin,
    "du_malformed_filter" ->
      """SELECT event_id,
        |       CASE WHEN event_id % 7 = 0 THEN event_type
        |            ELSE CAST(user_id AS VARCHAR)||'/'||CAST(event_id AS VARCHAR) END AS key
        |FROM events
        |WHERE (CASE WHEN event_id % 7 = 0 THEN event_type
        |            ELSE CAST(user_id AS VARCHAR)||'/'||CAST(event_id AS VARCHAR) END) LIKE '%/%'
        |ORDER BY event_id""".stripMargin,
    "du_path_extract" ->
      """WITH k AS (
        |  SELECT event_id,
        |         CAST(user_id AS VARCHAR)||'/'||event_type||'/'||CAST(event_id AS VARCHAR) AS key
        |  FROM events)
        |SELECT event_id,
        |       split_part(key,'/',1) AS address,
        |       split_part(key,'/',2) AS mid_segment,
        |       split_part(key,'/',3) AS leaf_segment,
        |       regexp_replace('s3://bkt/'||key, '^s3://', '') AS stripped
        |FROM k ORDER BY event_id""".stripMargin,
    "du_date_ops" ->
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS order_day, COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT order_day,
        |       CAST(order_day AS TIMESTAMP) + INTERVAL 1 HOUR AS pinned_ts,
        |       'inv/'||strftime(CAST(order_day AS TIMESTAMP) + INTERVAL 1 HOUR, '%Y-%m-%dT%H-%MZ')||'/manifest.json' AS manifest_key,
        |       order_day - 1 AS prev_day,
        |       n_orders
        |FROM d ORDER BY order_day""".stripMargin,
    "du_union_all" ->
      """SELECT event_type, COUNT(*) AS n FROM (
        |  SELECT event_type FROM events WHERE value < 5
        |  UNION ALL
        |  SELECT event_type FROM events WHERE value >= 5)
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    "du_projection_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q_zorder_layout" ->
      s"""WITH z AS (
         |  SELECT ${graft.operators.Layout.zOrderSql("l_orderkey", "l_partkey", 16)} AS zkey,
         |         l_orderkey AS x, l_partkey AS y
         |  FROM lineitem)
         |SELECT zkey >> 20 AS z_bucket, COUNT(*) AS n_rows,
         |       MIN(x) AS x_min, MAX(x) AS x_max,
         |       MIN(y) AS y_min, MAX(y) AS y_max
         |FROM z GROUP BY 1 ORDER BY z_bucket""".stripMargin,
    "q_hilbert_layout" ->
      // the generated per-bit CTE chain IS the operator's arithmetic
      // (hilbertSqlCtes — spec-pinned value-identical by running the
      // chain in Spark itself)
      s"""WITH base AS (SELECT l_orderkey AS x, l_partkey AS y FROM lineitem),
         |${graft.operators.Layout.hilbertSqlCtes("base", "x", "y", 16, keep = Seq("x", "y"))}
         |SELECT hkey >> 20 AS h_bucket, COUNT(*) AS n_rows,
         |       MIN(x) AS x_min, MAX(x) AS x_max,
         |       MIN(y) AS y_min, MAX(y) AS y_max
         |FROM hfin GROUP BY 1 ORDER BY h_bucket""".stripMargin,
    "q_curve_locality" ->
      // equal-count range files (rank·32 // n) — the oracle affords ONE
      // global window; the operator composes the same total order from
      // sharded ranks + offsets (identical (ckey, x, y) tiebreak)
      s"""WITH base AS (SELECT l_orderkey AS x, l_partkey AS y FROM lineitem),
         |${graft.operators.Layout.hilbertSqlCtes("base", "x", "y", 16, keep = Seq("x", "y"))},
         |hr AS (SELECT x, y,
         |              CAST(row_number() OVER (ORDER BY hkey, x, y) AS BIGINT) - 1 AS rn,
         |              CAST(COUNT(*) OVER () AS BIGINT) AS n
         |       FROM hfin),
         |hst AS (SELECT (rn * 32) // n AS file,
         |               MIN(x) AS x_min, MAX(x) AS x_max,
         |               MIN(y) AS y_min, MAX(y) AS y_max
         |        FROM hr GROUP BY 1),
         |z AS (SELECT ${graft.operators.Layout.zOrderSql("x", "y", 16)} AS ckey, x, y
         |      FROM base),
         |zr AS (SELECT x, y,
         |              CAST(row_number() OVER (ORDER BY ckey, x, y) AS BIGINT) - 1 AS rn,
         |              CAST(COUNT(*) OVER () AS BIGINT) AS n
         |       FROM z),
         |zst AS (SELECT (rn * 32) // n AS file,
         |               MIN(x) AS x_min, MAX(x) AS x_max,
         |               MIN(y) AS y_min, MAX(y) AS y_max
         |        FROM zr GROUP BY 1),
         |ha AS (SELECT (x_max - x_min + 1) * (y_max - y_min + 1) AS area FROM hst),
         |za AS (SELECT (x_max - x_min + 1) * (y_max - y_min + 1) AS area FROM zst)
         |SELECT 'morton' AS curve, COUNT(*) AS n_files,
         |       CAST(SUM(area) AS BIGINT) AS sum_area, MAX(area) AS max_area
         |FROM za
         |UNION ALL
         |SELECT 'hilbert', COUNT(*), CAST(SUM(area) AS BIGINT), MAX(area) FROM ha
         |ORDER BY curve""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |       CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1,2 ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join_revenue" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |       CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1,2 ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin,
    "q_join_broadcast_nation" ->
      """SELECT n_name,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY n_name""".stripMargin,
    "q_topk_custom_operator" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 2 ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "q_window_toporder" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q_running_sum" ->
      """SELECT event_id, user_id,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
        |         PARTITION BY user_id ORDER BY event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events ORDER BY event_id""".stripMargin,
    "q_window_range_frame" ->
      """SELECT event_id, user_id,
        |       COUNT(*) OVER (PARTITION BY user_id ORDER BY event_id
        |                      RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS n_recent
        |FROM events ORDER BY event_id""".stripMargin,
    "q_window_lead_ntile" ->
      """SELECT o_orderkey, o_custkey,
        |       lead(o_orderkey, 1) OVER w AS next_orderkey,
        |       first_value(o_orderkey) OVER w AS first_orderkey,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice * (SELECT COUNT(*) FROM orders) * 5
        |      > 6 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) FROM orders)
        |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "q_topk_acctbal" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey LIMIT 10""".stripMargin,
    "q_intersect_users" ->
      """SELECT user_id AS id FROM events
        |INTERSECT
        |SELECT c_custkey AS id FROM customer
        |ORDER BY id""".stripMargin,
    "q_except_users" ->
      """SELECT c_custkey AS id FROM customer
        |EXCEPT
        |SELECT user_id AS id FROM events
        |ORDER BY id""".stripMargin,
    "q_rollup_lineitem" ->
      """SELECT COALESCE(l_returnflag,'ALL') AS returnflag,
        |       COALESCE(l_linestatus,'ALL') AS linestatus,
        |       COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_distinct_count" ->
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_suppkey) AS n_supp,
        |       COUNT(DISTINCT l_partkey) AS n_part
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q_json_extract" ->
      """SELECT k % 10 AS k_mod, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM (SELECT CAST(json_extract_string(props,'$.k') AS BIGINT) AS k FROM events)
        |GROUP BY 1 ORDER BY k_mod""".stripMargin,
    "q_having" ->
      """SELECT c_nationkey, COUNT(*) AS n_cust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
        |FROM customer GROUP BY 1 HAVING COUNT(*) >= 50
        |ORDER BY c_nationkey""".stripMargin,
    "q_date_parts" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        |       CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |       CAST(month(o_orderdate) AS BIGINT) AS m,
        |       CAST(day(o_orderdate) AS BIGINT) AS d,
        |       COUNT(*) AS n
        |FROM orders GROUP BY 1,2,3,4 ORDER BY y, q, m, d""".stripMargin,
    "q_filtered_agg" ->
      """SELECT l_returnflag,
        |       COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS n_heavy,
        |       CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q_union_distinct" ->
      """SELECT id FROM (
        |  SELECT user_id AS id FROM events
        |  UNION
        |  SELECT c_custkey AS id FROM customer)
        |ORDER BY id""".stripMargin,
    "q_grouping_sets" ->
      """SELECT COALESCE(l_returnflag,'ALL') AS returnflag,
        |       COALESCE(l_linestatus,'ALL') AS linestatus,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag),(l_linestatus))
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_correlated_subquery" ->
      """SELECT c_custkey, c_acctbal FROM customer c
        |WHERE c_acctbal * (SELECT COUNT(*) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |      > (SELECT CAST(SUM(CAST(c3.c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |         FROM customer c3 WHERE c3.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,
    // DuckDB's x/0 is NULL natively (= Spark's try_divide); TRY_CAST
    // matches try_cast including whitespace-trimmed numeric parses
    "q_try_arith" ->
      """SELECT c_custkey,
        |       c_acctbal / (c_custkey % 7) AS div7,
        |       TRY_CAST(c_mktsegment AS BIGINT) AS seg_num,
        |       TRY_CAST(' '||CAST(c_custkey AS VARCHAR)||' ' AS BIGINT) AS key_roundtrip
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_string_funcs" ->
      """SELECT c_custkey,
        |       upper(c_name) AS upper_name,
        |       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |       regexp_replace(c_name, 'Customer#', 'C-') AS replaced,
        |       CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS lev,
        |       CAST(length(trim(c_name)) AS BIGINT) AS trimmed_len
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |       ROUND(sqrt(l_quantity), 6) AS sqrt_q,
        |       ROUND(pow(l_discount + 1, 2), 6) AS pow_d,
        |       abs(l_quantity - 25.0) AS abs_q,
        |       ROUND(exp(l_discount), 6) AS exp_d,
        |       ROUND(ln(l_extendedprice), 6) AS ln_p
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        |       CAST(len(embedding) AS BIGINT) AS dims,
        |       CAST(list_max(embedding) AS DOUBLE) AS arr_max,
        |       CAST(list_min(embedding) AS DOUBLE) AS arr_min,
        |       CAST(embedding[1] AS DOUBLE) AS first_val
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_rolling" ->
      // the identical RANGE frame (peers included at equal ts); measures
      // CAST back from DuckDB's wider window-SUM type
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |                  CAST(event_id % 100 AS BIGINT) AS m FROM events)
        |SELECT user_id, event_id, ts_us,
        |       CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
        |       CAST(SUM(m) OVER w AS BIGINT) AS sum_m
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |                    RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |f AS (
        |  SELECT user_id, event_id, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |g AS (
        |  SELECT user_id, ts_us,
        |         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM f)
        |SELECT user_id, session_idx,
        |       MIN(ts_us) AS session_start_us,
        |       MAX(ts_us) AS session_end_us,
        |       COUNT(*) AS n_events,
        |       MAX(ts_us) - MIN(ts_us) AS duration_us
        |FROM g GROUP BY 1,2 ORDER BY user_id, session_idx""".stripMargin,
    "q_session_window" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |f AS (
        |  SELECT user_id, event_id, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |g AS (
        |  SELECT user_id, ts_us,
        |         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM f)
        |SELECT user_id, MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
        |       COUNT(*) AS n_events
        |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start_us""".stripMargin,
    "q_sessionize_capped" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |f AS (
        |  SELECT user_id, event_id, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new,
        |         row_number() OVER w AS rnk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |g AS (
        |  SELECT user_id, ts_us, rnk,
        |         MAX(CASE WHEN is_new = 1 THEN rnk END) OVER (
        |           PARTITION BY user_id ORDER BY ts_us, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_first
        |  FROM f)
        |SELECT user_id, MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
        |       COUNT(*) AS n_events
        |FROM g GROUP BY user_id, sess_first, (rnk - sess_first) // 2
        |ORDER BY user_id, session_start_us""".stripMargin,
    "q_asof_prev_order" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_custkey,
        |         lag(o_orderkey) OVER w AS prev_orderkey,
        |         CAST(lag(o_orderdate) OVER w AS DATE) AS prev_date,
        |         CAST(date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE),
        |                        CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
        |  FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
        |WHERE prev_orderkey IS NOT NULL
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_range_join" ->
      // DuckDB's IEJoin evaluates the inequality join directly; result must
      // equal the Spark side's binned equi-join + residual-filter rewrite
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events)
        |SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_pairs
        |FROM e a JOIN e b ON b.us > a.us AND b.us <= a.us + 60000000
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q_asof_join_2table" ->
      // DuckDB's NATIVE ASOF JOIN validates the Spark union-and-sweep
      // rewrite — two entirely different algorithms, one result set
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events),
        |c AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, us, MAX(event_id) AS p_id
        |      FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.user_id, c.event_id, c.us, p.p_id AS asof_rid, p.us AS asof_rt
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.us >= p.us
        |ORDER BY c.user_id, c.event_id""".stripMargin,
    "q_asof_tolerance" ->
      // the native ASOF match post-filtered by staleness: nearest-too-far
      // ⟺ nothing within tolerance, so the CASE null-out is exact
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events),
        |c AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, us, MAX(event_id) AS p_id
        |      FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.user_id, c.event_id, c.us,
        |       CASE WHEN c.us - p.us > 86400000000 THEN NULL ELSE p.p_id END AS asof_rid,
        |       CASE WHEN c.us - p.us > 86400000000 THEN NULL ELSE p.us END AS asof_rt
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.us >= p.us
        |ORDER BY c.user_id, c.event_id""".stripMargin,
    "q_asof_join_forward" ->
      // DuckDB's native ASOF LEFT JOIN with the inequality REVERSED
      // (c.us <= p.us) validates the mirrored sweep — again two different
      // algorithms, one result set
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events),
        |c AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, us, MAX(event_id) AS p_id
        |      FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.user_id, c.event_id, c.us, p.p_id AS asof_rid, p.us AS asof_rt
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.us <= p.us
        |ORDER BY c.user_id, c.event_id""".stripMargin,
    "q_asof_join_payload" ->
      // the payload-carrying form: DuckDB's native ASOF LEFT JOIN selects
      // the matched row's value directly; the Spark side must surface the
      // identical value through its struct-atomic single-sweep rewrite
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type, value FROM events),
        |c AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, us, MAX(event_id) AS p_id, MAX(value) AS p_value
        |      FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.user_id, c.event_id, c.us, p.p_id AS asof_rid, p.us AS asof_rt,
        |       p.p_value AS asof_p_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.us >= p.us
        |ORDER BY c.user_id, c.event_id""".stripMargin,
    "q_interval_join_2stream" ->
      // DuckDB's IEJoin evaluates the keyed interval predicate directly;
      // result must equal StreamJoin.joinWithin's batch plan
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events),
        |c AS (SELECT user_id, event_id AS click_id, us AS click_us FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, us AS purchase_us FROM e WHERE event_type = 'purchase')
        |SELECT c.user_id, c.click_id, c.click_us, p.purchase_id, p.purchase_us
        |FROM c JOIN p ON c.user_id = p.user_id
        |              AND p.purchase_us >= c.click_us - 86400000000
        |              AND p.purchase_us <= c.click_us
        |ORDER BY c.user_id, c.click_id, p.purchase_id""".stripMargin,
    "q_interval_coalesce" ->
      // identical running-max flag / cumsum / span aggregation; ROWS
      // frames pin the same peer semantics as the Spark windows
      """WITH iv AS (
        |  SELECT o_custkey,
        |         CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS s,
        |         CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
        |              + o_orderkey % 10 + 1 AS BIGINT) AS e
        |  FROM orders),
        |w AS (
        |  SELECT o_custkey, s, e,
        |         CASE WHEN max(e) OVER (PARTITION BY o_custkey ORDER BY s, e
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |              OR s > max(e) OVER (PARTITION BY o_custkey ORDER BY s, e
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM iv),
        |g AS (
        |  SELECT o_custkey, s, e,
        |         CAST(SUM(is_new) OVER (PARTITION BY o_custkey ORDER BY s, e
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS span_idx
        |  FROM w)
        |SELECT o_custkey, span_idx, MIN(s) AS span_start, MAX(e) AS span_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_intervals
        |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_interval_join_outer" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events),
        |c AS (SELECT user_id, event_id AS click_id, us AS click_us FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, us AS purchase_us FROM e WHERE event_type = 'purchase')
        |SELECT c.user_id, c.click_id, c.click_us, p.purchase_id, p.purchase_us
        |FROM c LEFT JOIN p ON c.user_id = p.user_id
        |                   AND p.purchase_us >= c.click_us - 86400000000
        |                   AND p.purchase_us <= c.click_us
        |ORDER BY c.user_id, c.click_id, p.purchase_id""".stripMargin,
    "q_lateral_topk" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= '1997-01-01' AND o_orderdate < '1997-07-01')
        |ORDER BY c_custkey""".stripMargin,
    "q_cube_lineitem" ->
      """SELECT COALESCE(l_returnflag,'ALL') AS returnflag,
        |       COALESCE(l_linestatus,'ALL') AS linestatus,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_pivot_events" ->
      """SELECT user_id,
        |       CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |       CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |       CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |       CAST(SUM(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |       CAST(SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q_window_tumbling" ->
      """SELECT CAST(floor(epoch(o_orderdate)/604800.0)*604800 AS BIGINT) AS win_start_epoch,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1 ORDER BY win_start_epoch""".stripMargin,
    "q_window_ranks" ->
      """SELECT c_custkey, c_mktsegment,
        |       CAST(rank() OVER w AS BIGINT) AS rnk,
        |       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |       percent_rank() OVER w AS prnk,
        |       cume_dist() OVER w AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_collect_agg" ->
      """SELECT o_custkey,
        |       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS orderkeys,
        |       COUNT(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY o_custkey""".stripMargin,
    "q_null_semantics" ->
      """SELECT l_orderkey, l_linenumber,
        |       NULLIF(l_returnflag, 'N') AS rf_null,
        |       COALESCE(NULLIF(l_returnflag, 'N'), 'NONE') AS rf_filled,
        |       (NULLIF(l_returnflag, 'N') IS NOT DISTINCT FROM 'R') AS is_r_nullsafe
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_window_sliding" ->
      // ts ∈ [base−slide, base+dur−slide) for base = ts's slide bucket ⇒
      // member of exactly the windows starting at base and base−slide
      """WITH o AS (
        |  SELECT CAST(floor(epoch(o_orderdate)/604800.0)*604800 AS BIGINT) AS base,
        |         o_totalprice
        |  FROM orders),
        |m AS (
        |  SELECT base - u.off AS win_start_epoch, o_totalprice
        |  FROM o, (SELECT unnest([0, 604800]) AS off) u)
        |SELECT win_start_epoch, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM m GROUP BY 1 ORDER BY win_start_epoch""".stripMargin,
    "q_bool_agg" ->
      """SELECT l_returnflag,
        |       bool_and(l_quantity > 1) AS all_gt1,
        |       bool_or(l_discount > 0.09) AS any_deep_discount,
        |       bool_and(l_quantity <= 50) AS all_le50,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q_bitwise_agg" ->
      """SELECT user_id % 16 AS user_bucket,
        |       bit_and(event_id) AS band,
        |       bit_or(event_id) AS bor,
        |       bit_xor(event_id) AS bxor,
        |       COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY user_bucket""".stripMargin,
    "q_stddev_var" ->
      """WITH a AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        |         CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS sxx
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |       ROUND(sx / n, 6) AS mean_qty,
        |       ROUND(sxx / n - (sx / n) * (sx / n), 6) AS var_pop,
        |       ROUND(sqrt(sxx / n - (sx / n) * (sx / n)), 6) AS stddev_pop
        |FROM a ORDER BY l_returnflag""".stripMargin,
    "q_datetime_funcs" ->
      """WITH m AS (
        |  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
        |         COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT month_start,
        |       last_day(month_start) AS month_end,
        |       CAST(day(last_day(month_start)) AS BIGINT) AS days_in_month,
        |       CAST(dayofweek(month_start) AS BIGINT) AS dow_start,
        |       n_orders
        |FROM m ORDER BY month_start""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.5) AS median_qty,
        |       quantile_cont(l_quantity, 0.95) AS p95_qty,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q_percentile_approx" ->
      """SELECT l_returnflag,
        |       quantile_disc(l_quantity, 0.5) AS median_qty,
        |       quantile_disc(l_quantity, 0.95) AS p95_qty,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin,
    "dedup_exact_normalized" ->
      // identical residue planting via chr() (233 = precomposed é, 769 =
      // combining acute, 201 = É), then the identical key chain: lower →
      // explicit-class ws collapse → NFC → md5 (DuckDB's nfc_normalize
      // and the JDK normalizer both implement UAX #15 NFC)
      """WITH v AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 4 = 0
        |                THEN 'Caf'||chr(233)||'   doc '||CAST(doc_id//4 AS VARCHAR)
        |              WHEN doc_id % 4 = 1
        |                THEN 'Cafe'||chr(769)||' doc '||CAST(doc_id//4 AS VARCHAR)
        |              WHEN doc_id % 4 = 2
        |                THEN 'CAF'||chr(201)||' doc '||CAST(doc_id//4 AS VARCHAR)
        |              ELSE 'unique '||CAST(doc_id AS VARCHAR) END AS text
        |  FROM documents)
        |SELECT md5(nfc_normalize(regexp_replace(trim(lower(text)), '[ \t\n\r]+', ' ', 'g')))
        |         AS text_key,
        |       MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM v GROUP BY 1 ORDER BY text_key""".stripMargin,
    "dedup_ngram_jaccard" -> jaccardOracle(0.6),
    "dedup_ngram_jaccard_pruned" -> (shingleCte +
      """, keep AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 10),
        |sh2 AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)),
        |nn2 AS (SELECT doc_id, COUNT(*) AS n FROM sh2 GROUP BY doc_id),
        |p2 AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
        |       FROM sh2 x JOIN sh2 y ON x.s=y.s AND x.doc_id<y.doc_id GROUP BY 1,2)
        |SELECT p2.a AS doc_a, p2.b AS doc_b,
        |       CAST(p2.c AS DOUBLE)/(na.n+nb.n-p2.c) AS jaccard
        |FROM p2 JOIN nn2 na ON na.doc_id=p2.a JOIN nn2 nb ON nb.doc_id=p2.b
        |WHERE CAST(p2.c AS DOUBLE)/(na.n+nb.n-p2.c) >= 0.6
        |ORDER BY doc_a, doc_b""".stripMargin),
    "dedup_minhash_lsh" -> jaccardOracle(0.6),
    "dedup_threshold_sweep" -> (shingleCte +
      // integer decile: (10·c) // union ≥ k ⟺ J ≥ k/10 exactly; fixed
      // 6-row spine so empty deciles emit 0
      """,bk AS (
        |  SELECT (10*p.c) // (na.n+nb.n-p.c) AS b
        |  FROM p JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b)
        |SELECT CAST(sp.t AS BIGINT) AS tau_e1,
        |       CAST((SELECT COUNT(*) FROM bk WHERE bk.b >= sp.t) AS BIGINT)
        |         AS n_pairs_ge
        |FROM range(5, 11) sp(t) ORDER BY tau_e1""".stripMargin),
    "dedup_minhash_calibration" -> (shingleCte + {
      // the md5 permutation minima replayed over the shingle STRING
      // universe; integer ppm everywhere (est: matches × 62500 exact;
      // exact: (1e6·c) // union), sums CAST to BIGINT per the HUGEINT
      // discipline
      val sigCols = (0 until 16).map(p =>
        s"MIN(CAST(('0x'||substring(md5('mh$p:'||s),1,15)) AS BIGINT)) AS sig$p")
        .mkString(", ")
      val matchSum = (0 until 16).map(p =>
        s"CASE WHEN sa.sig$p = sb.sig$p THEN 1 ELSE 0 END").mkString(" + ")
      s""",sig AS (SELECT doc_id, $sigCols FROM sh GROUP BY doc_id),
         |sc AS (
         |  SELECT (10*p.c) // (na.n+nb.n-p.c) AS j_e1,
         |         (1000000*p.c) // (na.n+nb.n-p.c) AS exact_ppm,
         |         CAST(($matchSum) * 62500 AS BIGINT) AS est_ppm
         |  FROM p JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b
         |         JOIN sig sa ON sa.doc_id=p.a JOIN sig sb ON sb.doc_id=p.b)
         |SELECT CAST(j_e1 AS BIGINT) AS j_e1,
         |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |       CAST(SUM(exact_ppm) AS BIGINT) AS sum_exact_ppm,
         |       CAST(SUM(est_ppm) AS BIGINT) AS sum_est_ppm,
         |       CAST(SUM(abs(est_ppm - exact_ppm)) AS BIGINT) AS sum_abs_err_ppm,
         |       CAST(MAX(abs(est_ppm - exact_ppm)) AS BIGINT) AS max_abs_err_ppm
         |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin
    }),
    "text_hash_audit" -> (shingleCte +
      // the oracle counts shingle STRINGS only (DuckDB has no xxhash64)
      // and pins n_collisions to 0 — the exact claim under audit; a real
      // collision makes the Spark side's hash count fall short and the
      // row fail loudly
      """SELECT CAST(COUNT(DISTINCT s) AS BIGINT) AS n_distinct_shingles,
        |       CAST(COUNT(DISTINCT s) AS BIGINT) AS n_distinct_hashes,
        |       CAST(0 AS BIGINT) AS n_collisions
        |FROM sh""".stripMargin),
    "dedup_incremental_probe" -> (shingleCte +
      // the same exact-Jaccard pair universe, restricted to cross
      // (delta < 50, base >= 50) pairs — canonical a < b makes the split
      // predicate one-sided
      """SELECT p.a AS doc_a, p.b AS doc_b,
        |       CAST(p.c AS DOUBLE)/(na.n+nb.n-p.c) AS jaccard
        |FROM p JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b
        |WHERE CAST(p.c AS DOUBLE)/(na.n+nb.n-p.c) >= 0.6
        |  AND p.a < 50 AND p.b >= 50
        |ORDER BY doc_a, doc_b""".stripMargin),
    "dedup_simhash" -> simhashOracle(0.6, 6),
    "dedup_simhash_recall" -> simhashRecallOracle(0.6, 6),
    // identical oracle by design: the collapse rewrite must never change
    // the emitted pair set, only the plan shape
    "dedup_simhash_collapse" -> simhashOracle(0.6, 6),
    "dedup_embedding_cosine" -> (embCte +
      """, d AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, list_reduce(list(a.v*b.v ORDER BY a.i), (x,y) -> x+y) AS dot
        |  FROM f a JOIN f b ON a.i=b.i AND a.vec_id<b.vec_id GROUP BY 1,2)
        |SELECT id_a, id_b, ROUND(dot/(x.nrm*y.nrm),4)+0.0 AS cosine
        |FROM d JOIN nrm x ON x.vec_id=id_a JOIN nrm y ON y.vec_id=id_b
        |WHERE ROUND(dot/(x.nrm*y.nrm),4) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin),
    "dedup_embedding_lsh" -> (embCte +
      """, hp AS (SELECT vec_id AS plane_id, i, v FROM f WHERE vec_id < 4),
        |pd AS (
        |  SELECT f.vec_id, hp.plane_id, list_reduce(list(f.v*hp.v ORDER BY f.i), (x,y) -> x+y) AS d
        |  FROM f JOIN hp ON f.i=hp.i GROUP BY 1,2),
        |bk AS (
        |  SELECT vec_id, CAST(SUM(CASE WHEN d > 0 THEN 1<<plane_id ELSE 0 END) AS BIGINT) AS bucket
        |  FROM pd GROUP BY 1),
        |cand AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM bk a JOIN bk b ON a.bucket=b.bucket AND a.vec_id<b.vec_id),
        |d AS (
        |  SELECT c.id_a, c.id_b, list_reduce(list(x.v*y.v ORDER BY x.i), (p,q) -> p+q) AS dot
        |  FROM cand c
        |  JOIN f x ON x.vec_id=c.id_a
        |  JOIN f y ON y.vec_id=c.id_b AND x.i=y.i
        |  GROUP BY 1,2)
        |SELECT id_a, id_b, ROUND(dot/(nx.nrm*ny.nrm),4)+0.0 AS cosine
        |FROM d JOIN nrm nx ON nx.vec_id=id_a JOIN nrm ny ON ny.vec_id=id_b
        |WHERE ROUND(dot/(nx.nrm*ny.nrm),4) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin),
    "dedup_embedding_lsh_banded" -> (embCte +
      """, hp AS (SELECT vec_id AS plane_id, i, v FROM f WHERE vec_id < 4),
        |pd AS (
        |  SELECT f.vec_id, hp.plane_id, list_reduce(list(f.v*hp.v ORDER BY f.i), (x,y) -> x+y) AS d
        |  FROM f JOIN hp ON f.i=hp.i GROUP BY 1,2),
        |bkb AS (
        |  SELECT vec_id, CAST(floor(plane_id/2.0) AS BIGINT) AS band,
        |         CAST(SUM(CASE WHEN d > 0 THEN 1<<(plane_id % 2) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM pd GROUP BY 1,2),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM bkb a JOIN bkb b ON a.band=b.band AND a.bucket=b.bucket AND a.vec_id<b.vec_id),
        |d AS (
        |  SELECT c.id_a, c.id_b, list_reduce(list(x.v*y.v ORDER BY x.i), (p,q) -> p+q) AS dot
        |  FROM cand c
        |  JOIN f x ON x.vec_id=c.id_a
        |  JOIN f y ON y.vec_id=c.id_b AND x.i=y.i
        |  GROUP BY 1,2)
        |SELECT id_a, id_b, ROUND(dot/(nx.nrm*ny.nrm),4)+0.0 AS cosine
        |FROM d JOIN nrm nx ON nx.vec_id=id_a JOIN nrm ny ON ny.vec_id=id_b
        |WHERE ROUND(dot/(nx.nrm*ny.nrm),4) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin),
    "ann_cosine_topk" -> (embCte +
      """, d AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, list_reduce(list(q.v*n.v ORDER BY q.i), (x,y) -> x+y) AS dot
        |  FROM f q JOIN f n ON q.i=n.i AND q.vec_id<10 AND q.vec_id<>n.vec_id
        |  GROUP BY 1,2),
        |s AS (
        |  SELECT query_id, neighbor_id, ROUND(dot/(nq.nrm*nn2.nrm),4)+0.0 AS score
        |  FROM d JOIN nrm nq ON nq.vec_id=d.query_id
        |         JOIN nrm nn2 ON nn2.vec_id=d.neighbor_id),
        |r AS (
        |  SELECT query_id, neighbor_id, score,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
        |  FROM s)
        |SELECT query_id, neighbor_id, score, rnk FROM r
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin),
    "ann_lsh_topk" -> (embCte +
      """, hp AS MATERIALIZED (SELECT vec_id AS plane_id, i, v FROM f WHERE vec_id < 4),
        |pd AS (
        |  SELECT f.vec_id, hp.plane_id, list_reduce(list(f.v*hp.v ORDER BY f.i), (x,y) -> x+y) AS d
        |  FROM f JOIN hp ON f.i=hp.i GROUP BY 1,2),
        |bk AS MATERIALIZED (
        |  SELECT vec_id, CAST(SUM(CASE WHEN d > 0 THEN 1<<plane_id ELSE 0 END) AS BIGINT) AS bucket
        |  FROM pd GROUP BY 1),
        |cand AS MATERIALIZED (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id
        |  FROM bk q JOIN bk n ON q.bucket=n.bucket AND q.vec_id<10 AND q.vec_id<>n.vec_id),
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
        |SELECT query_id, neighbor_id, score, rnk FROM rr
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin),
    "ann_lsh_banded_topk" -> (embCte + lshBandedServeCtes +
      """SELECT query_id, neighbor_id, score, rnk FROM rr
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin),
    "ann_ivf_topk" -> (embCte +
      """, cd AS (SELECT vec_id AS cid, i, v FROM f WHERE vec_id < 4),
        |cdot AS (
        |  SELECT f.vec_id, cd.cid, list_reduce(list(f.v*cd.v ORDER BY f.i), (x,y) -> x+y) AS d
        |  FROM f JOIN cd ON f.i=cd.i GROUP BY 1,2),
        |cscore AS (
        |  SELECT cdot.vec_id, cdot.cid, ROUND(d/(nv.nrm*nc.nrm),4) AS cs
        |  FROM cdot JOIN nrm nv ON nv.vec_id=cdot.vec_id
        |          JOIN nrm nc ON nc.vec_id=cdot.cid),
        |cell AS (
        |  SELECT vec_id, cid AS cell FROM (
        |    SELECT vec_id, cid,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS crn
        |    FROM cscore)
        |  WHERE crn = 1),
        |cand AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id
        |  FROM cell q JOIN cell n ON q.cell=n.cell AND q.vec_id<10 AND q.vec_id<>n.vec_id),
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
        |SELECT query_id, neighbor_id, score, rnk FROM rr
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin),
    "ann_filtered_topk" -> (embCte +
      // the ann_ivf_topk probe with the metadata predicate joined onto
      // the CANDIDATE side (cell assignment is row-local, so filtering
      // candidates ≡ filtering the index before assignment)
      """, cd AS (SELECT vec_id AS cid, i, v FROM f WHERE vec_id < 4),
        |cdot AS (
        |  SELECT f.vec_id, cd.cid, list_reduce(list(f.v*cd.v ORDER BY f.i), (x,y) -> x+y) AS d
        |  FROM f JOIN cd ON f.i=cd.i GROUP BY 1,2),
        |cscore AS (
        |  SELECT cdot.vec_id, cdot.cid, ROUND(d/(nv.nrm*nc.nrm),4) AS cs
        |  FROM cdot JOIN nrm nv ON nv.vec_id=cdot.vec_id
        |          JOIN nrm nc ON nc.vec_id=cdot.cid),
        |cell AS (
        |  SELECT vec_id, cid AS cell FROM (
        |    SELECT vec_id, cid,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS crn
        |    FROM cscore)
        |  WHERE crn = 1),
        |cand AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id
        |  FROM cell q
        |  JOIN cell n ON q.cell=n.cell AND q.vec_id<10 AND q.vec_id<>n.vec_id
        |  JOIN embeddings me ON me.vec_id = n.vec_id AND me.label = 1),
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
        |SELECT query_id, neighbor_id, score, rnk FROM rr
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin),
    "ann_ivf_trained_topk" -> (embCte +
      Similarity.kmeansOracleCtes(k = 4, iters = 2) +
      ivfTrainedServeCtes +
      """SELECT query_id, neighbor_id, score, rnk FROM rr
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin),
    "ann_index_upsert" -> (embCte +
      // training (init + every re-assignment round) restricted to the
      // base; serving assigns the FULL corpus under the frozen centroids
      // — exactly build(base) + append(delta) + topK
      Similarity.kmeansOracleCtes(k = 4, iters = 2, trainPred = "vec_id < 400") +
      ivfTrainedServeCtes +
      """SELECT query_id, neighbor_id, score, rnk FROM rr
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin),
    // both chains replayed (the trained-IVF serving CTEs + a fresh-named
    // brute-force chain over the same queries), then the identical
    // exact-set left join and per-query hit count
    "ann_recall_eval" -> (embCte +
      Similarity.kmeansOracleCtes(k = 4, iters = 2) +
      ivfTrainedServeCtes +
      recallTailCtes),
    // same recall tail over a DIFFERENT serving family: the banded-LSH
    // chain defines `rr`, the tail replays brute force + the hit join —
    // proving the recall operator is family-agnostic, not IVF-coupled
    "ann_recall_eval_lsh" -> (embCte + lshBandedServeCtes + recallTailCtes),
    // training restricted to the even-parity reference dump (the
    // ann_index_upsert trainPred form); the serve chain's rfin/ncell
    // assign the FULL corpus under the frozen centroids, then parity
    // splits the per-cell counts and integer ppm shares compare them
    "emb_cluster_drift" -> (embCte +
      Similarity.kmeansOracleCtes(k = 4, iters = 2, trainPred = "vec_id % 2 = 0") +
      ivfTrainedServeCtes +
      """,pcounts AS (
        |  SELECT ncell.cell,
        |         CAST(SUM(CASE WHEN ncell.vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(SUM(CASE WHEN ncell.vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM ncell GROUP BY 1),
        |tt AS (SELECT CAST(SUM(n_a) AS BIGINT) AS ta, CAST(SUM(n_b) AS BIGINT) AS tb
        |       FROM pcounts)
        |SELECT p.cell, p.n_a, p.n_b,
        |       CAST((1000000 * p.n_a) // tt.ta AS BIGINT) AS share_a_ppm,
        |       CAST((1000000 * p.n_b) // tt.tb AS BIGINT) AS share_b_ppm,
        |       CAST(abs((1000000 * p.n_a) // tt.ta - (1000000 * p.n_b) // tt.tb) AS BIGINT)
        |         AS abs_drift_ppm
        |FROM pcounts p, tt ORDER BY p.cell""".stripMargin),
    "ann_binary_topk" -> (embCte + binaryServeCtes +
      """SELECT query_id, neighbor_id, hamming, score, rnk FROM rr
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin),
    "ann_binary_banded_topk" -> (embCte + binaryBandedServeCtes +
      """SELECT query_id, neighbor_id, hamming, score, rnk FROM rr
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin),
    // the binary-quantization family through the same family-agnostic
    // recall tail as ivf/lsh/matryoshka/rp
    "ann_recall_eval_binary" -> (embCte + binaryServeCtes + recallTailCtes),
    "ann_recall_eval_binary_banded" -> (embCte + binaryBandedServeCtes + recallTailCtes),
    // sweep over the probe knob: training + the serve chain's rfin/ncell
    // reused, then the ranked-probe shared-scoring sweep tail
    "ann_nprobe_sweep" -> (embCte +
      Similarity.kmeansOracleCtes(k = 4, iters = 2) +
      ivfTrainedServeCtes + nprobeSweepTailCtes),
    // a THIRD serving family through the same tail: prefix-dim brute
    // force (ordered prefix folds for dots AND norms) defines `rr`
    "ann_matryoshka_recall" -> (embCte +
      s""",td AS MATERIALIZED (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |         list_reduce(list(q.v*n.v ORDER BY q.i), (x,y) -> x+y) AS dot
         |  FROM f q JOIN f n ON q.i=n.i AND q.i<=$matryoshkaDims
         |   AND q.vec_id<10 AND q.vec_id<>n.vec_id
         |  GROUP BY 1,2),
         |nrmt AS MATERIALIZED (
         |  SELECT vec_id, sqrt(list_reduce(list(v*v ORDER BY i), (x,y) -> x+y)) AS nrm
         |  FROM f WHERE i<=$matryoshkaDims GROUP BY 1),
         |ts AS (
         |  SELECT query_id, neighbor_id, ROUND(dot/(nq.nrm*nn2.nrm),4)+0.0 AS score
         |  FROM td JOIN nrmt nq ON nq.vec_id=td.query_id
         |          JOIN nrmt nn2 ON nn2.vec_id=td.neighbor_id),
         |rr AS MATERIALIZED (
         |  SELECT query_id, neighbor_id, score,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
         |  FROM ts)
         |""".stripMargin + recallTailCtes),
    // a FOURTH serving family through the same recall tail: ±1
    // random-projection brute force. `sgn` re-derives the identical
    // md5-parity sign matrix (pure function of (j, i) — no model, no
    // plane table), `fp` replays the projection as ordered folds (±1.0
    // products are exact IEEE sign flips, so projected values match the
    // Spark side bit-for-bit), then projected-space norms/dots/rank feed
    // the shared brute-force-vs-rr tail
    "ann_rp_recall" -> (embCte +
      s""",sgn AS (
         |  SELECT j.j, i.i,
         |         CASE WHEN CAST(('0x'||substring(md5('rp:'||CAST(j.j AS VARCHAR)||':'||CAST(i.i AS VARCHAR)),1,15)) AS BIGINT) % 2 = 0
         |              THEN 1.0 ELSE -1.0 END AS s
         |  FROM range(0,$rpDims) j(j), range(1,${rpInDims + 1}) i(i)),
         |fp AS (
         |  SELECT f.vec_id, sgn.j AS i,
         |         list_reduce(list(f.v*sgn.s ORDER BY f.i), (x,y) -> x+y) AS v
         |  FROM f JOIN sgn ON f.i=sgn.i GROUP BY 1,2),
         |nrmp AS (SELECT vec_id, sqrt(list_reduce(list(v*v ORDER BY i), (x,y) -> x+y)) AS nrm
         |         FROM fp GROUP BY 1),
         |td AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |         list_reduce(list(q.v*n.v ORDER BY q.i), (x,y) -> x+y) AS dot
         |  FROM fp q JOIN fp n ON q.i=n.i AND q.vec_id<10 AND q.vec_id<>n.vec_id
         |  GROUP BY 1,2),
         |ts AS (
         |  SELECT query_id, neighbor_id, ROUND(dot/(nq.nrm*nn2.nrm),4)+0.0 AS score
         |  FROM td JOIN nrmp nq ON nq.vec_id=td.query_id
         |          JOIN nrmp nn2 ON nn2.vec_id=td.neighbor_id),
         |rr AS (
         |  SELECT query_id, neighbor_id, score,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
         |  FROM ts)
         |""".stripMargin + recallTailCtes),
    "ann_ivfpq_topk" -> (embCte +
      Similarity.ivfPqOracleSql(
        k = 3, kCoarse = 4, coarseIters = 2, m = 8, ksub = 8, dsub = 8,
        pqIters = 2, nprobe = 2, rerank = 50, maxQueryId = 10L)),
    "ann_ivfpq_sampled" -> (embCte +
      Similarity.ivfPqOracleSql(
        k = 3, kCoarse = 4, coarseIters = 2, m = 8, ksub = 8, dsub = 8,
        pqIters = 2, nprobe = 2, rerank = 50, maxQueryId = 10L,
        trainFrac = 0.5)),
    "ann_recall_eval_pq" -> (embCte +
      Similarity.ivfPqRecallOracleSql(
        k = 3, kCoarse = 4, coarseIters = 2, m = 8, ksub = 8, dsub = 8,
        pqIters = 2, nprobe = 2, rerank = 50, maxQueryId = 10L)),
    // all dots (final assignment AND pair scan) are ORDERED sequential
    // folds (list_reduce over i-ordered lists), mirroring the Spark side's
    // left-assoc ArrayDotProduct / NearestCentroidCells fold bit-for-bit —
    // an unordered SUM can flip the 4th rounded decimal on boundary values
    // (non-associative double addition), which here could flip a cluster
    // assignment and cascade into different keep/dup_of flags
    "dedup_semantic" -> (embCte +
      Similarity.kmeansOracleCtes(k = semDedupK, iters = semDedupIters) +
      semDedupPairCtes +
      """SELECT n.vec_id, n.cell, (dup.id_a IS NULL) AS keep,
        |       dup.dup_of, dup.max_cosine
        |FROM ncell n LEFT JOIN dup ON dup.id_a = n.vec_id
        |ORDER BY n.vec_id""".stripMargin),
    // keep-policy composition: semDedup dup edges → recursive reachability
    // (the componentsOracle discipline) → quality argmax (the best_rep
    // discipline) — the oracle composes the two EXISTING verified shapes
    "dedup_semantic_rep" -> ((embCte.replaceFirst("^WITH ", "WITH RECURSIVE ") +
      Similarity.kmeansOracleCtes(k = semDedupK, iters = semDedupIters) +
      semDedupPairCtes +
      """,e AS (SELECT dup_of AS src, id_a AS dst FROM dup
        |       UNION ALL SELECT id_a, dup_of FROM dup),
        |reach(node, lbl) AS (
        |  SELECT DISTINCT src, src FROM e
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
        |comp AS (SELECT node AS doc_id, MIN(lbl) AS component FROM reach GROUP BY node),
        |q AS (
        |  SELECT doc_id,
        |         ROUND(least(1.0, CAST(len(string_split(lower(text),' ')) AS DOUBLE)/100.0)*0.5 +
        |               CAST(length(regexp_replace(lower(text),'[^a-z]','','g')) AS DOUBLE)/CAST(length(text) AS BIGINT)*0.5,
        |               6) AS quality_score
        |  FROM documents),
        |r AS (
        |  SELECT comp.component, comp.doc_id, q.quality_score,
        |         row_number() OVER (PARTITION BY comp.component
        |                            ORDER BY q.quality_score DESC, comp.doc_id) AS rn
        |  FROM comp JOIN q USING (doc_id))
        |SELECT component, doc_id AS rep_id, quality_score
        |FROM r WHERE rn = 1 ORDER BY component""".stripMargin)),
    // semantic verdict = the dedup_semantic chain verbatim; lexical
    // verdict = the dedup_rate_by_source normalized-key discipline over
    // the id-aligned population; agree/disagree counted on the 2×2
    "q_crossmodal_agreement" -> (embCte +
      Similarity.kmeansOracleCtes(k = semDedupK, iters = semDedupIters) +
      semDedupPairCtes +
      """,
        |sem AS (SELECT n.vec_id AS doc_id,
        |               (dup.id_a IS NOT NULL) AS sem_removed
        |        FROM ncell n LEFT JOIN dup ON dup.id_a = n.vec_id),
        |v AS (SELECT doc_id,
        |             CASE WHEN doc_id % 10 = 0
        |                  THEN 'leak '||CAST(doc_id//20 AS VARCHAR)
        |                  ELSE text END AS text
        |      FROM documents),
        |kk AS (SELECT v.doc_id,
        |              md5(nfc_normalize(regexp_replace(trim(lower(v.text)),
        |                '[ \t\n\r]+', ' ', 'g'))) AS k,
        |              sem.sem_removed
        |       FROM v JOIN sem USING (doc_id)),
        |g AS (SELECT k, MIN(doc_id) AS keep_id FROM kk GROUP BY 1)
        |SELECT (kk.doc_id <> g.keep_id) AS lex_removed, kk.sem_removed,
        |       COUNT(*) AS n
        |FROM kk JOIN g ON g.k = kk.k
        |GROUP BY 1, 2 ORDER BY lex_removed, sem_removed""".stripMargin),
    // dot and norm-of-mean are ORDERED sequential folds (list_reduce over
    // index-ordered lists), mirroring the Spark side's left-to-right double
    // fold bit-for-bit — an unordered SUM(f.v*m.m) can flip the 4th rounded
    // decimal on boundary values (non-associative double addition)
    "ann_centroid_outlier" -> (embCte +
      """, m AS (
        |  SELECT i, CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*) AS m
        |  FROM f GROUP BY 1),
        |mn AS (
        |  SELECT sqrt(list_reduce(list(m*m ORDER BY i), (a,b) -> a+b)) AS mnrm
        |  FROM m),
        |d AS (
        |  SELECT f.vec_id,
        |         list_reduce(list(f.v*m.m ORDER BY f.i), (a,b) -> a+b) AS dot
        |  FROM f JOIN m USING (i) GROUP BY 1)
        |SELECT d.vec_id, ROUND(d.dot/(nrm.nrm*mn.mnrm),4)+0.0 AS centroid_cosine
        |FROM d JOIN nrm USING (vec_id) CROSS JOIN mn
        |ORDER BY vec_id""".stripMargin),
    "emb_int8_quant" -> (embCte +
      // identical IEEE-double expression order (abs(v)/s*127 + 0.5) and
      // explicit half-away-from-zero floor — no reliance on either
      // engine's round() tie rule; sums are integer, error is MAX
      """, sc AS (SELECT i, MAX(abs(v)) AS s FROM f GROUP BY 1),
        |cq AS (
        |  SELECT f.vec_id, f.v, sc.s,
        |         CASE WHEN sc.s = 0 THEN 0
        |              ELSE CAST(sign(f.v) * floor(abs(f.v)/sc.s*127 + 0.5) AS BIGINT)
        |         END AS code
        |  FROM f JOIN sc USING (i))
        |SELECT vec_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_dims,
        |       CAST(SUM(code) AS BIGINT) AS sum_code,
        |       CAST(SUM(abs(code)) AS BIGINT) AS sum_abs_code,
        |       CAST(SUM(CASE WHEN abs(code) = 127 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_saturated,
        |       ROUND(MAX(abs(v - code*s/127)), 6)+0.0 AS max_abs_err
        |FROM cq GROUP BY 1 ORDER BY vec_id""".stripMargin),
    "emb_cluster_stats" -> (embCte +
      Similarity.kmeansOracleCtes(k = 4, iters = 2) + ivfTrainedServeCtes +
      // dfin/cn2 from the shared serving chain: per-(vec, cell) dots under
      // the final centroids; rn = 1 is the assignment, its rounded cosine
      // the audited coherence (summed as exact integers ×10⁴)
      """, vcs AS (
        |  SELECT dfin.vec_id, dfin.cell,
        |         ROUND(dfin.dot/(nrm.nrm*cn2.cnrm),4)+0.0 AS cosine,
        |         row_number() OVER (PARTITION BY dfin.vec_id
        |           ORDER BY ROUND(dfin.dot/(nrm.nrm*cn2.cnrm),4) DESC, dfin.cell) AS rn
        |  FROM dfin JOIN nrm ON nrm.vec_id=dfin.vec_id
        |            JOIN cn2 ON cn2.cell=dfin.cell)
        |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |       CAST(SUM(CAST(ROUND(cosine*10000) AS BIGINT)) AS BIGINT) AS sum_cos_e4,
        |       MIN(cosine)+0.0 AS min_cos, MAX(cosine)+0.0 AS max_cos
        |FROM vcs WHERE rn = 1 GROUP BY 1 ORDER BY cell""".stripMargin),
    "emb_dim_stats" -> (embCte +
      // identical IEEE-double fencing expression on both sides
      // (sign(v)·floor(|v|·10⁶ + 0.5) — no engine round() tie rule), then
      // pure integer aggregates; sums CAST from DuckDB's HUGEINT
      """, g AS (
        |  SELECT CAST(i AS BIGINT) AS i,
        |         CAST(sign(v) * floor(abs(v)*1000000 + 0.5) AS BIGINT) AS v6
        |  FROM f)
        |SELECT i, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CASE WHEN v6 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dead,
        |       CAST(SUM(v6) AS BIGINT) AS sum_e6,
        |       CAST(SUM(v6*v6) AS BIGINT) AS sum_sq_e12,
        |       MIN(v6) AS min_e6, MAX(v6) AS max_e6
        |FROM g GROUP BY 1 ORDER BY i""".stripMargin),
    "emb_dim_covariance" -> (embCte + dimMomentCtes +
      // covariance numerators in HUGEINT cast to BIGINT, corr as the
      // identical fixed-order IEEE chain (int→double casts correctly
      // rounded in both engines), ROUND(…,4)+0.0
      """SELECT p.i, p.j, CAST(si.n AS BIGINT) AS n,
        |       CAST(p.s_ij AS BIGINT) AS sum_ij_e12,
        |       CAST(si.n*p.s_ij - si.s1*sj.s1 AS BIGINT) AS cov_e12,
        |       CASE WHEN si.n*si.s2 - si.s1*si.s1 = 0 OR sj.n*sj.s2 - sj.s1*sj.s1 = 0
        |            THEN NULL
        |            ELSE ROUND(CAST(si.n*p.s_ij - si.s1*sj.s1 AS DOUBLE) /
        |                 sqrt(CAST(si.n*si.s2 - si.s1*si.s1 AS DOUBLE) *
        |                      CAST(sj.n*sj.s2 - sj.s1*sj.s1 AS DOUBLE)), 4) + 0.0
        |       END AS corr
        |FROM p JOIN st si ON si.i = p.i JOIN st sj ON sj.i = p.j
        |ORDER BY p.i, p.j""".stripMargin),
    "emb_effective_rank" -> (embCte + dimMomentCtes +
      // upper triangle + diagonal of the SCALED integer covariance (the
      // pcaTop sign·(|c| // covDiv) fence — raw numerators square past
      // INT128); the Frobenius fold counts off-diagonal cells twice; one
      // positive HUGEINT floor at the end
      s""",cvr AS (
         |  SELECT p.i AS i, p.j AS j, si.n*p.s_ij - si.s1*sj.s1 AS c
         |  FROM p JOIN st si ON si.i = p.i JOIN st sj ON sj.i = p.j
         |  UNION ALL
         |  SELECT i, i, n*s2 - s1*s1 FROM st),
         |cv AS (
         |  SELECT i, j,
         |         CASE WHEN c < 0 THEN -((-c) // $pcaCovDiv) ELSE c // $pcaCovDiv END AS c
         |  FROM cvr),
         |""".stripMargin +
      """aggm AS (SELECT
        |    SUM(CASE WHEN i = j THEN c ELSE 0 END) AS tr,
        |    SUM(CASE WHEN i = j THEN c*c ELSE 2*c*c END) AS ss
        |  FROM cv),
        |n1 AS (SELECT CAST(MIN(n) AS BIGINT) AS nv FROM st)
        |SELECT CAST(64 AS BIGINT) AS dims, n1.nv AS n_vecs,
        |       CASE WHEN aggm.ss = 0 THEN NULL
        |            ELSE CAST((1000000 * aggm.tr * aggm.tr) // aggm.ss AS BIGINT)
        |       END AS eff_rank_ppm
        |FROM aggm, n1""".stripMargin),
    "emb_pca_top" -> (embCte + dimMomentCtes +
      // full scaled-integer covariance (both triangles + diagonal; `//` on
      // the non-negative abs = truncation toward zero in both engines),
      // deterministic non-uniform seed, three unrolled power-iteration
      // rounds, then Rayleigh/trace as an ordered (i, j) double fold
      s""",covfull AS MATERIALIZED (
         |  SELECT i, j,
         |         CASE WHEN c < 0 THEN -((-c) // $pcaCovDiv) ELSE c // $pcaCovDiv END AS cv
         |  FROM (
         |    SELECT p.i AS i, p.j AS j, si.n*p.s_ij - si.s1*sj.s1 AS c
         |    FROM p JOIN st si ON si.i = p.i JOIN st sj ON sj.i = p.j
         |    UNION ALL
         |    SELECT p.j, p.i, si.n*p.s_ij - si.s1*sj.s1
         |    FROM p JOIN st si ON si.i = p.i JOIN st sj ON sj.i = p.j
         |    UNION ALL
         |    SELECT i, i, n*s2 - s1*s1 FROM st) raw),
         |v0 AS MATERIALIZED (
         |       SELECT CAST(r.i AS BIGINT) AS i, CAST(1000000 + 1000*r.i AS HUGEINT) AS x
         |       FROM range(1, ${rpInDims + 1}) r(i)),
         |""".stripMargin + pcaIterCtes(3) +
      """ray AS (SELECT list_reduce(
        |          list(CAST(cf.cv AS DOUBLE) * CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)
        |               ORDER BY cf.i, cf.j), (x,y) -> x+y) AS num
        |        FROM covfull cf JOIN v3 a ON a.i = cf.i JOIN v3 b ON b.i = cf.j),
        |dn AS (SELECT CAST(SUM(x*x) AS DOUBLE) AS den FROM v3),
        |tr AS (SELECT CAST(SUM(CASE WHEN i = j THEN cv ELSE 0 END) AS DOUBLE) AS t FROM covfull)
        |SELECT CAST(v3.i AS BIGINT) AS i, CAST(v3.x AS BIGINT) AS loading_e6,
        |       CASE WHEN dn.den = 0 OR tr.t = 0 THEN NULL
        |            ELSE CAST(sign(ray.num / dn.den / tr.t) *
        |                 floor(abs(ray.num / dn.den / tr.t) * 1000000 + 0.5) AS BIGINT)
        |       END AS var_top_ppm
        |FROM v3, ray, dn, tr ORDER BY i""".stripMargin),
    "ann_knn_graph" -> (embCte +
      // the banded-bucket candidate CTEs (the lsh_banded discipline),
      // DIRECTED candidate pairs, per-node rank window, then the mutual
      // self-join on the reversed pair with both ranks k-bounded
      """, hp AS (SELECT vec_id AS plane_id, i, v FROM f WHERE vec_id < 4),
        |pd AS (
        |  SELECT f.vec_id, hp.plane_id, list_reduce(list(f.v*hp.v ORDER BY f.i), (x,y) -> x+y) AS d
        |  FROM f JOIN hp ON f.i=hp.i GROUP BY 1,2),
        |bkb AS (
        |  SELECT vec_id, CAST(floor(plane_id/2.0) AS BIGINT) AS band,
        |         CAST(SUM(CASE WHEN d > 0 THEN 1<<(plane_id % 2) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM pd GROUP BY 1,2),
        |cand AS MATERIALIZED (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM bkb a JOIN bkb b ON a.band=b.band AND a.bucket=b.bucket AND a.vec_id<>b.vec_id),
        |vl AS MATERIALIZED (SELECT vec_id, list(v ORDER BY i) AS vl FROM f GROUP BY 1),
        |d AS (
        |  SELECT c.id_a, c.id_b,
        |         list_reduce(list_transform(list_zip(a.vl, b.vl), s -> s[1] * s[2]),
        |                     (p,q) -> p+q) AS dot
        |  FROM cand c JOIN vl a ON a.vec_id=c.id_a JOIN vl b ON b.vec_id=c.id_b),
        |sc AS (
        |  SELECT id_a, id_b, ROUND(dot/(nx.nrm*ny.nrm),4)+0.0 AS cosine
        |  FROM d JOIN nrm nx ON nx.vec_id=id_a JOIN nrm ny ON ny.vec_id=id_b),
        |kn AS MATERIALIZED (
        |  SELECT id_a, id_b, cosine,
        |         CAST(row_number() OVER (PARTITION BY id_a
        |                                 ORDER BY cosine DESC, id_b) AS BIGINT) AS rnk
        |  FROM sc)
        |SELECT k1.id_a, k1.id_b, k1.cosine, k1.rnk AS rank_ab, k2.rnk AS rank_ba
        |FROM kn k1 JOIN kn k2 ON k2.id_a=k1.id_b AND k2.id_b=k1.id_a
        |WHERE k1.rnk <= 4 AND k2.rnk <= 4 AND k1.id_a < k1.id_b
        |ORDER BY k1.id_a, k1.id_b""".stripMargin),
    "emb_mean_pool" -> (embCte +
      // the kmeans c{r} per-dimension decimal-mean formula applied to
      // the DIV-5 grouping; i is 1-based on both sides
      """SELECT vec_id // 5 AS doc_id, i,
        |       ROUND(CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*), 6)+0.0
        |         AS v
        |FROM f GROUP BY 1, 2 ORDER BY doc_id, i""".stripMargin),
    "ann_label_noise" -> (embCte +
      // the knn_graph banded candidate chain (hp/pd/bkb/cand), directed
      // top-4 window, then label joins + plurality argmax replayed with
      // the identical (count DESC, label) tie-break
      """, hp AS (SELECT vec_id AS plane_id, i, v FROM f WHERE vec_id < 4),
        |pd AS (
        |  SELECT f.vec_id, hp.plane_id, list_reduce(list(f.v*hp.v ORDER BY f.i), (x,y) -> x+y) AS d
        |  FROM f JOIN hp ON f.i=hp.i GROUP BY 1,2),
        |bkb AS (
        |  SELECT vec_id, CAST(floor(plane_id/2.0) AS BIGINT) AS band,
        |         CAST(SUM(CASE WHEN d > 0 THEN 1<<(plane_id % 2) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM pd GROUP BY 1,2),
        |cand AS MATERIALIZED (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM bkb a JOIN bkb b ON a.band=b.band AND a.bucket=b.bucket AND a.vec_id<>b.vec_id),
        |vl AS MATERIALIZED (SELECT vec_id, list(v ORDER BY i) AS vl FROM f GROUP BY 1),
        |d AS (
        |  SELECT c.id_a, c.id_b,
        |         list_reduce(list_transform(list_zip(a.vl, b.vl), s -> s[1] * s[2]),
        |                     (p,q) -> p+q) AS dot
        |  FROM cand c JOIN vl a ON a.vec_id=c.id_a JOIN vl b ON b.vec_id=c.id_b),
        |sc AS (
        |  SELECT id_a, id_b, ROUND(dot/(nx.nrm*ny.nrm),4)+0.0 AS cosine
        |  FROM d JOIN nrm nx ON nx.vec_id=id_a JOIN nrm ny ON ny.vec_id=id_b),
        |kn AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT id_a, id_b,
        |           row_number() OVER (PARTITION BY id_a
        |                              ORDER BY cosine DESC, id_b) AS rnk
        |    FROM sc) WHERE rnk <= 4),
        |lb AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
        |wl AS (SELECT kn.id_a, lo.label AS own_label, ln2.label AS nbr_lbl
        |       FROM kn JOIN lb lo ON lo.vec_id = kn.id_a
        |               JOIN lb ln2 ON ln2.vec_id = kn.id_b),
        |cts AS MATERIALIZED (SELECT id_a, own_label, nbr_lbl, COUNT(*) AS c
        |        FROM wl GROUP BY 1,2,3),
        |pl AS (SELECT id_a, nbr_lbl AS plurality_label, c AS plurality_n,
        |              row_number() OVER (PARTITION BY id_a
        |                                 ORDER BY c DESC, nbr_lbl) AS rn
        |       FROM cts),
        |ag AS (SELECT id_a, own_label,
        |              CAST(SUM(c) AS BIGINT) AS n_nbrs,
        |              CAST(SUM(CASE WHEN nbr_lbl <> own_label THEN c ELSE 0 END) AS BIGINT)
        |                AS n_disagree
        |       FROM cts GROUP BY 1,2)
        |SELECT ag.id_a AS vec_id, ag.own_label AS label, ag.n_nbrs, ag.n_disagree,
        |       pl.plurality_label, CAST(pl.plurality_n AS BIGINT) AS plurality_n,
        |       (pl.plurality_label <> ag.own_label AND pl.plurality_n * 2 > ag.n_nbrs)
        |         AS suspect
        |FROM ag JOIN pl ON pl.id_a = ag.id_a AND pl.rn = 1
        |ORDER BY vec_id""".stripMargin),
    "ann_hard_negatives" -> (embCte +
      // the brute chain with the label inequality applied BEFORE the
      // per-query window — ordered dot folds, rounded scores, id tie-break
      """, lb AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
        |hd AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |         list_reduce(list(q.v*n.v ORDER BY q.i), (x,y) -> x+y) AS dot
        |  FROM f q JOIN f n ON q.i=n.i AND q.vec_id<10 AND q.vec_id<>n.vec_id
        |  GROUP BY 1,2),
        |hs AS (
        |  SELECT hd.query_id, hd.neighbor_id, ln2.label AS neg_label,
        |         ROUND(hd.dot/(nq.nrm*nn2.nrm),4)+0.0 AS score
        |  FROM hd JOIN nrm nq ON nq.vec_id=hd.query_id
        |          JOIN nrm nn2 ON nn2.vec_id=hd.neighbor_id
        |          JOIN lb lq ON lq.vec_id=hd.query_id
        |          JOIN lb ln2 ON ln2.vec_id=hd.neighbor_id
        |  WHERE lq.label <> ln2.label),
        |hr AS (
        |  SELECT query_id, neighbor_id, neg_label, score,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
        |  FROM hs)
        |SELECT query_id, neighbor_id, neg_label, score, rnk
        |FROM hr WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin),
    "dedup_survivors" -> (shingleCte +
      """SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (
        |  SELECT p.b FROM p
        |  JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b
        |  WHERE CAST(p.c AS DOUBLE)/(na.n+nb.n-p.c) >= 0.6)
        |ORDER BY doc_id""".stripMargin),
    "dedup_contamination" -> (shingleCte +
      """SELECT t.doc_id AS train_id, e.doc_id AS eval_id,
        |       COUNT(*) AS n_shared
        |FROM sh t JOIN sh e ON t.s = e.s
        |WHERE t.doc_id % 10 <> 0 AND e.doc_id % 10 = 0
        |GROUP BY 1, 2 HAVING COUNT(*) >= 5
        |ORDER BY train_id, eval_id""".stripMargin),
    // the pair CTE keeps doc_a < doc_b, so a cross pair's orientation is
    // recovered by which side is the eval residue (exactly one is, by the
    // WHERE xor); jaccard is the same single exact double division
    "dedup_cross_jaccard" -> (shingleCte +
      """,cj AS (
        |  SELECT CASE WHEN p.a % 10 <> 0 THEN p.a ELSE p.b END AS train_id,
        |         CASE WHEN p.a % 10 = 0 THEN p.a ELSE p.b END AS eval_id,
        |         CAST(p.c AS DOUBLE)/(na.n+nb.n-p.c) AS jaccard
        |  FROM p JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b
        |  WHERE (p.a % 10 = 0) <> (p.b % 10 = 0))
        |SELECT train_id, eval_id, jaccard FROM cj WHERE jaccard >= 0.5
        |ORDER BY train_id, eval_id""".stripMargin),
    "dedup_containment" -> (shingleCte +
      // orientation recovered as in cj; the denominator is the EVAL side's
      // own distinct-shingle count (p carries a < b, so pick whichever of
      // na/nb sits on the eval residue)
      """,ct AS (
        |  SELECT CASE WHEN p.a % 10 <> 0 THEN p.a ELSE p.b END AS train_id,
        |         CASE WHEN p.a % 10 = 0 THEN p.a ELSE p.b END AS eval_id,
        |         CAST(p.c AS DOUBLE) /
        |           (CASE WHEN p.a % 10 = 0 THEN na.n ELSE nb.n END) AS containment
        |  FROM p JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b
        |  WHERE (p.a % 10 = 0) <> (p.b % 10 = 0))
        |SELECT train_id, eval_id, containment FROM ct WHERE containment >= 0.6
        |ORDER BY train_id, eval_id""".stripMargin),
    // identical oracle by design: the Bloom pre-filter must never change
    // the emitted pair set, only the join's input volume
    "dedup_contamination_bloom" -> (shingleCte +
      """SELECT t.doc_id AS train_id, e.doc_id AS eval_id,
        |       COUNT(*) AS n_shared
        |FROM sh t JOIN sh e ON t.s = e.s
        |WHERE t.doc_id % 10 <> 0 AND e.doc_id % 10 = 0
        |GROUP BY 1, 2 HAVING COUNT(*) >= 5
        |ORDER BY train_id, eval_id""".stripMargin),
    // identical planting by residue, then the identical strip chain: regex
    // tag removal with 'g', exact-string entity replaces in the same
    // order (&amp; LAST — the non-cascading decode, mirroring the Spark
    // fold), ASCII whitespace collapse, trim
    "text_markup_strip" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 5 = 0 THEN '<p class="c"> '||text||' </p><br/>'
        |              WHEN doc_id % 5 = 1 THEN '<div id="d">&nbsp;'||text||' &amp; more</div>'
        |              ELSE text END AS text
        |  FROM documents)
        |SELECT doc_id,
        |       trim(regexp_replace(
        |         replace(replace(replace(replace(replace(
        |           regexp_replace(text, '<[^>]*>', ' ', 'g'),
        |           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |           '&nbsp;', ' '), '&amp;', '&'),
        |         '[ \t\n\r]+', ' ', 'g')) AS clean_text,
        |       CAST(len(regexp_extract_all(text, '<[^>]*>')) AS BIGINT) AS n_tags,
        |       CAST(len(regexp_extract_all(text, '&(amp|lt|gt|quot|nbsp);')) AS BIGINT) AS n_entities
        |FROM m ORDER BY doc_id""".stripMargin,
    "text_gram_novelty" -> (shingleCte +
      """,df AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY 1)
        |SELECT sh.doc_id, COUNT(*) AS n_shingles,
        |       CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |       CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS shared_frac
        |FROM sh JOIN df USING (s) GROUP BY 1 ORDER BY sh.doc_id""".stripMargin),
    "dedup_components" -> componentsOracle,
    // identical oracle BY DESIGN: the incremental merge must be
    // value-identical to the full recompute over all pairs
    "dedup_components_incremental" -> componentsOracle,
    "dedup_best_rep" -> (shingleCteMat.replaceFirst("^WITH ", "WITH RECURSIVE ") +
      """,qp AS MATERIALIZED (
        |  SELECT p.a, p.b FROM p
        |  JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b
        |  WHERE CAST(p.c AS DOUBLE)/(na.n+nb.n-p.c) >= 0.6),
        |e AS MATERIALIZED (SELECT a AS src, b AS dst FROM qp UNION ALL SELECT b, a FROM qp),
        |reach(node, lbl) AS (
        |  SELECT DISTINCT src, src FROM e
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
        |comp AS (SELECT node AS doc_id, MIN(lbl) AS component FROM reach GROUP BY node),
        |q AS (
        |  SELECT doc_id,
        |         ROUND(least(1.0, CAST(len(string_split(lower(text),' ')) AS DOUBLE)/100.0)*0.5 +
        |               CAST(length(regexp_replace(lower(text),'[^a-z]','','g')) AS DOUBLE)/CAST(length(text) AS BIGINT)*0.5,
        |               6) AS quality_score
        |  FROM documents),
        |r AS (
        |  SELECT comp.component, comp.doc_id, q.quality_score,
        |         row_number() OVER (PARTITION BY comp.component
        |                            ORDER BY q.quality_score DESC, comp.doc_id) AS rn
        |  FROM comp JOIN q USING (doc_id))
        |SELECT component, doc_id AS rep_id, quality_score
        |FROM r WHERE rn = 1 ORDER BY component""".stripMargin),
    "q_explode_lateral" ->
      """SELECT doc_id, CAST(i - 1 AS INT) AS pos, w AS word
        |FROM (SELECT doc_id, unnest(string_split(lower(text),' ')) AS w,
        |             generate_subscripts(string_split(lower(text),' '),1) AS i
        |      FROM documents WHERE doc_id < 20)
        |ORDER BY doc_id, pos""".stripMargin,
    "q_regexp_groups" ->
      """SELECT c_custkey,
        |       regexp_extract(c_name, '#(\d+)', 1) AS cust_num,
        |       regexp_extract(c_name, '(Customer)#', 1) AS prefix,
        |       regexp_extract(c_name, '(zzz)(\d+)', 2) AS no_match
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "du_size_histogram" ->
      """WITH inv AS (
        |  SELECT CAST(user_id AS VARCHAR)||'/'||event_type||'/'||CAST(event_id AS VARCHAR) AS key,
        |         CAST(floor(value * 100) AS BIGINT) AS size FROM events),
        |agg AS (
        |  SELECT split_part(key,'/',1) AS address,
        |         CAST(SUM(size) AS BIGINT) AS size_bytes,
        |         COUNT(*) AS number_files
        |  FROM inv WHERE key LIKE '%/%' GROUP BY 1)
        |SELECT CASE WHEN size_bytes < 10000 THEN 'small'
        |            WHEN size_bytes < 50000 THEN 'medium'
        |            WHEN size_bytes < 100000 THEN 'large'
        |            ELSE 'huge' END AS band,
        |       COUNT(*) AS n_addresses,
        |       CAST(SUM(number_files) AS BIGINT) AS n_files
        |FROM agg GROUP BY 1 ORDER BY band""".stripMargin,
    "du_compaction_plan" ->
      // exclusive window prefix-sum (ROWS ... 1 PRECEDING) then integer
      // // by the byte target — the identical single-pass binning rule;
      // bin ids and sums exact integers end to end
      """WITH inv AS (
        |  SELECT event_type AS prefix, event_id AS fkey,
        |         CAST(floor(value * 100) AS BIGINT) AS sz FROM events),
        |c AS (
        |  SELECT prefix, fkey, sz,
        |         COALESCE(SUM(sz) OVER (PARTITION BY prefix ORDER BY fkey
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
        |  FROM inv)
        |SELECT prefix, CAST(bef // 1000000 AS BIGINT) AS bin_id,
        |       COUNT(*) AS n_files, CAST(SUM(sz) AS BIGINT) AS bytes,
        |       MIN(fkey) AS first_key, MAX(fkey) AS last_key
        |FROM c GROUP BY 1, 2 ORDER BY prefix, bin_id""".stripMargin,
    "du_prefix_rollup" ->
      // the q_rollup GROUPING-bitmask idiom over the inventory path levels
      """WITH inv AS (SELECT CAST(user_id AS VARCHAR) AS address,
        |                    event_type AS prefix2,
        |                    CAST(floor(value * 100) AS BIGINT) AS size
        |             FROM events)
        |SELECT COALESCE(address, '<all>') AS address,
        |       COALESCE(prefix2, '<all>') AS prefix2,
        |       CAST(GROUPING(address, prefix2) AS BIGINT) AS lvl,
        |       COUNT(*) AS n_objects,
        |       CAST(SUM(size) AS BIGINT) AS total_bytes
        |FROM inv GROUP BY ROLLUP (address, prefix2)
        |ORDER BY lvl, address, prefix2""".stripMargin,
    "du_tiering_plan" ->
      // the identical age routing against the newest write and the same
      // 100/40/10 rate card
      """WITH e AS (SELECT epoch_us(ts) AS ts_us,
        |                  CAST(floor(value * 100) AS BIGINT) AS size
        |           FROM events),
        |mx AS (SELECT MAX(ts_us) AS mx FROM e),
        |tiers AS (SELECT CASE WHEN (mx - ts_us) // 86400000000 < 7 THEN 'hot'
        |                      WHEN (mx - ts_us) // 86400000000 < 21 THEN 'warm'
        |                      ELSE 'cold' END AS tier,
        |                 (mx - ts_us) // 86400000000 AS age_days, size
        |          FROM e CROSS JOIN mx),
        |g AS (SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_objects,
        |             CAST(SUM(size) AS BIGINT) AS total_bytes,
        |             CAST(MIN(age_days) AS BIGINT) AS min_age_days,
        |             CAST(MAX(age_days) AS BIGINT) AS max_age_days
        |      FROM tiers GROUP BY 1)
        |SELECT tier, n_objects, total_bytes, min_age_days, max_age_days,
        |       total_bytes * (CASE WHEN tier = 'hot' THEN 100
        |                           WHEN tier = 'warm' THEN 40 ELSE 10 END)
        |         AS monthly_cost_micro
        |FROM g ORDER BY tier""".stripMargin,
    "du_orphan_audit" ->
      """WITH u AS (SELECT user_id AS addr, COUNT(*) AS n_objects,
        |                  CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS bytes
        |           FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT c_custkey AS addr, TRUE AS registered FROM customer),
        |j AS (SELECT u.addr AS uaddr, u.bytes, a.registered
        |      FROM u FULL OUTER JOIN a USING (addr))
        |SELECT CAST(COALESCE(SUM(CASE WHEN registered IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_orphan_addrs,
        |       CAST(COALESCE(SUM(CASE WHEN registered IS NULL THEN bytes ELSE 0 END), 0) AS BIGINT) AS orphan_bytes,
        |       CAST(COALESCE(SUM(CASE WHEN uaddr IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_idle_accounts,
        |       CAST(COALESCE(SUM(CASE WHEN registered IS NOT NULL AND uaddr IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_active_accounts
        |FROM j""".stripMargin,
    "du_top_objects_per_prefix" ->
      """WITH inv AS (
        |  SELECT event_type AS prefix, event_id AS key,
        |         CAST(floor(value * 100) AS BIGINT) AS size
        |  FROM events),
        |r AS (SELECT prefix, key, size,
        |             row_number() OVER (PARTITION BY prefix
        |               ORDER BY size DESC, key) AS rn
        |      FROM inv)
        |SELECT prefix, key, size FROM r WHERE rn <= 3
        |ORDER BY prefix, size DESC, key""".stripMargin,
    "du_growth_forecast" ->
      // daily totals then the five integer regression moments; slope as
      // sign·(10⁶·|num| // den) — the identical truncation-toward-zero
      // both engines land on; den = 0 (one active day) → NULL
      """WITH e AS (
        |  SELECT user_id,
        |         CAST(epoch_us(ts) // 86400000000 AS BIGINT) - 19723 AS x,
        |         CAST(floor(value * 100) AS BIGINT) AS v
        |  FROM events),
        |d AS (SELECT user_id, x, CAST(SUM(v) AS BIGINT) AS y
        |      FROM e GROUP BY 1, 2),
        |m AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_days,
        |             MIN(x) AS first_day, MAX(x) AS last_day,
        |             CAST(SUM(y) AS BIGINT) AS total,
        |             CAST(SUM(x) AS BIGINT) AS sx,
        |             CAST(SUM(x*y) AS BIGINT) AS sxy,
        |             CAST(SUM(x*x) AS BIGINT) AS sxx
        |      FROM d GROUP BY 1)
        |SELECT user_id, n_days, first_day, last_day, total,
        |       CASE WHEN n_days*sxx - sx*sx = 0 THEN NULL
        |            ELSE CAST(sign(n_days*sxy - sx*total) *
        |                 ((1000000 * abs(n_days*sxy - sx*total))
        |                   // (n_days*sxx - sx*sx)) AS BIGINT)
        |       END AS slope_e6
        |FROM m ORDER BY user_id""".stripMargin,
    "q_acf" ->
      // shared acfOracleCtes (n-scaled centered carrier, HUGEINT, lag
      // pairs as an equi-join on (key, b + lag), sign-safe ppm ratio)
      (acfOracleCtes +
        "\nSELECT event_type, lag_n, n_buckets, n_pairs, acf_ppm" +
        "\nFROM acf ORDER BY event_type, lag_n"),
    "q_ljung_box" ->
      // the same ACF chain folded to Q = n(n+2)·Σ r²/(n−ℓ); any
      // undefined OR gap-violating lag (n_buckets ≤ lag_n would make
      // the divisor non-positive) nulls the whole key, exactly like
      // the Spark side
      (acfOracleCtes + """
        |SELECT event_type, CAST(MIN(n_buckets) AS BIGINT) AS n_buckets,
        |       CAST(COUNT(*) AS BIGINT) AS h_lags,
        |       CAST(CASE WHEN COUNT(CASE WHEN acf_ppm IS NOT NULL
        |                 AND n_buckets > lag_n THEN 1 END) = COUNT(*) THEN
        |            (CAST(MIN(n_buckets) AS HUGEINT) * (MIN(n_buckets) + 2) *
        |             SUM(CASE WHEN n_buckets > lag_n THEN
        |                 (CAST(acf_ppm AS HUGEINT) * acf_ppm)
        |                 // (n_buckets - lag_n) END)) // 1000000
        |            END AS BIGINT) AS lb_q_ppm
        |FROM acf GROUP BY event_type ORDER BY event_type""".stripMargin),
    "du_robust_trend" ->
      // identical daily totals, HUGEINT-fenced sign-safe pair slopes,
      // sorted-list order statistics (even count halves the abs sum —
      // the truncation both engines share on non-negatives)
      """WITH e AS (
        |  SELECT user_id,
        |         CAST(epoch_us(ts) // 86400000000 AS BIGINT) - 19723 AS x,
        |         CAST(floor(value * 100) AS BIGINT) AS v
        |  FROM events),
        |d AS (SELECT user_id, x, CAST(SUM(v) AS BIGINT) AS y
        |      FROM e GROUP BY 1, 2),
        |p AS (SELECT a.user_id, CAST(sign(b.y - a.y) AS BIGINT) AS sgn,
        |             CAST(sign(b.y - a.y) AS BIGINT) *
        |               CAST((CAST(1000000 AS HUGEINT) *
        |                 abs(CAST(b.y AS HUGEINT) - a.y)) // (b.x - a.x)
        |                 AS BIGINT) AS slope_ppm
        |      FROM d a JOIN d b ON a.user_id = b.user_id AND b.x > a.x),
        |g AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |             CAST(SUM(sgn) AS BIGINT) AS mk_s,
        |             list_sort(list(slope_ppm)) AS sl
        |      FROM p GROUP BY 1),
        |nd AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_days
        |       FROM d GROUP BY 1)
        |SELECT nd.user_id, nd.n_days, COALESCE(g.n_pairs, 0) AS n_pairs,
        |       g.mk_s,
        |       CASE WHEN g.n_pairs IS NULL THEN NULL
        |            WHEN g.n_pairs % 2 = 1
        |              THEN sl[CAST(g.n_pairs // 2 + 1 AS INT)]
        |            ELSE CAST(sign(sl[CAST(g.n_pairs // 2 AS INT)] +
        |                   sl[CAST(g.n_pairs // 2 + 1 AS INT)]) AS BIGINT) *
        |                 (abs(sl[CAST(g.n_pairs // 2 AS INT)] +
        |                   sl[CAST(g.n_pairs // 2 + 1 AS INT)]) // 2)
        |       END AS ts_slope_ppm
        |FROM nd LEFT JOIN g USING (user_id) ORDER BY user_id""".stripMargin,
    "dedup_stats" -> (shingleCte +
      """SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
        |       (SELECT COUNT(*) FROM p
        |        JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b
        |        WHERE CAST(p.c AS DOUBLE)/(na.n+nb.n-p.c) >= 0.6) AS n_pairs,
        |       (SELECT COUNT(*) FROM documents WHERE doc_id NOT IN (
        |          SELECT p.b FROM p
        |          JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b
        |          WHERE CAST(p.c AS DOUBLE)/(na.n+nb.n-p.c) >= 0.6)) AS n_survivors""".stripMargin),
    "du_top_addresses" ->
      """WITH inv AS (
        |  SELECT CAST(user_id AS VARCHAR)||'/'||event_type||'/'||CAST(event_id AS VARCHAR) AS key,
        |         value AS size FROM events)
        |SELECT split_part(key,'/',1) AS address,
        |       CAST(SUM(CAST(size AS DECIMAL(18,4))) AS DOUBLE) AS size_bytes,
        |       COUNT(*) AS number_files
        |FROM inv WHERE key LIKE '%/%'
        |GROUP BY 1 ORDER BY size_bytes DESC, address LIMIT 20""".stripMargin,
    "text_ngrams_top" -> (shingleCte +
      """SELECT s AS shingle, COUNT(*) AS doc_freq
        |FROM sh GROUP BY s
        |ORDER BY doc_freq DESC, shingle LIMIT 20""".stripMargin),
    "split_assign" -> {
      val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      s"""SELECT doc_id, ${graft.operators.Splits.splitCaseSql("doc_id", splits)} AS split
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "split_stats" -> {
      val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      s"""SELECT ${graft.operators.Splits.splitCaseSql("doc_id", splits)} AS split,
         |       lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin
    },
    "split_sampled_agg_ht" ->
      // the identical md5-bucket membership predicate feeding conditional
      // sums, then the integer 256/32 Horvitz–Thompson inflation and the
      // realized error — all BIGINT
      """WITH l AS (
        |  SELECT l_returnflag, l_linestatus,
        |         CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v,
        |         substring(md5(CAST(l_orderkey*10+l_linenumber AS VARCHAR)),1,2) < '20'
        |           AS in_sample
        |  FROM lineitem),
        |g AS (
        |  SELECT l_returnflag, l_linestatus,
        |         CAST(COUNT(*) AS BIGINT) AS n_exact,
        |         CAST(SUM(v) AS BIGINT) AS sum_exact,
        |         CAST(SUM(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_sampled,
        |         CAST(SUM(CASE WHEN in_sample THEN v ELSE 0 END) AS BIGINT)
        |           AS sum_sampled
        |  FROM l GROUP BY 1, 2),
        |e AS (
        |  SELECT *, (n_sampled * 256) // 32 AS est_n,
        |         CAST(sign(sum_sampled) AS BIGINT)
        |           * ((abs(sum_sampled) * 256) // 32) AS est_sum
        |  FROM g)
        |SELECT l_returnflag, l_linestatus, n_exact, sum_exact, n_sampled,
        |       est_n, est_sum,
        |       CASE WHEN sum_exact <> 0
        |            THEN (1000000 * abs(est_sum - sum_exact)) // abs(sum_exact)
        |            END AS err_ppm
        |FROM e ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "split_bootstrap_ci" ->
      // the identical (id,replica)-keyed 5-hex md5 uniform inverted
      // through the integer Poisson(1) CDF thresholds, replica means as
      // sign-safe ppm divisions, CI = floor-rank order statistics
      """WITH v AS (
        |  SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS rid,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        |  FROM lineitem),
        |wts AS (
        |  SELECT r.j, v.x,
        |         CAST(('0x' || substring(md5(CAST(v.rid AS VARCHAR) || ':' ||
        |           CAST(r.j AS VARCHAR)), 1, 5)) AS BIGINT) AS u
        |  FROM v CROSS JOIN range(0, 40) r(j)),
        |w2 AS (
        |  SELECT j, x,
        |         CASE WHEN u < 385750 THEN 0 WHEN u < 771499 THEN 1
        |              WHEN u < 964374 THEN 2 WHEN u < 1028665 THEN 3
        |              WHEN u < 1044738 THEN 4 WHEN u < 1047953 THEN 5
        |              ELSE 6 END AS w
        |  FROM wts),
        |reps AS (
        |  SELECT j, CAST(SUM(w) AS BIGINT) AS sw,
        |         SUM(w * x) AS swx
        |  FROM w2 GROUP BY j),
        |means AS (
        |  -- HUGEINT floor-division: DECIMAL // would ROUND where Spark's
        |  -- decimal div floors
        |  SELECT j, CASE WHEN sw > 0
        |         THEN CAST(sign(swx) AS BIGINT) *
        |              CAST((CAST(1000000 AS HUGEINT) * abs(CAST(swx AS HUGEINT)))
        |                // sw AS BIGINT)
        |         ELSE 0 END AS mean_ppm
        |  FROM reps),
        |ranked AS (
        |  SELECT mean_ppm, ROW_NUMBER() OVER (ORDER BY mean_ppm, j) AS rk
        |  FROM means),
        |ci AS (
        |  SELECT MIN(CASE WHEN rk = 2 THEN mean_ppm END) AS lo_ppm,
        |         MIN(CASE WHEN rk = 39 THEN mean_ppm END) AS hi_ppm
        |  FROM ranked),
        |ex AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |         CAST(sign(SUM(x)) AS BIGINT) *
        |           CAST((CAST(1000000 AS HUGEINT) *
        |             abs(CAST(SUM(x) AS HUGEINT))) // COUNT(*) AS BIGINT)
        |           AS mean_ppm
        |  FROM v)
        |SELECT CAST(40 AS BIGINT) AS b_reps, ex.n_rows, ex.mean_ppm,
        |       ci.lo_ppm, ci.hi_ppm
        |FROM ex CROSS JOIN ci""".stripMargin,
    "split_stratified" -> {
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE ${graft.operators.Splits.stratifiedSampleSql("doc_id", "lang", Map("en" -> 0.5))}
         |ORDER BY doc_id""".stripMargin
    },
    "split_negative_pairs" ->
      s"""WITH mx AS (SELECT MIN(doc_id) AS min_id, MAX(doc_id) AS max_id FROM documents),
         |c AS (
         |  SELECT d.doc_id, u.k_idx,
         |         mx.min_id + ${graft.operators.Splits.negativeCandidateSql("d.doc_id", "u.k_idx")}
         |           % (mx.max_id - mx.min_id + 1) AS neg_id
         |  FROM documents d CROSS JOIN mx,
         |       (SELECT unnest([0,1,2,3]) AS k_idx) u)
         |SELECT doc_id, CAST(k_idx AS BIGINT) AS k_idx, neg_id
         |FROM c
         |WHERE neg_id <> doc_id
         |  AND neg_id IN (SELECT doc_id FROM documents)
         |ORDER BY doc_id, k_idx""".stripMargin,
    "split_pack_batches" ->
      s"""WITH d AS (
        |  SELECT doc_id, lang,
        |         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
        |         ${graft.operators.Splits.packShardSql("doc_id", 8)} AS shard
        |  FROM documents),
        |c AS (
        |  SELECT lang, shard, n_tokens,
        |         SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d),
        |lb AS (
        |  SELECT lang, shard, n_tokens,
        |         (cum - n_tokens) // 2048 AS local_batch
        |  FROM c),
        |offs AS (
        |  SELECT lang, shard,
        |         COALESCE(SUM(MAX(local_batch) + 1) OVER (PARTITION BY lang
        |           ORDER BY shard ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) AS batch_offset
        |  FROM lb GROUP BY lang, shard)
        |SELECT lb.lang,
        |       CAST(o.batch_offset + lb.local_batch AS BIGINT) AS batch_id,
        |       COUNT(*) AS n_docs, CAST(SUM(lb.n_tokens) AS BIGINT) AS batch_tokens
        |FROM lb JOIN offs o ON lb.lang = o.lang AND lb.shard = o.shard
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "split_curriculum" ->
      // the text_quality score chain (identical expression order) feeding
      // the split_pack_batches window replay, stratified by difficulty
      s"""WITH q AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(lower(text),' ')) AS BIGINT) AS n_tokens,
         |         CAST(length(regexp_replace(lower(text),'[^a-z]','','g')) AS DOUBLE)/CAST(length(text) AS BIGINT) AS alpha_ratio
         |  FROM documents),
         |d AS (
         |  SELECT doc_id, n_tokens,
         |         CAST(FLOOR(ROUND(least(1.0, CAST(n_tokens AS DOUBLE)/100.0)*0.5 + alpha_ratio*0.5, 6) * 10) AS BIGINT) AS difficulty,
         |         ${graft.operators.Splits.packShardSql("doc_id", 8)} AS shard
         |  FROM q),
         |c AS (
         |  SELECT difficulty, shard, n_tokens,
         |         SUM(n_tokens) OVER (PARTITION BY difficulty, shard ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM d),
         |lb AS (
         |  SELECT difficulty, shard, n_tokens,
         |         (cum - n_tokens) // 2048 AS local_batch
         |  FROM c),
         |offs AS (
         |  SELECT difficulty, shard,
         |         COALESCE(SUM(MAX(local_batch) + 1) OVER (PARTITION BY difficulty
         |           ORDER BY shard ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |           0) AS batch_offset
         |  FROM lb GROUP BY difficulty, shard)
         |SELECT lb.difficulty,
         |       CAST(o.batch_offset + lb.local_batch AS BIGINT) AS batch_id,
         |       COUNT(*) AS n_docs, CAST(SUM(lb.n_tokens) AS BIGINT) AS batch_tokens
         |FROM lb JOIN offs o ON lb.difficulty = o.difficulty AND lb.shard = o.shard
         |GROUP BY 1, 2 ORDER BY lb.difficulty DESC, batch_id""".stripMargin,
    "du_snapshot_delta" ->
      """WITH inv AS (
        |  SELECT event_id,
        |         CAST(event_id AS VARCHAR)||'/'||event_type AS key,
        |         value AS size FROM events),
        |y AS (
        |  SELECT split_part(key,'/',1) AS address,
        |         CAST(SUM(CAST(size AS DECIMAL(18,4))) AS DOUBLE) AS size_bytes,
        |         COUNT(*) AS number_files
        |  FROM inv WHERE key LIKE '%/%' AND event_id % 3 <> 0 GROUP BY 1),
        |t AS (
        |  SELECT split_part(key,'/',1) AS address,
        |         CAST(SUM(CAST(size AS DECIMAL(18,4))) AS DOUBLE) AS size_bytes,
        |         COUNT(*) AS number_files
        |  FROM inv WHERE key LIKE '%/%' AND event_id % 3 <> 1 GROUP BY 1)
        |SELECT COALESCE(t.address, y.address) AS address,
        |       COALESCE(t.size_bytes, 0) - COALESCE(y.size_bytes, 0) AS growth_bytes,
        |       COALESCE(t.number_files, 0) - COALESCE(y.number_files, 0) AS growth_files
        |FROM y FULL OUTER JOIN t ON y.address = t.address
        |ORDER BY address""".stripMargin,
    "du_incremental_merge" ->
      // the FULL recompute: the semantic claim is merge(partials) == this
      """WITH inv AS (
        |  SELECT CAST(user_id AS VARCHAR)||'/'||event_type||'/'||CAST(event_id AS VARCHAR) AS key,
        |         value AS size FROM events)
        |SELECT split_part(key,'/',1) AS address,
        |       CAST(SUM(CAST(size AS DECIMAL(18,4))) AS DOUBLE) AS size_bytes,
        |       COUNT(*) AS number_files
        |FROM inv WHERE key LIKE '%/%'
        |GROUP BY 1 ORDER BY address""".stripMargin,
    "du_salted_agg" ->
      """WITH inv AS (
        |  SELECT CAST(user_id AS VARCHAR)||'/'||event_type||'/'||CAST(event_id AS VARCHAR) AS key,
        |         CAST(floor(value * 100) AS BIGINT) AS size FROM events)
        |SELECT split_part(key,'/',1) AS address,
        |       CAST(SUM(size) AS BIGINT) AS size_bytes,
        |       COUNT(*) AS number_files
        |FROM inv WHERE key LIKE '%/%'
        |GROUP BY 1 ORDER BY address""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |       CAST(len(list_distinct(string_split(lower(text),' '))) AS BIGINT) AS n_unique_tokens,
        |       CAST(len(regexp_extract_all(lower(text),'[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
        |       CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH q AS (
        |  SELECT doc_id,
        |         CAST(length(text) AS BIGINT) AS n_chars,
        |         CAST(len(string_split(lower(text),' ')) AS BIGINT) AS n_tokens,
        |         CAST(length(regexp_replace(lower(text),'[^a-z]','','g')) AS DOUBLE)/CAST(length(text) AS BIGINT) AS alpha_ratio,
        |         CAST(length(regexp_replace(text,'[^ ]','','g')) AS DOUBLE)/CAST(length(text) AS BIGINT) AS ws_ratio,
        |         CAST(len(list_filter(string_split(lower(text),' '), w -> w IN ('the','a','of','and','to','in','is'))) AS DOUBLE)/len(string_split(lower(text),' ')) AS stopword_ratio
        |  FROM documents)
        |SELECT doc_id, n_chars, n_tokens, alpha_ratio, ws_ratio, stopword_ratio,
        |       ROUND(least(1.0, CAST(n_tokens AS DOUBLE)/100.0)*0.5 + alpha_ratio*0.5, 6) AS quality_score
        |FROM q ORDER BY doc_id""".stripMargin,
    "text_langid" -> (langidCtes +
      """SELECT doc_id, c_de, c_en, c_es, c_fr, actual_lang, predicted_lang
        |FROM p ORDER BY doc_id""".stripMargin),
    "text_lang_confusion" -> (langidCtes +
      // the language-ID EVALUATION: actual × predicted cell counts — the
      // number that says whether the heuristic is shippable per language
      """SELECT actual_lang, predicted_lang, COUNT(*) AS n
        |FROM p GROUP BY 1, 2 ORDER BY actual_lang, predicted_lang""".stripMargin),
    "text_corpus_datasheet" ->
      """SELECT COUNT(*) AS n_docs,
        |       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        |       CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT) AS total_tokens,
        |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
        |       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
        |       CAST((SUM(n_chars) * 100) // COUNT(*) AS BIGINT) AS mean_chars_x100
        |FROM documents""".stripMargin,
    "text_fingerprint" ->
      """WITH t AS (
        |  SELECT doc_id, lower(text) AS norm, string_split(lower(text),' ') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, norm, i, md5(w[i+1]||' '||w[i+2]||' '||w[i+3]) AS h
        |  FROM (SELECT doc_id, norm, w, unnest(range(len(w)-2)) AS i FROM t WHERE len(w) >= 3)),
        |m AS (
        |  SELECT doc_id, norm,
        |         min(h) OVER (PARTITION BY doc_id ORDER BY i
        |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS win_min
        |  FROM g)
        |SELECT doc_id,
        |       CAST(COUNT(DISTINCT win_min) AS BIGINT) AS n_fingerprints,
        |       MIN(win_min) AS min_fingerprint,
        |       md5(MIN(norm)) AS doc_md5
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_score_calibrate" ->
      // the identical per-source rank window (ties share), integer
      // percentile, derived decile
      """WITH d AS (SELECT doc_id, source, n_chars AS score FROM documents),
        |r AS (SELECT doc_id, source, score,
        |             rank() OVER (PARTITION BY source ORDER BY score) AS rk,
        |             COUNT(*) OVER (PARTITION BY source) AS n
        |      FROM d),
        |p AS (SELECT doc_id, source, CAST(score AS BIGINT) AS score,
        |             CAST(CASE WHEN n > 1 THEN ((rk - 1) * 1000000) // (n - 1)
        |                       ELSE 0 END AS BIGINT) AS pct_ppm
        |      FROM r)
        |SELECT doc_id, source, score, pct_ppm,
        |       CAST(least(9, pct_ppm // 100000) AS BIGINT) AS calib_decile
        |FROM p ORDER BY doc_id""".stripMargin,
    "text_score_calibrate_hist" ->
      // the identical lower-order-statistic boundaries (the
      // q_group_quantiles_scalable rank formula) and the same
      // boundaries-≤-score decile count
      """WITH d AS (SELECT doc_id, source, n_chars AS score FROM documents),
        |v AS (SELECT source, CAST(round(n_chars * 1000000, 0) AS BIGINT) AS v
        |      FROM documents),
        |s AS (SELECT source, list(v ORDER BY v) AS lst, COUNT(*) AS n
        |      FROM v GROUP BY 1),
        |qs AS (SELECT CAST(unnest([100000,200000,300000,400000,500000,
        |                           600000,700000,800000,900000]) AS BIGINT)
        |         AS q_ppm),
        |bounds AS (SELECT s.source,
        |                  lst[CAST(floor((qs.q_ppm / 1000000.0) * (s.n - 1))
        |                      AS BIGINT) + 1] AS bv
        |           FROM s CROSS JOIN qs)
        |SELECT d.doc_id, d.source, CAST(d.score AS BIGINT) AS score,
        |       CAST(SUM(CASE WHEN b.bv <= CAST(round(d.score * 1000000, 0) AS BIGINT)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS calib_decile
        |FROM d JOIN bounds b ON b.source = d.source
        |GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin,
    "pipeline_prep" -> (shingleCte + {
      val splitCase = graft.operators.Splits.splitCaseSql(
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      s""", dropped AS (
         |  SELECT DISTINCT p.b AS doc_id
         |  FROM p JOIN nn na ON na.doc_id=p.a JOIN nn nb ON nb.doc_id=p.b
         |  WHERE CAST(p.c AS DOUBLE)/(na.n+nb.n-p.c) >= 0.6),
         |q AS (
         |  SELECT doc_id, lang,
         |         CAST(len(string_split(lower(text),' ')) AS BIGINT) AS n_tokens,
         |         CAST(length(regexp_replace(lower(text),'[^a-z]','','g')) AS DOUBLE)/CAST(length(text) AS BIGINT) AS alpha_ratio
         |  FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),
         |sc AS (
         |  SELECT doc_id, lang, n_tokens,
         |         ROUND(least(1.0, CAST(n_tokens AS DOUBLE)/100.0)*0.5 + alpha_ratio*0.5, 6) AS quality_score
         |  FROM q)
         |SELECT doc_id, $splitCase AS split, lang, n_tokens, quality_score
         |FROM sc WHERE quality_score >= 0.55 ORDER BY doc_id""".stripMargin
    }),
    "text_scrub" -> {
      // interpolate the shared pattern constants — the oracle must follow
      // any future pattern change automatically
      val em = TextAnalysis.EmailPattern
      val url = TextAnalysis.UrlPattern
      s"""WITH raw AS (
         |  SELECT event_id,
         |         'user u'||CAST(user_id AS VARCHAR)||' mail u'||CAST(user_id AS VARCHAR)||'@mail.example'||
         |         ' see http://site.example/e/'||CAST(event_id AS VARCHAR)||' type '||event_type AS text
         |  FROM events)
         |SELECT event_id,
         |       regexp_replace(regexp_replace(text, '$url', '<URL>', 'g'),
         |                      '$em', '<EMAIL>', 'g') AS scrubbed,
         |       CAST(len(regexp_extract_all(text, '$em')) AS BIGINT) AS n_emails,
         |       CAST(len(regexp_extract_all(text, '$url')) AS BIGINT) AS n_urls
         |FROM raw ORDER BY event_id""".stripMargin
    },
    "text_cms_counts" ->
      // full sketch replay: same per-row md5 bucket hash, same d x w
      // counter build, same min-over-rows probe
      """WITH tok AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents),
        |js AS (SELECT unnest([0, 1, 2]) AS j),
        |cells AS (
        |  SELECT js.j,
        |         CAST(('0x'||substring(md5(CAST(js.j AS VARCHAR)||':'||t),1,4)) AS BIGINT) % 64 AS b,
        |         COUNT(*) AS n
        |  FROM tok CROSS JOIN js GROUP BY 1, 2),
        |probes(token) AS (VALUES ('table'), ('query'), ('the'), ('vector'),
        |                         ('customer'), ('scan'), ('merge'), ('zebra')),
        |e AS (
        |  SELECT p.token, js.j,
        |         CAST(('0x'||substring(md5(CAST(js.j AS VARCHAR)||':'||p.token),1,4)) AS BIGINT) % 64 AS b
        |  FROM probes p CROSS JOIN js),
        |l AS (SELECT e.token, COALESCE(c.n, 0) AS n
        |      FROM e LEFT JOIN cells c ON c.j = e.j AND c.b = e.b)
        |SELECT token, CAST(MIN(n) AS BIGINT) AS est_count
        |FROM l GROUP BY token ORDER BY token""".stripMargin,
    "split_leakage_audit" -> {
      val sc = graft.operators.Splits.splitCaseSql("doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      s"""WITH v AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 10 = 0
         |              THEN 'leak '||CAST(doc_id//20 AS VARCHAR)
         |              ELSE text END AS text
         |  FROM documents),
         |a AS (
         |  SELECT md5(nfc_normalize(regexp_replace(trim(lower(text)),
         |           '[ \t\n\r]+', ' ', 'g'))) AS k,
         |         $sc AS split
         |  FROM v),
         |g AS (SELECT k, COUNT(*) AS n, COUNT(DISTINCT split) AS n_splits,
         |             MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS has_train,
         |             SUM(CASE WHEN split <> 'train' THEN 1 ELSE 0 END) AS n_eval
         |      FROM a GROUP BY 1)
         |SELECT CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_dup_groups,
         |       CAST(SUM(CASE WHEN n >= 2 AND n_splits >= 2 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_cross_split_groups,
         |       CAST(SUM(CASE WHEN n >= 2 AND n_splits >= 2 THEN n ELSE 0 END)
         |         AS BIGINT) AS n_leaky_docs,
         |       CAST(SUM(CASE WHEN n >= 2 AND has_train = 1 THEN n_eval ELSE 0 END)
         |         AS BIGINT) AS n_eval_contaminated
         |FROM g""".stripMargin
    },
    "split_cluster_assign" -> {
      // recursive exact-Jaccard components (the dedup_components chain),
      // then the split hashes off the canonical cluster label
      val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      componentsOracleCtes +
        s""",comp AS (SELECT node AS doc_id, MIN(lbl) AS component
           |          FROM reach GROUP BY node)
           |SELECT d.doc_id,
           |       CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS group_id,
           |       ${graft.operators.Splits.splitCaseSql(
                     "COALESCE(c.component, d.doc_id)", splits)} AS split
           |FROM documents d LEFT JOIN comp c USING (doc_id)
           |ORDER BY doc_id""".stripMargin
    },
    "split_kfold" ->
      s"""SELECT ${graft.operators.Splits.kfoldSql("doc_id", 5)} AS fold, lang,
         |       COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM documents GROUP BY 1, 2 ORDER BY fold, lang""".stripMargin,
    "q_pagerank" -> (
      """WITH e0 AS (
        |  SELECT DISTINCT l_orderkey AS a, l_partkey + 1000000000 AS b FROM lineitem)
        |""".stripMargin + pageRankOracleIters +
      """SELECT node, r AS rank FROM r3
        |ORDER BY rank DESC, node LIMIT 100""".stripMargin),
    "q_triangle_counts" ->
      // the same orientation + wedge-close replayed relationally; each
      // triangle's orientation-minimal vertex fans out to the other two,
      // so COUNT(*) per exploded corner is exact with no /3
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS MATERIALIZED (SELECT DISTINCT least(x.p, y.p) AS a, greatest(x.p, y.p) AS b
        |       FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
        |deg AS MATERIALIZED (SELECT n, COUNT(*) AS d
        |        FROM (SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0)
        |        GROUP BY 1),
        |o AS MATERIALIZED (SELECT CASE WHEN (da.d, a) < (db.d, b) THEN a ELSE b END AS src,
        |             CASE WHEN (da.d, a) < (db.d, b) THEN b ELSE a END AS dst
        |      FROM e0 JOIN deg da ON da.n = e0.a JOIN deg db ON db.n = e0.b),
        |w AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w2
        |      FROM o e1 JOIN o e2 ON e1.src = e2.src AND e1.dst < e2.dst),
        |tri AS (SELECT u, v, w2 FROM w
        |        JOIN e0 ON e0.a = least(w.v, w.w2) AND e0.b = greatest(w.v, w.w2)),
        |corners AS (SELECT unnest([u, v, w2]) AS node FROM tri)
        |SELECT node, COUNT(*) AS n_triangles
        |FROM corners GROUP BY 1
        |ORDER BY n_triangles DESC, node LIMIT 50""".stripMargin,
    "q_clustering_coeff" ->
      // the triangle chain (orientation + sorted wedge close) plus the
      // degree frame, left-joined so zero-triangle nodes keep their row
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS MATERIALIZED (SELECT DISTINCT least(x.p, y.p) AS a, greatest(x.p, y.p) AS b
        |       FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
        |deg AS MATERIALIZED (SELECT n, COUNT(*) AS d
        |        FROM (SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0)
        |        GROUP BY 1),
        |o AS MATERIALIZED (SELECT CASE WHEN (da.d, a) < (db.d, b) THEN a ELSE b END AS src,
        |             CASE WHEN (da.d, a) < (db.d, b) THEN b ELSE a END AS dst
        |      FROM e0 JOIN deg da ON da.n = e0.a JOIN deg db ON db.n = e0.b),
        |w AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w2
        |      FROM o e1 JOIN o e2 ON e1.src = e2.src AND e1.dst < e2.dst),
        |tri AS (SELECT u, v, w2 FROM w
        |        JOIN e0 ON e0.a = least(w.v, w.w2) AND e0.b = greatest(w.v, w.w2)),
        |corners AS (SELECT unnest([u, v, w2]) AS node FROM tri),
        |tc AS (SELECT node, COUNT(*) AS n_triangles FROM corners GROUP BY 1)
        |SELECT deg.n AS node, CAST(deg.d AS BIGINT) AS deg,
        |       CAST(COALESCE(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
        |       CAST(CASE WHEN deg.d >= 2
        |            THEN (2000000 * COALESCE(tc.n_triangles, 0))
        |                 // (deg.d * (deg.d - 1)) END AS BIGINT) AS cc_ppm
        |FROM deg LEFT JOIN tc ON tc.node = deg.n
        |ORDER BY node""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s1 AS (SELECT user_id, MIN(ts_us) AS t FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts_us) AS t
        |       FROM e JOIN s1 ON s1.user_id = e.user_id AND e.ts_us > s1.t
        |       WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(e.ts_us) AS t
        |       FROM e JOIN s2 ON s2.user_id = e.user_id AND e.ts_us > s2.t
        |       WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
        |       (SELECT COUNT(*) FROM s1) AS n_users
        |UNION ALL SELECT CAST(2 AS BIGINT), 'click', (SELECT COUNT(*) FROM s2)
        |UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', (SELECT COUNT(*) FROM s3)
        |ORDER BY step_idx""".stripMargin,
    "q_retention_cohorts" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS week FROM events),
        |c AS (SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY 1)
        |SELECT c.cohort_week, e.week - c.cohort_week AS age_weeks,
        |       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM e JOIN c ON c.user_id = e.user_id
        |GROUP BY 1, 2 ORDER BY cohort_week, age_weeks""".stripMargin,
    "q_merge_upsert" ->
      """WITH base AS (
        |  SELECT event_id, value AS base_value FROM events WHERE event_id % 3 <> 0),
        |delta AS (
        |  SELECT event_id, value * 2 AS delta_value FROM events WHERE event_id % 5 = 0)
        |SELECT COALESCE(b.event_id, d.event_id) AS event_id,
        |       CASE WHEN b.event_id IS NULL THEN 'insert'
        |            WHEN d.event_id IS NULL THEN 'keep'
        |            ELSE 'update' END AS op,
        |       COALESCE(d.delta_value, b.base_value) AS value
        |FROM base b FULL OUTER JOIN delta d ON d.event_id = b.event_id
        |ORDER BY event_id""".stripMargin,
    "q_gap_fill" ->
      """WITH e AS (SELECT epoch_us(ts) // 3600000000 AS hour_idx, value FROM events),
        |b AS (SELECT hour_idx, COUNT(*) AS n_events,
        |             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |      FROM e GROUP BY 1),
        |g AS (SELECT unnest(generate_series((SELECT MIN(hour_idx) FROM b),
        |                                    (SELECT MAX(hour_idx) FROM b))) AS hour_idx)
        |SELECT g.hour_idx, COALESCE(b.n_events, 0) AS n_events,
        |       COALESCE(b.total_value, 0.0) AS total_value
        |FROM g LEFT JOIN b ON b.hour_idx = g.hour_idx
        |ORDER BY g.hour_idx""".stripMargin,
    "q_mase_eval" ->
      // identical hourly sums, row lags over the ordered buckets, and
      // the same integer MAE/ratio forms on the both-defined support
      """WITH e AS (SELECT epoch_us(ts) // 3600000000 AS bucket,
        |                  CAST(value AS DECIMAL(18,4)) AS dv
        |           FROM events),
        |b AS (SELECT bucket, CAST(SUM(dv) * 10000 AS BIGINT) AS v
        |      FROM e GROUP BY 1),
        |l AS (SELECT bucket, v,
        |             lag(v, 1) OVER (ORDER BY bucket) AS p,
        |             lag(v, 24) OVER (ORDER BY bucket) AS sn
        |      FROM b),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
        |             CAST(SUM(abs(v - p)) AS BIGINT) AS sae_persist,
        |             CAST(SUM(abs(v - sn)) AS BIGINT) AS sae_seasonal
        |      FROM l WHERE sn IS NOT NULL)
        |SELECT n_eval,
        |       CAST(sae_persist // n_eval AS BIGINT) AS mae_persist,
        |       CAST(sae_seasonal // n_eval AS BIGINT) AS mae_seasonal,
        |       CAST(CASE WHEN sae_seasonal <> 0
        |            THEN (1000000 * sae_persist) // sae_seasonal END AS BIGINT)
        |         AS mase_ppm
        |FROM s""".stripMargin,
    "q_cusum_changepoints" ->
      // the identical decimal-fenced hourly sums, integer scaled CUSUM
      // over the bucketed series, two one-row globals for the peak pick
      """WITH e AS (SELECT epoch_us(ts) // 3600000000 AS bucket,
        |                  CAST(value AS DECIMAL(18,4)) AS dv
        |           FROM events),
        |b AS (SELECT bucket, CAST(SUM(dv) * 10000 AS BIGINT) AS v
        |      FROM e GROUP BY 1),
        |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |              CAST(SUM(v) AS BIGINT) AS t
        |       FROM b),
        |st AS (SELECT bucket, v,
        |              n * SUM(v) OVER (ORDER BY bucket
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              - row_number() OVER (ORDER BY bucket) * t AS cusum_n
        |       FROM b CROSS JOIN tt),
        |mx AS (SELECT MAX(abs(cusum_n)) AS mx FROM st),
        |pb AS (SELECT MIN(bucket) AS pb
        |       FROM st CROSS JOIN mx WHERE abs(cusum_n) = mx)
        |SELECT bucket, v, CAST(cusum_n AS BIGINT) AS cusum_n,
        |       (bucket = pb) AS is_changepoint
        |FROM st CROSS JOIN pb ORDER BY bucket""".stripMargin,
    "q_survival_curve" ->
      // identical packed-factor folds: list elements are BIGINT
      // (n·2³² + (n−d)), the prepended 1000000 seeds the accumulator,
      // every step floors exactly like Spark's DIV
      """WITH lastd AS (
        |  SELECT user_id, MAX(epoch_us(ts) // 86400000000) AS d
        |  FROM events GROUP BY 1),
        |dt AS (SELECT d, COUNT(*) AS di FROM lastd GROUP BY 1),
        |risk AS MATERIALIZED (
        |  SELECT d, di,
        |         SUM(di) OVER (ORDER BY d DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ni,
        |         row_number() OVER (ORDER BY d) AS k
        |  FROM dt),
        |arr AS (SELECT list(CAST(ni * 4294967296 + (ni - di) AS BIGINT)
        |                    ORDER BY d) AS a
        |        FROM risk)
        |SELECT risk.d AS day, CAST(risk.ni AS BIGINT) AS n_risk,
        |       CAST(risk.di AS BIGINT) AS n_events,
        |       CAST(list_reduce(
        |         list_prepend(CAST(1000000 AS BIGINT), a[1:CAST(risk.k AS INT)]),
        |         (acc, x) -> (acc * (x % 4294967296)) // (x // 4294967296))
        |         AS BIGINT) AS surv_ppm
        |FROM risk, arr ORDER BY day""".stripMargin,
    "q_cusum_segments" ->
      // the same hourly series, two unrolled binary-segmentation levels
      // (each: keyed n·S_i windows → per-segment peak → split at pb),
      // then the final relabel/stat windows — [[cusumSegLevelSql]]
      ("""WITH e AS (SELECT epoch_us(ts) // 3600000000 AS bucket,
         |                  CAST(value AS DECIMAL(18,4)) AS dv
         |           FROM events),
         |s0 AS MATERIALIZED (
         |      SELECT bucket, CAST(SUM(dv) * 10000 AS BIGINT) AS v,
         |             CAST(0 AS BIGINT) AS seg
         |      FROM e GROUP BY 1),
         |""".stripMargin +
        cusumSegLevelSql("s0", "s1") + ",\n" +
        cusumSegLevelSql("s1", "s2") + """
         |SELECT bucket, v, segment, seg_n, CAST(seg_sum AS BIGINT) AS seg_sum,
         |       (bucket = segment) AS is_boundary
         |FROM (SELECT bucket, v,
         |             MIN(bucket) OVER (PARTITION BY seg) AS segment,
         |             COUNT(*) OVER (PARTITION BY seg) AS seg_n,
         |             SUM(v) OVER (PARTITION BY seg) AS seg_sum
         |      FROM s2)
         |ORDER BY bucket""".stripMargin),
    "q_seasonal_decompose" -> (seasonalOracleCtes +
      """
        |SELECT bucket, v, CAST(phase AS BIGINT) AS phase,
        |       CAST(trend_e6 AS BIGINT) AS trend_e6,
        |       CAST(seasonal_e6 AS BIGINT) AS seasonal_e6,
        |       CAST(det_e6 - seasonal_e6 AS BIGINT) AS residual_e6
        |FROM t3 LEFT JOIN seas USING (phase) ORDER BY bucket""".stripMargin),
    "q_seasonal_anomalies" -> (seasonalOracleCtes +
      // the decompose chain + the q_mad_outliers doubled-median Hampel
      // algebra on the residuals (edge buckets have no residual — not
      // judged, absent by contract)
      """,
        |r AS MATERIALIZED (
        |  SELECT t3.bucket, t3.v,
        |         CAST(t3.det_e6 - seas.seasonal_e6 AS BIGINT) AS residual_e6
        |  FROM t3 JOIN seas USING (phase) WHERE t3.det_e6 IS NOT NULL),
        |m AS (SELECT CAST(median(residual_e6) * 2 AS BIGINT) AS med2 FROM r),
        |dd AS MATERIALIZED (
        |  SELECT r.bucket, r.v, r.residual_e6, m.med2,
        |         abs(r.residual_e6 * 2 - m.med2) AS dev
        |  FROM r, m),
        |dm AS (SELECT CAST(median(dev) * 2 AS BIGINT) AS dmed2 FROM dd)
        |SELECT dd.bucket, dd.v, dd.residual_e6, dd.med2, dm.dmed2,
        |       (dd.dev * 2 > dm.dmed2 * 3) AS is_anomaly
        |FROM dd, dm ORDER BY bucket""".stripMargin),
    "q_cusum_segments_by_key" ->
      // per-user daily totals seeded seg=0, two unrolled per-(key, seg)
      // segmentation levels, keyed relabel/stat windows
      ("""WITH e AS (SELECT user_id AS key,
         |                  epoch_us(ts) // 86400000000 AS bucket,
         |                  CAST(value AS DECIMAL(18,4)) AS dv
         |           FROM events),
         |s0 AS MATERIALIZED (
         |      SELECT key, bucket, CAST(SUM(dv) * 10000 AS BIGINT) AS v,
         |             CAST(0 AS BIGINT) AS seg
         |      FROM e GROUP BY 1, 2),
         |""".stripMargin +
        cusumSegLevelSql("s0", "s1", Seq("key")) + ",\n" +
        cusumSegLevelSql("s1", "s2", Seq("key")) + """
         |SELECT key, bucket, v, segment, seg_n,
         |       CAST(seg_sum AS BIGINT) AS seg_sum,
         |       (bucket = segment) AS is_boundary
         |FROM (SELECT key, bucket, v,
         |             MIN(bucket) OVER (PARTITION BY key, seg) AS segment,
         |             COUNT(*) OVER (PARTITION BY key, seg) AS seg_n,
         |             SUM(v) OVER (PARTITION BY key, seg) AS seg_sum
         |      FROM s2)
         |ORDER BY key, bucket""".stripMargin),
    "q_cusum_by_key" ->
      // the same n·S_i algebra replayed PER KEY: per-user daily
      // decimal-fenced totals, per-key totals join, keyed prefix windows,
      // keyed max-|·| and smallest-bucket tie-break
      """WITH e AS (SELECT user_id AS key,
        |                  epoch_us(ts) // 86400000000 AS bucket,
        |                  CAST(value AS DECIMAL(18,4)) AS dv
        |           FROM events),
        |b AS MATERIALIZED (
        |      SELECT key, bucket, CAST(SUM(dv) * 10000 AS BIGINT) AS v
        |      FROM e GROUP BY 1, 2),
        |tt AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
        |              CAST(SUM(v) AS BIGINT) AS t
        |       FROM b GROUP BY 1),
        |st AS MATERIALIZED (
        |       SELECT b.key, b.bucket, b.v,
        |              tt.n * SUM(b.v) OVER (PARTITION BY b.key ORDER BY b.bucket
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              - row_number() OVER (PARTITION BY b.key ORDER BY b.bucket) * tt.t
        |                AS cusum_n
        |       FROM b JOIN tt USING (key)),
        |mx AS (SELECT key, MAX(abs(cusum_n)) AS mx FROM st GROUP BY 1),
        |pb AS (SELECT st.key, MIN(st.bucket) AS pb
        |       FROM st JOIN mx ON mx.key = st.key AND abs(st.cusum_n) = mx.mx
        |       GROUP BY 1)
        |SELECT st.key, st.bucket, st.v, CAST(st.cusum_n AS BIGINT) AS cusum_n,
        |       (st.bucket = pb.pb) AS is_changepoint
        |FROM st JOIN pb USING (key) ORDER BY key, bucket""".stripMargin,
    "q_cdc_compact" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value
        |           FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |                                   ORDER BY ts_us DESC, event_id DESC) AS rn
        |      FROM e)
        |SELECT user_id, event_type, ts_us AS last_ts_us,
        |       event_id AS last_event_id, value AS last_value
        |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "q_neighbor_jaccard" ->
      // wedge-counted intersections + inclusion–exclusion unions,
      // integer ppm — the bipartite ids are disjoint so a < b holds by
      // construction and canonicalization is a no-op
      """WITH e0 AS (SELECT DISTINCT l_orderkey AS a, l_partkey + 1000000000 AS b
        |            FROM lineitem),
        |adj AS (SELECT a AS n, b AS m FROM e0
        |        UNION ALL SELECT b AS n, a AS m FROM e0),
        |deg AS (SELECT n, COUNT(*) AS d FROM adj GROUP BY 1),
        |adjc AS (SELECT adj.n, adj.m FROM adj
        |         JOIN deg ON deg.n = adj.n AND deg.d <= 20),
        |w AS (SELECT x.m AS u, y.m AS v FROM adjc x JOIN adjc y
        |      ON x.n = y.n AND x.m < y.m),
        |cn AS (SELECT u, v, COUNT(*) AS n_common FROM w GROUP BY 1, 2)
        |SELECT cn.u, cn.v, cn.n_common,
        |       CAST((cn.n_common * 1000000) //
        |            (du.d + dv.d - cn.n_common) AS BIGINT) AS jaccard_ppm
        |FROM cn JOIN deg du ON du.n = cn.u JOIN deg dv ON dv.n = cn.v
        |ORDER BY jaccard_ppm DESC, u, v LIMIT 100""".stripMargin,
    "q_degree_assortativity" ->
      // both-orientations edge list, degrees joined onto each endpoint,
      // integer moment sums (CAST from HUGEINT), and the identical
      // fixed-order double expression rounded at 6 dp
      """WITH e0 AS (SELECT DISTINCT l_orderkey AS a, l_partkey + 1000000000 AS b
        |            FROM lineitem),
        |e AS (SELECT a AS src, b AS dst FROM e0
        |      UNION ALL SELECT b AS src, a AS dst FROM e0),
        |d AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1),
        |ed AS (SELECT ds.deg AS dsrc, dd.deg AS ddst
        |       FROM e JOIN d ds ON ds.src = e.src JOIN d dd ON dd.src = e.dst),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2,
        |             CAST(SUM(dsrc) AS BIGINT) AS s1,
        |             CAST(SUM(dsrc*ddst) AS BIGINT) AS s11,
        |             CAST(SUM(dsrc*dsrc) AS BIGINT) AS s2
        |      FROM ed)
        |SELECT m2, s1, s11, s2,
        |       ROUND((CAST(s11 AS DOUBLE)/m2
        |              - (CAST(s1 AS DOUBLE)/m2)*(CAST(s1 AS DOUBLE)/m2))
        |           / (CAST(s2 AS DOUBLE)/m2
        |              - (CAST(s1 AS DOUBLE)/m2)*(CAST(s1 AS DOUBLE)/m2)), 6)+0.0
        |         AS assortativity
        |FROM s""".stripMargin,
    "q_label_propagation" -> (
      """WITH e0 AS (
        |  SELECT DISTINCT l_orderkey AS a, l_partkey + 1000000000 AS b FROM lineitem),
        |""".stripMargin + lpOracleCtes + "\n" +
      """SELECT label, COUNT(*) AS n_members FROM l3
        |GROUP BY 1 ORDER BY n_members DESC, label LIMIT 50""".stripMargin),
    "q_modularity" -> (
      // LPA labels replayed (the shared l3 chain), then the Newman–Girvan
      // integer sufficient statistics: intra edges via two label joins on
      // the canonical edge list, Σd_c² via the community-keyed degree agg,
      // and ONE fixed-order double over exact BIGINTs
      """WITH e0 AS (
        |  SELECT DISTINCT l_orderkey AS a, l_partkey + 1000000000 AS b FROM lineitem),
        |""".stripMargin + lpOracleCtes + "," + """
        |ed AS (SELECT la.label AS la, lb.label AS lb
        |       FROM e0 JOIN l3 la ON la.n = e0.a JOIN l3 lb ON lb.n = e0.b),
        |s1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
        |              CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
        |                AS intra_edges
        |       FROM ed),
        |dc AS (SELECT c, COUNT(*) AS dc
        |       FROM (SELECT la AS c FROM ed UNION ALL SELECT lb FROM ed)
        |       GROUP BY 1),
        |s2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
        |              CAST(SUM(dc*dc) AS BIGINT) AS sum_dc2
        |       FROM dc)
        |SELECT m, intra_edges, n_communities, sum_dc2,
        |       ROUND(CAST(4*m*intra_edges - sum_dc2 AS DOUBLE)
        |           / CAST(4*m*m AS DOUBLE), 6)+0.0 AS modularity
        |FROM s1 CROSS JOIN s2""".stripMargin),
    "q_hits" -> (
      // three fenced half-step pairs replayed: decimal-exact contribution
      // sums, one-scalar L1 normalizers, ROUND(v/t, 12) — then the full
      // outer hub/auth stitch with zeros for the side a node never scores
      """WITH e0 AS (
        |  SELECT DISTINCT l_orderkey AS a, l_partkey + 1000000000 AS b FROM lineitem),
        |""".stripMargin + hitsOracleIters(3) + """
        |SELECT COALESCE(h.node, a.node) AS node,
        |       COALESCE(h.h, 0.0)+0.0 AS hub,
        |       COALESCE(a.a, 0.0)+0.0 AS auth
        |FROM h3 h FULL OUTER JOIN a3 a ON a.node = h.node
        |ORDER BY auth DESC, hub DESC, node LIMIT 100""".stripMargin),
    "q_ppr" -> (
      """WITH e0 AS (
        |  SELECT DISTINCT l_orderkey AS a, l_partkey + 1000000000 AS b FROM lineitem),
        |""".stripMargin + pprOracleIters(seed = 1000000000L, iters = 3) +
      """SELECT node, r AS rank FROM pr3
        |ORDER BY rank DESC, node LIMIT 50""".stripMargin),
    "q_kcore" -> (
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS MATERIALIZED (
        |       SELECT DISTINCT least(x.p, y.p) AS a, greatest(x.p, y.p) AS b
        |       FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
        |""".stripMargin + kCoreOracleRounds(k = 80, rounds = 5) + "\n" +
      """SELECT n AS node, COUNT(*) AS core_deg
        |FROM (SELECT a AS n FROM e5 UNION ALL SELECT b FROM e5)
        |GROUP BY 1 ORDER BY node""".stripMargin),
    "q_event_transitions" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
        |           FROM events),
        |p AS (SELECT user_id, event_type AS next_type,
        |             lag(event_type) OVER (PARTITION BY user_id
        |               ORDER BY ts_us, event_id) AS prev_type
        |      FROM e),
        |c AS (SELECT prev_type, next_type, COUNT(*) AS n FROM p
        |      WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |f AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_from
        |      FROM c GROUP BY 1)
        |SELECT c.prev_type, c.next_type, c.n,
        |       CAST((c.n * 1000000) // f.n_from AS BIGINT) AS p_ppm
        |FROM c JOIN f ON f.prev_type = c.prev_type
        |ORDER BY c.prev_type, next_type""".stripMargin,
    "q_kanon_audit" ->
      """WITH e AS (SELECT event_type,
        |                  (epoch_us(ts) // 3600000000) % 24 AS hour_of_day
        |           FROM events),
        |g AS (SELECT event_type, hour_of_day, COUNT(*) AS n
        |      FROM e GROUP BY 1, 2)
        |SELECT COUNT(*) AS n_groups,
        |       CAST(SUM(n) AS BIGINT) AS n_rows,
        |       CAST(MIN(n) AS BIGINT) AS min_group_size,
        |       CAST(SUM(CASE WHEN n < 50 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_violating_groups,
        |       CAST(SUM(CASE WHEN n < 50 THEN n ELSE 0 END) AS BIGINT)
        |         AS n_suppressed_rows
        |FROM g""".stripMargin,
    "q_ldiversity_audit" ->
      """WITH e AS (SELECT event_type,
        |                  (epoch_us(ts) // 3600000000) % 24 AS hour_of_day,
        |                  user_id
        |           FROM events),
        |g AS (SELECT event_type, hour_of_day, COUNT(*) AS n,
        |             COUNT(DISTINCT user_id) AS n_sensitive
        |      FROM e GROUP BY 1, 2)
        |SELECT COUNT(*) AS n_groups,
        |       CAST(SUM(n) AS BIGINT) AS n_rows,
        |       CAST(MIN(n_sensitive) AS BIGINT) AS min_l,
        |       CAST(SUM(CASE WHEN n_sensitive < 10 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_violating_groups,
        |       CAST(SUM(CASE WHEN n_sensitive < 10 THEN n ELSE 0 END) AS BIGINT)
        |         AS n_exposed_rows
        |FROM g""".stripMargin,
    "q_assoc_rules" ->
      // the same dedup'd incidence, canonical within-basket pair join,
      // support prune, and integer-ppm scores
      """WITH bi AS (SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
        |            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
        |nb AS (SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n_baskets FROM bi),
        |itn AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item FROM bi GROUP BY 1),
        |pr AS (SELECT x.item AS item_a, y.item AS item_b,
        |              CAST(COUNT(*) AS BIGINT) AS n_pair
        |       FROM bi x JOIN bi y ON x.basket = y.basket AND x.item < y.item
        |       GROUP BY 1, 2
        |       HAVING COUNT(*) >= 20)
        |SELECT pr.item_a, pr.item_b, pr.n_pair,
        |       na.n_item AS n_a, nb2.n_item AS n_b,
        |       (pr.n_pair * 1000000) // nb.n_baskets AS support_ppm,
        |       (pr.n_pair * 1000000) // na.n_item AS conf_ab_ppm,
        |       (pr.n_pair * 1000000) // nb2.n_item AS conf_ba_ppm,
        |       (pr.n_pair * nb.n_baskets * 1000000) // (na.n_item * nb2.n_item)
        |         AS lift_ppm
        |FROM pr JOIN itn na ON na.item = pr.item_a
        |        JOIN itn nb2 ON nb2.item = pr.item_b
        |        CROSS JOIN nb
        |ORDER BY lift_ppm DESC, item_a, item_b LIMIT 100""".stripMargin,
    "q_ess_weights" ->
      // the same Kish fold: HUGEINT carries (Σw)² natively in DuckDB,
      // mirroring Spark's DECIMAL(38,0) fence; div on non-negatives
      """WITH e AS (
        |  SELECT event_type,
        |         CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS w
        |  FROM events)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(w) AS BIGINT) AS sum_w,
        |       CAST(SUM(w*w) AS BIGINT) AS sum_w2,
        |       CAST((1000 * SUM(w) * SUM(w)) // SUM(w*w) AS BIGINT) AS ess_e3,
        |       CAST((1000000 * SUM(w) * SUM(w)) // (COUNT(*) * SUM(w*w)) AS BIGINT)
        |         AS ess_ratio_ppm
        |FROM e GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q_reliability_curve" ->
      // the text_quality score formula as ppm, is-English labels, ten
      // equal-width bins, truncating means on non-negatives
      """WITH q AS (
        |  SELECT doc_id, lang,
        |         CAST(ROUND(ROUND(least(1.0,
        |                CAST(len(string_split(lower(text),' ')) AS DOUBLE)/100.0)*0.5 +
        |              CAST(length(regexp_replace(lower(text),'[^a-z]','','g')) AS DOUBLE)
        |                / CAST(length(text) AS BIGINT) * 0.5, 6) * 1000000, 0) AS BIGINT)
        |           AS s,
        |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |b AS (SELECT least(9, (s * 10) // 1000000) AS bin, s, y FROM q)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(s) // COUNT(*) AS BIGINT) AS mean_score_ppm,
        |       CAST((1000000 * SUM(y)) // COUNT(*) AS BIGINT) AS frac_pos_ppm,
        |       CAST((1000000 * SUM(y)) // COUNT(*) - SUM(s) // COUNT(*) AS BIGINT)
        |         AS gap_ppm
        |FROM b GROUP BY 1 ORDER BY bin""".stripMargin,
    "q_score_auc" ->
      // the same ppm score + label, folded per DISTINCT score value:
      // u2 = Σ np·(2·cum_nn_below + nn) carries 2U so ties stay integral
      """WITH q AS (
        |  SELECT CAST(ROUND(ROUND(least(1.0,
        |                CAST(len(string_split(lower(text),' ')) AS DOUBLE)/100.0)*0.5 +
        |              CAST(length(regexp_replace(lower(text),'[^a-z]','','g')) AS DOUBLE)
        |                / CAST(length(text) AS BIGINT) * 0.5, 6) * 1000000, 0) AS BIGINT)
        |           AS s,
        |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |c AS (SELECT s, SUM(y) AS np, SUM(1 - y) AS nn FROM q GROUP BY 1),
        |u AS (SELECT s, np, nn,
        |             COALESCE(SUM(nn) OVER (ORDER BY s
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumnn
        |      FROM c)
        |SELECT CAST(SUM(np) AS BIGINT) AS n_pos, CAST(SUM(nn) AS BIGINT) AS n_neg,
        |       CAST(SUM(np * (2 * cumnn + nn)) AS BIGINT) AS u2,
        |       CAST((1000000 * SUM(np * (2 * cumnn + nn)))
        |            // (2 * SUM(np) * SUM(nn)) AS BIGINT) AS auc_ppm
        |FROM u""".stripMargin,
    "q_score_auc_by_source" ->
      // the keyed fold: every stage PARTITION BY the source key
      """WITH q AS (
        |  SELECT source AS key,
        |         CAST(ROUND(ROUND(least(1.0,
        |                CAST(len(string_split(lower(text),' ')) AS DOUBLE)/100.0)*0.5 +
        |              CAST(length(regexp_replace(lower(text),'[^a-z]','','g')) AS DOUBLE)
        |                / CAST(length(text) AS BIGINT) * 0.5, 6) * 1000000, 0) AS BIGINT)
        |           AS s,
        |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |c AS (SELECT key, s, SUM(y) AS np, SUM(1 - y) AS nn
        |      FROM q GROUP BY 1, 2),
        |u AS (SELECT key, s, np, nn,
        |             COALESCE(SUM(nn) OVER (PARTITION BY key ORDER BY s
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumnn
        |      FROM c)
        |SELECT key, CAST(SUM(np) AS BIGINT) AS n_pos,
        |       CAST(SUM(nn) AS BIGINT) AS n_neg,
        |       CAST(SUM(np * (2 * cumnn + nn)) AS BIGINT) AS u2,
        |       CAST(CASE WHEN SUM(np) > 0 AND SUM(nn) > 0
        |            THEN (1000000 * SUM(np * (2 * cumnn + nn)))
        |                 // (2 * SUM(np) * SUM(nn)) END AS BIGINT) AS auc_ppm
        |FROM u GROUP BY 1 ORDER BY key""".stripMargin,
    "q_trimmed_mean" ->
      // identical interval overlap per distinct-value cell, HUGEINT
      // floor-divisions, sign-safe means
      """WITH vals AS (
        |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM lineitem),
        |cells AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM vals GROUP BY v),
        |cw AS (SELECT v, c, SUM(c) OVER (ORDER BY v) AS cumc FROM cells),
        |tot AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n FROM cells),
        |x AS (SELECT v, c, cumc, n, (n * 50000) // 1000000 AS k
        |      FROM cw CROSS JOIN tot),
        |z AS (SELECT *, greatest(least(cumc, n - k)
        |               - greatest(cumc - c + 1, k + 1) + 1, 0) AS cnt
        |      FROM x),
        |agg AS (SELECT CAST(MIN(n) AS BIGINT) AS n_rows,
        |               CAST(MIN(k) AS BIGINT) AS k_trim,
        |               SUM(CAST(v AS HUGEINT) * cnt) AS ts,
        |               CAST(SUM(cnt) AS BIGINT) AS tc,
        |               MIN(CASE WHEN cumc >= k + 1 AND cumc - c < k + 1
        |                   THEN v END) AS v_lo,
        |               MIN(CASE WHEN cumc >= n - k AND cumc - c < n - k
        |                   THEN v END) AS v_hi
        |        FROM z),
        |w AS (SELECT *, ts + CAST(k_trim AS HUGEINT) * v_lo
        |               + CAST(k_trim AS HUGEINT) * v_hi AS ws FROM agg)
        |SELECT n_rows, k_trim,
        |       CAST(CASE WHEN tc > 0 THEN CAST(sign(ts) AS BIGINT) *
        |            CAST((CAST(1000000 AS HUGEINT) * abs(ts)) // tc AS BIGINT)
        |            END AS BIGINT) AS trimmed_mean_ppm,
        |       CAST(CASE WHEN n_rows > 0 THEN CAST(sign(ws) AS BIGINT) *
        |            CAST((CAST(1000000 AS HUGEINT) * abs(ws)) // n_rows AS BIGINT)
        |            END AS BIGINT) AS winsor_mean_ppm
        |FROM w""".stripMargin,
    "q_spearman" ->
      // identical doubled average ranks off distinct-value frames,
      // HUGEINT moment algebra, one correctly-rounded sqrt/div at 6 dp
      """WITH v AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |  FROM lineitem),
        |rx AS (
        |  SELECT x, 2 * SUM(cnt) OVER (ORDER BY x) - cnt + 1 AS r2x
        |  FROM (SELECT x, COUNT(*) AS cnt FROM v GROUP BY x)),
        |ry AS (
        |  SELECT y, 2 * SUM(cnt) OVER (ORDER BY y) - cnt + 1 AS r2y
        |  FROM (SELECT y, COUNT(*) AS cnt FROM v GROUP BY y)),
        |m AS (
        |  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        |         SUM(CAST(r2x AS HUGEINT)) AS sa,
        |         SUM(CAST(r2y AS HUGEINT)) AS sb,
        |         SUM(CAST(r2x AS HUGEINT) * CAST(r2x AS HUGEINT)) AS saa,
        |         SUM(CAST(r2y AS HUGEINT) * CAST(r2y AS HUGEINT)) AS sbb,
        |         SUM(CAST(r2x AS HUGEINT) * CAST(r2y AS HUGEINT)) AS sab
        |  FROM v JOIN rx USING (x) JOIN ry USING (y))
        |SELECT CAST(n AS BIGINT) AS n_rows,
        |       CASE WHEN CAST(n * saa - sa * sa AS DOUBLE) > 0
        |             AND CAST(n * sbb - sb * sb AS DOUBLE) > 0
        |            THEN ROUND(CAST(n * sab - sa * sb AS DOUBLE) /
        |                 (sqrt(CAST(n * saa - sa * sa AS DOUBLE)) *
        |                  sqrt(CAST(n * sbb - sb * sb AS DOUBLE))), 6) + 0.0
        |            END AS rho
        |FROM m""".stripMargin,
    "q_dp_sensitivity" ->
      // the same two-level aggregation: per-(type, user) exact moments,
      // then the per-type maxima and the dominance share
      """WITH e AS (
        |  SELECT event_type, user_id,
        |         CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v
        |  FROM events),
        |pu AS (
        |  SELECT event_type, user_id, COUNT(*) AS u_rows,
        |         CAST(SUM(v) AS BIGINT) AS u_sum
        |  FROM e GROUP BY 1, 2)
        |SELECT event_type,
        |       CAST(SUM(u_rows) AS BIGINT) AS n_rows,
        |       CAST(COUNT(*) AS BIGINT) AS n_users,
        |       CAST(MAX(u_rows) AS BIGINT) AS max_user_rows,
        |       CAST(MAX(abs(u_sum)) AS BIGINT) AS max_user_abs_sum,
        |       CAST((1000000 * MAX(abs(u_sum))) // SUM(abs(u_sum)) AS BIGINT)
        |         AS top_user_share_ppm
        |FROM pu GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q_jackknife_ci" ->
      // identical md5 fold assignment (one hex digit % 8), micro-unit
      // replicate means, exact integer variance expansion
      """WITH e AS (
        |  SELECT event_type,
        |         CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v,
        |         CAST(('0x'||substring(md5(CAST(event_id AS VARCHAR)),1,1)) AS BIGINT) % 8
        |           AS bkt
        |  FROM events),
        |cell AS (SELECT event_type, bkt, CAST(SUM(v) AS BIGINT) AS tb,
        |                CAST(COUNT(*) AS BIGINT) AS nb
        |         FROM e GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(SUM(tb) AS BIGINT) AS t,
        |               CAST(SUM(nb) AS BIGINT) AS n
        |        FROM cell GROUP BY 1),
        |rep AS (SELECT cell.event_type,
        |               CAST(sign(t - tb) AS BIGINT)
        |                 * ((100 * abs(t - tb)) // (n - nb)) AS m
        |        FROM cell JOIN tot ON tot.event_type = cell.event_type
        |        WHERE n > nb),
        |st AS (SELECT rep.event_type,
        |              CAST(COUNT(*) AS BIGINT) AS n_replicas,
        |              CAST(SUM(m) AS BIGINT) AS sm,
        |              CAST(SUM(m*m) AS BIGINT) AS smm
        |       FROM rep GROUP BY 1),
        |fin AS (SELECT st.event_type, tot.n,
        |               CAST(sign(tot.t) AS BIGINT)
        |                 * ((100 * abs(tot.t)) // tot.n) AS mean_u6,
        |               st.n_replicas,
        |               CAST(sign(sm) AS BIGINT) * (abs(sm) // n_replicas) AS mbar,
        |               sm, smm
        |        FROM st JOIN tot ON tot.event_type = st.event_type)
        |SELECT event_type, n, CAST(mean_u6 AS BIGINT) AS mean_u6, n_replicas,
        |       CAST(CASE WHEN n_replicas > 1 THEN
        |         ((n_replicas - 1) * (smm - 2*mbar*sm + n_replicas*mbar*mbar))
        |           // n_replicas END AS BIGINT) AS jk_var_u12
        |FROM fin ORDER BY event_type""".stripMargin,
    "split_bootstrap_ci_by_key" ->
      // the split_bootstrap_ci algebra with every stage keyed; HUGEINT
      // floor-divisions (DECIMAL // would round where Spark div floors)
      """WITH v AS (
        |  SELECT event_type AS key, CAST(event_id AS BIGINT) AS rid,
        |         CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS x
        |  FROM events),
        |wts AS (
        |  SELECT v.key, r.j, v.x,
        |         CAST(('0x' || substring(md5(CAST(v.rid AS VARCHAR) || ':' ||
        |           CAST(r.j AS VARCHAR)), 1, 5)) AS BIGINT) AS u
        |  FROM v CROSS JOIN range(0, 40) r(j)),
        |w2 AS (
        |  SELECT key, j, x,
        |         CASE WHEN u < 385750 THEN 0 WHEN u < 771499 THEN 1
        |              WHEN u < 964374 THEN 2 WHEN u < 1028665 THEN 3
        |              WHEN u < 1044738 THEN 4 WHEN u < 1047953 THEN 5
        |              ELSE 6 END AS w
        |  FROM wts),
        |reps AS (
        |  SELECT key, j, CAST(SUM(w) AS BIGINT) AS sw, SUM(w * x) AS swx
        |  FROM w2 GROUP BY key, j),
        |means AS (
        |  SELECT key, j, CASE WHEN sw > 0
        |         THEN CAST(sign(swx) AS BIGINT) *
        |              CAST((CAST(1000000 AS HUGEINT) * abs(CAST(swx AS HUGEINT)))
        |                // sw AS BIGINT)
        |         ELSE 0 END AS mean_ppm
        |  FROM reps),
        |ranked AS (
        |  SELECT key, mean_ppm,
        |         ROW_NUMBER() OVER (PARTITION BY key ORDER BY mean_ppm, j) AS rk
        |  FROM means),
        |ci AS (
        |  SELECT key, MIN(CASE WHEN rk = 2 THEN mean_ppm END) AS lo_ppm,
        |         MIN(CASE WHEN rk = 39 THEN mean_ppm END) AS hi_ppm
        |  FROM ranked GROUP BY key),
        |ex AS (
        |  SELECT key, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |         CAST(sign(SUM(x)) AS BIGINT) *
        |           CAST((CAST(1000000 AS HUGEINT) *
        |             abs(CAST(SUM(x) AS HUGEINT))) // COUNT(*) AS BIGINT)
        |           AS mean_ppm
        |  FROM v GROUP BY key)
        |SELECT ex.key AS event_type, CAST(40 AS BIGINT) AS b_reps, ex.n_rows,
        |       ex.mean_ppm, ci.lo_ppm, ci.hi_ppm
        |FROM ex JOIN ci USING (key) ORDER BY event_type""".stripMargin,
    "q_tcloseness_audit" ->
      // dense (group × level) grid so absent levels count as zeros, the
      // same cleared-denominator integer EMD, one cumulative window per
      // side — all BIGINT until the final ppm div
      """WITH e AS (SELECT event_type,
        |                  (epoch_us(ts) // 3600000000) % 24 AS hour_of_day,
        |                  user_id % 10 AS lvl
        |           FROM events),
        |cells AS (SELECT event_type, hour_of_day, lvl, COUNT(*) AS c
        |          FROM e GROUP BY 1,2,3),
        |lv AS (SELECT DISTINCT lvl FROM cells),
        |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM lv),
        |g AS (SELECT event_type, hour_of_day, CAST(SUM(c) AS BIGINT) AS ng
        |      FROM cells GROUP BY 1,2),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM cells),
        |gac AS (SELECT lvl, CAST(SUM(SUM(c)) OVER (ORDER BY lvl) AS BIGINT) AS cuma
        |        FROM cells GROUP BY lvl),
        |grid AS (SELECT g.event_type, g.hour_of_day, g.ng, lv.lvl
        |         FROM g CROSS JOIN lv),
        |cum AS (SELECT grid.event_type, grid.hour_of_day, grid.ng, grid.lvl,
        |               SUM(COALESCE(c.c, 0)) OVER (
        |                 PARTITION BY grid.event_type, grid.hour_of_day
        |                 ORDER BY grid.lvl) AS cumg
        |        FROM grid LEFT JOIN cells c
        |          ON c.event_type = grid.event_type
        |         AND c.hour_of_day = grid.hour_of_day AND c.lvl = grid.lvl),
        |agg AS (SELECT cum.event_type, cum.hour_of_day, MIN(cum.ng) AS n,
        |               CAST(SUM(abs(tot.nn * cum.cumg - cum.ng * gac.cuma))
        |                 AS BIGINT) AS sd,
        |               MIN(tot.nn) AS nn
        |        FROM cum JOIN gac ON gac.lvl = cum.lvl CROSS JOIN tot
        |        GROUP BY 1,2),
        |fin AS (SELECT event_type, hour_of_day, CAST(n AS BIGINT) AS n,
        |               CAST((1000000 * sd) // ((mm.m - 1) * n * nn) AS BIGINT)
        |                 AS emd_ppm
        |        FROM agg CROSS JOIN mm)
        |SELECT event_type, hour_of_day, n, emd_ppm,
        |       emd_ppm > 20000 AS violating
        |FROM fin ORDER BY event_type, hour_of_day""".stripMargin,
    "q_spatial_radius_join" ->
      // the brute-force all-pairs form — deliberately NOT the stencil:
      // the gate proves the blocked plan emits exactly the exhaustive set
      """WITH p AS (
        |  SELECT c_custkey AS id, (c_custkey * 7919) % 2000 AS x,
        |         (c_custkey * 104729) % 2000 AS y
        |  FROM customer)
        |SELECT a.id AS id_a, b.id AS id_b,
        |       CAST((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS BIGINT) AS dist2
        |FROM p a JOIN p b ON a.id < b.id
        |WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 3600
        |ORDER BY id_a, id_b""".stripMargin,
    "q_radius_join_2table" ->
      // cross-frame brute force — every (point, site) pair tested
      // exhaustively; negative-quadrant coordinates included
      """WITH p AS (
        |  SELECT c_custkey AS id, (c_custkey * 7919) % 2000 - 1000 AS x,
        |         (c_custkey * 104729) % 2000 - 1000 AS y
        |  FROM customer),
        |st AS (
        |  SELECT s_suppkey AS id, (s_suppkey * 12007) % 2000 - 1000 AS x,
        |         (s_suppkey * 30011) % 2000 - 1000 AS y
        |  FROM supplier)
        |SELECT p.id AS point_id, st.id AS site_id,
        |       CAST((p.x-st.x)*(p.x-st.x) + (p.y-st.y)*(p.y-st.y) AS BIGINT) AS dist2
        |FROM p JOIN st
        |  ON (p.x-st.x)*(p.x-st.x) + (p.y-st.y)*(p.y-st.y) <= 6400
        |ORDER BY point_id, site_id""".stripMargin,
    "q_entity_resolution" ->
      // the same blocked candidates, then recursive reachability with
      // min-label canonicalization and a left join keeping singletons
      """WITH RECURSIVE qp AS (
        |  SELECT x.c_custkey AS a, y.c_custkey AS b
        |  FROM customer x JOIN customer y
        |    ON x.c_nationkey = y.c_nationkey
        |   AND x.c_mktsegment = y.c_mktsegment
        |   AND x.c_custkey < y.c_custkey
        |  WHERE levenshtein(x.c_name, y.c_name) <= 2),
        |e AS (SELECT a AS src, b AS dst FROM qp UNION ALL SELECT b, a FROM qp),
        |reach(node, lbl) AS (
        |  SELECT DISTINCT src, src FROM e
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
        |comp AS (SELECT node, MIN(lbl) AS entity FROM reach GROUP BY 1),
        |asg AS (SELECT c.c_custkey, COALESCE(comp.entity, c.c_custkey) AS entity
        |        FROM customer c LEFT JOIN comp ON comp.node = c.c_custkey)
        |SELECT entity, CAST(COUNT(*) AS BIGINT) AS n_members,
        |       CAST(MIN(c_custkey) AS BIGINT) AS min_member,
        |       CAST(MAX(c_custkey) AS BIGINT) AS max_member
        |FROM asg GROUP BY 1 ORDER BY entity""".stripMargin,
    "q_fuzzy_blocked" ->
      // exact Levenshtein is integer and engine-identical; the block
      // equi-keys bound candidate volume to Σ block²
      """SELECT x.c_custkey AS u_key, y.c_custkey AS v_key,
        |       x.c_name AS u_str, y.c_name AS v_str,
        |       CAST(levenshtein(x.c_name, y.c_name) AS BIGINT) AS dist
        |FROM customer x JOIN customer y
        |  ON x.c_nationkey = y.c_nationkey
        | AND x.c_mktsegment = y.c_mktsegment
        | AND x.c_custkey < y.c_custkey
        |WHERE levenshtein(x.c_name, y.c_name) <= 2
        |ORDER BY u_key, v_key""".stripMargin,
    "q_churn_labels" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |c AS (SELECT MAX(ts_us) - 604800000000 AS cutoff FROM e),
        |f AS (SELECT user_id, COUNT(*) AS n_before,
        |             ((SELECT cutoff FROM c) - MAX(ts_us)) // 3600000000
        |               AS hours_since_last
        |      FROM e WHERE ts_us <= (SELECT cutoff FROM c) GROUP BY 1),
        |a AS (SELECT DISTINCT user_id FROM e
        |      WHERE ts_us > (SELECT cutoff FROM c))
        |SELECT f.user_id, f.n_before, f.hours_since_last,
        |       a.user_id IS NULL AS churned
        |FROM f LEFT JOIN a ON a.user_id = f.user_id
        |ORDER BY f.user_id""".stripMargin,
    "split_target_encode" ->
      """WITH v AS (SELECT event_id, event_type,
        |                  CAST(round(value * 1000000, 0) AS BIGINT) AS t_u6
        |           FROM events WHERE event_id % 20 = 0),
        |g AS (SELECT event_type, CAST(SUM(t_u6) AS BIGINT) AS cat_sum,
        |             COUNT(*) AS cat_n
        |      FROM v GROUP BY 1)
        |SELECT v.event_id, v.event_type, v.t_u6, g.cat_n,
        |       CASE WHEN g.cat_n > 1
        |            THEN (g.cat_sum - v.t_u6) // (g.cat_n - 1)
        |            ELSE NULL END AS loo_u6
        |FROM v JOIN g ON g.event_type = v.event_type
        |ORDER BY v.event_id""".stripMargin,
    "q_rfm_scores" ->
      // identical bounds agg + rank-exact quartile edges + bucket rules;
      // date_diff('day') ≡ Spark's date-truncated datediff
      """WITH b AS (SELECT MAX(o_orderdate) AS max_d FROM orders),
        |c AS (SELECT o_custkey,
        |             MIN(date_diff('day', o_orderdate, (SELECT max_d FROM b)))
        |               AS recency_days,
        |             COUNT(*) AS frequency,
        |             CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |               AS BIGINT) AS monetary_c
        |      FROM orders GROUP BY 1),
        |e AS (SELECT quantile_disc(recency_days, [0.25, 0.5, 0.75]) AS re,
        |             quantile_disc(frequency,    [0.25, 0.5, 0.75]) AS fe,
        |             quantile_disc(monetary_c,   [0.25, 0.5, 0.75]) AS me
        |      FROM c),
        |s AS (SELECT
        |        5 - (CASE WHEN recency_days <= re[1] THEN 1
        |                  WHEN recency_days <= re[2] THEN 2
        |                  WHEN recency_days <= re[3] THEN 3 ELSE 4 END) AS r_score,
        |        CASE WHEN frequency <= fe[1] THEN 1
        |             WHEN frequency <= fe[2] THEN 2
        |             WHEN frequency <= fe[3] THEN 3 ELSE 4 END AS f_score,
        |        CASE WHEN monetary_c <= me[1] THEN 1
        |             WHEN monetary_c <= me[2] THEN 2
        |             WHEN monetary_c <= me[3] THEN 3 ELSE 4 END AS m_score
        |      FROM c CROSS JOIN e)
        |SELECT CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm_code,
        |       COUNT(*) AS n_customers
        |FROM s GROUP BY 1 ORDER BY rfm_code""".stripMargin,
    "q_attribution" ->
      // identical gap-flag → running-sum session chain; DuckDB's ordered
      // first() is the struct-min's (ts, id) order
      """WITH e AS (SELECT user_id, event_type, value, epoch_us(ts) AS ts_us,
        |                  event_id FROM events),
        |f AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                       OR ts_us - lag(ts_us) OVER w > 1800000000
        |                     THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id
        |        ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS session_idx
        |      FROM f),
        |ft AS (SELECT user_id, session_idx,
        |              first(event_type ORDER BY ts_us, event_id) AS first_touch
        |       FROM s GROUP BY 1, 2)
        |SELECT ft.first_touch, COUNT(*) AS n_purchases,
        |       CAST(SUM(CAST(p.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM s p JOIN ft ON ft.user_id = p.user_id
        |                AND ft.session_idx = p.session_idx
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_session_paths" ->
      // same session chain as q_attribution; DuckDB's ordered list + a
      // [1:3] slice is the struct-sorted collect's first three
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us,
        |                  event_id FROM events),
        |f AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                       OR ts_us - lag(ts_us) OVER w > 1800000000
        |                     THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id
        |        ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS session_idx
        |      FROM f),
        |g AS (SELECT user_id, session_idx,
        |             array_to_string(
        |               (list(event_type ORDER BY ts_us, event_id))[1:3], '>')
        |               AS path
        |      FROM s GROUP BY 1, 2)
        |SELECT path, COUNT(*) AS n FROM g
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "ann_mmr_rerank" -> (
      """WITH u AS (SELECT vec_id, unnest(embedding) AS v,
        |                  generate_subscripts(embedding, 1) AS i FROM embeddings),
        |nrm AS (SELECT vec_id, sqrt(list_reduce(list(v*v ORDER BY i),
        |               (x,y) -> x+y)) AS nrm
        |        FROM u GROUP BY 1),
        |dots AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
        |                list_reduce(list(a.v*b.v ORDER BY a.i), (x,y) -> x+y) AS dot
        |         FROM u a JOIN u b ON b.i = a.i AND b.vec_id <> a.vec_id
        |         WHERE a.vec_id < 6 GROUP BY 1, 2),
        |c0 AS (SELECT d.qid, d.nid,
        |              CAST(round(10000 * d.dot / (qn.nrm * nn.nrm), 0) AS BIGINT)
        |                AS rel,
        |              row_number() OVER (PARTITION BY d.qid
        |                ORDER BY round(10000 * d.dot / (qn.nrm * nn.nrm), 0) DESC,
        |                         d.nid) AS rnk
        |       FROM dots d JOIN nrm qn ON qn.vec_id = d.qid
        |                   JOIN nrm nn ON nn.vec_id = d.nid),
        |cand AS (SELECT qid, nid, rel FROM c0 WHERE rnk <= 12),
        |pd AS (SELECT c1.qid, c1.nid AS cid, c2.nid AS oid,
        |              list_reduce(list(x.v*y.v ORDER BY x.i), (a,b) -> a+b) AS dot
        |       FROM cand c1 JOIN cand c2
        |         ON c2.qid = c1.qid AND c2.nid <> c1.nid
        |       JOIN u x ON x.vec_id = c1.nid
        |       JOIN u y ON y.vec_id = c2.nid AND y.i = x.i
        |       GROUP BY 1, 2, 3),
        |pairs AS (SELECT pd.qid, pd.cid, pd.oid,
        |                 CAST(round(10000 * pd.dot / (na.nrm * nb.nrm), 0) AS BIGINT)
        |                   AS sim
        |          FROM pd JOIN nrm na ON na.vec_id = pd.cid
        |                  JOIN nrm nb ON nb.vec_id = pd.oid),
        |""".stripMargin + mmrOracleSteps(4) + "\n" +
      """SELECT qid AS query_id, nid AS neighbor_id,
        |       CAST(step AS BIGINT) AS mmr_step, obj AS objective
        |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
        |      UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4)
        |ORDER BY query_id, mmr_step""".stripMargin),
    "ann_mmr_rerank_lsh" -> (embCte + lshBandedServeCtes +
      """,
        |mcand AS MATERIALIZED (SELECT query_id AS qid, neighbor_id AS nid,
        |                 CAST(round(score * 10000, 0) AS BIGINT) AS rel
        |          FROM rr WHERE rnk <= 12),
        |mpd AS MATERIALIZED (SELECT c1.qid, c1.nid AS cid, c2.nid AS oid,
        |               list_reduce(list(x.v*y.v ORDER BY x.i), (a,b) -> a+b) AS dot
        |        FROM mcand c1 JOIN mcand c2
        |          ON c2.qid = c1.qid AND c2.nid <> c1.nid
        |        JOIN f x ON x.vec_id = c1.nid
        |        JOIN f y ON y.vec_id = c2.nid AND y.i = x.i
        |        GROUP BY 1, 2, 3),
        |mpairs AS MATERIALIZED (SELECT mpd.qid, mpd.cid, mpd.oid,
        |                  CAST(round(10000 * mpd.dot / (na.nrm * nb.nrm), 0) AS BIGINT)
        |                    AS sim
        |           FROM mpd JOIN nrm na ON na.vec_id = mpd.cid
        |                    JOIN nrm nb ON nb.vec_id = mpd.oid),
        |""".stripMargin + mmrOracleSteps(4, "mcand", "mpairs") + "\n" +
      """SELECT qid AS query_id, nid AS neighbor_id,
        |       CAST(step AS BIGINT) AS mmr_step, obj AS objective
        |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
        |      UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4)
        |ORDER BY query_id, mmr_step""".stripMargin),
    "ann_mmr_recall" -> (embCte + lshBandedServeCtes +
      """,
        |mcand AS MATERIALIZED (SELECT query_id AS qid, neighbor_id AS nid,
        |                 CAST(round(score * 10000, 0) AS BIGINT) AS rel
        |          FROM rr WHERE rnk <= 12),
        |mpd AS MATERIALIZED (SELECT c1.qid, c1.nid AS cid, c2.nid AS oid,
        |               list_reduce(list(x.v*y.v ORDER BY x.i), (a,b) -> a+b) AS dot
        |        FROM mcand c1 JOIN mcand c2
        |          ON c2.qid = c1.qid AND c2.nid <> c1.nid
        |        JOIN f x ON x.vec_id = c1.nid
        |        JOIN f y ON y.vec_id = c2.nid AND y.i = x.i
        |        GROUP BY 1, 2, 3),
        |mpairs AS MATERIALIZED (SELECT mpd.qid, mpd.cid, mpd.oid,
        |                  CAST(round(10000 * mpd.dot / (na.nrm * nb.nrm), 0) AS BIGINT)
        |                    AS sim
        |           FROM mpd JOIN nrm na ON na.vec_id = mpd.cid
        |                    JOIN nrm nb ON nb.vec_id = mpd.oid),
        |bdot AS MATERIALIZED (SELECT q.vec_id AS qid, n.vec_id AS nid,
        |                list_reduce(list(q.v*n.v ORDER BY q.i), (x,y) -> x+y) AS dot
        |         FROM f q JOIN f n ON q.i=n.i AND q.vec_id<10 AND q.vec_id<>n.vec_id
        |         GROUP BY 1, 2),
        |bc0 AS MATERIALIZED (SELECT d.qid, d.nid,
        |               CAST(round(10000 * d.dot / (qn.nrm * nn.nrm), 0) AS BIGINT)
        |                 AS rel,
        |               row_number() OVER (PARTITION BY d.qid
        |                 ORDER BY round(10000 * d.dot / (qn.nrm * nn.nrm), 0) DESC,
        |                          d.nid) AS rnk
        |        FROM bdot d JOIN nrm qn ON qn.vec_id = d.qid
        |                    JOIN nrm nn ON nn.vec_id = d.nid),
        |bcand AS MATERIALIZED (SELECT qid, nid, rel FROM bc0 WHERE rnk <= 12),
        |bpd AS MATERIALIZED (SELECT c1.qid, c1.nid AS cid, c2.nid AS oid,
        |               list_reduce(list(x.v*y.v ORDER BY x.i), (a,b) -> a+b) AS dot
        |        FROM bcand c1 JOIN bcand c2
        |          ON c2.qid = c1.qid AND c2.nid <> c1.nid
        |        JOIN f x ON x.vec_id = c1.nid
        |        JOIN f y ON y.vec_id = c2.nid AND y.i = x.i
        |        GROUP BY 1, 2, 3),
        |bpairs AS MATERIALIZED (SELECT bpd.qid, bpd.cid, bpd.oid,
        |                  CAST(round(10000 * bpd.dot / (na.nrm * nb.nrm), 0) AS BIGINT)
        |                    AS sim
        |           FROM bpd JOIN nrm na ON na.vec_id = bpd.cid
        |                    JOIN nrm nb ON nb.vec_id = bpd.oid),
        |""".stripMargin +
      mmrOracleSteps(4, "mcand", "mpairs", prefix = "a") + ",\n" +
      mmrOracleSteps(4, "bcand", "bpairs", prefix = "b") + "\n" +
      """SELECT e.qid AS query_id, COUNT(*) AS k_exact,
        |       CAST(SUM(CASE WHEN a.nid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_hits,
        |       CAST(SUM(CASE WHEN a.nid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |         / COUNT(*) AS recall
        |FROM (SELECT qid, nid FROM bs1 UNION ALL SELECT qid, nid FROM bs2
        |      UNION ALL SELECT qid, nid FROM bs3 UNION ALL SELECT qid, nid FROM bs4) e
        |LEFT JOIN (SELECT qid, nid FROM as1 UNION ALL SELECT qid, nid FROM as2
        |           UNION ALL SELECT qid, nid FROM as3 UNION ALL SELECT qid, nid FROM as4) a
        |       ON a.qid = e.qid AND a.nid = e.nid
        |GROUP BY 1 ORDER BY query_id""".stripMargin),
    "q_recursive_bfs" ->
      // DuckDB runs the identical recursive text (depth cast pinned to
      // BIGINT by the house integer rule)
      """WITH RECURSIVE li AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT x.p AS a, y.p AS b FROM li x JOIN li y
        |      ON x.o = y.o AND x.p <> y.p),
        |seed AS (SELECT MIN(l_partkey) AS n FROM lineitem),
        |bfs(n, d) AS (
        |  SELECT n, 0 FROM seed
        |  UNION ALL
        |  SELECT e.b, bfs.d + 1 FROM bfs JOIN e ON e.a = bfs.n
        |  WHERE bfs.d < 2),
        |m AS (SELECT n, MIN(d) AS depth FROM bfs GROUP BY n)
        |SELECT CAST(depth AS BIGINT) AS depth, COUNT(*) AS n_nodes
        |FROM m GROUP BY depth ORDER BY depth""".stripMargin,
    "q_unpivot_metrics" ->
      // the melt as explicit UNION ALL — name-for-name with Spark's
      // unpivot output (metric carries the source column name)
      """WITH u AS (
        |  SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS value
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem)
        |SELECT l_returnflag, metric, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM u GROUP BY 1, 2 ORDER BY l_returnflag, metric""".stripMargin,
    "q_time_weighted_avg" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |                  CAST(round(value * 100, 0) AS BIGINT) AS v_u2
        |           FROM events),
        |l AS (SELECT *, lead(ts_us) OVER (PARTITION BY user_id
        |        ORDER BY ts_us, event_id) AS next_ts FROM e),
        |iv AS (SELECT user_id, v_u2, (next_ts - ts_us) // 1000 AS dt_ms
        |       FROM l WHERE next_ts IS NOT NULL AND (next_ts - ts_us) // 1000 > 0)
        |SELECT user_id, COUNT(*) AS n_intervals,
        |       CAST(CAST(SUM(v_u2 * dt_ms) AS BIGINT)
        |            // CAST(SUM(dt_ms) AS BIGINT) AS BIGINT) AS twa_u2
        |FROM iv GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q_histogram_equidepth" ->
      // quantile_disc ≡ approx_percentile at accuracy ≥ n (the
      // q_percentile_approx equivalence), then the identical bucket rule
      """WITH v AS (SELECT CAST(round(l_extendedprice * 1000000, 0) AS BIGINT) AS v
        |           FROM lineitem),
        |e AS (SELECT quantile_disc(v, [0.25, 0.5, 0.75]) AS es FROM v)
        |SELECT CAST(CASE WHEN v <= es[1] THEN 0
        |                 WHEN v <= es[2] THEN 1
        |                 WHEN v <= es[3] THEN 2
        |                 ELSE 3 END AS BIGINT) AS bucket,
        |       COUNT(*) AS n,
        |       CAST(MIN(v) AS BIGINT) AS min_v,
        |       CAST(MAX(v) AS BIGINT) AS max_v
        |FROM v CROSS JOIN e
        |GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_table_profile" -> {
      def one(c: String) =
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           |       CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
           |       CAST(COUNT(DISTINCT $c) AS BIGINT) AS ndv,
           |       CAST(MIN($c) AS VARCHAR) AS min_value,
           |       CAST(MAX($c) AS VARCHAR) AS max_value
           |FROM lineitem""".stripMargin
      Seq("l_orderkey", "l_partkey", "l_returnflag", "l_linestatus")
        .map(one).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "q_join_size_estimate" ->
      // identical sketch replay (the text_cms_counts hash chain) + the
      // exact group-count product for verification
      """WITH l AS (SELECT CAST(user_id AS VARCHAR) AS t FROM events
        |           WHERE user_id % 3 <> 0),
        |r AS (SELECT CAST(user_id AS VARCHAR) AS t FROM events
        |      WHERE user_id % 5 = 0),
        |js AS (SELECT unnest([0, 1, 2]) AS j),
        |lc AS (SELECT js.j,
        |              CAST(('0x'||substring(md5(CAST(js.j AS VARCHAR)||':'||t),1,4))
        |                   AS BIGINT) % 256 AS b,
        |              COUNT(*) AS n
        |       FROM l CROSS JOIN js GROUP BY 1, 2),
        |rc AS (SELECT js.j,
        |              CAST(('0x'||substring(md5(CAST(js.j AS VARCHAR)||':'||t),1,4))
        |                   AS BIGINT) % 256 AS b,
        |              COUNT(*) AS m
        |       FROM r CROSS JOIN js GROUP BY 1, 2),
        |e AS (SELECT lc.j, CAST(SUM(lc.n * rc.m) AS BIGINT) AS e
        |      FROM lc JOIN rc ON rc.j = lc.j AND rc.b = lc.b GROUP BY 1),
        |x AS (SELECT CAST(COALESCE(SUM(cl.n * cr.n), 0) AS BIGINT) AS exact_size
        |      FROM (SELECT t, COUNT(*) AS n FROM l GROUP BY 1) cl
        |      JOIN (SELECT t, COUNT(*) AS n FROM r GROUP BY 1) cr ON cr.t = cl.t)
        |SELECT x.exact_size,
        |       (SELECT MIN(e) FROM e) AS cms_estimate,
        |       (SELECT MIN(e) FROM e) >= x.exact_size AS upper_bound_holds
        |FROM x""".stripMargin,
    "dedup_cross_source_matrix" ->
      // same normalized key, [2,1000]-sized groups, canonical source
      // pair over within-group doc pairs
      """WITH v AS (
        |  SELECT doc_id, source,
        |         CASE WHEN doc_id % 10 = 0
        |              THEN 'leak '||CAST(doc_id//20 AS VARCHAR)
        |              ELSE text END AS text
        |  FROM documents),
        |kk AS (SELECT doc_id, source,
        |              md5(nfc_normalize(regexp_replace(trim(lower(text)),
        |                '[ \t\n\r]+', ' ', 'g'))) AS k
        |       FROM v),
        |g AS (SELECT k FROM (SELECT k, COUNT(*) AS n FROM kk GROUP BY 1)
        |      WHERE n >= 2 AND n <= 1000),
        |in2 AS (SELECT kk.doc_id, kk.source, kk.k FROM kk JOIN g ON g.k = kk.k)
        |SELECT least(x.source, y.source) AS src_a,
        |       greatest(x.source, y.source) AS src_b,
        |       COUNT(*) AS n_dup_pairs
        |FROM in2 x JOIN in2 y ON x.k = y.k AND x.doc_id < y.doc_id
        |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin,
    "dedup_rate_by_source" ->
      """WITH v AS (
        |  SELECT doc_id, source,
        |         CASE WHEN doc_id % 10 = 0
        |              THEN 'leak '||CAST(doc_id//20 AS VARCHAR)
        |              ELSE text END AS text
        |  FROM documents),
        |kk AS (SELECT doc_id, source,
        |              md5(nfc_normalize(regexp_replace(trim(lower(text)),
        |                '[ \t\n\r]+', ' ', 'g'))) AS k
        |       FROM v),
        |g AS (SELECT k, COUNT(*) AS n FROM kk GROUP BY 1)
        |SELECT kk.source, COUNT(*) AS n_docs,
        |       CAST(SUM(CASE WHEN g.n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_dup_docs,
        |       CAST((CAST(SUM(CASE WHEN g.n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |             * 1000000) // COUNT(*) AS BIGINT) AS dup_ppm
        |FROM kk JOIN g ON g.k = kk.k
        |GROUP BY 1 ORDER BY source""".stripMargin,
    "q_delete_closure" ->
      """WITH v AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 10 = 0
        |              THEN 'leak '||CAST(doc_id//20 AS VARCHAR)
        |              ELSE text END AS text,
        |         CASE WHEN doc_id % 40 = 0 THEN 1 ELSE 0 END AS tombstoned
        |  FROM documents),
        |g AS (SELECT md5(nfc_normalize(regexp_replace(trim(lower(text)),
        |               '[ \t\n\r]+', ' ', 'g'))) AS k,
        |             COUNT(*) AS n, CAST(SUM(tombstoned) AS BIGINT) AS n_tomb
        |      FROM v GROUP BY 1)
        |SELECT CAST(SUM(n_tomb) AS BIGINT) AS n_tombstones,
        |       CAST(SUM(CASE WHEN n_tomb > 0 THEN n ELSE 0 END) AS BIGINT)
        |         AS n_closure_docs,
        |       CAST(SUM(CASE WHEN n_tomb > 0 THEN n - n_tomb ELSE 0 END)
        |         AS BIGINT) AS n_extra_deletes
        |FROM g""".stripMargin,
    "q_jsonl_roundtrip" ->
      // straight from parquet: equal ⟺ the jsonl write→read preserved
      // every row, char, and hash
      """SELECT COUNT(*) AS n_clean,
        |       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
        |       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
        |       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM documents""".stripMargin,
    "q_orc_roundtrip" ->
      """SELECT COUNT(*) AS n_clean,
        |       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
        |       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
        |       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM documents""".stripMargin,
    "q_csv_roundtrip" ->
      // same integrity row — equal ⟺ the CSV write→read (quoting and
      // all) preserved every row, char, and hash
      """SELECT COUNT(*) AS n_clean,
        |       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
        |       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
        |       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM documents""".stripMargin,
    "q_median_scalable" ->
      // the doubled-median integer contract: 2·median is k1th + k2th,
      // exact in both engines regardless of interpolation
      """WITH v AS (SELECT CAST(round(l_extendedprice * 1000000, 0) AS BIGINT) AS v
        |           FROM lineitem)
        |SELECT COUNT(*) AS n, CAST(2 * median(v) AS BIGINT) AS med2_u6
        |FROM v""".stripMargin,
    "q_mad_outliers" ->
      // identical doubled-median integer algebra: med2 = 2·median is an
      // exact integer even when an even-count median interpolates, so
      // the Hampel test 2·|2v − med2| > 3·dmed2 is pure int64
      """WITH v AS (SELECT event_type AS k,
        |                  CAST(round(value * 1000000, 0) AS BIGINT) AS v
        |           FROM events),
        |m AS (SELECT k, CAST(median(v) * 2 AS BIGINT) AS med2 FROM v GROUP BY 1),
        |d AS (SELECT v.k, v.v, m.med2, abs(v.v * 2 - m.med2) AS d
        |      FROM v JOIN m ON m.k = v.k),
        |dm AS (SELECT k, CAST(median(d) * 2 AS BIGINT) AS dmed2 FROM d GROUP BY 1)
        |SELECT d.k AS event_type, COUNT(*) AS n,
        |       MIN(d.med2) AS med2_u6,
        |       MIN(dm.dmed2) AS dmed2_u6,
        |       CAST(SUM(CASE WHEN d.d * 2 > dm.dmed2 * 3 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_outliers
        |FROM d JOIN dm ON dm.k = d.k
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q_mad_outliers_scalable" ->
      // the scalable operator's CONTRACT: identical output to the exact
      // form — the oracle is the exact form's SQL, verbatim
      """WITH v AS (SELECT event_type AS k,
        |                  CAST(round(value * 1000000, 0) AS BIGINT) AS v
        |           FROM events),
        |m AS (SELECT k, CAST(median(v) * 2 AS BIGINT) AS med2 FROM v GROUP BY 1),
        |d AS (SELECT v.k, v.v, m.med2, abs(v.v * 2 - m.med2) AS d
        |      FROM v JOIN m ON m.k = v.k),
        |dm AS (SELECT k, CAST(median(d) * 2 AS BIGINT) AS dmed2 FROM d GROUP BY 1)
        |SELECT d.k AS event_type, COUNT(*) AS n,
        |       MIN(d.med2) AS med2_u6,
        |       MIN(dm.dmed2) AS dmed2_u6,
        |       CAST(SUM(CASE WHEN d.d * 2 > dm.dmed2 * 3 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_outliers
        |FROM d JOIN dm ON dm.k = d.k
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q_group_quantiles_scalable" ->
      // exact lower order statistic at rank ⌊q·(n−1)⌋, 1-based list
      // index — the identical rank formula the Spark selector targets
      """WITH v AS (SELECT event_type AS k,
        |                  CAST(round(value * 1000000, 0) AS BIGINT) AS v
        |           FROM events WHERE value IS NOT NULL),
        |s AS (SELECT k, list(v ORDER BY v) AS lst, COUNT(*) AS n
        |      FROM v GROUP BY 1),
        |qs AS (SELECT CAST(unnest([250000, 500000, 750000, 900000]) AS BIGINT)
        |         AS q_ppm)
        |SELECT s.k AS event_type, qs.q_ppm,
        |       lst[CAST(floor((qs.q_ppm / 1000000.0) * (s.n - 1)) AS BIGINT) + 1]
        |         AS value_u6
        |FROM s CROSS JOIN qs
        |ORDER BY event_type, q_ppm""".stripMargin,
    "q_column_entropy" -> {
      // identical null-safe cells, psi ln-fence (round ln and product at
      // 6 dp per cell, DECIMAL(28,12) sums), one rounded edge division
      val per = Seq("l_returnflag", "l_linestatus", "l_linenumber").map { c =>
        s"""SELECT col_name, n_rows, ndv, entropy,
           |       CASE WHEN ndv > 1 THEN
           |            ROUND(entropy / ROUND(ln(CAST(ndv AS DOUBLE)), 6), 6)
           |              + 0.0 END AS norm_entropy
           |FROM (
           |  SELECT '$c' AS col_name, CAST(MIN(t.nr) AS BIGINT) AS n_rows,
           |         CAST(MIN(t.ndv) AS BIGINT) AS ndv,
           |         ROUND(-CAST(SUM(CAST(ROUND(
           |           (CAST(cells.n AS DOUBLE) / t.nr) *
           |           ROUND(ln(CAST(cells.n AS DOUBLE) / t.nr), 6), 6)
           |           AS DECIMAL(28,12))) AS DOUBLE), 6) + 0.0 AS entropy
           |  FROM (SELECT COALESCE(CAST($c AS VARCHAR), '') AS v,
           |               ($c IS NULL) AS vn, CAST(COUNT(*) AS BIGINT) AS n
           |        FROM lineitem GROUP BY 1, 2) cells
           |  CROSS JOIN (SELECT CAST(SUM(n) AS BIGINT) AS nr,
           |                     CAST(COUNT(*) AS BIGINT) AS ndv
           |              FROM (SELECT COALESCE(CAST($c AS VARCHAR), '') AS v,
           |                           ($c IS NULL) AS vn,
           |                           CAST(COUNT(*) AS BIGINT) AS n
           |                    FROM lineitem GROUP BY 1, 2)) t)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"SELECT * FROM (\n$per\n) ORDER BY col_name"
    },
    "q_benford_audit" ->
      """WITH cnt AS (
        |  SELECT CAST(regexp_extract(CAST(l_extendedprice AS VARCHAR),
        |           '[1-9]') AS BIGINT) AS digit,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM lineitem WHERE l_extendedprice > 0 GROUP BY 1
        |), tot AS (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS total FROM cnt),
        |be AS (SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
        |         (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
        |         (9, 45757)) e(digit, exp_ppm))
        |SELECT CAST(be.digit AS BIGINT) AS digit,
        |       COALESCE(cnt.n, 0) AS n,
        |       CAST(CASE WHEN tot.total > 0
        |            THEN COALESCE(cnt.n, 0) * 1000000 // tot.total
        |            ELSE 0 END AS BIGINT) AS obs_ppm,
        |       CAST(be.exp_ppm AS BIGINT) AS exp_ppm,
        |       CAST(CASE WHEN tot.total > 0
        |            THEN COALESCE(cnt.n, 0) * 1000000 // tot.total
        |            ELSE 0 END - be.exp_ppm AS BIGINT) AS dev_ppm
        |FROM be LEFT JOIN cnt ON be.digit = cnt.digit CROSS JOIN tot
        |ORDER BY digit""".stripMargin,
    "q_drift_report" -> {
      // identical floor-share integer TVD per column — generated so the
      // three per-column subqueries can't drift from each other
      val per = Seq("l_returnflag", "l_linestatus", "l_linenumber").map { c =>
        s"""SELECT '$c' AS col_name, MIN(t.n_a) AS n_a, MIN(t.n_b) AS n_b,
           |       CAST(COUNT(*) AS BIGINT) AS ndv_union,
           |       CAST(SUM(ABS(
           |         CASE WHEN t.n_a > 0 THEN j.na_v * 1000000 // t.n_a ELSE 0 END -
           |         CASE WHEN t.n_b > 0 THEN j.nb_v * 1000000 // t.n_b ELSE 0 END)) // 2
           |         AS BIGINT) AS tvd_ppm
           |FROM (
           |  SELECT COALESCE(a.na_v, 0) AS na_v, COALESCE(b.nb_v, 0) AS nb_v
           |  FROM (SELECT COALESCE(CAST($c AS VARCHAR), '') AS v,
           |               ($c IS NULL) AS vn, COUNT(*) AS na_v
           |        FROM da GROUP BY 1, 2) a
           |  FULL OUTER JOIN
           |       (SELECT COALESCE(CAST($c AS VARCHAR), '') AS v,
           |               ($c IS NULL) AS vn, COUNT(*) AS nb_v
           |        FROM db GROUP BY 1, 2) b
           |  USING (v, vn)) j
           |CROSS JOIN (SELECT (SELECT COUNT(*) FROM da) AS n_a,
           |                   (SELECT COUNT(*) FROM db) AS n_b) t""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH da AS (SELECT * FROM lineitem WHERE l_orderkey % 2 = 0),
         |db AS (SELECT * FROM lineitem WHERE l_orderkey % 2 = 1
         |       AND NOT (l_returnflag = 'R' AND l_orderkey % 4 = 1))
         |SELECT * FROM (
         |$per
         |) ORDER BY col_name""".stripMargin
    },
    "q_psi_drift" -> {
      // the same Laplace-smoothed shares and the same 6-dp ln/product
      // fences, decimal-summed — generated per column like q_drift_report
      val per = Seq("l_returnflag", "l_linestatus", "l_linenumber").map { c =>
        s"""SELECT '$c' AS col_name, CAST(MIN(t.n_a) AS BIGINT) AS n_a,
           |       CAST(MIN(t.n_b) AS BIGINT) AS n_b,
           |       CAST(COUNT(*) AS BIGINT) AS ndv_union,
           |       ROUND(CAST(SUM(CAST(ROUND(
           |         (CAST(j.na_v + 1 AS DOUBLE) / (t.n_a + t.ndv) -
           |          CAST(j.nb_v + 1 AS DOUBLE) / (t.n_b + t.ndv)) *
           |         ROUND(ln((CAST(j.na_v + 1 AS DOUBLE) / (t.n_a + t.ndv)) /
           |                  (CAST(j.nb_v + 1 AS DOUBLE) / (t.n_b + t.ndv))), 6),
           |         6) AS DECIMAL(28,12))) AS DOUBLE), 6) + 0.0 AS psi
           |FROM (
           |  SELECT COALESCE(a.na_v, 0) AS na_v, COALESCE(b.nb_v, 0) AS nb_v
           |  FROM (SELECT COALESCE(CAST($c AS VARCHAR), '') AS v,
           |               ($c IS NULL) AS vn, COUNT(*) AS na_v
           |        FROM da GROUP BY 1, 2) a
           |  FULL OUTER JOIN
           |       (SELECT COALESCE(CAST($c AS VARCHAR), '') AS v,
           |               ($c IS NULL) AS vn, COUNT(*) AS nb_v
           |        FROM db GROUP BY 1, 2) b
           |  USING (v, vn)) j
           |CROSS JOIN (
           |  SELECT SUM(na_v) AS n_a, SUM(nb_v) AS n_b, COUNT(*) AS ndv
           |  FROM (
           |    SELECT COALESCE(a.na_v, 0) AS na_v, COALESCE(b.nb_v, 0) AS nb_v
           |    FROM (SELECT COALESCE(CAST($c AS VARCHAR), '') AS v,
           |                 ($c IS NULL) AS vn, COUNT(*) AS na_v
           |          FROM da GROUP BY 1, 2) a
           |    FULL OUTER JOIN
           |         (SELECT COALESCE(CAST($c AS VARCHAR), '') AS v,
           |                 ($c IS NULL) AS vn, COUNT(*) AS nb_v
           |          FROM db GROUP BY 1, 2) b
           |    USING (v, vn))) t""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH da AS MATERIALIZED (SELECT * FROM lineitem WHERE l_orderkey % 2 = 0),
         |db AS MATERIALIZED (SELECT * FROM lineitem WHERE l_orderkey % 2 = 1
         |       AND NOT (l_returnflag = 'R' AND l_orderkey % 4 = 1))
         |SELECT * FROM (
         |$per
         |) ORDER BY col_name""".stripMargin
    },
    "q_drift_numeric" -> {
      // single-column drift over the closed-form floor buckets; 1.1/1.0
      // CAST AS DOUBLE — DuckDB would otherwise parse them as DECIMAL
      // and diverge from Spark's double arithmetic at bucket edges
      val per = Seq("price_bucket").map { c =>
        s"""SELECT '$c' AS col_name, MIN(t.n_a) AS n_a, MIN(t.n_b) AS n_b,
           |       CAST(COUNT(*) AS BIGINT) AS ndv_union,
           |       CAST(SUM(ABS(
           |         CASE WHEN t.n_a > 0 THEN j.na_v * 1000000 // t.n_a ELSE 0 END -
           |         CASE WHEN t.n_b > 0 THEN j.nb_v * 1000000 // t.n_b ELSE 0 END)) // 2
           |         AS BIGINT) AS tvd_ppm
           |FROM (
           |  SELECT COALESCE(a.na_v, 0) AS na_v, COALESCE(b.nb_v, 0) AS nb_v
           |  FROM (SELECT COALESCE(CAST($c AS VARCHAR), '') AS v,
           |               ($c IS NULL) AS vn, COUNT(*) AS na_v
           |        FROM da GROUP BY 1, 2) a
           |  FULL OUTER JOIN
           |       (SELECT COALESCE(CAST($c AS VARCHAR), '') AS v,
           |               ($c IS NULL) AS vn, COUNT(*) AS nb_v
           |        FROM db GROUP BY 1, 2) b
           |  USING (v, vn)) j
           |CROSS JOIN (SELECT (SELECT COUNT(*) FROM da) AS n_a,
           |                   (SELECT COUNT(*) FROM db) AS n_b) t""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH da AS (
         |  SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS price_bucket
         |  FROM lineitem WHERE l_orderkey % 2 = 0),
         |db AS (
         |  SELECT CAST(floor((l_extendedprice *
         |           CASE WHEN l_linenumber % 2 = 0 THEN CAST(1.1 AS DOUBLE)
         |                ELSE CAST(1.0 AS DOUBLE) END) / 5000) AS BIGINT)
         |           AS price_bucket
         |  FROM lineitem WHERE l_orderkey % 2 = 1)
         |$per""".stripMargin
    },
    "q_anomaly_flags" ->
      // the q_ewma fold + a strictly-past lag forecast + the doubled-
      // median Hampel test — exact-integer medians survive negatives
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |                  CAST(round(value * 1000000, 0) AS BIGINT) AS value_u6
        |           FROM events WHERE user_id % 20 = 0),
        |l AS (SELECT user_id, ts_us, event_id, value_u6,
        |             list(value_u6) OVER (PARTITION BY user_id
        |               ORDER BY ts_us, event_id
        |               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS lst
        |      FROM e),
        |w AS (SELECT user_id, ts_us, event_id, value_u6,
        |             list_reduce(lst,
        |               (acc, x) -> CAST(floor((acc * 3 + x) / 4) AS BIGINT))
        |               AS ewma_u6
        |      FROM l),
        |p AS (SELECT value_u6, lag(ewma_u6) OVER (PARTITION BY user_id
        |               ORDER BY ts_us, event_id) AS pred FROM w),
        |res AS (SELECT value_u6 - pred AS r FROM p WHERE pred IS NOT NULL),
        |m AS (SELECT CAST(median(r) * 2 AS BIGINT) AS med2 FROM res),
        |d AS (SELECT r, abs(r * 2 - (SELECT med2 FROM m)) AS d FROM res),
        |dm AS (SELECT CAST(median(d) * 2 AS BIGINT) AS dmed2 FROM d)
        |SELECT COUNT(*) AS n_scored,
        |       CAST(SUM(CASE WHEN d.d * 2 > (SELECT dmed2 FROM dm) * 3
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |       (SELECT med2 FROM m) AS med2,
        |       (SELECT dmed2 FROM dm) AS dmed2
        |FROM d""".stripMargin,
    "q_scd2" ->
      // the identical change-detect → version → close-bound window chain;
      // row_number cast to BIGINT per the house integer discipline
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
        |           FROM events),
        |c AS (SELECT *, lag(event_type) OVER
        |        (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
        |      FROM e),
        |ch AS (SELECT user_id, event_type, ts_us, event_id FROM c
        |       WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id,
        |       CAST(row_number() OVER w AS BIGINT) AS version,
        |       event_type AS attr,
        |       ts_us AS valid_from_us,
        |       lead(ts_us) OVER w AS valid_to_us,
        |       lead(ts_us) OVER w IS NULL AS is_current
        |FROM ch
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, version""".stripMargin,
    "q_ewma" ->
      // the same fixed-point ordered fold: DuckDB's list_reduce seeds
      // from the first element, matching the Spark side's slice-tail
      // fold with element_at(lst, 1) as init; /4 is a power of two so
      // floor((3·acc+x)/4) is the exact integer floor-div on both sides
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |                  CAST(round(value * 1000000, 0) AS BIGINT) AS value_u6
        |           FROM events WHERE user_id % 20 = 0),
        |l AS (SELECT user_id, ts_us, event_id, value_u6,
        |             list(value_u6) OVER (PARTITION BY user_id
        |               ORDER BY ts_us, event_id
        |               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS lst
        |      FROM e)
        |SELECT user_id, ts_us, event_id, value_u6,
        |       list_reduce(lst,
        |         (acc, x) -> CAST(floor((acc * 3 + x) / 4) AS BIGINT)) AS ewma_u6
        |FROM l ORDER BY user_id, ts_us, event_id""".stripMargin,
    "q_skew_report" ->
      """WITH c AS (SELECT event_type, COUNT(*) AS c FROM events GROUP BY 1)
        |SELECT COUNT(*) AS n_keys,
        |       CAST(SUM(c) AS BIGINT) AS n_rows,
        |       CAST(MAX(c) AS BIGINT) AS max_key_rows,
        |       CAST((SUM(c) * 100) // COUNT(*) AS BIGINT) AS mean_key_rows_x100,
        |       CAST((MAX(c) * COUNT(*) * 100) // SUM(c) AS BIGINT) AS skew_ratio_pct
        |FROM c""".stripMargin,
    "q_skew_join_salted" ->
      """WITH dim AS (
        |  SELECT event_type, COUNT(*) AS type_even_n
        |  FROM events WHERE event_id % 2 = 0 GROUP BY 1)
        |SELECT e.event_type, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
        |       MIN(d.type_even_n) AS type_even_n
        |FROM events e JOIN dim d ON d.event_type = e.event_type
        |GROUP BY 1 ORDER BY e.event_type""".stripMargin,
    "text_collocations" ->
      // the identical fenced-ln chain in the identical left-assoc order;
      // positions are 1-based here vs 0-based in Spark — the window
      // condition uses differences, so the offset cancels
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text),' ')) AS w,
        |         generate_subscripts(string_split(lower(text),' '),1) AS i
        |  FROM documents),
        |uni AS (SELECT w, COUNT(*) AS cw FROM tok GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS t FROM tok),
        |pairs AS (
        |  SELECT least(x.w, y.w) AS w_a, greatest(x.w, y.w) AS w_b
        |  FROM tok x JOIN tok y
        |    ON x.doc_id = y.doc_id AND y.i > x.i AND y.i <= x.i + 5),
        |ptot AS (SELECT COUNT(*) AS p FROM pairs),
        |pc AS (SELECT w_a, w_b, COUNT(*) AS c_ab
        |       FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 20)
        |SELECT pc.w_a, pc.w_b, CAST(pc.c_ab AS BIGINT) AS c_ab,
        |       ua.cw AS c_a, ub.cw AS c_b,
        |       ROUND(ROUND(ln(pc.c_ab), 6) - ROUND(ln(ptot.p), 6) -
        |             ROUND(ln(ua.cw), 6) - ROUND(ln(ub.cw), 6) +
        |             ROUND(ln(tot.t), 6) + ROUND(ln(tot.t), 6), 6) + 0.0 AS pmi
        |FROM pc JOIN uni ua ON ua.w = pc.w_a
        |        JOIN uni ub ON ub.w = pc.w_b
        |CROSS JOIN tot CROSS JOIN ptot
        |ORDER BY pmi DESC, w_a, w_b LIMIT 50""".stripMargin,
    "text_textrank" -> (
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text),' ')) AS w,
        |         generate_subscripts(string_split(lower(text),' '),1) AS i
        |  FROM documents),
        |pairs AS (
        |  SELECT least(x.w, y.w) AS w_a, greatest(x.w, y.w) AS w_b
        |  FROM tok x JOIN tok y
        |    ON x.doc_id = y.doc_id AND y.i > x.i AND y.i <= x.i + 5),
        |pc AS (SELECT w_a, w_b, COUNT(*) AS c_ab
        |       FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 20),
        |e0 AS (SELECT w_a AS a, w_b AS b FROM pc WHERE w_a <> w_b)
        |""".stripMargin + pageRankOracleIters +
      """SELECT node AS token, r AS rank FROM r3
        |ORDER BY rank DESC, token LIMIT 30""".stripMargin),
    "text_heavy_hitters" ->
      // brute-force form of the same statistic: the MG candidate pass is
      // output-invisible (superset + exact recount), so the oracle needs
      // no sketch replay — just the exact counts and the shared threshold
      s"""WITH tok AS (
         |  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents),
         |tot AS (SELECT COUNT(*) AS n_total FROM tok)
         |SELECT token, COUNT(*) AS n_occurrences,
         |       CAST((COUNT(*) * 1000000) // MIN(tot.n_total) AS BIGINT) AS share_ppm
         |FROM tok CROSS JOIN tot
         |GROUP BY token
         |HAVING COUNT(*) * $heavyHitterS >= MIN(tot.n_total)
         |ORDER BY n_occurrences DESC, token""".stripMargin,
    "text_hll_distinct" ->
      // full sketch replay: same md5 register/rank split (rank via binary-
      // string length — integer, no log), same EXACT integer harmonic sum
      // (2^62 >> rank summed wide), same one-shot rounded division and
      // 6-dp-rounded-ln linear-counting branch
      """WITH tok AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents),
        |h AS (SELECT md5(t) AS h FROM tok),
        |r AS (SELECT CAST(('0x'||substring(h, 1, 2)) AS BIGINT) AS reg,
        |             CAST(('0x'||substring(h, 3, 15)) AS BIGINT) AS v
        |      FROM h),
        |r2 AS (SELECT reg,
        |              CASE WHEN v = 0 THEN 61 ELSE 61 - length(bin(v)) END AS rank
        |       FROM r),
        |mx AS (SELECT reg, MAX(rank) AS mr FROM r2 GROUP BY reg),
        |agg AS (SELECT COUNT(*) AS present,
        |               SUM(4611686018427387904 >> mr) AS ssum
        |        FROM mx),
        |st AS (SELECT COUNT(*) AS n_tokens, COUNT(DISTINCT t) AS n_distinct_exact
        |       FROM tok),
        |x AS (SELECT n_tokens, n_distinct_exact,
        |             CAST(256 - present AS BIGINT) AS zero_registers,
        |             CAST(ssum + (256 - present) * CAST(4611686018427387904 AS HUGEINT)
        |                  AS DOUBLE) AS sd
        |      FROM agg CROSS JOIN st),
        |e AS (SELECT n_tokens, n_distinct_exact, zero_registers,
        |             round(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) +
        |                     CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE))
        |                   * CAST(256.0 AS DOUBLE) * CAST(256.0 AS DOUBLE)
        |                   * CAST(4611686018427387904 AS DOUBLE) / sd, 6) AS raw_estimate
        |      FROM x)
        |SELECT 256 AS m, CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(n_distinct_exact AS BIGINT) AS n_distinct_exact,
        |       zero_registers, raw_estimate,
        |       CASE WHEN raw_estimate <= 640.0 AND zero_registers > 0
        |            THEN round(CAST(256.0 AS DOUBLE) *
        |                   round(ln(CAST(256.0 AS DOUBLE) / zero_registers), 6), 6)
        |            ELSE raw_estimate END AS estimate
        |FROM e""".stripMargin,
    "text_encoding_stats" ->
      // identical planting (controls built via chr() so no raw control
      // bytes ride in SQL text), identical regex classes, length() =
      // code points on both engines
      s"""WITH syn AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 6 = 0 THEN ' damaged �� here' ELSE '' END ||
         |    CASE WHEN doc_id % 9 = 0 THEN ' ctl ' || chr(1) || chr(7) || ' end' ELSE '' END ||
         |    CASE WHEN doc_id % 5 = 0 THEN ' café naïve' ELSE '' END AS text
         |  FROM documents)
         |SELECT doc_id,
         |       CAST(length(text) AS BIGINT) AS n_chars,
         |       CAST(len(regexp_extract_all(text, '�')) AS BIGINT) AS n_replacement,
         |       CAST(len(regexp_extract_all(text, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]')) AS BIGINT) AS n_control,
         |       CAST(len(regexp_extract_all(text, '[^\\x00-\\x7f]')) AS BIGINT) AS n_non_ascii,
         |       (len(regexp_extract_all(text, '�')) +
         |        len(regexp_extract_all(text, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]')) = 0) AS clean
         |FROM syn ORDER BY doc_id""".stripMargin,
    "text_repetition_lines" ->
      // relational replay of the run-length fold: group lines per doc,
      // tally occurrences in groups of size >= 2 — different algorithm,
      // same integers
      """WITH syn AS (
        |  SELECT doc_id,
        |         replace(replace(replace(replace(text,
        |           'line ', 'line' || chr(10)),
        |           'value ', 'value' || chr(10)),
        |           'table ', 'table' || chr(10)),
        |           'scan ', 'scan' || chr(10)) AS text
        |  FROM documents),
        |l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM syn),
        |g AS (SELECT doc_id, line, COUNT(*) AS c, strlen(line) AS len
        |      FROM l GROUP BY 1, 2)
        |SELECT doc_id,
        |       CAST(SUM(c) AS BIGINT) AS n_lines,
        |       CAST(COUNT(*) AS BIGINT) AS n_distinct_lines,
        |       CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_line_occurrences,
        |       CAST(SUM(CASE WHEN c >= 2 THEN c * len ELSE 0 END) AS BIGINT) AS dup_line_chars,
        |       CAST(SUM(c * len) AS BIGINT) AS total_line_chars
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_pii_stats" -> {
      // identical planting, identical patterns (interpolated from the
      // shared constants), identical integer Luhn fold over the reversed
      // digit string
      val em = TextAnalysis.EmailPattern
      val ip = TextAnalysis.Ipv4Pattern
      val ph = TextAnalysis.PhonePattern
      val cd = TextAnalysis.CardPattern
      s"""WITH syn AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.invalid' ELSE '' END ||
         |    CASE WHEN doc_id % 4 = 0 THEN ' from 203.0.113.' || CAST(doc_id % 200 AS VARCHAR) ELSE '' END ||
         |    CASE WHEN doc_id % 5 = 0 THEN ' call +1 555 010 ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ELSE '' END ||
         |    CASE WHEN doc_id % 7 = 0 THEN ' card 4111111111111111 ok' ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0 THEN ' card 4111111111111112 bad' ELSE '' END AS text
         |  FROM documents),
         |c AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(text, '$em')) AS BIGINT) AS n_emails,
         |    CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ipv4,
         |    CAST(len(regexp_extract_all(text, '$ph')) AS BIGINT) AS n_phones,
         |    CAST(len(regexp_extract_all(text, '$cd')) AS BIGINT) AS n_card_candidates,
         |    CAST(len(list_filter(regexp_extract_all(text, '$cd'),
         |      d -> list_sum(list_transform(generate_series(1, strlen(d)),
         |        i -> CASE WHEN i % 2 = 0
         |          THEN 2 * (ascii(substring(reverse(d), i, 1)) - 48) -
         |            CASE WHEN ascii(substring(reverse(d), i, 1)) - 48 > 4 THEN 9 ELSE 0 END
         |          ELSE ascii(substring(reverse(d), i, 1)) - 48 END)) % 10 = 0))
         |      AS BIGINT) AS n_cards_valid
         |  FROM syn)
         |SELECT doc_id, n_emails, n_ipv4, n_phones, n_card_candidates, n_cards_valid,
         |       (n_emails + n_ipv4 + n_phones + n_cards_valid > 0) AS has_pii
         |FROM c ORDER BY doc_id""".stripMargin
    },
    "text_bpe_vocab" ->
      graft.operators.TextAnalysis.bpeVocabSql(4),
    "text_bpe_encode" ->
      graft.operators.TextAnalysis.bpeEncodeSql(merges = 4, maxDocId = 40L),
    "text_bpe_sampled" ->
      // replays training restricted to the SAME md5-bucket sample, then
      // encodes the same slice with the sampled merges
      graft.operators.TextAnalysis.bpeEncodeSql(merges = 4, maxDocId = 40L,
        trainWhere = graft.operators.TextAnalysis.bpeSampleWhereSql("doc_id", 0.25)),
    "text_vocab_coverage" ->
      // the same top-200 vocab (count desc, term asc) and the same
      // left-join coverage fold, truncating ppm on non-negatives
      """WITH tok AS MATERIALIZED (
        |  SELECT source, doc_id, unnest(string_split(lower(text),' ')) AS term
        |  FROM documents),
        |tf AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY 1),
        |vocab AS MATERIALIZED (
        |  SELECT term FROM tf ORDER BY c DESC, term LIMIT 200),
        |mk AS (SELECT tok.source, tok.doc_id, tok.term,
        |              CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END AS iv
        |       FROM tok LEFT JOIN vocab v ON v.term = tok.term)
        |SELECT source,
        |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |       CAST(SUM(1 - iv) AS BIGINT) AS n_oov,
        |       CAST(COUNT(DISTINCT CASE WHEN iv = 0 THEN term END) AS BIGINT)
        |         AS n_oov_terms,
        |       CAST((1000000 * SUM(1 - iv)) // COUNT(*) AS BIGINT) AS oov_ppm
        |FROM mk GROUP BY 1 ORDER BY source""".stripMargin,
    "text_fertility" ->
      // same unrolled training rounds, per-language integer fertility
      graft.operators.TextAnalysis.fertilitySql(merges = 4),
    "text_fertility_sampled" ->
      // training rounds restricted to the identical md5-bucket sample
      graft.operators.TextAnalysis.fertilitySql(merges = 4,
        trainWhere = graft.operators.TextAnalysis.bpeSampleWhereSql("doc_id", 0.25)),
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text),' ') AS w FROM documents),
        |tri AS (
        |  SELECT doc_id, w[i+1]||' '||w[i+2]||' '||w[i+3] AS g
        |  FROM (SELECT doc_id, w, unnest(range(len(w)-2)) AS i FROM t WHERE len(w) >= 3)),
        |bg AS (
        |  SELECT doc_id, w[i+1]||' '||w[i+2] AS g
        |  FROM (SELECT doc_id, w, unnest(range(len(w)-1)) AS i FROM t WHERE len(w) >= 2)),
        |ts AS (SELECT doc_id, COUNT(*) AS n_tri, COUNT(DISTINCT g) AS n_tri_d FROM tri GROUP BY 1),
        |bt AS (SELECT doc_id, COUNT(*) AS n_bg FROM bg GROUP BY 1),
        |bp AS (SELECT doc_id, MAX(c) AS top_n
        |       FROM (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1,2) GROUP BY 1)
        |SELECT t.doc_id,
        |       CAST(COALESCE(ts.n_tri, 0) AS BIGINT) AS n_trigrams,
        |       CAST(COALESCE(ts.n_tri_d, 0) AS BIGINT) AS n_distinct_trigrams,
        |       CAST(COALESCE(bt.n_bg, 0) AS BIGINT) AS n_bigrams,
        |       CAST(COALESCE(bp.top_n, 0) AS BIGINT) AS top_bigram_n,
        |       CASE WHEN COALESCE(ts.n_tri, 0) > 0
        |            THEN CAST(ts.n_tri - ts.n_tri_d AS DOUBLE) / ts.n_tri
        |            ELSE 0.0 END AS dup_trigram_frac,
        |       CASE WHEN COALESCE(bt.n_bg, 0) > 0
        |            THEN CAST(bp.top_n AS DOUBLE) / bt.n_bg
        |            ELSE 0.0 END AS top_bigram_frac
        |FROM t LEFT JOIN ts USING (doc_id)
        |       LEFT JOIN bt USING (doc_id)
        |       LEFT JOIN bp USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,
    "split_mix_weights" -> {
      val targets = Map("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.2)
      val tcase = graft.operators.Splits.mixTargetCaseSql("lang", targets)
      s"""WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
         |tot AS (SELECT COUNT(*) AS n_total FROM documents)
         |SELECT lang, n_docs,
         |       ROUND(CAST(n_docs AS DOUBLE) / n_total, 6) AS corpus_frac,
         |       $tcase AS target_share,
         |       ROUND(LEAST(1.0, $tcase * CAST(n_total AS DOUBLE) / n_docs), 6) AS weight
         |FROM c CROSS JOIN tot ORDER BY lang""".stripMargin
    },
    // the identical rounding chain as Splits.temperatureMix: exact p, powers
    // ROUNDED to 6 before anything downstream, DECIMAL normalizer sum,
    // single rounded divisions for q and sample_rate
    "pipeline_curate" ->
      // replays the three verified stages as one chain: the normalized
      // dedup key, the fenced-ln entropy (computed corpus-wide —
      // within-doc, so intersecting with the keeps is identical), and
      // the per-stratum sample window
      """WITH nk AS (
        |  SELECT doc_id,
        |         md5(nfc_normalize(regexp_replace(trim(lower(text)), '[ \t\n\r]+', ' ', 'g'))) AS k
        |  FROM documents),
        |keep AS (SELECT MIN(doc_id) AS doc_id FROM nk GROUP BY k),
        |tok AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS w FROM documents),
        |wc AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY 1,2),
        |nd AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM wc GROUP BY 1),
        |tm AS (
        |  SELECT wc.doc_id, nd.n,
        |         ROUND(CAST(wc.c AS DOUBLE) *
        |           (ROUND(ln(CAST(wc.c AS DOUBLE)),6) - ROUND(ln(CAST(nd.n AS DOUBLE)),6)),
        |           6) AS term
        |  FROM wc JOIN nd USING (doc_id)),
        |ent AS (
        |  SELECT doc_id FROM tm GROUP BY doc_id
        |  HAVING ROUND(-CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE)/MAX(n), 6)+0.0
        |         >= 2.8),
        |sel AS (
        |  SELECT d.doc_id, d.lang FROM documents d
        |  JOIN keep USING (doc_id) JOIN ent USING (doc_id))
        |SELECT doc_id, lang, sample_key FROM (
        |  SELECT doc_id, lang,
        |         md5(CAST(doc_id AS VARCHAR)||':11') AS sample_key,
        |         row_number() OVER (
        |           PARTITION BY lang
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)||':11'), doc_id) AS rn
        |  FROM sel)
        |WHERE rn <= 25 ORDER BY lang, sample_key, doc_id""".stripMargin,
    "split_mix_order" ->
      // the temperature CTE chain (shared arithmetic with
      // split_temperature_mix), the numeric 256-bucket keep test, then
      // one global shuffle-order window (oracle scale)
      """WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n_total FROM documents),
        |pp AS (
        |  SELECT lang, n_docs, CAST(n_docs AS DOUBLE) / n_total AS p,
        |         ROUND(pow(CAST(n_docs AS DOUBLE) / n_total, 0.3), 6) AS pw
        |  FROM c CROSS JOIN tot),
        |z AS (SELECT CAST(SUM(CAST(pw AS DECIMAL(28,12))) AS DOUBLE) AS z FROM pp),
        |qq AS (SELECT lang, p, ROUND(pw / z, 6) / p AS boost FROM pp CROSS JOIN z),
        |mb AS (SELECT MAX(boost) AS max_boost FROM qq),
        |rr AS (SELECT lang, ROUND(boost / max_boost, 6) AS sample_rate
        |       FROM qq CROSS JOIN mb),
        |keep AS (
        |  SELECT d.doc_id, d.lang FROM documents d JOIN rr USING (lang)
        |  WHERE CAST(('0x'||substring(md5(CAST(d.doc_id AS VARCHAR)),1,2)) AS BIGINT)
        |        < CAST(floor(rr.sample_rate * 256) AS BIGINT))
        |SELECT doc_id, lang,
        |       CAST(row_number() OVER (
        |         ORDER BY md5(CAST(doc_id AS VARCHAR)||':12345'), doc_id) - 1
        |         AS BIGINT) AS shuffle_pos
        |FROM keep ORDER BY shuffle_pos""".stripMargin,
    "split_epoch_plan" ->
      // integer epoch plan: HUGEINT-fenced budget·share and target·1e6
      // divisions (// floors ≡ Spark's decimal div on non-negatives)
      """WITH g AS (
        |  SELECT lang, COUNT(*) AS n_docs,
        |         CAST(SUM(n_chars) AS BIGINT) AS n_tokens,
        |         CAST(CASE lang WHEN 'en' THEN 400000 WHEN 'de' THEN 200000
        |              WHEN 'fr' THEN 200000 WHEN 'es' THEN 200000
        |              ELSE 0 END AS BIGINT) AS share_ppm
        |  FROM documents GROUP BY 1),
        |t AS (
        |  SELECT *, CAST((CAST(1000000 AS HUGEINT) * share_ppm) // 1000000
        |         AS BIGINT) AS target_tokens
        |  FROM g),
        |e AS (
        |  SELECT *, CASE WHEN n_tokens > 0 THEN
        |           CAST((CAST(target_tokens AS HUGEINT) * 1000000) // n_tokens
        |             AS BIGINT) END AS epochs_ppm
        |  FROM t)
        |SELECT lang, n_docs, n_tokens, share_ppm, target_tokens, epochs_ppm,
        |       COALESCE(epochs_ppm > 1000000, FALSE) AS is_repeated
        |FROM e ORDER BY lang""".stripMargin,
    "split_temperature_mix" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n_total FROM documents),
        |pp AS (
        |  SELECT lang, n_docs, CAST(n_docs AS DOUBLE) / n_total AS p,
        |         ROUND(pow(CAST(n_docs AS DOUBLE) / n_total, 0.3), 6) AS pw
        |  FROM c CROSS JOIN tot),
        |z AS (SELECT CAST(SUM(CAST(pw AS DECIMAL(28,12))) AS DOUBLE) AS z FROM pp),
        |qq AS (
        |  SELECT lang, n_docs, p, ROUND(pw / z, 6) AS q,
        |         ROUND(pw / z, 6) / p AS boost
        |  FROM pp CROSS JOIN z),
        |mb AS (SELECT MAX(boost) AS max_boost FROM qq)
        |SELECT lang, n_docs, ROUND(p, 6) AS p, q,
        |       ROUND(boost / max_boost, 6) AS sample_rate
        |FROM qq CROSS JOIN mb ORDER BY lang""".stripMargin,
    "text_rarity" ->
      // mean_freq is ONE int64/int64 division on both engines (no float
      // summation anywhere), so the double compares bit-exact
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text),' ')) AS word FROM documents),
        |freq AS (SELECT word, COUNT(*) AS freq FROM toks GROUP BY 1)
        |SELECT doc_id, CAST(SUM(freq) AS BIGINT) AS sum_freq, COUNT(*) AS n_tokens,
        |       CAST(CAST(SUM(freq) AS BIGINT) AS DOUBLE) / COUNT(*) AS mean_freq
        |FROM toks JOIN freq USING (word)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_tfidf_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text),' ')) AS word FROM documents),
        |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM toks GROUP BY 1,2),
        |dfreq AS (
        |  SELECT word, COUNT(*) AS df
        |  FROM (SELECT DISTINCT doc_id, word FROM toks) GROUP BY 1),
        |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
        |x AS (
        |  SELECT tf.doc_id, tf.word, tf.tf, dfreq.df,
        |         ROUND(tf.tf * ln(CAST(n_docs AS DOUBLE)/df), 6) AS tfidf
        |  FROM tf JOIN dfreq USING (word) CROSS JOIN nd)
        |SELECT doc_id, word, tf, df, tfidf FROM (
        |  SELECT x.*, row_number() OVER (PARTITION BY doc_id
        |                                 ORDER BY tfidf DESC, word) AS rn
        |  FROM x)
        |WHERE rn <= 3 ORDER BY doc_id, tfidf DESC, word""".stripMargin,
    "q_window_nth" ->
      """SELECT o_orderkey, o_custkey,
        |       nth_value(o_orderkey, 2) OVER w AS second_key,
        |       lag(o_orderkey, 1, -1) OVER w AS prev_or_neg1,
        |       last_value(CASE WHEN o_orderkey % 3 = 0 THEN o_orderkey END IGNORE NULLS)
        |         OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_div3
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_dist" ->
      """SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation, c_acctbal,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd
        |FROM customer WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal)
        |ORDER BY c_custkey""".stripMargin,
    "q_rollup" ->
      // GROUPING(a, b) bitmask: leftmost key = most significant bit, the
      // same convention as Spark's grouping_id; the integer-sum measure
      // is CAST back from DuckDB's HUGEINT
      """SELECT COALESCE(o_orderstatus, '<all>') AS status,
        |       COALESCE(o_orderpriority, '<all>') AS priority,
        |       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS lvl,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(o_orderkey % 1000) AS BIGINT) AS sum_key
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY lvl, status, priority""".stripMargin,
    "text_lm_score" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text),' ') AS w FROM documents),
        |bg AS (
        |  SELECT doc_id, w[i+1] AS w1, w[i+2] AS w2
        |  FROM (SELECT doc_id, w, unnest(range(len(w)-1)) AS i FROM t WHERE len(w) >= 2)),
        |c2t AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY 1,2),
        |c1t AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
        |lp AS (
        |  SELECT bg.doc_id, ROUND(ln(CAST(c2t.c2 AS DOUBLE)/c1t.c1), 6) AS lp
        |  FROM bg JOIN c2t USING (w1, w2) JOIN c1t USING (w1))
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |       CAST(SUM(CAST(lp AS DECIMAL(28,12))) AS DOUBLE) AS sum_logp,
        |       ROUND(CAST(SUM(CAST(lp AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*), 6) AS mean_logp
        |FROM lp GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "text_entropy" ->
      // identical term chain: integer counts, each ln fenced at 6 dp, one
      // rounded double product per (doc, token), decimal sum, edge round;
      // +0.0 normalizes the single-token doc's -0.0
      """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS w
        |             FROM documents),
        |wc AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY 1,2),
        |nd AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM wc GROUP BY 1),
        |tm AS (
        |  SELECT wc.doc_id, nd.n,
        |         ROUND(CAST(wc.c AS DOUBLE) *
        |           (ROUND(ln(CAST(wc.c AS DOUBLE)),6) - ROUND(ln(CAST(nd.n AS DOUBLE)),6)),
        |           6) AS term
        |  FROM wc JOIN nd USING (doc_id))
        |SELECT doc_id, MAX(n) AS n_tokens, COUNT(*) AS n_distinct,
        |       ROUND(-CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE)/MAX(n), 6)+0.0
        |         AS entropy
        |FROM tm GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "text_readability" ->
      """SELECT doc_id,
        |       greatest(len(string_split(lower(text), ' ')), 1) AS n_words,
        |       greatest(len(regexp_extract_all(lower(text), '[.!?]')), 1)
        |         AS n_sentences,
        |       CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
        |         AS n_syllables,
        |       206835
        |         - (1015 * greatest(len(string_split(lower(text), ' ')), 1))
        |           // greatest(len(regexp_extract_all(lower(text), '[.!?]')), 1)
        |         - (84600 * len(regexp_extract_all(lower(text), '[aeiouy]+')))
        |           // greatest(len(string_split(lower(text), ' ')), 1)
        |         AS flesch_m3
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_vocab_growth" ->
      // identical nested-prefix fold: per-token MIN doc bucket, per-bucket
      // token mass, 8 prefix sums; ln pre-quantized to integer micro-units
      // before the all-integer OLS, one ppm division at the end
      """WITH d AS (
        |  SELECT CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2))
        |           AS BIGINT) AS bkt,
        |         string_split(lower(text), ' ') AS toks
        |  FROM documents),
        |bt AS (SELECT bkt, CAST(SUM(len(toks)) AS BIGINT) AS nt
        |       FROM d GROUP BY bkt),
        |tm AS (SELECT term, MIN(bkt) AS mb
        |       FROM (SELECT bkt, unnest(toks) AS term FROM d) GROUP BY term),
        |mc AS (SELECT mb, CAST(COUNT(*) AS BIGINT) AS nv FROM tm GROUP BY mb),
        |ks AS (SELECT * FROM (VALUES (2), (4), (8), (16), (32), (64), (128),
        |         (256)) t(k)),
        |pn AS (SELECT ks.k, CAST(COALESCE(SUM(bt.nt), 0) AS BIGINT) AS n_tokens
        |       FROM ks LEFT JOIN bt ON bt.bkt < ks.k GROUP BY ks.k),
        |pv AS (SELECT ks.k, CAST(COALESCE(SUM(mc.nv), 0) AS BIGINT) AS vocab
        |       FROM ks LEFT JOIN mc ON mc.mb < ks.k GROUP BY ks.k),
        |pts AS (SELECT k, n_tokens, vocab FROM pn JOIN pv USING (k)),
        |lp AS (SELECT
        |         CAST(ROUND(ln(CAST(n_tokens AS DOUBLE)) * 1000000, 0) AS BIGINT) AS x,
        |         CAST(ROUND(ln(CAST(vocab AS DOUBLE)) * 1000000, 0) AS BIGINT) AS y
        |       FROM pts WHERE n_tokens > 0 AND vocab > 0),
        |fit AS (SELECT CAST(COUNT(*) AS BIGINT) AS p,
        |               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |               SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |               SUM(CAST(x AS HUGEINT) * x) AS sxx
        |        FROM lp),
        |beta AS (SELECT CASE WHEN p >= 2 AND (p * sxx - sx * CAST(sx AS HUGEINT)) > 0
        |                THEN CAST(sign(p * sxy - sx * CAST(sy AS HUGEINT)) AS BIGINT) *
        |                     CAST((CAST(1000000 AS HUGEINT) *
        |                           abs(p * sxy - sx * CAST(sy AS HUGEINT)))
        |                          // (p * sxx - sx * CAST(sx AS HUGEINT)) AS BIGINT)
        |                END AS beta_ppm
        |         FROM fit)
        |SELECT CAST(pts.k AS BIGINT) AS k_num, pts.n_tokens, pts.vocab,
        |       beta.beta_ppm
        |FROM pts CROSS JOIN beta ORDER BY k_num""".stripMargin,
    "text_zipf_fit" ->
      // identical bounded regression: ln of exact integers fenced at 8,
      // products at 12, all four sums in DECIMAL(38,12) (order-free),
      // slope/intercept as fixed-order double ops rounded to 6; the
      // intercept reuses the ROUNDED slope exactly as the Spark side does
      """WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS w
        |             FROM documents),
        |tc AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY 1),
        |top AS (SELECT w, c FROM tc ORDER BY c DESC, w LIMIT 500),
        |r AS (SELECT c, CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT)
        |               AS rank FROM top),
        |xy AS (SELECT round(ln(CAST(rank AS DOUBLE)), 8) AS x,
        |              round(ln(CAST(c AS DOUBLE)), 8) AS y FROM r),
        |s AS (SELECT COUNT(*) AS n,
        |             SUM(CAST(x AS DECIMAL(38,12))) AS sx,
        |             SUM(CAST(y AS DECIMAL(38,12))) AS sy,
        |             SUM(CAST(round(x*y, 12) AS DECIMAL(38,12))) AS sxy,
        |             SUM(CAST(round(x*x, 12) AS DECIMAL(38,12))) AS sxx
        |      FROM xy)
        |SELECT n AS n_top,
        |       round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
        |              - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) /
        |             (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
        |              - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)), 6) AS slope,
        |       round((CAST(sy AS DOUBLE) -
        |              round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
        |                     - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) /
        |                    (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
        |                     - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)), 6)
        |              * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept
        |FROM s""".stripMargin,
    // same bigram-LM CTEs as text_lm_score, then per-language rank-exact
    // order-statistic thresholds (quantile_disc ≡ approx_percentile at
    // accuracy ≥ group size — the q_percentile_approx contract) and the
    // identical strict-greater bucket rule
    "text_ccnet_buckets" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text),' ') AS w FROM documents),
        |bg AS (
        |  SELECT doc_id, w[i+1] AS w1, w[i+2] AS w2
        |  FROM (SELECT doc_id, w, unnest(range(len(w)-1)) AS i FROM t WHERE len(w) >= 2)),
        |c2t AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY 1,2),
        |c1t AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
        |lp AS (
        |  SELECT bg.doc_id, ROUND(ln(CAST(c2t.c2 AS DOUBLE)/c1t.c1), 6) AS lp
        |  FROM bg JOIN c2t USING (w1, w2) JOIN c1t USING (w1)),
        |sc AS (
        |  SELECT doc_id,
        |         ROUND(CAST(SUM(CAST(lp AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*), 6) AS mean_logp
        |  FROM lp GROUP BY 1),
        |sl AS (SELECT sc.doc_id, d.lang, sc.mean_logp
        |       FROM sc JOIN documents d USING (doc_id)),
        |th AS (SELECT lang, quantile_disc(mean_logp, 1.0/3) AS t_low,
        |              quantile_disc(mean_logp, 2.0/3) AS t_high
        |       FROM sl GROUP BY 1)
        |SELECT sl.doc_id, sl.lang, sl.mean_logp,
        |       CASE WHEN sl.mean_logp > th.t_high THEN 'head'
        |            WHEN sl.mean_logp > th.t_low THEN 'middle'
        |            ELSE 'tail' END AS bucket
        |FROM sl JOIN th USING (lang)
        |ORDER BY sl.doc_id""".stripMargin,
    "dedup_chunks" ->
      // non-overlapping 16-token chunks aligned at multiples of 16;
      // trailing partial chunks skipped (same universe as Dedup.chunkStats)
      """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
        |idx AS (
        |  SELECT doc_id, ts, unnest(range(0, len(ts) // 16)) AS i
        |  FROM toks WHERE len(ts) >= 16),
        |chunks AS (
        |  SELECT doc_id, array_to_string(ts[i*16+1 : i*16+16], ' ') AS chunk FROM idx)
        |SELECT md5(chunk) AS chunk_hash, COUNT(*) AS n_occurrences,
        |       COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS first_doc
        |FROM chunks GROUP BY 1 ORDER BY chunk_hash""".stripMargin,
    "dedup_chunk_scrub" ->
      // same chunk universe as dedup_chunks; scrub = chunks in >1 distinct
      // docs; rewrite = kept chunks in order + the partial tail (lossless
      // reassembly for unaffected docs)
      """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
        |idx AS (
        |  SELECT doc_id, ts, unnest(range(0, len(ts) // 16)) AS i
        |  FROM toks WHERE len(ts) >= 16),
        |chunks AS (
        |  SELECT doc_id, i, array_to_string(ts[i*16+1 : i*16+16], ' ') AS chunk FROM idx),
        |scrub AS (
        |  SELECT md5(chunk) AS ch FROM chunks GROUP BY 1
        |  HAVING COUNT(DISTINCT doc_id) > 1),
        |kept AS (
        |  SELECT doc_id, string_agg(chunk, ' ' ORDER BY i) AS kept_txt,
        |         COUNT(*) AS n_kept
        |  FROM chunks WHERE md5(chunk) NOT IN (SELECT ch FROM scrub)
        |  GROUP BY doc_id),
        |base AS (
        |  -- COALESCE: DuckDB's array_to_string of an EMPTY list is NULL
        |  -- where Spark's array_join is '' (exact-multiple docs have an
        |  -- empty tail slice; fully-scrubbed docs an empty filter result)
        |  SELECT doc_id, len(ts) // 16 AS n_chunks,
        |         COALESCE(array_to_string(ts[(len(ts) // 16) * 16 + 1 : len(ts)], ' '), '') AS tail_txt
        |  FROM toks)
        |SELECT b.doc_id,
        |       COALESCE(array_to_string(
        |         list_filter([COALESCE(k.kept_txt, ''), b.tail_txt], p -> len(p) > 0),
        |         ' '), '') AS scrubbed_text,
        |       CAST(b.n_chunks AS BIGINT) AS n_chunks,
        |       CAST(b.n_chunks - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed
        |FROM base b LEFT JOIN kept k USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,
    "dedup_substring" ->
      // every OVERLAPPING 4-token window position whose window text repeats
      // corpus-wide (COUNT over the window md5 ≥ 2), merged per doc into
      // maximal intervals via running-max break detection — identical rule
      // to Dedup.substringSpans. Positions 1-based; the -1000000000 break
      // sentinel matches the Spark side (p ≥ 1 always)
      """WITH toks AS (SELECT doc_id, string_split(lower(text),' ') AS ts FROM documents),
        |g AS (
        |  SELECT doc_id, p, md5(array_to_string(ts[p:p+3], ' ')) AS gh
        |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts)-3)) AS p
        |        FROM toks WHERE len(ts) >= 4)),
        |occ AS (
        |  SELECT doc_id, p FROM
        |    (SELECT doc_id, p, COUNT(*) OVER (PARTITION BY gh) AS c FROM g)
        |  WHERE c >= 2),
        |isl AS (
        |  SELECT doc_id, p,
        |         CASE WHEN p > COALESCE(MAX(p) OVER (PARTITION BY doc_id ORDER BY p
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1000000000) + 4
        |              THEN 1 ELSE 0 END AS brk
        |  FROM occ),
        |i2 AS (
        |  SELECT doc_id, p,
        |         SUM(brk) OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING) AS island
        |  FROM isl)
        |SELECT doc_id, CAST(MIN(p) AS BIGINT) AS span_start,
        |       CAST(MAX(p)+3 AS BIGINT) AS span_end,
        |       CAST(MAX(p)+3-MIN(p)+1 AS BIGINT) AS n_tokens
        |FROM i2 GROUP BY doc_id, island ORDER BY doc_id, span_start""".stripMargin,
    "dedup_substring_scrub" ->
      // same duplicated-window universe; canonical occurrence = row_number 1
      // by (doc_id, p) within the window hash; a token survives iff not
      // covered by any duplicated window OR covered by a canonical one
      """WITH toks AS (SELECT doc_id, string_split(lower(text),' ') AS ts FROM documents),
        |tok AS (SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts,1) AS q FROM toks),
        |g AS (
        |  SELECT doc_id, p, md5(array_to_string(ts[p:p+3], ' ')) AS gh
        |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts)-3)) AS p
        |        FROM toks WHERE len(ts) >= 4)),
        |docc AS (
        |  SELECT doc_id, p,
        |         COUNT(*) OVER (PARTITION BY gh) AS c,
        |         ROW_NUMBER() OVER (PARTITION BY gh ORDER BY doc_id, p) AS rn
        |  FROM g),
        |dup AS (SELECT doc_id, p, (rn = 1) AS canon FROM docc WHERE c >= 2),
        |cover AS (
        |  SELECT doc_id, p + off AS q, MAX(canon) AS canon_cover
        |  FROM (SELECT doc_id, p, canon, unnest(generate_series(0, 3)) AS off FROM dup)
        |  GROUP BY 1, 2),
        |keepj AS (
        |  SELECT t.doc_id, t.q, t.tok, COALESCE(c.canon_cover, TRUE) AS keep
        |  FROM tok t LEFT JOIN cover c ON c.doc_id = t.doc_id AND c.q = t.q)
        |SELECT doc_id,
        |       COALESCE(string_agg(CASE WHEN keep THEN tok END, ' ' ORDER BY q), '') AS scrubbed_text,
        |       COUNT(*) AS n_tokens,
        |       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
        |FROM keepj GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_line_scrub" ->
      // identical line-ification + boilerplate planting; the boilerplate
      // set is a relational GROUP BY ... HAVING over distinct doc counts,
      // the scrub a LEFT JOIN + ordered string_agg — same strings, same
      // integers
      """WITH syn AS (
        |  SELECT doc_id,
        |         replace(replace(replace(replace(text,
        |           'line ', 'line' || chr(10)),
        |           'value ', 'value' || chr(10)),
        |           'table ', 'table' || chr(10)),
        |           'scan ', 'scan' || chr(10)) ||
        |         CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'Subscribe to our newsletter today' ELSE '' END ||
        |         CASE WHEN doc_id % 6 = 0 THEN chr(10) || 'Copyright 2026 Example Corp' ELSE '' END AS text
        |  FROM documents),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS la FROM syn),
        |l AS (SELECT doc_id, unnest(la) AS line, generate_subscripts(la, 1) AS pos FROM ls),
        |b AS (SELECT line FROM l WHERE strlen(trim(line)) > 0
        |      GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 5),
        |f AS (SELECT l.doc_id, l.pos, l.line, (b.line IS NULL) AS keep
        |      FROM l LEFT JOIN b ON l.line = b.line)
        |SELECT doc_id,
        |       COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), '') AS clean_text,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines,
        |       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
        |       CAST(SUM(CASE WHEN keep THEN 0 ELSE strlen(line) END) AS BIGINT) AS removed_chars
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "hygiene_url_dedup" ->
      // the synthetic-url CASE mirrors withSyntheticUrl; the
      // canonicalization CTE chain mirrors Hygiene.canonicalizeUrl step
      // for step (fragment, lower scheme/host, default port, www,
      // tracked params, trailing ?/). DuckDB regexp_replace needs the
      // explicit 'g' flag where Spark replaces all matches
      """WITH raw AS (
        |  SELECT doc_id,
        |    CASE doc_id % 5
        |      WHEN 0 THEN 'https://example.com/articles/' || CAST(doc_id % 8 AS VARCHAR)
        |      WHEN 1 THEN 'HTTPS://WWW.EXAMPLE.COM/articles/' || CAST(doc_id % 8 AS VARCHAR) || '/'
        |      WHEN 2 THEN 'https://example.com:443/articles/' || CAST(doc_id % 8 AS VARCHAR) || '?utm_source=feed&utm_medium=rss'
        |      WHEN 3 THEN 'https://example.com/articles/' || CAST(doc_id % 8 AS VARCHAR) || '?id=' || CAST(doc_id % 7 AS VARCHAR) || '&utm_campaign=x#frag'
        |      ELSE 'http://tracker.example.org:80/articles/' || CAST(doc_id % 8 AS VARCHAR) || '?fbclid=abc'
        |    END AS url
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(url, '#.*', '') AS f FROM raw),
        |s2 AS (SELECT doc_id, f,
        |       lower(regexp_extract(f, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |       lower(regexp_extract(f, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport
        |       FROM s1),
        |s3 AS (SELECT doc_id, scheme,
        |       CASE WHEN scheme = 'http' AND hostport LIKE '%:80' THEN substr(hostport, 1, length(hostport)-3)
        |            WHEN scheme = 'https' AND hostport LIKE '%:443' THEN substr(hostport, 1, length(hostport)-4)
        |            ELSE hostport END AS h1,
        |       CASE WHEN scheme = '' THEN f
        |            ELSE substr(f, length(scheme) + 3 + length(hostport) + 1) END AS rest
        |       FROM s2),
        |s4 AS (SELECT doc_id, scheme,
        |       CASE WHEN h1 LIKE 'www.%' THEN substr(h1, 5) ELSE h1 END AS host,
        |       regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |         rest, '&(utm_[^=&]*|fbclid|gclid)=[^&]*', '', 'g'),
        |         '\?(utm_[^=&]*|fbclid|gclid)=[^&]*&', '?'),
        |         '\?(utm_[^=&]*|fbclid|gclid)=[^&]*$', ''),
        |         '\?$', '') AS r
        |       FROM s3),
        |s5 AS (SELECT doc_id,
        |       CASE WHEN scheme = '' THEN r ELSE scheme || '://' || host || r END AS j
        |       FROM s4),
        |canon AS (SELECT doc_id,
        |       CASE WHEN j LIKE '%/' AND j NOT LIKE '%://' THEN substr(j, 1, length(j)-1) ELSE j END AS canonical_url
        |       FROM s5)
        |SELECT canonical_url, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM canon GROUP BY 1 ORDER BY 1""".stripMargin,
    "hygiene_domain_filter" ->
      // same canonicalization chain; registered domain = last two
      // dot-labels of the (port-stripped) host; blocklist anti-join
      """WITH raw AS (
        |  SELECT doc_id,
        |    CASE doc_id % 5
        |      WHEN 0 THEN 'https://example.com/articles/' || CAST(doc_id % 8 AS VARCHAR)
        |      WHEN 1 THEN 'HTTPS://WWW.EXAMPLE.COM/articles/' || CAST(doc_id % 8 AS VARCHAR) || '/'
        |      WHEN 2 THEN 'https://example.com:443/articles/' || CAST(doc_id % 8 AS VARCHAR) || '?utm_source=feed&utm_medium=rss'
        |      WHEN 3 THEN 'https://example.com/articles/' || CAST(doc_id % 8 AS VARCHAR) || '?id=' || CAST(doc_id % 7 AS VARCHAR) || '&utm_campaign=x#frag'
        |      ELSE 'http://tracker.example.org:80/articles/' || CAST(doc_id % 8 AS VARCHAR) || '?fbclid=abc'
        |    END AS url
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(url, '#.*', '') AS f FROM raw),
        |s2 AS (SELECT doc_id, f,
        |       lower(regexp_extract(f, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |       lower(regexp_extract(f, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport
        |       FROM s1),
        |s3 AS (SELECT doc_id, scheme,
        |       CASE WHEN scheme = 'http' AND hostport LIKE '%:80' THEN substr(hostport, 1, length(hostport)-3)
        |            WHEN scheme = 'https' AND hostport LIKE '%:443' THEN substr(hostport, 1, length(hostport)-4)
        |            ELSE hostport END AS h1,
        |       CASE WHEN scheme = '' THEN f
        |            ELSE substr(f, length(scheme) + 3 + length(hostport) + 1) END AS rest
        |       FROM s2),
        |s4 AS (SELECT doc_id, scheme,
        |       CASE WHEN h1 LIKE 'www.%' THEN substr(h1, 5) ELSE h1 END AS host,
        |       regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |         rest, '&(utm_[^=&]*|fbclid|gclid)=[^&]*', '', 'g'),
        |         '\?(utm_[^=&]*|fbclid|gclid)=[^&]*&', '?'),
        |         '\?(utm_[^=&]*|fbclid|gclid)=[^&]*$', ''),
        |         '\?$', '') AS r
        |       FROM s3),
        |s5 AS (SELECT doc_id,
        |       CASE WHEN scheme = '' THEN r ELSE scheme || '://' || host || r END AS j
        |       FROM s4),
        |canon AS (SELECT doc_id,
        |       CASE WHEN j LIKE '%/' AND j NOT LIKE '%://' THEN substr(j, 1, length(j)-1) ELSE j END AS canonical_url
        |       FROM s5),
        |dom AS (SELECT doc_id, canonical_url,
        |       regexp_extract(regexp_replace(
        |         regexp_extract(canonical_url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
        |         ':[0-9]+$', ''), '([^.]+\.[^.]+)$', 1) AS domain
        |       FROM canon)
        |SELECT doc_id, canonical_url, domain FROM dom
        |WHERE domain NOT IN ('example.org', 'ads.invalid')
        |ORDER BY doc_id""".stripMargin,
    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text),' ')) AS word FROM documents),
        |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM toks GROUP BY 1,2),
        |dfreq AS (
        |  SELECT word, COUNT(*) AS df
        |  FROM (SELECT DISTINCT doc_id, word FROM toks) GROUP BY 1),
        |nd AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT tf.doc_id, tf.word, tf.tf, dfreq.df,
        |       ROUND(tf.tf * ln(CAST(n_docs AS DOUBLE)/df), 6) AS tfidf
        |FROM tf JOIN dfreq USING (word) CROSS JOIN nd
        |ORDER BY doc_id, word""".stripMargin,
    "mm_scene_cuts" ->
      // same VARCHAR≡BINARY ASCII contract as mm_frames; the level is an
      // exact integer fold, the cut rule an integer compare — replayed
      // with generate_series + a lag window
      """WITH fr AS (
        |  SELECT doc_id, u.i AS frame_idx,
        |         substring(text, CAST(u.i*64+1 AS INT), 64) AS f
        |  FROM documents,
        |       unnest(generate_series(0,
        |         GREATEST(1, CAST(ceil(length(text)/64.0) AS BIGINT))-1)) AS u(i)),
        |sums AS (
        |  SELECT fr.doc_id, fr.frame_idx,
        |         CAST(COALESCE(SUM(ascii(substring(fr.f, CAST(v.j AS INT), 1))), 0) * 1000
        |              // length(fr.f) AS BIGINT) AS lvl
        |  FROM fr, unnest(generate_series(1, length(fr.f))) AS v(j)
        |  GROUP BY 1, 2, length(fr.f)),
        |d AS (
        |  SELECT doc_id, frame_idx, lvl,
        |         lag(lvl) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
        |  FROM sums)
        |SELECT doc_id, COUNT(*) AS n_frames,
        |       CAST(COALESCE(SUM(CASE WHEN abs(lvl - prev) > 4000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_cuts,
        |       CAST(COALESCE(MAX(abs(lvl - prev)), 0) AS BIGINT) AS max_jump
        |FROM d GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "mm_frames" ->
      // NOTE: the oracle slices the VARCHAR where Spark slices the BINARY
      // payload — equivalent because the fixture corpus is pure ASCII
      // (verified); n_frames = max(1, ceil(len/256)), no phantom trailing
      // frame on exact multiples
      """WITH p AS (
        |  SELECT doc_id, text,
        |         greatest(1, CAST(ceil(length(text)/256.0) AS BIGINT)) AS nf
        |  FROM documents)
        |SELECT doc_id, unnest(range(nf)) AS frame_idx,
        |       md5(substring(text, CAST(unnest(range(nf))*256 + 1 AS BIGINT), 256)) AS frame_md5,
        |       CAST(length(substring(text, CAST(unnest(range(nf))*256 + 1 AS BIGINT), 256)) AS BIGINT) AS frame_bytes
        |FROM p ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_frame_dedup" ->
      // same VARCHAR-slice equivalence note as mm_frames (pure-ASCII
      // corpus); group the frame hashes, keep groups of >= 2
      """WITH p AS (
        |  SELECT doc_id, text,
        |         greatest(1, CAST(ceil(length(text)/64.0) AS BIGINT)) AS nf
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, unnest(range(nf)) AS frame_idx,
        |         md5(substring(text, CAST(unnest(range(nf))*64 + 1 AS BIGINT), 64)) AS frame_md5
        |  FROM p)
        |SELECT frame_md5,
        |       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
        |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |       MIN(doc_id) AS first_doc,
        |       CAST(MIN(frame_idx) AS BIGINT) AS min_frame_idx
        |FROM f GROUP BY frame_md5 HAVING COUNT(*) >= 2
        |ORDER BY frame_md5""".stripMargin,
    "mm_binary_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |       sha256(text) AS sha256,
        |       greatest(1, CAST(ceil(octet_length(encode(text))/256.0) AS BIGINT)) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    // closed-form replay of the gradient fixtures + the exact integer
    // average-hash bit rule: SQL pixel g-values scale the Spark side's
    // r+g+b by exactly 3, which cancels in the cross-multiplied
    // comparison (cs·64 > ts at 16×16/8×8 ⇔ cellSum·W·H > totalSum·n);
    // the brightness term cancels the same way — only structure decides
    // bits, exactly the perceptual-collapse claim under test
    "mm_phash_dup" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |px AS (
        |  SELECT doc_id, x, y,
        |         ((x*13*(doc_id % 4 + 1) + y*29) % 64) + (doc_id % 128) AS g
        |  FROM ids, generate_series(0, 15) t1(x), generate_series(0, 15) t2(y)
        |  WHERE doc_id % 10 <> 0),
        |cells AS (
        |  SELECT doc_id, x // 2 AS ci, y // 2 AS cj, SUM(g) AS cs
        |  FROM px GROUP BY 1, 2, 3),
        |tot AS (SELECT doc_id, SUM(g) AS ts FROM px GROUP BY 1),
        |bits AS (
        |  SELECT c.doc_id, (cj*8 + ci) AS idx,
        |         CASE WHEN c.cs*64 > t.ts THEN 1 ELSE 0 END AS b
        |  FROM cells c JOIN tot t USING (doc_id)),
        |hsh AS (
        |  SELECT doc_id,
        |         CAST(SUM(CASE WHEN idx < 32 THEN b * (1::BIGINT << idx) ELSE 0 END) AS BIGINT) AS ahash_hi,
        |         CAST(SUM(CASE WHEN idx >= 32 THEN b * (1::BIGINT << (idx - 32)) ELSE 0 END) AS BIGINT) AS ahash_lo
        |  FROM bits GROUP BY 1),
        |allh AS (
        |  SELECT doc_id, ahash_hi, ahash_lo FROM hsh
        |  UNION ALL
        |  SELECT doc_id, CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
        |  FROM ids WHERE doc_id % 10 = 0),
        |grp AS (
        |  SELECT ahash_hi, ahash_lo, MIN(doc_id) AS rep_id, COUNT(*) AS n_dups
        |  FROM allh WHERE ahash_hi >= 0 GROUP BY 1, 2)
        |SELECT a.doc_id, a.ahash_hi, a.ahash_lo, g.rep_id, g.n_dups
        |FROM allh a
        |LEFT JOIN grp g ON g.ahash_hi = a.ahash_hi AND g.ahash_lo = a.ahash_lo
        |ORDER BY a.doc_id""".stripMargin,
    "mm_image_features" ->
      // closed-form expectations of the synthesized solid-color PNGs: the
      // Spark side must reproduce these through a real encode/decode
      """SELECT doc_id,
        |       CASE WHEN doc_id % 10 = 0 THEN -1 ELSE doc_id % 7 + 1 END AS width,
        |       CASE WHEN doc_id % 10 = 0 THEN -1 ELSE doc_id % 5 + 1 END AS height,
        |       CASE WHEN doc_id % 10 = 0 THEN 0 ELSE (doc_id * 37) % 256 END AS mean_r_int,
        |       CASE WHEN doc_id % 10 = 0 THEN 0 ELSE (doc_id * 59) % 256 END AS mean_g_int,
        |       CASE WHEN doc_id % 10 = 0 THEN 0 ELSE (doc_id * 83) % 256 END AS mean_b_int
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_audio_features" ->
      // closed-form expectations of the synthesized PCM clips: the Spark
      // side must reproduce these through a real WAV write + RIFF parse
      """WITH s AS (
        |  SELECT doc_id, unnest(range(0, doc_id % 50 + 10)) AS i
        |  FROM documents WHERE doc_id % 10 <> 0),
        |a AS (
        |  SELECT doc_id,
        |         SUM(((doc_id * 31 + i * 17) % 65536) - 32768) AS sum_amp,
        |         MAX(ABS(((doc_id * 31 + i * 17) % 65536) - 32768)) AS peak_amp
        |  FROM s GROUP BY 1)
        |SELECT d.doc_id,
        |       CAST(CASE WHEN d.doc_id % 10 = 0 THEN -1
        |            ELSE 8000 + (d.doc_id % 3) * 4000 END AS BIGINT) AS sample_rate,
        |       CAST(CASE WHEN d.doc_id % 10 = 0 THEN -1
        |            ELSE d.doc_id % 50 + 10 END AS BIGINT) AS n_samples,
        |       CAST(COALESCE(a.sum_amp, 0) AS BIGINT) AS sum_amp,
        |       CAST(COALESCE(a.peak_amp, 0) AS BIGINT) AS peak_amp
        |FROM documents d LEFT JOIN a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "mm_mp4_meta" ->
      // closed-form expectations of the synthesized ISO-BMFF payloads: the
      // Spark side must reproduce these through a real MP4 write + box
      // walk; both corruption lanes (garbage magic, truncated moov) read
      // all -1s. Odd ids carry a VERSION-1 mvhd whose 64-bit duration is
      // pushed past 2^32 — the v1 read path is value-pinned, not just
      // exercised. duration·1000 and timescale are positive BIGINTs, so
      // DuckDB // and Spark DIV agree (floor == truncate on non-negatives)
      """WITH f AS (
        |  SELECT doc_id,
        |         600 + (doc_id % 5) * 400 AS ts,
        |         (doc_id % 240 + 60) * 100 +
        |           CASE WHEN doc_id % 2 = 1
        |                THEN (doc_id % 3) * 4294967296 ELSE 0 END AS dur
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(CASE WHEN doc_id % 10 IN (0, 5) THEN -1
        |            ELSE ts END AS BIGINT) AS timescale,
        |       CAST(CASE WHEN doc_id % 10 IN (0, 5) THEN -1
        |            ELSE dur END AS BIGINT) AS duration,
        |       CAST(CASE WHEN doc_id % 10 IN (0, 5) THEN -1
        |            ELSE 1 + doc_id % 3 END AS BIGINT) AS n_tracks,
        |       CAST(CASE WHEN doc_id % 10 IN (0, 5) THEN -1
        |            ELSE (dur * 1000) // ts END AS BIGINT)
        |         AS duration_ms
        |FROM f ORDER BY doc_id""".stripMargin,
    "mm_features" ->
      // recomputes the byte-lane profile's math: lane i accumulates
      // byte/255.0 over payload positions ≡ i (mod 8), so lane×255 rounds to
      // the exact per-lane byte sum; ord() == byte value on the (verified)
      // pure-ASCII corpus. Empty texts still own 8 zero lanes (LEFT JOIN).
      """WITH ch AS (
        |  SELECT doc_id, CAST(u AS BIGINT) AS pos,
        |         ord(substring(text, CAST(u + 1 AS INTEGER), 1)) AS bv
        |  FROM (SELECT doc_id, text, unnest(range(length(text))) AS u FROM documents)),
        |lane AS (
        |  SELECT doc_id, pos % 8 AS i, SUM(bv) AS s FROM ch GROUP BY 1, 2),
        |docs8 AS (
        |  SELECT doc_id,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |         greatest(1, CAST(ceil(octet_length(encode(text))/256.0) AS BIGINT)) AS n_frames,
        |         CAST(unnest(range(8)) AS BIGINT) AS i
        |  FROM documents)
        |SELECT d.doc_id, d.byte_len, d.n_frames, d.i,
        |       CAST(COALESCE(lane.s, 0) AS BIGINT) AS lane_byte_sum
        |FROM docs8 d LEFT JOIN lane ON lane.doc_id = d.doc_id AND lane.i = d.i
        |ORDER BY d.doc_id, d.i""".stripMargin,
    "mm_container_sniff" ->
      // same closed-form magic synthesis, same first-match CASE order as
      // the operator (RIFF family first, offset-5 ftyp probe last);
      // ASCII magics make octet-level sniffing ≡ char-level here
      """WITH p AS (
        |  SELECT doc_id,
        |         (CASE doc_id % 9
        |            WHEN 0 THEN 'RIFF0000WAVE' WHEN 1 THEN 'RIFF0000AVI '
        |            WHEN 2 THEN 'RIFF0000XXXX' WHEN 3 THEN 'GIF89a'
        |            WHEN 4 THEN '%PDF-1.4' WHEN 5 THEN 'OggS'
        |            WHEN 6 THEN 'ID3v' WHEN 7 THEN '0000ftypisom'
        |            ELSE '' END) || text AS txt
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |         CASE WHEN substring(txt,1,4) = 'RIFF' THEN
        |                CASE WHEN substring(txt,9,4) = 'WAVE' THEN 'riff_wave'
        |                     WHEN substring(txt,9,4) = 'AVI ' THEN 'riff_avi'
        |                     ELSE 'riff_other' END
        |              WHEN substring(txt,1,4) = 'GIF8' THEN 'gif'
        |              WHEN substring(txt,1,4) = '%PDF' THEN 'pdf'
        |              WHEN substring(txt,1,4) = 'OggS' THEN 'ogg'
        |              WHEN substring(txt,1,3) = 'ID3' THEN 'mp3_id3'
        |              WHEN substring(txt,5,4) = 'ftyp' THEN 'mp4'
        |              ELSE 'unknown' END AS container,
        |         CAST(octet_length(encode(txt)) AS BIGINT) AS nbytes
        |  FROM p)
        |SELECT container, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(nbytes) AS BIGINT) AS sum_bytes,
        |       MIN(doc_id) AS first_doc
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "mm_cdc_chunks" -> {
      // the identical rolling polynomial: h(i) = Σ_{j<8} byte(i−j)·31^j,
      // boundary iff 64 | h(i) or i = len — term list generated so both
      // engines share the exact coefficients
      val hTerms = (0 until 8).map { j =>
        val coef = BigInt(31).pow(j).toLong
        if (j == 0) s"CAST(ord(substring(txt, CAST(i AS INT), 1)) AS BIGINT) * $coef"
        else s"CAST(CASE WHEN i >= ${j + 1} THEN ord(substring(txt, CAST(i - $j AS INT), 1)) ELSE 0 END AS BIGINT) * $coef"
      }.mkString("\n        |         + ")
      s"""WITH p AS (
         |  SELECT doc_id,
         |         repeat(chr(CAST(97 + doc_id % 5 AS INT)), CAST(doc_id % 10 AS INT)) ||
         |         repeat('segment' || CAST(doc_id // 10 AS VARCHAR) || ' ', 20) AS txt
         |  FROM documents),
         |b AS (SELECT doc_id, txt, CAST(length(txt) AS BIGINT) AS len FROM p),
         |pos AS (SELECT doc_id, txt, len,
         |               CAST(unnest(range(1, len + 1)) AS BIGINT) AS i FROM b),
         |hp AS (
         |  SELECT doc_id, txt, len, i,
         |         $hTerms AS h
         |  FROM pos),
         |bnd AS (
         |  SELECT doc_id, txt, i AS end_pos FROM hp
         |  WHERE i = len OR (i >= 8 AND h % 64 = 0)),
         |sp AS (
         |  SELECT doc_id, txt, end_pos,
         |         COALESCE(lag(end_pos) OVER (PARTITION BY doc_id ORDER BY end_pos), 0) + 1
         |           AS start_pos
         |  FROM bnd),
         |ch AS (
         |  SELECT doc_id,
         |         md5(substring(txt, CAST(start_pos AS INT),
         |                       CAST(end_pos - start_pos + 1 AS INT))) AS chunk_md5,
         |         end_pos - start_pos + 1 AS cb
         |  FROM sp)
         |SELECT chunk_md5, COUNT(*) AS n_occurrences,
         |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |       MIN(doc_id) AS first_doc,
         |       MIN(cb) AS chunk_bytes
         |FROM ch GROUP BY 1 HAVING COUNT(*) >= 2
         |ORDER BY chunk_md5""".stripMargin
    },
    "mm_cdc_chunks_clamped" -> {
      val hTerms = (0 until 8).map { j =>
        val coef = BigInt(31).pow(j).toLong
        if (j == 0) s"CAST(ord(substring(txt, CAST(i AS INT), 1)) AS BIGINT) * $coef"
        else s"CAST(CASE WHEN i >= ${j + 1} THEN ord(substring(txt, CAST(i - $j AS INT), 1)) ELSE 0 END AS BIGINT) * $coef"
      }.mkString("\n        |         + ")
      // the greedy thinning replays as RECURSIVE reachability — next
      // kept boundary = MIN candidate ≥ last + minChunk, provably the
      // same rule as Spark's left fold. (A list_reduce struct-
      // accumulator fold was the first attempt; DuckDB 1.0 CLOBBERS the
      // accumulator when the keep branch fires twice in a row —
      // [24,54,84] folds to [84] — so the oracle avoids struct lambdas.)
      s"""WITH RECURSIVE p AS (
         |  SELECT doc_id,
         |         repeat(chr(CAST(97 + doc_id % 5 AS INT)), CAST(doc_id % 10 AS INT)) ||
         |         repeat('segment' || CAST(doc_id // 10 AS VARCHAR) || ' ', 20) AS txt
         |  FROM documents),
         |b AS (SELECT doc_id, txt, CAST(length(txt) AS BIGINT) AS len FROM p),
         |pos AS (SELECT doc_id, txt, len,
         |               CAST(unnest(range(1, len + 1)) AS BIGINT) AS i FROM b),
         |hp AS (
         |  SELECT doc_id, len, i,
         |         $hTerms AS h
         |  FROM pos),
         |cand AS (SELECT doc_id, i FROM hp WHERE i >= 8 AND h % 64 = 0),
         |keep(doc_id, kb) AS (
         |  SELECT doc_id, MIN(i) FROM cand WHERE i >= 24 GROUP BY doc_id
         |  UNION ALL
         |  SELECT k.doc_id,
         |         (SELECT MIN(c.i) FROM cand c
         |          WHERE c.doc_id = k.doc_id AND c.i >= k.kb + 24)
         |  FROM keep k
         |  WHERE EXISTS (SELECT 1 FROM cand c
         |                WHERE c.doc_id = k.doc_id AND c.i >= k.kb + 24)),
         |bd AS (SELECT doc_id, kb AS end_pos FROM keep
         |       UNION SELECT doc_id, len AS end_pos FROM b),
         |sp AS (SELECT bd.doc_id, b.txt, bd.end_pos,
         |              COALESCE(lag(bd.end_pos) OVER (PARTITION BY bd.doc_id
         |                ORDER BY bd.end_pos), 0) + 1 AS start_pos,
         |              row_number() OVER (PARTITION BY bd.doc_id
         |                ORDER BY bd.end_pos) - 1 AS chunk_idx
         |       FROM bd JOIN b USING (doc_id))
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |       CAST(start_pos AS BIGINT) AS start_pos,
         |       CAST(end_pos - start_pos + 1 AS BIGINT) AS chunk_bytes,
         |       md5(substring(txt, CAST(start_pos AS INT),
         |                     CAST(end_pos - start_pos + 1 AS INT))) AS chunk_md5
         |FROM sp ORDER BY doc_id, chunk_idx""".stripMargin
    },
    "mm_cdc_chunks_maxclamp" -> {
      val hTerms = (0 until 8).map { j =>
        val coef = BigInt(31).pow(j).toLong
        if (j == 0) s"CAST(ord(substring(txt, CAST(i AS INT), 1)) AS BIGINT) * $coef"
        else s"CAST(CASE WHEN i >= ${j + 1} THEN ord(substring(txt, CAST(i - $j AS INT), 1)) ELSE 0 END AS BIGINT) * $coef"
      }.mkString("\n        |         + ")
      // the next boundary from `last` is the smallest candidate inside
      // [last+minChunk, last+maxChunk] — or FORCED at last+maxChunk when
      // that range holds none; recursion emits boundaries strictly
      // before the payload end, which always closes the final chunk
      s"""WITH RECURSIVE p AS (
         |  SELECT doc_id,
         |         repeat(chr(CAST(97 + doc_id % 5 AS INT)), CAST(doc_id % 10 AS INT)) ||
         |         repeat('segment' || CAST(doc_id // 10 AS VARCHAR) || ' ', 20) AS txt
         |  FROM documents),
         |b AS (SELECT doc_id, txt, CAST(length(txt) AS BIGINT) AS len FROM p),
         |pos AS (SELECT doc_id, txt, len,
         |               CAST(unnest(range(1, len + 1)) AS BIGINT) AS i FROM b),
         |hp AS (
         |  SELECT doc_id, len, i,
         |         $hTerms AS h
         |  FROM pos),
         |cand AS (SELECT doc_id, i FROM hp WHERE i >= 8 AND h % 64 = 0),
         |keep(doc_id, kb) AS (
         |  SELECT doc_id, nb FROM (
         |    SELECT bb.doc_id, bb.len,
         |           COALESCE((SELECT MIN(c.i) FROM cand c
         |                     WHERE c.doc_id = bb.doc_id
         |                       AND c.i BETWEEN 24 AND 64),
         |                    CAST(64 AS BIGINT)) AS nb
         |    FROM b bb) t0
         |  WHERE nb < len
         |  UNION ALL
         |  SELECT doc_id, nb FROM (
         |    SELECT k.doc_id, bb.len,
         |           COALESCE((SELECT MIN(c.i) FROM cand c
         |                     WHERE c.doc_id = k.doc_id
         |                       AND c.i BETWEEN k.kb + 24 AND k.kb + 64),
         |                    k.kb + 64) AS nb
         |    FROM keep k JOIN b bb ON bb.doc_id = k.doc_id) t1
         |  WHERE nb < len),
         |bd AS (SELECT doc_id, kb AS end_pos FROM keep
         |       UNION SELECT doc_id, len AS end_pos FROM b),
         |sp AS (SELECT bd.doc_id, b.txt, bd.end_pos,
         |              COALESCE(lag(bd.end_pos) OVER (PARTITION BY bd.doc_id
         |                ORDER BY bd.end_pos), 0) + 1 AS start_pos,
         |              row_number() OVER (PARTITION BY bd.doc_id
         |                ORDER BY bd.end_pos) - 1 AS chunk_idx
         |       FROM bd JOIN b USING (doc_id))
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |       CAST(start_pos AS BIGINT) AS start_pos,
         |       CAST(end_pos - start_pos + 1 AS BIGINT) AS chunk_bytes,
         |       md5(substring(txt, CAST(start_pos AS INT),
         |                     CAST(end_pos - start_pos + 1 AS INT))) AS chunk_md5
         |FROM sp ORDER BY doc_id, chunk_idx""".stripMargin
    },
    "split_time_embargo" ->
      """WITH e AS (
        |  SELECT CASE WHEN epoch_us(ts) // 86400000000 < 19743 THEN 'train'
        |              WHEN epoch_us(ts) // 86400000000 >= 19746 THEN 'test'
        |              ELSE 'embargo' END AS split,
        |         epoch_us(ts) // 86400000000 AS d
        |  FROM events)
        |SELECT split, COUNT(*) AS n_events,
        |       CAST(MIN(d) AS BIGINT) AS first_day,
        |       CAST(MAX(d) AS BIGINT) AS last_day
        |FROM e GROUP BY 1 ORDER BY split""".stripMargin,
    "split_dedup_reweighted" ->
      // reachability labels (shared componentsOracleCtes), singletons
      // self-labeled via the documents left join, then the identical
      // min-of-w-md5-draws key over capped cluster sizes
      (componentsOracleCtes +
      s""",lbl AS (SELECT node AS doc_id, MIN(lbl) AS component
         |         FROM reach GROUP BY node),
         |alld AS (SELECT COALESCE(l.component, d.doc_id) AS doc_id
         |         FROM documents d LEFT JOIN lbl l USING (doc_id)),
         |cl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
         |       FROM alld GROUP BY 1),
         |wk AS (SELECT doc_id, cluster_size,
         |              CAST(LEAST(cluster_size, 16) AS BIGINT) AS weight,
         |              ${graft.operators.Splits.weightedKeySql(
                           "doc_id", "LEAST(cluster_size, 16)")} AS sample_key
         |       FROM cl)
         |SELECT doc_id, cluster_size, weight, sample_key FROM wk
         |ORDER BY sample_key, doc_id LIMIT 100""".stripMargin),
    "split_weighted_sample" ->
      // re-draws the identical min-of-w-md5-draws key and takes the same
      // global top-100 — pure string/integer math, engine-portable
      s"""WITH d AS (
         |  SELECT doc_id, lang, CAST(1 + n_chars % 8 AS BIGINT) AS weight,
         |         ${graft.operators.Splits.weightedKeySql("doc_id", "1 + n_chars % 8")} AS sample_key
         |  FROM documents)
         |SELECT doc_id, lang, weight, sample_key FROM d
         |ORDER BY sample_key, doc_id LIMIT 100""".stripMargin,
    "split_dsir_weights" ->
      // identical md5 feature hash, Laplace-smoothed counts, 6-dp-rounded
      // lns, and a decimal contribution sum (exact, so Spark's in-array
      // fold order and SQL's SUM agree bit-for-bit)
      """WITH tgt AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS t
        |  FROM documents WHERE lang = 'de'),
        |cT AS (SELECT CAST(('0x'||substring(md5(t),1,4)) AS BIGINT) % 64 AS b,
        |              COUNT(*) AS n FROM tgt GROUP BY 1),
        |rawt AS (SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents),
        |cR AS (SELECT CAST(('0x'||substring(md5(t),1,4)) AS BIGINT) % 64 AS b,
        |              COUNT(*) AS n FROM rawt GROUP BY 1),
        |tT AS (SELECT SUM(n) + 64 AS tot FROM cT),
        |tR AS (SELECT SUM(n) + 64 AS tot FROM cR),
        |d AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |tok AS (SELECT doc_id, unnest(ws) AS t FROM d),
        |tb AS (SELECT doc_id,
        |              CAST(('0x'||substring(md5(t),1,4)) AS BIGINT) % 64 AS b
        |       FROM tok),
        |ctr AS (
        |  SELECT doc_id,
        |    ROUND(ROUND(ln((COALESCE(cT.n, 0) + 1.0) / tT.tot), 6)
        |        - ROUND(ln((COALESCE(cR.n, 0) + 1.0) / tR.tot), 6), 6) AS c
        |  FROM tb
        |  LEFT JOIN cT USING (b) LEFT JOIN cR USING (b)
        |  CROSS JOIN tT CROSS JOIN tR),
        |w AS (SELECT doc_id,
        |             ROUND(CAST(SUM(CAST(c AS DECIMAL(28,12))) AS DOUBLE), 6) AS log_weight
        |      FROM ctr GROUP BY 1)
        |SELECT d.doc_id, CAST(len(d.ws) AS BIGINT) AS n_tokens, w.log_weight
        |FROM d JOIN w USING (doc_id) ORDER BY doc_id""".stripMargin,
    "split_global_order" ->
      // the oracle ranks with one global window (fine at oracle scale);
      // the engine's two-level sharded rank must land on the same order
      s"""SELECT doc_id,
         |       ${graft.operators.Splits.shuffleKeySql("doc_id")} AS shuffle_key,
         |       CAST(row_number() OVER (
         |         ORDER BY ${graft.operators.Splits.shuffleKeySql("doc_id")}, doc_id) - 1
         |         AS BIGINT) AS shuffle_pos
         |FROM documents ORDER BY shuffle_pos""".stripMargin,
    "split_sample_per_stratum" ->
      // the oracle keeps each language's 20 smallest md5(id:7) keys with
      // one per-stratum window (fine at oracle scale); the engine's
      // two-level bounded-heap merge must select the identical set
      s"""SELECT doc_id, lang, sample_key FROM (
         |  SELECT doc_id, lang,
         |         ${graft.operators.Splits.shuffleKeySql("doc_id", 7)} AS sample_key,
         |         row_number() OVER (
         |           PARTITION BY lang
         |           ORDER BY ${graft.operators.Splits.shuffleKeySql("doc_id", 7)}, doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= 20 ORDER BY lang, sample_key, doc_id""".stripMargin,
    "split_weighted_sample_stratum" ->
      // re-draws the identical min-of-w-md5-draws key, then one
      // per-stratum window (oracle scale); the engine's two-level
      // bounded-heap merge must select the identical per-language sets
      s"""SELECT doc_id, lang, weight, sample_key FROM (
         |  SELECT doc_id, lang, CAST(1 + n_chars % 8 AS BIGINT) AS weight,
         |         ${graft.operators.Splits.weightedKeySql("doc_id", "1 + n_chars % 8")} AS sample_key,
         |         row_number() OVER (
         |           PARTITION BY lang
         |           ORDER BY ${graft.operators.Splits.weightedKeySql("doc_id", "1 + n_chars % 8")}, doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= 10 ORDER BY lang, sample_key, doc_id""".stripMargin,
    "text_c4_filter" ->
      // identical line synthesis, then the same keep predicate via the
      // shared lambda; kept lists re-joined with the same newline
      (c4OracleCtes +
      """
        |SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
        |       CAST(len(kept) AS BIGINT) AS n_kept,
        |       array_to_string(kept, chr(10)) AS clean_text
        |FROM k WHERE len(kept) >= 3 ORDER BY doc_id""".stripMargin),
    "text_gopher_filter" ->
      // identical synthesis, then the identical integer rule arithmetic —
      // cross-multiplied thresholds, no ratio ever materializes
      (s"WITH $gopherOracleCtes" +
      s"""
         |SELECT doc_id, n_words, sum_word_len, n_symbols, n_lines, n_bullet_lines,
         |       n_ellipsis_lines, n_alpha_words, stop_hits,
         |       $gopherKeepSql AS keep
         |FROM c ORDER BY doc_id""".stripMargin),
    "q_source_lang_chi2" ->
      // identical positive-floor arithmetic: per observed cell
      // (10⁶·dev²) // (n·ra·cb) and (10⁶·ra·cb) // n, then 10⁶·n + Σ−Σ
      """WITH cells AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
        |               FROM documents GROUP BY 1, 2),
        |ra AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ra FROM cells GROUP BY 1),
        |cb AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS cb FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
        |t AS (SELECT cells.source, cells.lang, cells.o, ra.ra, cb.cb, tot.n,
        |             cells.o * tot.n - ra.ra * cb.cb AS dev
        |      FROM cells JOIN ra USING (source) JOIN cb USING (lang) CROSS JOIN tot)
        |SELECT CAST(MIN(n) AS BIGINT) AS n_rows,
        |       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_a,
        |       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_b,
        |       COUNT(*) AS n_observed_cells,
        |       CAST(1000000 * MIN(n)
        |            + SUM((1000000 * dev * dev) // (n * ra * cb))
        |            - SUM((1000000 * ra * cb) // n) AS BIGINT) AS chi2_ppm
        |FROM t""".stripMargin,
    "q_cramers_matrix" -> {
      // one chi² fold per pair, generated from a single template so the
      // three subqueries cannot drift; HUGEINT-fenced products (10⁶·dev²
      // passes int64 at lineitem scale), clamp-at-zero before the //
      val pairs = Seq(("l_returnflag", "l_linestatus"),
        ("l_returnflag", "l_linenumber"), ("l_linestatus", "l_linenumber"))
      val per = pairs.map { case (a, b) =>
        s"""SELECT '$a' AS col_a, '$b' AS col_b, n_rows, n_a, n_b, chi2_ppm,
           |  CASE WHEN n_rows > 0 AND least(n_a, n_b) > 1
           |       THEN greatest(chi2_ppm, 0) // (n_rows * (least(n_a, n_b) - 1))
           |       END AS v2_ppm
           |FROM (
           |  SELECT CAST(MIN(n) AS BIGINT) AS n_rows,
           |         CAST(COUNT(DISTINCT va) AS BIGINT) AS n_a,
           |         CAST(COUNT(DISTINCT vb) AS BIGINT) AS n_b,
           |         CAST(CAST(1000000 AS HUGEINT) * MIN(n)
           |              + SUM((CAST(1000000 AS HUGEINT) * CAST(dev AS HUGEINT)
           |                     * CAST(dev AS HUGEINT))
           |                    // (CAST(n AS HUGEINT) * ra * cb))
           |              - SUM((CAST(1000000 AS HUGEINT) * ra * cb) // n)
           |           AS BIGINT) AS chi2_ppm
           |  FROM (
           |    SELECT cells.va, cells.vb, cells.o, ra.ra, cb.cb, tot.n,
           |           cells.o * tot.n - ra.ra * cb.cb AS dev
           |    FROM (SELECT $a AS va, $b AS vb, CAST(COUNT(*) AS BIGINT) AS o
           |          FROM lineitem GROUP BY 1, 2) cells
           |    JOIN (SELECT $a AS va, CAST(COUNT(*) AS BIGINT) AS ra
           |          FROM lineitem GROUP BY 1) ra USING (va)
           |    JOIN (SELECT $b AS vb, CAST(COUNT(*) AS BIGINT) AS cb
           |          FROM lineitem GROUP BY 1) cb USING (vb)
           |    CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem) tot))""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"SELECT * FROM (\n$per\n) ORDER BY col_a, col_b"
    },
    "q_gini_by_source" ->
      // identical rank-mass fold with PARTITION BY source, HUGEINT
      """WITH cells AS (
        |  SELECT source AS k, CAST(n_chars AS BIGINT) AS v,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0
        |  GROUP BY 1, 2),
        |cw AS (SELECT k, v, c,
        |              SUM(c) OVER (PARTITION BY k ORDER BY v) AS cumc
        |       FROM cells),
        |agg AS (SELECT k, CAST(SUM(c) AS HUGEINT) AS n,
        |               SUM(CAST(v AS HUGEINT) * c) AS t,
        |               SUM(CAST(v AS HUGEINT) * (CAST(c AS HUGEINT) * (cumc - c)
        |                   + (CAST(c AS HUGEINT) * (c + 1)) // 2)) AS s
        |        FROM cw GROUP BY k)
        |SELECT k AS source, CAST(n AS BIGINT) AS n_units,
        |       CAST(t AS BIGINT) AS total,
        |       CAST(CASE WHEN n > 0 AND t > 0
        |            THEN (CAST(1000000 AS HUGEINT) * (2 * s - (n + 1) * t))
        |                 // (n * t) END AS BIGINT) AS gini_ppm
        |FROM agg ORDER BY source""".stripMargin,
    "q_mi_matrix" -> {
      // identical joint/margin cells, psi ln-fence (ln and product
      // rounded at 6 per cell, DECIMAL(28,12) sums), edge division.
      // Cells/margins keyed on the null-safe (coalesced varchar,
      // is-null) pair — mirrors the operator's categoryCells discipline
      // so NULL-keyed joint cells stay in the MI sum in both engines.
      val pairs = Seq(("l_returnflag", "l_linestatus"),
        ("l_returnflag", "l_linenumber"), ("l_linestatus", "l_linenumber"))
      def nsKey(c: String, v: String, vn: String) =
        s"COALESCE(CAST($c AS VARCHAR), '') AS $v, $c IS NULL AS $vn"
      def hSub(c: String, out: String) =
        s"""SELECT ROUND(-CAST(SUM(CAST(ROUND((CAST(cn AS DOUBLE) / n) *
           |         ROUND(ln(CAST(cn AS DOUBLE) / n), 6), 6)
           |         AS DECIMAL(28,12))) AS DOUBLE), 6) + 0.0 AS $out
           |FROM (SELECT ${nsKey(c, "vv", "vvn")}, CAST(COUNT(*) AS BIGINT) AS cn
           |      FROM lineitem GROUP BY 1, 2)
           |CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem)""".stripMargin
      val per = pairs.map { case (a, b) =>
        s"""SELECT '$a' AS col_a, '$b' AS col_b, m.n_rows, m.mi,
           |       CASE WHEN least(h1.ha, h2.hb) > 0
           |            THEN ROUND(m.mi / least(h1.ha, h2.hb), 6) + 0.0
           |            END AS nmi
           |FROM (
           |  SELECT CAST(MIN(n) AS BIGINT) AS n_rows,
           |         ROUND(CAST(SUM(CAST(ROUND((CAST(o AS DOUBLE) / n) *
           |           ROUND(ln(CAST(CAST(o AS HUGEINT) * n AS DOUBLE) /
           |                    CAST(CAST(ra AS HUGEINT) * cb AS DOUBLE)), 6), 6)
           |           AS DECIMAL(28,12))) AS DOUBLE), 6) + 0.0 AS mi
           |  FROM (
           |    SELECT cells.o, ra.ra, cb.cb, tot.n
           |    FROM (SELECT ${nsKey(a, "va", "vna")}, ${nsKey(b, "vb", "vnb")},
           |                 CAST(COUNT(*) AS BIGINT) AS o
           |          FROM lineitem GROUP BY 1, 2, 3, 4) cells
           |    JOIN (SELECT ${nsKey(a, "va", "vna")}, CAST(COUNT(*) AS BIGINT) AS ra
           |          FROM lineitem GROUP BY 1, 2) ra USING (va, vna)
           |    JOIN (SELECT ${nsKey(b, "vb", "vnb")}, CAST(COUNT(*) AS BIGINT) AS cb
           |          FROM lineitem GROUP BY 1, 2) cb USING (vb, vnb)
           |    CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem)
           |      tot)) m
           |CROSS JOIN (${hSub(a, "ha")}) h1
           |CROSS JOIN (${hSub(b, "hb")}) h2""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"SELECT * FROM (\n$per\n) ORDER BY col_a, col_b"
    },
    "text_source_concentration" ->
      // identical integral-div shares and HHI over the bounded counts
      """WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        |           FROM documents GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_docs, COUNT(*) AS n_sources FROM c),
        |r AS (SELECT c.n, (c.n * 1000000) // t.n_docs AS share_ppm,
        |             row_number() OVER (ORDER BY c.n DESC, c.source) AS rn
        |      FROM c, t)
        |SELECT t.n_docs, t.n_sources,
        |       CAST((SUM(CASE WHEN rn = 1 THEN n ELSE 0 END) * 1000000) // t.n_docs AS BIGINT) AS top1_ppm,
        |       CAST((SUM(CASE WHEN rn <= 5 THEN n ELSE 0 END) * 1000000) // t.n_docs AS BIGINT) AS topk_ppm,
        |       CAST(SUM(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm
        |FROM r, t GROUP BY t.n_docs, t.n_sources""".stripMargin,
    "text_filter_kappa" ->
      // the two filter chains verbatim (shared CTE vals — cannot drift),
      // verdicts joined per doc, then the exact-integer kappa: num/den
      // are count rationals, ppm is sign·(10⁶·|num| // den) — the same
      // truncation-toward-zero both engines land on
      (c4OracleCtes + s",\n$gopherOracleCtes" +
      s"""
         |,ga AS (SELECT doc_id, $gopherKeepSql AS a FROM c),
         |cb AS (SELECT doc_id FROM k WHERE len(kept) >= 3),
         |v AS (SELECT ga.a, (cb.doc_id IS NOT NULL) AS b
         |      FROM ga LEFT JOIN cb USING (doc_id)),
         |cm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |       CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
         |       CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_only_a,
         |       CAST(SUM(CASE WHEN (NOT a) AND b THEN 1 ELSE 0 END) AS BIGINT) AS n_only_b,
         |       CAST(SUM(CASE WHEN (NOT a) AND (NOT b) THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
         |       FROM v),
         |kp AS (SELECT *,
         |       (n_both+n_only_a)*(n_both+n_only_b)
         |         + (n_only_b+n_neither)*(n_only_a+n_neither) AS chance
         |       FROM cm)
         |SELECT n, n_both, n_only_a, n_only_b, n_neither,
         |       CASE WHEN n*n - chance = 0 THEN NULL
         |            ELSE CAST(sign(n*(n_both+n_neither) - chance) *
         |                 ((1000000 * abs(n*(n_both+n_neither) - chance))
         |                   // (n*n - chance)) AS BIGINT)
         |       END AS kappa_ppm
         |FROM kp""".stripMargin),
    "text_chunk_windows" ->
      // windows [i*8+1, i*8+12] over the whitespace token list, 1-based
      // stop-inclusive list_slice ≡ Spark's slice(toks, start, 12)
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |w AS (
        |  SELECT doc_id, toks,
        |         unnest(generate_series(0, CAST((len(toks) - 1) // 8 AS BIGINT))) AS win_id
        |  FROM t),
        |sl AS (
        |  SELECT doc_id, win_id,
        |         list_slice(toks, win_id * 8 + 1, win_id * 8 + 12) AS win
        |  FROM w)
        |SELECT doc_id, CAST(win_id AS BIGINT) AS win_id,
        |       CAST(len(win) AS BIGINT) AS win_tokens,
        |       win[1] AS first_tok, win[-1] AS last_tok
        |FROM sl ORDER BY doc_id, win_id""".stripMargin,
    "text_bm25_topk" -> (bm25OracleCtes +
      """
        |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score
        |FROM rk WHERE rn <= 10 ORDER BY query_id, score DESC, doc_id""".stripMargin),
    "ret_eval" -> (bm25OracleCtes +
      // the eval tail: relevance = docs sharing >= 2 distinct query
      // terms, then the integer MRR / precision@10 / recall@10 algebra
      // over the full outer of per-query relevance and result aggs
      """,
        |res AS (SELECT query_id, doc_id, CAST(rn AS BIGINT) AS rnk
        |        FROM rk WHERE rn <= 10),
        |dt AS (SELECT doc_id,
        |              unnest(list_distinct(string_split(lower(text), ' '))) AS term
        |       FROM documents),
        |qr AS (SELECT qt.query_id, dt.doc_id
        |       FROM dt JOIN qt USING (term)
        |       GROUP BY 1, 2 HAVING COUNT(DISTINCT term) >= 2),
        |nr AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
        |       FROM qr GROUP BY 1),
        |mk AS (SELECT res.query_id, res.rnk,
        |              CASE WHEN qr.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_rel
        |       FROM res LEFT JOIN qr ON qr.query_id = res.query_id
        |                            AND qr.doc_id = res.doc_id),
        |pq AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_results,
        |              CAST(MIN(CASE WHEN is_rel = 1 THEN rnk END) AS BIGINT)
        |                AS first_rel_rank,
        |              CAST(SUM(CASE WHEN is_rel = 1 AND rnk <= 10 THEN 1 ELSE 0 END)
        |                AS BIGINT) AS hits_at_k
        |       FROM mk GROUP BY 1)
        |SELECT CAST(query_id AS BIGINT) AS query_id,
        |       COALESCE(pq.n_results, 0) AS n_results,
        |       COALESCE(nr.n_rel, 0) AS n_rel,
        |       pq.first_rel_rank,
        |       CAST(CASE WHEN pq.first_rel_rank IS NOT NULL
        |            THEN 1000000 // pq.first_rel_rank END AS BIGINT) AS mrr_ppm,
        |       COALESCE(pq.hits_at_k, 0) AS hits_at_k,
        |       CAST((1000000 * COALESCE(pq.hits_at_k, 0)) // 10 AS BIGINT)
        |         AS precision_at_k_ppm,
        |       CAST(CASE WHEN COALESCE(nr.n_rel, 0) > 0
        |            THEN (1000000 * COALESCE(pq.hits_at_k, 0)) // nr.n_rel
        |            END AS BIGINT) AS recall_at_k_ppm
        |FROM nr FULL OUTER JOIN pq USING (query_id)
        |ORDER BY query_id""".stripMargin),
    "ret_phrase_topk" ->
      // positional postings from token subscripts; 2- and 3-gram lanes
      // unioned (phrase equality cannot cross lengths — the space counts
      // differ); integer occurrence counts, rank cut at 10
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text),' ')) AS w,
        |         generate_subscripts(string_split(lower(text),' '),1) AS i
        |  FROM documents),
        |g2 AS (SELECT a.doc_id, a.w||' '||b.w AS phrase
        |       FROM tok a JOIN tok b ON a.doc_id=b.doc_id AND b.i=a.i+1),
        |g3 AS (SELECT a.doc_id, a.w||' '||b.w||' '||c.w AS phrase
        |       FROM tok a JOIN tok b ON a.doc_id=b.doc_id AND b.i=a.i+1
        |                  JOIN tok c ON a.doc_id=c.doc_id AND c.i=a.i+2),
        |q(query_id, phrase) AS (VALUES
        |  (0, 'fast table'), (1, 'table table'), (2, 'batch window spark'),
        |  (3, 'value fast merge'), (4, 'zebra hash stripe')),
        |h AS (SELECT q.query_id, g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        |      FROM (SELECT * FROM g2 UNION ALL SELECT * FROM g3) g
        |      JOIN q ON q.phrase = g.phrase GROUP BY 1, 2),
        |r AS (SELECT query_id, doc_id, n_occurrences,
        |             row_number() OVER (PARTITION BY query_id
        |                                ORDER BY n_occurrences DESC, doc_id) AS rn
        |      FROM h)
        |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, n_occurrences
        |FROM r WHERE rn <= 10
        |ORDER BY query_id, n_occurrences DESC, doc_id""".stripMargin,
    "ret_rrf_fusion" -> (embCte +
      // hybrid fusion oracle: the text_bm25_topk chain (same query VALUES,
      // same 6-dp ln/contrib fences) ranked to top-10, the ann_cosine_topk
      // chain restricted to queries 0-5 ranked to top-10, then INTEGER
      // reciprocal-rank fusion (10⁹ // (60+rank), BIGINT sums — no float
      // in the fusion anywhere) cut to top-5 per query
      """, q(query_id, q_text) AS (VALUES
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
        |lexr AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
        |                CAST(row_number() OVER (PARTITION BY query_id
        |                     ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
        |         FROM sc),
        |lex AS (SELECT query_id, doc_id, rnk FROM lexr WHERE rnk <= 10),
        |semd AS (SELECT qf.vec_id AS query_id, nf.vec_id AS doc_id,
        |                list_reduce(list(qf.v*nf.v ORDER BY qf.i), (x,y) -> x+y) AS dot
        |         FROM f qf JOIN f nf ON qf.i=nf.i AND qf.vec_id<6 AND qf.vec_id<>nf.vec_id
        |         GROUP BY 1,2),
        |sems AS (SELECT query_id, doc_id, ROUND(dot/(nq.nrm*nn2.nrm),4)+0.0 AS score
        |         FROM semd JOIN nrm nq ON nq.vec_id=semd.query_id
        |                   JOIN nrm nn2 ON nn2.vec_id=semd.doc_id),
        |semr AS (SELECT query_id, doc_id,
        |                CAST(row_number() OVER (PARTITION BY query_id
        |                     ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
        |         FROM sems),
        |sem AS (SELECT query_id, doc_id, rnk FROM semr WHERE rnk <= 10),
        |u AS (SELECT query_id, doc_id, 1000000000 // (60 + rnk) AS c
        |      FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem)),
        |fz AS (SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS rrf_ppb,
        |              CAST(COUNT(*) AS BIGINT) AS n_lists
        |       FROM u GROUP BY 1,2),
        |rrk AS (SELECT fz.*, row_number() OVER (PARTITION BY query_id
        |               ORDER BY rrf_ppb DESC, doc_id) AS rr FROM fz)
        |SELECT query_id, doc_id, rrf_ppb, n_lists
        |FROM rrk WHERE rr <= 5 ORDER BY query_id, rrf_ppb DESC, doc_id""".stripMargin),
    "text_perceptron" ->
      // the 3 training epochs unrolled as CTEs over the same md5 feature
      // hash (featureBucketSql). Epoch 1 starts from zero weights, so every
      // margin is 0 and EVERY doc is misclassified — w1/b1 are whole-corpus
      // sums; epochs 2-3 score under the previous weights, fold only the
      // misclassified docs' deltas in. All integers — no float tolerance.
      """WITH docs AS (
        |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS label, text
        |  FROM documents),
        |feats AS (
        |  SELECT doc_id, label,
        |         CAST(('0x'||substring(md5(term),1,4)) AS BIGINT) % 64 AS bucket,
        |         COUNT(*) AS cnt
        |  FROM (SELECT doc_id, label, unnest(string_split(lower(text),' ')) AS term
        |        FROM docs)
        |  GROUP BY 1,2,3),
        |dlab AS (SELECT DISTINCT doc_id, label FROM feats),
        |w1 AS (SELECT bucket, SUM(label*cnt) AS wv FROM feats GROUP BY 1),
        |b1 AS (SELECT SUM(label) AS bias FROM dlab),
        |m2 AS (SELECT f.doc_id, f.label,
        |              SUM(COALESCE(w.wv,0)*f.cnt) + (SELECT bias FROM b1) AS margin
        |       FROM feats f LEFT JOIN w1 w USING (bucket) GROUP BY 1,2),
        |mis2 AS (SELECT doc_id, label FROM m2 WHERE label*margin <= 0),
        |d2 AS (SELECT f.bucket, SUM(m.label*f.cnt) AS dw
        |       FROM feats f JOIN mis2 m USING (doc_id) GROUP BY 1),
        |w2 AS (SELECT bucket, SUM(v) AS wv FROM (
        |         SELECT bucket, wv AS v FROM w1
        |         UNION ALL SELECT bucket, dw AS v FROM d2) GROUP BY 1),
        |b2 AS (SELECT (SELECT bias FROM b1) +
        |              COALESCE((SELECT SUM(label) FROM mis2), 0) AS bias),
        |m3 AS (SELECT f.doc_id, f.label,
        |              SUM(COALESCE(w.wv,0)*f.cnt) + (SELECT bias FROM b2) AS margin
        |       FROM feats f LEFT JOIN w2 w USING (bucket) GROUP BY 1,2),
        |mis3 AS (SELECT doc_id, label FROM m3 WHERE label*margin <= 0),
        |d3 AS (SELECT f.bucket, SUM(m.label*f.cnt) AS dw
        |       FROM feats f JOIN mis3 m USING (doc_id) GROUP BY 1),
        |w3 AS (SELECT bucket, SUM(v) AS wv FROM (
        |         SELECT bucket, wv AS v FROM w2
        |         UNION ALL SELECT bucket, dw AS v FROM d3) GROUP BY 1),
        |b3 AS (SELECT (SELECT bias FROM b2) +
        |              COALESCE((SELECT SUM(label) FROM mis3), 0) AS bias),
        |mf AS (SELECT f.doc_id, f.label,
        |              SUM(COALESCE(w.wv,0)*f.cnt) + (SELECT bias FROM b3) AS margin
        |       FROM feats f LEFT JOIN w3 w USING (bucket) GROUP BY 1,2)
        |SELECT doc_id, CAST(label AS BIGINT) AS label,
        |       CAST(margin AS BIGINT) AS margin,
        |       (label*margin > 0) AS correct
        |FROM mf ORDER BY doc_id""".stripMargin
  )
}
