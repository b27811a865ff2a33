package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-hygiene operators for crawl-scale training pipelines: URL
  * canonicalization, URL-exact deduplication, and domain-blocklist
  * filtering — the passes a real crawl pipeline runs BEFORE any content
  * pass, because they are row-local (or broadcast-joined) and prune the
  * corpus at the cheapest possible point.
  *
  * Reference scope note: the reference handler ingests S3 object listings
  * rather than crawls (`/root/reference/handler.go:77-130` walks bucket
  * keys); these operators are part of the extension mandate, built on the
  * same split/normalize discipline as its key parsing.
  *
  * Everything here is codegen'd built-ins — regexp_replace/regexp_extract
  * chains and CASE logic, no UDFs — and every rule is deliberately
  * engine-neutral (no lookbehind, no replacement backreferences) so the
  * DuckDB oracle replays it verbatim.
  */
object Hygiene {

  /** Tracking query parameters stripped by [[canonicalizeUrl]]. */
  val TrackedParams = "utm_[^=&]*|fbclid|gclid"

  /** Canonical form of a URL, as one row-local expression chain (ZERO
    * exchanges; at 100 TB this rides the ingest scan for free):
    *
    *  1. fragment dropped (`#...`);
    *  2. scheme and host lowercased (path/query case preserved — path case
    *     is significant per RFC 3986, host case is not);
    *  3. default port stripped (`:80` for http, `:443` for https);
    *  4. leading `www.` stripped;
    *  5. tracking parameters removed (`utm_*`, `fbclid`, `gclid`), with
    *     separator cleanup so remaining params keep a valid `?a&b` shape;
    *  6. trailing `?` and trailing `/` stripped (the root path
    *     `scheme://host` form is the canonical one).
    *
    * Strings without a `scheme://` prefix pass through steps 1/5/6 only
    * (scheme and host extract as empty, the remainder is the whole
    * string).
    */
  def canonicalizeUrl(u: Column): Column = {
    val f = regexp_replace(u, "#.*", "")
    val scheme = lower(regexp_extract(f, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(f, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val rest = when(scheme === "", f)
      .otherwise(f.substr(length(scheme) + lit(3) + length(hostport) + lit(1), length(f)))
    val noPort = when(scheme === "http" && hostport.endsWith(":80"),
        hostport.substr(lit(1), length(hostport) - 3))
      .when(scheme === "https" && hostport.endsWith(":443"),
        hostport.substr(lit(1), length(hostport) - 4))
      .otherwise(hostport)
    val host = when(noPort.startsWith("www."), noPort.substr(lit(5), length(noPort)))
      .otherwise(noPort)
    // three-step tracked-param scrub, no backreferences: (a) every
    // '&'-separated tracked param drops with its separator; (b) a leading
    // '?tracked=v&' hands '?' to the next param; (c) a lone '?tracked=v'
    // tail drops entirely. Then a dangling '?' goes.
    val r1 = regexp_replace(rest, s"&($TrackedParams)=[^&]*", "")
    val r2 = regexp_replace(r1, s"\\?($TrackedParams)=[^&]*&", "?")
    val r3 = regexp_replace(r2, s"\\?($TrackedParams)=[^&]*$$", "")
    val r4 = regexp_replace(r3, "\\?$", "")
    val joined = when(scheme === "", r4)
      .otherwise(concat(scheme, lit("://"), host, r4))
    when(joined.endsWith("/") && !joined.endsWith("://"),
      joined.substr(lit(1), length(joined) - 1))
      .otherwise(joined)
  }

  /** Registered domain of a canonical URL: the last two dot-labels of the
    * host (`tracker.example.org` → `example.org`). A public-suffix list
    * would refine multi-label TLDs; the two-label rule is the deterministic
    * engine-neutral core.
    */
  def registeredDomain(canonicalUrl: Column): Column =
    regexp_extract(
      regexp_replace(
        regexp_extract(canonicalUrl, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
        ":[0-9]+$", ""),
      "([^.]+\\.[^.]+)$", 1)

  /** URL-exact dedup after canonicalization: one hash aggregation keyed on
    * the canonical URL (single exchange, map-side partials — the A1
    * aggregate shape). Emits (canonical_url, keep_id, n_dups) with the
    * smallest id canonical, mirroring [[Dedup.exact]]'s policy.
    */
  def urlDedup(docs: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id"): DataFrame =
    docs
      .groupBy(canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Domain-blocklist filter: keep only rows whose registered domain is NOT
    * on the blocklist. The blocklist (small by construction — even
    * industrial blocklists are millions of rows, KBs–MBs against a 100 TB
    * corpus) broadcasts, so the corpus side sees an exchange-free
    * broadcast anti-join riding the ingest scan. Emits every surviving row
    * as (idCol, canonical_url, domain).
    */
  def domainFilter(docs: DataFrame, blocked: DataFrame,
      urlCol: String = "url", idCol: String = "doc_id"): DataFrame = {
    val canon = docs.select(
      col(idCol),
      canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .withColumn("domain", registeredDomain(col("canonical_url")))
    canon.join(broadcast(blocked.select(col("domain"))), Seq("domain"), "left_anti")
      .select(col(idCol), col("canonical_url"), col("domain"))
  }

  /** Robust per-group outlier screening via the median/MAD rule (Hampel's
    * identifier — Hampel 1974, public statistics): a value is an outlier
    * when |v − median| > 3·MAD, with MAD = median(|v − median|). Unlike
    * mean/stddev z-scores, one wild value cannot drag the threshold (50%
    * breakdown point) — the screen a training-data pipeline wants before
    * trusting numeric telemetry.
    *
    * Everything is INTEGER-EXACT: values scale to micro-unit longs, and
    * both medians are carried DOUBLED (`med2 = 2·median`, an exact
    * integer even when an even-count median interpolates to a half) so
    * the outlier test `2·|2v − med2| > 3·dmed2` is pure int64 arithmetic
    * — no float compare can straddle an engine boundary.
    *
    * Shape: two keyed medians and one keyed count-agg, each one exchange
    * on the group key. Exact `percentile` buffers a group's values inside
    * its aggregation state — right for grouping columns with bounded
    * per-group cardinality or diagnostic corpus slices (this is a
    * statistics row, not a per-doc output); at open-ended group sizes use
    * [[madOutliersScalable]] — the EXACT-same output computed by
    * distributed histogram rank selection with no per-group buffer
    * anywhere (this form is its oracle).
    */
  def madOutliers(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    // cached: (k, v) feeds the median, the deviation frame, AND the final
    // recount — uncached the source is re-scanned four times
    val v = Dedup.cached(df.select(col(keyCol).as("k"),
      round(col(valCol) * lit(1000000L), 0).cast("long").as("v")))
    val med = v.groupBy(col("k"))
      .agg((expr("percentile(v, 0.5)") * 2).cast("long").as("med2"))
    val d = v.join(med, Seq("k"))
      .select(col("k"), col("v"), col("med2"),
        abs(col("v") * 2 - col("med2")).as("d"))
    val dmed = d.groupBy(col("k"))
      .agg((expr("percentile(d, 0.5)") * 2).cast("long").as("dmed2"))
    d.join(dmed, Seq("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        min(col("med2")).as("med2_u6"),
        min(col("dmed2")).as("dmed2_u6"),
        sum(when(col("d") * 2 > col("dmed2") * 3, 1L).otherwise(0L))
          .as("n_outliers"))
      .withColumnRenamed("k", keyCol)
  }

  /** Exact GLOBAL median WITHOUT buffering values in aggregation state —
    * the scale path [[madOutliers]]' scaladoc promises: exact
    * `percentile` holds the whole group in its buffer (fine for bounded
    * groups, fatal for a corpus-wide median at 100 TB), while this is
    * the classic iterated histogram selection (Blum et al.'s
    * median-of-medians lineage as distributed passes; the standard
    * BigData exact-quantile recipe): each pass is ONE map-side-combined
    * 4096-bin histogram over the current [lo, hi) range, the driver
    * walks the cumulative counts to the bin holding each middle rank
    * (a ≤ 4096-row bounded global decision), and the range narrows
    * 4096× per pass — ⌈log₄₀₉₆ range⌉ passes total (≤ 3 for any int64
    * micro-unit range), then exact rank selection over the final range's
    * per-VALUE counts (≤ exactThreshold rows — duplicate-proof where a
    * row limit would overflow on a value repeated ~n times).
    *
    * Returns ONE row (n, med2_u6): the median DOUBLED in micro-units
    * (`k1th + k2th` order statistics — exact integer even when an
    * even count interpolates, the [[madOutliers]] discipline).
    */
  def median2Pass(df: DataFrame, valCol: String,
      binsPerPass: Int = 4096, exactThreshold: Long = 262144L): DataFrame = {
    require(binsPerPass >= 2, s"binsPerPass must be >= 2: $binsPerPass")
    val spark = df.sparkSession
    import spark.implicits._
    val v0 = df.select(
      round(col(valCol) * lit(1000000L), 0).cast("long").as("v"))
      .filter(col("v").isNotNull)
    v0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val head = v0.agg(count(lit(1)).as("n"), min(col("v")).as("lo"),
        max(col("v")).as("hi")).collect().head
      val n = head.getLong(0)
      require(n > 0, "median of an empty frame")
      val (k1, k2) = ((n - 1) / 2, n / 2) // 0-indexed middle ranks
      // single-rank selection: narrowing on ONE rank shrinks the range
      // to one bin (4096×) every pass unconditionally — narrowing on
      // both middle ranks at once can stall when they straddle a wide
      // empty gap (the range then never shrinks)
      def selectRank(k: Long): Long = {
        var lo = head.getLong(1)
        var hi = head.getLong(2)
        var below = 0L
        while (hi - lo >= exactThreshold) {
          val width = (hi - lo) / binsPerPass + 1
          val hist = v0.filter(col("v") >= lo && col("v") <= hi)
            .groupBy(((col("v") - lo) / width).cast("long").as("bin"))
            .agg(count(lit(1)).as("c"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
          var cum = below
          var b = -1L
          hist.foreach { case (bin, c) =>
            if (b < 0) { if (cum + c > k) b = bin else cum += c }
          }
          below = cum
          hi = math.min(hi, lo + (b + 1) * width - 1)
          lo = lo + b * width
        }
        // exact step: per-VALUE counts — distinct values in the final
        // range are bounded by its width (< exactThreshold), and the
        // cumulative walk is duplicate-proof where a row limit would
        // overflow on a value repeated ~n times
        val counts = v0.filter(col("v") >= lo && col("v") <= hi)
          .groupBy(col("v")).agg(count(lit(1)).as("c"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        var cum = below
        var res = Long.MinValue
        counts.foreach { case (value, c) =>
          if (res == Long.MinValue) {
            if (cum + c > k) res = value else cum += c
          }
        }
        res
      }
      val med2 =
        if (k1 == k2) 2 * selectRank(k1)
        else selectRank(k1) + selectRank(k2)
      Seq((n, med2)).toDF("n", "med2_u6")
    } finally v0.unpersist()
  }

  /** Exact per-(group, rank) order statistics WITHOUT buffering any
    * group — [[median2Pass]]'s iterated histogram narrowing run for
    * EVERY (group, rank) unit SIMULTANEOUSLY, with the selection state
    * kept DISTRIBUTED (one row per unit) instead of on the driver:
    *
    *  - `v` is `(k, v)` (long micro-units); `ranks` is one row per
    *    selection unit `(k, rid, target, lo, hi)` — 0-indexed target
    *    rank within the group's non-null values, initial range =
    *    the group's [min, max];
    *  - each pass joins `v` to the still-active units on the group key
    *    (the only corpus-sized exchange, map-side-combined into
    *    ≤ units·binsPerPass histogram rows), walks each unit's
    *    cumulative bin counts with a bounded window
    *    (partition = one unit, ≤ binsPerPass rows), and narrows that
    *    unit's range to the bin holding its rank — a binsPerPass×
    *    shrink per pass, so ⌈log₄₀₉₆ range⌉ passes total, each pass
    *    `localCheckpoint`ed (the [[Graph]] lineage-cut discipline);
    *  - once every unit's range is narrower than `exactThreshold`, one
    *    final pass groups per VALUE and rank-walks exactly — the window
    *    partition is bounded by the range width, duplicate-proof the
    *    same way as [[median2Pass]]'s exact step.
    *
    * Nothing here buffers a group: aggregation states are counts, the
    * widest window partition is min(range width, binsPerPass) rows, and
    * driver state is ONE bounded scalar — the widest unit range, read
    * off the materialized unit-sized checkpoint (the kCore-gate bounded-
    * global-decision pattern). It fixes the pass budget up front:
    * narrowing shrinks every active unit's range to ≤ `(hi−lo) DIV
    * binsPerPass` (new range ≤ width − 1), so simulating that shrink on
    * the max range gives the exact pass count the old ANY-active COUNT
    * loop discovered with one blocking action PER PASS plus one final
    * no-pass probe (r20: each such count was a full job in a chain of
    * sequential jobs — pure latency at any scale, since every action is
    * a cluster-wide barrier). A unit whose range narrows faster than the
    * bound (last-bin clipping) just sits inactive through the remaining
    * passes — the pass body filters on `isActive`, so extra passes are
    * identity for it. Returns `(k, rid, sel)`.
    */
  private[graft] def groupedSelectRanks(v: DataFrame, ranks: DataFrame,
      binsPerPass: Int = 4096, exactThreshold: Long = 262144L): DataFrame = {
    require(binsPerPass >= 2, s"binsPerPass must be >= 2: $binsPerPass")
    require(exactThreshold >= 1, s"exactThreshold must be >= 1: $exactThreshold")
    val widthE = expr(s"(hi - lo) DIV $binsPerPass + 1")
    var ranges = ranks.select(col("k"), col("rid"), col("target"),
      col("lo"), col("hi"), lit(0L).as("below")).localCheckpoint()
    val isActive = col("hi") - col("lo") >= exactThreshold
    // pass budget from the widest unit range (null = no units at all)
    val maxRangeRow = ranges.agg(max(col("hi") - col("lo"))).collect()(0)
    var maxRange = if (maxRangeRow.isNullAt(0)) 0L else maxRangeRow.getLong(0)
    var passes = 0
    while (maxRange >= exactThreshold) {
      maxRange /= binsPerPass; passes += 1
    }
    for (p <- 1 to passes) {
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
      val next = ranges.filter(!isActive).unionByName(narrowed)
      // checkpoint only BETWEEN passes: the next pass reads its input
      // twice (the !active leg and the hist join), so an unmaterialized
      // tree would double per pass — but the LAST pass's output flows
      // into the single final-selection consumer exactly once, and
      // materializing a unit-sized frame nobody re-reads was one more
      // blocking job per call
      ranges = if (p < passes) next.localCheckpoint() else next
    }
    val fin = v.join(ranges, Seq("k"))
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .groupBy(col("k"), col("rid"), col("target"), col("below"), col("v"))
      .agg(count(lit(1)).as("c"))
    val valW = Window.partitionBy(col("k"), col("rid")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    fin.withColumn("cum", coalesce(sum(col("c")).over(valW), lit(0L)) + col("below"))
      .filter(col("cum") <= col("target") && col("target") < col("cum") + col("c"))
      .select(col("k"), col("rid"), col("v").as("sel"))
  }

  /** [[madOutliers]] at UNBOUNDED group sizes — the Hampel screen a real
    * pipeline runs per-domain/per-source at web scale, where the exact
    * form's `percentile` buffers each group inside one aggregation
    * state. Same output row-for-row (same doubled-integer algebra, same
    * schema — the exact operator's SQL IS this operator's oracle), but
    * both keyed medians come from [[groupedSelectRanks]]: per group, the
    * two middle order statistics (`(n−1) DIV 2` and `n DIV 2`, summed =
    * the exact doubled median) selected by distributed histogram
    * narrowing — no aggregation buffer, window partition, or driver
    * structure ever holds a group.
    *
    * Cost shape: ≤ ⌈log₄₀₉₆ range⌉ + 1 scans of the cached values frame
    * per median (2 medians: values, then deviations) vs the exact form's
    * one-exchange-per-median — the classic rows-moved-vs-passes trade,
    * won by this form as soon as a group stops fitting in an executor.
    *
    * Parity boundary: the row-for-row contract against [[madOutliers]]
    * (and the oracle's `median(v)·2`) holds while micro-unit magnitudes
    * stay double-exact (|v·10⁶| < 2⁵³ ≈ values < 9·10⁹) — beyond that,
    * `percentile`'s DOUBLE interpolation rounds the middle values while
    * this form's k1th+k2th integer sum stays exact, i.e. past the
    * boundary the SCALABLE side is the more correct one.
    */
  def madOutliersScalable(df: DataFrame, keyCol: String, valCol: String,
      binsPerPass: Int = 4096, exactThreshold: Long = 262144L): DataFrame = {
    val vAll = Dedup.cached(df.select(col(keyCol).as("k"),
      round(col(valCol) * lit(1000000L), 0).cast("long").as("v")))
    val v = vAll.filter(col("v").isNotNull)
    def middleRanks(vals: DataFrame): DataFrame =
      vals.groupBy(col("k"))
        .agg(count(lit(1)).as("nn"), min(col("v")).as("lo"),
          max(col("v")).as("hi"))
        .select(col("k"), col("lo"), col("hi"),
          explode(array(
            struct(lit(1L).as("rid"), expr("(nn - 1) DIV 2").as("target")),
            struct(lit(2L).as("rid"), expr("nn DIV 2").as("target")))).as("r"))
        .select(col("k"), col("r.rid").as("rid"), col("r.target").as("target"),
          col("lo"), col("hi"))
    val med = groupedSelectRanks(v, middleRanks(v), binsPerPass, exactThreshold)
      .groupBy(col("k")).agg(sum(col("sel")).as("med2"))
    val dev = Dedup.cached(v.join(med, Seq("k"))
      .select(col("k"), abs(col("v") * 2 - col("med2")).as("v")))
    val dmed = groupedSelectRanks(dev, middleRanks(dev), binsPerPass,
        exactThreshold)
      .groupBy(col("k")).agg(sum(col("sel")).as("dmed2"))
    // left joins: a group whose values are ALL null has no selection
    // unit — it still emits (n, null, null, 0), the exact form's row
    vAll.join(med, Seq("k"), "left").join(dmed, Seq("k"), "left")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        min(col("med2")).as("med2_u6"),
        min(col("dmed2")).as("dmed2_u6"),
        sum(when(abs(col("v") * 2 - col("med2")) * 2 > col("dmed2") * 3, 1L)
          .otherwise(0L)).as("n_outliers"))
      .withColumnRenamed("k", keyCol)
  }

  /** Exact per-group quantiles at UNBOUNDED group sizes — the general
    * surface over [[groupedSelectRanks]] (of which [[madOutliersScalable]]
    * is the median/MAD composition): for each group and each requested
    * quantile `q`, the 0-indexed LOWER order statistic at rank
    * `⌊q·(n−1)⌋` over the group's non-null micro-unit values — a
    * deterministic, engine-exact definition (no interpolation, no
    * engine-specific quantile semantics), selected by distributed
    * histogram narrowing: no aggregation buffer, window partition, or
    * driver structure ever holds a group, vs `percentile`'s
    * whole-group buffer (and `approx_percentile`'s error bound — this
    * is EXACT). Quantiles are labeled in integer ppm
    * (`q_ppm = q·10⁶`). Emits `(keyCol, q_ppm, value_u6)`.
    */
  def groupedQuantiles(df: DataFrame, keyCol: String, valCol: String,
      qPpms: Seq[Long], binsPerPass: Int = 4096,
      exactThreshold: Long = 262144L): DataFrame = {
    require(qPpms.nonEmpty && qPpms.forall(q => q >= 0L && q <= 1000000L),
      s"q_ppm values must be in [0, 1000000]: $qPpms")
    require(qPpms.distinct.size == qPpms.size, s"duplicate quantiles: $qPpms")
    val v = Dedup.cached(df.select(col(keyCol).as("k"),
      round(col(valCol) * lit(1000000L), 0).cast("long").as("v"))
      .filter(col("v").isNotNull))
    val ranks = v.groupBy(col("k"))
      .agg(count(lit(1)).as("nn"), min(col("v")).as("lo"),
        max(col("v")).as("hi"))
      .select(col("k"), col("lo"), col("hi"),
        explode(array(qPpms.map { qPpm =>
          struct(lit(qPpm).as("rid"),
            floor((lit(qPpm) / lit(1000000.0)) * (col("nn") - 1))
              .cast("long").as("target"))
        }: _*)).as("r"))
      .select(col("k"), col("r.rid").as("rid"), col("r.target").as("target"),
        col("lo"), col("hi"))
    groupedSelectRanks(v, ranks, binsPerPass, exactThreshold)
      .select(col("k").as(keyCol), col("rid").as("q_ppm"),
        col("sel").as("value_u6"))
  }

  /** Column-statistics profile — the ANALYZE TABLE surface as one
    * catalog-free operator: per column, null count, exact NDV, and
    * min/max (computed on the NATIVE type, stringified after — casting
    * first would compare "10" < "9"). One PER-COLUMN chain: groupBy the
    * column (map-side combine collapses each task to its local distinct
    * values, so the exchange moves NDV-bounded rows, never the table),
    * then a one-row summary over the grouped frame; the per-column
    * frames union. This beat the single-pass multi-`countDistinct` form
    * 20× (6.9 s → 0.35 s at sf0.1): that plan EXPANDS every row once
    * per profiled column and shuffles the multiplied, null-padded rows —
    * per-column pruned scans are cheaper than a 4× row explosion.
    * These are exactly the stats a CBO join-reorder / broadcast decision
    * wants, and the drift numbers a pipeline compares between dumps.
    *
    * The exact-NDV groupBy plan is right when NDV ≪ N (enum-ish columns:
    * flags, languages, sources). On a NEAR-UNIQUE column (a key: NDV ≈ N)
    * the exchange moves the whole table — list such columns in
    * `approxCols` and they take the APPROX lane instead: a single-row
    * `approx_count_distinct` agg (HyperLogLog++, the same sketch family
    * verified in the `text_hll_distinct` row), whose exchange is one
    * sketch per task regardless of cardinality. `ndv` is then the HLL
    * estimate (±~2.3%); every other stat stays exact. Sums are
    * `coalesce`d to 0 so an EMPTY table profiles as zeros, matching
    * `COUNT(*)` semantics, instead of null-over-zero-groups.
    */
  def tableProfile(df: DataFrame, cols: Seq[String],
      approxCols: Set[String] = Set.empty): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    require(approxCols.subsetOf(cols.toSet),
      s"approxCols not in cols: ${approxCols.diff(cols.toSet).mkString(",")}")
    def exactOne(c: String): DataFrame =
      df.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .agg(
          coalesce(sum(col("cnt")), lit(0L)).as("n_rows"),
          coalesce(sum(when(col(c).isNull, col("cnt")).otherwise(0L)), lit(0L))
            .as("n_nulls"),
          count(when(col(c).isNotNull, lit(1))).as("ndv"),
          min(col(c)).cast("string").as("min_value"),
          max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("ndv"), col("min_value"), col("max_value"))
    def approxOne(c: String): DataFrame =
      df.agg(
        count(lit(1)).as("n_rows"),
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_nulls"),
        approx_count_distinct(col(c)).as("ndv"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("ndv"), col("min_value"), col("max_value"))
    cols.map(c => if (approxCols(c)) approxOne(c) else exactOne(c))
      .reduce(_ unionAll _)
  }

  /** Null-safe category cells (v, vn, n) — the drift family's shared
    * input grain. Null categories are REAL categories: keying on the
    * (coalesced value, is-null flag) pair lets a full outer join match a
    * NULL bucket across dumps — a raw NULL key never matches itself in
    * either engine, and two dumps that are 50% NULL each would otherwise
    * read ~500000 ppm of phantom drift on identical distributions.
    */
  def categoryCells(df: DataFrame, c: String): DataFrame = df
    .groupBy(coalesce(col(c).cast("string"), lit("")).as("v"),
      col(c).isNull.as("vn"))
    .agg(count(lit(1)).as("n"))

  /** [[categoryCells]] for SEVERAL columns in one scan — (c, v, vn, n).
    * The per-column drift operators previously ran one count-agg scan of
    * each dump PER COLUMN (then unioned the per-column folds): a 3-column
    * PSI read the base table many times for counts one pass can deliver
    * (r19 plan audit: 24 scans / 42 exchanges on `q_psi_drift`). Here each
    * input row expands to |cols| (column, value, is-null) structs inside
    * the same codegen stage and ONE map-side-combined agg keys on
    * (c, v, vn) — cell counts per column are identical to the
    * single-column form by construction.
    */
  private[graft] def categoryCellsMulti(df: DataFrame,
      cols: Seq[String]): DataFrame = df
    .select(explode(array(cols.map(c => struct(
      lit(c).as("c"),
      coalesce(col(c).cast("string"), lit("")).as("v"),
      col(c).isNull.as("vn"))): _*)).as("kv"))
    .groupBy(col("kv.c").as("c"), col("kv.v").as("v"), col("kv.vn").as("vn"))
    .agg(count(lit(1)).as("n"))

  /** The TVD fold over two pre-counted cell frames — shared by
    * [[driftReport]] and the streaming monitor so the algebra cannot
    * drift between them.
    */
  private[graft] def tvdFromCells(caIn: DataFrame, cbIn: DataFrame,
      name: String): DataFrame = {
    val ca = caIn.withColumnRenamed("n", "na_v")
    val cb = cbIn.withColumnRenamed("n", "nb_v")
    val j = ca.join(cb, Seq("v", "vn"), "full_outer")
      .select(coalesce(col("na_v"), lit(0L)).as("na_v"),
        coalesce(col("nb_v"), lit(0L)).as("nb_v"))
    val tot = j.agg(sum(col("na_v")).as("n_a"), sum(col("nb_v")).as("n_b"))
    j.crossJoin(broadcast(tot))
      .select(col("na_v"), col("nb_v"), col("n_a"), col("n_b"),
        expr("CASE WHEN n_a > 0 THEN na_v * 1000000 DIV n_a ELSE 0 END")
          .as("pa_ppm"),
        expr("CASE WHEN n_b > 0 THEN nb_v * 1000000 DIV n_b ELSE 0 END")
          .as("pb_ppm"))
      .agg(
        coalesce(min(col("n_a")), lit(0L)).as("n_a"),
        coalesce(min(col("n_b")), lit(0L)).as("n_b"),
        count(lit(1)).as("ndv_union"),
        coalesce(sum(abs(col("pa_ppm") - col("pb_ppm"))), lit(0L))
          .as("sad_ppm"))
      .select(lit(name).as("col_name"), col("n_a"), col("n_b"),
        col("ndv_union"), expr("sad_ppm DIV 2").as("tvd_ppm"))
  }

  /** Distribution drift between two dumps of the same table — the
    * between-crawls comparison a pipeline runs before trusting a new
    * dump: per categorical column, both dumps' value distributions and
    * their total-variation distance. TVD is carried as FLOOR-SHARE ppm
    * integers (each value's share = `cnt·10⁶ DIV n`, tvd = `Σ|pa−pb|
    * DIV 2`) — deterministic pure-int64 cross-engine algebra, the
    * [[madOutliers]] doubled-integer stance applied to drift (a float
    * TVD can differ in the last ulp across engines; a floor-share one
    * cannot). Numeric columns: bucket them first (the equi-depth
    * histogram rule) and drift the bucket label — composition, not a
    * second code path.
    *
    * Shape per column: one NDV-bounded hash agg per dump, a full-outer
    * join on the value (NDV-bounded exchange), the totals as a
    * broadcast 1-row frame, one summary agg. Emits one row per column:
    * `(col_name, n_a, n_b, ndv_union, tvd_ppm)`.
    */
  def driftReport(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to drift-check")
    // ONE stacked-cells scan per dump for every column (r19: was one
    // scan per column per side), one (c, v, vn)-keyed full outer, the
    // identical floor-share fold GROUPED BY column. Values are
    // column-for-column the single-column [[tvdFromCells]]' (the
    // streaming monitor's serve path still runs that form; the
    // streamed ≡ batch spec pins both against this output).
    val ca = categoryCellsMulti(a, cols).withColumnRenamed("n", "na_v")
    val cb = categoryCellsMulti(b, cols).withColumnRenamed("n", "nb_v")
    val j = ca.join(cb, Seq("c", "v", "vn"), "full_outer")
      .select(col("c"),
        coalesce(col("na_v"), lit(0L)).as("na_v"),
        coalesce(col("nb_v"), lit(0L)).as("nb_v"))
    val tot = j.groupBy(col("c"))
      .agg(sum(col("na_v")).as("n_a"), sum(col("nb_v")).as("n_b"))
    j.join(broadcast(tot), Seq("c"))
      .select(col("c"), col("n_a"), col("n_b"),
        expr("CASE WHEN n_a > 0 THEN na_v * 1000000 DIV n_a ELSE 0 END")
          .as("pa_ppm"),
        expr("CASE WHEN n_b > 0 THEN nb_v * 1000000 DIV n_b ELSE 0 END")
          .as("pb_ppm"))
      .groupBy(col("c"))
      .agg(
        coalesce(min(col("n_a")), lit(0L)).as("n_a"),
        coalesce(min(col("n_b")), lit(0L)).as("n_b"),
        count(lit(1)).as("ndv_union"),
        coalesce(sum(abs(col("pa_ppm") - col("pb_ppm"))), lit(0L))
          .as("sad_ppm"))
      .select(col("c").as("col_name"), col("n_a"), col("n_b"),
        col("ndv_union"), expr("sad_ppm DIV 2").as("tvd_ppm"))
      // literal column spine: the single-column global agg emitted one
      // zero row per column even for two EMPTY dumps (a group-by emits
      // none) — preserve that degenerate contract exactly
      .join(a.sparkSession.range(1)
        .select(explode(array(cols.map(lit): _*)).as("col_name")),
        Seq("col_name"), "right")
      .select(col("col_name"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("ndv_union"), lit(0L)).as("ndv_union"),
        coalesce(col("tvd_ppm"), lit(0L)).as("tvd_ppm"))
  }

  /** The PSI fold over two pre-counted cell frames — shared by
    * [[psiDrift]] and the streaming monitor.
    */
  private[graft] def psiFromCells(caIn: DataFrame, cbIn: DataFrame,
      name: String): DataFrame = {
    val ca = caIn.withColumnRenamed("n", "na_v")
    val cb = cbIn.withColumnRenamed("n", "nb_v")
    val j = ca.join(cb, Seq("v", "vn"), "full_outer")
      .select(coalesce(col("na_v"), lit(0L)).as("na_v"),
        coalesce(col("nb_v"), lit(0L)).as("nb_v"))
    val tot = j.agg(sum(col("na_v")).as("n_a"), sum(col("nb_v")).as("n_b"),
      count(lit(1)).as("ndv_union"))
    j.crossJoin(broadcast(tot))
      .withColumn("pa",
        (col("na_v") + 1L).cast("double") / (col("n_a") + col("ndv_union")))
      .withColumn("pb",
        (col("nb_v") + 1L).cast("double") / (col("n_b") + col("ndv_union")))
      .withColumn("contrib",
        round((col("pa") - col("pb")) * round(log(col("pa") / col("pb")), 6), 6))
      .agg(
        coalesce(min(col("n_a")), lit(0L)).as("n_a"),
        coalesce(min(col("n_b")), lit(0L)).as("n_b"),
        count(lit(1)).as("ndv_union"),
        (round(sum(col("contrib").cast(DecimalType(28, 12))).cast("double"), 6)
          + lit(0.0)).as("psi"))
      .select(lit(name).as("col_name"), col("n_a"), col("n_b"),
        col("ndv_union"), col("psi"))
  }

  /** Population stability index — [[driftReport]]'s industry-standard
    * companion (the credit-scoring monitoring statistic; PSI > 0.25 is
    * the conventional "re-examine the model" line): where TVD weights
    * every category equally, PSI's (p_a − p_b)·ln(p_a/p_b) term blows up
    * on categories that appear or vanish — exactly the drift shape that
    * breaks a trained model. Zero cells are handled by Laplace +1
    * smoothing on BOTH sides (deterministic — no tunable epsilon to
    * mirror): p = (count + 1)/(n + ndv_union).
    *
    * Float discipline: ln fenced at 6 dp, the product re-rounded at
    * 6 dp, contributions DECIMAL-summed, final ROUND(·, 6) + 0.0 — the
    * collocations/lmScore chain, replayed identically by the oracle.
    * Same scale shape as the parent: per column one full-outer of two
    * map-side-combined counts on the (value, is-null) key, one 1-row
    * totals broadcast, one fold.
    */
  def psiDrift(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to drift-check")
    // stacked-cells single scan per dump + grouped fold — the
    // [[driftReport]] r19 rewrite applied to the PSI algebra (identical
    // per-column smoothing: ndv_union and totals are per-column groups)
    val ca = categoryCellsMulti(a, cols).withColumnRenamed("n", "na_v")
    val cb = categoryCellsMulti(b, cols).withColumnRenamed("n", "nb_v")
    val j = ca.join(cb, Seq("c", "v", "vn"), "full_outer")
      .select(col("c"),
        coalesce(col("na_v"), lit(0L)).as("na_v"),
        coalesce(col("nb_v"), lit(0L)).as("nb_v"))
    val tot = j.groupBy(col("c"))
      .agg(sum(col("na_v")).as("n_a"), sum(col("nb_v")).as("n_b"),
        count(lit(1)).as("ndv_union"))
    j.join(broadcast(tot), Seq("c"))
      .withColumn("pa",
        (col("na_v") + 1L).cast("double") / (col("n_a") + col("ndv_union")))
      .withColumn("pb",
        (col("nb_v") + 1L).cast("double") / (col("n_b") + col("ndv_union")))
      .withColumn("contrib",
        round((col("pa") - col("pb")) * round(log(col("pa") / col("pb")), 6), 6))
      .groupBy(col("c"))
      .agg(
        coalesce(min(col("n_a")), lit(0L)).as("n_a"),
        coalesce(min(col("n_b")), lit(0L)).as("n_b"),
        count(lit(1)).as("ndv_union"),
        (round(sum(col("contrib").cast(DecimalType(28, 12))).cast("double"), 6)
          + lit(0.0)).as("psi"))
      .select(col("c").as("col_name"), col("n_a"), col("n_b"),
        col("ndv_union"), col("psi"))
      // literal column spine — the [[driftReport]] empty-dumps contract
      // (psi stays NULL there, exactly like the global agg's round(NULL))
      .join(a.sparkSession.range(1)
        .select(explode(array(cols.map(lit): _*)).as("col_name")),
        Seq("col_name"), "right")
      .select(col("col_name"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("ndv_union"), lit(0L)).as("ndv_union"),
        col("psi"))
  }

  /** Per-column Shannon entropy profile (Shannon 1948) — the
    * concentration read [[tableProfile]]'s NDV alone can't give: a
    * column with 10⁶ distinct values and 99% mass on one of them has
    * high NDV and near-zero entropy (a skew trap for stratifiers and
    * partition keys). Per watched column: rows, NDV, H = −Σ p·ln p in
    * nats, and H/ln(NDV) ∈ [0,1] as the uniformity score (NULL for
    * constant columns — normalization is undefined, not 1).
    *
    * Shares [[categoryCells]]' null-safe cell grain with the drift
    * family (NULL is a real category). Floats only in the psi ln-fence
    * form: each cell's contribution rounds its ln and its product to
    * 6 dp, sums are DECIMAL(28,12)-exact, one rounded division at the
    * edge. One NDV-bounded agg per column (watched columns are
    * categorical/bucketed by the drift contract).
    */
  def columnEntropy(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    def one(c: String): DataFrame = {
      val cells = categoryCells(df, c)
      val tot = cells.agg(sum(col("n")).as("nr"), count(lit(1)).as("ndv"))
      cells.crossJoin(broadcast(tot))
        .withColumn("p", col("n").cast("double") / col("nr"))
        .withColumn("contrib",
          round(col("p") * round(log(col("p")), 6), 6))
        .agg(min(col("nr")).as("n_rows"), min(col("ndv")).as("ndv"),
          (round(-sum(col("contrib").cast(DecimalType(28, 12)))
            .cast("double"), 6) + lit(0.0)).as("entropy"))
        .select(lit(c).as("col_name"), col("n_rows"), col("ndv"),
          col("entropy"),
          when(col("ndv") > 1L,
            round(col("entropy") / round(log(col("ndv").cast("double")), 6), 6)
              + lit(0.0)).as("norm_entropy"))
    }
    cols.map(one).reduce(_ unionAll _)
  }

  /** Normalized mutual-information matrix (Shannon 1948; Strehl & Ghosh
    * 2002 for the normalization) — the information-theoretic companion
    * to [[cramersVMatrix]]: MI sees ANY dependence structure (χ²-family
    * scores are moment-based and can under-read non-linear co-encodings)
    * and NMI = MI/min(H_a, H_b) lands on [0,1] with 1 = one column
    * determines the other. Per unordered pair: (col_a, col_b, n_rows,
    * mi, nmi); a constant column has zero entropy → NMI NULL (undefined,
    * not 1).
    *
    * Float discipline: the psi ln-fence — each joint cell's contribution
    * rounds its ln and its product at 6 dp, sums are DECIMAL(28,12)-
    * exact, the single normalization division rounds at the edge. The
    * ln ratio (o·n)/(ra·cb) is formed from DECIMAL(38,0)-exact integer
    * products cast to double (n² passes int64 at corpus scale).
    *
    * Scale: per pair one joint agg (NDV-product-bounded cells, the
    * [[chiSquareAudit]] contract), margins broadcast; |cols| ≤ 16.
    *
    * NULL discipline: joint cells and margins are keyed on the
    * [[categoryCells]] null-safe (coalesced string, is-null) pair — a
    * raw NULL key never matches itself in an equi-join, so keying on
    * the raw values would drop NULL-bearing joint cells from the MI sum
    * while `n` and the margin entropies still count those rows, biasing
    * MI low and making mi/nmi inconsistent with n_rows.
    */
  def mutualInfoMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.size <= 16,
      s"need 2..16 audit columns: ${cols.size}")
    // ONE stacked scan for every unordered pair (r19 — the per-pair form
    // re-ran a full joint-cells aggregation over the base table once per
    // pair PER CONSUMER SUBTREE, ~7 base scans per pair): each row
    // expands to C(k,2) (pair, cell) structs inside the scan's codegen
    // stage, one (pair, cell)-keyed map-side-combined agg builds every
    // pair's joint table at once, and that NDV-product-bounded cells
    // frame persists (released by the session's uncache point) so the
    // margin / entropy / contribution derivations never rescan the base.
    // Per-pair cell counts — and therefore every ln-fenced fold below —
    // are identical to the per-pair form by construction.
    val pairs = cols.combinations(2).map(p => (p.head, p.last)).toSeq
    val joint = Dedup.cached(df.select(explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("pa"), lit(b).as("pb"),
          coalesce(col(a).cast("string"), lit("")).as("va"),
          col(a).isNull.as("vna"),
          coalesce(col(b).cast("string"), lit("")).as("vb"),
          col(b).isNull.as("vnb"))
      }: _*)).as("kv"))
      .groupBy(col("kv.pa").as("pa"), col("kv.pb").as("pb"),
        col("kv.va").as("va"), col("kv.vna").as("vna"),
        col("kv.vb").as("vb"), col("kv.vnb").as("vnb"))
      .agg(count(lit(1)).as("_g_o")))
    val ra = joint.groupBy(col("pa"), col("pb"), col("va"), col("vna"))
      .agg(sum(col("_g_o")).as("_g_ra"))
    val cb = joint.groupBy(col("pa"), col("pb"), col("vb"), col("vnb"))
      .agg(sum(col("_g_o")).as("_g_cb"))
    val tot = joint.groupBy(col("pa"), col("pb"))
      .agg(sum(col("_g_o")).as("_g_n"))
    def marginH(m: DataFrame, cnt: String, out: String): DataFrame = m
      .join(broadcast(tot), Seq("pa", "pb"))
      .withColumn("p", col(cnt).cast("double") / col("_g_n"))
      .withColumn("hc", round(col("p") * round(log(col("p")), 6), 6))
      .groupBy(col("pa"), col("pb"))
      .agg((round(-sum(col("hc").cast(DecimalType(28, 12)))
        .cast("double"), 6) + lit(0.0)).as(out))
    val mi = joint
      .join(broadcast(ra), Seq("pa", "pb", "va", "vna"))
      .join(broadcast(cb), Seq("pa", "pb", "vb", "vnb"))
      .join(broadcast(tot), Seq("pa", "pb"))
      .withColumn("contrib", round(
        (col("_g_o").cast("double") / col("_g_n")) * round(log(
          (col("_g_o").cast("decimal(38,0)") * col("_g_n")).cast("double") /
            (col("_g_ra").cast("decimal(38,0)") * col("_g_cb"))
              .cast("double")), 6), 6))
      .groupBy(col("pa"), col("pb"))
      .agg(min(col("_g_n")).as("n_rows"),
        (round(sum(col("contrib").cast(DecimalType(28, 12)))
          .cast("double"), 6) + lit(0.0)).as("mi"))
    // literal pair spine — the per-pair global aggs emitted one
    // (all-NULL) row per pair even over an empty input; preserve that
    // degenerate contract exactly (no coalesce: NULLs stay NULLs)
    val spine = df.sparkSession.range(1).select(
      explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("pa"), lit(b).as("pb")) }: _*)).as("kv"))
      .select(col("kv.pa").as("pa"), col("kv.pb").as("pb"))
    mi.join(marginH(ra, "_g_ra", "ha"), Seq("pa", "pb"))
      .join(marginH(cb, "_g_cb", "hb"), Seq("pa", "pb"))
      .join(spine, Seq("pa", "pb"), "right")
      .select(col("pa").as("col_a"), col("pb").as("col_b"), col("n_rows"),
        col("mi"),
        when(least(col("ha"), col("hb")) > 0.0,
          round(col("mi") / least(col("ha"), col("hb")), 6) + lit(0.0))
          .as("nmi"))
  }

  /** k-anonymity audit over a quasi-identifier combination (Sweeney 2002
    * — public privacy methodology): a row is k-anonymous when at least
    * `k` rows share its full quasi-identifier tuple; releasing groups
    * below k re-identifies. Emits ONE summary row — group cardinality,
    * total rows, the minimum group size, how many groups violate k, and
    * how many rows those groups hold (= the suppression cost of
    * publishing the rest) — the go/no-go number a release review wants.
    *
    * Shape: one map-side-combined agg on the QI tuple, then a one-row
    * summary agg over the group table. All integers.
    */
  def kAnonAudit(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2: $k")
    val groups = df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("n"))
    groups.agg(
      count(lit(1)).as("n_groups"),
      sum(col("n")).as("n_rows"),
      min(col("n")).as("min_group_size"),
      sum(when(col("n") < k, 1L).otherwise(0L)).as("n_violating_groups"),
      sum(when(col("n") < k, col("n")).otherwise(0L)).as("n_suppressed_rows"))
  }

  /** Chi-square independence audit between two categorical columns —
    * the mixture-design check (is language independent of source? is
    * label independent of shard?) behind every "balanced corpus" claim.
    * Full-table chi²: observed cells contribute (o−e)²/e, UNOBSERVED
    * (a, b) combinations contribute e (the term naive observed-only
    * sums silently drop), folded via Σ_all e = n so only observed cells
    * are ever materialized: chi² = Σ_obs[(o−e)²/e − e] + n.
    *
    * Scale shape: one map-side-combined count to the (a × b)-bounded
    * cells frame (watched-column cardinality contract), two tiny
    * marginal aggs broadcast back, one-row output.
    *
    * Determinism: with e = ra·cb/n, each observed cell's two terms are
    * the positive integral floors (10⁶·(o·n−ra·cb)²) div (n·ra·cb) and
    * (10⁶·ra·cb) div n — truncation = floor on positives in both
    * engines; chi2_ppm = 10⁶·n + Σterm1 − Σterm2, exact integers
    * throughout.
    */
  def chiSquareAudit(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    // underscore-prefixed internals: a user column literally named "ra"
    // or "cb" must not collide with the margin aliases
    val cells = df.groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("_g_o"))
    val ra = cells.groupBy(col(aCol)).agg(sum(col("_g_o")).as("_g_ra"))
    val cb = cells.groupBy(col(bCol)).agg(sum(col("_g_o")).as("_g_cb"))
    val tot = cells.agg(sum(col("_g_o")).as("_g_n"))
    cells
      .join(broadcast(ra), Seq(aCol))
      .join(broadcast(cb), Seq(bCol))
      .crossJoin(broadcast(tot))
      // DECIMAL(38,0) fence: |dev| = |o·n − ra·cb| reaches ~n²/4 on
      // strongly dependent tables, so 10⁶·dev² overflows int64 already at
      // |dev| > ~3·10⁶ (thousands of rows), and n·ra·cb alone passes 2⁶³
      // near n ≈ 2M even under independence. The decimal carrier holds
      // 10⁶·dev² to |dev| ≈ 10¹⁶, i.e. n up to ~2·10⁸ rows per audited
      // pair — the corpus-scale regime the operator documents. `div` on
      // decimals still yields BIGINT, so the output schema is unchanged.
      .withColumn("_g_dev",
        col("_g_o").cast("decimal(38,0)") * col("_g_n").cast("decimal(38,0)")
          - col("_g_ra").cast("decimal(38,0)") * col("_g_cb").cast("decimal(38,0)"))
      .withColumn("_g_t1", expr(
        "(CAST(1000000 AS DECIMAL(38,0)) * _g_dev * _g_dev) div " +
          "(CAST(_g_n AS DECIMAL(38,0)) * CAST(_g_ra AS DECIMAL(38,0)) * CAST(_g_cb AS DECIMAL(38,0)))"))
      .withColumn("_g_t2", expr(
        "(CAST(1000000 AS DECIMAL(38,0)) * CAST(_g_ra AS DECIMAL(38,0)) * CAST(_g_cb AS DECIMAL(38,0))) div CAST(_g_n AS DECIMAL(38,0))"))
      .agg(
        min(col("_g_n")).as("n_rows"),
        countDistinct(col(aCol)).as("n_a"),
        countDistinct(col(bCol)).as("n_b"),
        count(lit(1)).as("n_observed_cells"),
        sum(col("_g_t1")).as("s1"), sum(col("_g_t2")).as("s2"))
      .select(col("n_rows"), col("n_a"), col("n_b"), col("n_observed_cells"),
        (lit(1000000L) * col("n_rows") + col("s1") - col("s2")).as("chi2_ppm"))
  }

  /** Benford first-significant-digit audit — the forensic data-quality
    * read over a positive numeric column (Benford 1938; Nigrini's fraud
    * practice): naturally occurring multi-magnitude quantities put
    * digit d first with probability log10(1+1/d), and synthetic /
    * fabricated / truncated feeds don't. Per digit 1..9: observed
    * count, floor-share observed ppm, the expected ppm (the nine
    * round(10⁶·log10(1+1/d)) constants — they sum to exactly 10⁶), and
    * the signed deviation. A scrape whose "sizes" were invented, a
    * price feed that clipped at a cap, or a unit mix-up all read as
    * large |dev_ppm| on specific digits.
    *
    * Reference scope note: no counterpart in the reference engine
    * (its analytics stop at SUM/COUNT rollups, `handler.go:139-153`);
    * extension-mandate operator for ingest forensics.
    *
    * Digit extraction is STRING-form: the first `[1-9]` char of the
    * value's decimal string (sign, zeros and the point never match), so
    * it is exact on DECIMAL/integer carriers in both engines — callers
    * pass decimals or integers, never raw doubles (scientific notation
    * would lie about the leading digit).
    *
    * Scale: one 9-group map-side-combined count, two broadcast joins,
    * 9-row output — corpus-size independent memory.
    */
  def benfordAudit(df: DataFrame, c: String): DataFrame = {
    val digits = df
      .filter(col(c).isNotNull && col(c) > lit(0))
      .select(regexp_extract(col(c).cast("string"), "[1-9]", 0).as("d"))
      .filter(col("d") =!= "")
      .select(col("d").cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = digits.agg(coalesce(sum(col("n")), lit(0L)).as("total"))
    val expected = df.sparkSession.range(1, 10)
      .select(col("id").as("digit"), expr(
        """CAST(CASE id WHEN 1 THEN 301030 WHEN 2 THEN 176091
          |  WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181
          |  WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153
          |  ELSE 45757 END AS BIGINT)""".stripMargin).as("exp_ppm"))
    expected.join(digits, Seq("digit"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("obs_ppm",
        expr("CASE WHEN total > 0 THEN n * 1000000 DIV total ELSE 0 END"))
      .select(col("digit"), col("n"), col("obs_ppm"), col("exp_ppm"),
        (col("obs_ppm") - col("exp_ppm")).as("dev_ppm"))
  }

  /** Cramér's V association matrix (Cramér 1946) — [[chiSquareAudit]]
    * normalized onto [0,1] and swept over every unordered pair of a
    * BOUNDED audit-column list: χ² grows with n so raw χ² values are
    * incomparable across pairs, while V² = χ²/(n·(min(k_a,k_b)−1)) is
    * the effect size that answers "which metadata columns encode the
    * same thing" (redundant stratifiers, leaky label proxies) in one
    * read. Reported as exact integer `v2_ppm` = 10⁶·V² (floor), χ²
    * alongside for the significance read — no sqrt crosses the gate.
    *
    * Scale: |cols|²/2 independent [[chiSquareAudit]] folds (each one
    * map-side-combined cell agg + broadcast margins, one output row);
    * cols is a handful of audit columns by contract, the per-pair NDV
    * product bounded as in the parent.
    *
    * Reference scope note: no counterpart in the reference engine
    * (SUM/COUNT rollups only, `handler.go:139-153`); extension-mandate.
    */
  def cramersVMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.size <= 16,
      s"need 2..16 audit columns: ${cols.size}")
    // ONE stacked scan for every unordered pair (r19, the
    // [[mutualInfoMatrix]] rewrite applied to the χ² algebra — the
    // per-pair [[chiSquareAudit]] calls each re-scanned the base table
    // several times). Cells are keyed (stringified value, is-null flag)
    // so one struct type fits every column; the single-pair audit joins
    // on RAW keys, where a NULL never matches itself — the explicit
    // `!vna && !vnb` filter replicates that null-cell drop exactly
    // (margins still include null-partner cells, as the raw joins did).
    // Per-pair cells, margins, and the decimal χ² fold are therefore
    // value-identical to chiSquareAudit's (which single-pair rows keep).
    val pairs = cols.combinations(2).map(p => (p.head, p.last)).toSeq
    val cells = Dedup.cached(df.select(explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("pa"), lit(b).as("pb"),
          col(a).cast("string").as("va"), col(a).isNull.as("vna"),
          col(b).cast("string").as("vb"), col(b).isNull.as("vnb"))
      }: _*)).as("kv"))
      .groupBy(col("kv.pa").as("pa"), col("kv.pb").as("pb"),
        col("kv.va").as("va"), col("kv.vna").as("vna"),
        col("kv.vb").as("vb"), col("kv.vnb").as("vnb"))
      .agg(count(lit(1)).as("_g_o")))
    val ra = cells.groupBy(col("pa"), col("pb"), col("va"), col("vna"))
      .agg(sum(col("_g_o")).as("_g_ra"))
    val cb = cells.groupBy(col("pa"), col("pb"), col("vb"), col("vnb"))
      .agg(sum(col("_g_o")).as("_g_cb"))
    val tot = cells.groupBy(col("pa"), col("pb"))
      .agg(sum(col("_g_o")).as("_g_n"))
    val chi = cells
      .join(broadcast(ra), Seq("pa", "pb", "va", "vna"))
      .join(broadcast(cb), Seq("pa", "pb", "vb", "vnb"))
      .join(broadcast(tot), Seq("pa", "pb"))
      .filter(!col("vna") && !col("vnb"))
      .withColumn("_g_dev",
        col("_g_o").cast("decimal(38,0)") * col("_g_n").cast("decimal(38,0)")
          - col("_g_ra").cast("decimal(38,0)") * col("_g_cb").cast("decimal(38,0)"))
      .withColumn("_g_t1", expr(
        "(CAST(1000000 AS DECIMAL(38,0)) * _g_dev * _g_dev) div " +
          "(CAST(_g_n AS DECIMAL(38,0)) * CAST(_g_ra AS DECIMAL(38,0)) * CAST(_g_cb AS DECIMAL(38,0)))"))
      .withColumn("_g_t2", expr(
        "(CAST(1000000 AS DECIMAL(38,0)) * CAST(_g_ra AS DECIMAL(38,0)) * CAST(_g_cb AS DECIMAL(38,0))) div CAST(_g_n AS DECIMAL(38,0))"))
      .groupBy(col("pa"), col("pb"))
      .agg(
        min(col("_g_n")).as("n_rows"),
        countDistinct(col("va")).as("n_a"),
        countDistinct(col("vb")).as("n_b"),
        count(lit(1)).as("n_observed_cells"),
        sum(col("_g_t1")).as("s1"), sum(col("_g_t2")).as("s2"))
      .select(col("pa"), col("pb"), col("n_rows"), col("n_a"), col("n_b"),
        col("n_observed_cells"),
        (lit(1000000L) * col("n_rows") + col("s1") - col("s2")).as("chi2_ppm"))
    // literal pair spine — the per-pair global agg emitted one row per
    // pair even over an empty input (counts 0, sums NULL); replicate
    val spine = df.sparkSession.range(1).select(
      explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("pa"), lit(b).as("pb")) }: _*)).as("kv"))
      .select(col("kv.pa").as("pa"), col("kv.pb").as("pb"))
    chi.join(spine, Seq("pa", "pb"), "right")
      .select(col("pa").as("col_a"), col("pb").as("col_b"), col("n_rows"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        col("chi2_ppm"),
        // clamp at 0 BEFORE the division: the ppm-floored χ² can dip
        // a few ppm negative near independence, and Spark's DIV
        // truncates where the oracle's // floors — they only agree on
        // non-negative operands (V² is non-negative anyway)
        when(col("n_rows") > 0L && least(col("n_a"), col("n_b")) > 1L,
          expr("greatest(chi2_ppm, 0) DIV (n_rows * (least(n_a, n_b) - 1))"))
          .as("v2_ppm"))
  }

  /** Gini index of a non-negative measure (Gini 1912, via the exact
    * sorted-rank identity G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx)/(n·Σx)) — the
    * inequality number [[sourceConcentration]]'s HHI approximates: how
    * unevenly is storage / token mass / compute spread across units
    * (addresses, sources, users). 0 = perfectly even, →10⁶ = one unit
    * holds everything. Integer-exact in ppm: rank mass folds per
    * DISTINCT value (a block of c equal values at prior cumulative C
    * contributes v·(c·C + c(c+1)/2) — no per-row rank window), sums
    * DECIMAL(38,0)-fenced (Σi·x ≈ n²·max(x)/2 passes int64 early).
    *
    * Intended input is an already-AGGREGATED per-unit frame (the
    * [[graft.operators.DiskUsageOp]] rollup, per-source token totals).
    * The cumulative fold over the distinct-value frame is two-level
    * range-sharded (never a one-task global window), so even a corpus
    * of distinct unit sizes distributes. Negative values are excluded
    * by contract (sizes/counts); rows with NULL likewise.
    *
    * Reference scope note: composes over the reference's A1 rollup
    * (`handler.go:231-251`); the index itself is extension-mandate.
    */
  /** Shared sorted-fold input: a single-column `v` frame → `(v, c,
    * cumc)` — per DISTINCT value its count and the INCLUSIVE cumulative
    * count in value order, computed two-level range-sharded (the
    * [[graft.operators.Splits.globalOrder]] discipline — a bare ORDER BY
    * window would sort the whole frame in ONE task): range-shard by
    * value (partition id is monotone in v), cum-sum within shard, add
    * the broadcast prefix-sum of lower shards' count mass. The
    * localCheckpoint pins the SAMPLED range boundaries so the offsets
    * branch and the main branch cannot disagree on a value's shard.
    * Every exact order-statistic operator ([[giniIndex]],
    * [[trimmedMean]]) folds over this frame.
    */
  private[graft] def cellsCum(vals: DataFrame, shards: Int): DataFrame =
    ShardedFold.prefix(
      vals.groupBy(col("v")).agg(count(lit(1)).as("c")),
      keyCols = Nil, orderCols = Seq("v"),
      sums = Seq("c" -> "cumc"), idxCol = None, shards = shards)

  /** Keyed variant of [[cellsCum]]: a `(k, v)` frame → `(k, v, c, cumc)`
    * with each key's inclusive cumulative distinct-value count in value
    * order, range-sharded on (k, v) — so a VIRAL key's distinct-value
    * frame spans as many shards as it needs instead of pinning one task
    * (the `Window.partitionBy(k)` failure mode this replaces: per-key
    * partitions are single-task no matter the key's NDV).
    *
    * Offset algebra: lexicographic (k, v) range partitioning keeps every
    * key's cells on a CONTIGUOUS shard interval, so a cell's global
    * offset is the sum of its key's counts on strictly-lower shards.
    * Only keys that CROSS a shard boundary have nonzero offsets, and at
    * most `shards` keys can cross (one straddler per boundary), so the
    * offset table is ≤ 2·shards rows at ANY key cardinality — always
    * broadcastable, never a key-cardinality exchange.
    */
  private[graft] def cellsCumByKey(kv: DataFrame, shards: Int): DataFrame =
    ShardedFold.prefix(
      kv.groupBy(col("k"), col("v")).agg(count(lit(1)).as("c")),
      keyCols = Seq("k"), orderCols = Seq("v"),
      sums = Seq("c" -> "cumc"), idxCol = None, shards = shards)

  def giniIndex(df: DataFrame, valCol: String, shards: Int = 64): DataFrame = {
    cellsCum(
      df.select(col(valCol).cast("long").as("v"))
        .filter(col("v").isNotNull && col("v") >= 0L), shards)
      .agg(sum(col("c")).as("n"),
        sum((col("v") * col("c")).cast("decimal(38,0)")).as("t"),
        sum(expr(
          "CAST(v AS DECIMAL(38,0)) * (CAST(c AS DECIMAL(38,0)) *" +
            " CAST(cumc - c AS DECIMAL(38,0)) + (CAST(c AS DECIMAL(38,0)) *" +
            " CAST(c + 1 AS DECIMAL(38,0))) div 2)")).as("s"))
      .select(col("n").as("n_units"), col("t").cast("long").as("total"),
        when(col("n") > 0L && col("t") > lit(0).cast("decimal(38,0)"), expr(
          "(CAST(1000000 AS DECIMAL(38,0)) * (2 * s - (CAST(n AS" +
            " DECIMAL(38,0)) + 1) * t)) div (CAST(n AS DECIMAL(38,0)) * t)"))
          .as("gini_ppm"))
  }

  /** [[giniIndex]] per key — the stratified inequality read (is doc
    * length / usage / token mass skewed WITHIN each source, or only
    * across sources): identical rank-mass algebra with the cumulative
    * fold over [[cellsCumByKey]]'s (k, v)-range-sharded frame — a viral
    * key's distinct-value cells spread across shards with broadcast
    * boundary offsets, so NO key can pin a single task no matter its
    * NDV (ScaleSmoke A/Bs one 5M-distinct-value key against the old
    * per-key-window shape).
    */
  def giniByKey(df: DataFrame, keyCol: String, valCol: String,
      shards: Int = 64): DataFrame = {
    cellsCumByKey(
      df.select(col(keyCol).as("k"), col(valCol).cast("long").as("v"))
        .filter(col("v").isNotNull && col("v") >= 0L), shards)
      .groupBy(col("k"))
      .agg(sum(col("c")).as("n"),
        sum((col("v") * col("c")).cast("decimal(38,0)")).as("t"),
        sum(expr(
          "CAST(v AS DECIMAL(38,0)) * (CAST(c AS DECIMAL(38,0)) *" +
            " CAST(cumc - c AS DECIMAL(38,0)) + (CAST(c AS DECIMAL(38,0)) *" +
            " CAST(c + 1 AS DECIMAL(38,0))) div 2)")).as("s"))
      .select(col("k").as(keyCol), col("n").as("n_units"),
        col("t").cast("long").as("total"),
        when(col("n") > 0L && col("t") > lit(0).cast("decimal(38,0)"), expr(
          "(CAST(1000000 AS DECIMAL(38,0)) * (2 * s - (CAST(n AS" +
            " DECIMAL(38,0)) + 1) * t)) div (CAST(n AS DECIMAL(38,0)) * t)"))
          .as("gini_ppm"))
  }

  /** Trimmed and winsorized means (Tukey; Dixon 1960) — the robust
    * location estimates a corpus metric should ship next to its plain
    * mean: trim drops the k = ⌊n·trimPpm/10⁶⌋ smallest and largest
    * values, winsorize CLAMPS them to the surviving extremes (rank k+1
    * and rank n−k values) — one wild scrape batch cannot own either
    * number, where the plain mean follows it linearly.
    *
    * Exact integer algebra over the [[cellsCum]] sorted fold: a cell of
    * c equal values occupying ranks (cumc−c, cumc] contributes
    * v·|[cumc−c+1, cumc] ∩ [k+1, n−k]| to the trimmed sum (pure
    * interval arithmetic — no per-row rank ever materializes), and the
    * two clamp values are the cells whose rank interval contains k+1 /
    * n−k. Means are sign-safe ppm divisions (values may be negative),
    * DECIMAL(38,0)-fenced. One distinct-value fold, one 1-row output.
    *
    * Reference scope note: no counterpart in the reference engine
    * (plain SUM/COUNT only, `handler.go:139-153`); extension-mandate.
    */
  def trimmedMean(df: DataFrame, valCol: String, trimPpm: Long = 50000L,
      shards: Int = 64): DataFrame = {
    require(trimPpm >= 0L && trimPpm <= 400000L,
      s"trimPpm must be in [0, 400000]: $trimPpm")
    val cc = cellsCum(
      df.select(col(valCol).cast("long").as("v"))
        .filter(col("v").isNotNull), shards)
    val tot = cc.agg(coalesce(sum(col("c")), lit(0L)).as("n"))
    cc.crossJoin(broadcast(tot))
      .withColumn("k", expr(s"(n * ${trimPpm}L) DIV 1000000"))
      .withColumn("lo", greatest(col("cumc") - col("c") + 1L, col("k") + 1L))
      .withColumn("hi", least(col("cumc"), col("n") - col("k")))
      .withColumn("cnt", greatest(col("hi") - col("lo") + 1L, lit(0L)))
      .agg(min(col("n")).as("n_rows"), min(col("k")).as("k_trim"),
        sum((col("v") * col("cnt")).cast("decimal(38,0)")).as("ts"),
        sum(col("cnt")).as("tc"),
        min(when(col("cumc") >= col("k") + 1L &&
          col("cumc") - col("c") < col("k") + 1L, col("v"))).as("v_lo"),
        min(when(col("cumc") >= col("n") - col("k") &&
          col("cumc") - col("c") < col("n") - col("k"), col("v"))).as("v_hi"))
      .withColumn("ws", col("ts") +
        (col("k_trim") * col("v_lo") + col("k_trim") * col("v_hi"))
          .cast("decimal(38,0)"))
      .select(col("n_rows"), col("k_trim"),
        when(col("tc") > 0L, signum(col("ts")).cast("long") * expr(
          "(CAST(1000000 AS DECIMAL(38,0)) * abs(ts)) div tc"))
          .as("trimmed_mean_ppm"),
        when(col("n_rows") > 0L, signum(col("ws")).cast("long") * expr(
          "(CAST(1000000 AS DECIMAL(38,0)) * abs(ws)) div n_rows"))
          .as("winsor_mean_ppm"))
  }

  /** l-diversity audit — [[kAnonAudit]]'s stronger sibling: k-anonymity
    * bounds group SIZE, but a group whose sensitive attribute is
    * constant still leaks it to anyone who can name the group
    * (homogeneity attack). Per quasi-identifier group this measures the
    * DISTINCT sensitive values; the audit row counts groups below `l`
    * and the rows they expose. Same scale shape as the parent: one
    * two-level aggregation (distinct-sensitive per group rides the
    * first), one-row output.
    */
  def lDiversityAudit(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2: $l")
    val groups = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
    groups.agg(
      count(lit(1)).as("n_groups"),
      sum(col("n")).as("n_rows"),
      min(col("n_sensitive")).as("min_l"),
      sum(when(col("n_sensitive") < l, 1L).otherwise(0L)).as("n_violating_groups"),
      sum(when(col("n_sensitive") < l, col("n")).otherwise(0L)).as("n_exposed_rows"))
  }

  /** Per-group quantile normalization of a score column — the
    * cross-source calibration step run before ANY global threshold on a
    * heterogeneous corpus: a quality score of 120 means different things
    * on Wikipedia and on Common Crawl, so each row is re-expressed as
    * its percentile WITHIN its source, pct_ppm = (rank−1)·10⁶ DIV (n−1)
    * (rank() semantics: equal scores share a percentile — ties must
    * calibrate identically), plus the derived calibrated decile
    * (`least(9, pct DIV 10⁵)`). After this, "keep the top 20% of each
    * source" is one global predicate.
    *
    * Scale shape: two windows over ONE (group)-partitioned exchange
    * (rank + partition count share the sort); a group's rows sort
    * together — the [[graft.operators.Splits]] global-order contract
    * per source, fine while no single source dwarfs executor spill
    * capacity. At extreme per-source cardinality swap the rank for an
    * equi-depth-histogram lookup (the q_histogram_equidepth shape):
    * boundaries from a bounded agg, the percentile then a row-local
    * binary search — same output within histogram resolution.
    * A 1-row group has no spread: pct_ppm pins to 0.
    */
  def quantileNormalize(df: DataFrame, groupCol: String, scoreCol: String,
      idCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol))
    val wn = Window.partitionBy(col(groupCol))
    df.select(idCols.map(col) ++ Seq(col(groupCol), col(scoreCol)): _*)
      .withColumn("rk", rank().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("pct_ppm",
        when(col("n") > 1L, expr("((rk - 1) * 1000000) DIV (n - 1)"))
          .otherwise(0L))
      .withColumn("calib_decile", least(lit(9L), expr("pct_ppm DIV 100000")))
      .drop("rk", "n")
  }

  /** [[quantileNormalize]]'s documented scale swap, as a REAL code path:
    * calibrated deciles from per-group equi-depth boundaries instead of
    * a per-group rank window. Boundaries are the nine exact decile order
    * statistics via [[groupedQuantiles]] (distributed histogram
    * narrowing — no window, no buffer, no per-group sort anywhere), and
    * each row's decile is then the ROW-LOCAL count of boundaries ≤ its
    * score against the broadcast (group × 9) boundary frame.
    *
    * Honest trade (ScaleSmoke-measured): at 5M rows with a 98%-hot
    * source the RANK form wins latency outright (0.7 s vs 20.5 s at
    * local[32] — a 5M-row window sort is one cheap spilling task, while
    * the boundary selector pays ~9 narrowing passes). This form exists
    * for the regime the latency test can't show: a hot group so large
    * it cannot be ONE task at all (the window form necessarily sorts a
    * whole group inside a single partition — a 50 TB source is a
    * days-long straggler there, but distributes freely here). Secondary
    * trades: decile resolution (not ppm), and a different-but-
    * deterministic estimator convention (#boundaries ≤ score — agrees
    * with the rank form as n grows, differs at tiny n; ties still
    * calibrate identically).
    */
  def quantileNormalizeHist(df: DataFrame, groupCol: String,
      scoreCol: String, idCols: Seq[String]): DataFrame = {
    val bounds = groupedQuantiles(df, groupCol, scoreCol,
        (1L to 9L).map(_ * 100000L))
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(col("value_u6"))).as("bounds"))
    df.select(idCols.map(col) ++ Seq(col(groupCol), col(scoreCol)): _*)
      .join(broadcast(bounds), Seq(groupCol))
      .withColumn("calib_decile",
        expr(s"size(filter(bounds, b -> b <= CAST(round($scoreCol * 1000000, 0) AS BIGINT)))")
          .cast("long"))
      .drop("bounds")
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    * rung of the privacy ladder after [[kAnonAudit]] (group size) and
    * [[lDiversityAudit]] (distinct sensitive values): a group can pass
    * both and still leak via SKEW — if a group's sensitive-value
    * distribution differs sharply from the corpus-wide one, naming the
    * group reveals information. Distance is the ordered-attribute Earth
    * Mover's Distance, EMD = (1/(m−1))·Σᵢ|cumP(i) − cumQ(i)| over the m
    * sensitive levels, kept integer-exact by clearing denominators:
    * dᵢ = |N·cum_g(i) − n_g·cum_all(i)| and
    * emd_ppm = 10⁶·Σdᵢ DIV ((m−1)·n_g·N) — no float crosses the gate.
    *
    * Per-group rows (not a one-row audit): EMD is the diagnostic a
    * suppression pass consumes group by group.
    *
    * Scale shape: one (group, level) aggregation; everything after runs
    * on the |G|·m dense grid (groups × broadcast level list — levels
    * ABSENT from a group count as zeros, which the sparse counts alone
    * would silently skip); the cumulative windows partition by group
    * over m levels (bounded by contract — a sensitive attribute with
    * unbounded levels is a different problem). Overflow fence: 10⁶·Σd
    * needs n_g·N·m < ~10¹² — beyond that cast the three sum columns to
    * DECIMAL(38,0) (same plan).
    */
  def tClosenessAudit(df: DataFrame, qiCols: Seq[String], lvlCol: String,
      tPpm: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(tPpm >= 0, s"tPpm must be >= 0: $tPpm")
    val qi = qiCols.map(col)
    // Loud-failure fence on the sensitive column: t-closeness is usually
    // run on a CATEGORICAL sensitive attribute, and a bare cast("long")
    // would turn every non-integral value into NULL — collapsing all
    // levels into one NULL bucket and reporting EMD 0 / no violations,
    // i.e. a silently PASSING privacy audit on garbage input. A non-null
    // value that casts to NULL raises instead; genuinely NULL sensitive
    // values keep their own group as before.
    val lvlChecked = when(col(lvlCol).isNull, lit(null).cast("long"))
      .otherwise(coalesce(expr(s"try_cast(`$lvlCol` AS BIGINT)"),
        expr("CAST(raise_error(CONCAT('tClosenessAudit: sensitive column '," +
          s" '$lvlCol', ' is not integral — level-encode categorical'," +
          " ' sensitive attributes to integers first')) AS BIGINT)")))
    val cells = Dedup.cached(
      df.groupBy(qi :+ lvlChecked.as("lvl"): _*)
        .agg(count(lit(1)).as("c")))
    val levels = Dedup.cached(cells.select(col("lvl")).distinct())
    val groups = cells.groupBy(qi: _*).agg(sum(col("c")).as("ng"))
    val mDf = levels.agg(count(lit(1)).as("m"))
    val nDf = cells.agg(sum(col("c")).as("nn"))
    // global cumulative level counts: a window over the m-row level frame
    val globCum = cells.groupBy(col("lvl")).agg(sum(col("c")).as("gc"))
      .withColumn("cuma", sum(col("gc")).over(Window.orderBy(col("lvl"))))
      .select(col("lvl"), col("cuma"))
    val grid = groups.crossJoin(broadcast(levels))
    val cum = grid.join(cells, qiCols :+ "lvl", "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cumg", sum(col("c")).over(
        Window.partitionBy(qi: _*).orderBy(col("lvl"))))
    cum.join(broadcast(globCum), Seq("lvl"))
      .crossJoin(broadcast(nDf))
      .withColumn("d", abs(col("nn") * col("cumg") - col("ng") * col("cuma")))
      .groupBy(qi: _*)
      .agg(min(col("ng")).as("n"), sum(col("d")).as("sd"), min(col("nn")).as("nn"))
      .crossJoin(broadcast(mDf))
      .withColumn("emd_ppm",
        when(col("m") > 1L,
          expr("(1000000 * sd) DIV ((m - 1) * n * nn)")).otherwise(0L))
      .withColumn("violating", col("emd_ppm") > tPpm)
      .select(qi ++ Seq(col("n"), col("emd_ppm"), col("violating")): _*)
  }

  /** Delete-one-bucket jackknife variance of per-group means (Quenouille
    * 1956 / Tukey 1958; the delete-d form Efron & Stein 1981 analyze) —
    * the error bar an aggregate SHOULD ship with: rows hash into
    * `buckets` deterministic md5 folds, each replicate mean leaves one
    * fold out, and the spread of the replicates estimates the mean's
    * sampling variance with NO distributional assumption and NO second
    * pass. Deterministic buckets ⇒ reruns and the oracle reproduce the
    * identical error bar.
    *
    * Integer contract: `valCol` is already an exact long; replicate
    * means are integer divs at `scale` (pick scale so valCol·scale is
    * micro-units of the ORIGINAL quantity — a pre-scaled valCol needs
    * only the residual factor, keeping the squared moments under 2⁶³),
    * the variance is the exact
    * integer expansion Σm² − 2·m̄·Σm + B·m̄² (m̄ itself an integer div —
    * part of the estimator's definition here, not a rounding
    * afterthought), scaled (B−1)/B. A replicate whose complement is
    * empty (the whole group hashed into one fold) is skipped and
    * `n_replicas` says so.
    *
    * Scale shape: one (group, bucket) map-side-combined agg, one
    * group-keyed rollup, one group-keyed join back over the
    * B-rows-per-group frame — never a window, never a buffer holding a
    * group. Overflow fence: Σm² needs B·mean_u6² < 2⁶³ (mean below
    * ~10⁹ micro-units at B=8); beyond that cast the moment columns to
    * DECIMAL(38,0).
    */
  /** Reliability curve (calibration audit — DeGroot & Fienberg 1983;
    * the quality-classifier check run before trusting any score-based
    * corpus cut): scores bucket into `buckets` equal-width bins, and
    * each bin reports its mean predicted score against the realized
    * positive rate — `gap_ppm` = frac_pos − mean_score is the signed
    * miscalibration that says "a 0.9 from this scorer means 0.7".
    *
    * `scorePpmCol` is the score as an exact ppm long in [0, 10⁶]
    * (decimal-scaled upstream); `labelCol` is 0/1 long. Integer
    * end-to-end: bin = least(buckets−1, score·buckets DIV 10⁶), means
    * as truncating DIV on non-negatives. One map-side-combined agg on
    * the bounded bin key; no window, no join.
    */
  def reliabilityCurve(df: DataFrame, scorePpmCol: String,
      labelCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 1000, s"buckets must be in [2,1000]: $buckets")
    df.select(col(scorePpmCol).as("s"), col(labelCol).cast("long").as("y"))
      .withColumn("bin",
        least(lit(buckets - 1L), expr(s"(s * $buckets) DIV 1000000")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("ss"),
        sum(col("y")).as("n_pos"))
      .select(col("bin"), col("n"),
        expr("ss DIV n").as("mean_score_ppm"),
        expr("(1000000 * n_pos) DIV n").as("frac_pos_ppm"),
        (expr("(1000000 * n_pos) DIV n") - expr("ss DIV n")).as("gap_ppm"))
  }

  /** ROC-AUC as the exact Mann–Whitney rank statistic (Mann & Whitney
    * 1947; Hanley & McNeil 1982 for the AUC identity) — the
    * DISCRIMINATION metric to [[reliabilityCurve]]'s calibration: does
    * the score rank positives above negatives at all, independent of any
    * threshold. Computed without a corpus-wide rank window:
    * U = Σ_{pos,neg} [s⁺ > s⁻] + ½·ties folds per DISTINCT score value
    * (u2 = Σ_s np(s)·(2·cum_nn_below + nn(s)) carries 2U so ties stay
    * integral), and auc_ppm = 10⁶·u2 DIV (2·n_pos·n_neg),
    * DECIMAL(38,0)-fenced.
    *
    * Scale shape: one map-side-combined agg onto the distinct-score
    * frame, one ordered window over THAT frame (bounded by the score's
    * ppm codomain — ≤ 10⁶+1 rows, never the corpus), one 1-row agg.
    */
  def scoreAuc(df: DataFrame, scorePpmCol: String,
      labelCol: String): DataFrame = {
    val cells = df
      .select(col(scorePpmCol).as("s"), col(labelCol).cast("long").as("y"))
      .groupBy(col("s"))
      .agg(sum(col("y")).as("np"), sum(lit(1L) - col("y")).as("nn"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    cells
      .withColumn("cumnn", coalesce(sum(col("nn")).over(w), lit(0L)))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (lit(2L) * col("cumnn") + col("nn"))).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        when(col("n_pos") > 0L && col("n_neg") > 0L, expr(
          "(CAST(1000000 AS DECIMAL(38,0)) * CAST(u2 AS DECIMAL(38,0))) div " +
            "(CAST(2 AS DECIMAL(38,0)) * CAST(n_pos AS DECIMAL(38,0)) * CAST(n_neg AS DECIMAL(38,0)))"))
          .as("auc_ppm"))
  }

  /** [[scoreAuc]] per key — the mixture read (does the scorer
    * discriminate on EVERY source, or only on the easy one the corpus
    * average reflects): identical Mann–Whitney fold with every stage
    * partitioned by the key; the ordered window still runs over the
    * per-key distinct-score frame (codomain-bounded), sharing one
    * (key)-keyed exchange with the final agg.
    */
  def scoreAucByKey(df: DataFrame, keyCol: String, scorePpmCol: String,
      labelCol: String): DataFrame = {
    val cells = df
      .select(col(keyCol).as("key"), col(scorePpmCol).as("s"),
        col(labelCol).cast("long").as("y"))
      .groupBy(col("key"), col("s"))
      .agg(sum(col("y")).as("np"), sum(lit(1L) - col("y")).as("nn"))
    val w = Window.partitionBy(col("key")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    cells
      .withColumn("cumnn", coalesce(sum(col("nn")).over(w), lit(0L)))
      .groupBy(col("key"))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (lit(2L) * col("cumnn") + col("nn"))).as("u2"))
      .select(col("key"), col("n_pos"), col("n_neg"), col("u2"),
        when(col("n_pos") > 0L && col("n_neg") > 0L, expr(
          "(CAST(1000000 AS DECIMAL(38,0)) * CAST(u2 AS DECIMAL(38,0))) div " +
            "(CAST(2 AS DECIMAL(38,0)) * CAST(n_pos AS DECIMAL(38,0)) * CAST(n_neg AS DECIMAL(38,0)))"))
          .as("auc_ppm"))
  }

  /** Spearman rank correlation between two columns (Spearman 1904) —
    * the MONOTONE-association audit to [[scoreAuc]]'s discrimination
    * read: do two quality scores agree on ordering at all, robust to any
    * monotone rescaling and to outliers (where Pearson on raw values is
    * neither). Ties get average ranks (the exact tie-corrected form ρ =
    * Pearson on ranks); doubled ranks (2·cum − cnt + 1) keep the
    * half-integer averages integral, and the factor cancels in ρ.
    *
    * Computed without a corpus-wide rank window (the [[scoreAuc]]
    * discipline): per column, ranks fold on the DISTINCT-value frame
    * (one map-side-combined agg, one ordered window bounded by the
    * column's NDV — callers pass NDV-bounded carriers: ppm scores,
    * bucketed/decimal measures, never raw doubles), joined back
    * value-keyed. Moments are DECIMAL(38,0)-fenced (Σr² ≈ 4n³ and the
    * n·Σr² products pass int64 early); the only floats are the final
    * correctly-rounded sqrt/div, 6-dp rounded (house float rule).
    *
    * Reference scope note: no counterpart in the reference engine
    * (SUM/COUNT rollups only, `handler.go:139-153`); extension-mandate
    * operator for scorer-agreement audits.
    */
  def spearmanCorr(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val v = df.select(col(xCol).as("x"), col(yCol).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    // doubled average ranks off the SHARED range-sharded sorted fold
    // ([[cellsCum]]) — never a one-task global window, even when the
    // carrier's NDV approaches the corpus
    def ranks2(cn: String): DataFrame =
      cellsCum(v.select(col(cn).as("v")), 64)
        .select(col("v").as(cn),
          (lit(2L) * col("cumc") - col("c") + lit(1L))
            .cast("decimal(38,0)").as(s"r2$cn"))
    val dec = "decimal(38,0)"
    v.join(ranks2("x"), Seq("x")).join(ranks2("y"), Seq("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("r2x")).as("sa"), sum(col("r2y")).as("sb"),
        sum(col("r2x") * col("r2x")).as("saa"),
        sum(col("r2y") * col("r2y")).as("sbb"),
        sum(col("r2x") * col("r2y")).as("sab"))
      .withColumn("covn",
        (col("n").cast(dec) * col("sab") - col("sa") * col("sb")).cast("double"))
      .withColumn("vx",
        (col("n").cast(dec) * col("saa") - col("sa") * col("sa")).cast("double"))
      .withColumn("vy",
        (col("n").cast(dec) * col("sbb") - col("sb") * col("sb")).cast("double"))
      .select(col("n").as("n_rows"),
        when(col("vx") > 0.0 && col("vy") > 0.0,
          round(col("covn") / (sqrt(col("vx")) * sqrt(col("vy"))), 6)
            + lit(0.0)).as("rho"))
  }

  /** User-level differential-privacy sensitivity audit (Dwork et al.
    * 2006's sensitivity calculus applied at the USER grain — the unit
    * that matters for training-data releases; Amin et al. 2019 on the
    * clipping bias–variance trade): before any DP release of per-group
    * counts/sums, the mechanism designer needs, PER GROUP, how hard one
    * user can move the answer — `max_user_rows` (L∞/L0: adding or
    * removing one user changes the count by at most this) and
    * `max_user_abs_sum` (L1: ditto for the sum). The noise scale is
    * proportional to these; the audit also emits
    * `top_user_share_ppm` = 10⁶·max|user sum| DIV Σ|user sums| — a group
    * a single user dominates stays identifiable under any clip that
    * keeps the group's signal, which is a suppress-the-group read, not a
    * clip-harder read.
    *
    * `valCol` must already be an exact long (decimal-scaled upstream —
    * the house [[graft.operators.Splits.sampledAggHt]] contract).
    *
    * Scale shape: two stacked map-side-combined aggregations
    * ((keys, user) then (keys)) — no window, no join, no driver
    * decision; both exchanges are the natural keyed shuffles and the
    * second rides the first's partitioning prefix.
    */
  def dpSensitivityAudit(df: DataFrame, userCol: String,
      keyCols: Seq[String], valCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one aggregation key column")
    val per = df.groupBy((keyCols :+ userCol).map(col): _*)
      .agg(count(lit(1)).as("u_rows"), sum(col(valCol)).as("u_sum"))
    per.groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("u_rows")).as("n_rows"),
        count(lit(1)).as("n_users"),
        max(col("u_rows")).as("max_user_rows"),
        max(abs(col("u_sum"))).as("max_user_abs_sum"),
        sum(abs(col("u_sum"))).as("sum_user_abs_sum"))
      .withColumn("top_user_share_ppm",
        when(col("sum_user_abs_sum") =!= 0L,
          expr("(1000000 * max_user_abs_sum) DIV sum_user_abs_sum")))
      .select(keyCols.map(col) ++ Seq(col("n_rows"), col("n_users"),
        col("max_user_rows"), col("max_user_abs_sum"),
        col("top_user_share_ppm")): _*)
  }

  def jackknifeVariance(df: DataFrame, keyCol: String, valCol: String,
      idCol: String, buckets: Int = 8, scale: Long = 1000000L): DataFrame = {
    require(buckets >= 2 && buckets <= 16,
      s"buckets must be in [2,16] (one hex digit): $buckets")
    require(scale >= 1, s"scale must be >= 1: $scale")
    val cell = df.select(col(keyCol), col(valCol).as("v"),
        (conv(substring(md5(col(idCol).cast("string")), 1, 1), 16, 10)
          .cast("long") % buckets).as("bkt"))
      .groupBy(col(keyCol), col("bkt"))
      .agg(sum(col("v")).as("tb"), count(lit(1)).as("nb"))
    val tot = cell.groupBy(col(keyCol))
      .agg(sum(col("tb")).as("t"), sum(col("nb")).as("n"))
    val rep = cell.join(tot, Seq(keyCol))
      .withColumn("m_u6",
        when(col("n") > col("nb"),
          expr(s"sign(t - tb) * (($scale * abs(t - tb)) DIV (n - nb))")
            .cast("long")))
      .filter(col("m_u6").isNotNull)
    rep.groupBy(col(keyCol))
      .agg(min(col("n")).as("n"), min(col("t")).as("t"),
        count(lit(1)).as("n_replicas"),
        sum(col("m_u6")).as("sm"),
        sum(col("m_u6") * col("m_u6")).as("smm"))
      .withColumn("mean_u6",
        expr(s"sign(t) * (($scale * abs(t)) DIV n)").cast("long"))
      .withColumn("mbar",
        expr("sign(sm) * (abs(sm) DIV n_replicas)").cast("long"))
      .withColumn("jk_var_u12",
        when(col("n_replicas") > 1L,
          expr("((n_replicas - 1) * (smm - 2*mbar*sm + n_replicas*mbar*mbar))" +
            " DIV n_replicas")))
      .select(col(keyCol), col("n"), col("mean_u6"), col("n_replicas"),
        col("jk_var_u12"))
  }

  /** Source-concentration audit — the datasheet number that catches a
    * "web-scale" corpus that is secretly three domains: per-source doc
    * shares, top-1/top-k shares, and the Herfindahl–Hirschman index
    * (Σ share², the standard concentration measure), all in exact ppm
    * integers. High HHI ⇒ dedup/contamination/bias findings from the big
    * sources dominate every downstream metric.
    *
    * Scale shape: one map-side-combined count per source, then all
    * arithmetic on the SOURCE-BOUNDED counts frame (cardinality =
    * distinct sources by contract — the [[graft.streaming.DriftStream]]
    * watched-column argument); the ranking window orders that bounded
    * frame, never the corpus. Shares are integral `div`s; HHI sums
    * share_ppm² then divides once — order-free integer arithmetic.
    */
  def sourceConcentration(docs: DataFrame, srcCol: String = "source",
      topK: Int = 5): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val counts = docs.groupBy(col(srcCol)).agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("n_docs"),
      count(lit(1)).as("n_sources"))
    counts.crossJoin(broadcast(totals))
      .withColumn("share_ppm", expr("(n * 1000000L) div n_docs"))
      .withColumn("rn",
        row_number().over(Window.orderBy(col("n").desc, col(srcCol))))
      .agg(
        min(col("n_docs")).as("n_docs"),
        min(col("n_sources")).as("n_sources"),
        sum(when(col("rn") === 1, col("n")).otherwise(0L)).as("n_top1"),
        sum(when(col("rn") <= topK, col("n")).otherwise(0L)).as("n_topk"),
        sum(col("share_ppm") * col("share_ppm")).as("hsum"))
      .select(col("n_docs"), col("n_sources"),
        expr("(n_top1 * 1000000L) div n_docs").as("top1_ppm"),
        expr("(n_topk * 1000000L) div n_docs").as("topk_ppm"),
        expr("hsum div 1000000L").as("hhi_ppm"))
  }

  /** Inter-filter agreement (Cohen's kappa) over two boolean verdict
    * columns — the calibration audit run before SWAPPING one quality
    * filter for another in a pipeline: raw agreement (the confusion
    * counts) plus chance-corrected kappa, so "both filters keep 90%"
    * cannot masquerade as agreement when their overlap is coincidental.
    *
    * Scale shape: one map-side-combined aggregation to five counters —
    * no exchange wider than one row, any corpus size.
    *
    * Determinism: kappa is a RATIONAL of the counts — num = n·(n₁₁+n₀₀) −
    * [(n₁₁+n₁₀)(n₁₁+n₀₁) + (n₀₁+n₀₀)(n₁₀+n₀₀)], den = n² − [...] — so the
    * ppm form is sign·(10⁶·|num| div den), exact integers end to end
    * (truncation toward zero in BOTH engines: DuckDB `//` floors, so the
    * oracle mirrors the sign·abs form, not a bare signed `//`). NULL when
    * den = 0 (a constant verdict on either side — kappa undefined).
    */
  def agreementKappa(verdicts: DataFrame, aCol: String, bCol: String): DataFrame = {
    val a = col(aCol).cast("boolean")
    val b = col(bCol).cast("boolean")
    verdicts
      .agg(
        count(lit(1)).as("n"),
        sum(when(a && b, 1L).otherwise(0L)).as("n_both"),
        sum(when(a && !b, 1L).otherwise(0L)).as("n_only_a"),
        sum(when(!a && b, 1L).otherwise(0L)).as("n_only_b"),
        sum(when(!a && !b, 1L).otherwise(0L)).as("n_neither"))
      .withColumn("chance",
        (col("n_both") + col("n_only_a")) * (col("n_both") + col("n_only_b")) +
          (col("n_only_b") + col("n_neither")) * (col("n_only_a") + col("n_neither")))
      .withColumn("num", col("n") * (col("n_both") + col("n_neither")) - col("chance"))
      .withColumn("den", col("n") * col("n") - col("chance"))
      .withColumn("kappa_ppm",
        when(col("den") === 0L, lit(null).cast("long"))
          .otherwise(signum(col("num")).cast("long") *
            expr("(1000000L * abs(num)) div den")))
      .select(col("n"), col("n_both"), col("n_only_a"), col("n_only_b"),
        col("n_neither"), col("kappa_ppm"))
  }
}
