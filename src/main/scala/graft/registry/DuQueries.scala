package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Assoc, Dedup, DiskUsageOp, Graph, Hygiene, Joins, Layout, Multimodal, Similarity, Splits, Temporal, TextAnalysis}
import graft.SparkEntry._

/** disk-usage (reference-surface) rows — mechanically split out of the monolithic SparkEntry registry
  * (it had passed 10k lines); entry bodies and oracle SQL are unchanged,
  * shared helpers stay on [[graft.SparkEntry]]. The CoreSpec source
  * tripwire scans every file in this package.
  */
private[graft] object DuQueries {
  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
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
    "du_top_addresses" -> ((s, dir) => {
      // heavy-hitters: the operational "which users eat the bucket" query
      val inv = t(s, dir, "events").select(
        slashKey(col("user_id"), col("event_type"), col("event_id")).as("key"),
        col("value").as("size"))
      DiskUsageOp.aggregateFractional(inv)
        .orderBy(col("size_bytes").desc, col("address"))
        .limit(20)
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
  )

  val oracles: Seq[(String, String)] = Seq(
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
    "du_top_addresses" ->
      """WITH inv AS (
        |  SELECT CAST(user_id AS VARCHAR)||'/'||event_type||'/'||CAST(event_id AS VARCHAR) AS key,
        |         value AS size FROM events)
        |SELECT split_part(key,'/',1) AS address,
        |       CAST(SUM(CAST(size AS DECIMAL(18,4))) AS DOUBLE) AS size_bytes,
        |       COUNT(*) AS number_files
        |FROM inv WHERE key LIKE '%/%'
        |GROUP BY 1 ORDER BY size_bytes DESC, address LIMIT 20""".stripMargin,
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
  )
}
