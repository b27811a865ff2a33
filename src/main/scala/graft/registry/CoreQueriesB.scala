package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Assoc, Dedup, DiskUsageOp, Graph, Hygiene, Joins, Layout, Multimodal, Similarity, Splits, Temporal, TextAnalysis}
import graft.SparkEntry._

/** relational/temporal/graph core rows (B: keys after q_kanon_audit) — mechanically split out of the monolithic SparkEntry registry
  * (it had passed 10k lines); entry bodies and oracle SQL are unchanged,
  * shared helpers stay on [[graft.SparkEntry]]. The CoreSpec source
  * tripwire scans every file in this package.
  */
private[graft] object CoreQueriesB {
  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

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
    "q_rollup_lineitem" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n_items"), col("sum_qty"))
        .orderBy(col("returnflag"), col("linestatus"))),
    "q_union_distinct" -> ((s, dir) =>
      t(s, dir, "events").select(col("user_id").as("id"))
        .union(t(s, dir, "customer").select(col("c_custkey").as("id")))
        .distinct()
        .orderBy(col("id"))),
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
    "q_neighbor_jaccard" -> ((s, dir) => {
      // link-prediction scores over the order—part bipartite graph:
      // common neighbors counted through wedges, union by inclusion–
      // exclusion, integer-exact ppm; top 100 by (score, pair). The
      // center cap 20 is the operator's scale contract in action:
      // wedge volume is Σ_centers deg², and the part side's 30–50-degree
      // hubs carry 6.7× the wedge mass of the ≤ 20 centers (measured:
      // 21.6M vs 3.2M at sf0.1) while being the least-informative
      // promiscuous routes — the cap bounds the pair table
      // the canonical seam: incidenceEdges is already distinct with
      // a < b by id-space construction, and prDeg (the pagerank family's
      // shared degree artifact) IS this graph's undirected degree table
      // — so the row skips the re-canonicalizing exchange and the degree
      // agg both
      Graph.neighborJaccardWith(incidenceEdges(s, dir),
          prDeg(s, dir).select(col("src").as("n"), col("deg").as("d")),
          maxCenterDeg = Some(20L))
        .orderBy(col("jaccard_ppm").desc, col("u"), col("v"))
        .limit(100)
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
    "q_modularity" -> ((s, dir) => {
      // community-quality audit of the LPA labeling: Newman–Girvan Q
      // from integer sufficient statistics (intra edges, Σd_c²) — the
      // one-row read that decides whether q_label_propagation's
      // communities are structure or noise. Audits the SHARED
      // [[lpaLabels]] artifact — the deterministic labeling both rows
      // describe (the oracle side already shares lpOracleCtes)
      // the canonical seam (the q_neighbor_jaccard precedent):
      // incidenceEdges is already distinct with a < b by id-space
      // construction, so the row skips the re-canonicalizing exchange
      Graph.modularityWith(incidenceEdges(s, dir), lpaLabels(s, dir))
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
      // the co-occurrence artifact is already canonical distinct (a < b),
      // so the With-seam skips the re-canonicalizing exchange per call
      Graph.kCoreWith(partCoEdges(s, dir), k = 80, rounds = 5)
        .orderBy(col("node"))
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
    "q_recursive_bfs" -> ((s, dir) => {
      // WITH RECURSIVE (SQL surface new in Spark 4): BFS frontier
      // expansion over the part co-occurrence graph from the smallest
      // part — depth-bounded UNION ALL recursion (the engine-portable
      // form; cycles are tamed by the bound, min-depth dedup after),
      // then reachability census per hop count
      // the recursion is the row's point (Spark 4 SQL surface); its edge
      // CTE is NOT — serve it from the shared partCoEdges artifact
      // (canonical a<b, distinct) instead of re-running the order-keyed
      // self-join inside the recursive plan. Result-identical to the
      // oracle's self-contained text: e as distinct directed edges vs
      // the oracle's multiplicity-carrying pairs only changes frontier
      // ROW COUNTS, and the census reads MIN(d) per node — the
      // min-depth dedup erases multiplicity on both sides.
      // the both-directions frame is CACHED outside the recursion (r20):
      // the recursive step re-executes its plan once per frontier
      // expansion, so an inline `e AS (... UNION ALL ...)` CTE re-derived
      // the direction union from the artifact on every iteration — a
      // cached frame makes each expansion one in-memory scan (guide §5)
      Dedup.cached(partCoEdges(s, dir).select(col("a"), col("b"))
          .unionAll(partCoEdges(s, dir)
            .select(col("b").as("a"), col("a").as("b"))))
        .createOrReplaceTempView("e_rb")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_rb")
      s.sql(
        """WITH RECURSIVE
          |seed AS (SELECT MIN(l_partkey) AS n FROM lineitem_rb),
          |bfs(n, d) AS (
          |  SELECT n, 0 FROM seed
          |  UNION ALL
          |  SELECT e.b, bfs.d + 1 FROM bfs JOIN e_rb e ON e.a = bfs.n
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
    "q_table_profile" -> ((s, dir) =>
      // ANALYZE surface: null/NDV/min/max per column in ONE pass (Expand
      // for the multi-column distincts, native-type min/max stringified
      // after, stack pivot) — CBO inputs + the dump-drift numbers
      Hygiene.tableProfile(t(s, dir, "lineitem"),
          Seq("l_orderkey", "l_partkey", "l_returnflag", "l_linestatus"))
        .orderBy(col("col_name"))),
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
    "q_scd2" -> ((s, dir) =>
      // SCD2 dimension build: per-user event_type runs compressed to
      // validity intervals with version numbers and an is_current flag —
      // one key exchange + one sort shared by all three window functions
      Temporal.scd2History(Temporal.eventsMicros(s, dir))
        .orderBy(col("user_id"), col("version"))),
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
    "q_source_lang_chi2" -> ((s, dir) =>
      // mixture-design independence check: is language independent of
      // source in this corpus? Full-table chi² (unobserved cells folded
      // via Σe = n), exact ppm integers — a high value means per-source
      // language skew that temperature mixing must account for
      Hygiene.chiSquareAudit(t(s, dir, "documents"), "source", "lang")),
    "q_mi_matrix" -> ((s, dir) =>
      // the information-theoretic read of the same three columns: MI
      // sees any dependence structure, NMI = MI/min(H) lands on [0,1]
      Hygiene.mutualInfoMatrix(t(s, dir, "lineitem"),
          Seq("l_returnflag", "l_linestatus", "l_linenumber"))
        .orderBy(col("col_a"), col("col_b"))),
  )

  val oracles: Seq[(String, String)] = Seq(
    "q_zorder_layout" ->
      s"""WITH z AS (
         |  SELECT ${graft.operators.Layout.zOrderSql("l_orderkey", "l_partkey", 16)} AS zkey,
         |         l_orderkey AS x, l_partkey AS y
         |  FROM lineitem)
         |SELECT zkey >> 20 AS z_bucket, COUNT(*) AS n_rows,
         |       MIN(x) AS x_min, MAX(x) AS x_max,
         |       MIN(y) AS y_min, MAX(y) AS y_max
         |FROM z GROUP BY 1 ORDER BY z_bucket""".stripMargin,
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
    "q_rollup_lineitem" ->
      """SELECT COALESCE(l_returnflag,'ALL') AS returnflag,
        |       COALESCE(l_linestatus,'ALL') AS linestatus,
        |       COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_union_distinct" ->
      """SELECT id FROM (
        |  SELECT user_id AS id FROM events
        |  UNION
        |  SELECT c_custkey AS id FROM customer)
        |ORDER BY id""".stripMargin,
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
    "q_range_join" ->
      // DuckDB's IEJoin evaluates the inequality join directly; result must
      // equal the Spark side's binned equi-join + residual-filter rewrite
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events)
        |SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_pairs
        |FROM e a JOIN e b ON b.us > a.us AND b.us <= a.us + 60000000
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
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
    "q_regexp_groups" ->
      """SELECT c_custkey,
        |       regexp_extract(c_name, '#(\d+)', 1) AS cust_num,
        |       regexp_extract(c_name, '(Customer)#', 1) AS prefix,
        |       regexp_extract(c_name, '(zzz)(\d+)', 2) AS no_match
        |FROM customer ORDER BY c_custkey""".stripMargin,
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
    "q_orc_roundtrip" ->
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
  )
}
