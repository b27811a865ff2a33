package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Graph analytics beyond connected components: PageRank (Page, Brin,
  * Motwani, Winograd 1999) as fixed-iteration distributed joins.
  *
  * Spark-first shape: each iteration is ONE edge-keyed join (ranks onto
  * edge sources) feeding ONE map-side-combined aggregation (contributions
  * onto destinations) — the exact shuffle pattern GraphX/Pregel lowers
  * to, expressed as a DataFrame plan so Catalyst/AQE size and skew-split
  * the exchanges. Per-iteration cost is O(|E|) shuffled contribution
  * rows; the only global is the node count, a broadcast 1-row frame.
  *
  * Cross-engine determinism (the oracle replays every iteration): double
  * addition is non-associative, so raw SUM over contributions would
  * depend on partition order. Every value is therefore ROUNDED before
  * summation and the sum runs in DECIMAL — per-edge contribution
  * `round(r/deg, 14)` cast to DECIMAL(28,14) (exact, order-free), rank
  * update `round(base + 0.85 · sum, 12)` as single IEEE ops in a fixed
  * order — the [[Similarity.trainCentroids]] fencing discipline.
  */
object Graph {

  /** PageRank over an UNDIRECTED edge list (both directions are added, so
    * no dangling-mass handling is needed — every node has out-degree ≥ 1
    * by construction). `edges` must carry distinct (a, b) pairs in
    * disjoint or shared id spaces as the caller defines. Returns one row
    * per node: (node, rank) after `iters` damped iterations from the
    * uniform start.
    */
  def pageRank(edges: DataFrame, iters: Int = 3,
      aCol: String = "a", bCol: String = "b"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    // CACHED (the Dedup.cached pool, released by the harness's
    // uncacheAll): every iteration's subtree references the edge list and
    // degrees — uncached, Spark re-derives both from the source once PER
    // ITERATION (the audited 3-iteration plan re-scanned the base 6
    // times), which at 100 TB is the difference between an iterative job
    // and repeated corpus scans.
    val (ed, deg) = degreeAnnotatedEdges(edges, aCol, bCol)
    pageRankWith(ed, deg, iters)
  }

  /** The UNDIRECTED degree-annotated edge frame both damped-iteration
    * operators walk — `(src, dst, deg(src))`, both directions, cached —
    * plus the degree table. Built once here; a registry can memoize the
    * pair and serve [[pageRankWith]] AND [[personalizedPageRankWith]]
    * from one build (the degree join is a full |E|-row shuffle that
    * never changes between the two).
    */
  def degreeAnnotatedEdges(edges: DataFrame,
      aCol: String = "a", bCol: String = "b"): (DataFrame, DataFrame) = {
    val e = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
    val deg = Dedup.cached(e.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    // the degree rides ON the cached edge list (one edge-keyed join paid
    // once, reused every iteration) — the naive form re-joined deg per
    // iteration, a third shuffle of |E| rows each round for a value that
    // never changes (A/B'd: 3.2 s vs 4.6 s warm at sf0.1)
    (Dedup.cached(e.join(deg, Seq("src"))), deg)
  }

  /** Collected edges for the damped-iteration local cutovers. Long-id
    * graphs (the common case) hold PRIMITIVE long arrays (~24 B/edge
    * retained with `deg`, ~16 B without); other id types retain boxed
    * values. Iteration boxes long ids transiently at the callback — the
    * replicas key their HashMaps on the boxed values either way.
    */
  private final class DampedEdges(
      val srcL: Array[Long], val dstL: Array[Long],
      srcO: Array[AnyRef], dstO: Array[AnyRef], val degA: Array[Long]) {
    val longIds: Boolean = srcL != null
    private val n = if (longIds) srcL.length else srcO.length
    def foreach(f: (Any, Any, Long) => Unit): Unit = {
      var i = 0
      if (longIds) while (i < n) { f(srcL(i), dstL(i), degA(i)); i += 1 }
      else while (i < n) { f(srcO(i), dstO(i), degA(i)); i += 1 }
    }
    def foreachPair(f: (Any, Any) => Unit): Unit = {
      var i = 0
      if (longIds) while (i < n) { f(srcL(i), dstL(i)); i += 1 }
      else while (i < n) { f(srcO(i), dstO(i)); i += 1 }
    }
  }

  /** Collected `(src, dst[, deg])` edges for the damped-iteration local
    * cutovers, or None when the graph must keep the distributed loop.
    *
    * Gating (ONE action: edge count + null-id count):
    *  - long-id graphs land in primitive long arrays under the full
    *    [[Dedup.localMaxEdges]] bound — the per-partition rows are
    *    compacted into primitive arrays EXECUTOR-SIDE inside ONE
    *    mapPartitions job, so the driver never holds a boxed-Row
    *    collect spike AND never pays `toLocalIterator`'s
    *    job-per-partition scheduling (32 sequential tiny jobs ≈ +1 s
    *    per call on a warm local[32] — measured, the r16 first cut);
    *  - other id types retain boxed values plus per-round hash/decimal
    *    state at several× the primitive footprint, so they gate at
    *    `min(localMaxEdges, localMaxEdgesBoxed)` (the min keeps
    *    "localMaxEdges = 0 forces distributed" true for every path);
    *  - `requireLongIds` lets a caller whose replica keys a lookup on a
    *    PRIMITIVE long (PPR's seed probe) refuse boxed graphs outright —
    *    an Integer-keyed map would miss a Long seed by boxed equality
    *    and silently return a seedless result;
    *  - any NULL id sends the graph distributed: the joins there never
    *    match NULL keys, and the replicas must not reinvent that
    *    semantics with boxed nulls (or NPE on primitive reads).
    */
  private def collectDampedEdges(ed: DataFrame, withDeg: Boolean,
      requireLongIds: Boolean): Option[DampedEdges] = {
    val longIds = Seq("src", "dst").forall(c =>
      ed.schema(c).dataType == org.apache.spark.sql.types.LongType)
    if (requireLongIds && !longIds) return None
    val bound =
      if (longIds) Dedup.localMaxEdges
      else math.min(Dedup.localMaxEdges, Dedup.localMaxEdgesBoxed)
    val gate = ed.agg(count(lit(1)),
      count(when(col("src").isNull || col("dst").isNull, 1))).collect()(0)
    if (gate.getLong(0) > bound || gate.getLong(1) > 0L) return None
    val n = gate.getLong(0).toInt
    val cols = if (withDeg) Seq(col("src"), col("dst"), col("deg"))
      else Seq(col("src"), col("dst"))
    if (longIds) {
      // one job; each task ships primitive column chunks — the shared
      // [[Dedup.collectLongCols]] discipline
      val colsArr = Dedup.collectLongCols(ed.select(cols: _*), cols.size)
      Some(new DampedEdges(colsArr(0), colsArr(1), null, null,
        if (withDeg) colsArr(2) else null))
    } else {
      val rows = ed.select(cols: _*).collect()
      // the gate count and this collect are SEPARATE actions: if the
      // caller's frame is uncached/nondeterministic and drifts between
      // them, silently sizing from the gate would corrupt the replica
      // (index overflow, or phantom null-keyed tail nodes) — fail loudly
      require(rows.length == n,
        s"damped-edge frame drifted between gate ($n rows) and collect " +
          s"(${rows.length} rows) — pass a cached or memoized frame")
      val s = new Array[AnyRef](n); val d = new Array[AnyRef](n)
      val degA = if (withDeg) new Array[Long](n) else null
      var i = 0
      rows.foreach { r =>
        s(i) = r.get(0).asInstanceOf[AnyRef]
        d(i) = r.get(1).asInstanceOf[AnyRef]
        if (withDeg) degA(i) = r.getLong(2)
        i += 1
      }
      Some(new DampedEdges(null, null, s, d, degA))
    }
  }

  private def rankSchema(ed: DataFrame) =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node",
        ed.schema.fields.head.dataType),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.DoubleType)))

  /** Sorted deduplicated union of two long-id arrays — the dense
    * replicas' node table (endpoint → index by binary search).
    */
  private def dedupSorted(a: Array[Long], b: Array[Long]): Array[Long] = {
    val all = new Array[Long](a.length + b.length)
    System.arraycopy(a, 0, all, 0, a.length)
    System.arraycopy(b, 0, all, a.length, b.length)
    java.util.Arrays.sort(all)
    var m = 0; var i = 0
    while (i < all.length) {
      if (m == 0 || all(m - 1) != all(i)) { all(m) = all(i); m += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(all, m)
  }

  /** The boxed (any-id-type) PageRank driver replica — the exact-JBD
    * fold [[pageRankDense]] falls back to on unscaled-long overflow.
    */
  private def pageRankBoxed(spark: SparkSession, de: DampedEdges,
      iters: Int,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import java.math.{BigDecimal => JBD}
    // per-SOURCE contribution decimals are computed once per round
    // (≈ nodes entries), so the per-EDGE hot loop is one map lookup +
    // one exact JBD.add — the Double.toString decimal parse never
    // runs per edge
    val degMap = new java.util.HashMap[Any, java.lang.Long]()
    de.foreach((s, _, dg) => degMap.put(s, dg))
    val n = degMap.size.toLong
    var r = new java.util.HashMap[Any, java.lang.Double]()
    degMap.keySet().forEach(nd => r.put(nd, roundAt(1.0 / n, 12)))
    for (_ <- 1 to iters) {
      val contrib = new java.util.HashMap[Any, JBD]()
      r.forEach { (nd, rs) =>
        val dg = degMap.get(nd)
        if (dg != null)
          contrib.put(nd, toDec14(roundAt(rs / dg.longValue(), 14)))
      }
      val acc = accumulate14(de, bySrc = true, contrib)
      val base = roundAt(0.15 / n, 14)
      val next = new java.util.HashMap[Any, java.lang.Double]()
      acc.forEach((d, sdec) =>
        next.put(d, roundAt(base + 0.85 * sdec.doubleValue(), 12)))
      r = next
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    r.forEach((nd, rk) => out += org.apache.spark.sql.Row(nd, rk.doubleValue()))
    rowsToDf(spark, out.toSeq, schema)
  }

  /** Dense-index PageRank replica for LONG-ID graphs: endpoints map to
    * array indexes once (sort + binary search), every per-round
    * structure is a primitive array, and the per-edge hot loop is two
    * array reads + one `Math.addExact` — no boxing, no hash probes
    * (the boxed loop allocated two boxed Longs per edge per round).
    * Value-identical to [[pageRankBoxed]]: the same `toDec14`/`roundAt`
    * fences run per NODE, unscaled-long sums are the same exact decimal
    * adds, and contributions are non-negative so overflow (→ caller's
    * boxed fallback) strikes order-independently.
    */
  private def pageRankDense(spark: SparkSession, de: DampedEdges,
      iters: Int,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import java.math.{BigDecimal => JBD}
    val nE = de.srcL.length
    val nodes = dedupSorted(de.srcL, de.dstL)
    val nV = nodes.length
    val srcIdx = new Array[Int](nE); val dstIdx = new Array[Int](nE)
    var i = 0
    while (i < nE) {
      srcIdx(i) = java.util.Arrays.binarySearch(nodes, de.srcL(i))
      dstIdx(i) = java.util.Arrays.binarySearch(nodes, de.dstL(i))
      i += 1
    }
    val deg = new Array[Long](nV); val hasDeg = new Array[Boolean](nV)
    i = 0
    while (i < nE) {
      deg(srcIdx(i)) = de.degA(i); hasDeg(srcIdx(i)) = true; i += 1
    }
    var n = 0L; i = 0
    while (i < nV) { if (hasDeg(i)) n += 1; i += 1 }
    val r = new Array[Double](nV); val alive = new Array[Boolean](nV)
    if (n > 0) {
      val r0 = roundAt(1.0 / n, 12)
      i = 0
      while (i < nV) { if (hasDeg(i)) { r(i) = r0; alive(i) = true }; i += 1 }
    }
    val contribU = new Array[Long](nV); val hasC = new Array[Boolean](nV)
    val accU = new Array[Long](nV); val seen = new Array[Boolean](nV)
    for (_ <- 1 to iters) {
      i = 0
      while (i < nV) {
        hasC(i) = alive(i) && hasDeg(i)
        if (hasC(i))
          contribU(i) =
            toDec14(roundAt(r(i) / deg(i), 14)).unscaledValue().longValueExact()
        accU(i) = 0L; seen(i) = false
        i += 1
      }
      i = 0
      while (i < nE) {
        val s = srcIdx(i); val d = dstIdx(i)
        if (hasC(s)) {
          accU(d) = Math.addExact(accU(d), contribU(s)); seen(d) = true
        }
        i += 1
      }
      val base = roundAt(0.15 / n, 14)
      i = 0
      while (i < nV) {
        alive(i) = seen(i)
        if (seen(i))
          r(i) = roundAt(base + 0.85 * JBD.valueOf(accU(i), 14).doubleValue(), 12)
        i += 1
      }
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    i = 0
    while (i < nV) {
      if (alive(i)) out += org.apache.spark.sql.Row(nodes(i), r(i))
      i += 1
    }
    rowsToDf(spark, out.toSeq, schema)
  }

  /** [[pageRank]] over an already-built [[degreeAnnotatedEdges]] pair. */
  def pageRankWith(ed: DataFrame, deg: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    // SMALL-GRAPH CUTOVER — the [[hits]] discipline: decimal sums are
    // order-free, every round is HALF_UP over a Double.toString parse,
    // so the driver replica is bit-identical to the distributed
    // iteration (PropertySpec pins exact equality), at none of the
    // per-round join/agg job cost. Long-id graphs run the DENSE-INDEX
    // replica (primitive arrays, zero per-edge boxing — r19: the boxed
    // per-edge HashMap loop was ~2.6 s of the row's 3.8 s at the 1.2M-
    // edge bench graph); any unscaled-long overflow falls back to the
    // boxed exact-JBD fold, whose per-accumulate fallback covers the
    // same case (non-negative contributions make overflow order-free,
    // so the two paths agree on when it happens).
    collectDampedEdges(ed, withDeg = true, requireLongIds = false).foreach { de =>
      if (de.longIds) {
        try return pageRankDense(ed.sparkSession, de, iters, rankSchema(ed))
        catch { case _: ArithmeticException => () }
      }
      return pageRankBoxed(ed.sparkSession, de, iters, rankSchema(ed))
    }
    // one bounded global: the node count rides a broadcast 1-row frame;
    // the uniform start and teleport base are rounded IN ENGINE so both
    // engines run the identical ROUND, never a driver-formatted literal
    val nDf = deg.agg(count(lit(1)).as("n"))
    var r = deg.crossJoin(broadcast(nDf))
      .select(col("src").as("node"), round(lit(1.0) / col("n"), 12).as("r"))
    for (_ <- 1 to iters) {
      r = ed.join(r, ed("src") === r("node"))
        .select(col("dst"), round(col("r") / col("deg"), 14).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c").cast(DecimalType(28, 14))).as("s"))
        .crossJoin(broadcast(nDf))
        .select(col("dst").as("node"),
          round(round(lit(0.15) / col("n"), 14) + lit(0.85) * col("s").cast("double"), 12)
            .as("r"))
    }
    r.select(col("node"), col("r").as("rank"))
  }

  /** Personalized PageRank (Haveliwala 2002; the random-walk-with-restart
    * similarity behind graph recommendations): identical iteration shape
    * to [[pageRank]] — one edge-keyed join + one decimal-fenced
    * map-side-combined agg per round — but ALL teleport mass restarts at
    * `seed`, so ranks measure proximity to the seed instead of global
    * centrality. Nodes never reached carry no row (sparse by nature —
    * the output is seed-local). Same determinism fencing: rounded
    * contributions summed in DECIMAL, fixed-order IEEE update, no
    * driver-formatted literals beyond the seed id itself (an input).
    */
  def personalizedPageRank(edges: DataFrame, seed: Long, iters: Int = 3,
      aCol: String = "a", bCol: String = "b"): DataFrame = {
    val (ed, deg) = degreeAnnotatedEdges(edges, aCol, bCol)
    personalizedPageRankWith(ed, deg, seed, iters)
  }

  /** [[personalizedPageRank]] over an already-built
    * [[degreeAnnotatedEdges]] pair.
    */
  def personalizedPageRankWith(ed: DataFrame, deg: DataFrame, seed: Long,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    // SMALL-GRAPH CUTOVER — same bit-exact replica discipline as
    // [[pageRankWith]], with all teleport mass restarting at the seed.
    // LONG-ID GRAPHS ONLY (requireLongIds — the kCore gate, ADVICE r15):
    // the seed probe below keys a HashMap on boxed node ids, and a
    // non-Long id column (Integer(5) != Long(5)) would miss the seed by
    // boxed equality and silently return a seedless result where the
    // distributed join (`col("src") === seed`, numerically coerced)
    // finds it. Non-long graphs keep the distributed loop.
    collectDampedEdges(ed, withDeg = true, requireLongIds = true).foreach { de =>
      import java.math.{BigDecimal => JBD}
      val degMap = new java.util.HashMap[Any, java.lang.Long]()
      de.foreach((s, _, dg) => degMap.put(s, dg))
      val inGraph = degMap.containsKey(seed)
      var r = new java.util.HashMap[Any, java.lang.Double]()
      if (inGraph) r.put(seed, 1.0)
      for (_ <- 1 to iters) {
        val contrib = new java.util.HashMap[Any, JBD]()
        r.forEach { (nd, rs) =>
          val dg = degMap.get(nd)
          if (dg != null)
            contrib.put(nd, toDec14(roundAt(rs / dg.longValue(), 14)))
        }
        val acc = accumulate14(de, bySrc = true, contrib)
        // contribs + the seed restart row, re-grouped under the same
        // decimal sum + 12-dp round as the distributed union+agg
        val grouped = new java.util.HashMap[Any, JBD]()
        acc.forEach((d, sdec) => grouped.merge(d,
          toDec14(roundAt(0.85 * sdec.doubleValue(), 12)),
          (x, y) => x.add(y)))
        if (inGraph) grouped.merge(seed, toDec14(0.15), (x, y) => x.add(y))
        val next = new java.util.HashMap[Any, java.lang.Double]()
        grouped.forEach((nd, sdec) =>
          next.put(nd, roundAt(sdec.doubleValue(), 12)))
        r = next
      }
      val out = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.Row]
      r.forEach((nd, rk) => out += org.apache.spark.sql.Row(nd, rk.doubleValue()))
      return rowsToDf(ed.sparkSession, out.toSeq, rankSchema(ed))
    }
    var r = deg.filter(col("src") === seed)
      .select(col("src").as("node"), lit(1.0).as("r"))
    for (_ <- 1 to iters) {
      val contribs = ed.join(r, ed("src") === r("node"))
        .select(col("dst"), round(col("r") / col("deg"), 14).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c").cast(DecimalType(28, 14))).as("s"))
        .select(col("dst").as("node"),
          round(lit(0.85) * col("s").cast("double"), 12).as("r"))
      // the restart mass lands ONLY on the seed: add 0.15 there (the
      // seed may be absent from contribs — a FULL OUTER-free union +
      // agg keeps the plan one exchange)
      r = contribs
        .unionAll(deg.filter(col("src") === seed)
          .select(col("src").as("node"), lit(0.15).as("r")))
        .groupBy(col("node"))
        .agg(round(sum(col("r").cast(DecimalType(28, 14))).cast("double"), 12)
          .as("r"))
    }
    r.select(col("node"), col("r").as("rank"))
  }

  /** Per-node triangle counts via DEGREE-ORIENTED wedge closing (Cohen,
    * "Graph Twiddling in a MapReduce World", 2009 / the Schank–Wagner
    * orientation): canonicalize the undirected edge list, orient every
    * edge from its (degree, id)-smaller endpoint to the larger, generate
    * wedges only from pairs of OUT-edges, close each wedge against the
    * canonical edge set. Each triangle forms exactly one wedge (its
    * orientation-minimal vertex fans out to the other two), so counts
    * are exact with no division-by-3 or dedup.
    *
    * Why the orientation is the scale story: out-neighborhood size is
    * Σ_u outdeg(u) = |E| with outdeg bounded O(√|E|) by degree-ordering
    * (a hub's edges point INTO it, so the hub fans out almost nothing) —
    * without it a single celebrity node with degree d contributes d²
    * candidate pairs and its partition serializes.
    *
    * Closure is by SORTED-ADJACENCY INTERSECTION (the compact-forward
    * algorithm, Latapy 2008): each oriented edge (u,v) joins both
    * endpoints' out-neighbor arrays and explodes their intersection —
    * every element w closes the triangle {u,v,w} exactly once. This
    * replaces the wedge self-join + edge-closure join the first version
    * ran: that plan SHUFFLES the full wedge set (measured 41M wedge rows
    * at sf0.1 for 1.2M edges) before the closure can discard 90% of it,
    * while the intersection form moves only |E| rows carrying O(√|E|)-
    * bounded arrays and never materializes a non-triangle candidate
    * (A/B'd: 3.6 s vs 26 s warm at sf0.1). All joins are node-keyed
    * equi-joins (AQE-splittable); arithmetic is integer-only.
    */
  def triangleCounts(edges: DataFrame,
      aCol: String = "a", bCol: String = "b"): DataFrame = {
    val und = Dedup.cached(edges.select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct())
    triangleCountsWith(und, canonicalDegrees(und))
  }

  /** The `(n, d)` undirected degree table of an already-canonical edge
    * frame — the derivation [[triangleCountsWith]],
    * [[neighborJaccardWith]] and [[clusteringCoefficientWithDeg]] all
    * consume, exposed so a registry can memoize ONE degree pass per
    * graph and serve the whole family ([[graft.SparkEntry]]'s shared
    * edge-artifact discipline extended to degrees).
    */
  def canonicalDegrees(canonical: DataFrame): DataFrame =
    canonical.select(col("a").as("n"))
      .unionAll(canonical.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))

  /** [[triangleCounts]] over an ALREADY-CANONICAL undirected edge frame
    * and its ALREADY-DERIVED degree table — the seam that lets a
    * registry skip both the canonicalizing distinct exchange AND the
    * degree aggregation when it already memoizes them (the
    * [[kCoreWith]]/[[hitsWith]] discipline). `canonical` must be
    * distinct `(a, b)` with `a < b` and no self-loops; `deg` must be
    * `(n, d)` with the EXACT undirected degree of every endpoint in
    * `canonical` ([[canonicalDegrees]]' output).
    *
    * CONTRACT VIOLATIONS DEGRADE SILENTLY: a duplicate/uncanonical edge
    * both double-counts wedges and corrupts the degree orientation; a
    * stale `deg` (from a different edge set) breaks the orientation's
    * √|E| out-degree bound — counts stay plausible-looking in both
    * cases. When in doubt call [[triangleCounts]].
    */
  def triangleCountsWith(canonical: DataFrame, deg: DataFrame): DataFrame = {
    val und = canonical.select(col("a"), col("b"))
    val oriented = Dedup.cached(und
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("src"),
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("dst")))
    // out-adjacency arrays: bounded O(√|E|) per node by the orientation
    val adj = Dedup.cached(oriented.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs")))
    // inner join on dst is correct: a dst with no out-edges has an empty
    // out-neighborhood, so its edges close no triangles either way
    val tri = oriented
      .join(adj.select(col("src"), col("nbrs").as("nu")), Seq("src"))
      .join(adj.select(col("src").as("dst"), col("nbrs").as("nv")), Seq("dst"))
      .select(col("src").as("u"), col("dst").as("v"),
        explode(expr("array_intersect(nu, nv)")).as("w"))
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Label-propagation community detection (Raghavan, Albert & Kumara
    * 2007) — synchronous variant with a DETERMINISTIC tie-break: every
    * node starts as its own label; each round it adopts the label most
    * frequent among its neighbors (ties → smallest label, the
    * engine-portable substitute for the paper's random choice). `rounds`
    * pins the pass count so the oracle replays it; sync LPA can
    * oscillate on bipartite structure, which fixed rounds + the pinned
    * tie-break make reproducible rather than flaky.
    *
    * Shape per round: one edge-keyed join (labels onto neighbors) + one
    * map-side-combined (node, label) count + one struct-argmax per node
    * — all O(|E|) keyed exchanges, AQE-splittable. Each round references
    * the previous labels ONCE, so lineage grows linearly — but
    * `localCheckpoint` still cuts per round ([[kCore]]'s discipline)
    * because optimizer time over a rounds-deep join chain is pure waste
    * when each round's output is task-trivial to hold.
    */
  def labelPropagation(edges: DataFrame, rounds: Int = 3,
      aCol: String = "a", bCol: String = "b"): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val und = edges.select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val adj = und.select(col("a").as("n"), col("b").as("m"))
      .unionAll(und.select(col("b").as("n"), col("a").as("m")))
      .localCheckpoint()
    var labels = adj.select(col("n")).distinct()
      .select(col("n"), col("n").as("label"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      labels = adj
        .join(labels.select(col("n").as("m"), col("label")), Seq("m"))
        .groupBy(col("n"), col("label")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("n"))
        .agg(max(struct(col("cnt").as("c"), (-col("label")).as("nl"))).as("top"))
        .select(col("n"), (-col("top.nl")).as("label"))
        .localCheckpoint()
    }
    labels
  }

  /** k-core decomposition by synchronous peeling (Seidman 1983; the
    * Batagelj–Zaveršnik peel expressed as fixed-round distributed
    * passes): each round drops every node whose CURRENT degree is < k,
    * then re-derives the induced edge set. After enough rounds the
    * surviving subgraph is exactly the k-core (every node has ≥ k
    * neighbors inside it). `rounds` pins the pass count so the oracle
    * can replay the identical computation; the fixpoint is reached once
    * a round removes nothing (the spec asserts rounds vs rounds+1
    * equality on the fixtures — at production scale run with a
    * convergence check on the per-round survivor count, a 1-row agg).
    *
    * Shape per round: one map-side-combined degree agg (O(|E|) rows in,
    * node-keyed) + two LEFT SEMI joins keying the edge list on each
    * endpoint — all equi-joins AQE can size and skew-split; survivor
    * degrees only shrink, so every round's volume is bounded by the
    * previous round's. No per-node adjacency list is ever materialized
    * in one task.
    *
    * Lineage discipline: each round references the previous edge set
    * FIVE times (degree union ×2, itself, two semi-join builds), so an
    * un-truncated logical plan grows 5^rounds subtrees — analysis and
    * canonicalization explode long before any data moves (observed:
    * rounds=5 hung the PLANNER for 17+ minutes on a 115k-edge fixture;
    * `persist` does NOT help because cache substitution happens after
    * the exponential analyzed tree is already built). Every round
    * therefore `localCheckpoint`s its survivors — the GraphX/Pregel
    * iteration-checkpoint pattern — keeping the plan O(1) per round; on
    * a cluster with executor churn swap in reliable `checkpoint` with a
    * checkpoint dir (same call shape).
    *
    * Returns the post-peel nodes as (node, core_deg) — degree WITHIN the
    * surviving subgraph.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int = 3,
      aCol: String = "a", bCol: String = "b"): DataFrame =
    // cached: the gate action AND the taken path (collect or checkpoint)
    // both read the canonical frame — uncached, the canonicalizing
    // exchange would execute twice on the distributed branch
    kCoreWith(Dedup.cached(edges.select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()), k, rounds)

  /** [[kCore]] over an ALREADY-CANONICAL undirected edge frame —
    * distinct `(a, b)` with `a < b`, no self-loops (the caller's
    * contract, e.g. a memoized canonical edge artifact). Skips the
    * canonicalizing exchange per call; the local cutover also skips the
    * up-front `localCheckpoint` (it collects — only the distributed
    * loop needs the lineage cut).
    *
    * CONTRACT VIOLATIONS DEGRADE SILENTLY — this seam cannot check them
    * cheaply (re-deriving distinctness would re-pay the exchange it
    * exists to skip). A duplicate edge inflates both endpoints' degrees,
    * so nodes survive the peel that the true graph would drop (a
    * too-large "k-core"); a self-loop inflates its node's degree by 2;
    * an uncanonicalized (b, a) twin acts as a duplicate. When in doubt
    * call [[kCore]], which canonicalizes first.
    */
  def kCoreWith(canonical: DataFrame, k: Int, rounds: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val e0 = canonical.select(col("a"), col("b"))
    def degOf(ed: DataFrame): DataFrame =
      ed.select(col("a").as("n")).unionAll(ed.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // early exit when a round removes nothing: peeling a converged graph
    // is the identity, so stopping early is OUTPUT-IDENTICAL to running
    // all `rounds` — the check is one scalar count per round on the
    // already-materialized checkpoint (the bounded global-decision
    // pattern), and it turns the over-provisioned round budget from a
    // paid cost into a cap (a k far below the degree floor converges in
    // one round instead of `rounds`)
    //
    // ONE gating action: edge count + null-id count (the
    // collectDampedEdges discipline — a NULL id would NPE the primitive
    // peel below, so observed NULLs keep the distributed loop)
    val gate = e0.agg(count(lit(1)),
      count(when(col("a").isNull || col("b").isNull, 1))).collect()(0)
    var nEdges = gate.getLong(0)
    // SMALL-GRAPH CUTOVER (the [[graft.operators.Dedup.components]]
    // union-find discipline): each synchronous peel round costs two
    // semi-joins + a degree exchange + a checkpoint regardless of size;
    // at or below the shared [[graft.operators.Dedup.localMaxEdges]]
    // bound the identical peel simulates on the driver in milliseconds
    // — same rounds cap, same early exit, bit-identical output. Long
    // ids only (the simulation walks primitives); anything else keeps
    // the distributed loop.
    val longIds = e0.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (longIds && nEdges <= Dedup.localMaxEdges && gate.getLong(1) == 0L) {
      val spark = e0.sparkSession
      import spark.implicits._
      // primitive arrays end-to-end (the collectDampedEdges discipline):
      // one collect job, ~16 B/edge retained, in-place peel rounds
      var (curA, curB) = Dedup.collectLongPairs(e0)
      def degs(ea: Array[Long], eb: Array[Long]): java.util.HashMap[Long, Long] = {
        val m = new java.util.HashMap[Long, Long]()
        var i = 0
        while (i < ea.length) {
          m.merge(ea(i), 1L, (x, y) => x + y)
          m.merge(eb(i), 1L, (x, y) => x + y)
          i += 1
        }
        m
      }
      var converged = false
      var r = 0
      while (r < rounds && !converged) {
        val d = degs(curA, curB)
        val na = new Array[Long](curA.length)
        val nb = new Array[Long](curA.length)
        var i = 0; var j = 0
        while (i < curA.length) {
          if (d.get(curA(i)) >= k && d.get(curB(i)) >= k) {
            na(j) = curA(i); nb(j) = curB(i); j += 1
          }
          i += 1
        }
        converged = j == curA.length
        curA = java.util.Arrays.copyOf(na, j)
        curB = java.util.Arrays.copyOf(nb, j)
        r += 1
      }
      val d = degs(curA, curB)
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](d.size())
      d.forEach((n, deg) => out += ((n, deg)))
      return out.toSeq.toDF("node", "core_deg")
    }
    // distributed loop: the per-round lineage-cut discipline needs the
    // input checkpointed once up front (see the scaladoc's 5^rounds note)
    var e = e0.localCheckpoint()
    var converged = false
    for (_ <- 1 to rounds if !converged) {
      val keep = degOf(e).filter(col("d") >= k).select(col("n"))
      val next = e.join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
        .localCheckpoint()
      val nNext = next.count()
      converged = nNext == nEdges
      nEdges = nNext
      e = next
    }
    degOf(e).select(col("n").as("node"), col("d").as("core_deg"))
  }

  /** Neighbor-set Jaccard similarity for node pairs sharing at least one
    * neighbor — the classic link-prediction / entity-resolution score
    * (Liben-Nowell & Kleinberg 2003): J(u,v) = |N(u)∩N(v)| / |N(u)∪N(v)|.
    * Intersections are counted through WEDGES (each common neighbor w of
    * (u,v) emits exactly one wedge row), union sizes come from the
    * inclusion–exclusion identity |N(u)|+|N(v)|−|∩| — no per-node
    * neighbor list is ever collected. Scores are integer-exact ppm
    * (`c·10⁶ DIV (du+dv−c)`), so no float crosses the oracle boundary.
    *
    * Scale: wedge volume is Σ_w deg(w)², so a celebrity center explodes
    * quadratically — `maxCenterDeg` drops hub CENTERS above the cap
    * before wedge generation (u and v keep their FULL degrees in the
    * union term). With the cap this under-counts intersections routed
    * through dropped hubs — the documented approximation trade, same
    * contract as [[Dedup.ngramJaccardPairs]]' df cap: hub centers are
    * precisely the promiscuous neighbors that carry the least similarity
    * signal. Pass None for the exact form (the oracle replays either).
    */
  def neighborJaccard(edges: DataFrame, maxCenterDeg: Option[Long] = None,
      aCol: String = "a", bCol: String = "b"): DataFrame = {
    val und = Dedup.cached(edges.select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct())
    neighborJaccardWith(und, Dedup.cached(canonicalDegrees(und)), maxCenterDeg)
  }

  /** [[neighborJaccard]] over an ALREADY-CANONICAL undirected edge frame
    * and its ALREADY-DERIVED `(n, d)` degree table — same contract and
    * silent-failure story as [[triangleCountsWith]] (stale or inexact
    * degrees corrupt BOTH the union term `du + dv − c` and the center
    * cap's hub cut, while the emitted pairs stay plausible). `deg` is
    * read twice (the center filter and the endpoint annotation): pass a
    * cached or memoized frame.
    */
  def neighborJaccardWith(canonical: DataFrame, deg: DataFrame,
      maxCenterDeg: Option[Long] = None): DataFrame = {
    val und = canonical
    val adj = und.select(col("a").as("n"), col("b").as("m"))
      .unionAll(und.select(col("b").as("n"), col("a").as("m")))
    val centerOk = maxCenterDeg match {
      case Some(cap) => deg.filter(col("d") <= cap).select(col("n"))
      case None      => deg.select(col("n"))
    }
    // the endpoints' degrees ride THROUGH the wedge (one node-keyed join
    // on the O(|E|) adjacency, constant per endpoint so a min() in the
    // pair agg recovers them) instead of two joins against the pair
    // table — the pair table is the Σ deg² blow-up side (measured 10M+
    // rows at sf0.1 vs 1.2M adjacency rows), so joining before the
    // wedge is the strictly smaller plan
    // CACHED: both legs of the wedge self-join read this frame — uncached,
    // the degree join + center semi-join subtree computes twice (exchange
    // reuse does not cover the join ABOVE the reused exchanges), a full
    // O(|E|) duplicate at the operator's hottest input
    val adjD = Dedup.cached(adj
      .join(deg.select(col("n").as("m"), col("d").as("dm")), Seq("m"))
      .join(centerOk, Seq("n"), "left_semi"))
    val wedges = adjD.as("x").join(adjD.as("y"),
        col("x.n") === col("y.n") && col("x.m") < col("y.m"))
      .select(col("x.m").as("u"), col("y.m").as("v"),
        col("x.dm").as("xdu"), col("y.dm").as("xdv"))
    wedges.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("n_common"),
        min(col("xdu")).as("du"), min(col("xdv")).as("dv"))
      .select(col("u"), col("v"), col("n_common"),
        expr("CAST((n_common * 1000000) DIV (du + dv - n_common) AS BIGINT)")
          .as("jaccard_ppm"))
  }

  /** HITS hubs-and-authorities (Kleinberg, "Authoritative sources in a
    * hyperlinked environment", 1999) over a DIRECTED edge list — the
    * link-analysis complement of [[pageRank]]: authority(v) = Σ hub(u)
    * over in-edges, hub(u) = Σ auth(v) over out-edges, each L1-normalized
    * per half-step. On a bipartite incidence graph (orders → parts) the
    * sides separate cleanly: sources score as hubs, targets as
    * authorities — the "good collector / good content" split a curation
    * pipeline reads to find catalog-spanning orders and
    * universally-demanded parts.
    *
    * Same iteration shape as [[pageRank]]: each half-step is ONE
    * edge-keyed join feeding ONE map-side-combined aggregation; the L1
    * total is a broadcast 1-row frame (the bounded-global pattern — at
    * any graph size the normalizer is one scalar). Same determinism
    * fencing: scores are rounded to 12 dp before the next half-step
    * consumes them, sums run in DECIMAL(28,14) (order-free), and the
    * normalize is a single IEEE divide of two decimal-exact doubles —
    * so the oracle replays every half-step bit-identically.
    *
    * Returns (node, hub, auth) with 0.0 for a side the node never
    * scores on (a pure source has auth 0; a pure sink hub 0).
    */
  /** `CAST(double AS DECIMAL(28,14))` replicated on the driver: Spark
    * parses `Double.toString` then rescales HALF_UP — both steps matter
    * for bit-exactness of the local cutovers below.
    */
  private def toDec14(d: Double): java.math.BigDecimal =
    new java.math.BigDecimal(java.lang.Double.toString(d))
      .setScale(14, java.math.RoundingMode.HALF_UP)

  /** The replicas' per-edge Σ as UNSCALED-LONG integer adds: adding two
    * scale-14 decimals IS adding their unscaled values (BigDecimal.add
    * aligns scales — here both are already 14), so accumulating the
    * unscaled longs with `Math.addExact` is bit-identical to the JBD
    * fold at none of its per-add BigInteger allocation (~3.6M adds per
    * damped row at the 4M-edge bound). Throws ArithmeticException on
    * overflow — reachable only when one node accumulates > 2⁶³/10¹⁴ ≈
    * 9.2·10⁴ unit-bounded contributions (a hub with in-degree beyond
    * that) — and the caller then reruns the exact JBD fold.
    */
  private def edgeAccumulate(de: DampedEdges, bySrc: Boolean,
      vals: java.util.HashMap[Any, java.lang.Long])
      : java.util.HashMap[Any, java.lang.Long] = {
    val out = new java.util.HashMap[Any, java.lang.Long]()
    val add = new java.util.function.BiFunction[
        java.lang.Long, java.lang.Long, java.lang.Long] {
      def apply(x: java.lang.Long, y: java.lang.Long): java.lang.Long =
        java.lang.Long.valueOf(Math.addExact(x.longValue(), y.longValue()))
    }
    de.foreachPair { (s, d) =>
      val v = vals.get(if (bySrc) s else d)
      if (v != null) { out.merge(if (bySrc) d else s, v, add); () }
    }
    out
  }

  /** Unscaled scale-14 views of a decimal map (`longValueExact` cannot
    * overflow for the unit-bounded scores these replicas carry, but the
    * caller's catch covers it anyway) and back.
    */
  private def unscaled14(m: java.util.HashMap[Any, java.math.BigDecimal])
      : java.util.HashMap[Any, java.lang.Long] = {
    val out = new java.util.HashMap[Any, java.lang.Long](m.size() * 2)
    m.forEach((k, v) =>
      out.put(k, java.lang.Long.valueOf(v.unscaledValue().longValueExact())))
    out
  }

  private def fromUnscaled14(m: java.util.HashMap[Any, java.lang.Long])
      : java.util.HashMap[Any, java.math.BigDecimal] = {
    val out = new java.util.HashMap[Any, java.math.BigDecimal](m.size() * 2)
    m.forEach((k, v) =>
      out.put(k, java.math.BigDecimal.valueOf(v.longValue(), 14)))
    out
  }

  /** [[edgeAccumulate]] with the exact-JBD fallback — the seam every
    * damped replica's per-edge Σ goes through.
    */
  private def accumulate14(de: DampedEdges, bySrc: Boolean,
      vals: java.util.HashMap[Any, java.math.BigDecimal])
      : java.util.HashMap[Any, java.math.BigDecimal] =
    try fromUnscaled14(edgeAccumulate(de, bySrc, unscaled14(vals)))
    catch {
      case _: ArithmeticException =>
        val out = new java.util.HashMap[Any, java.math.BigDecimal]()
        de.foreachPair { (s, d) =>
          val c = vals.get(if (bySrc) s else d)
          if (c != null) {
            out.merge(if (bySrc) d else s, c, (x, y) => x.add(y)); ()
          }
        }
        out
    }

  /** Spark's `round(double, scale)` (BigDecimal.valueOf → HALF_UP). */
  private def roundAt(d: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  private def rowsToDf(spark: SparkSession,
      rows: Seq[org.apache.spark.sql.Row],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)

  def hits(edges: DataFrame, iters: Int = 3,
      aCol: String = "a", bCol: String = "b"): DataFrame =
    hitsWith(Dedup.cached(
      edges.select(col(aCol).as("src"), col(bCol).as("dst")).distinct()),
      iters)

  /** [[hits]] over an ALREADY-DISTINCT directed `(src, dst)` edge frame —
    * the seam that lets a registry serve a memoized distinct edge
    * artifact without paying the canonicalizing distinct exchange +
    * persist again on every call (the [[pageRankWith]] discipline). The
    * caller owns the distinctness contract; duplicate edges would
    * double-count contributions on both paths identically, so the seam
    * shifts cost, never semantics. That failure is SILENT — the scores
    * are still a valid HITS fixpoint, just of the multigraph, so no
    * assertion can catch it downstream; dedup at the source. The frame
    * is also read by MULTIPLE actions (the cutover gate, then either the
    * collect or the iteration joins): pass a cached or memoized frame —
    * an uncached nondeterministic one now fails the gate/collect
    * row-count cross-check loudly rather than corrupting the replica.
    */
  /** The boxed (any-id-type) HITS driver replica — the exact-JBD fold
    * [[hitsDense]] falls back to on unscaled-long overflow.
    */
  private def hitsBoxed(spark: SparkSession, de: DampedEdges, iters: Int,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import java.math.{BigDecimal => JBD}
    def l1Local(raw: java.util.HashMap[Any, JBD])
        : java.util.HashMap[Any, java.lang.Double] = {
      // raw values are the decimal-exact half-step sums CAST TO DOUBLE
      // (the Spark agg's output), then re-cast to decimal for the L1
      var t = JBD.ZERO
      raw.forEach((_, v) => t = t.add(toDec14(v.doubleValue())))
      val td = if (raw.isEmpty) 1.0 else t.doubleValue()
      val out = new java.util.HashMap[Any, java.lang.Double]()
      raw.forEach((n, v) => out.put(n, roundAt(v.doubleValue() / td, 12)))
      out
    }
    // per-node score decimals are computed once per half-step (≈ nodes
    // entries), so the per-EDGE hot loop is one lookup + one exact add
    def decOf(scores: java.util.HashMap[Any, java.lang.Double])
        : java.util.HashMap[Any, JBD] = {
      val m = new java.util.HashMap[Any, JBD]()
      scores.forEach((n, v) => m.put(n, toDec14(v.doubleValue())))
      m
    }
    var h = new java.util.HashMap[Any, java.lang.Double]()
    de.foreachPair { (s, d) =>
      h.putIfAbsent(s, 1.0); h.putIfAbsent(d, 1.0); ()
    }
    var a = new java.util.HashMap[Any, java.lang.Double]()
    for (_ <- 1 to iters) {
      a = l1Local(accumulate14(de, bySrc = true, decOf(h)))
      h = l1Local(accumulate14(de, bySrc = false, decOf(a)))
    }
    val nodes = new java.util.LinkedHashSet[Any]()
    h.keySet().forEach(k => { nodes.add(k); () })
    a.keySet().forEach(k => { nodes.add(k); () })
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    nodes.forEach { n =>
      val hv = h.get(n); val av = a.get(n)
      out += org.apache.spark.sql.Row(n,
        if (hv == null) 0.0 else hv.doubleValue(),
        if (av == null) 0.0 else av.doubleValue())
    }
    rowsToDf(spark, out.toSeq, schema)
  }

  /** Dense-index HITS replica for LONG-ID graphs — the
    * [[pageRankDense]] discipline on the two half-steps: primitive
    * per-edge accumulation (`Math.addExact` on unscaled scale-14
    * longs), the identical `toDec14`/`roundAt` fences per NODE, and the
    * L1 total as the same exact decimal sum (order-free). Presence
    * masks replicate the boxed maps' key sets exactly: a node scores on
    * a side only once a half-step reached it, and the final rows cover
    * hub-keys ∪ auth-keys with 0.0 on the missing side.
    */
  private def hitsDense(spark: SparkSession, de: DampedEdges, iters: Int,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import java.math.{BigDecimal => JBD}
    val nE = de.srcL.length
    val nodes = dedupSorted(de.srcL, de.dstL)
    val nV = nodes.length
    val srcIdx = new Array[Int](nE); val dstIdx = new Array[Int](nE)
    var i = 0
    while (i < nE) {
      srcIdx(i) = java.util.Arrays.binarySearch(nodes, de.srcL(i))
      dstIdx(i) = java.util.Arrays.binarySearch(nodes, de.dstL(i))
      i += 1
    }
    val h = new Array[Double](nV); val hasH = new Array[Boolean](nV)
    i = 0
    while (i < nV) { h(i) = 1.0; hasH(i) = true; i += 1 }
    val a = new Array[Double](nV); val hasA = new Array[Boolean](nV)
    val scoreU = new Array[Long](nV)
    val accU = new Array[Long](nV); val seen = new Array[Boolean](nV)
    // one half-step: acc the `from` side's scores onto the `onto` side,
    // then L1-normalize over reached nodes (the boxed l1Local algebra:
    // t = Σ toDec14(sum-as-double), exact decimal adds — order-free)
    def halfStep(score: Array[Double], present: Array[Boolean],
        bySrc: Boolean, out: Array[Double], outP: Array[Boolean]): Unit = {
      var i = 0
      while (i < nV) {
        if (present(i))
          scoreU(i) = toDec14(score(i)).unscaledValue().longValueExact()
        accU(i) = 0L; seen(i) = false
        i += 1
      }
      i = 0
      while (i < nE) {
        val from = if (bySrc) srcIdx(i) else dstIdx(i)
        val onto = if (bySrc) dstIdx(i) else srcIdx(i)
        if (present(from)) {
          accU(onto) = Math.addExact(accU(onto), scoreU(from)); seen(onto) = true
        }
        i += 1
      }
      var t = JBD.ZERO; var any = false
      i = 0
      while (i < nV) {
        if (seen(i)) {
          t = t.add(toDec14(JBD.valueOf(accU(i), 14).doubleValue())); any = true
        }
        i += 1
      }
      val td = if (!any) 1.0 else t.doubleValue()
      i = 0
      while (i < nV) {
        outP(i) = seen(i)
        if (seen(i))
          out(i) = roundAt(JBD.valueOf(accU(i), 14).doubleValue() / td, 12)
        i += 1
      }
    }
    for (_ <- 1 to iters) {
      halfStep(h, hasH, bySrc = true, a, hasA)
      halfStep(a, hasA, bySrc = false, h, hasH)
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    i = 0
    while (i < nV) {
      if (hasH(i) || hasA(i))
        out += org.apache.spark.sql.Row(nodes(i),
          if (hasH(i)) h(i) else 0.0,
          if (hasA(i)) a(i) else 0.0)
      i += 1
    }
    rowsToDf(spark, out.toSeq, schema)
  }

  def hitsWith(e: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // SMALL-GRAPH CUTOVER (the components/kCore discipline, extended to
    // fenced numerics): every decimal sum is order-free and every round
    // is HALF_UP on a Double.toString parse, so the driver replica below
    // is BIT-IDENTICAL to the distributed half-steps — pinned by a
    // PropertySpec exact-equality test — while skipping ~6 persisted
    // frames + 6 normalizer collects of fixed per-job cost per call.
    // Works for any node id type (the maps key on the raw values) —
    // long-id graphs stream into primitive arrays under the full bound,
    // boxed id types gate at the smaller boxed bound, NULL ids keep the
    // distributed form (see [[collectDampedEdges]]).
    collectDampedEdges(e, withDeg = false, requireLongIds = false).foreach { de =>
      val nodeType = e.schema.fields.head.dataType
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", nodeType),
        org.apache.spark.sql.types.StructField("hub",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("auth",
          org.apache.spark.sql.types.DoubleType)))
      // dense primitive replica for long-id graphs, exact-JBD boxed
      // fallback on unscaled overflow — the [[pageRankWith]] r19 split
      if (de.longIds) {
        try return hitsDense(e.sparkSession, de, iters, schema)
        catch { case _: ArithmeticException => () }
      }
      return hitsBoxed(e.sparkSession, de, iters, schema)
    }
    // ONE Spark job per half-step: the raw-score frame persists LAZILY and
    // the L1 total's collect materializes it, with the total re-entering
    // the plan as a DRIVER-SIDE LITERAL (the bounded-global pattern — one
    // scalar at any graph size). Because the normalizer is a literal, the
    // normalized frame references the raw subtree exactly ONCE, so the
    // 2^(2·iters) duplicated-subtree compounding the old per-half-step
    // localCheckpoint existed to cut (measured 132 s vs 13 s at sf0.1)
    // cannot arise, and the checkpoint's extra materialization job — a
    // pure scheduler-latency multiplier under host load — is gone: 6
    // half-step jobs total for iters=3, vs 12 + two crossJoin stages.
    // Determinism fencing unchanged: DECIMAL(28,14) order-free sums, one
    // IEEE divide by the decimal-exact double, 12-dp round before the
    // next half-step consumes a score — the oracle still replays every
    // half-step bit-identically.
    var live: List[DataFrame] = Nil // persisted raws not yet releasable
    def l1Norm(raw: DataFrame, vCol: String): DataFrame = {
      val s = raw.persist(lvl)
      val tRow = s.agg(
        sum(col(vCol).cast(DecimalType(28, 14))).cast("double").as("t"))
        .collect()(0)
      // empty graph: sum is NULL and the frame has no rows — any finite
      // divisor keeps the (empty) output well-typed
      val t = if (tRow.isNullAt(0)) 1.0 else tRow.getDouble(0)
      // s is materialized: the half-step BEFORE last (still needed while
      // this one's join executed) is now fully superseded
      live = s :: live
      live.drop(2).foreach(_.unpersist(blocking = false))
      live = live.take(2)
      s.select(col("node"), round(col(vCol) / lit(t), 12).as(vCol))
    }
    var h = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct().select(col("node"), lit(1.0).as("h"))
    var a: DataFrame = null
    for (_ <- 1 to iters) {
      a = l1Norm(
        e.join(h, e("src") === h("node"))
          .groupBy(col("dst"))
          .agg(sum(col("h").cast(DecimalType(28, 14))).cast("double").as("a"))
          .select(col("dst").as("node"), col("a")),
        "a")
      h = l1Norm(
        e.join(a, e("dst") === a("node"))
          .groupBy(col("src"))
          .agg(sum(col("a").cast(DecimalType(28, 14))).cast("double").as("h"))
          .select(col("src").as("node"), col("h")),
        "h")
    }
    // the two final raws back the returned frame — hand them to the shared
    // pool so Dedup.uncacheAll() (the between-rows release hook) owns them
    live.foreach(Dedup.cached)
    live = Nil
    h.join(a, Seq("node"), "full_outer")
      .select(col("node"), coalesce(col("h"), lit(0.0)).as("hub"),
        coalesce(col("a"), lit(0.0)).as("auth"))
  }

  /** Per-node local clustering coefficient (Watts & Strogatz 1998):
    * c(v) = triangles(v) / C(deg(v), 2) — how close v's neighborhood is
    * to a clique, THE local cohesion read (near 1 = tight community,
    * near 0 = star/bridge). Exact integer ppm:
    * `2·10⁶·t DIV (d·(d−1))`; degree-0/1 nodes have no neighbor pair to
    * close and emit NULL (0/0 is "no answer", not "0 cohesion").
    *
    * Composes [[triangleCounts]] (degree-oriented wedge closing — the
    * scale story lives there) with one degree aggregation and a left
    * join for the zero-triangle nodes; all node-keyed equi-exchanges.
    */
  def clusteringCoefficient(edges: DataFrame,
      aCol: String = "a", bCol: String = "b"): DataFrame =
    clusteringCoefficientWith(edges,
      triangleCounts(edges, aCol, bCol), aCol, bCol)

  /** [[clusteringCoefficient]] against an ALREADY-COUNTED per-node
    * triangle frame — the seam that lets a registry share one
    * [[triangleCounts]] pass between the triangle census and the
    * coefficient (the count is the expensive stage; the coefficient
    * adds one degree agg and a join). `triangles` must be
    * [[triangleCounts]]' output over the same edge set.
    */
  def clusteringCoefficientWith(edges: DataFrame, triangles: DataFrame,
      aCol: String = "a", bCol: String = "b"): DataFrame = {
    val und = edges.select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    clusteringCoefficientWithDeg(canonicalDegrees(und), triangles)
  }

  /** The coefficient with BOTH inputs already built — `deg` is a
    * [[canonicalDegrees]]-shaped `(n, d)` table and `triangles` a
    * [[triangleCounts]] output over the SAME edge set. The registry seam
    * when the degree pass is itself a shared artifact; mismatched inputs
    * degrade silently (a stale degree table shifts every C(d,2)
    * denominator), same story as [[triangleCountsWith]].
    */
  def clusteringCoefficientWithDeg(deg: DataFrame,
      triangles: DataFrame): DataFrame = {
    deg.select(col("n").as("node"), col("d").as("deg"))
      .join(triangles, Seq("node"), "left")
      .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
      .withColumn("cc_ppm",
        when(col("deg") >= 2L,
          expr("(2000000 * n_triangles) DIV (deg * (deg - 1))")))
      .select(col("node"), col("deg"), col("n_triangles"), col("cc_ppm"))
  }

  /** Newman–Girvan modularity (Newman & Girvan 2004) of a community
    * assignment — the one-row quality audit run AFTER
    * [[labelPropagation]] (or any labeling) before trusting its
    * communities: Q = Σ_c [e_c/m − (d_c/2m)²], where m = |E| undirected,
    * e_c = intra-community edges and d_c = total degree of community c.
    * Q ≈ 0 means the labeling is no better than random wiring; the
    * emitted INTEGER sufficient statistics (m, Σe_c, Σd_c²) make the
    * gate exact and the 6-dp double one fixed-order expression over
    * them: Q = (4·m·intra − Σd_c²) / (4·m²) — the
    * [[degreeAssortativity]] discipline.
    *
    * Scale shape: two label joins riding the canonical edge list (the
    * intra test), one degree agg, one community-keyed agg over ≤ |C|
    * rows, one global 3-sum — no windows, no pair blow-up, one output
    * row at any graph size. Integer overflow fence: 4·m·intra and Σd_c²
    * are < 2⁶³ up to m ≈ 10⁹ undirected edges; beyond that swap the
    * final sums to DECIMAL(38,0) (same plan).
    *
    * `labels` must carry one (n, label) row per node covering every
    * edge endpoint (LPA's output contract).
    */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame =
    modularityWith(Dedup.cached(edges.select(
        least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()), labels)

  /** [[modularity]] over an ALREADY-CANONICAL undirected edge frame —
    * distinct `(a, b)` with `a < b`, no self-loops (the
    * [[triangleCountsWith]]/[[kCoreWith]] seam discipline): skips the
    * re-canonicalizing distinct exchange when the caller already holds
    * the canonical artifact. Same silent-degradation contract as the
    * other With-seams: a duplicate or uncanonical edge inflates m,
    * intra, and the degree sums while Q stays plausible-looking — when
    * in doubt call [[modularity]].
    */
  def modularityWith(canonical: DataFrame, labels: DataFrame): DataFrame = {
    val und = canonical.select(col("a"), col("b"))
    val lab = Dedup.cached(labels.select(col("n"), col("label")))
    // CACHED: the label-annotated edge frame feeds the (m, intra) agg AND
    // both legs of the community-degree union — uncached, the two-join
    // |E|-row subtree executes three times per call (exchange reuse does
    // not cover the aggregations above the reused exchanges)
    val ed = Dedup.cached(und
      .join(lab.select(col("n").as("a"), col("label").as("la")), Seq("a"))
      .join(lab.select(col("n").as("b"), col("label").as("lb")), Seq("b")))
    val intra = ed.agg(
      count(lit(1)).as("m"),
      sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("intra"))
    // community degree sums: each edge contributes 1 to both endpoints'
    // communities — Σ_c d_c² through one community-keyed agg
    val dc = ed.select(col("la").as("c")).unionAll(ed.select(col("lb").as("c")))
      .groupBy(col("c")).agg(count(lit(1)).as("dc"))
    val sums = dc.agg(count(lit(1)).as("n_communities"),
      sum(col("dc") * col("dc")).as("sum_dc2"))
    intra.crossJoin(broadcast(sums))
      .select(col("m"), col("intra").as("intra_edges"),
        col("n_communities"), col("sum_dc2"),
        round((lit(4L) * col("m") * col("intra") - col("sum_dc2"))
          .cast("double") / (lit(4L) * col("m") * col("m")).cast("double"), 6)
          .as("modularity"))
  }

  /** Degree assortativity (Newman, "Assortative mixing in networks",
    * 2002) — the one-row structural audit read before trusting any
    * degree-driven plan choice (hub caps, skew salting, sampling by
    * degree): do high-degree nodes attach to high-degree nodes (r > 0,
    * social-graph-like) or to low-degree ones (r < 0, hub-and-spoke /
    * bipartite-incidence-like)? Emits the INTEGER sufficient statistics
    * alongside the coefficient, so the gate compares exact BIGINTs and
    * the double is one fixed-order expression over them:
    * `(m2, s1, s11, s2, assortativity)` with m2 = directed edge count
    * (2|E|), s1 = Σ d(src), s11 = Σ d(src)·d(dst), s2 = Σ d(src)² over
    * the both-orientations edge list (symmetric by construction, so the
    * src-side moments ARE the dst-side moments), and
    * r = (s11/m2 − (s1/m2)²) / (s2/m2 − (s1/m2)²) rounded to 6 dp.
    * A degree-regular graph has zero variance: r is NULL there
    * (spec-pinned — such graphs have no mixing to measure, and ANSI
    * engines reject the raw 0/0 instead of yielding NaN).
    *
    * Scale shape: one degree aggregation + two |E|-keyed joins riding
    * the same edge frame, then a single global 4-sum aggregate — no
    * windows, no pair blow-up; the output is ONE row at any graph size.
    */
  def degreeAssortativity(edges: DataFrame,
      aCol: String = "a", bCol: String = "b"): DataFrame = {
    // cached (the pageRank discipline): the degree aggregation AND the
    // edge-keyed joins all read the oriented edge list — uncached, each
    // consumer re-derives the union + distinct from the source scan
    val e = Dedup.cached(edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(edges.select(col(bCol).as("src"), col(aCol).as("dst"))))
    val deg = Dedup.cached(e.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val ed = e
      .join(deg, Seq("src"))
      .join(deg.select(col("src").as("dst"), col("deg").as("degd")), Seq("dst"))
    val sums = ed.agg(
      count(lit(1)).as("m2"),
      sum(col("deg")).as("s1"),
      sum(col("deg") * col("degd")).as("s11"),
      sum(col("deg") * col("deg")).as("s2"))
    val mean = sums("s1").cast("double") / sums("m2")
    val den = sums("s2").cast("double") / sums("m2") - mean * mean
    sums.select(col("m2"), col("s1"), col("s11"), col("s2"),
      when(den =!= 0.0,
        round(
          (sums("s11").cast("double") / sums("m2") - mean * mean) / den, 6))
        .as("assortativity"))
  }
}
