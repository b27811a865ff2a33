package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-shape operators for skewed keys.
  *
  * Spark's first answers to join skew are (in order): broadcast the small
  * side (no shuffle at all), and AQE's skew-join splitting (runtime
  * re-plan of oversized sort-merge partitions). Manual salting is the
  * remaining tool for the case both miss: a LARGE-large equi-join whose
  * key histogram is so hot that even a split partition serializes — the
  * classic "join everything to the per-key dim on a 6-value key" shape of
  * web-corpus pipelines (domain, language, event type). Salting trades a
  * `salts`× replication of the smaller side for splitting every hot key
  * into `salts` independent tasks — bounded, planner-independent, and
  * result-identical to the plain join.
  */
object Joins {

  /** Skew-hardened inner equi-join on `key`: the large side derives a
    * salt in [0, salts) from `saltSource` (any roughly-uniform column —
    * a row id; the VALUES never affect the result, only task balance),
    * the small side is replicated once per salt value, and the join key
    * becomes (key, salt) — so one hot key spreads over `salts` tasks
    * instead of one. The merge hint keeps the demonstration honest on
    * small fixtures (a tiny dim would otherwise broadcast and no salted
    * exchange would exist to observe); at the target large-large scale
    * the planner picks the shuffle join on its own.
    *
    * Result contract: exactly the plain `large.join(small, key)` row set
    * — every large row meets every same-key small row exactly once
    * (its one salt value × that salt's single replica). EngineSpec pins
    * both the result identity and the (key, salt)-keyed exchange.
    */
  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int, saltSource: Column): DataFrame = {
    require(salts >= 2, s"salts must be >= 2: $salts")
    val l = large.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val r = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i)): _*)))
    l.hint("merge").join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** CMS join-size estimation (Alon–Matias–Szegedy 1996 lineage; the
    * Count-Min inner-product estimator, Cormode & Muthukrishnan 2005
    * §4.2) — answer "how big is this join" WITHOUT running it: build a
    * d×w Count-Min sketch of the join key on each side (one bounded
    * map-side-combined agg per side — d·w counter rows, never the key
    * set), then estimate |A ⋈ B| = min over rows j of Σ_b cA[j][b]·cB[j][b].
    * Collisions only ADD mass, so the estimate is a deterministic UPPER
    * BOUND on the exact size (emitted alongside, with the bound flag) —
    * the pre-shuffle blow-up detector for the skew toolkit: a quadratic
    * hot-key join announces itself in d·w integers before any exchange
    * is paid.
    *
    * Everything is integer; the same md5 bucket hash as
    * [[TextAnalysis.cmsTokenEstimates]], so the oracle replays the whole
    * sketch. The exact size here is computed for VERIFICATION — at scale
    * the sketches alone are the product.
    */
  def cmsJoinSizeEstimate(left: DataFrame, right: DataFrame, keyCol: String,
      width: Int = 256, depth: Int = 3): DataFrame = {
    require(width >= 2 && depth >= 1, s"need width>=2, depth>=1: $width/$depth")
    def cells(df: DataFrame): DataFrame = df
      .select(col(keyCol).cast("string").as("t"))
      .select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"),
          TextAnalysis.cmsBucket(j, col("t"), width).as("b"))): _*)).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
      .agg(count(lit(1)).as("n"))
    val est = cells(left)
      .join(cells(right).withColumnRenamed("n", "m"), Seq("j", "b"))
      .groupBy(col("j")).agg(sum(col("n") * col("m")).as("e"))
      .agg(min(col("e")).as("cms_estimate"))
    val exact = left.groupBy(col(keyCol)).agg(count(lit(1)).as("cl"))
      .join(right.groupBy(col(keyCol)).agg(count(lit(1)).as("cr")), Seq(keyCol))
      .agg(coalesce(sum(col("cl") * col("cr")), lit(0L)).as("exact_size"))
    exact.crossJoin(est)
      .select(col("exact_size"), col("cms_estimate"),
        (col("cms_estimate") >= col("exact_size")).as("upper_bound_holds"))
  }

  /** Blocked fuzzy self-join — the entity-resolution candidate generator
    * (Fellegi–Sunter record-linkage blocking, 1969; the standard "never
    * all-pairs" discipline): rows pair ONLY within equal `blockCols`
    * values, candidate volume is Σ_blocks size², and each candidate is
    * scored by exact Levenshtein edit distance on `strCol` (integer —
    * identical in every engine), kept when ≤ `maxDist`.
    *
    * Scale contract: the block keys ARE the plan — the self-join is a
    * plain equi-join on `blockCols` (one exchange, AQE-splittable), so
    * block-size skew is the thing to watch: pick keys whose biggest
    * block is task-sized (the [[Graph.neighborJaccard]] hub-cap
    * rationale applies — add a block-size cap upstream if the key can
    * go viral). Recall lost to blocking is the documented trade; union
    * several blocked passes with different keys to recover it (each
    * pass is this same operator).
    *
    * Emits (u_key, v_key, u_str, v_str, dist) with u_key < v_key.
    */
  /** Per-row digit-frequency bag PACKED into one long (10 counts × 6
    * bits, each capped at 63 — capping is a contraction, so the lower
    * bound below stays valid) — the character-bag side of the
    * edit-distance lower bound. Row-local, computed once per side
    * before the blocked join fans out to candidates; packing keeps the
    * join payload one long and the per-candidate L1 an UNROLLED integer
    * expression inside whole-stage codegen (an array + higher-order
    * fold here would fall out of codegen on the hottest filter).
    */
  private def digitBagPacked(c: Column): Column =
    (0 to 9).map { d =>
      shiftleft(least(
        length(c) - length(call_function("replace", c, lit(d.toString), lit(""))),
        lit(63)).cast("long"), 6 * d)
    }.reduce(_ + _)

  /** Σ_d |count_d(u) − count_d(v)| over two packed bags — 10 unrolled
    * mask-and-abs terms, no arrays, no lambdas.
    */
  private def packedBagL1(u: Column, v: Column): Column =
    (0 to 9).map { d =>
      abs(shiftright(u, 6 * d).bitwiseAND(lit(63L)) -
        shiftright(v, 6 * d).bitwiseAND(lit(63L)))
    }.reduce(_ + _)

  def blockedFuzzyJoin(df: DataFrame, blockCols: Seq[String],
      keyCol: String, strCol: String, maxDist: Int): DataFrame = {
    require(blockCols.nonEmpty, "need at least one blocking column")
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    val x = df.select(
      (blockCols.map(col) :+ col(keyCol).as("u_key") :+ col(strCol).as("u_str")): _*)
      .withColumn("u_len", length(col("u_str")))
      .withColumn("u_bag", digitBagPacked(col("u_str")))
    val y = df.select(
      (blockCols.map(col) :+ col(keyCol).as("v_key") :+ col(strCol).as("v_str")): _*)
      .withColumn("v_len", length(col("v_str")))
      .withColumn("v_bag", digitBagPacked(col("v_str")))
    x.join(y, blockCols)
      .filter(col("u_key") < col("v_key"))
      // EXACT lower-bound prefilters before the DP (never drop a true
      // <= maxDist pair): ed >= |len_a - len_b| (each edit changes the
      // length by at most 1), and ed >= L1(charBag_a, charBag_b) / 2
      // (an insert/delete moves the bag by 1, a substitution by 2 —
      // restricting the bag to digits only LOWERS the bound, so it
      // stays valid for any alphabet while catching the numeric-suffix
      // differences that dominate id-like strings). Both are row-local
      // integer math, orders of magnitude cheaper than the banded DP.
      .filter(abs(col("u_len") - col("v_len")) <= maxDist)
      .filter(packedBagL1(col("u_bag"), col("v_bag")) <= maxDist * 2)
      // threshold form: the banded DP early-exits once the distance
      // provably exceeds maxDist (returns -1), turning the O(|s|·|t|)
      // matrix into an O(maxDist·|s|) band per pair — same kept rows and
      // distances as the unbounded form filtered to <= maxDist
      .withColumn("dist", levenshtein(col("u_str"), col("v_str"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("u_key"), col("v_key"), col("u_str"), col("v_str"),
        col("dist").cast("long").as("dist"))
  }

  /** Spatial radius self-join via grid blocking — the 2D analog of LSH
    * banding (proximity joins over point data: store co-location,
    * sensor neighborhoods, embedding-projection neighborhoods): all
    * pairs within `radius` (Euclidean, CLOSED ball, exact INTEGER
    * dist² ≤ radius² — no floating point, no trig), found via the
    * classic 3×3 stencil: one side explodes its 9 neighboring grid
    * cells, the other keeps its home cell, the join keys on the cell.
    * With `cell >= radius` the stencil is a GUARANTEE, not a
    * heuristic: any pair within radius differs by < cell per axis, so
    * b's home cell is among a's 9 (spec-pinned ≡ the all-pairs brute
    * force). Each pair meets at most ONCE (b has one home cell; a's 9
    * stencil cells are distinct) — no candidate dedup anywhere.
    *
    * Scale shape: the exchange keys on the grid cell — candidate
    * volume is Σ_cells 9·|cell|², bounded by density, never N²; a hot
    * cell is a data-skew fact (AQE-splittable), not a plan defect.
    * Grid snapping is FLOOR division (`(x − pmod(x, cell)) div cell`,
    * exact integers), so negative coordinates snap correctly — plain
    * `div` truncates toward zero and would merge the cells on either
    * side of each axis, silently over-widening the stencil there.
    *
    * Emits (id_a, id_b, dist2) with id_a < id_b.
    */
  def radiusJoinBlocked(pts: DataFrame, radius: Long, cell: Long,
      idCol: String = "id", xCol: String = "x", yCol: String = "y"): DataFrame = {
    require(radius >= 0, s"radius must be >= 0: $radius")
    require(cell >= math.max(radius, 1L),
      s"cell ($cell) must be >= radius ($radius) for the 3x3 stencil guarantee")
    def snap(c: String) = expr(s"($c - pmod($c, $cell)) div $cell")
    val home = pts.select(col(idCol).as("id_b"),
      col(xCol).as("xb"), col(yCol).as("yb"),
      snap(xCol).as("cx"), snap(yCol).as("cy"))
    val stencil = pts.select(col(idCol).as("id_a"),
        col(xCol).as("xa"), col(yCol).as("ya"),
        snap(xCol).as("hx"), snap(yCol).as("hy"))
      .withColumn("dx", explode(expr("sequence(-1L, 1L)")))
      .withColumn("dy", explode(expr("sequence(-1L, 1L)")))
      .select(col("id_a"), col("xa"), col("ya"),
        (col("hx") + col("dx")).as("cx"), (col("hy") + col("dy")).as("cy"))
    stencil.join(home, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        ((col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb"))).as("dist2"))
      .filter(col("dist2") <= radius * radius)
  }

  /** Two-frame grid-blocked radius join — [[radiusJoinBlocked]]'s
    * cross-frame form, the shape the production question actually takes
    * (points × sites: which STORES are near each customer, which
    * SENSORS cover each reading): the query side explodes the 3×3
    * stencil, the site side keeps its home cell, and the `id_a < id_b`
    * self-join canonicalization is dropped — (point, site) is already
    * an ordered pair, every qualifying one emits exactly once (a site
    * has one home cell; a point's 9 stencil cells are distinct).
    *
    * Same guarantee as the parent: with `cell >= radius`, any pair
    * within radius differs by < cell per axis, so the site's home cell
    * is among the point's 9 — blocked ≡ the all-pairs brute force, and
    * the registry oracle IS that brute force. Floor-snap (not `div`
    * truncation) keeps negative coordinates on their own side of each
    * axis. Exchange keys on the grid cell: candidate volume is
    * Σ_cells 9·|cellP|·|cellS| — density-bounded, never |P|·|S|; the
    * usual asymmetry (|sites| ≪ |points|) makes the site side the
    * small build side of the cell join, which AQE picks up at runtime.
    *
    * Emits (point_id, site_id, dist2), exact integers.
    */
  def radiusJoin2(points: DataFrame, sites: DataFrame, radius: Long,
      cell: Long, idCol: String = "id", xCol: String = "x",
      yCol: String = "y"): DataFrame = {
    require(radius >= 0, s"radius must be >= 0: $radius")
    require(cell >= math.max(radius, 1L),
      s"cell ($cell) must be >= radius ($radius) for the 3x3 stencil guarantee")
    def snap(c: String) = expr(s"($c - pmod($c, $cell)) div $cell")
    val home = sites.select(col(idCol).as("site_id"),
      col(xCol).as("xb"), col(yCol).as("yb"),
      snap(xCol).as("cx"), snap(yCol).as("cy"))
    val stencil = points.select(col(idCol).as("point_id"),
        col(xCol).as("xa"), col(yCol).as("ya"),
        snap(xCol).as("hx"), snap(yCol).as("hy"))
      .withColumn("dx", explode(expr("sequence(-1L, 1L)")))
      .withColumn("dy", explode(expr("sequence(-1L, 1L)")))
      .select(col("point_id"), col("xa"), col("ya"),
        (col("hx") + col("dx")).as("cx"), (col("hy") + col("dy")).as("cy"))
    stencil.join(home, Seq("cx", "cy"))
      .select(col("point_id"), col("site_id"),
        ((col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb"))).as("dist2"))
      .filter(col("dist2") <= radius * radius)
  }
}
