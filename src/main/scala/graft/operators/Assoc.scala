package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining (Agrawal & Srikant, A-priori, 1994)
  * — pairwise rules with support / confidence / lift, the co-occurrence
  * read behind "orders containing X also contain Y" and, in a corpus
  * pipeline, "documents tagged A are also tagged B".
  *
  * Scale notes: the only quadratic step is the within-basket pair
  * expansion, Σ_baskets |basket|² — bounded by the basket-size contract
  * (an order's items, a doc's tags), never corpus². Everything else is
  * map-side-combined counting plus one broadcast scalar. All ratios are
  * exact integer ppm — no float crosses an engine boundary.
  */
object Assoc {

  /** Pairwise association rules over a (basket, item) incidence frame.
    * Dedups incidence first (a basket lists an item once), counts pair
    * co-occurrence via the canonical within-basket self-join
    * (item_a < item_b — each unordered pair once), then scores:
    *
    *  - `support_ppm`  = n_pair / n_baskets
    *  - `conf_ab_ppm`  = n_pair / n_a   (a ⇒ b)
    *  - `conf_ba_ppm`  = n_pair / n_b   (b ⇒ a)
    *  - `lift_ppm`     = n_pair · n_baskets / (n_a · n_b)
    *    (1e6 = independence; above = positive association)
    *
    * `minPairN` is the A-priori support prune applied BEFORE the
    * per-item joins — at scale the pair table is the big side and the
    * prune is where the algorithm earns its keep.
    *
    * VIRAL-BASKET GUARD: a basket with m distinct items expands to
    * C(m,2) pairs inside ONE task (the row-local expansion cannot be
    * split), so one pathological basket — a default tag, a crawl
    * artifact — of 10⁶ items would be a 5·10¹¹-pair straggler/OOM.
    * Baskets with more than `maxBasketItems` distinct items are
    * therefore EXCLUDED from pairing (the same treatment NULL baskets
    * get: their items still count into `n_a`/`n_b` and the basket into
    * `n_baskets` — only the co-occurrence edges are dropped). This is
    * the df-cap / maxCenterDeg discipline of
    * [[Dedup.ngramJaccardPairs]] / [[Graph.neighborJaccard]]: the
    * oversized baskets are precisely the promiscuous ones that carry
    * the least association signal per pair. The drop is auditable —
    * [[oversizedBaskets]] lists exactly what was excluded (run it
    * before trusting a capped result) — or loud: `failOnOversized =
    * true` turns the exclusion into a plan-side `raise_error` naming
    * the basket, for pipelines that must not silently lose signal.
    * The pre-guard array build is linear (one m-entry array per
    * basket), so the surviving worst task is O(maxBasketItems²) pairs
    * — 5·10⁷ at the default cap, a bounded task anywhere.
    *
    * Overflow fence: lift's numerator n_pair·n_baskets·10⁶ needs
    * n_baskets² < ~9·10¹² (n_baskets < 3M); beyond that cast the three
    * count columns to DECIMAL(38,0) (same plan).
    */
  def pairRules(bi: DataFrame, basketCol: String = "basket",
      itemCol: String = "item", minPairN: Long = 1L,
      maxBasketItems: Int = 10000,
      failOnOversized: Boolean = false): DataFrame =
    pairRulesDistinct(
      Dedup.cached(bi.select(
        col(basketCol).as("basket"), col(itemCol).as("item")).distinct()),
      minPairN, maxBasketItems, failOnOversized)

  /** [[pairRules]] over an ALREADY-DEDUPED `(basket, item)` incidence
    * frame — the seam that lets a registry serve one memoized distinct
    * incidence artifact to both the rules row and the
    * [[oversizedBaskets]] audit row instead of each paying the
    * dedup exchange privately (the graph family's canonical-seam
    * discipline). The caller owns the distinctness contract, and a
    * violation degrades SILENTLY in a specific direction: a duplicated
    * incidence row inflates that item's `n_item` AND its pairs'
    * `n_pair` together, so supports/confidences read high while staying
    * internally consistent — no downstream check catches it. When in
    * doubt call [[pairRules]]. The frame is read by several subplans
    * (n_baskets, item counts, pairing): pass a cached or memoized
    * frame.
    */
  def pairRulesDistinct(b: DataFrame, minPairN: Long = 1L,
      maxBasketItems: Int = 10000,
      failOnOversized: Boolean = false): DataFrame = {
    require(minPairN >= 1, s"minPairN must be >= 1: $minPairN")
    require(maxBasketItems >= 2,
      s"maxBasketItems must be >= 2 (a pair needs two items): $maxBasketItems")
    val nB = b.agg(countDistinct(col("basket")).as("n_baskets"))
    val itemN = b.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    // within-basket pairs are generated ROW-LOCALLY from each basket's
    // sorted distinct item array (the simhashPairs within-group pattern):
    // one basket-keyed exchange feeding a row-local inline expansion,
    // where the earlier basket self-join shuffled the full incidence
    // TWICE and materialized the join before the pair count. Items are
    // distinct and ascending per basket, so i < j ⟺ item_i < item_j —
    // the identical canonical (item_a < item_b) pair set.
    //
    // NULL-basket rows are EXCLUDED from pairing only (matching the
    // self-join form, whose null-rejecting basket equality never paired
    // them — groupBy would instead collapse every NULL-basket row into
    // one giant pseudo-basket); they still count into n_item, exactly as
    // before. NULL items need no filter: collect_list skips them, as the
    // old item comparison did.
    val sized = b.filter(col("basket").isNotNull)
      .groupBy(col("basket"))
      .agg(sort_array(collect_list(col("item"))).as("items"))
    // the guard runs BEFORE the quadratic inline expansion: an oversized
    // basket costs one linear array build, never its C(m,2) pairs
    val guarded =
      if (failOnOversized)
        sized.filter(
          when(size(col("items")) > maxBasketItems,
            raise_error(concat(
              lit(s"pairRules: basket exceeds maxBasketItems=$maxBasketItems ("),
              size(col("items")).cast("string"), lit(" items): "),
              col("basket").cast("string"))).cast("boolean"))
          .otherwise(size(col("items")) >= 2))
      else
        sized.filter(size(col("items")) >= 2 &&
          size(col("items")) <= maxBasketItems)
    val pairs = guarded
      .select(expr(
        """inline(flatten(transform(items, (x, i) ->
          |  transform(slice(items, i + 2, size(items) - i - 1),
          |            y -> struct(x AS item_a, y AS item_b)))))""".stripMargin))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairN)
    pairs
      .join(itemN.select(col("item").as("item_a"), col("n_item").as("n_a")),
        Seq("item_a"))
      .join(itemN.select(col("item").as("item_b"), col("n_item").as("n_b")),
        Seq("item_b"))
      .crossJoin(broadcast(nB))
      .select(col("item_a"), col("item_b"), col("n_pair"), col("n_a"),
        col("n_b"),
        expr("(n_pair * 1000000) DIV n_baskets").as("support_ppm"),
        expr("(n_pair * 1000000) DIV n_a").as("conf_ab_ppm"),
        expr("(n_pair * 1000000) DIV n_b").as("conf_ba_ppm"),
        expr("(n_pair * n_baskets * 1000000) DIV (n_a * n_b)").as("lift_ppm"))
  }

  /** The audit side of [[pairRules]]' viral-basket guard: the baskets a
    * capped run excluded from pairing, as `(basket, n_items)`. Same
    * incidence dedup and NULL-basket exclusion as the main pass, but
    * counts only — no arrays, map-side-combinable, O(|incidence|) with
    * one basket-keyed exchange at any scale. Empty ⟺ the capped result
    * equals the uncapped one.
    */
  def oversizedBaskets(bi: DataFrame, basketCol: String = "basket",
      itemCol: String = "item", maxBasketItems: Int = 10000): DataFrame =
    oversizedBasketsDistinct(
      bi.select(col(basketCol).as("basket"), col(itemCol).as("item"))
        .distinct(),
      maxBasketItems)

  /** [[oversizedBaskets]] over an ALREADY-DEDUPED `(basket, item)`
    * incidence — the audit half of the [[pairRulesDistinct]] seam, so
    * both rows read ONE shared artifact. Same silent failure mode:
    * duplicate incidence inflates `n_items` and can flag a basket the
    * capped [[pairRulesDistinct]] run did NOT exclude.
    */
  def oversizedBasketsDistinct(b: DataFrame,
      maxBasketItems: Int = 10000): DataFrame = {
    require(maxBasketItems >= 2,
      s"maxBasketItems must be >= 2 (a pair needs two items): $maxBasketItems")
    b.select(col("basket"), col("item"))
      .filter(col("basket").isNotNull && col("item").isNotNull)
      .groupBy(col("basket")).agg(count(lit(1)).as("n_items"))
      .filter(col("n_items") > maxBasketItems)
  }
}
