package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the train/val/test assignment step of
  * a training-data pipeline. Assignment hashes the stable record id with
  * md5 and thresholds the first two hex digits (256 buckets), so:
  *  - the split is a pure function of the id (stable across runs, engines,
  *    partitionings, and data order — no RNG, no state);
  *  - membership is decided row-locally (narrow plan, no shuffle);
  *  - fractions are honored to 1/256 granularity, which is the right
  *    trade-off for corpus-scale splits (use four digits for 1/65536).
  */
object Splits {

  /** Cumulative thresholds as 2-char strings comparable against a 2-hex
    * md5 prefix. A cumulative fraction reaching 1.0 maps to 256, whose
    * natural "%02x" would be the 3-char "100" — lexicographically SMALLER
    * than "ff", silently inverting the comparison — so it is clamped to
    * "zz", which every 2-hex string is below.
    */
  private def thresholds(splits: Seq[(String, Double)]): Seq[String] =
    splits.init.scanLeft(0.0)(_ + _._2).tail.map { c =>
      val bucket = (c * 256).toInt
      if (bucket >= 256) "zz" else f"$bucket%02x"
    }

  /** (name, fraction) pairs → a CASE column over the id. Fractions must sum
    * to 1; the last split absorbs rounding.
    */
  def splitColumn(idCol: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val hex = substring(md5(idCol.cast("string")), 1, 2)
    splits.init.zip(thresholds(splits)).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), t)) =>
        when(hex < t, lit(name)).otherwise(acc)
      }
  }

  /** The same thresholds as SQL text, for oracle mirroring. */
  def splitCaseSql(idExpr: String, splits: Seq[(String, Double)]): String = {
    val whens = splits.init.zip(thresholds(splits))
      .map { case ((name, _), t) =>
        s"WHEN substring(md5(CAST($idExpr AS VARCHAR)),1,2) < '$t' THEN '$name'"
      }
      .mkString(" ")
    s"CASE $whens ELSE '${splits.last._1}' END"
  }

  /** df + a `split` column. */
  def assign(df: DataFrame, idCol: String, splits: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", splitColumn(col(idCol), splits))

  /** Sampled GROUP-BY with the Horvitz–Thompson correction — the AQP
    * (approximate query processing, BlinkDB / Agarwal et al. 2013)
    * pattern priced on one verified surface: rows enter the sample iff
    * their id's 2-hex md5 bucket < `num` (inclusion probability
    * p = num/256 — deterministic, so reruns and the oracle see the SAME
    * sample), and each sampled group's count/sum inflate by 1/p
    * (integer `·256 DIV num`). The row emits the exact side alongside
    * the estimate with its realized `err_ppm`, because an AQP knob you
    * haven't measured is a guess — the [[graft.operators.Similarity]]
    * recall-row discipline applied to aggregation.
    *
    * Scale shape: ONE map-side-combined aggregation computes both sides
    * (the sample membership is a row-local predicate feeding conditional
    * aggs — no second scan, no join); at 100 TB the production form
    * drops the exact columns and the scan reads p of the corpus, which
    * is the entire point. `valCol` must already be an exact long
    * (decimal-scaled upstream).
    */
  def sampledAggHt(df: DataFrame, idCol: String, keyCols: Seq[String],
      valCol: String, num: Int): DataFrame = {
    require(num >= 1 && num <= 256, s"num must be in [1,256]: $num")
    // num=256 means p=1 (sample everything), but f"$num%02x" would give
    // the 3-char "100" which sorts BELOW "ff" lexicographically — the
    // same trap fractionThreshold clamps: use "zz" (> every 2-hex value).
    val hex = if (num >= 256) "zz" else f"$num%02x"
    val keys = keyCols.map(col)
    df.withColumn("in_sample",
        substring(md5(col(idCol).cast("string")), 1, 2) < lit(hex))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_exact"),
        sum(col(valCol)).as("sum_exact"),
        sum(when(col("in_sample"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("in_sample"), col(valCol)).otherwise(0L)).as("sum_sampled"))
      .withColumn("est_n", expr(s"(n_sampled * 256) DIV $num"))
      // sign·abs form (the house signed-div rule): Spark DIV truncates
      // while the oracle's // floors — they agree only on non-negative
      // operands, and a value column may legally sum negative
      .withColumn("est_sum",
        signum(col("sum_sampled")).cast("long") *
          expr(s"(abs(sum_sampled) * 256) DIV $num"))
      .withColumn("err_ppm",
        when(col("sum_exact") =!= 0L,
          expr("(1000000 * abs(est_sum - sum_exact)) DIV abs(sum_exact)")))
      .select(keys ++ Seq(col("n_exact"), col("sum_exact"), col("n_sampled"),
        col("est_n"), col("est_sum"), col("err_ppm")): _*)
  }

  /** Poisson-bootstrap confidence interval for a mean (Efron 1979; the
    * Poisson(1)-weight streaming form per Chamandy et al. 2012, "Estimating
    * uncertainty for massive data streams"): classical bootstrap resampling
    * needs n draws WITH replacement per replica — unshardable — but each
    * row's multiplicity in a replica is asymptotically Poisson(1), so
    * replica b's resample is "weight every row by an independent
    * Poisson(1) draw keyed on (id, b)" — embarrassingly parallel and
    * deterministic here: the draw inverts the Poisson CDF at the row's
    * 5-hex md5 bucket u ∈ [0, 2²⁰) against integer thresholds (weights
    * capped at 6; P(w>6) < 10⁻⁴ truncated — documented bias far below
    * sampling noise). The CI is the percentile interval over the B
    * replica means (alphaPpm/2 in each tail, floor-rank order
    * statistics — integer-exact, no interpolation).
    *
    * Reference scope note: no counterpart in the reference engine
    * (`handler.go` reports point sums only); extension-mandate operator —
    * the error bar a pipeline attaches to any sampled/estimated metric.
    *
    * Scale shape: one explode(B) over the scan feeding a map-side-
    * combined B-group aggregation — the shuffle carries only
    * partitions×B partial rows, never the corpus; the window over B
    * replica means is driver-trivial. `valCol` must already be an exact
    * long (decimal-scaled upstream); sums are DECIMAL(38,0)-fenced
    * (B·n·|x| passes int64 early at corpus scale).
    */
  /** The shared replica PARTIALS fold: `(keyCols..., j, sw, swx)` — one
    * exploded map-side-combined (keys, j)-group agg. The partials are
    * ADDITIVE (plain sums), which is what lets the streaming twin
    * ([[graft.streaming.BootstrapStream]]) fold them across micro-batches
    * and still serve the batch operator's exact CI.
    */
  private[graft] def poissonReplicaPartials(df: DataFrame, idCol: String,
      keyCols: Seq[String], valCol: String, b: Int): DataFrame = {
    // Poisson(1) CDF at k = 0..5, scaled to 2^20: u below th(k) → weight k
    val th = Seq(385750L, 771499L, 964374L, 1028665L, 1044738L, 1047953L)
    val u = expr(s"CAST(CONV(substring(md5(concat(CAST($idCol AS STRING)," +
      s" ':', CAST(j AS STRING))), 1, 5), 16, 10) AS BIGINT)")
    val w = th.zipWithIndex.reverse
      .foldLeft(lit(6L)) { case (acc, (t, k)) =>
        when(col("u") < lit(t), lit(k.toLong)).otherwise(acc)
      }
    df
      .select(col(idCol) +: col(valCol).cast("long").as("x")
        +: keyCols.map(col): _*)
      .withColumn("j", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("u", u)
      .withColumn("w", w)
      .groupBy(keyCols.map(col) :+ col("j"): _*)
      .agg(sum(col("w")).as("sw"),
        sum((col("w") * col("x")).cast("decimal(38,0)")).as("swx"))
  }

  /** The sign-safe replica-mean expression over `(sw, swx)` partials. */
  private[graft] def replicaMeanCol: Column = when(col("sw") > 0L,
    signum(col("swx")).cast("long") *
      expr("(CAST(1000000 AS DECIMAL(38,0)) * abs(swx)) div sw"))
    .otherwise(lit(0L))

  /** Unkeyed percentile CI over `(j, sw, swx)` partials: one
    * `(lo_ppm, hi_ppm)` row — shared by the batch operator and the
    * streaming serve so the interval algebra cannot drift.
    */
  private[graft] def ciFromReplicaPartials(partials: DataFrame, b: Int,
      alphaPpm: Long): DataFrame = {
    val tail = b.toLong * alphaPpm / 2000000L
    partials.withColumn("mean_ppm", replicaMeanCol)
      .select(col("mean_ppm"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("mean_ppm"), col("j"))).as("rk"))
      .agg(
        min(when(col("rk") === lit(tail + 1L), col("mean_ppm"))).as("lo_ppm"),
        min(when(col("rk") === lit(b.toLong - tail), col("mean_ppm"))).as("hi_ppm"))
  }

  private def poissonReplicaMeans(df: DataFrame, idCol: String,
      keyCols: Seq[String], valCol: String, b: Int): DataFrame =
    poissonReplicaPartials(df, idCol, keyCols, valCol, b)
      .withColumn("mean_ppm", replicaMeanCol)

  def bootstrapCiMean(df: DataFrame, idCol: String, valCol: String,
      b: Int, alphaPpm: Long = 50000L): DataFrame = {
    require(b >= 4, s"need at least 4 replicas: $b")
    require(alphaPpm >= 0L && alphaPpm < 1000000L, s"bad alphaPpm: $alphaPpm")
    val ci = ciFromReplicaPartials(
      poissonReplicaPartials(df, idCol, Nil, valCol, b), b, alphaPpm)
    val exact = df.agg(
      count(lit(1)).as("n_rows"),
      (signum(sum(col(valCol))).cast("long") * expr(
        s"(CAST(1000000 AS DECIMAL(38,0)) * abs(CAST(SUM($valCol) AS " +
          "DECIMAL(38,0)))) div COUNT(*)")).as("mean_ppm"))
    exact.crossJoin(broadcast(ci))
      .select(lit(b.toLong).as("b_reps"), col("n_rows"), col("mean_ppm"),
        col("lo_ppm"), col("hi_ppm"))
  }

  /** [[bootstrapCiMean]] per key — the stratified read (an error bar per
    * source/language/event-type, so the "corpus mean moved" alarm can
    * say WHICH stratum moved beyond its own noise). Identical replica
    * algebra with every stage keyed: the (key, j)-group agg shares one
    * exchange shape, and the rank window runs over each key's B replica
    * means (B-bounded partitions, never the corpus).
    */
  def bootstrapCiMeanByKey(df: DataFrame, idCol: String, keyCol: String,
      valCol: String, b: Int, alphaPpm: Long = 50000L): DataFrame = {
    require(b >= 4, s"need at least 4 replicas: $b")
    require(alphaPpm >= 0L && alphaPpm < 1000000L, s"bad alphaPpm: $alphaPpm")
    val reps = poissonReplicaMeans(df, idCol, Seq(keyCol), valCol, b)
    val tail = b.toLong * alphaPpm / 2000000L
    val ranked = reps.select(col(keyCol), col("mean_ppm"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col(keyCol))
        .orderBy(col("mean_ppm"), col("j"))).as("rk"))
    val ci = ranked.groupBy(col(keyCol)).agg(
      min(when(col("rk") === lit(tail + 1L), col("mean_ppm"))).as("lo_ppm"),
      min(when(col("rk") === lit(b.toLong - tail), col("mean_ppm"))).as("hi_ppm"))
    val exact = df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_rows"),
      (signum(sum(col(valCol))).cast("long") * expr(
        s"(CAST(1000000 AS DECIMAL(38,0)) * abs(CAST(SUM($valCol) AS " +
          "DECIMAL(38,0)))) div COUNT(*)")).as("mean_ppm"))
    exact.join(ci, Seq(keyCol))
      .select(col(keyCol), lit(b.toLong).as("b_reps"), col("n_rows"),
        col("mean_ppm"), col("lo_ppm"), col("hi_ppm"))
  }

  /** Leave-one-out target encoding — the leakage-free categorical
    * feature (Micci-Barreca 2001): each row's encoding is the mean
    * target of its CATEGORY EXCLUDING THE ROW ITSELF, so a category's
    * own label never flows into its own feature (plain mean encoding
    * leaks the target and overfits singleton categories). Computed as
    * one map-side-combined category agg (sum, n) joined back row-local:
    * `loo = (sum − own) / (n − 1)`; singleton categories get NULL (no
    * peer information exists — the honest answer, callers impute with
    * the global prior).
    *
    * Integer-exact: targets scale to micro-unit longs, the division is
    * integer floor-div — nothing floats across the oracle boundary.
    */
  def looTargetEncode(df: DataFrame, catCol: String, targetCol: String,
      idCol: String): DataFrame = {
    val v = df.select(col(idCol), col(catCol),
      round(col(targetCol) * lit(1000000L), 0).cast("long").as("t_u6"))
    val agg = v.groupBy(col(catCol))
      .agg(sum(col("t_u6")).as("cat_sum"), count(lit(1)).as("cat_n"))
    v.join(agg, Seq(catCol))
      .select(col(idCol), col(catCol), col("t_u6"), col("cat_n"),
        when(col("cat_n") > 1,
          expr("(cat_sum - t_u6) DIV (cat_n - 1)")).as("loo_u6"))
  }

  private[operators] def fractionThreshold(f: Double): String = {
    require(f >= 0.0 && f <= 1.0, s"fraction must be in [0,1], got $f")
    val bucket = (f * 256).toInt
    if (bucket >= 256) "zz" else f"$bucket%02x"
  }

  /** Deterministic stratified sampling — the training-mix rebalancing step
    * (downsample the over-represented language/source strata, keep the
    * rest). A row survives iff its id's 2-hex md5 bucket falls below its
    * stratum's fraction threshold: the same engine-portable, RNG-free,
    * row-local decision as [[assign]], so the sample is stable across
    * runs, engines, and partitionings, and the plan stays narrow (a filter
    * — no shuffle, no sample() nondeterminism; `df.sample` re-draws on
    * every recomputation and is unusable for reproducible corpus cuts).
    * Fractions are honored to 1/256 granularity per stratum.
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 1.0): DataFrame = {
    val thr = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit(fractionThreshold(defaultFraction))) { case (acc, (k, f)) =>
        when(col(stratumCol) === lit(k), lit(fractionThreshold(f))).otherwise(acc)
      }
    df.filter(substring(md5(col(idCol).cast("string")), 1, 2) < thr)
  }

  /** [[stratifiedSample]] with DATA-DERIVED per-stratum rates — the form
    * that composes with [[temperatureMix]] (whose rates are computed from
    * the corpus, not known to the caller as literals): `rates` is a tiny
    * (stratum, rate∈[0,1]) frame, broadcast onto a row-local keep test.
    * The decision rule is EXACTLY [[stratifiedSample]]'s 256-bucket
    * threshold, evaluated numerically (`hex2(md5(id)) < ⌊rate·256⌋` —
    * zero-padded 2-hex lexicographic compare IS the numeric compare, so
    * the two forms select identical rows for identical fractions; a rate
    * of 1.0 yields 256, above every hex value, keeping everything).
    * Strata absent from `rates` are dropped (an inner join — the
    * down-sample-only mixing contract).
    */
  def stratifiedSampleByRates(
      df: DataFrame, idCol: String, stratumCol: String,
      rates: DataFrame, rateCol: String = "sample_rate"): DataFrame =
    df.join(
        broadcast(rates.select(col(stratumCol), col(rateCol).as("__rate"))),
        Seq(stratumCol))
      .filter(
        conv(substring(md5(col(idCol).cast("string")), 1, 2), 16, 10).cast("long") <
          floor(col("__rate") * 256).cast("long"))
      .select(df.columns.map(col): _*)

  /** The same stratum-threshold predicate as SQL text, for oracle mirroring. */
  def stratifiedSampleSql(
      idExpr: String, stratumExpr: String,
      fractions: Map[String, Double], defaultFraction: Double = 1.0): String = {
    val whens = fractions.toSeq.sortBy(_._1)
      .map { case (k, f) => s"WHEN $stratumExpr = '$k' THEN '${fractionThreshold(f)}'" }
      .mkString(" ")
    s"substring(md5(CAST($idExpr AS VARCHAR)),1,2) < (CASE $whens ELSE '${fractionThreshold(defaultFraction)}' END)"
  }

  /** Deterministic k-fold assignment — cross-validation folds as a pure
    * function of the id (the [[assign]] discipline at fold granularity):
    * fold = first-4-hex md5 bucket mod k. Row-local, RNG-free, stable
    * across engines/partitionings/retries; folds are balanced to the
    * md5's uniformity (±O(√n) per fold). Train/holdout for fold i is a
    * FILTER (`fold =!= i` / `fold === i`) — no shuffle, no materialized
    * copies, so running all k rotations costs k narrow scans, not k
    * corpus rewrites.
    */
  def kfold(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    df.withColumn("fold",
      conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10).cast("long") % k)
  }

  /** The same fold derivation as SQL text, for oracle mirroring. */
  def kfoldSql(idExpr: String, k: Int): String =
    s"CAST(('0x'||substring(md5(CAST($idExpr AS VARCHAR)),1,4)) AS BIGINT) % $k"

  /** Deterministic negative sampling — the contrastive-pair generation step
    * (k pseudo-random "negative" partners per document, e.g. for embedding
    * or reranker training). The candidate for (id, i) is
    * `min_id + (md5₆₀(id:i:seed) mod (max_id − min_id + 1))` — the first 15
    * hex digits of the md5 read as an integer, mapped into the corpus's own
    * id RANGE. md5 because it is the one hash bit-identical in every engine
    * (same discipline as [[assign]]), so the identical pair set reproduces
    * in any engine, any task retry, any partitioning. The arithmetic is
    * overflow-free over the FULL long domain: the hash is < 2⁶⁰, the
    * modulus keeps it below the range width, and adding `min_id` lands
    * inside [min_id, max_id] — an earlier Knuth-multiplicative form wrapped
    * negative for ids ≳ 2³³ and silently emitted fewer than k negatives,
    * and an absolute (not range-relative) modulus could never reach a
    * dense id block sitting high in the long domain at all (PropertySpec
    * pins a block near 2⁶² emitting its full k·n pairs). Ranges wider than
    * 2⁶⁰ ids would truncate to the first 2⁶⁰ — re-key first (no real
    * corpus is within a millionfold of that) — and a span whose width
    * itself overflows long (> 2⁶³ ids, e.g. min_id < 0 with max_id near
    * 2⁶³) raises a plan-side error rather than silently under-emitting. Self-pairs are dropped;
    * candidates are semi-joined back to the id universe so sparse id
    * spaces never emit dangling references (for dense id blocks the join
    * is a no-op that AQE executes as a broadcast).
    *
    * Plan: one broadcast scalar row (min/max id), a row-local k-explode,
    * one semi-join — no shuffle on the corpus side beyond the join AQE
    * picks. The modulus keeps candidates uniform enough for negatives
    * (these are random partners, not cryptography); collisions across i
    * are possible and harmless (duplicate negatives are standard and can
    * be distinct'd by the caller).
    */
  def negativePairs(
      df: DataFrame, idCol: String, k: Int, seed: Long = 12345L): DataFrame = {
    require(k >= 1, "k must be positive")
    val bounds = df.agg(min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))
    val cand = df.select(col(idCol).as("doc_id"))
      .crossJoin(broadcast(bounds))
      .select(col("doc_id"),
        explode(sequence(lit(0L), lit((k - 1).toLong))).as("k_idx"),
        col("min_id"), col("max_id"))
      .select(col("doc_id"), col("k_idx"),
        (col("min_id") +
          conv(substring(md5(concat_ws(":",
              col("doc_id"), col("k_idx"), lit(seed))), 1, 15), 16, 10)
            .cast("long") %
          // id spans wider than the long domain overflow the width to a
          // NEGATIVE modulus, which would silently emit out-of-range
          // candidates the semi-join drops (fewer than k negatives) — fail
          // loudly instead. The guard rides the broadcast scalar row, so
          // the check is plan-side and costs one comparison per row.
          when(col("max_id") - col("min_id") + 1 > 0,
            col("max_id") - col("min_id") + 1)
            .otherwise(raise_error(concat(
              lit("negativePairs: id span max-min+1 overflows long (min_id="),
              col("min_id"), lit(", max_id="), col("max_id"), lit(")"))))).as("neg_id"))
      .filter(col("neg_id") =!= col("doc_id"))
    cand.join(df.select(col(idCol).as("neg_id")), Seq("neg_id"), "left_semi")
      .select(col("doc_id"), col("k_idx"), col("neg_id"))
  }

  /** The same candidate hash as SQL text, for oracle mirroring (the caller
    * adds the `min_id + … % range` mapping).
    */
  def negativeCandidateSql(idExpr: String, kExpr: String, seed: Long = 12345L): String =
    s"CAST(('0x'||substring(md5(CAST($idExpr AS VARCHAR)||':'||CAST($kExpr AS VARCHAR)||':$seed'),1,15)) AS BIGINT)"

  /** Training-mix rebalancing weights: given target mix shares per stratum
    * (language/source/domain), compute each stratum's sampling fraction —
    * the number that feeds [[stratifiedSample]] when retargeting a corpus
    * to a prescribed mix. `weight = min(1, target_share · total / count)`:
    * over-represented strata get a down-sampling fraction < 1,
    * under-represented ones cap at 1 (this operator never up-samples;
    * epoch repetition is a trainer policy, not a corpus cut). Strata
    * absent from `targets` get weight 0 (excluded from the mix).
    *
    * Emits (stratum, n_docs, corpus_frac, target_share, weight) with the
    * fractions as single divisions over exact integer counts (rounded to
    * 6), so the oracle compares bit-exact.
    *
    * Plan: one hash aggregation (stratum cardinality rows) + one broadcast
    * total — the output is stratum-sized, trivially small at any corpus
    * scale.
    */
  /** Token-budget EPOCH PLANNER — the data-constrained mixing table
    * (Muennighoff et al. 2023, "Scaling Data-Constrained Language
    * Models"): given a target mix, a per-stratum token-mass column, and a
    * total training-token budget, how many EPOCHS of each stratum does
    * the run consume? [[mixWeights]] caps its weight at 1 (down-sample
    * only); real pretraining REPEATS scarce high-quality strata, and the
    * repeat factor is the number every data-constrained run needs on the
    * table before training starts (epochs ≳ 4 ⇒ sharply diminishing
    * returns per the paper — `is_repeated` flags any stratum that cycles
    * at all).
    *
    * Integer-exact: shares enter as ppm, `target_tokens = budget·share
    * DIV 10⁶` and `epochs_ppm = target·10⁶ DIV n_tokens` both
    * DECIMAL(38,0)-fenced (a 10¹³-token budget × 10⁶ passes int64).
    * Strata absent from `sharesPpm` plan at share 0 (excluded — shown,
    * not dropped). One map-side-combined stratum agg, one broadcast CASE;
    * one output row per stratum at any corpus size.
    */
  def epochPlan(
      df: DataFrame, stratumCol: String, tokenCol: String,
      sharesPpm: Map[String, Long], budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0L, s"budgetTokens must be > 0: $budgetTokens")
    require(sharesPpm.values.forall(v => v >= 0L && v <= 1000000L),
      s"shares must be ppm in [0, 1e6]: $sharesPpm")
    require(sharesPpm.values.sum <= 1000000L,
      s"shares must sum to <= 1e6 ppm: ${sharesPpm.values.sum}")
    val shareCol = sharesPpm.toSeq.sortBy(_._1)
      .foldLeft(lit(0L)) { case (acc, (k, ppm)) =>
        when(col(stratumCol) === lit(k), lit(ppm)).otherwise(acc)
      }
    df.select(col(stratumCol), col(tokenCol).cast("long").as("_t"))
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("_t")).as("n_tokens"))
      .select(
        col(stratumCol),
        col("n_docs"),
        col("n_tokens"),
        shareCol.as("share_ppm"))
      .withColumn("target_tokens", expr(
        s"CAST((CAST($budgetTokens AS DECIMAL(38,0)) * share_ppm)" +
          " div 1000000 AS BIGINT)"))
      .withColumn("epochs_ppm",
        when(col("n_tokens") > 0L, expr(
          "CAST((CAST(target_tokens AS DECIMAL(38,0)) * 1000000)" +
            " div n_tokens AS BIGINT)")))
      .withColumn("is_repeated",
        coalesce(col("epochs_ppm") > 1000000L, lit(false)))
  }

  def mixWeights(
      df: DataFrame, stratumCol: String, targets: Map[String, Double]): DataFrame = {
    val targetCol = targets.toSeq.sortBy(_._1)
      .foldLeft(lit(0.0)) { case (acc, (k, share)) =>
        when(col(stratumCol) === lit(k), lit(share)).otherwise(acc)
      }
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_docs"))
    counts
      .crossJoin(broadcast(df.agg(count(lit(1)).as("n_total"))))
      .select(
        col(stratumCol),
        col("n_docs"),
        round(col("n_docs").cast("double") / col("n_total"), 6).as("corpus_frac"),
        targetCol.as("target_share"),
        round(
          least(
            lit(1.0),
            targetCol * col("n_total").cast("double") / col("n_docs")),
          6).as("weight"))
  }

  /** Temperature-smoothed sampling mix (the multilingual-pretraining
    * standard: Conneau et al. 2020 XLM-R §3.1 / Xue et al. 2021 mT5 §3.2):
    * instead of a hand-written target mix ([[mixWeights]]), the target is
    * DERIVED from the corpus itself — `q_i ∝ p_i^alpha` with `p_i` the
    * stratum's corpus share. `alpha = 1` keeps the natural mix; `alpha → 0`
    * approaches uniform; the usual 0.2–0.7 band up-weights tail languages
    * without letting head languages drown them.
    *
    * Emits (stratum, n_docs, p, q, sample_rate) where `sample_rate` is the
    * per-document inclusion probability realizing mix `q` under the
    * down-sample-only constraint (largest rate = 1 — the most up-weighted
    * stratum keeps everything; epoch repetition is a trainer policy, not a
    * corpus cut): `rate_i = (q_i/p_i) / max_j(q_j/p_j)`.
    *
    * Cross-engine determinism: `p` is one exact division; `pow(p, alpha)`
    * is rounded to 6 immediately (pow is the one libm call — both engines
    * agree far beyond 6 dp; every downstream value derives from the
    * ROUNDED powers), the normalizer is a DECIMAL sum, and each emitted
    * fraction is a single rounded division — the oracle replays the
    * identical rounding chain.
    *
    * Plan: ONE corpus scan — the stratum histogram (map-side combined)
    * is the only distributed work; the normalization chain runs as
    * driver math over the stratum-cardinality rows (the Lloyd's/BPE
    * bounded-global-decision pattern). The earlier all-DataFrame form
    * re-derived the corpus aggregation through every crossJoin branch —
    * four scans where one suffices. Stratum values are read as strings
    * (the [[mixWeights]] convention).
    */
  def temperatureMix(df: DataFrame, stratumCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val spark = df.sparkSession
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_docs"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val total = counts.map(_._2).sum.toDouble
    // p exact single division; pow rounded to 6 IMMEDIATELY (the one libm
    // call); z the exact decimal sum of the rounded powers — identical
    // arithmetic to the oracle's SQL chain, value for value
    val withPw = counts.map { case (k, n) =>
      (k, n, n / total, r6(math.pow(n / total, alpha)))
    }
    val z = withPw.map { case (_, _, _, pw) => BigDecimal(pw) }.sum.toDouble
    val withBoost = withPw.map { case (k, n, p, pw) =>
      val q = r6(pw / z)
      (k, n, p, q, q / p)
    }
    val maxBoost = withBoost.map(_._5).max
    val rows = withBoost.map { case (k, n, p, q, boost) =>
      (k, n, r6(p), q, r6(boost / maxBoost))
    }.toSeq
    import spark.implicits._
    rows.toDF(stratumCol, "n_docs", "p", "q", "sample_rate")
  }

  /** The same target-share CASE as SQL text, for oracle mirroring. */
  def mixTargetCaseSql(stratumExpr: String, targets: Map[String, Double]): String = {
    val whens = targets.toSeq.sortBy(_._1)
      .map { case (k, share) => s"WHEN $stratumExpr = '$k' THEN $share" }
      .mkString(" ")
    s"CASE $whens ELSE 0.0 END"
  }

  /** Token-budget sequence packing (greedy contiguous fill): within each
    * `partCol` stratum, walk rows in `orderCol` order and assign
    * `batch_id = (running-token-offset) div budget` — each batch is a
    * contiguous run of documents whose combined tokens fill ~one training
    * context budget (a document straddling the boundary belongs to the
    * batch it STARTS in, so batches can overshoot by one document — the
    * standard greedy approximation; exact bin packing is NP-hard and
    * inherently sequential).
    *
    * Scale: ONE TASK PER STRATUM — the window partitions by the stratum
    * alone, so a single task sorts and cumsums each stratum's entire
    * corpus. With ~20 language strata at 100 TB that is ~20 working tasks
    * and an English-sized straggler. This form is kept as the sequential
    * reference semantics (and for small strata); the scale path is
    * [[packBatchesSharded]], which reduces to this exactly at shards = 1.
    */
  def packBatches(
      df: DataFrame, partCol: String, orderCol: String, tokensCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol)).orderBy(col(orderCol))
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .withColumn("batch_id", expr(s"(cum_tokens - $tokensCol) div $budget"))
  }

  /** Shard-parallel sequence packing — the 100 TB form of [[packBatches]].
    * Two-level greedy fill:
    *
    *  1. each row is assigned a deterministic shard inside its stratum
    *     (`md5(orderCol)` first 4 hex digits mod `shards` — the same
    *     engine-portable, RNG-free hashing discipline as [[assign]]);
    *  2. the greedy cumsum window runs per (stratum, shard) — so the unit
    *     of sequential work is a shard, never a whole stratum, and the
    *     stage runs `strata × shards` parallel tasks;
    *  3. shard-local batch ids are made globally unique per stratum by
    *     adding a per-shard offset = total batches in all lower-numbered
    *     shards of the same stratum. The offsets come from a tiny
    *     aggregate (`strata × shards` rows) windowed on the driver-scale
    *     side and broadcast-joined back, so the big side sees exactly one
    *     hash exchange (the packing window's own).
    *
    * The per-batch budget guarantee is unchanged — every batch is a
    * contiguous run WITHIN ONE SHARD, overshooting by at most its one
    * straddling document — and batch ids remain contiguous from 0 within
    * each stratum. What two-level packing gives up is the single global
    * document order per stratum (documents are contiguous per shard, not
    * across shards), which is exactly the trade a distributed packer makes:
    * budget-bounded batches and full parallelism, order within shards.
    *
    * `shards = 1` degenerates to a single shard per stratum and reproduces
    * [[packBatches]]'s assignment bit-for-bit (pinned by PropertySpec).
    */
  def packBatchesSharded(
      df: DataFrame, partCol: String, orderCol: String, tokensCol: String,
      budget: Long, shards: Int): DataFrame = {
    require(budget >= 1, "budget must be positive")
    require(shards >= 1, "shards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol), col("pack_shard")).orderBy(col(orderCol))
    val local = df
      .withColumn("pack_shard",
        conv(substring(md5(col(orderCol).cast("string")), 1, 4), 16, 10)
          .cast("long") % shards)
      .withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .withColumn("local_batch", expr(s"(cum_tokens - $tokensCol) div $budget"))
    // Tiny side ([[ShardedFold.shardOffsets]]): batches per shard, then
    // the exclusive prefix sum over shard ids gives each shard its
    // stratum-global batch-id offset. contiguousKeys = false — every
    // stratum hash-spreads over ALL shards, so the straddler cut does
    // not apply; the broadcast-tiny contract is strata × shards rows.
    val offsets = ShardedFold.shardOffsets(local, Seq(partCol), "pack_shard",
      Seq((max(col("local_batch")) + 1L, "batch_offset")),
      contiguousKeys = false)
    local
      .join(broadcast(offsets),
        col("pack_shard") === col("_o_pack_shard") &&
          col(partCol) <=> col("_o_" + partCol), "left")
      .select(local.columns.map(col) :+ col("batch_offset"): _*)
      .withColumn("batch_id",
        coalesce(col("batch_offset"), lit(0L)) + col("local_batch"))
      .drop("local_batch", "batch_offset")
  }

  /** Packing-efficiency sweep — the seqlen decision table every packed
    * pre-training run reads before committing FLOPs: for each candidate
    * token budget, run the [[packBatchesSharded]] packer and emit ONE
    * summary row (batch count, capacity = n_batches·budget, fill ppm,
    * overshooting batches). Fill under ~900k ppm means the budget wastes
    * >10% of every forward pass on padding; overshoot counts how many
    * batches exceeded budget by their straddling document (the packer's
    * documented at-most-one-doc overshoot).
    *
    * Plan shape: one packing window pass per budget (each
    * strata × shards parallel, exactly the packer's own cost), each
    * collapsing through a two-level count/sum agg to a single row before
    * the 4-row union — the [[graft.operators.Similarity.nprobeSweep]]
    * sweep-spine discipline: the sweep costs |budgets| × one packing, and
    * nothing wide survives past the per-budget aggregate. Integer ppm
    * only; every step replays in the oracle.
    */
  def packEfficiencySweep(
      df: DataFrame, partCol: String, orderCol: String, tokensCol: String,
      budgets: Seq[Long], shards: Int): DataFrame = {
    require(budgets.nonEmpty && budgets.distinct == budgets,
      s"budgets must be non-empty and distinct, got $budgets")
    budgets.map { b =>
      packBatchesSharded(df, partCol, orderCol, tokensCol, b, shards)
        .groupBy(col(partCol), col("batch_id"))
        .agg(sum(col(tokensCol)).as("bt"))
        .agg(
          count(lit(1)).as("n_batches"),
          sum(col("bt")).as("sum_tokens"),
          sum(when(col("bt") > b, 1L).otherwise(0L)).as("n_overshoot"))
        .select(
          lit(b).as("budget"),
          col("n_batches"),
          (col("n_batches") * b).as("capacity"),
          col("sum_tokens"),
          // DECIMAL(38,0) carrier for the 1e6 scale-up: Long would
          // overflow past ~9.2e12 sum_tokens, and multi-trillion-token
          // corpora are exactly what this decision table is for (ANSI
          // mode would throw, not wrap — but the row must WORK there);
          // result ≤ ~2e6 ppm, so the final BIGINT cast is safe
          expr(s"CAST((CAST(sum_tokens AS DECIMAL(38,0)) * 1000000) div " +
            s"(CAST(n_batches AS DECIMAL(38,0)) * $b) AS BIGINT)").as("fill_ppm"),
          col("n_overshoot"))
    }.reduce(_.unionAll(_)).orderBy(col("budget"))
  }

  /** The same 4-hex md5 shard assignment as SQL text, for oracle mirroring. */
  def packShardSql(orderExpr: String, shards: Int): String =
    s"CAST(('0x'||substring(md5(CAST($orderExpr AS VARCHAR)),1,4)) AS BIGINT) % $shards"

  /** Deterministic weighted sampling without replacement (top-k by minimum
    * hash) — the quality-weighted corpus-cut step (sample k documents with
    * probability increasing in an integer weight, e.g. a quality score or
    * length bucket). The classic Efraimidis–Spirakis scheme ranks rows by
    * `u^(1/w)` with u uniform — but `pow`/`ln` on doubles are libm-version
    * territory and would make the sample engine- and platform-dependent.
    * This is the integer-exact variant: a row with weight w simulates w
    * independent md5 draws (`md5(id:i:seed)` for i < w) and keeps the
    * MINIMUM as its sort key; the k smallest keys win. A row with twice
    * the weight gets twice the draws, hence a stochastically smaller key —
    * the same monotone-in-weight selection, in pure string/integer math
    * that reproduces bit-for-bit in any engine (same discipline as
    * [[assign]]).
    *
    * Plan: the draws are a row-local `transform` + `array_min` over a
    * w-element generated array (no explode, no shuffle — weights are
    * required ≤ maxWeight so the generated array is bounded), and the
    * global top-k compiles to TakeOrderedAndProject: per-partition k-heaps
    * merged on the driver, never a full sort. 100 TB cost = one scan.
    */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: Column, k: Int,
      maxWeight: Int = 64, seed: Long = 12345L): DataFrame = {
    require(k >= 1, "k must be positive")
    require(maxWeight >= 1, "maxWeight must be positive")
    // weights outside [1, maxWeight] indicate a broken upstream score —
    // fail loudly (an unbounded weight would generate an unbounded array)
    val w = when(weightCol.between(1, maxWeight), weightCol.cast("long"))
      .otherwise(raise_error(concat(
        lit(s"weightedSample: weight out of [1, $maxWeight]: "), weightCol)))
    df.withColumn("weight", w)
      .withColumn("sample_key",
        array_min(transform(
          sequence(lit(0L), col("weight") - 1L),
          i => md5(concat_ws(":", col(idCol), i, lit(seed))))))
      .orderBy(col("sample_key"), col(idCol))
      .limit(k)
  }

  /** The same min-of-w-draws key as SQL text, for oracle mirroring. */
  def weightedKeySql(idExpr: String, weightExpr: String, seed: Long = 12345L): String =
    s"list_min(list_transform(generate_series(0, CAST($weightExpr AS BIGINT) - 1), " +
      s"i -> md5(CAST($idExpr AS VARCHAR)||':'||CAST(i AS VARCHAR)||':$seed')))"

  /** Deterministic global shuffle order — the epoch-ordering step (every
    * training run visits documents in a pseudo-random order that is a pure
    * function of (id, seed): reproducible across runs, engines, and
    * partitionings, re-drawable per epoch by changing the seed). Each row's
    * shuffle key is `md5(id:seed)`; the emitted `shuffle_pos` is the row's
    * rank in the global (key, id) order, 0-based and dense.
    *
    * A global rank is the textbook "needs one task" trap (a naive
    * `row_number() OVER (ORDER BY key)` windows the entire corpus in a
    * single partition). The scale form here is two-level, the same
    * discipline as [[packBatchesSharded]] but RANGE-sharded: the shard is
    * the key's leading byte bucket (`first 2 hex digits div (256/shards)`),
    * which is MONOTONE in the key (lowercase-hex lexicographic order IS
    * numeric order), so per-shard ranks + the count of all rows in
    * lower-numbered shards compose to exactly the global rank. md5 keys are
    * uniform, so the 256 buckets are balanced by construction — no skew
    * handling needed, unlike range-partitioning user data. Shard counts are
    * a tiny aggregate (≤ shards rows) windowed and broadcast back; the big
    * side sees exactly one hash exchange (the per-shard rank's own).
    */
  def globalOrder(
      df: DataFrame, idCol: String, seed: Long = 12345L, shards: Int = 32): DataFrame = {
    require(shards >= 1 && shards <= 256 && 256 % shards == 0,
      s"shards must divide 256, got $shards")
    val keyed = df
      .withColumn("shuffle_key", md5(concat_ws(":", col(idCol), lit(seed))))
      .withColumn("order_shard",
        (conv(substring(col("shuffle_key"), 1, 2), 16, 10).cast("long") /
          (256 / shards)).cast("long"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("order_shard")).orderBy(col("shuffle_key"), col(idCol))
    // Tiny side ([[ShardedFold.shardOffsets]]): rows per shard →
    // exclusive prefix sum = shard offset, ≤ `shards` rows.
    val offsets = ShardedFold.shardOffsets(keyed, Nil, "order_shard",
      Seq((count(lit(1)), "shard_offset")), contiguousKeys = false)
    val ranked = keyed
      .withColumn("local_rank", row_number().over(wRank).cast("long") - 1L)
    ranked
      .join(broadcast(offsets),
        col("order_shard") === col("_o_order_shard"), "left")
      .select(ranked.columns.map(col) :+ col("shard_offset"): _*)
      .withColumn("shuffle_pos",
        coalesce(col("shard_offset"), lit(0L)) + col("local_rank"))
      .drop("order_shard", "local_rank", "shard_offset")
  }

  /** The same shuffle key as SQL text, for oracle mirroring (the oracle
    * ranks with a single global window — tiny at oracle scale).
    */
  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw document
    * by how much its hashed bag-of-words distribution looks like a TARGET
    * corpus rather than the raw corpus — log weight = Σ over the doc's
    * tokens of ln p̂_target(bucket) − ln p̂_raw(bucket), with Laplace
    * smoothing (+1 per bucket, +dims on the total). High-weight docs are
    * the ones importance resampling keeps when curating toward the
    * target mix.
    *
    * Scale shape: both distributions are `dims`-row aggregates collected
    * to the driver and folded back in as LITERAL maps (the Lloyd's/BPE
    * global-decision pattern — dims ≤ a few thousand, a broadcast-scalar
    * amount of state), so scoring is a ROW-LOCAL higher-order fold over
    * each doc's token array: the raw corpus never exchanges, never
    * explodes, and the pass is one narrow scan at any corpus size.
    *
    * Cross-engine determinism (the [[graft.operators.TextAnalysis.lmScore]]
    * discipline): bucket counts are exact integers via the shared md5
    * feature hash; each token's contribution rounds its two lns to 6 dp;
    * per-doc contributions decimal-sum (exact, order-free) and round once
    * at the edge.
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, dims: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(dims >= 2, s"dims must be >= 2, got $dims")
    val bucket = (t: Column) =>
      conv(substring(md5(t), 1, 4), 16, 10).cast("long") % dims
    def counts(df: DataFrame): Map[Long, Long] = df
      .select(explode(split(lower(col(textCol)), " ")).as("t"))
      .select(bucket(col("t")).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (cntT, cntR) = (counts(target), counts(raw))
    val (totT, totR) = (cntT.values.sum + dims, cntR.values.sum + dims)
    val mapT = typedLit(cntT)
    val mapR = typedLit(cntR)
    val contrib = (t: Column) => {
      val b = bucket(t)
      round(
        round(log((coalesce(element_at(mapT, b), lit(0L)) + lit(1.0)) / totT), 6) -
          round(log((coalesce(element_at(mapR, b), lit(0L)) + lit(1.0)) / totR), 6),
        6)
    }
    raw.select(col(idCol),
        split(lower(col(textCol)), " ").as("ws"))
      .select(col(idCol),
        size(col("ws")).cast("long").as("n_tokens"),
        round(
          aggregate(col("ws"),
            lit(BigDecimal(0)).cast(DecimalType(28, 12)),
            // re-cast per step: decimal + widens precision, but aggregate's
            // merge must return the zero element's exact type
            (acc, t) => (acc + contrib(t).cast(DecimalType(28, 12)))
              .cast(DecimalType(28, 12)))
            .cast("double"),
          6).as("log_weight"))
  }

  def shuffleKeySql(idExpr: String, seed: Long = 12345L): String =
    s"md5(CAST($idExpr AS VARCHAR)||':$seed')"

  /** Deterministic FIXED-SIZE per-stratum sample — the "k docs per
    * language/source for eval or inspection" step. [[stratifiedSample]]
    * keeps a FRACTION per stratum; this keeps exactly `min(k, |stratum|)`
    * rows: the k smallest `md5(id:seed)` keys within each stratum (a
    * reservoir sample's distribution, but a pure function of (id, seed) —
    * stable across runs, engines, partitionings, and retries, re-drawable
    * per epoch by changing the seed).
    *
    * Scale shape: the declarative form —
    * `row_number() OVER (PARTITION BY stratum ORDER BY key)` — sorts every
    * stratum's ENTIRE history inside one task (a 70%-of-corpus language is
    * tens of TB in one unsplittable window partition; the
    * [[graft.operators.TextAnalysis.ccnetBuckets]] hazard). This uses the
    * [[graft.plans.TopKPerKey]] physical operator (O(n log k) bounded
    * heaps) TWO-LEVEL: level 1 takes top-k per (stratum, shard) — the
    * md5-uniform shard splits a hot stratum `shards` ways — and level 2
    * merges the ≤ shards·k survivors per stratum. Top-k is a mergeable
    * aggregate (merging per-shard top-k heaps yields exactly the global
    * top-k under the total (key, id) order), so the output is
    * bit-identical to shards = 1 while no task ever holds more than a
    * heap. The oracle replays the single window form — tiny at oracle
    * scale — and the EngineSpec pins shards-invariance.
    */
  def samplePerStratum(
      df: DataFrame, idCol: String, stratumCol: String, k: Int,
      shards: Int = 1, seed: Long = 12345L): DataFrame = {
    require(k >= 1, "k must be positive")
    val keyed = df.withColumn("sample_key",
      md5(concat_ws(":", col(idCol), lit(seed))))
    topKPerStratum(keyed, idCol, stratumCol, k, shards)
  }

  /** The shared two-level bounded-heap selection: top `k` per stratum by
    * (`sample_key`, id) — directly at shards = 1, or per (stratum,
    * md5-uniform shard) then merged (bit-identical: top-k under a total
    * order is mergeable, see [[samplePerStratum]]).
    */
  private def topKPerStratum(
      keyed: DataFrame, idCol: String, stratumCol: String,
      k: Int, shards: Int): DataFrame = {
    require(shards >= 1 && shards <= 256, s"shards must be in [1,256], got $shards")
    val order = Seq(("sample_key", true), (idCol, true))
    if (shards == 1) {
      graft.plans.TopK.perKey(keyed, Seq(stratumCol), order, k)
    } else {
      val sharded = keyed.withColumn("sample_shard",
        (conv(substring(col("sample_key"), 1, 2), 16, 10).cast("long") % shards))
      val level1 = graft.plans.TopK.perKey(
        sharded, Seq(stratumCol, "sample_shard"), order, k)
      graft.plans.TopK.perKey(
        level1.drop("sample_shard"), Seq(stratumCol), order, k)
    }
  }

  /** WEIGHTED sampling without replacement, PER STRATUM — the
    * quality-weighted "k docs per language/source" cut: within each
    * stratum, higher-weight rows win proportionally more often
    * ([[weightedSample]]'s integer-exact Efraimidis–Spirakis rule: a
    * weight-w row's key is the MIN of w md5 draws), and exactly
    * `min(k, |stratum|)` rows survive per stratum. The same engine-portable
    * determinism contract as both parents: keys are pure functions of
    * (id, seed), draws are a bounded row-local `transform`+`array_min`,
    * out-of-bounds weights `raise_error` loudly.
    *
    * Scale shape: [[weightedSample]]'s global TakeOrderedAndProject cannot
    * key by stratum, and the per-stratum window sorts a hot stratum in one
    * task — so this rides [[samplePerStratum]]'s two-level `TopKPerKey`
    * merge (bit-identical at any shard count, bounded heaps throughout).
    */
  /** Effective sample size of an importance-weighted frame (Kish 1965;
    * the diagnostic every reweighted-training recipe — [[dsirWeights]],
    * the dedup-reweighted [[weightedSample]] — should ship):
    * ESS = (Σw)²/Σw² collapses toward 1 when a few rows carry all the
    * weight, i.e. the "1M-example dataset" is effectively a handful of
    * documents. Emitted per key as `ess_e3` (ESS in milli-units) and
    * `ess_ratio_ppm` = 10⁶·ESS/n — the fraction of the nominal sample
    * that is real.
    *
    * Integer contract: `wCol` is an exact non-negative long
    * (decimal-scaled upstream). (Σw)² needs the DECIMAL(38,0) carrier
    * (Σw up to ~10¹⁵ squares past int64 — the chiSquareAudit fence);
    * `div` on decimals still emits BIGINT. One map-side-combined keyed
    * agg; no window, no join.
    */
  def effectiveSampleSize(df: DataFrame, keyCols: Seq[String],
      wCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(wCol)).as("sum_w"),
        sum(col(wCol) * col(wCol)).as("sum_w2"))
      .withColumn("ess_e3",
        when(col("sum_w2") > 0L, expr(
          "(CAST(1000 AS DECIMAL(38,0)) * CAST(sum_w AS DECIMAL(38,0)) * CAST(sum_w AS DECIMAL(38,0))) div CAST(sum_w2 AS DECIMAL(38,0))")))
      .withColumn("ess_ratio_ppm",
        when(col("sum_w2") > 0L, expr(
          "(CAST(1000000 AS DECIMAL(38,0)) * CAST(sum_w AS DECIMAL(38,0)) * CAST(sum_w AS DECIMAL(38,0))) div (CAST(n AS DECIMAL(38,0)) * CAST(sum_w2 AS DECIMAL(38,0)))")))
  }

  def weightedSamplePerStratum(
      df: DataFrame, idCol: String, stratumCol: String, weightCol: Column,
      k: Int, maxWeight: Int = 64, shards: Int = 1,
      seed: Long = 12345L): DataFrame = {
    require(k >= 1, "k must be positive")
    require(maxWeight >= 1, "maxWeight must be positive")
    val w = when(weightCol.between(1, maxWeight), weightCol.cast("long"))
      .otherwise(raise_error(concat(
        lit(s"weightedSamplePerStratum: weight out of [1, $maxWeight]: "), weightCol)))
    val keyed = df.withColumn("weight", w)
      .withColumn("sample_key",
        array_min(transform(
          sequence(lit(0L), col("weight") - 1L),
          i => md5(concat_ws(":", col(idCol), i, lit(seed))))))
    topKPerStratum(keyed, idCol, stratumCol, k, shards)
  }

  /** Temporal train/test split with an EMBARGO gap — the leakage-safe
    * split for time-ordered data: train strictly before `cutDay`, test
    * at or after `cutDay + embargoDays`, and the gap rows LABELED
    * `embargo` rather than silently dropped (the row the audit counts).
    * The embargo is what keeps boundary-spanning influence — session
    * tails, delayed labels, documents revised across the cut — from
    * leaking future into train; a bare timestamp cut does not.
    * Row-local CASE over the day index; rides the scan, zero shuffle.
    */
  def timeSplit(df: DataFrame, cutDay: Long, embargoDays: Long,
      tsCol: String = "ts_us"): DataFrame = {
    require(embargoDays >= 0, s"embargoDays must be >= 0: $embargoDays")
    val day = expr(s"$tsCol DIV 86400000000L")
    df.withColumn("split",
      when(day < cutDay, "train")
        .when(day >= cutDay + embargoDays, "test")
        .otherwise("embargo"))
  }
}
