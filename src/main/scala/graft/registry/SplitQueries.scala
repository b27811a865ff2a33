package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Assoc, Dedup, DiskUsageOp, Graph, Hygiene, Joins, Layout, Multimodal, Similarity, Splits, Temporal, TextAnalysis}
import graft.SparkEntry._

/** split/sampling/mixing rows — mechanically split out of the monolithic SparkEntry registry
  * (it had passed 10k lines); entry bodies and oracle SQL are unchanged,
  * shared helpers stay on [[graft.SparkEntry]]. The CoreSpec source
  * tripwire scans every file in this package.
  */
private[graft] object SplitQueries {
  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

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
    "split_pack_efficiency" -> ((s, dir) =>
      // the seqlen decision table: fill ppm + overshoot count per
      // candidate token budget, each arm one packer pass collapsed to a
      // single row before the union (nprobeSweep's sweep-spine shape)
      Splits.packEfficiencySweep(
          t(s, dir, "documents")
            .select(col("doc_id"), col("lang"),
              size(split(lower(col("text")), " ")).cast("long").as("n_tokens")),
          "lang", "doc_id", "n_tokens",
          budgets = Seq(512L, 1024L, 2048L, 4096L), shards = 8)),
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
    "split_target_encode" -> ((s, dir) =>
      // leave-one-out target encoding (Micci-Barreca 2001): category agg
      // joined back row-local, own row excluded — integer micro-units,
      // singletons NULL; sampled to keep the registry row small
      Splits.looTargetEncode(
          t(s, dir, "events").filter(col("event_id") % 20 === 0),
          "event_type", "value", "event_id")
        .orderBy(col("event_id"))),
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
  )

  val oracles: Seq[(String, String)] = Seq(
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
    "split_pack_efficiency" -> {
      // one packing CTE chain per budget (same replay as
      // split_pack_batches), each collapsed to its one summary row
      def arm(b: Long) =
        s"""c$b AS (
           |  SELECT lang, shard, n_tokens,
           |         SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM d),
           |lb$b AS (
           |  SELECT lang, shard, n_tokens, (cum - n_tokens) // $b AS local_batch
           |  FROM c$b),
           |offs$b AS (
           |  SELECT lang, shard,
           |         COALESCE(SUM(MAX(local_batch) + 1) OVER (PARTITION BY lang
           |           ORDER BY shard ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           |           0) AS batch_offset
           |  FROM lb$b GROUP BY lang, shard),
           |bt$b AS (
           |  SELECT lb.lang, o.batch_offset + lb.local_batch AS batch_id,
           |         SUM(lb.n_tokens) AS bt
           |  FROM lb$b lb JOIN offs$b o ON lb.lang = o.lang AND lb.shard = o.shard
           |  GROUP BY 1, 2),
           |s$b AS (
           |  SELECT CAST($b AS BIGINT) AS budget,
           |         CAST(COUNT(*) AS BIGINT) AS n_batches,
           |         CAST(COUNT(*) * $b AS BIGINT) AS capacity,
           |         CAST(SUM(bt) AS BIGINT) AS sum_tokens,
           |         CAST((1000000 * CAST(SUM(bt) AS HUGEINT)) // (COUNT(*) * $b) AS BIGINT) AS fill_ppm,
           |         CAST(SUM(CASE WHEN bt > $b THEN 1 ELSE 0 END) AS BIGINT) AS n_overshoot
           |  FROM bt$b)""".stripMargin
      val budgets = Seq(512L, 1024L, 2048L, 4096L)
      s"""WITH d AS (
         |  SELECT doc_id, lang,
         |         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
         |         ${graft.operators.Splits.packShardSql("doc_id", 8)} AS shard
         |  FROM documents),
         |${budgets.map(arm).mkString(",\n")}
         |${budgets.map(b => s"SELECT * FROM s$b").mkString(" UNION ALL ")}
         |ORDER BY budget""".stripMargin
    },
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
  )
}
