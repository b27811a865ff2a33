package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus preparation — the composed form of the operator
  * library, i.e. what a training-data pipeline actually runs:
  *
  *   documents → near-dup removal (exact-verified n-gram Jaccard)
  *             → quality filter
  *             → deterministic train/val/test assignment
  *
  * Each stage is one of the already-verified operators; the composition is
  * itself registered as an oracle-checked query (`pipeline_prep`), so the
  * whole flow — not just its pieces — is held to the correctness gate.
  * Plan shape: the dedup banded-LSH join and the quality scan share the
  * document read; split assignment and scoring are row-local; one final
  * broadcast anti-join removes the dropped ids.
  *
  * The dedup stage rides [[Dedup.minhashLshPairs]] — the bucketed 100 TB
  * path (candidates ∝ band-bucket collisions, never all-pairs) — NOT the
  * exact quadratic n-gram self-join. At the default band/row parameters the
  * LSH output is proven equal to the exact operator's on the fixtures
  * (EngineSpec "LSH minhash pairs == exact ngram pairs"), so the pipeline's
  * DuckDB oracle remains the exact-Jaccard formulation.
  */
object Pipeline {

  def prepareCorpus(
      docs: DataFrame,
      dedupTau: Double = 0.6,
      minQuality: Double = 0.55,
      splits: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val deduped = Dedup.survivors(
      docs, Dedup.minhashLshPairs(docs, idCol, textCol, n = 3, tau = dedupTau), idCol)
    val scored = TextAnalysis.qualityScore(deduped, idCol, textCol)
      .filter(col("quality_score") >= minQuality)
    Splits.assign(scored, idCol, splits)
      .join(docs.select(col(idCol), col("lang")), idCol)
      .select(col(idCol), col("split"), col("lang"), col("n_tokens"), col("quality_score"))
  }
}
