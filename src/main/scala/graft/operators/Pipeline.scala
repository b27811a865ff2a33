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
  * exact quadratic n-gram self-join. LSH recall is probabilistic in
  * principle, and the DuckDB oracle is the exact-Jaccard formulation, so
  * the default banding is sized for negligible loss at the tau boundary
  * (32 bands × 2 rows ⇒ P[miss | J = tau = 0.6] ≈ 6·10⁻⁷ per pair — see
  * the [[Dedup.minhashLshPairs]] scaladoc), and equality with the exact
  * operator is additionally asserted on the fixtures (EngineSpec "LSH
  * minhash pairs == exact ngram pairs"). Callers that need recall to be
  * CERTAIN rather than overwhelmingly probable — e.g. a small corpus where
  * the quadratic join is affordable and auditability beats throughput —
  * opt into the exact path with `exactDedup = true`; both paths share the
  * same exact-verification semantics, so the flag never loosens precision.
  */
object Pipeline {

  /** `precomputedPairs`: an already-materialized near-dup pair frame
    * (doc_a, doc_b) to use instead of deriving one here — the shared-
    * artifact seam: a sweep that has already built the LSH pair set for
    * its dedup rows feeds the SAME frame to the composed pipeline rather
    * than paying a second banding pass. The caller owns the contract
    * that the frame came from the same (docs, n, tau) parameters.
    */
  def prepareCorpus(
      docs: DataFrame,
      dedupTau: Double = 0.6,
      minQuality: Double = 0.55,
      splits: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      idCol: String = "doc_id",
      textCol: String = "text",
      exactDedup: Boolean = false,
      precomputedPairs: Option[DataFrame] = None): DataFrame = {
    val pairs = precomputedPairs.getOrElse {
      if (exactDedup) Dedup.ngramJaccardPairs(docs, idCol, textCol, n = 3, tau = dedupTau)
      else Dedup.minhashLshPairs(docs, idCol, textCol, n = 3, tau = dedupTau)
    }
    val deduped = Dedup.survivors(docs, pairs, idCol)
    val scored = TextAnalysis.qualityScore(deduped, idCol, textCol)
      .filter(col("quality_score") >= minQuality)
    Splits.assign(scored, idCol, splits)
      .join(docs.select(col(idCol), col("lang")), idCol)
      .select(col(idCol), col("split"), col("lang"), col("n_tokens"), col("quality_score"))
  }
}
