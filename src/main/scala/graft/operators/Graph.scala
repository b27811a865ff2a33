package graft.operators

import org.apache.spark.sql.DataFrame
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
    val e = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // one bounded global: the node count rides a broadcast 1-row frame;
    // the uniform start and teleport base are rounded IN ENGINE so both
    // engines run the identical ROUND, never a driver-formatted literal
    val nDf = deg.agg(count(lit(1)).as("n"))
    var r = deg.crossJoin(broadcast(nDf))
      .select(col("src").as("node"), round(lit(1.0) / col("n"), 12).as("r"))
    for (_ <- 1 to iters) {
      r = e.join(r, e("src") === r("node"))
        .join(deg, "src")
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
}
