package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Persisted near-dup index — the build-once / probe-daily artifact
  * around [[Dedup.minhashLshPairs]]'s internals, completing the artifact
  * trilogy ([[TextIndex]]: lexical retrieval, [[AnnIndex]]: semantic
  * search, this: dedup).
  *
  * The artifact is two parquet tables under one directory:
  *   - `bands/` — (id, sig, band) banded minhash signatures,
  *     PARTITIONED BY `band` (the probe joins band-to-band, so each
  *     band's candidates co-read one directory);
  *   - `sets/` — (id, hs) sorted shingle-hash sets, read
  *     candidate-bounded by the verify join.
  *
  * Why this exists at 100 TB: the expensive half of minhash dedup is
  * shingling + hashing + signing the CORPUS — O(total tokens). A daily
  * ingest that re-runs [[Dedup.minhashLshPairs]] over corpus ∪ delta
  * pays that for the whole corpus every day; probing this index pays it
  * for the DELTA only, and the candidate join touches band-bucket
  * collisions, not the corpus. [[probe]] is oracle-pinned to emit
  * exactly the cross pairs a full batch run would.
  *
  * Same frozen-artifact stance as [[AnnIndex.append]]: [[append]] grows
  * the index under the SAME shingle/hash/band parameters (they are
  * structural, not trained — no drift to monitor); ids must be unique
  * across build ∪ appends ∪ probes, the usual ingest contract.
  */
object DedupIndex {

  /** Shingle, sign, and persist the corpus index. Deterministic: same
    * corpus + params → byte-identical artifact content.
    */
  def build(docs: DataFrame, dir: String,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, bands: Int = 32, rows: Int = 2): Unit = {
    val (banded, sets) = Dedup.bandedSignatures(docs, idCol, textCol, n, bands, rows)
    // cluster by band before the partitioned write: a dynamic-partition
    // write from P input partitions opens up to P files under EVERY band
    // directory (P × bands tiny files — the guide §6 small-files trap;
    // measured 2.9× on the probe row once the signature stage ran at
    // full parallelism), while one narrow keyed exchange writes each
    // band's rows contiguously
    banded.repartition(col("band"))
      .write.partitionBy("band").mode("overwrite").parquet(s"$dir/bands")
    sets.write.mode("overwrite").parquet(s"$dir/sets")
  }

  /** Append new documents to an existing index — the nightly-growth path
    * (shingle only the delta; dynamic partition append touches each band
    * directory once).
    */
  def append(spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, bands: Int = 32, rows: Int = 2): Unit = {
    val (banded, sets) = Dedup.bandedSignatures(docs, idCol, textCol, n, bands, rows)
    // same band-clustered layout as [[build]] — each append touches each
    // band directory once, not once per input partition
    banded.repartition(col("band"))
      .write.partitionBy("band").mode("append").parquet(s"$dir/bands")
    sets.write.mode("append").parquet(s"$dir/sets")
  }

  /** The loaded artifact: `bands` (id, sig, band) and `sets` (id, hs). */
  final case class Loaded(bands: DataFrame, sets: DataFrame)

  def load(spark: SparkSession, dir: String): Loaded =
    Loaded(
      spark.read.parquet(s"$dir/bands"),
      spark.read.parquet(s"$dir/sets"))

  /** Near-dup pairs between NEW documents and the indexed corpus:
    * shingle/sign the delta, collide its bands against the artifact,
    * verify candidates with exact Jaccard — (doc_a = delta id, doc_b =
    * indexed id, jaccard ≥ tau). Only the delta is ever shingled; the
    * corpus side contributes pre-computed signatures and
    * candidate-bounded set rows. Delta-internal duplicates are the
    * caller's (tiny) [[Dedup.minhashLshPairs]] run over the delta; ids
    * must not overlap the index's.
    *
    * `n`/`bands`/`rows` must match the build's — they are the index's
    * structural geometry.
    */
  def probe(index: Loaded, newDocs: DataFrame, tau: Double = 0.6,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, bands: Int = 32, rows: Int = 2): DataFrame = {
    val (dBanded, dSets) = Dedup.bandedSignatures(newDocs, idCol, textCol, n, bands, rows)
    val cand = dBanded.as("l")
      .join(index.bands.as("r"),
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
          col("l.id") =!= col("r.id"))
      .select(col("l.id").as("doc_a"), col("r.id").as("doc_b"))
      .distinct()
    Dedup.jaccardOverSets(cand, dSets, index.sets, tau)
  }
}
