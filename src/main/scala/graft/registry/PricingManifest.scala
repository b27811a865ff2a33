package graft.registry

/** Machine-checkable pricing-row manifest for the shared-artifact memo
  * cache ([[graft.SparkEntry.memoFrame]] / `memoModel` / the bespoke
  * `bpeMergeCache`).
  *
  * THE CONVENTION (previously scaladoc prose only — r17 verdict task 4
  * made it a datum): when several registry rows describe derivations of
  * one expensive build, the build is memoized once per (session, dir)
  * and the rows split into
  *
  *  - at most ONE *pricing row* (`pricedBy = Some(row)`): a row that
  *    re-derives the underlying build DIRECTLY, bypassing the memo, so
  *    its bench median prices the build on every iteration. Without it
  *    the build cost would be invisible to the per-row medians (the
  *    round-robin bench pays a first-build exactly once per process, a
  *    cost the 3-sample median then rejects);
  *  - *serving rows* (`servedBy`): rows that read the memo. Their bench
  *    medians price ONLY their own downstream work — by design, that is
  *    the serve-side cost a production deployment would pay;
  *  - `pricedBy = None`: first-build-amortized artifacts. These are
  *    cheap shared inputs (edge lists, degree tables, trained models
  *    whose serve rows are what the registry grades); the one-time build
  *    shows up only in iteration-1 samples of whichever consumer runs
  *    first (visible in the bench's raw `iters` arrays, rejected by the
  *    median). An artifact may be `None` only with a `note` saying where
  *    the build's cost story lives.
  *
  * Correctness can never hide behind sharing: every row's DuckDB oracle
  * re-derives EVERYTHING independently, so a parity break in a shared
  * artifact fails every consumer row's hash, not just the builder's.
  *
  * The CoreSpec tripwire ("pricing manifest tripwire") keeps this map
  * honest against the SOURCE: it scans `SparkEntry.scala` for the memo
  * names actually registered and the registry sources for which rows
  * mention each accessor, then asserts (a) every memo name is listed
  * here, (b) the declared `servedBy` sets equal the scanned consumers,
  * and (c) a declared pricing row never touches its accessor. A reroute
  * that forgets this manifest, or a pricing row that silently starts
  * serving the cache, fails the suite.
  */
object PricingManifest {

  /** @param accessor  the `SparkEntry` accessor method whose body holds
    *                  the `memoFrame`/`memoModel` call (what consumers
    *                  reference; what the tripwire scans registry files
    *                  for)
    * @param pricedBy  the one registry row re-deriving the build without
    *                  the memo; None = first-build-amortized (see note)
    * @param servedBy  registry rows reading the memo (scanned-source
    *                  truth; comment mentions count — a pricing row must
    *                  not even name the accessor)
    * @param feeds     OTHER artifacts built from this one (cost nesting,
    *                  documentation only)
    */
  final case class ArtifactPricing(
      accessor: String,
      pricedBy: Option[String],
      servedBy: Set[String],
      feeds: Set[String] = Set.empty,
      note: String = "")

  val artifacts: Map[String, ArtifactPricing] = Map(
    // ------------------------------------------------- dedup pair sets
    "lshPairs" -> ArtifactPricing(
      accessor = "lshPairs",
      pricedBy = Some("dedup_minhash_lsh"),
      servedBy = Set("dedup_survivors", "dedup_stats",
        "dedup_components_incremental", "pipeline_prep"),
      feeds = Set("lshComponents")),
    "lshComponents" -> ArtifactPricing(
      accessor = "lshComponents",
      pricedBy = None,
      servedBy = Set("dedup_components", "dedup_best_rep",
        "split_cluster_assign", "split_dedup_reweighted"),
      note = "components fixpoint over the already-priced lshPairs; the " +
        "fixpoint loop itself is force-path-tested and ScaleSmoke-priced"),
    "ngramTruth" -> ArtifactPricing(
      accessor = "ngramTruthArt",
      pricedBy = Some("dedup_ngram_jaccard"),
      servedBy = Set("dedup_simhash_recall")),
    "simhashPairs" -> ArtifactPricing(
      accessor = "simhashPairsArt",
      pricedBy = Some("dedup_simhash"),
      servedBy = Set("dedup_simhash_collapse", "dedup_simhash_recall"),
      note = "pricing row runs the DIRECT (collapseExactDups=false) plan " +
        "of the same exact-verified pair semantics; the artifact holds " +
        "the collapse-path default"),
    "simhashSig" -> ArtifactPricing(
      accessor = "simhashSigArt",
      pricedBy = Some("dedup_simhash"),
      servedBy = Set("dedup_block_skew"),
      note = "pricing row re-derives the identical raw-corpus fingerprints " +
        "inside its own direct chain every iteration (the bruteTruth3 " +
        "'the scan is the cost' convention)"),
    "semDedup" -> ArtifactPricing(
      accessor = "semDedupArt",
      pricedBy = Some("dedup_semantic"),
      servedBy = Set("dedup_semantic_rep", "q_crossmodal_agreement")),
    // ------------------------------------------------------------- ANN
    "cents_k4_i2" -> ArtifactPricing(
      accessor = "coarseCents4",
      pricedBy = None,
      servedBy = Set("ann_ivf_trained_topk", "ann_nprobe_sweep",
        "ann_recall_eval", "dedup_semantic_contamination"),
      feeds = Set("pq_i2_f1.0", "pq_i2_f0.5"),
      note = "Lloyd's training is deterministic and every consumer's " +
        "oracle replays it; ann_ivf_topk prices the untrained IVF plan"),
    "pq_i2_f1.0" -> ArtifactPricing(
      accessor = "pqModel2",
      pricedBy = None,
      servedBy = Set("ann_ivfpq_topk", "ann_recall_eval_pq",
        "ann_ivfpq_sampled"),
      feeds = Set("pq_codes_f1.0"),
      note = "trainFrac keys the memo: f1.0 serves ann_ivfpq_topk + " +
        "ann_recall_eval_pq, f0.5 serves ann_ivfpq_sampled (scanned " +
        "together under one accessor)"),
    "pq_codes_f1.0" -> ArtifactPricing(
      accessor = "pqCodes",
      pricedBy = None,
      servedBy = Set("ann_ivfpq_topk", "ann_recall_eval_pq",
        "ann_ivfpq_sampled"),
      note = "encode-once/serve-many IS the operator's scale story; the " +
        "per-frac first consumer pays its encode in iteration 1"),
    "prepared_emb" -> ArtifactPricing(
      accessor = "preparedEmb",
      pricedBy = None,
      servedBy = Set("ann_ivfpq_topk", "ann_recall_eval_pq",
        "ann_ivfpq_sampled"),
      note = "narrow (id, v, nrm) projection — build is one scan, " +
        "cheaper than any consumer's own work"),
    "bandedKnn4" -> ArtifactPricing(
      accessor = "bandedKnn4",
      pricedBy = None,
      servedBy = Set("ann_knn_graph", "ann_label_noise"),
      note = "the banded candidate-join machinery is priced by " +
        "ann_lsh_topk at its own parameterization"),
    "bruteTruth3" -> ArtifactPricing(
      accessor = "bruteTruth3",
      pricedBy = Some("ann_cosine_topk"),
      servedBy = Set("ann_recall_eval", "ann_recall_eval_lsh",
        "ann_recall_eval_binary", "ann_recall_eval_binary_banded",
        "ann_matryoshka_recall", "ann_rp_recall"),
      note = "pricing row runs the same brute queriesxcorpus scan at its " +
        "own k (the scan, not the k, is the cost)"),
    "mmrFedPicks" -> ArtifactPricing(
      accessor = "mmrFedPicks",
      pricedBy = None,
      servedBy = Set("ann_mmr_rerank_lsh", "ann_mmr_recall"),
      note = "the MMR greedy machinery is priced by ann_mmr_rerank " +
        "(brute chain) at the same parameterization"),
    // ------------------------------------------------------------ text
    "bm25Lex10" -> ArtifactPricing(
      accessor = "bm25Lex10",
      pricedBy = Some("text_bm25_topk"),
      servedBy = Set("ret_rrf_fusion", "ret_eval")),
    "collocations" -> ArtifactPricing(
      accessor = "collocationsArt",
      pricedBy = None,
      servedBy = Set("text_collocations", "text_textrank"),
      note = "text_collocations publishes the table itself — its output " +
        "IS the artifact, so a bypass copy would price a duplicate of " +
        "what the row already emits"),
    "bpeMerges" -> ArtifactPricing(
      accessor = "bpeMerges",
      pricedBy = None,
      servedBy = Set("text_bpe_vocab", "text_bpe_encode", "text_fertility"),
      note = "train-once/apply-everywhere is the operator's own scale " +
        "story (bespoke driver-side cache; text_bpe_vocab publishes the " +
        "merge table)"),
    "bpeMergesSampled" -> ArtifactPricing(
      accessor = "bpeMergesSampled",
      pricedBy = Some("text_bpe_sampled"),
      servedBy = Set("text_fertility_sampled")),
    // ----------------------------------------------------------- graph
    "incidenceEdges" -> ArtifactPricing(
      accessor = "incidenceEdges",
      pricedBy = None,
      servedBy = Set("q_hits", "q_neighbor_jaccard", "q_modularity",
        "q_degree_assortativity"),
      feeds = Set("prEdges", "lpa"),
      note = "one lineitem projection + distinct — cheaper than any " +
        "consumer's first exchange"),
    "partCoEdges" -> ArtifactPricing(
      accessor = "partCoEdges",
      pricedBy = None,
      servedBy = Set("q_kcore", "q_recursive_bfs"),
      feeds = Set("coDeg", "triCounts"),
      note = "the order-keyed co-occurrence self-join; q_triangle_counts' " +
        "family serves its derivatives — the build lands in iteration-1 " +
        "samples of the first graph row"),
    "coDeg" -> ArtifactPricing(
      accessor = "coDeg",
      pricedBy = None,
      servedBy = Set("q_clustering_coeff"),
      feeds = Set("triCounts"),
      note = "one degree pass over partCoEdges"),
    "triCounts" -> ArtifactPricing(
      accessor = "triCounts",
      pricedBy = None,
      servedBy = Set("q_triangle_counts", "q_clustering_coeff"),
      note = "q_triangle_counts publishes the census itself — its output " +
        "IS the artifact"),
    "prEdges" -> ArtifactPricing(
      accessor = "prEdges",
      pricedBy = None,
      servedBy = Set("q_pagerank", "q_ppr"),
      feeds = Set("prDeg"),
      note = "degree-annotated edge frame; |E|-row degree join"),
    "prDeg" -> ArtifactPricing(
      accessor = "prDeg",
      pricedBy = None,
      servedBy = Set("q_pagerank", "q_ppr", "q_neighbor_jaccard"),
      note = "narrow projection of prEdges"),
    "lpa" -> ArtifactPricing(
      accessor = "lpaLabels",
      pricedBy = None,
      servedBy = Set("q_label_propagation", "q_modularity"),
      note = "q_label_propagation publishes the labeling itself — its " +
        "output IS the artifact"),
    // ----------------------------------------------------------- misc
    "brandBaskets" -> ArtifactPricing(
      accessor = "brandBaskets",
      pricedBy = None,
      servedBy = Set("q_assoc_rules", "q_assoc_basket_audit"),
      note = "lineitem+part join + distinct; both consumers' real work " +
        "(rule mining / audit) dominates"),
    "fuzzyPairs" -> ArtifactPricing(
      accessor = "fuzzyPairs",
      pricedBy = None,
      servedBy = Set("q_fuzzy_blocked", "q_entity_resolution"),
      note = "q_fuzzy_blocked publishes the candidate set itself — its " +
        "output IS the artifact")
  )

  /** Memo names whose registered string is parameter-interpolated in the
    * source (`s"pq_codes_f$trainFrac"`). The tripwire normalizes a
    * scanned interpolated name to the manifest key listed here.
    */
  val interpolated: Map[String, String] = Map(
    "pq_codes_f$trainFrac" -> "pq_codes_f1.0",
    "pq_i2_f$trainFrac" -> "pq_i2_f1.0")

  /** Map a RUNTIME memo name to its manifest key: parameter-interpolated
    * names (`pq_codes_f0.5`) fold onto the manifest row that documents
    * the whole accessor family; anything else passes through (and, if
    * absent from [[artifacts]], gets flagged by [[runtimeViolations]]).
    */
  def normalize(name: String): String =
    if (artifacts.contains(name)) name
    else interpolated.collectFirst {
      case (pat, key) if name.startsWith(pat.takeWhile(_ != '$')) => key
    }.getOrElse(name)

  /** The RUNTIME half of the pricing tripwire (r19 — the source scan in
    * CoreSpec cannot see an accessor reached through a renamed helper;
    * this can, because [[graft.SparkEntry.memoFrame]]/`memoModel`/
    * `bpeMerges` log every call against the row label Verify sets).
    * Order-independent assertions only:
    *
    *  1. a `pricedBy` row must record ZERO touches of its artifact —
    *     direct or through any helper chain (the bench median it
    *     produces must price the build, never serve the cache);
    *  2. every `servedBy` row that RAN must touch its artifact at least
    *     once (the accessor call is logged before the cache lookup, so
    *     this holds regardless of warm/cold state);
    *  3. every touched name must normalize to a manifest key (a new memo
    *     without a manifest entry fails here even if the source scan's
    *     regexes miss it).
    *
    * Touches a row picks up INDIRECTLY (a nested build — e.g. the first
    * `lshComponents` consumer building `lshPairs` underneath) are
    * deliberately NOT violations for serving rows: nesting is
    * order-dependent, and the manifest's `feeds` field documents it.
    *
    * @param ranRows rows that completed (a serving row that never ran
    *                cannot be expected to have touched anything)
    * @param touches row → memo names logged while it ran
    * @return human-readable violations; empty = manifest and runtime agree
    */
  def runtimeViolations(
      ranRows: Set[String], touches: Map[String, Set[String]]): Seq[String] = {
    val norm: Map[String, Set[String]] =
      touches.map { case (r, as) => r -> as.map(normalize) }
    val out = Seq.newBuilder[String]
    for ((r, as) <- norm.toSeq.sortBy(_._1); a <- as.toSeq.sorted
         if !artifacts.contains(a))
      out += s"row '$r' touched memo '$a' absent from the pricing manifest"
    for ((key, ap) <- artifacts.toSeq.sortBy(_._1)) {
      ap.pricedBy.foreach { pr =>
        if (norm.getOrElse(pr, Set.empty).contains(key))
          out += s"pricing row '$pr' touched the memo it must price ('$key')"
      }
      for (srv <- ap.servedBy.toSeq.sorted
           if ranRows.contains(srv) && !norm.getOrElse(srv, Set.empty).contains(key))
        out += s"serving row '$srv' ran but never touched its declared memo '$key'"
    }
    out.result()
  }
}
