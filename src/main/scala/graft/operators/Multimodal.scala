package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / frame-sample
  * stages shaped for a real pipeline.
  *
  * Two REAL decoders run behind the seam — `javax.imageio` for images
  * ([[extractImageFeatures]]) and a full RIFF/WAVE container parse for
  * audio ([[extractAudioFeatures]]) — both value-verified end to end by
  * closed-form synthesized fixtures the DuckDB oracle recomputes. The
  * generic [[extractFeatures]] lane computes a byte-lane content profile
  * ([[byteLaneProfile]]) — a real byte-level feature, also oracle-checked.
  * Everything shares the load-bearing scale design: the schema (binary
  * payload + metadata struct), the partition-preserving `mapPartitions`
  * batch shape (the Scala analogue of `mapInPandas`: one iterator per
  * partition so a heavyweight decoder is initialized once per partition,
  * not per row), and the narrow, shuffle-free plan.
  */
object Multimodal {

  /** A decoded media record: fixed-length feature vector + sampled frames. */
  final case class MediaFeatures(
      doc_id: Long,
      byte_len: Long,
      n_frames: Long,
      features: Array[Double])

  /** A resized media record. */
  final case class Resized(doc_id: Long, byte_len: Long, resized: Array[Byte])

  /** Attach a binary payload column + metadata to a text table — the fixture
    * stand-in for real media bytes (deterministic: UTF-8 encode of the text).
    */
  def withBinaryPayload(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      octet_length(encode(col(textCol), "UTF-8")).cast("long").as("byte_len"),
      sha2(col(textCol), 256).as("sha256"))

  /** Frame count: ceil(byte_len / frameBytes), with empty payloads counted
    * as one (degenerate) frame — every document owns ≥ 1 frame and an
    * exact-multiple payload does NOT get a phantom empty trailing frame.
    */
  private def frameCount(byteLen: org.apache.spark.sql.Column, frameBytes: Int) =
    greatest(lit(1L), ceil(byteLen / frameBytes).cast("long"))

  /** Pure-SQL metadata pass over the payload (codegen'd, no stub involved):
    * byte length, content hash, deterministic frame count at `frameBytes`
    * bytes per simulated frame.
    */
  def binaryMeta(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      frameBytes: Int = 256): DataFrame =
    withBinaryPayload(docs, idCol, textCol)
      .select(
        col(idCol),
        col("byte_len"),
        col("sha256"),
        frameCount(col("byte_len"), frameBytes).as("n_frames"))

  /** Frame sampling: chop the binary payload into fixed-size frames, one
    * output row per frame, identified by content hash — the video/audio
    * "sample every Nth frame" stage shaped as a pure narrow plan (explode +
    * binary substring + md5, all codegen'd; no shuffle, no decoder).
    */
  def frameSample(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      frameBytes: Int = 256): DataFrame =
    withBinaryPayload(docs, idCol, textCol)
      .select(
        col(idCol), col("payload"),
        explode(sequence(lit(0L), frameCount(col("byte_len"), frameBytes) - 1))
          .as("frame_idx"))
      .select(
        col(idCol),
        col("frame_idx"),
        md5(expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
          .as("frame_md5"),
        length(expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
          .cast("long").as("frame_bytes"))

  /** Cross-payload repeated-frame diagnosis — [[graft.operators.Dedup]]'s
    * chunk-dedup shape on the binary lane: frames whose content hash
    * occurs ≥ 2 times (within one payload or across payloads — repeated
    * intros, shared stock segments, re-encoded duplicates). One narrow
    * frame explode into ONE hash aggregation keyed on the 128-bit frame
    * hash; the duplicated-frame set flowing out is bounded by actual
    * repetition, not corpus size — same scale contract as the text-side
    * chunk pass.
    */
  def frameDupStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", frameBytes: Int = 256): DataFrame =
    frameSample(docs, idCol, textCol, frameBytes)
      .groupBy(col("frame_md5"))
      .agg(
        count(lit(1)).as("n_occurrences"),
        countDistinct(col(idCol)).as("n_docs"),
        min(col(idCol)).as("first_doc"),
        min(col("frame_idx")).as("min_frame_idx"))
      .filter(col("n_occurrences") >= 2)

  /** Scene-cut detection on the frame lane — change-points in a cheap
    * per-frame content LEVEL, the multimodal segmentation primitive
    * (where does one shot/segment end?) that frame-hash dedup cannot see
    * (consecutive frames of one scene hash differently but sit at similar
    * levels). The level is the frame's mean byte value in per-mille
    * (integer floor — engine-portable), the decoder-free stand-in for a
    * real per-frame luminance/histogram signal: swapping a codec in means
    * replacing the level kernel inside the same shape, exactly like
    * [[byteLaneProfile]] vs [[extractImageFeatures]]. A cut is a jump >
    * `jumpThreshold` between CONSECUTIVE frames of the same payload.
    *
    * Shape: one frame explode, a row-local integer fold per frame, one
    * lag window PARTITIONED BY PAYLOAD (frames-per-payload bounds the
    * partition — the q_sessionize bounded-key discipline, never
    * corpus-keyed), one per-payload agg. Operates on the documents
    * fixture's ASCII text lane under the same VARCHAR≡BINARY contract the
    * `mm_frames` oracle documents.
    */
  def sceneCuts(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", frameBytes: Int = 64,
      jumpThreshold: Long = 4000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fr = docs
      .select(col(idCol), col(textCol).as("txt"),
        length(col(textCol)).cast("long").as("len"))
      .select(col(idCol), col("txt"),
        explode(sequence(lit(0L), frameCount(col("len"), frameBytes) - 1))
          .as("frame_idx"))
      .select(col(idCol), col("frame_idx"),
        expr(s"substring(txt, CAST(frame_idx * $frameBytes + 1 AS INT), $frameBytes)")
          .as("f"))
    val lvl = fr.select(col(idCol), col("frame_idx"),
      expr("""CAST(aggregate(transform(sequence(1, length(f)),
             |  i -> CAST(ascii(substring(f, i, 1)) AS BIGINT)), 0L,
             |  (a, x) -> a + x) * 1000 DIV length(f) AS BIGINT)
             |""".stripMargin.replace("\n", " ")).as("lvl"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("frame_idx"))
    lvl.withColumn("prev", lag(col("lvl"), 1).over(w))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_frames"),
        sum(when(abs(col("lvl") - col("prev")) > jumpThreshold, 1L).otherwise(0L))
          .as("n_cuts"),
        coalesce(max(abs(col("lvl") - col("prev"))), lit(0L)).as("max_jump"))
  }

  /** Content-defined chunking on the payload lane — the rolling-hash
    * (Rabin/Gear family; Muthitacharoen, Chen, Mazières' LBFS chunking,
    * SOSP'01) answer to [[frameSample]]'s fixed offsets: a chunk boundary
    * is declared wherever a polynomial hash of the LAST `window` bytes
    * hits `≡ 0 (mod divisor)` — a pure function of local CONTENT, so a
    * payload that reappears behind a shifted prefix re-synchronizes to
    * the identical chunk boundaries after at most one chunk, and its
    * chunks dedup across payloads exactly like [[graft.operators.Dedup]]'s
    * text `substringSpans`. Fixed frames can never see such a duplicate
    * (every frame straddles the shift); EngineSpec pins the A/B.
    *
    * The hash is deliberately the engine-portable basic form —
    * `h(i) = Σ_{j<window} byte(i−j)·base^j`, boundary iff
    * `divisor | h(i)` — STATELESS per position (no min/max chunk clamps,
    * which need running state), so a SQL oracle replays boundary
    * selection verbatim. Expected chunk length ≈ `divisor` bytes.
    * The final position always closes the last chunk.
    *
    * Shape: ZERO exchanges — boundary selection is a pure function of
    * the payload, so the whole operator is one codegen'd projection:
    * the payload's chars become a per-row byte-value array once (O(len),
    * never the per-position substring walk), the rolling hash and the
    * boundary test run as a row-local `filter(sequence(...))` lambda
    * over that array, and chunk spans derive in-array from consecutive
    * boundaries. The previous form exploded one row PER BYTE through a
    * per-payload window (an |corpus-bytes|-row exchange + sort — the
    * scale killer at 100 TB), then paid a second window and an id-keyed
    * join back for the chunk hash; all three are gone (r19 optimization,
    * A/B'd bit-identical). Emits one row per chunk:
    * `(idCol, chunk_idx, start_pos, chunk_bytes, chunk_md5)` (1-based
    * positions). Runs on the ASCII text lane under the same
    * VARCHAR≡BINARY contract as the other `mm_*` rows; empty payloads
    * emit no chunks.
    */
  def cdcChunks(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", window: Int = 8, divisor: Int = 64,
      hashBase: Int = 31): DataFrame = {
    val withCands = cdcCandidates(docs, idCol, textCol, window, divisor,
      hashBase)
    // the final position always closes the last chunk; array_distinct
    // dedups a candidate that already sits exactly at len
    chunksFromBounds(
      withCands.select(col(idCol), col("txt"),
        expr("array_distinct(concat(cands, array(len)))").as("bounds")),
      idCol)
  }

  /** The shared rolling-hash candidate derivation both chunkers build on
    * — THE definition the SQL oracles replay bit-for-bit, so it exists
    * exactly once: `(id, txt, len, cands)` where `cands` is the
    * ASCENDING array of positions i ∈ [window, len] with
    * `divisor | h(i)`, `h(i) = Σ_{j<window} byte(i−j)·base^j`. Entirely
    * row-local: the payload's chars land in a byte-value array once
    * (`split` + `ascii` — O(len), where a per-position
    * `ascii(substring(txt, i, 1))` would walk O(i) codepoints each), and
    * the hash is `window` O(1) `element_at` reads per position inside
    * one `filter(sequence(...))` lambda. Positions below `window` carry
    * implicit zero-padding in the original definition and can only hash
    * to 0 when every real byte contributes 0 — but `i ≥ window` keeps
    * them out exactly like the windowed form did, so the candidate set
    * is identical. Empty payloads are dropped here (no chunks — and
    * Spark's `sequence(a, b)` with b < a would otherwise DESCEND).
    */
  private def cdcCandidates(docs: DataFrame, idCol: String,
      textCol: String, window: Int, divisor: Int,
      hashBase: Int): DataFrame = {
    require(window >= 1 && divisor >= 2 && hashBase >= 2,
      s"bad CDC parameters: window=$window divisor=$divisor base=$hashBase")
    require(BigInt(255) * BigInt(hashBase).pow(window - 1) * window <
      BigInt(Long.MaxValue), s"hash overflows int64: $window × base $hashBase")
    // h(i) over the byte-value array: i ≥ window ⟹ i − j ≥ 1 for every
    // j < window, so no zero-pad guard is needed inside the lambda
    val hExpr = (0 until window).map { j =>
      val pow = BigInt(hashBase).pow(j).toLong
      s"element_at(bvs, CAST(i - $j AS INT)) * ${pow}L"
    }.mkString(" + ")
    // guarded scan-spread: the whole chunker is row-local now, so on the
    // unsplittable single-row-group bench fixtures it would otherwise run
    // one task end to end (identity at real scale — see
    // [[graft.operators.Dedup.spreadNarrowScan]])
    graft.operators.Dedup.spreadNarrowScan(docs, col(idCol))
      .select(col(idCol), col(textCol).as("txt"),
        length(col(textCol)).cast("long").as("len"))
      .filter(col("len") >= 1)
      // split-per-char keeps multi-byte chars whole exactly like
      // substring(txt, i, 1) did (both count CODEPOINTS; ascii() reads
      // the first one); a trailing zero-width match may append one ""
      // element past len — never read, element_at stays within 1..len
      .withColumn("bvs",
        expr("transform(split(txt, ''), c -> CAST(ascii(c) AS BIGINT))"))
      .withColumn("cands", expr(
        s"""IF(len < $window, CAST(array() AS ARRAY<BIGINT>),
           |   filter(sequence(CAST($window AS BIGINT), len),
           |          i -> ($hExpr) % $divisor = 0))"""
          .stripMargin.replace("\n", " ")))
      .select(col(idCol), col("txt"), col("len"), col("cands"))
  }

  /** [[cdcChunks]] with the PRODUCTION min-chunk clamp: boundary
    * candidates come from the identical rolling hash, then a GREEDY
    * left-to-right thinning keeps a candidate only when it lies at least
    * `minChunk` bytes past the last kept boundary (the LBFS min-size
    * rule; the final tail chunk may be shorter — it is closed by the
    * payload end, the standard CDC convention). This closes the
    * stateless form's adversarial hole: on repetitive content whose
    * window hash happens to satisfy the boundary test, EVERY position
    * becomes a boundary and a payload shatters into ~len one-byte chunks
    * (spec-demonstrated); the clamp caps chunk count at ⌈len/minChunk⌉.
    *
    * `maxChunk` completes the LBFS clamp pair: whenever the next
    * acceptable candidate lies MORE than `maxChunk` bytes past the last
    * boundary (or no candidate remains), boundaries are FORCED every
    * `maxChunk` bytes until one is in reach — so candidate-free content
    * (common on compressed/binary payloads whose hashes never hit the
    * divisor class) degrades gracefully to fixed-size slicing instead of
    * one giant chunk, and every chunk obeys `chunk_bytes ≤ maxChunk`.
    * The default (`Int.MaxValue`) disables forcing.
    *
    * The thinning is stateful but PER-PAYLOAD, so it runs as a row-local
    * `aggregate` fold over the doc's sorted candidate array (bounded by
    * payload length — the [[sceneCuts]] bounded-partition discipline,
    * here bounded-array). `minChunk = 1` with the default `maxChunk`
    * keeps every candidate and reproduces [[cdcChunks]] exactly
    * (spec-pinned), which is also why the stateless form remains the
    * ORACLE surface: the clamps are pure composition on top of verified
    * boundary selection (and the clamped rows carry their own recursive
    * oracles).
    */
  def cdcChunksClamped(docs: DataFrame, minChunk: Int,
      maxChunk: Int = Int.MaxValue,
      idCol: String = "doc_id", textCol: String = "text", window: Int = 8,
      divisor: Int = 64, hashBase: Int = 31): DataFrame = {
    require(minChunk >= 1, s"minChunk must be >= 1: $minChunk")
    require(maxChunk >= minChunk,
      s"maxChunk ($maxChunk) must be >= minChunk ($minChunk)")
    // candidates arrive row-local and already ascending (the fold
    // contract) — the explode + groupBy(collect_list) round-trip the
    // windowed form needed is gone with it
    val withCands = cdcCandidates(docs, idCol, textCol, window, divisor,
      hashBase)
    // the greedy fold: per candidate c, first emit every FORCED boundary
    // (full maxChunk steps strictly before c — nf of them), then keep c
    // iff it lies >= minChunk past the last (possibly forced) boundary.
    // nf and the forced array are inlined twice (SQL lambdas have no
    // lets); sequence(1, 0) DESCENDS in Spark, hence the nf < 1 guards.
    val mc = s"CAST($maxChunk AS BIGINT)"
    def nf(from: String, upto: String) =
      s"greatest(CAST(0 AS BIGINT), ($upto - 1 - $from) DIV $mc)"
    def forced(from: String, upto: String) =
      s"""IF(${nf(from, upto)} < 1, CAST(array() AS ARRAY<BIGINT>),
         |   transform(sequence(1, ${nf(from, upto)}), j -> $from + j * $mc))"""
        .stripMargin
    val foldExpr =
      s"""aggregate(cs,
         |  struct(CAST(0 AS BIGINT) AS last,
         |         CAST(array() AS ARRAY<BIGINT>) AS ks),
         |  (acc, c) -> IF(c - (acc.last + ${nf("acc.last", "c")} * $mc) >= $minChunk,
         |    struct(c AS last,
         |           concat(acc.ks, ${forced("acc.last", "c")}, array(c)) AS ks),
         |    struct(acc.last + ${nf("acc.last", "c")} * $mc AS last,
         |           concat(acc.ks, ${forced("acc.last", "c")}) AS ks)),
         |  acc -> acc)""".stripMargin.replace("\n", " ")
    chunksFromBounds(
      withCands
        .select(col(idCol), col("txt"), col("len"),
          col("cands").as("cs"))
        .select(col(idCol), col("txt"), col("len"), expr(foldExpr).as("fs"))
        .select(col(idCol), col("txt"),
          array_distinct(concat(col("fs.ks"),
            expr(forced("fs.last", "len").replace("\n", " ")),
            array(col("len")))).as("bounds")),
      idCol)
  }

  /** Shared chunk materialization over a row-local ASCENDING boundary
    * array: spans derive in-array from consecutive bounds (previous
    * bound + 1 → this bound; the first chunk starts at 1), one `inline`
    * explodes chunks-per-payload ≈ len/divisor rows, and the chunk hash
    * reads `txt` still on the row — no window, no join, no exchange
    * (the windowed `(id, end_pos)`-row form this replaces paid two
    * per-payload windows plus an id-keyed join back to the payload).
    * `withBounds` must carry `(idCol, txt, bounds)` with `bounds`
    * ascending and non-empty — both chunkers' boundary arrays are, by
    * the candidate/fold contract.
    */
  private def chunksFromBounds(withBounds: DataFrame,
      idCol: String): DataFrame =
    withBounds
      .select(col(idCol), col("txt"), expr(
        """inline(transform(bounds, (e, k) ->
          |  struct(CAST(k AS BIGINT) AS chunk_idx,
          |         IF(k = 0, CAST(1 AS BIGINT),
          |            element_at(bounds, k) + 1) AS start_pos,
          |         e AS end_pos)))""".stripMargin.replace("\n", " ")))
      .select(col(idCol), col("chunk_idx"), col("start_pos"),
        (col("end_pos") - col("start_pos") + 1).as("chunk_bytes"),
        md5(expr("substring(txt, CAST(start_pos AS INT), " +
          "CAST(end_pos - start_pos + 1 AS INT))")).as("chunk_md5"))

  /** Cross-payload repeated-CHUNK diagnosis — [[frameDupStats]]' shape on
    * [[cdcChunks]]' content-defined boundaries: one hash aggregation on
    * the 128-bit chunk hash, duplicated-chunk output bounded by actual
    * repetition. This is the binary-lane form that catches SHIFTED
    * duplicate segments (re-encoded media with new headers, repeated
    * intros at varying offsets) that fixed-frame hashing structurally
    * misses.
    */
  def cdcDupStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", window: Int = 8, divisor: Int = 64,
      hashBase: Int = 31): DataFrame =
    cdcChunks(docs, idCol, textCol, window, divisor, hashBase)
      .groupBy(col("chunk_md5"))
      .agg(
        count(lit(1)).as("n_occurrences"),
        countDistinct(col(idCol)).as("n_docs"),
        min(col(idCol)).as("first_doc"),
        min(col("chunk_bytes")).as("chunk_bytes"))
      .filter(col("n_occurrences") >= 2)

  /** Container sniffing by magic bytes — the router at the head of every
    * binary-lane pipeline (decode kernels are per-container; mis-routed
    * payloads are the corrupt-row class [[extractFeatures]] accounts
    * for): classify each payload by its leading bytes into
    * riff_wave / riff_avi / riff_other (RIFF fourcc at offset 9),
    * png / jpeg / gif / pdf / ogg / mp3_id3, mp4 (`ftyp` at offset 5 —
    * the ISO-BMFF box layout), else unknown. Pure byte comparisons on
    * the BINARY column (never a UTF-8 decode — png/jpeg magics are not
    * valid text), one narrow codegen'd projection, no shuffle; emits
    * `(idCol, container, nbytes)`.
    *
    * First-match-wins order is part of the contract (RIFF before the
    * generic prefixes, offset probes last) — the SQL oracle replays the
    * identical CASE order over the ASCII-expressible magics, and the
    * non-ASCII branches (png/jpeg) are spec-pinned with real bytes.
    */
  def sniffContainer(payloads: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    val p = col(payloadCol)
    def pre(off: Int, s: String) =
      substring(p, off, s.length) === lit(s.getBytes("US-ASCII"))
    def preBytes(off: Int, bs: Array[Byte]) =
      substring(p, off, bs.length) === lit(bs)
    payloads.select(
      col(idCol),
      when(pre(1, "RIFF"),
        when(pre(9, "WAVE"), "riff_wave")
          .when(pre(9, "AVI "), "riff_avi")
          .otherwise("riff_other"))
        .when(preBytes(1, Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)), "png")
        .when(preBytes(1, Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte)), "jpeg")
        .when(pre(1, "GIF8"), "gif")
        .when(pre(1, "%PDF"), "pdf")
        .when(pre(1, "OggS"), "ogg")
        .when(pre(1, "ID3"), "mp3_id3")
        .when(pre(5, "ftyp"), "mp4")
        .otherwise("unknown").as("container"),
      octet_length(p).cast("long").as("nbytes"))
  }

  /** Byte-lane content profile: lane `i` accumulates `byte/255` over payload
    * positions ≡ i (mod dim) — a deterministic, decoder-free content
    * fingerprint (cheap modality-agnostic screening/clustering signal),
    * oracle-checked byte-for-byte by `mm_features`. Media-specific decoding
    * lives in [[extractImageFeatures]]/[[extractAudioFeatures]]; swapping a
    * heavier codec in means replacing this kernel inside the same
    * `mapPartitions` seam.
    */
  def byteLaneProfile(payload: Array[Byte], dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0
      i += 1
    }
    out
  }

  /** Byte-decimation resize: downsample the payload by keeping every
    * `factor`-th byte — the byte-level form of an image/audio downsample
    * (a pixel-aware resize would swap this kernel inside the same seam).
    * Narrow, codegen-friendly when expressed over the binary column; kept
    * as a plain function so [[extractFeatures]]-style partition stages can
    * fuse it with decode.
    */
  def resizeStub(payload: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }

  /** Payload → resized payload column via mapPartitions (same batch shape
    * as [[extractFeatures]]).
    */
  def resize(withPayload: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor") // fail at plan time, not per task
    implicit val enc = Encoders.product[Resized]
    withPayload.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val p = resizeStub(r.getAs[Array[Byte]](1), factor)
          Resized(r.getLong(0), p.length.toLong, p)
        }
      }(enc)
      .toDF()
  }

  /** One decoded image: dimensions + per-channel means. `width = -1` marks
    * a payload the codec rejected (corrupt-payload accounting is part of
    * the pipeline contract — rows are never dropped silently).
    */
  final case class ImageFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double)

  /** A synthesized image payload row (the fixture generator's output). */
  final case class ImagePayload(doc_id: Long, payload: Array[Byte])

  /** Deterministic image-fixture generator: one SOLID-COLOR PNG per id with
    * dimensions and channel color derived arithmetically from the id —
    * `w = id%7+1, h = id%5+1, (r,g,b) = (37·id, 59·id, 83·id) mod 256` —
    * and every `id % 10 == 0` row a deliberately CORRUPT payload (bytes
    * that are not an image). This makes [[extractImageFeatures]]'
    * accounting ORACLE-CHECKABLE end to end: DuckDB cannot decode a PNG,
    * but it can compute the same closed-form expectations from the id, so
    * the PNG encode → `javax.imageio` decode → channel-sum path is
    * value-verified by the standard harness (registry row
    * `mm_image_features`), corrupt rows appearing as width = −1 on both
    * sides. Same `mapPartitions` batch shape as the decode stages.
    */
  def synthesizeImagePayloads(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    implicit val enc = Encoders.product[ImagePayload]
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      // In-memory payloads: the default file-backed ImageIO stream cache
      // writes a temp file per encode — pure I/O overhead here and the
      // first thing to collapse under host contention.
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        if (id % 10 == 0) ImagePayload(id, Array[Byte](0x13, 0x37, 0x00, 0x42))
        else {
          val w = (id % 7 + 1).toInt
          val h = (id % 5 + 1).toInt
          val rgb = (((id * 37) % 256) << 16 | ((id * 59) % 256) << 8 | ((id * 83) % 256)).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          ImagePayload(id, bos.toByteArray)
        }
      }
    }(enc).toDF()
  }

  /** REAL image decode — `javax.imageio` (the JDK's built-in PNG/JPEG/BMP/
    * GIF codecs), no stub — behind the exact same `mapPartitions` seam as
    * [[extractFeatures]]: one iterator per partition, so the codec-plugin
    * scan and any decoder state initialize once per partition, not per row.
    * Emits width/height and per-channel byte means (exact integer sums, one
    * final division — deterministic). This is the template for swapping any
    * real codec behind any of the byte-level stages: same input contract ((doc_id,
    * payload)), same narrow shuffle-free plan, same failure accounting.
    */
  def extractImageFeatures(withPayload: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[ImageFeatures]
    withPayload.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // in-memory decode, no temp files
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) ImageFeatures(id, -1, -1, 0.0, 0.0, 0.0)
          else {
            val w = img.getWidth
            val h = img.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sr += (rgb >> 16) & 0xff
                sg += (rgb >> 8) & 0xff
                sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            ImageFeatures(id, w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
          }
        }
      }(enc)
      .toDF()
  }

  /** One perceptual hash per image: 64 average-hash bits split into two
    * non-negative 32-bit halves (`hi` = bits 0–31, `lo` = 32–63 — two
    * BIGINTs instead of one so neither engine touches the sign bit).
    * `(-1, -1)` marks a payload the decoder rejected.
    */
  final case class ImageAHashRow(doc_id: Long, ahash_hi: Long, ahash_lo: Long)

  /** Deterministic GRADIENT image fixtures for the perceptual-hash lane:
    * 16×16 grayscale PNGs with every pixel closed-form in the id —
    * `g(x,y) = ((x·13·(id%4+1) + y·29) mod 64) + (id mod 128)`. The first
    * term is the STRUCTURE (four classes by `id % 4`); the second is a
    * per-id global brightness shift that changes every byte but CANCELS in
    * the average-hash comparison (shifts cell means and the image mean
    * equally, no clipping by construction: 63 + 127 < 256) — so the
    * corpus contains byte-DISTINCT, perceptually-IDENTICAL groups, which
    * is precisely what [[imageAHash]] must collapse and byte-exact frame
    * hashing cannot. Every `id % 10 == 0` payload is corrupt (the
    * standard accounting contract).
    */
  def synthesizeGradientPayloads(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    implicit val enc = Encoders.product[ImagePayload]
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        if (id % 10 == 0) ImagePayload(id, Array[Byte](0x13, 0x37, 0x00, 0x42))
        else {
          val img = new java.awt.image.BufferedImage(
            16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val k = (id % 4 + 1).toInt
          val bright = (id % 128).toInt
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              val g = ((x * 13 * k + y * 29) % 64) + bright
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          ImagePayload(id, bos.toByteArray)
        }
      }
    }(enc).toDF()
  }

  /** Perceptual (average) hash over the decoded raster — the multimodal
    * near-dup key byte-exact frame hashing cannot provide: re-encodes,
    * metadata changes, and global brightness shifts of the same content
    * land on the SAME 64-bit hash. Grid-cell mean vs whole-image mean,
    * compared in EXACT integer cross-multiplication (`cellSum·W·H >
    * totalSum·cellPixels` — no division, no float, engine-replayable);
    * pixel value is the channel sum r+g+b (scale cancels in the
    * comparison). Cells follow the floor-boundary grid (`ci = x·grid/W`),
    * so any W×H decodes to the same bit layout; bit index `cj·grid+ci`,
    * packed into two non-negative 32-bit halves. Row-local behind the
    * same `mapPartitions` seam as [[extractImageFeatures]]; corrupt
    * payloads surface as `(-1, -1)`, never dropped or thrown.
    */
  def imageAHash(withPayload: DataFrame, grid: Int = 8): DataFrame = {
    require(grid >= 2 && grid <= 8, s"grid must be in [2, 8] (64-bit hash): $grid")
    implicit val enc = Encoders.product[ImageAHashRow]
    withPayload.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) ImageAHashRow(id, -1L, -1L)
          else {
            val w = img.getWidth
            val h = img.getHeight
            val cellSum = Array.ofDim[Long](grid * grid)
            val cellN = Array.ofDim[Long](grid * grid)
            var total = 0L
            var y = 0
            while (y < h) {
              val cj = (y.toLong * grid / h).toInt
              var x = 0
              while (x < w) {
                val ci = (x.toLong * grid / w).toInt
                val rgb = img.getRGB(x, y)
                val p = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)).toLong
                cellSum(cj * grid + ci) += p
                cellN(cj * grid + ci) += 1
                total += p
                x += 1
              }
              y += 1
            }
            val wh = w.toLong * h
            var hi = 0L
            var lo = 0L
            var idx = 0
            while (idx < grid * grid) {
              if (cellSum(idx) * wh > total * cellN(idx)) {
                if (idx < 32) hi |= 1L << idx else lo |= 1L << (idx - 32)
              }
              idx += 1
            }
            ImageAHashRow(id, hi, lo)
          }
        }
      }(enc).toDF()
  }

  /** One decoded audio clip: format header fields + exact integer sample
    * stats. `sample_rate = -1` marks a payload the parser rejected (same
    * corrupt-accounting contract as [[ImageFeatures]] — rows are never
    * dropped silently).
    */
  final case class AudioFeatures(
      doc_id: Long,
      sample_rate: Long,
      n_samples: Long,
      sum_amp: Long,
      peak_amp: Long)

  /** A synthesized audio payload row (the fixture generator's output). */
  final case class AudioPayload(doc_id: Long, payload: Array[Byte])

  /** Deterministic audio-fixture generator: one RIFF/WAVE (PCM 16-bit mono)
    * clip per id with every header field and sample closed-form in the id —
    * `rate = 8000 + (id%3)·4000`, `n = id%50 + 10`,
    * `s_i = ((id·31 + i·17) mod 65536) − 32768` — and every `id % 10 == 0`
    * row a deliberately CORRUPT payload. Same design as
    * [[synthesizeImagePayloads]]: DuckDB cannot parse a WAV container, but
    * it can recompute the closed forms, so the WAV encode → RIFF parse →
    * sample-sum path is value-verified by the standard harness (registry
    * row `mm_audio_features`), corrupt rows surfacing as `sample_rate = -1`
    * on both sides.
    */
  def synthesizeAudioPayloads(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    implicit val enc = Encoders.product[AudioPayload]
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        if (id % 10 == 0) AudioPayload(id, Array[Byte](0x13, 0x37, 0x00, 0x42))
        else {
          val rate = (8000 + (id % 3) * 4000).toInt
          val n = (id % 50 + 10).toInt
          val dataSize = n * 2
          val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
          buf.put("WAVE".getBytes("US-ASCII"))
          buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
          buf.putShort(1) // PCM
          buf.putShort(1) // mono
          buf.putInt(rate)
          buf.putInt(rate * 2) // byte rate
          buf.putShort(2) // block align
          buf.putShort(16) // bits per sample
          buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
          var i = 0
          while (i < n) {
            buf.putShort((((id * 31 + i * 17) % 65536) - 32768).toShort)
            i += 1
          }
          AudioPayload(id, buf.array())
        }
      }
    }(enc).toDF()
  }

  /** REAL audio decode — a full RIFF/WAVE container parse (chunk walk, PCM
    * format validation, 16-bit LE sample extraction), dependency-free and
    * row-local — behind the same `mapPartitions` seam as
    * [[extractImageFeatures]]. Emits the header's sample rate, the data
    * chunk's sample count, and EXACT integer sample stats (sum + peak
    * absolute amplitude), so both engines compare whole longs — no float
    * tolerance anywhere. Any structural violation (bad magic, truncated
    * chunk, non-PCM format, missing data chunk) lands the row in the
    * corrupt-accounting lane (`sample_rate = -1`) instead of throwing: at
    * 100 TB a single bad object must never kill the stage.
    */
  def extractAudioFeatures(withPayload: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[AudioFeatures]
    withPayload.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          decodeWav(r.getAs[Array[Byte]](1)) match {
            case Some((rate, samples)) =>
              var sum = 0L
              var peak = 0L
              var i = 0
              while (i < samples.length) {
                sum += samples(i)
                val a = math.abs(samples(i).toLong)
                if (a > peak) peak = a
                i += 1
              }
              AudioFeatures(id, rate.toLong, samples.length.toLong, sum, peak)
            case None => AudioFeatures(id, -1L, -1L, 0L, 0L)
          }
        }
      }(enc)
      .toDF()
  }

  /** RIFF/WAVE parser: returns (sampleRate, samples) for PCM 16-bit mono
    * clips, None for anything structurally invalid. Walks the chunk list
    * rather than assuming the canonical 44-byte layout, so writers that
    * emit extra chunks (LIST/INFO metadata) still decode.
    */
  private[operators] def decodeWav(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    def fourcc(off: Int): String =
      if (off + 4 > bytes.length) ""
      else new String(bytes, off, 4, "US-ASCII")
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | (bytes(off + 1) & 0xffL) << 8 |
        (bytes(off + 2) & 0xffL) << 16 | (bytes(off + 3) & 0xffL) << 24
    def u16(off: Int): Int = (bytes(off) & 0xff) | (bytes(off + 1) & 0xff) << 8
    if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "WAVE") return None
    var off = 12
    var rate = -1
    var fmtOk = false
    var data: Array[Short] = null
    while (off + 8 <= bytes.length) {
      val id = fourcc(off)
      val size = u32(off + 4)
      val body = off + 8
      if (body + size > bytes.length) return None // truncated chunk
      if (id == "fmt ") {
        if (size < 16) return None
        val audioFormat = u16(body)
        val channels = u16(body + 2)
        val bits = u16(body + 14)
        rate = u32(body + 4).toInt
        fmtOk = audioFormat == 1 && channels == 1 && bits == 16
      } else if (id == "data") {
        if (size % 2 != 0) return None
        val n = (size / 2).toInt
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          out(i) = ((bytes(body + 2 * i) & 0xff) |
            (bytes(body + 2 * i + 1) << 8)).toShort
          i += 1
        }
        data = out
      }
      off = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (fmtOk && rate > 0 && data != null) Some((rate, data)) else None
  }

  /** An MP4 metadata row: movie-header fields + track count, with the
    * corrupt-accounting lane as all -1s.
    */
  final case class Mp4Meta(
      doc_id: Long,
      timescale: Long,
      duration: Long,
      n_tracks: Long,
      duration_ms: Long)

  /** A synthesized MP4 payload row (the fixture generator's output). */
  final case class Mp4Payload(doc_id: Long, payload: Array[Byte])

  /** Deterministic ISO-BMFF fixture generator: one minimal MP4 per id —
    * `ftyp` (isom/mp41), then `moov` holding an `mvhd` with
    * `timescale = 600 + (id%5)·400`, `duration = (id%240 + 60)·100`
    * (odd ids: + (id%3)·2³², written as a VERSION-1 64-bit box; even
    * ids version 0), and `1 + id%3` header-only `trak` boxes — every
    * field closed-form in the id. Corruption lanes exercise both guard classes: `id % 10 == 0`
    * rows are garbage bytes (no `ftyp`), `id % 10 == 5` rows declare a
    * `moov` longer than the payload (the truncated-box class). Same
    * design as [[synthesizeAudioPayloads]]: DuckDB cannot walk a box
    * tree, but it can recompute the closed forms, so the MP4 encode →
    * box-walk path is value-verified by the standard harness
    * (registry row `mm_mp4_meta`).
    */
  def synthesizeMp4Payloads(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    implicit val enc = Encoders.product[Mp4Payload]
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        if (id % 10 == 0) Mp4Payload(id, Array[Byte](0x13, 0x37, 0x00, 0x42))
        else {
          // odd ids write a VERSION-1 mvhd (64-bit creation/modification/
          // duration — the layout real long-form video predominantly
          // carries), with a duration pushed past 2³² so the 64-bit read
          // is actually exercised; even ids stay version 0
          val v1 = id % 2 == 1
          val timescale = (600 + (id % 5) * 400).toInt
          val duration: Long =
            (id % 240 + 60) * 100 + (if (v1) (id % 3) * 4294967296L else 0L)
          val nTracks = (1 + id % 3).toInt
          // v0: 8 header + 4 ver/flags + 96 body; v1: +12 for the three
          // widened 64-bit fields
          val mvhdSize = if (v1) 120 else 108
          val moovSize = 8 + mvhdSize + 8 * nTracks
          val buf = java.nio.ByteBuffer.allocate(20 + moovSize)
            .order(java.nio.ByteOrder.BIG_ENDIAN) // ISO-BMFF is big-endian
          buf.putInt(20).put("ftyp".getBytes("US-ASCII"))
          buf.put("isom".getBytes("US-ASCII")).putInt(512)
          buf.put("mp41".getBytes("US-ASCII"))
          buf.putInt(moovSize).put("moov".getBytes("US-ASCII"))
          buf.putInt(mvhdSize).put("mvhd".getBytes("US-ASCII"))
          if (v1) {
            buf.putInt(0x01000000) // version 1 + flags
            buf.putLong(0L).putLong(0L) // creation / modification (64-bit)
            buf.putInt(timescale).putLong(duration)
          } else {
            buf.putInt(0) // version 0 + flags
            buf.putInt(0).putInt(0) // creation / modification
            buf.putInt(timescale).putInt(duration.toInt)
          }
          buf.putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume
          buf.position(buf.position() + 70) // reserved + matrix + pre_defined
          buf.putInt(nTracks + 1) // next_track_ID
          var k = 0
          while (k < nTracks) {
            buf.putInt(8).put("trak".getBytes("US-ASCII"))
            k += 1
          }
          val bytes = buf.array()
          // truncated lane: moov's declared size now exceeds the payload
          if (id % 10 == 5) Mp4Payload(id, bytes.dropRight(4))
          else Mp4Payload(id, bytes)
        }
      }
    }(enc).toDF()
  }

  /** REAL MP4 metadata decode — an ISO-BMFF box walk (top-level `ftyp`
    * check, `moov` child scan, version-0/1 `mvhd` field extraction, `trak`
    * census), dependency-free and row-local — behind the same
    * `mapPartitions` seam as [[extractAudioFeatures]]. Emits the movie
    * timescale, duration (in timescale units), track count, and the
    * derived `duration_ms = duration·1000 DIV timescale` — all exact
    * integers. Any structural violation (bad magic, box overrunning its
    * parent or the payload, box size < 8 — which also rejects the
    * size-0 "to end of file" and size-1 64-bit largesize specials this
    * minimal lane does not model — or an mvhd version above 1) lands the
    * row in the corrupt-accounting lane (all fields -1) instead of throwing:
    * at 100 TB a single bad object must never kill the stage.
    */
  def extractMp4Meta(withPayload: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[Mp4Meta]
    withPayload.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          parseMp4(r.getAs[Array[Byte]](1)) match {
            case Some((ts, dur, nt)) =>
              Mp4Meta(id, ts, dur, nt, dur * 1000L / ts)
            case None => Mp4Meta(id, -1L, -1L, -1L, -1L)
          }
        }
      }(enc)
      .toDF()
  }

  /** ISO-BMFF box walk: (timescale, duration, n_tracks) for payloads whose
    * top level carries `ftyp` and a `moov` with a version-0 or version-1
    * `mvhd`; None for anything structurally invalid.
    */
  private[graft] def parseMp4(bytes: Array[Byte]): Option[(Long, Long, Long)] = {
    def fourcc(off: Int): String =
      if (off + 4 > bytes.length) ""
      else new String(bytes, off, 4, "US-ASCII")
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) << 24 | (bytes(off + 1) & 0xffL) << 16 |
        (bytes(off + 2) & 0xffL) << 8 | (bytes(off + 3) & 0xffL)
    if (bytes.length < 8 || fourcc(4) != "ftyp") return None
    var off = 0
    var timescale = -1L
    var duration = -1L
    var nTracks = 0L
    var sawMoov = false
    while (off + 8 <= bytes.length) {
      val size = u32(off)
      val id = fourcc(off + 4)
      if (size < 8 || off + size > bytes.length) return None
      if (id == "moov") {
        sawMoov = true
        val end = off + size.toInt
        var c = off + 8
        while (c + 8 <= end) {
          val cs = u32(c)
          val cid = fourcc(c + 4)
          if (cs < 8 || c + cs > end) return None
          if (cid == "mvhd") {
            // v0 body: ver/flags(4) creation(4) modification(4)
            //          timescale(4) duration(4) ...
            // v1 body: ver/flags(4) creation(8) modification(8)
            //          timescale(4) duration(8) ... — the layout real
            //          long-form video predominantly carries
            bytes(c + 8) match {
              case 0 =>
                if (cs < 28) return None
                timescale = u32(c + 20)
                duration = u32(c + 24)
              case 1 =>
                if (cs < 40) return None
                timescale = u32(c + 28)
                duration = (u32(c + 32) << 32) | u32(c + 36)
                if (duration < 0) return None // > 2^63 is structural garbage
              case _ => return None
            }
          } else if (cid == "trak") nTracks += 1
          c += cs.toInt
        }
      }
      off += size.toInt
    }
    if (sawMoov && timescale > 0 && duration >= 0) Some((timescale, duration, nTracks))
    else None
  }

  /** Decode + feature-extract via `mapPartitions`: per-partition iterator so a
    * real decoder's init cost amortizes across the partition (the reason this
    * is `mapPartitions`, not `map`/UDF). Input must carry (doc_id, payload).
    */
  def extractFeatures(withPayload: DataFrame, dim: Int = 8, frameBytes: Int = 256): DataFrame = {
    val projected = withPayload.select(col("doc_id").cast("long"), col("payload"))
    implicit val enc = Encoders.product[MediaFeatures]
    projected
      .mapPartitions { rows =>
        // real pipeline: initialize the (expensive) decoder here, once
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          MediaFeatures(
            doc_id = id,
            byte_len = payload.length.toLong,
            n_frames = math.max(1L, (payload.length + frameBytes - 1L) / frameBytes),
            features = byteLaneProfile(payload, dim))
        }
      }(enc)
      .toDF()
  }
}
