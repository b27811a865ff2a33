package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Assoc, Dedup, DiskUsageOp, Graph, Hygiene, Joins, Layout, Multimodal, Similarity, Splits, Temporal, TextAnalysis}
import graft.SparkEntry._

/** multimodal rows — mechanically split out of the monolithic SparkEntry registry
  * (it had passed 10k lines); entry bodies and oracle SQL are unchanged,
  * shared helpers stay on [[graft.SparkEntry]]. The CoreSpec source
  * tripwire scans every file in this package.
  */
private[graft] object MmQueries {
  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "mm_frames" -> ((s, dir) =>
      Multimodal.frameSample(t(s, dir, "documents"))
        .orderBy(col("doc_id"), col("frame_idx"))),
    "mm_frame_dedup" -> ((s, dir) =>
      // repeated-frame diagnosis at 64-byte frames (97 dup groups in the
      // fixture): the chunk-dedup shape on the binary lane — one frame
      // explode, one hash agg on the frame hash
      Multimodal.frameDupStats(t(s, dir, "documents"), frameBytes = 64)
        .orderBy(col("frame_md5"))),

    "mm_scene_cuts" -> ((s, dir) =>
      // frame-lane change-point detection: per-frame mean-byte level
      // (per-mille, integer floor) + a payload-partitioned lag window —
      // cuts are jumps > 4000 between consecutive frames (≈11% of the
      // fixture's transitions; the window partition is bounded by
      // frames-per-payload, never corpus-keyed)
      Multimodal.sceneCuts(t(s, dir, "documents"), frameBytes = 64,
          jumpThreshold = 4000L)
        .orderBy(col("doc_id"))),

    // -------- multimodal plumbing (SURVEY §2.12)
    "mm_binary_meta" -> ((s, dir) =>
      Multimodal.binaryMeta(t(s, dir, "documents")).orderBy(col("doc_id"))),
    "mm_phash_dup" -> ((s, dir) => {
      // PERCEPTUAL image dedup: gradient PNGs whose per-id brightness shift
      // changes every byte but cancels in the average-hash comparison —
      // byte-distinct payloads collapse into hash-equal groups (what
      // byte-exact frame hashing cannot do). DuckDB replays the pixel
      // closed forms, the integer bit rule, and the grouping.
      val hashed = Multimodal.imageAHash(
        Multimodal.synthesizeGradientPayloads(t(s, dir, "documents").select(col("doc_id"))))
      val groups = hashed.filter(col("ahash_hi") >= 0)
        .groupBy(col("ahash_hi"), col("ahash_lo"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_dups"))
      hashed.join(groups, Seq("ahash_hi", "ahash_lo"), "left")
        .select(col("doc_id"), col("ahash_hi"), col("ahash_lo"),
          col("rep_id"), col("n_dups"))
        .orderBy(col("doc_id"))
    }),
    "mm_image_features" -> ((s, dir) =>
      // REAL codec, oracle-checked: synthesize a solid-color PNG per doc id
      // (dims + channels closed-form in the id; every 10th payload corrupt),
      // decode with javax.imageio, emit exact integer dims + channel means.
      // DuckDB recomputes the same closed forms — the PNG encode → decode →
      // pixel-sum path is value-verified; corrupt rows surface as width=-1
      // (accounted, never dropped) on both sides.
      Multimodal.extractImageFeatures(
          Multimodal.synthesizeImagePayloads(t(s, dir, "documents").select(col("doc_id"))))
        .select(
          col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          round(col("mean_r")).cast("long").as("mean_r_int"),
          round(col("mean_g")).cast("long").as("mean_g_int"),
          round(col("mean_b")).cast("long").as("mean_b_int"))
        .orderBy(col("doc_id"))),
    "mm_audio_features" -> ((s, dir) =>
      // REAL audio decode, oracle-checked: synthesize a RIFF/WAVE PCM clip
      // per doc id (rate, sample count, every 16-bit sample closed-form in
      // the id; every 10th payload corrupt), parse the container and emit
      // EXACT integer sample stats. DuckDB recomputes the closed forms —
      // the WAV encode → RIFF parse → sample-sum path is value-verified;
      // corrupt rows surface as sample_rate=-1 on both sides.
      Multimodal.extractAudioFeatures(
          Multimodal.synthesizeAudioPayloads(t(s, dir, "documents").select(col("doc_id"))))
        .orderBy(col("doc_id"))),
    "mm_mp4_meta" -> ((s, dir) =>
      // REAL MP4 metadata decode, oracle-checked: synthesize a minimal
      // ISO-BMFF payload per doc id (mvhd timescale/duration and the trak
      // census closed-form in the id; id%10==0 garbage, id%10==5
      // truncated-box), box-walk it and emit exact integer metadata.
      // DuckDB recomputes the closed forms — the MP4 encode → box-walk
      // path is value-verified; both corruption classes surface as all
      // -1s on both sides.
      Multimodal.extractMp4Meta(
          Multimodal.synthesizeMp4Payloads(t(s, dir, "documents").select(col("doc_id"))))
        .orderBy(col("doc_id"))),
    "mm_features" -> ((s, dir) =>
      // mapPartitions byte-lane profile stage (real byte math). The raw
      // array<double> output is not oracle-hashable, so the verified shape
      // explodes each feature lane and de-scales it to the exact integer it
      // accumulates (lane value = Σ bytes/255.0 → ×255 → byte sum): every
      // emitted column is an exactly-comparable integer, and the DuckDB
      // oracle recomputes the same byte math over the ASCII corpus
      Multimodal.extractFeatures(Multimodal.withBinaryPayload(t(s, dir, "documents")))
        .select(col("doc_id"), col("byte_len"), col("n_frames"),
          posexplode(col("features")).as(Seq("i", "feature")))
        .select(
          col("doc_id"), col("byte_len"), col("n_frames"),
          col("i").cast("long").as("i"),
          round(col("feature") * 255.0).cast("long").as("lane_byte_sum"))
        .orderBy(col("doc_id"), col("i"))),
    "mm_container_sniff" -> ((s, dir) => {
      // the binary-lane ROUTER: payloads synthesized with a closed-form
      // magic prefix (doc_id % 9 picks RIFF/WAVE, RIFF/AVI, RIFF/other,
      // GIF, PDF, Ogg, ID3, ISO-BMFF ftyp, or none), sniffed at the BYTE
      // level, summarized per container. ASCII-expressible magics only so
      // the VARCHAR-lane oracle replays the same first-match CASE; the
      // non-ASCII branches (png/jpeg) are spec-pinned with real bytes.
      val magic = element_at(array(
        lit("RIFF0000WAVE"), lit("RIFF0000AVI "), lit("RIFF0000XXXX"),
        lit("GIF89a"), lit("%PDF-1.4"), lit("OggS"), lit("ID3v"),
        lit("0000ftypisom"), lit("")),
        (col("doc_id") % 9 + 1).cast("int"))
      val payloads = Multimodal.withBinaryPayload(
        t(s, dir, "documents").select(col("doc_id"),
          concat(magic, col("text")).as("text")))
      Multimodal.sniffContainer(payloads)
        .groupBy(col("container"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nbytes")).as("sum_bytes"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("container"))
    }),
    "mm_cdc_chunks" -> ((s, dir) => {
      // content-defined chunk dedup over a SHIFTED-duplicate fixture,
      // closed-form in the id: each payload = an id-varying prefix (0-9
      // bytes, id-varying char) + a group-shared segment body (ids DIV
      // 10). Fixed-offset frames can never match across the group (every
      // frame straddles the shift); the rolling-hash boundaries re-sync
      // inside the shared body, so its chunks dedup at DIFFERENT offsets
      // — the oracle replays the identical polynomial boundary selection
      val payloads = t(s, dir, "documents").select(col("doc_id"),
        concat(
          expr("repeat(chr(CAST(97 + doc_id % 5 AS INT)), CAST(doc_id % 10 AS INT))"),
          expr("repeat(concat('segment', CAST(doc_id DIV 10 AS STRING), ' '), 20)"))
          .as("text"))
      Multimodal.cdcDupStats(payloads)
        .orderBy(col("chunk_md5"))
    }),
    "mm_cdc_chunks_clamped" -> ((s, dir) => {
      // the PRODUCTION chunker (min-chunk greedy thinning over the same
      // rolling-hash candidates — shatter-proof on repetitive content)
      // over the same shifted-duplicate fixture, emitting the full chunk
      // table; the oracle replays the greedy fold via list_reduce over
      // transformed candidate structs (prefix-filter ≥ minChunk makes
      // DuckDB's first-element init equal Spark's fold-from-zero)
      val payloads = t(s, dir, "documents").select(col("doc_id"),
        concat(
          expr("repeat(chr(CAST(97 + doc_id % 5 AS INT)), CAST(doc_id % 10 AS INT))"),
          expr("repeat(concat('segment', CAST(doc_id DIV 10 AS STRING), ' '), 20)"))
          .as("text"))
      Multimodal.cdcChunksClamped(payloads, minChunk = 24)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),
    "mm_cdc_chunks_maxclamp" -> ((s, dir) => {
      // BOTH LBFS clamps: wherever no acceptable candidate lies within
      // maxChunk of the last boundary, boundaries are FORCED every 64
      // bytes — candidate-free payloads (whole fixture groups hash past
      // the divisor class) slice fixed-size instead of one giant chunk,
      // and every chunk obeys ≤ 64 B; the oracle's recursion picks
      // MIN(candidate in [last+24, last+64]) or forces last+64
      val payloads = t(s, dir, "documents").select(col("doc_id"),
        concat(
          expr("repeat(chr(CAST(97 + doc_id % 5 AS INT)), CAST(doc_id % 10 AS INT))"),
          expr("repeat(concat('segment', CAST(doc_id DIV 10 AS STRING), ' '), 20)"))
          .as("text"))
      Multimodal.cdcChunksClamped(payloads, minChunk = 24, maxChunk = 64)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),
  )

  val oracles: Seq[(String, String)] = Seq(
    "mm_scene_cuts" ->
      // same VARCHAR≡BINARY ASCII contract as mm_frames; the level is an
      // exact integer fold, the cut rule an integer compare — replayed
      // with generate_series + a lag window
      """WITH fr AS (
        |  SELECT doc_id, u.i AS frame_idx,
        |         substring(text, CAST(u.i*64+1 AS INT), 64) AS f
        |  FROM documents,
        |       unnest(generate_series(0,
        |         GREATEST(1, CAST(ceil(length(text)/64.0) AS BIGINT))-1)) AS u(i)),
        |sums AS (
        |  SELECT fr.doc_id, fr.frame_idx,
        |         CAST(COALESCE(SUM(ascii(substring(fr.f, CAST(v.j AS INT), 1))), 0) * 1000
        |              // length(fr.f) AS BIGINT) AS lvl
        |  FROM fr, unnest(generate_series(1, length(fr.f))) AS v(j)
        |  GROUP BY 1, 2, length(fr.f)),
        |d AS (
        |  SELECT doc_id, frame_idx, lvl,
        |         lag(lvl) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
        |  FROM sums)
        |SELECT doc_id, COUNT(*) AS n_frames,
        |       CAST(COALESCE(SUM(CASE WHEN abs(lvl - prev) > 4000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_cuts,
        |       CAST(COALESCE(MAX(abs(lvl - prev)), 0) AS BIGINT) AS max_jump
        |FROM d GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "mm_frames" ->
      // NOTE: the oracle slices the VARCHAR where Spark slices the BINARY
      // payload — equivalent because the fixture corpus is pure ASCII
      // (verified); n_frames = max(1, ceil(len/256)), no phantom trailing
      // frame on exact multiples
      """WITH p AS (
        |  SELECT doc_id, text,
        |         greatest(1, CAST(ceil(length(text)/256.0) AS BIGINT)) AS nf
        |  FROM documents)
        |SELECT doc_id, unnest(range(nf)) AS frame_idx,
        |       md5(substring(text, CAST(unnest(range(nf))*256 + 1 AS BIGINT), 256)) AS frame_md5,
        |       CAST(length(substring(text, CAST(unnest(range(nf))*256 + 1 AS BIGINT), 256)) AS BIGINT) AS frame_bytes
        |FROM p ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_frame_dedup" ->
      // same VARCHAR-slice equivalence note as mm_frames (pure-ASCII
      // corpus); group the frame hashes, keep groups of >= 2
      """WITH p AS (
        |  SELECT doc_id, text,
        |         greatest(1, CAST(ceil(length(text)/64.0) AS BIGINT)) AS nf
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, unnest(range(nf)) AS frame_idx,
        |         md5(substring(text, CAST(unnest(range(nf))*64 + 1 AS BIGINT), 64)) AS frame_md5
        |  FROM p)
        |SELECT frame_md5,
        |       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
        |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |       MIN(doc_id) AS first_doc,
        |       CAST(MIN(frame_idx) AS BIGINT) AS min_frame_idx
        |FROM f GROUP BY frame_md5 HAVING COUNT(*) >= 2
        |ORDER BY frame_md5""".stripMargin,
    "mm_binary_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |       sha256(text) AS sha256,
        |       greatest(1, CAST(ceil(octet_length(encode(text))/256.0) AS BIGINT)) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    // closed-form replay of the gradient fixtures + the exact integer
    // average-hash bit rule: SQL pixel g-values scale the Spark side's
    // r+g+b by exactly 3, which cancels in the cross-multiplied
    // comparison (cs·64 > ts at 16×16/8×8 ⇔ cellSum·W·H > totalSum·n);
    // the brightness term cancels the same way — only structure decides
    // bits, exactly the perceptual-collapse claim under test
    "mm_phash_dup" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |px AS (
        |  SELECT doc_id, x, y,
        |         ((x*13*(doc_id % 4 + 1) + y*29) % 64) + (doc_id % 128) AS g
        |  FROM ids, generate_series(0, 15) t1(x), generate_series(0, 15) t2(y)
        |  WHERE doc_id % 10 <> 0),
        |cells AS (
        |  SELECT doc_id, x // 2 AS ci, y // 2 AS cj, SUM(g) AS cs
        |  FROM px GROUP BY 1, 2, 3),
        |tot AS (SELECT doc_id, SUM(g) AS ts FROM px GROUP BY 1),
        |bits AS (
        |  SELECT c.doc_id, (cj*8 + ci) AS idx,
        |         CASE WHEN c.cs*64 > t.ts THEN 1 ELSE 0 END AS b
        |  FROM cells c JOIN tot t USING (doc_id)),
        |hsh AS (
        |  SELECT doc_id,
        |         CAST(SUM(CASE WHEN idx < 32 THEN b * (1::BIGINT << idx) ELSE 0 END) AS BIGINT) AS ahash_hi,
        |         CAST(SUM(CASE WHEN idx >= 32 THEN b * (1::BIGINT << (idx - 32)) ELSE 0 END) AS BIGINT) AS ahash_lo
        |  FROM bits GROUP BY 1),
        |allh AS (
        |  SELECT doc_id, ahash_hi, ahash_lo FROM hsh
        |  UNION ALL
        |  SELECT doc_id, CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
        |  FROM ids WHERE doc_id % 10 = 0),
        |grp AS (
        |  SELECT ahash_hi, ahash_lo, MIN(doc_id) AS rep_id, COUNT(*) AS n_dups
        |  FROM allh WHERE ahash_hi >= 0 GROUP BY 1, 2)
        |SELECT a.doc_id, a.ahash_hi, a.ahash_lo, g.rep_id, g.n_dups
        |FROM allh a
        |LEFT JOIN grp g ON g.ahash_hi = a.ahash_hi AND g.ahash_lo = a.ahash_lo
        |ORDER BY a.doc_id""".stripMargin,
    "mm_image_features" ->
      // closed-form expectations of the synthesized solid-color PNGs: the
      // Spark side must reproduce these through a real encode/decode
      """SELECT doc_id,
        |       CASE WHEN doc_id % 10 = 0 THEN -1 ELSE doc_id % 7 + 1 END AS width,
        |       CASE WHEN doc_id % 10 = 0 THEN -1 ELSE doc_id % 5 + 1 END AS height,
        |       CASE WHEN doc_id % 10 = 0 THEN 0 ELSE (doc_id * 37) % 256 END AS mean_r_int,
        |       CASE WHEN doc_id % 10 = 0 THEN 0 ELSE (doc_id * 59) % 256 END AS mean_g_int,
        |       CASE WHEN doc_id % 10 = 0 THEN 0 ELSE (doc_id * 83) % 256 END AS mean_b_int
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_audio_features" ->
      // closed-form expectations of the synthesized PCM clips: the Spark
      // side must reproduce these through a real WAV write + RIFF parse
      """WITH s AS (
        |  SELECT doc_id, unnest(range(0, doc_id % 50 + 10)) AS i
        |  FROM documents WHERE doc_id % 10 <> 0),
        |a AS (
        |  SELECT doc_id,
        |         SUM(((doc_id * 31 + i * 17) % 65536) - 32768) AS sum_amp,
        |         MAX(ABS(((doc_id * 31 + i * 17) % 65536) - 32768)) AS peak_amp
        |  FROM s GROUP BY 1)
        |SELECT d.doc_id,
        |       CAST(CASE WHEN d.doc_id % 10 = 0 THEN -1
        |            ELSE 8000 + (d.doc_id % 3) * 4000 END AS BIGINT) AS sample_rate,
        |       CAST(CASE WHEN d.doc_id % 10 = 0 THEN -1
        |            ELSE d.doc_id % 50 + 10 END AS BIGINT) AS n_samples,
        |       CAST(COALESCE(a.sum_amp, 0) AS BIGINT) AS sum_amp,
        |       CAST(COALESCE(a.peak_amp, 0) AS BIGINT) AS peak_amp
        |FROM documents d LEFT JOIN a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "mm_mp4_meta" ->
      // closed-form expectations of the synthesized ISO-BMFF payloads: the
      // Spark side must reproduce these through a real MP4 write + box
      // walk; both corruption lanes (garbage magic, truncated moov) read
      // all -1s. Odd ids carry a VERSION-1 mvhd whose 64-bit duration is
      // pushed past 2^32 — the v1 read path is value-pinned, not just
      // exercised. duration·1000 and timescale are positive BIGINTs, so
      // DuckDB // and Spark DIV agree (floor == truncate on non-negatives)
      """WITH f AS (
        |  SELECT doc_id,
        |         600 + (doc_id % 5) * 400 AS ts,
        |         (doc_id % 240 + 60) * 100 +
        |           CASE WHEN doc_id % 2 = 1
        |                THEN (doc_id % 3) * 4294967296 ELSE 0 END AS dur
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(CASE WHEN doc_id % 10 IN (0, 5) THEN -1
        |            ELSE ts END AS BIGINT) AS timescale,
        |       CAST(CASE WHEN doc_id % 10 IN (0, 5) THEN -1
        |            ELSE dur END AS BIGINT) AS duration,
        |       CAST(CASE WHEN doc_id % 10 IN (0, 5) THEN -1
        |            ELSE 1 + doc_id % 3 END AS BIGINT) AS n_tracks,
        |       CAST(CASE WHEN doc_id % 10 IN (0, 5) THEN -1
        |            ELSE (dur * 1000) // ts END AS BIGINT)
        |         AS duration_ms
        |FROM f ORDER BY doc_id""".stripMargin,
    "mm_features" ->
      // recomputes the byte-lane profile's math: lane i accumulates
      // byte/255.0 over payload positions ≡ i (mod 8), so lane×255 rounds to
      // the exact per-lane byte sum; ord() == byte value on the (verified)
      // pure-ASCII corpus. Empty texts still own 8 zero lanes (LEFT JOIN).
      """WITH ch AS (
        |  SELECT doc_id, CAST(u AS BIGINT) AS pos,
        |         ord(substring(text, CAST(u + 1 AS INTEGER), 1)) AS bv
        |  FROM (SELECT doc_id, text, unnest(range(length(text))) AS u FROM documents)),
        |lane AS (
        |  SELECT doc_id, pos % 8 AS i, SUM(bv) AS s FROM ch GROUP BY 1, 2),
        |docs8 AS (
        |  SELECT doc_id,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |         greatest(1, CAST(ceil(octet_length(encode(text))/256.0) AS BIGINT)) AS n_frames,
        |         CAST(unnest(range(8)) AS BIGINT) AS i
        |  FROM documents)
        |SELECT d.doc_id, d.byte_len, d.n_frames, d.i,
        |       CAST(COALESCE(lane.s, 0) AS BIGINT) AS lane_byte_sum
        |FROM docs8 d LEFT JOIN lane ON lane.doc_id = d.doc_id AND lane.i = d.i
        |ORDER BY d.doc_id, d.i""".stripMargin,
    "mm_container_sniff" ->
      // same closed-form magic synthesis, same first-match CASE order as
      // the operator (RIFF family first, offset-5 ftyp probe last);
      // ASCII magics make octet-level sniffing ≡ char-level here
      """WITH p AS (
        |  SELECT doc_id,
        |         (CASE doc_id % 9
        |            WHEN 0 THEN 'RIFF0000WAVE' WHEN 1 THEN 'RIFF0000AVI '
        |            WHEN 2 THEN 'RIFF0000XXXX' WHEN 3 THEN 'GIF89a'
        |            WHEN 4 THEN '%PDF-1.4' WHEN 5 THEN 'OggS'
        |            WHEN 6 THEN 'ID3v' WHEN 7 THEN '0000ftypisom'
        |            ELSE '' END) || text AS txt
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |         CASE WHEN substring(txt,1,4) = 'RIFF' THEN
        |                CASE WHEN substring(txt,9,4) = 'WAVE' THEN 'riff_wave'
        |                     WHEN substring(txt,9,4) = 'AVI ' THEN 'riff_avi'
        |                     ELSE 'riff_other' END
        |              WHEN substring(txt,1,4) = 'GIF8' THEN 'gif'
        |              WHEN substring(txt,1,4) = '%PDF' THEN 'pdf'
        |              WHEN substring(txt,1,4) = 'OggS' THEN 'ogg'
        |              WHEN substring(txt,1,3) = 'ID3' THEN 'mp3_id3'
        |              WHEN substring(txt,5,4) = 'ftyp' THEN 'mp4'
        |              ELSE 'unknown' END AS container,
        |         CAST(octet_length(encode(txt)) AS BIGINT) AS nbytes
        |  FROM p)
        |SELECT container, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(nbytes) AS BIGINT) AS sum_bytes,
        |       MIN(doc_id) AS first_doc
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "mm_cdc_chunks" -> {
      // the identical rolling polynomial: h(i) = Σ_{j<8} byte(i−j)·31^j,
      // boundary iff 64 | h(i) or i = len — term list generated so both
      // engines share the exact coefficients
      val hTerms = (0 until 8).map { j =>
        val coef = BigInt(31).pow(j).toLong
        if (j == 0) s"CAST(ord(substring(txt, CAST(i AS INT), 1)) AS BIGINT) * $coef"
        else s"CAST(CASE WHEN i >= ${j + 1} THEN ord(substring(txt, CAST(i - $j AS INT), 1)) ELSE 0 END AS BIGINT) * $coef"
      }.mkString("\n        |         + ")
      s"""WITH p AS (
         |  SELECT doc_id,
         |         repeat(chr(CAST(97 + doc_id % 5 AS INT)), CAST(doc_id % 10 AS INT)) ||
         |         repeat('segment' || CAST(doc_id // 10 AS VARCHAR) || ' ', 20) AS txt
         |  FROM documents),
         |b AS (SELECT doc_id, txt, CAST(length(txt) AS BIGINT) AS len FROM p),
         |pos AS (SELECT doc_id, txt, len,
         |               CAST(unnest(range(1, len + 1)) AS BIGINT) AS i FROM b),
         |hp AS (
         |  SELECT doc_id, txt, len, i,
         |         $hTerms AS h
         |  FROM pos),
         |bnd AS (
         |  SELECT doc_id, txt, i AS end_pos FROM hp
         |  WHERE i = len OR (i >= 8 AND h % 64 = 0)),
         |sp AS (
         |  SELECT doc_id, txt, end_pos,
         |         COALESCE(lag(end_pos) OVER (PARTITION BY doc_id ORDER BY end_pos), 0) + 1
         |           AS start_pos
         |  FROM bnd),
         |ch AS (
         |  SELECT doc_id,
         |         md5(substring(txt, CAST(start_pos AS INT),
         |                       CAST(end_pos - start_pos + 1 AS INT))) AS chunk_md5,
         |         end_pos - start_pos + 1 AS cb
         |  FROM sp)
         |SELECT chunk_md5, COUNT(*) AS n_occurrences,
         |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |       MIN(doc_id) AS first_doc,
         |       MIN(cb) AS chunk_bytes
         |FROM ch GROUP BY 1 HAVING COUNT(*) >= 2
         |ORDER BY chunk_md5""".stripMargin
    },
    "mm_cdc_chunks_clamped" -> {
      val hTerms = (0 until 8).map { j =>
        val coef = BigInt(31).pow(j).toLong
        if (j == 0) s"CAST(ord(substring(txt, CAST(i AS INT), 1)) AS BIGINT) * $coef"
        else s"CAST(CASE WHEN i >= ${j + 1} THEN ord(substring(txt, CAST(i - $j AS INT), 1)) ELSE 0 END AS BIGINT) * $coef"
      }.mkString("\n        |         + ")
      // the greedy thinning replays as RECURSIVE reachability — next
      // kept boundary = MIN candidate ≥ last + minChunk, provably the
      // same rule as Spark's left fold. (A list_reduce struct-
      // accumulator fold was the first attempt; DuckDB 1.0 CLOBBERS the
      // accumulator when the keep branch fires twice in a row —
      // [24,54,84] folds to [84] — so the oracle avoids struct lambdas.)
      s"""WITH RECURSIVE p AS (
         |  SELECT doc_id,
         |         repeat(chr(CAST(97 + doc_id % 5 AS INT)), CAST(doc_id % 10 AS INT)) ||
         |         repeat('segment' || CAST(doc_id // 10 AS VARCHAR) || ' ', 20) AS txt
         |  FROM documents),
         |b AS (SELECT doc_id, txt, CAST(length(txt) AS BIGINT) AS len FROM p),
         |pos AS (SELECT doc_id, txt, len,
         |               CAST(unnest(range(1, len + 1)) AS BIGINT) AS i FROM b),
         |hp AS (
         |  SELECT doc_id, len, i,
         |         $hTerms AS h
         |  FROM pos),
         |cand AS (SELECT doc_id, i FROM hp WHERE i >= 8 AND h % 64 = 0),
         |keep(doc_id, kb) AS (
         |  SELECT doc_id, MIN(i) FROM cand WHERE i >= 24 GROUP BY doc_id
         |  UNION ALL
         |  SELECT k.doc_id,
         |         (SELECT MIN(c.i) FROM cand c
         |          WHERE c.doc_id = k.doc_id AND c.i >= k.kb + 24)
         |  FROM keep k
         |  WHERE EXISTS (SELECT 1 FROM cand c
         |                WHERE c.doc_id = k.doc_id AND c.i >= k.kb + 24)),
         |bd AS (SELECT doc_id, kb AS end_pos FROM keep
         |       UNION SELECT doc_id, len AS end_pos FROM b),
         |sp AS (SELECT bd.doc_id, b.txt, bd.end_pos,
         |              COALESCE(lag(bd.end_pos) OVER (PARTITION BY bd.doc_id
         |                ORDER BY bd.end_pos), 0) + 1 AS start_pos,
         |              row_number() OVER (PARTITION BY bd.doc_id
         |                ORDER BY bd.end_pos) - 1 AS chunk_idx
         |       FROM bd JOIN b USING (doc_id))
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |       CAST(start_pos AS BIGINT) AS start_pos,
         |       CAST(end_pos - start_pos + 1 AS BIGINT) AS chunk_bytes,
         |       md5(substring(txt, CAST(start_pos AS INT),
         |                     CAST(end_pos - start_pos + 1 AS INT))) AS chunk_md5
         |FROM sp ORDER BY doc_id, chunk_idx""".stripMargin
    },
    "mm_cdc_chunks_maxclamp" -> {
      val hTerms = (0 until 8).map { j =>
        val coef = BigInt(31).pow(j).toLong
        if (j == 0) s"CAST(ord(substring(txt, CAST(i AS INT), 1)) AS BIGINT) * $coef"
        else s"CAST(CASE WHEN i >= ${j + 1} THEN ord(substring(txt, CAST(i - $j AS INT), 1)) ELSE 0 END AS BIGINT) * $coef"
      }.mkString("\n        |         + ")
      // the next boundary from `last` is the smallest candidate inside
      // [last+minChunk, last+maxChunk] — or FORCED at last+maxChunk when
      // that range holds none; recursion emits boundaries strictly
      // before the payload end, which always closes the final chunk
      s"""WITH RECURSIVE p AS (
         |  SELECT doc_id,
         |         repeat(chr(CAST(97 + doc_id % 5 AS INT)), CAST(doc_id % 10 AS INT)) ||
         |         repeat('segment' || CAST(doc_id // 10 AS VARCHAR) || ' ', 20) AS txt
         |  FROM documents),
         |b AS (SELECT doc_id, txt, CAST(length(txt) AS BIGINT) AS len FROM p),
         |pos AS (SELECT doc_id, txt, len,
         |               CAST(unnest(range(1, len + 1)) AS BIGINT) AS i FROM b),
         |hp AS (
         |  SELECT doc_id, len, i,
         |         $hTerms AS h
         |  FROM pos),
         |cand AS (SELECT doc_id, i FROM hp WHERE i >= 8 AND h % 64 = 0),
         |keep(doc_id, kb) AS (
         |  SELECT doc_id, nb FROM (
         |    SELECT bb.doc_id, bb.len,
         |           COALESCE((SELECT MIN(c.i) FROM cand c
         |                     WHERE c.doc_id = bb.doc_id
         |                       AND c.i BETWEEN 24 AND 64),
         |                    CAST(64 AS BIGINT)) AS nb
         |    FROM b bb) t0
         |  WHERE nb < len
         |  UNION ALL
         |  SELECT doc_id, nb FROM (
         |    SELECT k.doc_id, bb.len,
         |           COALESCE((SELECT MIN(c.i) FROM cand c
         |                     WHERE c.doc_id = k.doc_id
         |                       AND c.i BETWEEN k.kb + 24 AND k.kb + 64),
         |                    k.kb + 64) AS nb
         |    FROM keep k JOIN b bb ON bb.doc_id = k.doc_id) t1
         |  WHERE nb < len),
         |bd AS (SELECT doc_id, kb AS end_pos FROM keep
         |       UNION SELECT doc_id, len AS end_pos FROM b),
         |sp AS (SELECT bd.doc_id, b.txt, bd.end_pos,
         |              COALESCE(lag(bd.end_pos) OVER (PARTITION BY bd.doc_id
         |                ORDER BY bd.end_pos), 0) + 1 AS start_pos,
         |              row_number() OVER (PARTITION BY bd.doc_id
         |                ORDER BY bd.end_pos) - 1 AS chunk_idx
         |       FROM bd JOIN b USING (doc_id))
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |       CAST(start_pos AS BIGINT) AS start_pos,
         |       CAST(end_pos - start_pos + 1 AS BIGINT) AS chunk_bytes,
         |       md5(substring(txt, CAST(start_pos AS INT),
         |                     CAST(end_pos - start_pos + 1 AS INT))) AS chunk_md5
         |FROM sp ORDER BY doc_id, chunk_idx""".stripMargin
    },
  )
}
