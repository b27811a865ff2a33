package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / frame-sample
  * stages shaped for a real pipeline.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode kernel is a clearly-marked deterministic stub ([[stubDecode]]) —
  * but everything around it is real and load-bearing at scale: the schema
  * (binary payload + metadata struct), the partition-preserving
  * `mapPartitions` batch shape (the Scala analogue of `mapInPandas`: one
  * iterator per partition so a heavyweight decoder is initialized once per
  * partition, not per row), and the narrow, shuffle-free plan.
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

  /** STUB — stands in for a real image/audio decoder (??? in spirit): derives
    * a deterministic pseudo-feature vector from payload bytes. Replace the
    * body with e.g. a JNI codec call; the partitioning, batching and schema
    * around it are the real design.
    */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0
      i += 1
    }
    out
  }

  /** Resize stage (STUB codec, real plumbing): downsample the payload by
    * keeping every `factor`-th byte — the byte-level stand-in for an image
    * resize. Narrow, codegen-friendly when expressed over the binary column;
    * kept as a plain function so [[extractFeatures]]-style partition stages
    * can fuse it with decode.
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
    * real codec behind the stubbed stages: same input contract ((doc_id,
    * payload)), same narrow shuffle-free plan, same failure accounting.
    */
  def extractImageFeatures(withPayload: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[ImageFeatures]
    withPayload.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
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
            features = stubDecode(payload, dim))
        }
      }(enc)
      .toDF()
  }
}
