package graft.sources

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** One data file named by an inventory manifest.
  * Reference model: /root/reference/types.go:28-32 (`File{Key, Size, MD5checksum}`).
  */
final case class ManifestFile(key: String, size: Long, md5Checksum: String)

/** The inventory manifest control document.
  * Reference model: /root/reference/types.go:35-43 (`Inventory`). The manifest is
  * driver-side control-plane metadata: it names the source bucket and the exact
  * parquet file set of one inventory delivery. It is never a scanned table.
  */
final case class Inventory(
    sourceBucket: String,
    destinationBucket: String,
    version: String,
    fileFormat: String,
    files: Seq[ManifestFile]) {

  /** The scan path list for `spark.read.parquet(paths: _*)`. One multi-path read
    * (an implicit UNION ALL) deliberately fixes the reference's per-file
    * overwrite bug (/root/reference/handler.go:83-91,231,252 — each file's
    * aggregate replaced the previous file's; README.md:15-17 documents the
    * accumulate-across-all-files intent).
    */
  def dataPaths(root: String): Seq[String] = files.map(f => s"$root/${f.key}")
}

/** Manifest key resolution + parsing — pure driver-side logic, unit-testable
  * with a fake clock and a fake object-store probe.
  *
  * Reference: /root/reference/handler.go:96-143.
  */
object Manifest {

  /** Go layout `"2006-01-02T15-04Z"` (/root/reference/handler.go:107). */
  private val keyDateFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH-mm'Z'").withZone(ZoneOffset.UTC)

  /** Rebuild the timestamp at 01:00:00 UTC of its calendar day — AWS delivers
    * daily inventory manifests under a key pinned to 01:00 UTC
    * (/root/reference/handler.go:105).
    */
  def pinTo0100Utc(ts: Instant): Instant =
    ts.atZone(ZoneOffset.UTC).toLocalDate.atTime(1, 0).toInstant(ZoneOffset.UTC)

  /** `2026-08-12T01-00Z`-style key segment (/root/reference/handler.go:107). */
  def formatKeyDate(ts: Instant): String = keyDateFmt.format(pinTo0100Utc(ts))

  /** Split `s3://bucket/some/prefix` into (bucket, prefix); error when there is
    * no `/` after the bucket (/root/reference/handler.go:109-115). Scheme-
    * agnostic so `file://`-rooted fixtures run through the identical code path.
    */
  def splitBucketPrefix(path: String): Either[String, (String, String)] = {
    val stripped = path.replaceFirst("^[a-zA-Z0-9]+://", "") // handler.go:109 TrimPrefix
    stripped.split("/", 2) match { // handler.go:110 SplitN
      case Array(bucket, prefix) if bucket.nonEmpty => Right((bucket, prefix))
      case _ => Left(s"invalid path (expected bucket/prefix): $path")
    }
  }

  /** `prefix/YYYY-MM-DDTHH-MMZ/manifest.json` (/root/reference/handler.go:117). */
  def manifestKey(prefix: String, ts: Instant): String =
    s"$prefix/${formatKeyDate(ts)}/manifest.json"

  /** Previous-day fallback (/root/reference/handler.go:119-134): if the
    * manifest for `ts`'s day is absent, retry exactly one day earlier — no
    * further. `fetch` returns None for not-found and throws for any other
    * failure (which must propagate, matching the reference's error handling).
    */
  def resolveWithFallback[A](ts: Instant)(fetch: Instant => Option[A]): Option[A] =
    fetch(ts).orElse(fetch(ts.minus(1, ChronoUnit.DAYS)))

  private val mapper = new ObjectMapper()

  /** Parse the manifest JSON (/root/reference/handler.go:136-142). Jackson is
    * already on the Spark classpath; the manifest is a <1 MB control file so a
    * driver-side parse is the right tool — no distributed read.
    */
  def parseInventory(json: String): Inventory = {
    val root: JsonNode = mapper.readTree(json)
    def str(field: String): String =
      Option(root.get(field)).map(_.asText("")).getOrElse("")
    val files = Option(root.get("files")).toSeq
      .flatMap(_.elements().asScala)
      .map { f =>
        ManifestFile(
          key = Option(f.get("key")).map(_.asText("")).getOrElse(""),
          size = Option(f.get("size")).map(_.asLong(0L)).getOrElse(0L),
          md5Checksum = Option(f.get("MD5checksum")).map(_.asText("")).getOrElse(""))
      }
      .toSeq
    Inventory(
      sourceBucket = str("sourceBucket"),
      destinationBucket = str("destinationBucket"),
      version = str("version"),
      fileFormat = str("fileFormat"),
      files = files)
  }
}
