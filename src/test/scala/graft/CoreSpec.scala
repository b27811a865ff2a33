package graft

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Manifest

/** Pure driver-side logic: manifest key resolution, fallback, JSON parse.
  * Reference semantics under test: /root/reference/handler.go:96-143.
  */
class CoreSpec extends AnyFunSuite {

  test("pinTo0100Utc rebuilds the timestamp at 01:00:00 UTC of the same day") {
    val pinned = Manifest.pinTo0100Utc(Instant.parse("2026-08-12T17:45:12.345Z"))
    assert(pinned == Instant.parse("2026-08-12T01:00:00Z"))
  }

  test("pinTo0100Utc is idempotent and pins midnight to the same day") {
    assert(Manifest.pinTo0100Utc(Instant.parse("2026-08-12T00:00:00Z")) ==
      Instant.parse("2026-08-12T01:00:00Z"))
    assert(Manifest.pinTo0100Utc(Instant.parse("2026-08-12T01:00:00Z")) ==
      Instant.parse("2026-08-12T01:00:00Z"))
  }

  test("formatKeyDate uses the Go layout 2006-01-02T15-04Z (handler.go:107)") {
    assert(Manifest.formatKeyDate(Instant.parse("2026-08-12T17:45:12Z")) == "2026-08-12T01-00Z")
    assert(Manifest.formatKeyDate(Instant.parse("2024-02-29T23:59:59Z")) == "2024-02-29T01-00Z")
    // single-digit month/day zero-padded
    assert(Manifest.formatKeyDate(Instant.parse("2025-01-05T03:00:00Z")) == "2025-01-05T01-00Z")
  }

  test("manifestKey assembles prefix/date/manifest.json (handler.go:117)") {
    assert(Manifest.manifestKey("inv/prefix", Instant.parse("2026-08-12T12:00:00Z")) ==
      "inv/prefix/2026-08-12T01-00Z/manifest.json")
  }

  test("splitBucketPrefix strips scheme and splits on first slash (handler.go:109-115)") {
    assert(Manifest.splitBucketPrefix("s3://my-bucket/some/deep/prefix") ==
      Right(("my-bucket", "some/deep/prefix")))
    assert(Manifest.splitBucketPrefix("file://root/data") == Right(("root", "data")))
    assert(Manifest.splitBucketPrefix("s3://no-slash-after-bucket").isLeft)
  }

  test("resolveWithFallback retries exactly one day earlier on not-found (handler.go:119-134)") {
    val today = Instant.parse("2026-08-12T09:00:00Z")
    // found immediately: no fallback probe
    var probes = List.empty[Instant]
    val hit = Manifest.resolveWithFallback(today) { ts => probes ::= ts; Some(s"m@$ts") }
    assert(hit.contains(s"m@$today") && probes == List(today))
    // today missing, yesterday found
    probes = Nil
    val fb = Manifest.resolveWithFallback(today) { ts =>
      probes ::= ts
      if (ts == today) None else Some("yesterday")
    }
    assert(fb.contains("yesterday"))
    assert(probes.reverse == List(today, Instant.parse("2026-08-11T09:00:00Z")))
    // both missing: None, exactly two probes (no further fallback)
    probes = Nil
    assert(Manifest.resolveWithFallback(today) { ts => probes ::= ts; None }.isEmpty)
    assert(probes.size == 2)
    // non-not-found errors propagate
    intercept[RuntimeException] {
      Manifest.resolveWithFallback(today)(_ => throw new RuntimeException("forbidden"))
    }
    // …and propagate WITHOUT a previous-day probe: the fallback is for
    // not-found ONLY (handler.go:127-131 returns any other error as-is).
    // An always-throwing fixture can't see this — a mutant that swallows
    // the day-0 error and retries still throws on day −1 and slips
    // through the intercept above (found by the r18 mutation exercise).
    probes = Nil
    intercept[RuntimeException] {
      Manifest.resolveWithFallback(today) { ts =>
        probes ::= ts
        if (ts == today) throw new RuntimeException("forbidden")
        else Some("must not be reached")
      }
    }
    assert(probes == List(today),
      s"a day-0 error must not trigger the fallback probe: ${probes.reverse}")
  }

  test("parseInventory maps the manifest document (types.go:28-43)") {
    val json =
      """{
        |  "sourceBucket": "example-source-bucket",
        |  "destinationBucket": "arn:aws:s3:::example-destination-bucket",
        |  "version": "2016-11-30",
        |  "creationTimestamp": "1514944800000",
        |  "fileFormat": "Parquet",
        |  "fileSchema": "message s3.inventory { required binary bucket (STRING); }",
        |  "files": [
        |    {"key": "prefix/data/aaa.parquet", "size": 56291, "MD5checksum": "abc123"},
        |    {"key": "prefix/data/bbb.parquet", "size": 1024, "MD5checksum": "def456"}
        |  ]
        |}""".stripMargin
    val inv = Manifest.parseInventory(json)
    assert(inv.sourceBucket == "example-source-bucket")
    assert(inv.fileFormat == "Parquet")
    assert(inv.files.map(_.key) ==
      Seq("prefix/data/aaa.parquet", "prefix/data/bbb.parquet"))
    assert(inv.files.map(_.size) == Seq(56291L, 1024L))
    assert(inv.dataPaths("s3a://root") ==
      Seq("s3a://root/prefix/data/aaa.parquet", "s3a://root/prefix/data/bbb.parquet"))
  }

  test("parseInventory tolerates missing optional fields") {
    val inv = Manifest.parseInventory("""{"sourceBucket":"b"}""")
    assert(inv.sourceBucket == "b" && inv.files.isEmpty)
  }

  test("registry tripwire: no duplicate keys in either map; queries and oracles align") {
    // Scala Map literals keep the LAST duplicate key silently — a re-added
    // registry name would shadow the original verified definition with no
    // compile error and no runtime signal (it happened in round 10). The
    // runtime maps can't reveal duplicates, so this reads the SOURCE:
    // top-level registry entries are exactly the 4-space-indented
    // '"name" ->' lines.
    // the registry is split across graft/registry/*.scala (plus whatever
    // may remain in SparkEntry.scala): in each file, entries before the
    // `val oracles` (or legacy `def oracleSql`) marker are query keys,
    // entries after it oracle keys — scanning EVERY file keeps the
    // tripwire sound against cross-file re-additions too
    import scala.jdk.CollectionConverters._
    val regDir = java.nio.file.Paths.get("src/main/scala/graft/registry")
    val files = java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala") +:
      java.nio.file.Files.list(regDir).iterator().asScala.toSeq
        .filter(_.toString.endsWith(".scala"))
        // the pricing manifest holds artifact entries, not registry rows
        .filterNot(_.getFileName.toString == "PricingManifest.scala")
        .sortBy(_.toString)
    assert(files.size >= 2, s"registry files missing: $files")
    val entry = """(?m)^    "([a-z0-9_]+)" ->""".r
    def keys(span: String): Seq[String] = entry.findAllMatchIn(span).map(_.group(1)).toSeq
    val (q, o) = files.foldLeft((Seq.empty[String], Seq.empty[String])) {
      case ((qa, oa), f) =>
        val src = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
        val oi = math.max(src.indexOf("val oracles"), src.indexOf("def oracleSql"))
        if (oi < 0) (qa ++ keys(src), oa)
        else (qa ++ keys(src.substring(0, oi)), oa ++ keys(src.substring(oi)))
    }
    def dups(xs: Seq[String]) = xs.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    assert(dups(q).isEmpty, s"duplicate queries keys: ${dups(q).mkString(",")}")
    assert(dups(o).isEmpty, s"duplicate oracleSql keys: ${dups(o).mkString(",")}")
    assert(q.toSet == o.toSet,
      s"queries/oracle mismatch: only-queries=${(q.toSet -- o.toSet).mkString(",")} " +
        s"only-oracle=${(o.toSet -- q.toSet).mkString(",")}")
    // the source census must agree with the runtime maps (indentation
    // drift in a refactor would silently blind this tripwire otherwise)
    assert(q.size == SparkEntry.queries.size, s"${q.size} source vs runtime map")
    assert(o.size == SparkEntry.oracleSql.size)
  }

  test("pricing manifest tripwire: every memoized artifact is declared; pricing rows bypass their memo") {
    // The pricing-row convention (which registry row pays a shared
    // artifact's build, which rows serve it) lived in scaladoc prose
    // through ten r17 reroutes — this reads the SOURCE and keeps
    // registry/PricingManifest.scala honest: a reroute that forgets the
    // manifest, a consumer added without declaring it, or a pricing row
    // that silently starts reading its memo all fail here.
    import scala.jdk.CollectionConverters._
    import graft.registry.PricingManifest
    def read(p: java.nio.file.Path) =
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val entrySrc = read(java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala"))

    // 1. census of registered memo names (memoFrame/memoModel literals,
    //    interpolated names normalized; the bespoke bpeMergeCache counted
    //    under its accessor name)
    val memoPat = """memo(?:Frame|Model)(?:\[[^\]]*\])?\(s, dir,\s*s?"([^"]+)"\)""".r
    val scanned = memoPat.findAllMatchIn(entrySrc).map(_.group(1))
      .map(n => PricingManifest.interpolated.getOrElse(n, n)).toSet ++
      (if (entrySrc.contains("bpeMergeCache")) Set("bpeMerges") else Set.empty)
    assert(scanned == PricingManifest.artifacts.keySet,
      s"manifest drift: unlisted=${(scanned -- PricingManifest.artifacts.keySet).mkString(",")} " +
        s"stale=${(PricingManifest.artifacts.keySet -- scanned).mkString(",")}")

    // 2. per-accessor consumer scan of the registry sources: attribute
    //    every word-boundary accessor mention (calls AND row comments —
    //    a pricing row must not even name its accessor) to the enclosing
    //    registry row, queries section only
    val regDir = java.nio.file.Paths.get("src/main/scala/graft/registry")
    val regFiles = java.nio.file.Files.list(regDir).iterator().asScala.toSeq
      .filter(_.toString.endsWith(".scala"))
      .filterNot(_.getFileName.toString == "PricingManifest.scala")
    val rowPat = """^    "([a-z0-9_]+)" ->""".r
    val consumers: Map[String, Set[String]] = {
      val acc = scala.collection.mutable.Map.empty[String, Set[String]]
      regFiles.foreach { f =>
        val src = read(f)
        val oi = math.max(src.indexOf("val oracles"), src.indexOf("def oracleSql"))
        val span = if (oi < 0) src else src.substring(0, oi)
        var current: String = null
        span.linesIterator.foreach { line =>
          rowPat.findFirstMatchIn(line).foreach(m => current = m.group(1))
          if (current != null)
            PricingManifest.artifacts.values.map(_.accessor).foreach { a =>
              if (("""\b""" + a + """\b""").r.findFirstIn(line).isDefined)
                acc(a) = acc.getOrElse(a, Set.empty) + current
            }
        }
      }
      acc.toMap
    }

    val allRows = SparkEntry.queries.keySet
    PricingManifest.artifacts.foreach { case (name, p) =>
      val scannedRows = consumers.getOrElse(p.accessor, Set.empty)
      assert(scannedRows == p.servedBy,
        s"$name servedBy drift: scanned-only=${(scannedRows -- p.servedBy).mkString(",")} " +
          s"declared-only=${(p.servedBy -- scannedRows).mkString(",")}")
      assert(p.servedBy.subsetOf(allRows),
        s"$name serves unknown rows: ${(p.servedBy -- allRows).mkString(",")}")
      p.pricedBy.foreach { pr =>
        assert(allRows(pr), s"$name priced by unknown row $pr")
        assert(!scannedRows(pr),
          s"$name pricing row $pr reads (or names) the memo it must bypass")
      }
      if (p.pricedBy.isEmpty)
        assert(p.note.nonEmpty,
          s"$name is first-build-amortized but carries no note saying where " +
            "the build's cost story lives")
    }
    // 3. no undeclared accessor leakage: every scanned consumer set maps
    //    to exactly one manifest entry (accessor uniqueness)
    val accessors = PricingManifest.artifacts.values.map(_.accessor).toSeq
    assert(accessors.distinct.size == accessors.size, "duplicate accessors in manifest")
  }

  test("pricing tripwire (runtime half): violation shapes flag; healthy + interpolated pass") {
    // the Verify-side enforcement is PricingManifest.runtimeViolations
    // over SparkEntry's memo-touch log — pin each violation class on
    // synthetic logs so the assertion's polarity can never silently
    // invert (r18 verdict task 3: the text scan cannot see an accessor
    // reached through a renamed helper; the runtime counter can)
    import graft.registry.PricingManifest
    // 1. a pricing row that served its own memo (the hole the text scan
    //    cannot see) is flagged
    val v1 = PricingManifest.runtimeViolations(
      Set("dedup_simhash"), Map("dedup_simhash" -> Set("simhashSig")))
    assert(v1.exists(s => s.contains("pricing row 'dedup_simhash'") &&
      s.contains("simhashSig")), v1.mkString("; "))
    // 2. a serving row that ran but never touched its declared memo
    val v2 = PricingManifest.runtimeViolations(
      Set("dedup_block_skew"), Map.empty)
    assert(v2.exists(s => s.contains("serving row 'dedup_block_skew'") &&
      s.contains("simhashSig")), v2.mkString("; "))
    // 3. a memo name with no manifest entry
    val v3 = PricingManifest.runtimeViolations(
      Set("some_row"), Map("some_row" -> Set("mystery_memo")))
    assert(v3.exists(_.contains("mystery_memo")), v3.mkString("; "))
    // 4. healthy shape — serving row touches, pricing row doesn't
    assert(PricingManifest.runtimeViolations(
      Set("dedup_simhash", "dedup_block_skew"),
      Map("dedup_block_skew" -> Set("simhashSig"))).isEmpty)
    // 5. interpolated runtime names fold onto their manifest key: the
    //    sampled-PQ row's f0.5 touches satisfy the f1.0 manifest entries
    assert(PricingManifest.runtimeViolations(
      Set("ann_ivfpq_sampled"),
      Map("ann_ivfpq_sampled" -> Set(
        "pq_codes_f0.5", "pq_i2_f0.5", "prepared_emb", "cents_k4_i2"))).isEmpty)
    // 6. a row that did not run owes nothing
    assert(PricingManifest.runtimeViolations(Set.empty, Map.empty).isEmpty)
  }
}
