package graft.sources

import org.apache.spark.sql.SparkSession

/** The `s3a://` read-path profile — the production counterpart of the
  * `file:` fixtures behind [[graft.operators.InventoryPipeline]]'s
  * `dataRoot` injection point (the reference is S3-native:
  * /root/reference/handler.go:146-164).
  *
  * Spark reads S3 through the Hadoop S3A filesystem, so "support s3a" is
  * pure configuration: no code in this library touches an AWS SDK type.
  * The pipeline code is scheme-agnostic by construction — every scan goes
  * through `spark.read.parquet(paths)` where paths carry their scheme —
  * so swapping `file:/fixtures` for `s3a://bucket/prefix` is exactly one
  * `dataRoot` argument plus this profile's configs.
  *
  * Runtime requirements (cluster-side, not compile-time): the
  * `hadoop-aws` module and its bundled AWS SDK on the executor/driver
  * classpath (provisioned by `--packages org.apache.hadoop:hadoop-aws` or
  * a cluster image; deliberately NOT a compile dependency of this library
  * — this container has no such jar and no network, which is why
  * [[isAvailable]] exists and the s3a test self-skips).
  */
object S3aProfile {

  /** Credential chain: static keys > profile/instance metadata default
    * chain > anonymous (public buckets). Mirrors the reference's static
    * `credentials.NewStaticCredentials` (handler.go:40-41) when keys are
    * given, and improves on it (the reference supports ONLY static keys).
    */
  final case class Creds(
      accessKey: Option[String] = None,
      secretKey: Option[String] = None,
      anonymous: Boolean = false)

  /** The Hadoop configs the profile sets, as data — applied via [[apply]],
    * unit-testable without any s3a class on the classpath.
    *
    * @param endpoint  custom endpoint (MinIO/localstack-style) — None for AWS
    * @param pathStyle path-style access (required by most S3 emulators)
    * @param region    explicit region, None to let the SDK resolve
    */
  def configs(
      creds: Creds = Creds(),
      endpoint: Option[String] = None,
      pathStyle: Boolean = false,
      region: Option[String] = None): Map[String, String] = {
    val base = Map(
      // vectored/ranged reads: parquet footer + row-group reads without
      // full-object GETs (the reference buffers whole objects in memory,
      // handler.go:147 — at 100 TB that is the difference between reading
      // footers and reading everything)
      "fs.s3a.experimental.input.fadvise" -> "random",
      "fs.s3a.connection.maximum" -> "96",
      // directory-listing consistency knobs for large inventories
      "fs.s3a.paging.maximum" -> "5000")
    val cred = creds match {
      case Creds(Some(ak), Some(sk), _) => Map(
        "fs.s3a.access.key" -> ak,
        "fs.s3a.secret.key" -> sk,
        "fs.s3a.aws.credentials.provider" ->
          "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider")
      case Creds(_, _, true) => Map(
        "fs.s3a.aws.credentials.provider" ->
          "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider")
      case _ => Map.empty[String, String] // default provider chain
    }
    val ep = endpoint.map("fs.s3a.endpoint" -> _).toMap
    val ps = if (pathStyle) Map("fs.s3a.path.style.access" -> "true") else Map.empty
    val rg = region.map("fs.s3a.endpoint.region" -> _).toMap
    base ++ cred ++ ep ++ ps ++ rg
  }

  /** Apply the profile to a live session's Hadoop configuration. */
  def apply(
      spark: SparkSession,
      creds: Creds = Creds(),
      endpoint: Option[String] = None,
      pathStyle: Boolean = false,
      region: Option[String] = None): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    configs(creds, endpoint, pathStyle, region).foreach { case (k, v) => hc.set(k, v) }
  }

  /** True iff the S3A filesystem is actually loadable — i.e. hadoop-aws is
    * on the classpath. Tests use this to self-skip where the environment
    * (like this offline container) cannot run a real s3a read.
    */
  def isAvailable: Boolean =
    try { Class.forName("org.apache.hadoop.fs.s3a.S3AFileSystem"); true }
    catch { case _: Throwable => false }
}
