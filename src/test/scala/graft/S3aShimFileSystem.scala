package graft

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, FSDataInputStream, FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** TEST-ONLY in-JVM `s3a://` scheme shim: a Hadoop FileSystem registered
  * as `fs.s3a.impl` that maps `s3a://<bucket>/<key>` onto a local
  * directory tree `<graft.s3ashim.root>/<bucket>/<key>`.
  *
  * Purpose: this container carries no hadoop-aws jar and no network, so
  * the REAL S3AFileSystem can never load here — but the library's own
  * claim ("every scan is scheme-agnostic; s3a is pure configuration",
  * [[graft.sources.S3aProfile]]) was previously config-checked only.
  * With the shim, the full manifest → parquet-scan → aggregate pipeline
  * EXECUTES against literal `s3a://` URIs through Hadoop's FileSystem
  * resolution machinery: scheme registration, authority (bucket)
  * handling, qualified-path round-trips through FileStatus, the parquet
  * committer's rename flow. What it deliberately does NOT emulate is the
  * S3A client itself (multipart, request signing, eventual listing) —
  * the env-gated live smoke (`GRAFT_S3A_TEST_ROOT`) covers that against
  * a real endpoint; see the runbook in PLANS.md.
  *
  * Instantiated reflectively by Hadoop — must stay top-level with a
  * no-arg constructor.
  */
class S3aShimFileSystem extends FileSystem {
  private var myUri: URI = _
  private var root: String = _
  private var workDir: Path = _
  private val local = new RawLocalFileSystem()

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    require(name.getAuthority != null, s"s3a URI needs a bucket: $name")
    myUri = URI.create("s3a://" + name.getAuthority)
    root = conf.get("graft.s3ashim.root")
    require(root != null, "graft.s3ashim.root must point at the backing dir")
    local.initialize(URI.create("file:///"), conf)
    workDir = new Path(myUri.toString + "/")
  }

  override def getScheme: String = "s3a"
  override def getUri: URI = myUri

  private def toLocal(p: Path): Path = {
    val q = if (p.isAbsolute) p else new Path(workDir, p)
    val u = q.toUri
    val bucket = Option(u.getAuthority).getOrElse(myUri.getAuthority)
    new Path("file:" + root + "/" + bucket + u.getPath)
  }

  private def fromLocal(p: Path): Path = {
    val rel = p.toUri.getPath.stripPrefix(root).stripPrefix("/")
    val slash = rel.indexOf('/')
    if (slash < 0) new Path(s"s3a://$rel")
    else new Path(s"s3a://${rel.substring(0, slash)}${rel.substring(slash)}")
  }

  // a FRESH eager status: mutating the raw-local one's path would break
  // its lazy permission loader (it re-derives a java.io.File from the
  // path, which must stay file-schemed)
  private def fix(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, fromLocal(st.getPath))

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    local.open(toLocal(f), bufferSize)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    local.create(toLocal(f), permission, overwrite, bufferSize, replication,
      blockSize, progress)

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    local.append(toLocal(f), bufferSize, progress)

  override def rename(src: Path, dst: Path): Boolean =
    local.rename(toLocal(src), toLocal(dst))

  override def delete(f: Path, recursive: Boolean): Boolean =
    local.delete(toLocal(f), recursive)

  override def listStatus(f: Path): Array[FileStatus] =
    local.listStatus(toLocal(f)).map(fix)

  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }
  override def getWorkingDirectory: Path = workDir

  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    local.mkdirs(toLocal(f), permission)

  override def getFileStatus(f: Path): FileStatus =
    fix(local.getFileStatus(toLocal(f)))
}
