package graft.sources

import java.io.File
import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A Hadoop `FileSystem` for the `mockos://` scheme: bucket-addressed
  * object-store semantics backed by a local directory
  * (`mockos://bucket/key` → `/tmp/graft-mockos/bucket/key`).
  *
  * Purpose: exercise the REAL egress path the pipeline takes to cloud
  * storage. Parquet/JSON writers, committers, and manifest listings
  * all talk to storage through the Hadoop FileSystem API — on a
  * cluster `fs.s3a.impl`/gs/abfs resolve the scheme; in tests this
  * class does, registered the exact same way
  * (`fs.mockos.impl = graft.sources.MockObjectStoreFs`). Nothing in
  * the pipeline is local-path-aware, which is the property the mock
  * proves.
  */
class MockObjectStoreFs extends RawLocalFileSystem {

  override def getScheme: String = "mockos"

  override def getUri: URI = URI.create("mockos:///")

  override def initialize(uri: URI, conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(uri, conf)
    // the backing root must pre-exist: mkdirs() recursion bottoms out
    // at the bucket (path "/"), whose single-level mkdir needs it
    new File(MockObjectStoreFs.Root).mkdirs()
  }

  /** Accept any authority (= bucket) — buckets are path roots here. */
  override def checkPath(path: Path): Unit = ()

  override def pathToFile(path: Path): File = {
    val u = path.toUri
    val bucket = Option(u.getAuthority).getOrElse("")
    new File(MockObjectStoreFs.Root, bucket + u.getPath)
  }

  override def makeQualified(path: Path): Path = {
    val u = path.toUri
    if (u.getScheme == null) super.makeQualified(path) else path
  }

  /** RawLocalFileSystem stamps FileStatus paths from the backing
    * java.io.File — rebase them onto the bucket URI, or a consumer
    * (e.g. the output committer's mergePaths) would feed the backing
    * path back in and get double-mapped.
    */
  private def normalize(p: Path): Path = {
    val u = p.toUri
    val raw = u.getPath
    if (u.getAuthority == null && raw != null && raw.startsWith(MockObjectStoreFs.Root)) {
      val rel = raw.stripPrefix(MockObjectStoreFs.Root).stripPrefix("/")
      val i = rel.indexOf('/')
      if (i < 0) new Path(s"mockos://$rel/")
      else new Path("mockos://" + rel.substring(0, i) + rel.substring(i))
    } else p
  }

  private def fix(s: org.apache.hadoop.fs.FileStatus): org.apache.hadoop.fs.FileStatus =
    // rebuild as a plain FileStatus with synthetic permissions: object
    // stores have no POSIX bits (s3a synthesizes them the same way),
    // and RawLocalFileSystem's deprecated lazy permission loader
    // cannot re-read a mockos:// URI (it news a java.io.File from the
    // status path — LocatedFileStatus triggers that eagerly inside
    // FileSystem.listFiles recursion)
    new org.apache.hadoop.fs.FileStatus(s.getLen, s.isDirectory, 1,
      s.getBlockSize, s.getModificationTime, s.getAccessTime,
      null, null, null, normalize(s.getPath))

  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    fix(super.getFileStatus(f))

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(fix)
}

object MockObjectStoreFs {
  val Root = "/tmp/graft-mockos"

  /** Register the scheme on a session (same mechanism as setting
    * `fs.s3a.impl` in core-site).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockos.impl", classOf[MockObjectStoreFs].getName)
    // object stores have no working directory; pin one so relative
    // qualification never leaks the submitter's cwd
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockos.impl.disable.cache", "false")
  }
}
