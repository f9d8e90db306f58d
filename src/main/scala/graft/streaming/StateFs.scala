package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-`FileSystem` spellings of the streaming state-machinery file
  * operations — batch markers, seed guards, generation listings,
  * retention, compaction swaps. Every path resolves through
  * `Path.getFileSystem(hadoopConf)`, so the SAME code serves `file:`
  * paths in the sandbox and `hdfs:` / object-store URIs in a deployment;
  * the `java.io.File` forms these replace could never leave a local
  * disk, which made the 100 TB durability story a caveat instead of a
  * property. Object-store note (documented, not hidden): `rename` is
  * atomic on local/HDFS but copy-based on S3-like stores — a table
  * format's snapshot pointer is the production closure there; the
  * recovery protocol in `EventStream.compactBatchDirs` bounds the
  * exposure either way.
  */
private[streaming] object StateFs {

  // the SHARED driver Hadoop conf, read-only here — `newHadoopConf()`
  // would CLONE the full SparkConf+Hadoop conf on every marker probe,
  // and committedBatchDirs multiplies that by one exists() per subdir;
  // the shared instance also keys Hadoop's FileSystem cache, so repeat
  // calls reuse one client per scheme
  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    fsOf(spark, p).exists(p)
  }

  /** Create an empty marker file, parents included — idempotent (a
    * replayed commit overwrites the zero-byte marker with itself).
    */
  def touch(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    fs.mkdirs(p.getParent)
    fs.create(p, true).close()
  }

  /** Child names of `dir`; empty when the dir is missing (the java.io
    * `list() == null` case every caller used to special-case).
    */
  def list(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
  }

  /** Recursive delete; a missing path is a no-op. */
  def deleteRecursively(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    fsOf(spark, p).delete(p, true)
    ()
  }

  /** Rename `src` onto a non-existent `dst`; fails loudly — a swap that
    * half-happens silently is exactly the corruption the compaction
    * protocol exists to prevent.
    */
  def rename(spark: SparkSession, src: String, dst: String): Unit = {
    val s = new Path(src)
    require(fsOf(spark, s).rename(s, new Path(dst)),
      s"rename failed: $src -> $dst")
  }

  /** Write a small UTF-8 control-file (overwrite), parents included —
    * the vacuum-horizon record. Tiny metadata only, never data.
    */
  def writeString(spark: SparkSession, path: String, content: String): Unit = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a small UTF-8 control-file; None when missing. */
  def readString(spark: SparkSession, path: String): Option[String] = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    }
  }
}
