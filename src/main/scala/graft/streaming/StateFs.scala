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
  * property. Object-store posture: every CONTROL operation the state
  * machinery commits through is a single-object create (batch markers,
  * horizon markers, tree `_published` markers) — atomic on local,
  * HDFS, and S3-like stores alike. `rename` (atomic on local/HDFS,
  * copy-based on S3-likes) appears nowhere on a commit path anymore:
  * the index compaction/erasure swap publishes a NEW tree and flips
  * readers to it with one marker create
  * (`EventStream.compactBatchDirs`), the table-format snapshot-pointer
  * discipline.
  */
private[streaming] object StateFs {

  // the SHARED driver Hadoop conf, read-only here — `newHadoopConf()`
  // would CLONE the full SparkConf+Hadoop conf on every marker probe,
  // and committedSubdirs multiplies that by one exists() per subdir;
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

}
