package graft

import org.apache.spark.sql.DataFrame

/** Session-wide registry of DataFrames the operator modules persist.
  *
  * Spark's cache manager dedups `persist` calls by canonicalized plan, so
  * repeat queries over one sfDir share one entry — but entries for
  * DIFFERENT sfDirs are distinct plans and accumulate in a long-lived
  * session until a blanket `spark.catalog.clearCache()`. A driver that
  * walks several scale factors (or corpus revisions) should call
  * [[unpersistAll]] between them to release only what this library pinned,
  * leaving any caller-managed cache entries alone.
  */
object CacheLifecycle {

  private val frames =
    java.util.Collections.synchronizedList(new java.util.ArrayList[DataFrame]())

  /** Record a persisted frame for later release; returns it unchanged. */
  def tracked(df: DataFrame): DataFrame = {
    frames.add(df)
    df
  }

  /** Release every intermediate the library has persisted (non-blocking). */
  def unpersistAll(): Unit = {
    val snapshot = frames.synchronized {
      val s = new java.util.ArrayList[DataFrame](frames)
      frames.clear()
      s
    }
    snapshot.forEach(df => df.unpersist(false))
  }
}
