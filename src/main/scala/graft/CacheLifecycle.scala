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

  /** Release every intermediate the library has persisted (non-blocking).
    * Each release is individually guarded: one frame failing to unpersist
    * (e.g. it belongs to an already-stopped session in a multi-session
    * driver) must not strand the frames after it — stranding pinned cache
    * entries is the exact leak this class exists to prevent.
    */
  def unpersistAll(): Unit = {
    val snapshot = frames.synchronized {
      val s = new java.util.ArrayList[DataFrame](frames)
      frames.clear()
      s
    }
    snapshot.forEach { df =>
      try df.unpersist(false)
      catch { case _: Throwable => () }
    }
  }
}
