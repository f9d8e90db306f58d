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

  private val broadcasts = java.util.Collections.synchronizedList(
    new java.util.ArrayList[org.apache.spark.broadcast.Broadcast[_]]())

  /** Record a persisted frame for later release; returns it unchanged. */
  def tracked(df: DataFrame): DataFrame = {
    frames.add(df)
    df
  }

  /** Record a sketch/side-data broadcast for later destruction; returns it
    * unchanged. Broadcast blocks otherwise live until driver GC drops the
    * last reference — a long session invoking sketch operators repeatedly
    * (e.g. the two bench loops) accumulates them exactly like stranded
    * cache entries.
    */
  def trackedBroadcast[T](bc: org.apache.spark.broadcast.Broadcast[T])
      : org.apache.spark.broadcast.Broadcast[T] = {
    broadcasts.add(bc)
    bc
  }

  /** Release every intermediate the library has pinned — persisted frames
    * and sketch broadcasts — non-blocking. Each release is individually
    * guarded: one frame failing to unpersist (e.g. it belongs to an
    * already-stopped session in a multi-session driver) must not strand
    * the entries after it — stranding pinned blocks is the exact leak
    * this class exists to prevent.
    */
  def unpersistAll(): Unit = {
    val frameSnapshot = frames.synchronized {
      val s = new java.util.ArrayList[DataFrame](frames)
      frames.clear()
      s
    }
    frameSnapshot.forEach { df =>
      try df.unpersist(false)
      catch { case _: Throwable => () }
    }
    val bcSnapshot = broadcasts.synchronized {
      val s = new java.util.ArrayList[org.apache.spark.broadcast.Broadcast[_]](broadcasts)
      broadcasts.clear()
      s
    }
    bcSnapshot.forEach { bc =>
      // destroy, not unpersist: a superseded sketch is never re-broadcast,
      // so the driver-side copy should go too
      try bc.destroy()
      catch { case _: Throwable => () }
    }
  }
}
