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

  private val releases = java.util.Collections.synchronizedList(
    new java.util.ArrayList[() => Unit]())

  /** Record a persisted frame for later release; returns it unchanged. */
  def tracked(df: DataFrame): DataFrame = {
    frames.add(df)
    df
  }

  /** Persist-or-reuse — the session-persist entry point for every
    * multi-consumer intermediate (`df.transform(sessionPersist)`). A
    * re-invoked operator builds a fresh but canonically-equal plan; the
    * cache manager would serve it from the existing entry anyway, but
    * calling `persist` again logs 'Asked to cache already cached data'
    * per invocation and appends a duplicate entry here. The bridge check
    * makes re-invocations silent no-ops; only the FIRST invocation pins
    * and registers the frame, and [[unpersistAll]] releases exactly one
    * entry per distinct plan.
    *
    * Limitation: the bridge's `isCached` reads the classic cache manager
    * and answers `false` for any non-classic Dataset/SparkSession (e.g.
    * Spark Connect), where this degrades to the old
    * duplicate-persist-and-track behavior — duplicate lifecycle entries
    * plus 'Asked to cache already cached data' log spam, but no
    * correctness change. Fine for this local-mode repo; a Connect-based
    * driver would want a Connect-side cache probe.
    */
  def sessionPersist(df: DataFrame): DataFrame =
    if (org.apache.spark.sql.GraftSqlBridge.isCached(df)) df
    else tracked(
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Record a sketch/side-data broadcast for executor-side release.
    * Broadcast blocks otherwise live until driver GC drops the last
    * reference — a long session invoking sketch operators repeatedly
    * (e.g. the two bench loops) accumulates them exactly like stranded
    * cache entries.
    */
  def trackedBroadcast[T](bc: org.apache.spark.broadcast.Broadcast[T])
      : org.apache.spark.broadcast.Broadcast[T] = {
    broadcasts.add(bc)
    bc
  }

  /** Record an arbitrary release action (e.g. freeing a localCheckpoint'ed
    * generation whose blocks `Dataset.unpersist` cannot reach). Actions
    * must be idempotent — they may run after the resource was already
    * released eagerly.
    */
  def trackedRelease(f: () => Unit): Unit = releases.add(f)

  /** Persist-vs-localCheckpoint generation rotation for iterative
    * algorithms (connected components, k-means): early rounds persist
    * (cheap, releasable); past `localCheckpointDepth` the generation is
    * `localCheckpoint`ed instead, truncating the otherwise-compounding
    * logical plan. Returns the pinned frame plus its eager-release
    * action. Checkpoint releases are ALSO registered here so
    * [[unpersistAll]] frees the FINAL generation an algorithm returns to
    * its caller — the caller holds no release handle, and plain
    * unpersist/clearCache cannot reach checkpoint blocks.
    *
    * Fault-tolerance trade: `localCheckpoint` blocks live on executors
    * and do not survive executor loss; a production run on a lossy
    * cluster should swap in reliable `checkpoint` against a checkpoint
    * dir at the cost of one write per generation.
    */
  def materializeGeneration(df: DataFrame, round: Int,
      localCheckpointDepth: Int): (DataFrame, () => Unit) =
    if (round >= localCheckpointDepth) {
      val cp = df.localCheckpoint(false)
      val release = () =>
        org.apache.spark.sql.GraftSqlBridge.unpersistLocalCheckpoint(cp)
      trackedRelease(release)
      (cp, release)
    } else {
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        .transform(tracked)
      (p, () => { p.unpersist(false); () })
    }

  /** One memo slot: `frame` is a Scala lazy val, so the expensive build
    * runs at most once, serialized on THIS holder's monitor — per-key
    * locking without ever holding the map's lock during a Spark action
    * (computeIfAbsent only constructs the cheap holder). Serialization
    * matters beyond wasted work: a memoized build may carry filesystem
    * side effects (Layout's cluster+parquet write), where two racing
    * builds would overwrite the same directory concurrently.
    */
  private final class MemoSlot(build0: () => DataFrame) {
    lazy val frame: DataFrame = build0()
  }

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, MemoSlot]()

  private val durableMemo =
    new java.util.concurrent.ConcurrentHashMap[String, MemoSlot]()

  private def memoizedIn(
      map: java.util.concurrent.ConcurrentHashMap[String, MemoSlot],
      key: String)(build: => DataFrame): DataFrame = {
    val holder = map.computeIfAbsent(key, _ => new MemoSlot(() => build))
    // forcing the lazy val happens OUTSIDE the map's lock; a second
    // thread racing on the same key blocks on the holder until the one
    // build finishes, then reads the cached frame
    val df = holder.frame
    // a hit bound to a stopped session is a dead frame (the driver
    // stopped and recreated its session without calling unpersistAll);
    // drop it and rebuild against the live session rather than hand the
    // caller a frame whose every action throws
    if (!df.sparkSession.sparkContext.isStopped) df
    else {
      map.remove(key, holder)
      memoizedIn(map, key)(build)
    }
  }

  /** Session-memoize a DRIVER-SIDE computation's result frame. Plan-level
    * cache dedup ([[sessionPersist]]) cannot help an operator whose
    * construction RUNS a driver loop (connected components, k-means):
    * a re-invocation replays every round's actions before returning a
    * plan-identical frame. This caches the returned frame under an
    * explicit key instead, so the second consumer (e.g. cluster reps
    * after clusters) skips the loop entirely. Cleared by
    * [[unpersistAll]] — the memoized frames are typically
    * localCheckpoint-backed, and a released checkpoint CANNOT be
    * recomputed (truncated lineage), so holding them across a cache
    * reset would hand out dead frames. Builds are serialized per key
    * (see [[MemoSlot]]) and must be idempotent only across SESSIONS,
    * never concurrently within one.
    */
  def memoized(key: String)(build: => DataFrame): DataFrame =
    memoizedIn(memo, key)(build)

  /** Like [[memoized]] but the entry SURVIVES [[unpersistAll]] — for
    * builds whose side effect lands on DISK (e.g. Layout's cluster +
    * parquet write) and whose returned frame's lineage reads only those
    * files: re-executing it after a blanket cache reset is correct and
    * cheap, so clearing the memo would only force the expensive write to
    * replay (and, in a bench loop that resets caches between timed
    * loops, put write I/O noise into a read-path measurement). The
    * dead-session guard still applies — a frame from a stopped session
    * is rebuilt, which re-runs the write against the live session.
    */
  def memoizedDurable(key: String)(build: => DataFrame): DataFrame =
    memoizedIn(durableMemo, key)(build)

  /** Release every intermediate the library has pinned — persisted frames
    * and sketch broadcasts — non-blocking. Each release is individually
    * guarded: one frame failing to unpersist (e.g. it belongs to an
    * already-stopped session in a multi-session driver) must not strand
    * the entries after it — stranding pinned blocks is the exact leak
    * this class exists to prevent.
    */
  def unpersistAll(): Unit = {
    memo.clear()
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
      // unpersist, NOT destroy: destroy would permanently poison any
      // still-held DataFrame whose plan embeds the broadcast (re-running
      // it throws "used after destroy"), while unpersist frees the
      // executor-side blocks — the accumulation this guards against —
      // and lets a re-executed plan lazily re-ship from the driver copy
      try bc.unpersist(false)
      catch { case _: Throwable => () }
    }
    val releaseSnapshot = releases.synchronized {
      val s = new java.util.ArrayList[() => Unit](releases)
      releases.clear()
      s
    }
    releaseSnapshot.forEach { f =>
      try f()
      catch { case _: Throwable => () }
    }
  }
}
