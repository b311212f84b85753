package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Shared maintenance primitives for every persisted-index family
 * (IVF / IVF-PQ cell tables, the text index, the flat signature-index
 * family):
 *
 *   - a best-effort single-maintainer MUTEX — the
 *     [[graft.sketch.SketchView]] `_compact_lock` protocol (exclusive
 *     create + stale-break by atomic rename with token verification)
 *     ported verbatim, so two maintenance calls on the same index
 *     (a nightly compact racing an urgent takedown) cannot interleave
 *     journal/prune/rename;
 *   - a streaming-writer LEASE — sinks heartbeat a `_writer_heartbeat`
 *     file each micro-batch; mutations whose contract REQUIRES the
 *     writer stopped (removals, backfill, the text-index stats fold)
 *     refuse while a heartbeat is fresh instead of silently losing or
 *     double-counting a replay. The documented stop-the-writer flow:
 *     stop the streaming query, then [[releaseWriterLease]], then
 *     mutate.
 *
 * Caveats are the SketchView ones: atomic-create/rename semantics hold
 * on HDFS/local; object stores are best-effort — keep the nightly
 * scheduler as the real mutex.
 */
object Maintenance {

  private val LockFile = "_maintenance_lock"
  private val LeaseFile = "_writer_heartbeat"

  /** Locks older than this are presumed crashed and broken. */
  val LockStaleMs: Long = 6L * 3600000L

  /** A writer heartbeat younger than this marks the stream LIVE; a
    * stopped-but-unreleased lease ages out after it (a crashed writer
    * must not wedge maintenance forever). */
  val DefaultWriterLeaseMs: Long = 15L * 60000L

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Run `body` holding the single-maintainer lock at `rootPath`
    * (the lock file lives INSIDE the root — fine for cell-table roots,
    * whose subdirectories are swapped but whose root persists). */
  def withLock[T](spark: SparkSession, rootPath: String)(body: => T): T =
    withLockAt(spark, new Path(new Path(rootPath), LockFile))(body)

  /** Flat-index form: takedown swaps replace the index DIRECTORY
    * itself, so the lock lives BESIDE it (`<path>__maintenance_lock`)
    * where a swap cannot destroy it mid-hold. */
  def withSiblingLock[T](spark: SparkSession, path: String)(body: => T): T =
    withLockAt(spark,
      new Path(path.stripSuffix("/") + "__maintenance_lock"))(body)

  private def withLockAt[T](spark: SparkSession, lockPath: Path)(body: => T): T = {
    val fs = fsOf(spark, lockPath)
    val lock = acquire(fs, lockPath)
    try body finally fs.delete(lock, false)
  }

  /** The SketchView stale-break protocol: an exclusive create of the
    * lock file carrying the acquire time. A second maintainer finding
    * a FRESH lock fails fast; a lock older than [[LockStaleMs]] is
    * presumed crashed and broken by ATOMIC RENAME to a per-breaker
    * tombstone — of two concurrent breakers only one's rename
    * succeeds, so a breaker can never blind-delete a lock another
    * breaker just re-created. After the rename wins, the breaker
    * verifies the tombstone still carries the stale token it based
    * the break on; a mismatch means it stole a LIVE lock — it renames
    * the lock back and aborts. */
  private def acquire(fs: FileSystem, p: Path): Path = {
    val token = s"${System.currentTimeMillis()} ${System.nanoTime()}"
    def readTokenOf(path: Path): String =
      try {
        val in = fs.open(path)
        val b = new Array[Byte](64)
        val n = try in.read(b) finally in.close()
        new String(b, 0, math.max(n, 0), "UTF-8").trim
      } catch { case _: Exception => "" }
    def tryCreate(): Boolean =
      try {
        val out = fs.create(p, false)
        try out.write(token.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (!tryCreate()) {
      val observed = readTokenOf(p)
      val stale =
        try {
          val ts = observed.split(' ').head.toLong
          System.currentTimeMillis() - ts > LockStaleMs
        } catch { case _: Exception => true } // unreadable = stale
      if (!stale)
        throw new IllegalStateException(
          s"another maintenance op holds $p (fresh lock) — index " +
            "maintenance is single-maintainer; wait for it or remove a " +
            "stale lock")
      val tomb = new Path(p.getParent, s".${p.getName}_tomb_${System.nanoTime()}")
      if (!fs.rename(p, tomb))
        throw new IllegalStateException(
          s"lost the race breaking the stale lock $p (another breaker won)")
      if (readTokenOf(tomb) != observed) {
        // we renamed a lock that CHANGED since the staleness read — a
        // live holder re-acquired in between; put it back and abort
        fs.rename(tomb, p)
        throw new IllegalStateException(
          s"aborted breaking $p: the lock was re-acquired mid-break")
      }
      fs.delete(tomb, false)
      if (!tryCreate())
        throw new IllegalStateException(
          s"lost the race re-acquiring $p after breaking a stale lock")
    }
    // ownership check: if a concurrent stale-breaker clobbered our
    // lock between create and here, back off instead of double-running
    if (readTokenOf(p) != token)
      throw new IllegalStateException(
        s"lost the race re-acquiring $p after breaking a stale lock")
    p
  }

  // ---------------------------------------------------------------- //
  // Streaming-writer lease                                            //
  // ---------------------------------------------------------------- //

  /** Refresh the writer heartbeat at `rootPath` — called by every
    * streaming index sink once per micro-batch (one tiny FS write). */
  def heartbeat(spark: SparkSession, rootPath: String): Unit = {
    val p = new Path(new Path(rootPath), LeaseFile)
    val fs = fsOf(spark, p)
    val out = fs.create(p, true)
    try out.write(System.currentTimeMillis().toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** Release the writer lease after STOPPING the streaming query —
    * the handshake that lets writer-exclusive maintenance (removals,
    * backfill, stats folds) proceed immediately instead of waiting
    * out [[DefaultWriterLeaseMs]]. */
  def releaseWriterLease(spark: SparkSession, rootPath: String): Unit = {
    val p = new Path(new Path(rootPath), LeaseFile)
    fsOf(spark, p).delete(p, false)
  }

  /** Enforce the "streaming writer stopped" precondition: refuse when
    * a writer heartbeat at `rootPath` is younger than `horizonMs`.
    * No heartbeat (pure-batch index, or a released lease) passes; a
    * stale heartbeat (crashed writer) passes after the horizon. */
  def requireWriterStopped(
      spark: SparkSession,
      rootPath: String,
      horizonMs: Long = DefaultWriterLeaseMs): Unit = {
    val p = new Path(new Path(rootPath), LeaseFile)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return
    val ts =
      try {
        val in = fs.open(p)
        val b = new Array[Byte](64)
        val n = try in.read(b) finally in.close()
        new String(b, 0, math.max(n, 0), "UTF-8").trim.toLong
      } catch { case _: Exception => return } // unreadable = no lease
    val age = System.currentTimeMillis() - ts
    if (age < horizonMs)
      throw new IllegalStateException(
        s"a streaming writer heartbeat at $rootPath is ${age}ms old " +
          s"(horizon ${horizonMs}ms) — this mutation requires the " +
          "writer STOPPED: stop the query, call " +
          "Maintenance.releaseWriterLease, then retry")
  }
}
