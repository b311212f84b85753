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
 *     journal/prune/rename. Long-running holders RENEW the lock
 *     stamp on a daemon timer (period = staleness/4), so a legitimate
 *     multi-hour compact/retrain is never stale-broken mid-run;
 *     staleness is judged from the LAST RENEWAL, and release verifies
 *     the holder's own token before deleting (a lock stolen and
 *     re-created by a breaker is never clobbered by the old holder's
 *     `finally`).
 *   - a streaming-writer LEASE — sinks heartbeat a `_writer_heartbeat`
 *     file each micro-batch; mutations whose contract REQUIRES the
 *     writer stopped (removals, backfill, the text-index stats fold)
 *     refuse while a heartbeat is fresh instead of silently losing or
 *     double-counting a replay. The documented stop-the-writer flow:
 *     stop the streaming query, then [[releaseWriterLease]], then
 *     mutate.
 *   - the reverse handshake — writer-exclusive mutations run under
 *     [[withExclusiveLock]], which drops a `_writer_exclusive` marker
 *     for their duration; streaming sinks call
 *     [[requireNoExclusiveMaintenance]] before each micro-batch
 *     commit, so a batch arriving INSIDE a held removal/retrain
 *     window fails fast (and replays after release) instead of
 *     landing files the mutation never saw. This closes the
 *     check-then-act window in [[requireWriterStopped]]: the sink
 *     heartbeats FIRST, then checks the marker — so either the
 *     mutation sees a fresh heartbeat and refuses, or the sink sees
 *     the marker and refuses; there is no interleaving where both
 *     proceed.
 *
 * Caveats are the SketchView ones: atomic-create/rename semantics hold
 * on HDFS/local; object stores are best-effort — keep the nightly
 * scheduler as the real mutex.
 */
object Maintenance {

  private val LockFile = "_maintenance_lock"
  private val LeaseFile = "_writer_heartbeat"
  private val ExclusiveFile = "_writer_exclusive"

  /** The SketchView family's single-maintainer lock file — shared here
    * so the sink gate's liveness check and SketchView never drift on
    * the name (a silently-renamed lock would make a live backfill's
    * marker look orphaned and let a sink write mid-backfill). */
  private[graft] val CompactLockFile = "_compact_lock"

  /** Locks whose LAST RENEWAL is older than this are presumed crashed
    * and broken. Live holders renew on a staleness/4 timer, so only a
    * holder that actually died goes stale. */
  val LockStaleMs: Long = 6L * 3600000L

  /** A writer heartbeat younger than this marks the stream LIVE; a
    * stopped-but-unreleased lease ages out after it (a crashed writer
    * must not wedge maintenance forever). */
  val DefaultWriterLeaseMs: Long = 15L * 60000L

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readTokenOnce(fs: FileSystem, path: Path): String =
    try {
      val in = fs.open(path)
      val b = new Array[Byte](64)
      val n = try in.read(b) finally in.close()
      new String(b, 0, math.max(n, 0), "UTF-8").trim
    } catch { case _: Exception => "" }

  /** Read a token file, retrying transient empties: a renewal
    * overwrite (`fs.create(overwrite = true)`) truncates before it
    * writes, so a contender's read can land in the empty window and
    * mistake a LIVE lock for an unreadable (= stale) one. An existing
    * file that reads empty is re-read a few times before the empty is
    * believed; a missing file returns "" immediately. */
  private def readTokenOf(fs: FileSystem, path: Path): String = {
    var attempt = 0
    while (attempt < 6) {
      val t = readTokenOnce(fs, path)
      if (t.nonEmpty) return t
      if (!(try fs.exists(path) catch { case _: Exception => false }))
        return ""
      attempt += 1
      if (attempt < 6) Thread.sleep(50L)
    }
    ""
  }

  private def writeToken(fs: FileSystem, p: Path, token: String): Unit = {
    val out = fs.create(p, true)
    try out.write(token.getBytes("UTF-8")) finally out.close()
  }

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

  /** `staleMs` is a test seam (specs shrink the horizon to exercise
    * the live-holder-renewal and stale-break paths in seconds). */
  private[pipeline] def withLockAt[T](
      spark: SparkSession,
      lockPath: Path,
      staleMs: Long = LockStaleMs)(body: => T): T = {
    val fs = fsOf(spark, lockPath)
    val handle = acquire(fs, lockPath, staleMs)
    // holder renewal: re-stamp the lock well inside the staleness
    // horizon so a LIVE long-running holder is never stale-broken —
    // staleness then only ever fires on a holder that actually died
    val renewer = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, s"graft-lock-renew-${lockPath.getName}")
        t.setDaemon(true)
        t
      })
    val period = math.max(staleMs / 4, 50L)
    renewer.scheduleAtFixedRate(
      new Runnable { def run(): Unit = renew(fs, handle) },
      period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
    try body
    finally {
      renewer.shutdownNow()
      // the executor is single-threaded, so awaiting termination
      // guarantees no renewal is in flight before the release — an
      // in-flight renew that already passed its token verify would
      // otherwise writeToken AFTER release deletes the lock
      // (fs.create(overwrite = true) recreates a missing file),
      // leaving an orphan fresh-stamped lock that blocks all
      // maintenance on this root for staleMs
      try renewer.awaitTermination(
        10, java.util.concurrent.TimeUnit.SECONDS)
      catch { case _: InterruptedException =>
        Thread.currentThread().interrupt() }
      // belt-and-braces for the timeout path: a straggler renew that
      // has not yet passed its h.lost check returns without writing
      handle.lost = true
      release(fs, handle)
    }
  }

  private final class LockHandle(val path: Path, @volatile var token: String) {
    @volatile var lost: Boolean = false
  }

  /** Re-stamp the lock with a fresh timestamp, verifying we still own
    * it first. Best-effort: a failed tick retries at the next period
    * (the horizon is 4 periods deep). A foreign token means a breaker
    * stole a lock it judged stale — stop renewing (never overwrite a
    * breaker's lock) and let release() refuse the delete.
    *
    * Residual TOCTOU, stated honestly: the read-verify → overwrite
    * pair is not atomic, so a breaker that runs its ENTIRE break
    * sequence inside that µs-scale gap gets its fresh lock clobbered.
    * Reaching it at all requires a holder already pathological (the
    * stamp only goes stale after 4+ consecutive failed renewals); a
    * missing or mid-write lock short-circuits the verify (readTokenOf
    * returns ""/foreign → lost, no write), and [[acquire]]'s
    * post-break settle re-check catches the clobber from the breaker
    * side before it does any work. Object stores stay best-effort by
    * the module contract. */
  private def renew(fs: FileSystem, h: LockHandle): Unit =
    try {
      if (h.lost) return
      if (readTokenOf(fs, h.path) != h.token) { h.lost = true; return }
      // the NONCE (second field) identifies the holder across renewals
      // — exclusive markers bind to it, so a renewing holder keeps its
      // marker live while a different holder's (or no holder's) lock
      // never vouches for an orphan marker
      val fresh = s"${System.currentTimeMillis()} ${nonceOf(h.token)}"
      writeToken(fs, h.path, fresh)
      h.token = fresh
    } catch { case _: Exception => () }

  private def nonceOf(token: String): String = {
    val parts = token.split(' ')
    if (parts.length >= 2) parts(1) else token
  }

  /** Holder-token-verified release: delete only a lock still carrying
    * our own last stamp — if a breaker (wrongly or rightly) stole and
    * re-created it, the delete would clobber the CURRENT holder's
    * mutex and let two maintainers interleave. */
  private def release(fs: FileSystem, h: LockHandle): Unit =
    try {
      if (readTokenOf(fs, h.path) == h.token) fs.delete(h.path, false)
      else
        org.slf4j.LoggerFactory.getLogger("graft.pipeline.Maintenance").warn(
          s"lock ${h.path} no longer carries this holder's token at " +
            "release — it was stale-broken mid-run; leaving the " +
            "current holder's lock in place")
    } catch { case _: Exception => () }

  /** The SketchView stale-break protocol: an exclusive create of the
    * lock file carrying the acquire time. A second maintainer finding
    * a FRESH lock fails fast; a lock whose last renewal is older than
    * `staleMs` is presumed crashed and broken by ATOMIC RENAME to a
    * per-breaker tombstone — of two concurrent breakers only one's
    * rename succeeds, so a breaker can never blind-delete a lock
    * another breaker just re-created. After the rename wins, the
    * breaker verifies the tombstone still carries the stale token it
    * based the break on; a mismatch means it stole a LIVE lock — it
    * renames the lock back and aborts. */
  private def acquire(fs: FileSystem, p: Path, staleMs: Long): LockHandle = {
    val token = s"${System.currentTimeMillis()} ${System.nanoTime()}"
    def tryCreate(): Boolean =
      try {
        val out = fs.create(p, false)
        try out.write(token.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (!tryCreate()) {
      val observed = readTokenOf(fs, p)
      val stale =
        try {
          val ts = observed.split(' ').head.toLong
          System.currentTimeMillis() - ts > staleMs
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
      if (readTokenOf(fs, tomb) != observed) {
        // we renamed a lock that CHANGED since the staleness read — a
        // live holder re-acquired (or renewed) in between; put it back
        // and abort
        fs.rename(tomb, p)
        throw new IllegalStateException(
          s"aborted breaking $p: the lock was re-acquired mid-break")
      }
      fs.delete(tomb, false)
      if (!tryCreate())
        throw new IllegalStateException(
          s"lost the race re-acquiring $p after breaking a stale lock")
      // post-break settle: a pathological-but-live old holder may have
      // a renewal overwrite IN FLIGHT (its read-verify passed just
      // before our rename). Its write lands within its read→write gap
      // (µs–ms); wait it out and re-verify before doing any work —
      // aborting here keeps the single-holder invariant (the old
      // holder keeps its now-renewed lock, we never start).
      Thread.sleep(150L)
    }
    // ownership check: if a concurrent stale-breaker (or a paused
    // holder's late renewal) clobbered our lock between create and
    // here, back off instead of double-running
    if (readTokenOf(fs, p) != token)
      throw new IllegalStateException(
        s"lost the race re-acquiring $p after breaking a stale lock")
    new LockHandle(p, token)
  }

  // ---------------------------------------------------------------- //
  // Streaming-writer lease                                            //
  // ---------------------------------------------------------------- //

  /** Refresh the writer heartbeat at `rootPath` — called by every
    * streaming index sink once per micro-batch (one tiny FS write). */
  def heartbeat(spark: SparkSession, rootPath: String): Unit = {
    val p = new Path(new Path(rootPath), LeaseFile)
    writeToken(fsOf(spark, p), p, System.currentTimeMillis().toString)
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
      try readTokenOf(fs, p).toLong
      catch { case _: Exception => return } // unreadable = no lease
    val age = System.currentTimeMillis() - ts
    if (age < horizonMs)
      throw new IllegalStateException(
        s"a streaming writer heartbeat at $rootPath is ${age}ms old " +
          s"(horizon ${horizonMs}ms) — this mutation requires the " +
          "writer STOPPED: stop the query, call " +
          "Maintenance.releaseWriterLease, then retry")
  }

  // ---------------------------------------------------------------- //
  // Writer-exclusive window (the sink-side half of the handshake)     //
  // ---------------------------------------------------------------- //

  /** [[withLock]] + [[requireWriterStopped]] + a `_writer_exclusive`
    * marker visible to streaming sinks for the body's duration —
    * the form every writer-exclusive mutation (removal, retrain,
    * stats fold) runs under. The marker's LIVENESS is the lock's: a
    * sink refuses only while the marker exists AND the maintenance
    * lock is fresh (renewed by the holder), so a crashed op's orphan
    * marker ages out with its lock instead of wedging the stream. */
  def withExclusiveLock[T](
      spark: SparkSession,
      rootPath: String,
      horizonMs: Long = DefaultWriterLeaseMs)(body: => T): T =
    withLock(spark, rootPath) {
      withExclusiveMarker(spark, rootPath, horizonMs, LockFile)(body)
    }

  /** The marker-only half, for families that hold their OWN
    * single-maintainer lock (SketchView's `_compact_lock`): drop the
    * `_writer_exclusive` marker, THEN enforce the lease, run the
    * body, drop the marker. Dekker ordering — the marker is SET
    * before the lease check (the sink sets its heartbeat before
    * checking the marker), so either this side's lease check sees a
    * sink's fresh heartbeat (refuse) or the sink's later marker check
    * sees us (it refuses); checking the lease first would leave a
    * window where both proceed. The caller MUST already hold the lock
    * named by `holderLockFile` at `rootPath` and passes it EXPLICITLY
    * — guessing by filename order would let the marker bind to a
    * crashed op's LEFTOVER lock sitting beside the caller's live one
    * (stale leftover → marker judged inert → sinks write mid-op, the
    * exact window the handshake closes; fresh leftover → the stream
    * wedges until it ages out). A missing/unreadable holder lock is a
    * caller bug and fails fast instead of writing an inert marker. */
  def withExclusiveMarker[T](
      spark: SparkSession,
      rootPath: String,
      horizonMs: Long,
      holderLockFile: String)(body: => T): T = {
    val root = new Path(rootPath)
    val p = new Path(root, ExclusiveFile)
    val fs = fsOf(spark, p)
    // the marker carries the holder LOCK's nonce: liveness is "a lock
    // with THIS nonce is fresh", so (a) a crashed op's orphan marker
    // goes inert the moment its lock is gone or replaced — a later
    // ROUTINE compact's fresh lock (different nonce) never vouches
    // for it and cannot wedge the stream — and (b) a renewing
    // long-running holder (same nonce re-stamped) keeps it live
    val holderTok = readTokenOf(fs, new Path(root, holderLockFile))
    if (holderTok.isEmpty)
      throw new IllegalStateException(
        s"withExclusiveMarker: the caller claims to hold $holderLockFile " +
          s"at $rootPath but it is missing/unreadable — writer-exclusive " +
          "mutations must run under their family lock")
    val nonce = nonceOf(holderTok)
    writeToken(fs, p, nonce)
    try {
      requireWriterStopped(spark, rootPath, horizonMs)
      body
    } finally fs.delete(p, false)
  }

  /** Sink-side gate, called by every streaming index sink AFTER its
    * heartbeat and BEFORE writing the micro-batch: refuse while a
    * writer-exclusive maintenance op is in flight. Heartbeat-first
    * ordering closes the race both ways — a mutation that passed
    * [[requireWriterStopped]] before this sink's heartbeat has its
    * marker visible here; a sink that heartbeated before the
    * mutation's lease check makes the mutation refuse. The failed
    * micro-batch replays after release (every sink in this repo is
    * replay-idempotent by the `__batch` dynamic-overwrite protocol). */
  def requireNoExclusiveMaintenance(
      spark: SparkSession, rootPath: String): Unit = {
    val root = new Path(rootPath)
    val marker = new Path(root, ExclusiveFile)
    val fs = fsOf(spark, marker)
    def live(): Boolean = {
      if (!fs.exists(marker)) return false
      val nonce = readTokenOf(fs, marker)
      if (nonce.isEmpty) return false
      // liveness = a FRESH lock carrying the marker's nonce: the
      // holder's renewals keep the nonce; a crashed op's marker goes
      // inert once its lock is broken/replaced (different nonce), so
      // routine maintenance can never wedge the stream on an orphan
      Seq(LockFile, CompactLockFile).exists { lf =>
        try {
          val tok = readTokenOf(fs, new Path(root, lf))
          nonceOf(tok) == nonce &&
            System.currentTimeMillis() - tok.split(' ').head.toLong <= LockStaleMs
        } catch { case _: Exception => false }
      }
    }
    if (!live()) return
    // one short settle: a mutation attempt that is itself REFUSED by
    // the lease check holds its marker for only ms — don't fail the
    // stream over that transient; a real mutation persists
    Thread.sleep(2000L)
    if (live())
      throw new IllegalStateException(
        s"a writer-exclusive maintenance op holds $rootPath — this " +
          "micro-batch is refused and will replay after the op " +
          "releases (replay-idempotent sink)")
  }
}
