package graft.stream

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** X3 — active/passive availability (reference README.md:185-198): the
  * reference's deployments watch the Postgres replication SLOT — the
  * active instance holds it, passives poll `slotActivityCheckerInterval`
  * and capture the slot when it goes inactive. The Spark-native analog
  * of "the slot" is a LEASE on shared storage next to the checkpoint:
  * whichever instance holds the live lease runs the streaming query
  * (the checkpoint IS the slot position, so a takeover resumes exactly
  * where the dead instance stopped — no loss, no re-delivery beyond the
  * at-least-once batch contract).
  *
  * Lease mechanics (coarse by design, like slot activity):
  *   - acquire = atomically create the lease file
  *     (`FileSystem.create(overwrite = false)` — atomic on local FS and
  *     HDFS-like stores);
  *   - the holder RENEWS by rewriting the heartbeat timestamp through a
  *     tmp-file + atomic rename;
  *   - a lease whose heartbeat is older than `leaseMs` is DEAD: a
  *     contender deletes it and races the create — losers get the
  *     create exception and go back to polling, so at most one winner.
  *
  * Split-brain window: a paused-but-alive holder (GC, VM freeze) can
  * overlap a takeover for up to one renewal period. That is the same
  * window the reference accepts (slot capture vs a stalled active), and
  * it is SAFE here: two writers against the same checkpoint serialize
  * on the checkpoint's own batch commits, and the sink contract is
  * at-least-once with idempotent per-batch output.
  */
final class HaLease(dir: String, val instanceId: String, leaseMs: Long)
    (implicit spark: SparkSession) {

  private val fs = new Path(dir).getFileSystem(
    spark.sparkContext.hadoopConfiguration)
  private val leasePath = new Path(dir, "lease")

  private def writeVia(tmpName: String, content: String): Unit = {
    val tmp = new Path(dir, tmpName)
    val out = fs.create(tmp, true)
    out.write(content.getBytes(UTF_8)); out.close()
    // atomic swap; rename-onto requires the destination gone on some FS
    // implementations — delete+rename is fine, the holder is the only
    // renewer
    fs.delete(leasePath, false)
    if (!fs.rename(tmp, leasePath))
      throw new java.io.IOException(s"lease renew rename failed: $tmp")
  }

  /** (holderId, heartbeatMs) of the current lease, if any. */
  def read(): Option[(String, Long)] =
    try {
      if (!fs.exists(leasePath)) None
      else {
        val in = fs.open(leasePath)
        val s = try new String(in.readAllBytes(), UTF_8) finally in.close()
        s.split('\n') match {
          case Array(id, hb) => Some((id, hb.toLong))
          case _ => None
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  def isHeldByLiveOther(nowMs: Long): Boolean =
    read().exists { case (id, hb) =>
      id != instanceId && nowMs - hb < leaseMs
    }

  /** Try to take the lease: free → create; dead → delete + race the
    * create; live-and-other's → false.
    */
  def tryAcquire(nowMs: Long): Boolean = read() match {
    case Some((id, _)) if id == instanceId =>
      renew(nowMs); true
    case Some((_, hb)) if nowMs - hb < leaseMs => false
    case other =>
      // free or dead: clear a dead lease, then the atomic create decides
      if (other.isDefined) fs.delete(leasePath, false)
      try {
        val out = fs.create(leasePath, false) // overwrite=false: atomic claim
        out.write(s"$instanceId\n$nowMs".getBytes(UTF_8)); out.close()
        true
      } catch { case _: java.io.IOException => false }
  }

  /** Heartbeat (holder only). */
  def renew(nowMs: Long): Unit =
    writeVia(s"lease.tmp.$instanceId", s"$instanceId\n$nowMs")

  /** Graceful handover: drop the lease so a passive can take over
    * without waiting out the expiry.
    */
  def release(): Unit = {
    read().foreach { case (id, _) =>
      if (id == instanceId) fs.delete(leasePath, false)
    }
    ()
  }
}

/** The failover RUNNER: poll the lease; on acquiring it, run the
  * pipeline from the SHARED checkpoint and heartbeat until stopped or
  * the query dies. One of these runs in every deployment; exactly one
  * is active at a time (the reference's multi-deployment slot watch).
  */
object HaConnector {

  final class Instance private[stream] (lease: HaLease) {
    @volatile private[stream] var stopped = false
    @volatile private[stream] var current: Option[org.apache.spark.sql.streaming.StreamingQuery] = None
    private[stream] var thread: Thread = _
    def isActive: Boolean = current.exists(_.isActive)
    def instanceId: String = lease.instanceId
    /** Stop WITHOUT releasing the lease — simulates a crash (tests) or a
      * hard kill; passives must wait out the expiry.
      */
    def kill(): Unit = {
      stopped = true; current.foreach(_.stop()); thread.join(30000)
    }
    /** Graceful stop: halt the query and hand the lease over. */
    def stop(): Unit = {
      stopped = true
      current.foreach(_.stop())
      thread.join(30000)
      lease.release()
    }
    private[stream] def isStopped: Boolean = stopped
  }

  /** Start a deployment instance: polls every `pollMs`, takes the lease
    * when free/dead, then runs `startQuery` (any pipeline entry bound to
    * the SHARED checkpoint) and renews every `pollMs` while the query
    * lives. If the query dies, the lease releases and the loop resumes
    * polling (another instance — or this one — recaptures).
    */
  def start(spark: SparkSession, leaseDir: String, instanceId: String,
      leaseMs: Long, pollMs: Long)
      (startQuery: () => org.apache.spark.sql.streaming.StreamingQuery)
      : Instance = {
    implicit val s: SparkSession = spark
    val lease = new HaLease(leaseDir, instanceId, leaseMs)
    val instance: Instance = new Instance(lease)
    val t = new Thread(() => {
      while (!instance.isStopped) {
        if (lease.tryAcquire(System.currentTimeMillis())) {
          // startQuery can fail TRANSIENTLY right after a takeover (the
          // dead instance's query name may still be deregistering in
          // this JVM; a remote store may briefly hold checkpoint
          // leases): release and retry from the poll loop instead of
          // dying silently with the lease held
          val started =
            try Some(startQuery())
            catch {
              case scala.util.control.NonFatal(_) =>
                lease.release(); None
            }
          started.foreach { q =>
            instance.current = Some(q)
            try {
              while (!instance.isStopped && q.isActive) {
                lease.renew(System.currentTimeMillis())
                Thread.sleep(pollMs)
              }
            } catch { case _: InterruptedException => () }
            finally {
              if (q.isActive) q.stop()
              // a DEAD query must free the slot for the next contender;
              // a kill() leaves the lease to expire (crash semantics)
              if (!instance.isStopped) lease.release()
            }
          }
        }
        if (!instance.isStopped) Thread.sleep(pollMs)
      }
    }, s"graft-ha-$instanceId")
    instance.thread = t
    t.setDaemon(true)
    t.start()
    instance
  }
}
