package graft.streaming

import org.apache.spark.sql.SparkSession
import graft.plans.MvRewrite

/** The async MV REFRESH WORKER — the daemon StarRocks runs behind
  * `REFRESH MATERIALIZED VIEW ... ASYNC` (reference
  * docs/ARCHITECTURE.md's async-refresh lifecycle; the reference
  * keeps MVs fresh on a schedule/trigger, not by the query driving
  * the loop). Before r16 every refresh-lifecycle gate hand-rolled the
  * same three moves (poll [[MvRewrite.publishStale]] → run the
  * owner's incremental step → re-publish a versioned snapshot); this
  * object is that loop, shipped once:
  *
  *  - [[runOnce]] — one poll sweep over the registered refreshables;
  *    only STALE publishes are refreshed (a fresh publish costs one
  *    stamp read, no jobs). The unit composed by gates and by the
  *    scheduled worker alike.
  *  - [[Worker]] — the schedule-driven daemon: a thread polling
  *    `runOnce` at a fixed interval. Errors are RECORDED and the loop
  *    survives them (a transient commit/read failure must not kill
  *    the refresher; the next tick retries), mirroring how the
  *    routine-load controller treats transient broker errors.
  *
  * Scale shape: polling is stamp-file reads (O(#registrations), no
  * Spark jobs); a refresh publishes MV-row-sized snapshots — work ∝
  * |MV| + commit/publish job count, corpus-size-free (the
  * `publishVersioned` contract). On a real cluster one worker per
  * warehouse polls hundreds of registrations; staleness checks are
  * metadata-only so the interval can be seconds without load.
  */
object MvRefresher {

  /** One async-refreshable MV registration.
    *
    * @param pub     versioned snapshot dir (stamped by a
    *                `registerXxxSnapshot(..., mvRoot = Some(root))`
    *                publish — unstamped publishes never read stale and
    *                are never refreshed)
    * @param step    optional incremental maintenance to run BEFORE the
    *                re-publish, for MVs whose maintenance is itself
    *                pull-driven (most maintenance is push-driven by
    *                the CDC stream and needs only the publish)
    * @param publish re-publish the current committed MV state onto
    *                `pub` (a fresh versioned generation; retention/GC
    *                is the publish machinery's contract)
    */
  final case class Refreshable(name: String, pub: String,
                               step: () => Unit = () => (),
                               publish: () => Unit)

  /** One poll sweep: refresh every registration whose publish is
    * stale; returns the names refreshed (empty = everything fresh).
    * Each refresh is verified to have actually cleared staleness — a
    * publish that silently leaves the stamp behind is a bug, not a
    * retry case. */
  def runOnce(spark: SparkSession, regs: Seq[Refreshable]): Seq[String] =
    regs.filter(r => MvRewrite.publishStale(spark, r.pub)).map { r =>
      r.step()
      r.publish()
      require(!MvRewrite.publishStale(spark, r.pub),
        s"refresh of ${r.name}: re-publish did not clear staleness for ${r.pub}")
      r.name
    }

  /** The scheduled daemon: polls [[runOnce]] every `pollIntervalMs`.
    * Start with [[Worker#start]], stop with [[Worker#stop]] (joins the
    * thread). [[Worker#refreshedCount]] counts refreshes performed;
    * [[Worker#errors]] records per-tick failures without killing the
    * loop. */
  final class Worker(spark: SparkSession, regs: Seq[Refreshable],
                     pollIntervalMs: Long = 1000L) {
    @volatile private var running = false
    private val count = new java.util.concurrent.atomic.AtomicLong(0)
    private val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    private var thread: Thread = null

    def refreshedCount: Long = count.get
    def errors: Seq[Throwable] = {
      import scala.jdk.CollectionConverters._
      errs.iterator.asScala.toSeq
    }

    def start(): this.type = synchronized {
      require(thread == null, "worker already started")
      running = true
      thread = new Thread(() => {
        while (running) {
          try count.addAndGet(runOnce(spark, regs).size.toLong)
          catch { case t: Throwable => errs.add(t) }
          try Thread.sleep(pollIntervalMs)
          catch { case _: InterruptedException => () }
        }
      }, "graft-mv-refresher")
      thread.setDaemon(true)
      thread.start()
      this
    }

    def stop(): Unit = synchronized {
      if (thread != null) {
        running = false
        thread.interrupt()
        thread.join(30000L)
        thread = null
      }
    }

    /** Spin until at least `n` refreshes have happened (spec helper —
      * "the worker refreshed it, the test didn't"). */
    def awaitRefreshed(n: Long, timeoutMs: Long = 30000L): Boolean = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (count.get < n && System.nanoTime() < deadline) Thread.sleep(10L)
      count.get >= n
    }
  }
}
