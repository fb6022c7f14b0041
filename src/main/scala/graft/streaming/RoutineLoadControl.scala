package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Lifecycle control for a continuously-running load job — the
  * PAUSE / RESUME / ALTER / STOP ROUTINE LOAD surface (reference
  * monitor.sh's SHOW ROUTINE LOAD states beyond the lag/error
  * counters Monitor already reports).
  *
  * Structured Streaming has no suspended-query primitive, so the
  * mapping is the one the checkpoint protocol makes exactly-once:
  *
  *  - PAUSE  = stop the query gracefully. Committed offsets + sink
  *    epochs stay in the checkpoint; in-flight batches either commit
  *    fully or are replayed on resume.
  *  - RESUME = start a fresh query from the SAME factory — i.e. same
  *    checkpoint location, source and sink — which continues from the
  *    recorded offsets, re-emitting nothing a transactional sink
  *    already committed.
  *  - ALTER  = swap the factory while PAUSED (StarRocks likewise only
  *    alters paused jobs): tune trigger/read options between runs;
  *    the checkpoint keeps the position.
  *  - STOP   = terminal; a stopped job can never be resumed (matching
  *    the STOPPED routine-load state).
  *
  * The exactly-once contract therefore belongs to the factory: it
  * MUST reuse one checkpoint location and an idempotent/transactional
  * sink across invocations. This class only sequences states.
  */
object RoutineLoadControl {

  sealed abstract class State(val name: String)
  /** Created but never started (StarRocks NEED_SCHEDULE). */
  case object NeedSchedule extends State("NEED_SCHEDULE")
  case object Running extends State("RUNNING")
  case object Paused extends State("PAUSED")
  case object Stopped extends State("STOPPED")

  def apply(name: String)(factory: => StreamingQuery): RoutineLoadControl =
    new RoutineLoadControl(name, () => factory)
}

final class RoutineLoadControl private[streaming] (
    val name: String, private var factory: () => StreamingQuery) {
  import RoutineLoadControl._

  private var query: Option[StreamingQuery] = None
  private var st: State = NeedSchedule

  def state: State = synchronized(st)

  /** The live query while RUNNING (for processAllAvailable/await). */
  def active: Option[StreamingQuery] = synchronized(query.filter(_ => st == Running))

  def start(): this.type = synchronized {
    require(st == NeedSchedule, s"start: job $name is ${st.name}")
    query = Some(factory())
    st = Running
    this
  }

  /** Graceful stop; committed work stays in the checkpoint. */
  def pause(): this.type = synchronized {
    require(st == Running, s"pause: job $name is ${st.name}")
    query.foreach(_.stop())
    query = None
    st = Paused
    this
  }

  /** Continue from the checkpointed position. */
  def resume(): this.type = synchronized {
    require(st == Paused, s"resume: job $name is ${st.name}")
    query = Some(factory())
    st = Running
    this
  }

  /** Swap the job definition (trigger/options) while PAUSED. The new
    * factory must keep the checkpoint location and sink. */
  def alter(newFactory: => StreamingQuery): this.type = synchronized {
    require(st == Paused, s"alter: job $name is ${st.name} (pause first)")
    factory = () => newFactory
    this
  }

  /** Terminal stop — cannot be resumed. */
  def stop(): this.type = synchronized {
    require(st != Stopped, s"stop: job $name already stopped")
    query.foreach(_.stop())
    query = None
    st = Stopped
    this
  }

  /** SHOW ROUTINE LOAD row: lifecycle state + the monitor snapshot of
    * the live query (None while not running). */
  def show(): (String, Option[Monitor.QueryStatus]) = synchronized {
    (st.name, query.map(Monitor.status))
  }
}
