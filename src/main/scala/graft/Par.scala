package graft

/** Overlap independent Spark actions from driver threads (optimization
  * guide §2.6): Spark's scheduler runs several jobs at once inside one
  * application — actions are only sequential because driver code calls
  * them sequentially. The transactional MV maintenance paths issue
  * many SMALL independent jobs per round (one per table: state read,
  * state advance, delta write), each dominated by fixed scheduler/AQE
  * overhead, so overlapping them recovers most of that fixed cost.
  * FIFO scheduling back-fills naturally; results are identical to the
  * sequential loop — only wall-clock changes.
  *
  * A shared bounded pool (not one pool per call) so nested use cannot
  * fork unbounded threads; the pool is daemon so it never pins the JVM.
  */
object Par {
  private lazy val pool = {
    val n = math.max(2, math.min(8, Runtime.getRuntime.availableProcessors() / 4))
    java.util.concurrent.Executors.newFixedThreadPool(n,
      (r: Runnable) => {
        val t = new Thread(r, "graft-par")
        t.setDaemon(true)
        t
      })
  }

  /** Map `f` over `xs` with each element on a pool thread, preserving
    * order. Escapes to a plain map for 0/1 elements. Exceptions
    * propagate (first failure rethrown on the caller thread). */
  /** Run independent side-effecting actions (e.g. parquet writes to
    * distinct dirs) concurrently; returns when all completed. */
  def run(thunks: (() => Unit)*): Unit = { map(thunks.toSeq)(_.apply()); () }

  def map[A, B](xs: Seq[A])(f: A => B): Seq[B] =
    // nested use runs inline: a fixed pool must never have a pool
    // thread BLOCK on work that needs another pool thread (deadlock
    // when all workers wait); inline keeps nesting correct and still
    // overlapped at the outermost level
    if (xs.lengthCompare(2) < 0 ||
        Thread.currentThread().getName.startsWith("graft-par")) xs.map(f)
    else {
      val futs = xs.map(x => pool.submit(new java.util.concurrent.Callable[B] {
        override def call(): B = f(x)
      }))
      futs.map { fu =>
        try fu.get()
        catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
      }
    }
}
