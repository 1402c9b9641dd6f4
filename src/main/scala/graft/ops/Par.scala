package graft.ops

/** Run independent construction thunks concurrently and return their
  * results in input order — the r19 optimization shared by the composed
  * media bodies and the two-direction miners. Operator bodies interleave
  * EAGER driver-blocking work that is mutually independent (per-modality
  * localCheckpoint jobs, per-direction KMeans training + occupancy
  * gates): built sequentially, the wall pays their SUM; Spark's
  * scheduler happily runs several jobs at once inside one application —
  * actions are only sequential because the driver calls them
  * sequentially (guide §2.6) — so a short-lived thread per branch makes
  * the wall pay their MAX. Pure construction parallelism: the thunks
  * build the SAME DataFrames in the same union order, so results are
  * identical. */
private[graft] object Par {
  def inParallel[A](thunks: Seq[() => A]): Seq[A] =
    if (thunks.sizeIs <= 1) thunks.map(_())
    else {
      // daemon threads (a hung sibling must not pin JVM exit) and an
      // interrupt of the remaining thunks when one fails — without the
      // cancel, a failed branch returned while its siblings kept driving
      // orphaned checkpoint jobs (r19 review finding)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        thunks.size,
        (r: Runnable) => {
          val th = new Thread(r, "graft-par")
          th.setDaemon(true)
          th
        })
      try {
        val futs = thunks.map(t =>
          pool.submit(new java.util.concurrent.Callable[A] {
            override def call(): A = t()
          }))
        try futs.map(_.get())
        catch {
          case e: java.util.concurrent.ExecutionException =>
            futs.foreach(_.cancel(true))
            throw e.getCause
        }
      } finally pool.shutdown()
    }
}
