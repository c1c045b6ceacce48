package graft.operators

/** Evaluate two INDEPENDENT Spark actions from two driver threads
  * (optimization guide §2.6 "overlap independent jobs"): local-mode
  * materializations are driver-latency-dominated at fixture scale, and
  * on a cluster FIFO scheduling lets the second job back-fill the
  * first one's straggler tail. Each call uses two fresh daemon threads
  * — no shared pool, so nested or concurrent calls cannot deadlock and
  * the caller thread's Spark local properties (job group/description)
  * are captured per call. Failures rethrow the ORIGINAL exception
  * (ExecutionException unwrapped), so the error surface matches
  * sequential evaluation.
  */
object Par {
  def concurrently[A, B](a: => A, b: => B): (A, B) = {
    val fa = new java.util.concurrent.FutureTask[A](
      new java.util.concurrent.Callable[A] { override def call(): A = a })
    val fb = new java.util.concurrent.FutureTask[B](
      new java.util.concurrent.Callable[B] { override def call(): B = b })
    val ta = new Thread(fa, "graft-par-a")
    val tb = new Thread(fb, "graft-par-b")
    ta.setDaemon(true); tb.setDaemon(true)
    ta.start(); tb.start()
    def get[T](f: java.util.concurrent.FutureTask[T]): T =
      try f.get()
      catch {
        case e: java.util.concurrent.ExecutionException =>
          throw Option(e.getCause).getOrElse(e)
      }
    (get(fa), get(fb))
  }
}
