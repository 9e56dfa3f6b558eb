package graft.util

/** Shared driver-side job-overlap helper (guide §2.6): run independent
  * blocking Spark actions concurrently from a DEDICATED pool — never
  * `ExecutionContext.Implicits.global`, whose fork-join workers are starved
  * by blocking actions when several overlapped builds nest (the
  * SyncPipeline-seed × BM25-build shape) — and settle EVERY branch before
  * rethrowing the first failure, so a failing branch never abandons a
  * sibling's in-flight write (a retry into the same staging directory would
  * race the orphan's `_temporary` output).
  */
object Par {

  /** Run `a` and `b` concurrently; both settle before the first failure (if
    * any) is rethrown.
    */
  def both[A, B](a: => A, b: => B): (A, B) = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val fa = Future(a)
      val fb = Future(b)
      val ra = scala.util.Try(Await.result(fa, Duration.Inf))
      val rb = scala.util.Try(Await.result(fb, Duration.Inf))
      (ra, rb) match {
        case (scala.util.Success(x), scala.util.Success(y)) => (x, y)
        case _ =>
          throw Seq(ra, rb).collectFirst { case scala.util.Failure(e) => e }.get
      }
    } finally pool.shutdown()
  }
}
