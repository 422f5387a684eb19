package graft.core

/** One copy of the harness's run-chains-concurrently pattern (Bench
  * ingest chains, Streams.prestage drains, Funnel.gateModels trainings).
  *
  * Failure contract (r19 ADVICE, corrected in r20): run every thunk to
  * completion (a failure in one must not abandon the others mid-flight),
  * then rethrow the FIRST failure with the remaining failures attached
  * as suppressed — fatal throwables INCLUDED. `scala.concurrent.Future`
  * cannot deliver that last part by itself: a fatal throwable escaping a
  * Future body is rethrown on the pool thread and the promise is NEVER
  * completed, so `Await` hangs forever instead of aborting. The thunk
  * body is therefore wrapped to capture every Throwable as a VALUE; the
  * futures themselves always complete successfully.
  */
object Concurrent {

  def runAll(thunks: Seq[() => Unit]): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val done = thunks.map(t => Future {
        try { t(); None } catch { case th: Throwable => Some(th) }
      })
      val failures = done.flatMap(f => Await.result(f, Duration.Inf))
      failures.headOption.foreach { first =>
        failures.drop(1).foreach(first.addSuppressed)
        throw first
      }
    } finally pool.shutdown()
  }
}
