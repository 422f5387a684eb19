package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The failure contract of [[Concurrent.runAll]] (r20 review): every
  * thunk runs to completion, the FIRST failure is rethrown with the
  * rest suppressed, and — the part scala.concurrent.Future cannot do by
  * itself — a FATAL throwable aborts the call instead of hanging the
  * await (a fatal escaping a Future body kills the pool thread and
  * leaves the promise forever incomplete).
  */
class ConcurrentSpec extends AnyFunSuite {

  /** Run `body` on a daemon thread with a hang bound: if the contract
    * regressed to the old hang-on-fatal behavior this fails in 30 s
    * instead of deadlocking the suite. */
  private def bounded(body: => Unit): Throwable = {
    @volatile var outcome: Option[Throwable] = None
    val t = new Thread(() => {
      outcome = try { body; None } catch { case th: Throwable => Some(th) }
    })
    t.setDaemon(true)
    t.start()
    t.join(30000)
    assert(!t.isAlive, "runAll hung — the fatal-capture contract regressed")
    outcome.orNull
  }

  test("all thunks run; first failure rethrown with the rest suppressed") {
    val ran = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val thrown = bounded {
      Concurrent.runAll(Seq(
        () => { ran.add(1); throw new IllegalStateException("first") },
        () => { Thread.sleep(50); ran.add(2); () },
        () => { ran.add(3); throw new IllegalArgumentException("second") }))
    }
    assert(ran.size === 3, "a failure abandoned the other thunks")
    assert(thrown != null && thrown.getMessage != null)
    // two failures total: one thrown, one suppressed (order by thunk
    // index — failures are collected in declaration order)
    assert(thrown.getSuppressed.length === 1)
    val msgs = (thrown +: thrown.getSuppressed.toSeq).map(_.getMessage).toSet
    assert(msgs === Set("first", "second"))
  }

  test("a FATAL throwable aborts the call — no hang, no swallow") {
    val thrown = bounded {
      Concurrent.runAll(Seq(
        () => throw new LinkageError("fatal-from-chain"),
        () => ()))
    }
    assert(thrown.isInstanceOf[LinkageError], s"got $thrown")
    assert(thrown.getMessage === "fatal-from-chain")
  }

  test("no failures: completes normally") {
    val thrown = bounded { Concurrent.runAll(Seq(() => (), () => ())) }
    assert(thrown == null)
  }
}
