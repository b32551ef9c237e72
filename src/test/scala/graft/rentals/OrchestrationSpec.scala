package graft.rentals

import scala.concurrent.duration._
import org.scalatest.funsuite.AnyFunSuite
import Orchestration._

/** [[Orchestration.StageRunner]] — the reference DAG's retry / callback /
  * delay semantics (`retries: 1`, `retry_delay: 5 min`, failure-logging
  * callback), asserted deterministically via the injected sleep.
  */
class OrchestrationSpec extends AnyFunSuite {

  private class Probe {
    val failures = scala.collection.mutable.ArrayBuffer.empty[StageFailure]
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[FiniteDuration]
    def runner(policy: RetryPolicy = RetryPolicy()): StageRunner =
      new StageRunner("test_pipeline", policy, failures += _, sleeps += _)
  }

  test("success on first attempt: no callback, no sleep, one report") {
    val p = new Probe
    val r = p.runner()
    assert(r.run("s1")(42) === 42)
    assert(p.failures.isEmpty && p.sleeps.isEmpty)
    assert(r.reports === Seq(StageReport("s1", 1, succeeded = true)))
  }

  test("default policy retries once after the 5-minute delay, then succeeds") {
    val p = new Probe
    val r = p.runner()
    var calls = 0
    val out = r.run("flaky") {
      calls += 1
      if (calls == 1) sys.error("transient") else "ok"
    }
    assert(out === "ok" && calls === 2)
    assert(p.sleeps === Seq(5.minutes))
    assert(p.failures.map(f => (f.stage, f.attempt, f.willRetry)) ===
      Seq(("flaky", 1, true)))
    assert(r.reports === Seq(StageReport("flaky", 2, succeeded = true)))
  }

  test("exhausted retries rethrow the terminal error; callback fires per attempt") {
    val p = new Probe
    val r = p.runner(RetryPolicy(retries = 2, retryDelay = 1.second))
    val e = intercept[RuntimeException](r.run("doomed")(sys.error("always")))
    assert(e.getMessage === "always")
    // 3 attempts: two retryable failures + the terminal one
    assert(p.failures.map(f => (f.attempt, f.willRetry)) ===
      Seq((1, true), (2, true), (3, false)))
    assert(p.failures.forall(f => f.pipeline === "test_pipeline" && f.stage === "doomed"))
    assert(p.sleeps === Seq(1.second, 1.second))
    assert(r.reports === Seq(StageReport("doomed", 3, succeeded = false)))
  }

  test("stage chain passes values and stops at the first exhausted stage") {
    val p = new Probe
    val r = p.runner(RetryPolicy(retries = 0, retryDelay = 0.seconds))
    val raw = r.run("download")("raw_path")
    val processed = r.run("transform")(raw + "/processed")
    intercept[RuntimeException](r.run("dq")(sys.error(s"bad $processed")))
    assert(r.reports.map(x => (x.stage, x.succeeded)) ===
      Seq(("download", true), ("transform", true), ("dq", false)))
    assert(p.failures.head.error.getMessage === "bad raw_path/processed")
  }

  test("fatal errors are not retried") {
    val p = new Probe
    val r = p.runner(RetryPolicy(retries = 5, retryDelay = 1.second))
    intercept[OutOfMemoryError](r.run("fatal")(throw new OutOfMemoryError("boom")))
    assert(p.failures.isEmpty && p.sleeps.isEmpty, "fatal bypasses retry machinery")
  }
}
