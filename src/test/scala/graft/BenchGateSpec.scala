package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.gatedPass]]'s discard/retry/give-up behavior with
  * scripted steal sequences — the gate itself (round 10's headline
  * harness fix) was otherwise only exercised by live noisy-host runs.
  * No SparkSession: the gate is pure control flow. */
class BenchGateSpec extends AnyFunSuite {

  /** Scripted pass counter + steal script: pass() returns its 1-based
    * invocation number; stealDelta() replays `script`. */
  private def run(script: Long*): (Int, Seq[Long], Int) = {
    var calls = 0
    val it = script.iterator
    var retries = 0
    val (r, trail) = Bench.gatedPass[Int](
      () => { calls += 1; calls }, () => it.next(),
      gate = 300, retries = 4, onRetry = (_, _) => retries += 1)
    (r, trail, retries)
  }

  test("quiet first attempt: accepted immediately, no retries") {
    val (r, trail, n) = run(120)
    assert(r == 1 && trail == Seq(120L) && n == 0)
  }

  test("contaminated attempts are discarded until a quiet one lands") {
    val (r, trail, n) = run(931, 1440, 225)
    assert(r == 3)                          // result is the LAST run
    assert(trail == Seq(931L, 1440L, 225L)) // full trail preserved
    assert(trail.last <= 300)
    assert(n == 2)
  }

  test("retry budget exhausted: last attempt kept, above-gate steal visible") {
    val (r, trail, _) = run(500, 600, 700, 800, 999)
    assert(r == 4)                 // exactly `retries` total attempts
    assert(trail == Seq(500L, 600L, 700L, 800L))
    assert(trail.last > 300)       // the honest contamination signal
  }

  test("gate 0 disables: one attempt regardless of steal") {
    var calls = 0
    val (r, trail) = Bench.gatedPass[Int](
      () => { calls += 1; calls }, () => 99999L, gate = 0, retries = 4)
    assert(r == 1 && trail == Seq(99999L))
  }

  test("unreadable /proc/stat (-1) is accepted, not retried forever") {
    val (r, trail, n) = run(-1)
    assert(r == 1 && trail == Seq(-1L) && n == 0)
  }
}
