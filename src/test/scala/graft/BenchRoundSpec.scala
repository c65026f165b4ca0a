package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench's full-suite artifact naming must FAIL CLOSED: with no round
  * signal at all, persisting under a guessed default would overwrite a
  * historical `bench_full_r<n>.json` (round-4 judge ask).
  */
class BenchRoundSpec extends AnyFunSuite {

  test("env var wins verbatim") {
    assert(Bench.inferRound(Some("7"), Seq("BENCH_r01.json")) === Some("7"))
  }

  test("empty env var is ignored, falls through to file inference") {
    assert(Bench.inferRound(Some(""), Seq("BENCH_r04.json")) === Some("5"))
  }

  test("round = max(BENCH_r*) + 1, zero-padded or not") {
    assert(Bench.inferRound(None,
      Seq("BENCH_r01.json", "BENCH_r02.json", "BENCH_r04.json", "SURVEY.md"))
      === Some("5"))
    assert(Bench.inferRound(None, Seq("BENCH_r12.json")) === Some("13"))
  }

  test("no signal at all -> None (fail closed, do not persist)") {
    assert(Bench.inferRound(None, Seq("SURVEY.md", "build.sbt")) === None)
    assert(Bench.inferRound(None, Nil) === None)
    assert(Bench.inferRound(Some(""), Nil) === None)
  }

  test("persistFile: explicit round overwrites the canonical record deliberately") {
    assert(Bench.persistFile(Some("8"), Seq("BENCH_r07.json"),
      Seq("bench_full_r8.json"), "123") === Some(("bench_full_r8.json", false)))
  }

  test("persistFile: inferred round writes canonical only when absent") {
    assert(Bench.persistFile(None, Seq("BENCH_r07.json"),
      Seq("bench_full_r7.json"), "123") === Some(("bench_full_r8.json", false)))
  }

  test("persistFile: inferred round NEVER clobbers an existing record — side-stamped") {
    // the round-7 incident: driver ran Bench before BENCH_r07 landed,
    // inferred round 7, and overwrote the committed bench_full_r7.json
    assert(Bench.persistFile(None, Seq("BENCH_r06.json"),
      Seq("bench_full_r7.json"), "123") === Some(("bench_full_r7_123.json", true)))
  }

  test("persistFile: no signal at all still fails closed") {
    assert(Bench.persistFile(None, Seq("SURVEY.md"), Nil, "123") === None)
  }

  test("timedReps: a throwing rep records -1.0, never its time-to-failure") {
    var calls = 0
    val ts = Bench.timedReps("qx", 3) { () =>
      calls += 1
      if (calls == 2) throw new RuntimeException("boom")
    }
    assert(ts.length === 3)
    assert(ts(0) >= 0 && ts(2) >= 0)
    assert(ts(1) === -1.0)
  }

  test("timedReps: all-green reps are all non-negative") {
    assert(Bench.timedReps("qy", 2)(() => ()).forall(_ >= 0))
  }
}
