package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench guard's WARN band (r16): marginal external load —
  * above 1.0 cores but under the 2.0 flag line — must self-describe in
  * the artifact (r15: a run at ext peak 1.97 passed as official while
  * reading a uniform 1.26x over the same-code clean artifact). */
class BenchGuardSpec extends AnyFunSuite {

  test("ext-CPU warn band: fires above warnLimit, names the queries, silent below") {
    val quiet = Bench.extCpuWarnJson(Seq("q1" -> 0.2, "q2" -> 0.9), 1.0)
    assert(quiet.contains(""""ext_cpu_warn":false"""))
    assert(quiet.contains(""""ext_cpu_warned":[]"""))
    val loaded = Bench.extCpuWarnJson(
      Seq("q1" -> 0.2, "q2" -> 1.4, "q3" -> 1.97), 1.0)
    assert(loaded.contains(""""ext_cpu_warn":true"""))
    assert(loaded.contains(""""ext_cpu_warned":["q2","q3"]"""))
    // the warn band is strictly below the flag line: a 1.97-core window
    // warns (it would NOT flag at the 2.0 limit) — the r15 case
    assert(1.97 < 2.0)
    // boundary: exactly the limit does not warn (the band is >, like
    // the flag guard)
    val edge = Bench.extCpuWarnJson(Seq("q1" -> 1.0), 1.0)
    assert(edge.contains(""""ext_cpu_warn":false"""))
  }
}
