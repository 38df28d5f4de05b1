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

  test("cold-extra accounting: reports first-run excess over median, floored") {
    // the closure-label cache's one-time build (~53 s at sf10) is paid
    // by the FIRST run of the first consumer and correctly excluded
    // from its median — cold_extra_s makes that cost machine-readable
    // instead of a SCALE.md footnote
    val json = Bench.coldExtraJson(Seq(
      "dedup_clusters" -> 53.2,   // the cache build
      "q1" -> 0.3,                // sub-floor jitter: not reported
      "q2" -> 0.0,                // warm from run one
      "text_tfidf" -> 1.75))
    assert(json.contains(""""dedup_clusters":53.200"""))
    assert(json.contains(""""text_tfidf":1.750"""))
    assert(!json.contains("q1") && !json.contains("q2"),
      "sub-floor cold extras must not clutter the artifact")
    // boundary: exactly the floor is not reported (strictly >)
    assert(!Bench.coldExtraJson(Seq("q" -> 0.5)).contains("\"q\""))
    // empty map renders as valid JSON
    assert(Bench.coldExtraJson(Nil) == """"cold_extra_s":{},""")
  }
}
