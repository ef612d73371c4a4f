package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s.jackson.JsonMethods
import org.json4s.DefaultFormats

/** The bench's driver-parsed compact line must ALWAYS fit the driver's
  * 2000-char output tail (minus sbt's success trailer) and stay valid
  * JSON — this contract silently broke twice (BENCH_r9-r11 and
  * BENCH_r17 recorded parsed:null). Pins the r18 sizing ladder:
  * 3-decimal seconds → integer ms → drop-fastest with an omitted count.
  */
class BenchLineSpec extends AnyFunSuite {
  implicit val fmts: DefaultFormats.type = DefaultFormats

  private val env =
    """"env":{"load":[0.50,1.20],"load_base":2.00,"mem_mb":126000,"canary":[0.500,0.260,0.270]},"env_verdict":"clean""""

  private def queries(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q$i%03d_some_operator_name", i * 0.013))

  test("small suites keep full 3-decimal seconds") {
    val line = BenchLine.sized(queries(20), 2.73, 0, "/root/testdata/sf0.1", env)
    assert(line.length <= 1850)
    val j = JsonMethods.parse(line)
    assert((j \ "unit_queries").toOption.isEmpty, "no degrade needed")
    assert((j \ "queries" \ "q007").extract[Double] == 0.091)
    assert((j \ "env" \ "canary").extract[Seq[Double]] == Seq(0.5, 0.26, 0.27))
  }

  test("large suites degrade to integer ms, never overflow the budget") {
    val line = BenchLine.sized(queries(140), 130.5, 0, "/root/testdata/sf0.1", env)
    assert(line.length <= 1850, s"line ${line.length} chars")
    val j = JsonMethods.parse(line)
    assert((j \ "unit_queries").extract[String] == "ms")
    assert((j \ "queries" \ "q007").extract[Long] == 91L)
    assert((j \ "omitted").toOption.isEmpty, "140 queries fit at ms precision")
  }

  test("extreme suites drop the FASTEST queries and say how many") {
    val line = BenchLine.sized(queries(600), 999.0, 0, "/sf", env)
    assert(line.length <= 1850, s"line ${line.length} chars")
    val j = JsonMethods.parse(line)
    val omitted = (j \ "omitted").extract[Int]
    assert(omitted > 0)
    val kept = (j \ "queries").extract[Map[String, Long]]
    assert(kept.size == 600 - omitted)
    // the slowest query always survives; the fastest goes first
    assert(kept.contains("q600"))
    assert(!kept.contains("q001"))
  }

  test("failures sort last in the drop order and stay named") {
    val qs = queries(600).updated(0, ("q001_failed_one", -1.0))
    val line = BenchLine.sized(qs, 999.0, 1, "/sf", env, budget = 700)
    assert(line.length <= 700)
    val j = JsonMethods.parse(line)
    assert((j \ "failed").extract[Int] == 1)
    assert((j \ "failed_queries").extract[Seq[String]] == Seq("q001_failed_one"))
    val kept = (j \ "queries").extract[Map[String, Long]]
    // at a 700-char budget almost everything is dropped, but the failed
    // query (-1) sorts to the very end of the drop order and survives
    assert(kept.get("q001").contains(-1L))
    assert(kept.contains("q600"))
  }

  test("a budget below the fixed header returns the shortest rung, no spin") {
    val line = BenchLine.sized(queries(50), 5.0, 0, "/sf", env, budget = 100)
    assert(line.length > 100, "nothing fits 100 chars — fallback expected")
    val j = JsonMethods.parse(line)
    assert((j \ "omitted").extract[Int] == 50, "shortest rung drops all")
    assert((j \ "metric").extract[String] == "total")
  }

  test("env verdict: clean / loaded / inflated from the read-out rule") {
    // explicit baseline 0 = the r18 absolute rule (an idle-at-0 host)
    // clean: low load, canary inside the 0.26-0.39 band
    assert(BenchLine.envVerdict(0.5, 1.2, 0.26, 0.27, 0.0) == "clean")
    // loaded: the r18 capture's shape — load 3.44→7.26 while the canary
    // slipped through contention inside its band
    assert(BenchLine.envVerdict(3.44, 7.26, 0.265, 0.376, 0.0) == "loaded")
    // the start boundary precedes the suite's own work: no allowance
    assert(BenchLine.envVerdict(2.5, 2.5, 0.30, 0.30, 0.0) == "loaded")
    // inflated: mid/end canary above the band — uniform slowdown proven
    // from the artifact; outranks the load signal
    assert(BenchLine.envVerdict(7.0, 7.0, 0.80, 0.90, 0.0) == "inflated")
    assert(BenchLine.envVerdict(0.3, 0.3, 0.50, 0.60, 0.0) == "inflated")
    // one failed canary sample: judge on the valid one
    assert(BenchLine.envVerdict(0.3, 0.3, -1.0, 0.60, 0.0) == "inflated")
    // both failed: judge on load alone
    assert(BenchLine.envVerdict(0.3, 0.3, -1.0, -1.0, 0.0) == "clean")
    assert(BenchLine.envVerdict(0.3, 4.6, -1.0, -1.0, 0.0) == "loaded")
    // canary[0] (first page-cache touch) plays no part — only mid/end
    // reach the function by construction in Bench.main
  }

  test("env verdict is judged relative to idle baseline + self-load (r20)") {
    // THIS box idles near 2 (SCALE.md r19: every honest capture ran at
    // load 1.25–3.78 with flat canaries), and the suite's own local[32]
    // bursts add up to ~2.6 to the END sample — at baseline 2.0 those
    // genuinely-clean captures now label `clean`...
    assert(BenchLine.envVerdict(1.59, 3.09, 0.182, 0.200, 2.0) == "clean")
    assert(BenchLine.envVerdict(2.15, 3.78, 0.244, 0.231, 2.0) == "clean")
    assert(BenchLine.envVerdict(1.45, 4.03, 0.195, 0.185, 2.0) == "clean")
    // ...while the r18 pollution regime (end 7.26, excess 2.8 past even
    // the self-load allowance) still fires
    assert(BenchLine.envVerdict(3.44, 7.26, 0.265, 0.376, 2.0) == "loaded")
    // a polluted START has no self-load excuse: baseline + threshold
    assert(BenchLine.envVerdict(4.01, 4.01, 0.30, 0.30, 2.0) == "loaded")
    // an inflated canary outranks the baseline math entirely
    assert(BenchLine.envVerdict(2.0, 2.0, 0.80, 0.90, 2.0) == "inflated")
    // the default baseline comes from SPARK_GRAFT_LOAD_BASELINE or 2.0
    assert(BenchLine.IdleLoadBaseline >= 0.0)
  }

  test("the verdict field rides the compact line inside the budget") {
    val line = BenchLine.sized(queries(140), 130.5, 0,
      "/root/testdata/sf0.1", env)
    assert(line.length <= 1850, s"line ${line.length} chars")
    val j = JsonMethods.parse(line)
    assert((j \ "env_verdict").extract[String] == "clean")
  }

  test("every ladder rung is parseable JSON with the fixed header intact") {
    for (budget <- Seq(1850, 1200, 900, 700, 500)) {
      val line = BenchLine.sized(queries(300), 55.5, 0, "/sf", env, budget)
      assert(line.length <= budget, s"budget $budget: ${line.length}")
      val j = JsonMethods.parse(line)
      assert((j \ "metric").extract[String] == "total")
      assert((j \ "value").extract[Double] == 55.5)
      assert((j \ "env" \ "mem_mb").extract[Long] == 126000L)
    }
  }
}
