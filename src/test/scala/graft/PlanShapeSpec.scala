package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the optimized-plan SHAPE of the queries fixed in round 8 for the
  * Generate per-element re-evaluation hazard (PERF.md): whole-stage
  * codegen defers a non-generator projection co-located with
  * explode/posexplode into the per-element output loop, so an expensive
  * expression beside a Generate re-runs once per array element. These
  * asserts fail if a refactor reintroduces the shape.
  */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.core.GraftSession.local(4, 4)
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def optimized(name: String): String = {
    val p = SparkEntry.queries(name)(spark, dir).queryExecution.optimizedPlan.toString
    graft.core.CachedRdds.drain()
    p
  }

  private def generates(plan: String): Int =
    plan.linesIterator.count(_.contains("Generate "))

  test("q_c17 quantization is generator-free (per-row array folds)") {
    val plan = optimized("q_c17_embedding_quantize")
    assert(generates(plan) == 0, s"expected no Generate node:\n$plan")
    // the array_max projection must sit in its own Project, not inside a
    // higher-order lambda of the consuming expressions
    assert(plan.contains("array_max"))
  }

  test("q_c2 simhash has exactly one Generate (the token explode)") {
    val plan = optimized("q_c2_simhash")
    assert(generates(plan) == 1, s"expected exactly the token explode:\n$plan")
    // the 16 bit-sums ride one aggregation keyed by doc, not an exploded k
    assert(!plan.contains("sequence(0, 15)"),
      s"bit index re-explode reintroduced:\n$plan")
  }

  test("q_c4 LSH signature feeds the generator input, not a pass-through") {
    val plan = optimized("q_c4_embedding_neardup")
    // hyperplanesignature must appear only below/inside generator inputs —
    // i.e. never on a Generate line's pass-through (required-output) side.
    // Cheap structural proxy: every line mentioning the signature fn is a
    // Project line, not a Generate line.
    val bad = plan.linesIterator
      .filter(l => l.contains("Generate ") && l.contains("hyperplanesignature"))
    assert(bad.isEmpty || {
      // signature referenced inside the generator expression itself is
      // fine (evaluated once per row to build the array); a bare attr is
      // also fine. Only flag if the fn call rides OUTSIDE explode(...)
      // on a Generate line — conservative: require it inside "explode(".
      bad.forall(l => l.indexOf("hyperplanesignature") > l.indexOf("explode("))
    })
  }
}
