package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c58 — the mergeable-sketch scale path for q_b8's exact percentiles.
  * The query is rows-only at the driver (sketch state has no DuckDB
  * twin), so THIS spec carries its correctness: per (lang, quantile) the
  * sketch answer must be an actual data value whose rank is within the
  * Greenwald-Khanna bound of the target rank (accuracy 10 000 ⇒ rank
  * error ≤ n/10 000 — at test sizes that means ±1 rank), cross-checked
  * against the exact q_b8 interpolated answers.
  */
class ApproxPercentileSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-approxpct-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("sketch percentiles sit within the GK rank bound of the exact answers") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables(spark, sf, "documents")
      .select(col("lang"), col("n_chars").cast("long").as("n_chars"))
    val byLang = docs.collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).sorted).toMap
    val approx = SparkEntry.queries("q_c58_percentiles_approx")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(approx.keySet === byLang.keySet)
    for ((lang, (nDocs, ps)) <- approx) {
      val vals = byLang(lang)
      assert(nDocs === vals.length.toLong)
      for ((p, q) <- ps.zip(Seq(0.25, 0.50, 0.75))) {
        // the sketch returns an actual element of the group
        assert(vals.contains(p.toLong),
          s"$lang q$q: sketch value $p is not a data value")
        // rank bound: |rank(p) − q·n| ≤ ceil(n/10000) + 1 (GK guarantee
        // plus the boundary slack of duplicate values)
        val lo = vals.count(_ < p.toLong)
        val hi = vals.count(_ <= p.toLong)
        val target = q * (vals.length - 1)
        val slack = vals.length / 10000.0 + 1.0
        assert(lo - slack <= target && target <= hi + slack,
          s"$lang q$q: sketch rank window [$lo,$hi] misses target $target")
      }
    }
    // cross-check against the exact q_b8 plan: interpolated exact answers
    // bracket within one data-value step of the sketch's element answers
    val exact = SparkEntry.queries("q_b8_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    for ((lang, ps) <- approx; ((a, e), q) <- ps._2.zip(exact(lang)).zip(Seq(0.25, 0.5, 0.75))) {
      val vals = byLang(lang)
      val step = 1 + vals.length / 10000
      val idx = math.max(0, math.min(vals.length - 1, (q * (vals.length - 1)).toInt))
      val neighborhood = vals.slice(math.max(0, idx - 1 - step),
        math.min(vals.length, idx + 2 + step))
      assert(neighborhood.nonEmpty && a >= neighborhood.min - 1e-9
        && a <= neighborhood.max + 1e-9,
        s"$lang q$q: sketch $a far from exact $e (window $neighborhood)")
    }
  }
}
