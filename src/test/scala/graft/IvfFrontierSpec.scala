package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c132 — the IVF nprobe frontier (q_c120's calibration verb for the
  * second approximate family): recall@5 against exact brute force and
  * scanned-rows permille per nprobe, off the stored compacted index.
  * Deterministic end-to-end (Lloyd training, int8 packing and the
  * search tie-breaks are all fixed), so the gates are structural:
  * recall must be monotone in fan-out, scanned rows must grow with
  * fan-out, and the accounting must stay inside the corpus bound.
  */
class IvfFrontierSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-ivffrontier-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rows() =
    SparkEntry.queries("q_c132_ivf_nprobe_frontier")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq

  test("frontier: recall monotone in nprobe, scanned rows strictly growing, bounds hold") {
    val out = rows()
    assert(out.size >= 4, s"grid must have at least 4 distinct points: $out")
    assert(out.map(_._1) === out.map(_._1).sorted, "rows ordered by nprobe")
    // recall@5 never decreases as the probe fan-out grows (a superset of
    // probed cells can only add stage-1 candidates under the same ranks)
    out.sliding(2).foreach { case Seq(a, b) =>
      assert(b._5 >= a._5, s"recall must be monotone: $a -> $b")
      assert(b._6 > a._6, s"scanned rows must grow with fan-out: $a -> $b")
    }
    // endpoint floors measured on the fixture (deterministic):
    // k/2 fan-out reaches >= 0.9 recall; the 1-probe point scans < 5 %
    assert(out.last._5 >= 900L, s"k/2 recall floor: ${out.last}")
    assert(out.head._7 < 50L, s"1-probe scan ceiling: ${out.head}")
    // accounting stays inside the corpus bound and truth depth
    for (r <- out) {
      assert(r._4 <= r._3, s"hits cannot exceed truth rows: $r")
      assert(r._7 <= 1000L, s"scanned fraction is a permille: $r")
      assert(r._2 > 0 && r._3 == r._2 * 5, s"truth must be 5 rows per query: $r")
    }
  }

  test("frontier is deterministic run-to-run") {
    assert(rows() === rows())
  }
}
