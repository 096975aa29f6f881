package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c127 hybrid RRF — the fused list must be consistent with the
  * REGISTERED component retrievers (q_c45's BM25 top-20 and q_b7's
  * exemplar-0 cosine ranking), the RRF arithmetic must be exactly
  * Σ 1/(60+rank) over the lists an item appears in (DECIMAL(18,6)
  * quantized), and the exemplar itself must never enter via the dense
  * side.
  */
class HybridRrfSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-rrf-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("fusion ties to the registered retrievers; RRF arithmetic exact") {
    val fused = SparkEntry.queries("q_c127_hybrid_rrf")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(fused.length == 20 && fused.map(_._1).distinct.length == 20)
    // RRF arithmetic: quantized reciprocal ranks, absent list = 0
    def q6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    for ((id, br, dr, rrf) <- fused) {
      val expect = (if (br > 0) q6(1.0 / (60 + br)) else BigDecimal(0)) +
        (if (dr > 0) q6(1.0 / (60 + dr)) else BigDecimal(0))
      assert(BigDecimal(rrf) == expect, s"id $id rrf")
      assert(br >= 0 && br <= 100 && dr >= 0 && dr <= 100)
    }
    // emitted order is (rrf DESC, id)
    assert(fused == fused.sortBy(r => (-r._4, r._1)))
    // lexical consistency: any fused row claiming bm25 rank <= 20 must
    // name exactly the doc the REGISTERED q_c45 top-20 puts there
    val bmTop = SparkEntry.queries("q_c45_bm25_stored")(spark, sf)
      .collect().map(_.getLong(0)).toSeq // ordered by (bm25 DESC, doc_id)
    for ((id, br, _, _) <- fused if br >= 1 && br <= 20)
      assert(bmTop(br.toInt - 1) == id, s"bm25 rank $br must be doc ${bmTop(br.toInt - 1)}")
    // dense consistency: rows claiming dense rank <= 10 must match the
    // REGISTERED q_b7 ranking for query vector 0
    val denseTop = SparkEntry.queries("q_b7_cosine_topk")(spark, sf)
      .collect().filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(1), r.getLong(2))).toMap // rank -> vec_id
    graft.core.CachedRdds.drain()
    for ((id, _, dr, _) <- fused if dr >= 1 && dr <= 10)
      assert(denseTop(dr) == id, s"dense rank $dr must be vec ${denseTop(dr)}")
    // the exemplar never enters through its own list
    assert(!fused.exists(r => r._1 == 0L && r._3 > 0L),
      "vector 0 must not rank against itself on the dense side")
    // union semantics are real on this fixture: both retrievers
    // contribute (some fused item carries each kind of rank)
    assert(fused.exists(_._2 > 0) && fused.exists(_._3 > 0))
  }
}
