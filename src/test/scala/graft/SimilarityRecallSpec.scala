package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityQueries

/** Recall of the IVF-pruned ANN (q_c9) against brute force (q_b7) —
  * the assertion the approximate query's rows-only check can't provide.
  */
class SimilarityRecallSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-recall-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("IVF ANN recall@5 >= 0.8 at ~25% scanned fraction") {
    val brute = SimilarityQueries.defs.find(_.name == "q_b7_cosine_topk").get
      .plan(spark, sf)
      .filter("rank <= 5")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = SimilarityQueries.defs.find(_.name == "q_c9_ann_ivf").get
      .plan(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    assert(ivf.nonEmpty && brute.nonEmpty)
    val recalls = brute.keys.toSeq.sorted.map { q =>
      val hits = ivf.getOrElse(q, Set.empty)
      brute(q).intersect(hits).size.toDouble / brute(q).size
    }
    val mean = recalls.sum / recalls.length
    // q_c9 probes nprobe = k/4 of k = 4·√n Lloyd-trained cells ⇒ ~25% of
    // the corpus scanned. Round-2 gate: the trained quantizer must reach
    // recall@5 ≥ 0.8 at that pruning ratio (numpy prototype measured 1.0
    // at sf0.001 / ~0.84 at sf0.1 with the same seeding + 2 iterations).
    val scannedFraction = 0.25
    info(f"mean recall@5 over ${recalls.length} queries: $mean%.2f (scanned ~$scannedFraction%.2f of corpus)")
    assert(mean >= 0.8, f"IVF recall below gate: $mean%.2f < 0.8")
    assert(mean > scannedFraction,
      f"IVF no better than random pruning: recall $mean%.2f <= scanned $scannedFraction%.2f")
  }
}
