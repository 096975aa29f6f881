package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SPARK_GRAFT_TIER=headline contract: the tier list must stay a
  * subset of the live registry (a renamed query must fail THIS spec,
  * not silently shrink the headline bench), and must keep at least one
  * representative of every operator family so a headline-only driver
  * run still exercises each scale story.
  */
class BenchTierSpec extends AnyFunSuite {

  test("headline tier is a subset of the registered query surface") {
    val missing = Bench.HeadlineTier -- SparkEntry.queries.keySet
    assert(missing.isEmpty,
      s"headline tier names not in the registry: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("headline tier keeps a representative per family") {
    val t = Bench.HeadlineTier
    assert(t.exists(_.startsWith("q_a")), "relational family")
    assert(t.exists(_.startsWith("q_b")), "event/dedup-base family")
    // the four stored-index lifecycles
    assert(t.contains("q_c45_bm25_stored") && t.contains("q_c66_minhash_stored")
      && t.contains("q_c9_ann_ivf") && t.contains("q_c103_phrase_search"))
    // trainer cold path, CC-fixpoint capstone, calibration sweep, multimodal
    assert(t.contains("q_c33_bpe_train"))
    assert(t.contains("q_c117_pipeline_funnel"))
    assert(t.contains("q_c95_winnow_calibration"))
    assert(t.contains("q_c10_multimodal_stats") && t.contains("q_c41_media_neardup"))
  }

  test("the probe query is in every tier") {
    assert(Bench.HeadlineTier.contains("q_a1_scan_filter"))
  }
}
