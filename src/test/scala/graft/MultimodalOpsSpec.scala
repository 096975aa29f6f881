package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps

class MultimodalOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-mm-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("media table: binary payload column with typed metadata, deterministic") {
    val m = MultimodalOps.media(spark, sf).collect()
    assert(m.nonEmpty)
    assert(m.forall(r => Set("image", "audio", "video").contains(r.kind)))
    assert(m.forall(r => r.payload.nonEmpty && r.width >= 1 && r.height >= 1))
    // deterministic kind mapping
    assert(m.forall(r => r.kind == Seq("image", "audio", "video")((r.media_id % 3).toInt)))
  }

  test("feature extraction: batched, deterministic, fixed dim, binary dropped") {
    val f1 = MultimodalOps.extractFeatures(MultimodalOps.media(spark, sf)).collect()
    val f2 = MultimodalOps.extractFeatures(MultimodalOps.media(spark, sf)).collect()
    assert(f1.map(_.media_id).sorted.sameElements(f2.map(_.media_id).sorted))
    assert(f1.forall(_.features.length == 8))
    val m1 = f1.map(r => r.media_id -> r.features.toSeq).toMap
    val m2 = f2.map(r => r.media_id -> r.features.toSeq).toMap
    assert(m1 == m2, "stub decode must be deterministic")
    assert(f1.forall(r => r.features.forall(v => v >= 0.0f && v < 1.0f)))
  }

  test("resize plan: aspect preserved, bounded by max edge, no decode") {
    val r = MultimodalOps.resizePlan(MultimodalOps.media(spark, sf).toDF(), 64)
      .select("width", "height", "out_width", "out_height").collect()
    assert(r.forall(x => x.getInt(2) <= 64 && x.getInt(3) <= 64))
    assert(r.forall(x => x.getInt(2) >= 1 && x.getInt(3) >= 1))
    // no-op when already small
    assert(r.filter(x => x.getInt(0) <= 64 && x.getInt(1) <= 64)
      .forall(x => x.getInt(2) == x.getInt(0) && x.getInt(3) == x.getInt(1)))
  }

  test("frame sampling: every k-th index, video only") {
    val r = MultimodalOps.frameSamplePlan(MultimodalOps.media(spark, sf).toDF(), 10).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val idx = row.getSeq[Int](1)
      assert(idx.head == 0 && idx.forall(_ % 10 == 0))
    }
  }
}
