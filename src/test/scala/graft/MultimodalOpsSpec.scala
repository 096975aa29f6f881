package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.MediaCodec

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

  test("encoded media: payloads are genuine PNG / RIFF-WAVE / framed PNG bytes") {
    val m = MultimodalOps.encodedMedia(spark, sf).collect()
    assert(m.nonEmpty)
    val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')
    m.foreach { r =>
      r.kind match {
        case "image" =>
          assert(r.payload.take(4).sameElements(pngMagic), s"image ${r.media_id} not PNG")
        case "audio" =>
          assert(new String(r.payload.take(4), "ASCII") == "RIFF" &&
            new String(r.payload.slice(8, 12), "ASCII") == "WAVE",
            s"audio ${r.media_id} not RIFF/WAVE")
        case "video" =>
          // int32-BE frame count, then first frame is PNG
          val f = java.nio.ByteBuffer.wrap(r.payload, 0, 4).getInt
          assert(f == MediaCodec.videoFrames(r.media_id))
          assert(r.payload.slice(8, 12).sameElements(pngMagic),
            s"video ${r.media_id} frame 0 not PNG")
      }
    }
  }

  test("codec round-trip: decoded checksums equal generator closed form (golden)") {
    // decode sees ONLY bytes; expected values come from the generator
    // arithmetic — losslessness of PNG/WAV is what makes them equal
    for (id <- Seq(0L, 3L, 57L, 120L)) { // image ids
      val (n, sum, px) = MediaCodec.decodeImage(MediaCodec.encodeImage(id))
      val (w, h) = MediaCodec.imageDims(id)
      val expected = (for (x <- 0 until w; y <- 0 until h)
        yield MediaCodec.imagePixel(id, x, y).toLong).sum
      assert(n == w.toLong * h && sum == expected && px.length == n.toInt)
    }
    for (id <- Seq(1L, 4L, 100L)) { // audio ids
      val (n, sum, _) = MediaCodec.decodeAudio(MediaCodec.encodeAudio(id, 16000))
      val len = MediaCodec.audioLen(id)
      val expected = (0 until len).map(i => MediaCodec.audioSample(id, i).toLong).sum
      assert(n == len.toLong && sum == expected)
    }
    for (id <- Seq(2L, 5L, 101L)) { // video ids: every 2nd frame sampled
      val (n, sum, _) = MediaCodec.decodeVideo(MediaCodec.encodeVideo(id))
      val f = MediaCodec.videoFrames(id)
      val expected = (for {
        fr <- 0 until f if fr % 2 == 0
        x <- 0 until MediaCodec.VideoFrameW
        y <- 0 until MediaCodec.VideoFrameH
      } yield MediaCodec.videoPixel(id, fr, x, y).toLong).sum
      assert(n == f.toLong && sum == expected)
    }
  }

  test("feature extraction: batched, deterministic, fixed dim, real decode") {
    val f1 = MultimodalOps.decodeFeatures(MultimodalOps.encodedMedia(spark, sf)).collect()
    val f2 = MultimodalOps.decodeFeatures(MultimodalOps.encodedMedia(spark, sf)).collect()
    assert(f1.map(_.media_id).sorted.sameElements(f2.map(_.media_id).sorted))
    assert(f1.forall(_.features.length == 8))
    val m1 = f1.map(r => r.media_id -> r.features.toSeq).toMap
    val m2 = f2.map(r => r.media_id -> r.features.toSeq).toMap
    assert(m1 == m2, "decode must be deterministic")
    assert(f1.forall(r => r.features.forall(v => v >= 0.0f && v < 1.0f)))
    // every decoded row matches the generator closed form, distributed
    f1.foreach { r =>
      (r.media_id % 3) match {
        case 0 =>
          val (w, h) = MediaCodec.imageDims(r.media_id)
          assert(r.n_units == w.toLong * h)
        case 1 => assert(r.n_units == MediaCodec.audioLen(r.media_id).toLong)
        case _ => assert(r.n_units == MediaCodec.videoFrames(r.media_id).toLong)
      }
    }
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
