package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c93 — per-source centroid cosine matrix. The planted fixture has
  * closed-form centroids: source s1 averages [2,0] and [4,0] → [3,0];
  * s2 holds [0,5] → orthogonal to s1 (cosine exactly 0); s3 holds
  * [6,0] → collinear with s1 (cosine exactly 1, no quantization loss:
  * dp = 18, norms 9·36, sqrt = 18). A doc without an embedding row
  * must not perturb its source's centroid.
  */
class SourceCentroidSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-centroid-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-centroid").toString
    val s = spark
    import s.implicits._
    Seq(
      (1L, "first document text", "s1"),
      (2L, "second document text", "s1"),
      (3L, "third document text", "s2"),
      (4L, "fourth document text", "s3"),
      (9L, "doc with no embedding row", "s1"))
      .toDF("doc_id", "text", "source").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // doc 2's second row carries an EMPTY embedding: it must count toward
    // neither the centroid nor n_vecs, in batch AND in the streaming
    // serve (the review-found divergence class: batch counted pre-explode
    // rows while the stream can only see component cells)
    Seq(
      (1L, Seq(2f, 0f), 0),
      (2L, Seq(4f, 0f), 0),
      (3L, Seq(0f, 5f), 1),
      (4L, Seq(6f, 0f), 2),
      (9L, Seq.empty[Float], 0))
      .toDF("vec_id", "embedding", "label").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.core.LocalArtifacts.deleteRecursively(dir)
  }

  test("q_c93: closed-form centroids — orthogonal 0, collinear 1, exact counts") {
    val rows = SparkEntry.queries("q_c93_source_centroid_drift")(spark, dir).collect()
    graft.core.CachedRdds.drain()
    val got = rows.map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getAs[Double]("cosine"))).toSet
    assert(got === Set(
      ("s1", "s2", 2L, 1L, 0.0),
      ("s1", "s3", 2L, 1L, 1.0),
      ("s2", "s3", 1L, 1L, 0.0)))
  }

  test("q_c93 streaming twin: served matrix equals batch across uneven micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val rows = graft.core.Tables(sp, dir, "embeddings")
      .join(graft.core.Tables(sp, dir, "documents")
        .select(col("doc_id"), col("source")), col("doc_id") === col("vec_id"))
      .select(col("source"), col("embedding"))
      .as[(String, Seq[Float])].collect()
    val input = MemoryStream[(String, Seq[Float])]
    val q = graft.streaming.StreamingOps
      .centroidUpdates(input.toDF().toDF("source", "embedding"))
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_cen").toString)
      .format("memory").queryName("censtate").outputMode("complete").start()
    // deliberately uneven: one vector, then two, then the tail
    for (chunk <- Seq(rows.take(1), rows.slice(1, 3), rows.drop(3))) {
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val served = graft.streaming.StreamingOps
      .centroidDriftServe(sp.table("censtate"))
      .collect().map(_.toString).toSeq
    q.stop()
    val batch = SparkEntry.queries("q_c93_source_centroid_drift")(sp, dir)
      .collect().map(_.toString).toSeq
    graft.core.CachedRdds.drain()
    assert(served.nonEmpty && served === batch,
      "exact decimal accumulation makes the streamed state order-free")
  }

  test("q_c93 on sf0.001: full unordered matrix, cosines in [-1, 1]") {
    val rows = SparkEntry.queries("q_c93_source_centroid_drift")(spark,
      "/root/testdata/sf0.001").collect()
    graft.core.CachedRdds.drain()
    assert(rows.nonEmpty)
    val sources = rows.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct
    val k = sources.length.toLong
    assert(rows.length === (k * (k - 1) / 2),
      "every unordered source pair must have a row (real corpora share dimensions)")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      val c = r.getAs[Double]("cosine")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(r.getLong(2) > 0 && r.getLong(3) > 0)
    }
  }
}
