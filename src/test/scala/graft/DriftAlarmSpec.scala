package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c98 — per-source centroid drift alarm (monitor → action).
  *
  * Planted closed-form fixture, one source on each side of the gate:
  * Ids are chosen by the LCG split draw the query uses (base ⇔ draw < 8):
  *  - s1: base centroid [3,0] (ids 1,2), batch centroid [0,3] from FIVE
  *    [0,3] vectors (ids 3,8,10,15,21) → cosine exactly 0, drift_q6 = 10⁶,
  *    threshold_q6 = 10000 + 4000000 DIV 5 = 810000 → **rebuild**.
  *    The batch also carries an EMPTY embedding row (id 26): it must
  *    count toward neither the centroid nor n_batch — in batch AND in
  *    the streaming serve.
  *  - s2: base [0,5] (id 4), batch five more [0,5] → cosine exactly 1,
  *    drift_q6 = 0 → **ok** (in-distribution batch passes).
  *  - s3: base only (no batch vectors) → NO row: there is no verdict to
  *    give against an empty side.
  * A 1-vector batch can never trip the gate (drift ≤ 2·10⁶ <
  * 10000 + 4000000) — the sample-size-aware allowance, pinned below.
  */
class DriftAlarmSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-drift-alarm-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-alarm").toString
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "s1"), (2L, "s1"), (3L, "s1"), (8L, "s1"), (10L, "s1"),
      (15L, "s1"), (21L, "s1"), (26L, "s1"),
      (4L, "s2"), (33L, "s2"), (38L, "s2"), (39L, "s2"), (44L, "s2"),
      (51L, "s2"),
      (5L, "s3"), (6L, "s3"))
    docs.map { case (id, src) => (id, s"doc $id", src) }
      .toDF("doc_id", "text", "source").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq(
      (1L, Seq(2f, 0f), 0), (2L, Seq(4f, 0f), 0),
      (3L, Seq(0f, 3f), 0), (8L, Seq(0f, 3f), 0), (10L, Seq(0f, 3f), 0),
      (15L, Seq(0f, 3f), 0), (21L, Seq(0f, 3f), 0),
      (26L, Seq.empty[Float], 0),
      (4L, Seq(0f, 5f), 1),
      (33L, Seq(0f, 5f), 1), (38L, Seq(0f, 5f), 1), (39L, Seq(0f, 5f), 1),
      (44L, Seq(0f, 5f), 1), (51L, Seq(0f, 5f), 1),
      (5L, Seq(6f, 0f), 2), (6L, Seq.empty[Float], 2))
      .toDF("vec_id", "embedding", "label").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.core.LocalArtifacts.deleteRecursively(dir)
  }

  test("q_c98: shifted batch trips the gate, in-distribution batch passes, empty side emits no verdict") {
    val rows = SparkEntry.queries("q_c98_drift_alarm")(spark, dir).collect()
    graft.core.CachedRdds.drain()
    val got = rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getAs[Double]("cosine"), r.getAs[Long]("drift_q6"),
      r.getAs[Long]("threshold_q6"), r.getAs[String]("verdict"))).toSeq
    assert(got === Seq(
      ("s1", 2L, 5L, 0.0, 1000000L, 810000L, "rebuild"),
      ("s2", 1L, 5L, 1.0, 0L, 810000L, "ok")))
  }

  test("q_c98: a 1-vector batch can never trip the sample-size-aware gate") {
    // threshold at n_batch = 1 is 10000 + 4000000 = 4010000, above the
    // 2·10⁶ drift of even a perfectly ANTI-correlated batch centroid
    import org.apache.spark.sql.functions.col
    val ee = graft.core.Tables(spark, dir, "embeddings")
      .join(graft.core.Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source")), col("doc_id") === col("vec_id"))
      .select(col("source"), col("vec_id"), col("embedding"))
    val (cenA, nvA) = graft.operators.SimilarityQueries.centroidFrames(
      ee.filter(((col("vec_id") % 1000000007L) * 1103515245L + 12345L) % 1000000007L % 10L < 8))
    // a single [0,3] batch vector against s1's [3,0] base: cosine 0
    val s = spark
    import s.implicits._
    val one = Seq(("s1", 8L, Seq(3f, 0f).map(-_))).toDF("source", "vec_id", "embedding")
    val (cenB, nvB) = graft.operators.SimilarityQueries.centroidFrames(one)
    val out = graft.operators.SimilarityQueries
      .centroidAlarm(cenA, nvA, cenB, nvB).collect()
    graft.core.CachedRdds.drain()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Double]("cosine") === -1.0)
    assert(r.getAs[Long]("drift_q6") === 2000000L)
    assert(r.getAs[Long]("threshold_q6") === 4010000L)
    assert(r.getAs[String]("verdict") === "ok")
  }

  test("q_c98 streaming serve: stored base + streamed batch state equals batch verdicts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val ee = graft.core.Tables(sp, dir, "embeddings")
      .join(graft.core.Tables(sp, dir, "documents")
        .select(col("doc_id"), col("source")), col("doc_id") === col("vec_id"))
      .select(col("source"), col("vec_id"), col("embedding"))
    val (baseCen, baseNv) = graft.operators.SimilarityQueries.centroidFrames(
      ee.filter(((col("vec_id") % 1000000007L) * 1103515245L + 12345L) % 1000000007L % 10L < 8))
    val batchRows = ee.filter(((col("vec_id") % 1000000007L) * 1103515245L + 12345L) % 1000000007L % 10L >= 8)
      .select(col("source"), col("embedding"))
      .as[(String, Seq[Float])].collect()
    val input = MemoryStream[(String, Seq[Float])]
    val q = graft.streaming.StreamingOps
      .centroidUpdates(input.toDF().toDF("source", "embedding"))
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_alarm").toString)
      .format("memory").queryName("alarmstate").outputMode("complete").start()
    // deliberately uneven micro-batches, empty-embedding row mid-stream
    for (chunk <- Seq(batchRows.take(2), batchRows.slice(2, 3), batchRows.drop(3))) {
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val served = graft.streaming.StreamingOps
      .centroidAlarmServe(sp.table("alarmstate"), baseCen, baseNv)
      .collect().map(_.toString).sorted.toSeq
    q.stop()
    val batch = SparkEntry.queries("q_c98_drift_alarm")(sp, dir)
      .collect().map(_.toString).sorted.toSeq
    graft.core.CachedRdds.drain()
    assert(served.nonEmpty && served === batch,
      "the shared centroidAlarm tail makes serve ≡ batch bit-exact")
  }

  test("q_c98 on sf0.001: one verdict row per source with both halves, all fields coherent") {
    val rows = SparkEntry.queries("q_c98_drift_alarm")(spark,
      "/root/testdata/sf0.001").collect()
    graft.core.CachedRdds.drain()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      val drift = r.getAs[Long]("drift_q6")
      val thr = r.getAs[Long]("threshold_q6")
      assert(drift >= 0L && drift <= 2000000L)
      assert(thr === 10000L + 4000000L / r.getLong(2))
      assert(r.getAs[String]("verdict") ===
        (if (drift > thr) "rebuild" else "ok"))
    }
  }
}
