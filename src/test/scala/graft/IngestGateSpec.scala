package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c126 ingestion quality gate — the report must be the exact
  * base/batch split of the REGISTERED q_c31 rule flags (single-copy
  * proof: if the gate's rules forked from the filter's, this breaks),
  * with integer-permille arithmetic and the ≥50 ‰ alarm.
  */
class IngestGateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ingestgate-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("gate rates == base/batch split of the registered q_c31 flags; alarm at 50 permille") {
    val gate = SparkEntry.queries("q_c126_ingest_quality_gate")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // independent recomputation from the REGISTERED rules filter: q_c31
    // emits (doc_id, n_words, r_words, r_wlen, r_stop, r_ttr, pass)
    val flags = SparkEntry.queries("q_c31_rules_filter")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getInt(6)))
    graft.core.CachedRdds.drain()
    def pm(g: Seq[(Long, Int, Int, Int, Int, Int)], f: ((Long, Int, Int, Int, Int, Int)) => Int) =
      g.map(f).map(_.toLong).sum * 1000 / g.length
    val base = flags.filter(_._1 % 10 != 3).toSeq
    val batch = flags.filter(_._1 % 10 == 3).toSeq
    assert(base.nonEmpty && batch.nonEmpty)
    val expect = Seq(
      ("pass_pm", pm(base, _._6), pm(batch, _._6)),
      ("r_stop_pm", pm(base, _._4), pm(batch, _._4)),
      ("r_ttr_pm", pm(base, _._5), pm(batch, _._5)),
      ("r_wlen_pm", pm(base, _._3), pm(batch, _._3)),
      ("r_words_pm", pm(base, _._2), pm(batch, _._2)))
    assert(gate.map(r => (r._1, r._2, r._3)) === expect,
      "gate rates must be the base/batch split of the registered rule flags")
    for ((_, b, c, delta, alarm) <- gate) {
      assert(delta == c - b)
      assert(alarm == (if (math.abs(c - b) >= 50) 1L else 0L))
    }
    // the fixture exercises both gate outcomes
    assert(gate.exists(_._5 == 1L) && gate.exists(_._5 == 0L))
  }

  test("streaming gate: served admission report == batch q_c126 after every prefix") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val rows = graft.core.Tables(sp, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def batchGate(docs: Seq[(Long, String)]) =
      graft.operators.PipelineQueries.gateReport(
        graft.operators.PipelineQueries.gateSums(
          sp.createDataFrame(docs).toDF("doc_id", "text")))
        .collect().map(_.toString).toSeq
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps
      .gateUpdates(input.toDF().toDF("doc_id", "text"))
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_gate").toString)
      .format("memory").queryName("gatestate").outputMode("complete").start()
    // uneven micro-batches; the served report after EACH prefix must
    // equal the batch gate over that prefix union — the additive
    // counter state + shared report tail cannot drift from batch
    val cuts = Seq(5, 170, rows.length)
    var prev = 0
    for (cut <- cuts) {
      input.addData(rows.slice(prev, cut).toSeq)
      q.processAllAvailable()
      val served = graft.streaming.StreamingOps
        .gateServe(sp.table("gatestate")).collect().map(_.toString).toSeq
      assert(served === batchGate(rows.take(cut).toSeq),
        s"prefix $cut: streamed gate must equal the batch gate")
      prev = cut
    }
    q.stop()
    // and the full-stream serve IS the registered query's answer
    val full = SparkEntry.queries("q_c126_ingest_quality_gate")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(batchGate(rows.toSeq) === full)
    graft.core.CachedRdds.drain()
  }

  test("a one-group input yields a DEFINED all-zero report side, not NULLs") {
    // ADVICE round 16: an input whose prefix holds only base docs (the
    // streaming twin's natural early state) must produce a report with
    // zero counters and a non-null alarm for the absent side — a
    // consumer reading alarm as a non-null BIGINT must not fail.
    import org.apache.spark.sql.functions.col
    val sp = spark
    import sp.implicits._
    val baseOnly = Seq((10L, "the quick brown fox jumps over the lazy dog again and again"),
      (20L, "a plain base document with enough words to pass the gate rules"))
    val out = graft.operators.PipelineQueries.gateReport(
        graft.operators.PipelineQueries.gateSums(
          baseOnly.toDF("doc_id", "text")))
      .collect()
    assert(out.length == 5, "all five metrics must still report")
    out.foreach { r =>
      assert(!r.anyNull, s"one-group report must carry no NULL cells: $r")
      assert(r.getLong(2) == 0L, "absent batch side reports 0 permille")
      assert(r.getLong(3) == -r.getLong(1), "delta = batch - base stays defined")
    }
    graft.core.CachedRdds.drain()
  }
}
