package graft

import java.nio.file.Files

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{EventTime, Tables}
import graft.operators.EventQueries

/** Pins the dual-layout contract for event-time ingestion (EventTime).
  *
  * The driver's `events.ts` physical layout has changed once between data
  * generations already (TIMESTAMP(NANOS) → timestamp[us]); this spec
  * guarantees the engine never hard-binds to one layout again. It rewrites
  * the same sf0.001 events under all three supported encodings —
  *
  *   - BIGINT epoch nanos (what `spark.sql.legacy.parquet.nanosAsLong`
  *     turns a TIMESTAMP(NANOS) column into at load time, so this exercises
  *     the exact Spark-side type that layout produces),
  *   - timestamp[us] wall time  → loaded as TIMESTAMP_NTZ,
  *   - timestamp[us] UTC instant → loaded as TIMESTAMP,
  *
  * — and asserts every event plan (q_b1..q_b4, q_b9) produces identical
  * rows on all three.
  */
class EventTimeLayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-evlayout-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("event plans are invariant across all supported ts layouts") {
    val base = EventTime.events(spark, sf) // canonical t_us regardless of layout
    val orders = Tables(spark, sf, "orders")
    val tmp = Files.createTempDirectory("evlayout")

    def mk(name: String, tsCol: Column): String = {
      val d = tmp.resolve(name).toString
      base
        .select(col("event_id"), tsCol.as("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .write.parquet(s"$d/events.parquet")
      orders.write.parquet(s"$d/orders.parquet")
      d
    }

    // µs·1000 stays well inside int64 (epoch 2026 ≈ 1.8e18 ns < 2^63)
    val dNanos = mk("nanos", col("t_us") * lit(1000L))
    val dNtz   = mk("ntz", timestamp_micros(col("t_us")).cast(TimestampNTZType))
    val dTs    = mk("ts", timestamp_micros(col("t_us")))

    // the three fixtures must actually load as three DIFFERENT types —
    // otherwise the invariance assertion below proves nothing
    def tsType(d: String) = Tables(spark, d, "events").schema("ts").dataType
    assert(tsType(dNanos) == LongType)
    assert(tsType(dNtz) == TimestampNTZType)
    assert(tsType(dTs) == TimestampType)

    for (q <- Seq("q_b1_tumbling_window", "q_b2_sliding_window",
        "q_b3_sessionize", "q_b4_asof_join", "q_b9_interval_join")) {
      val plan = EventQueries.defs.find(_.name == q).get.plan
      val onNanos = plan(spark, dNanos).collect().toSeq
      val onNtz   = plan(spark, dNtz).collect().toSeq
      val onTs    = plan(spark, dTs).collect().toSeq
      assert(onNanos.nonEmpty, s"$q: empty result on fixture")
      assert(onNanos == onNtz, s"$q: nanos vs timestamp_ntz layout diverged")
      assert(onNanos == onTs, s"$q: nanos vs timestamp layout diverged")
    }

    // and the CURRENT driver layout round-trips through the same helper to
    // the same values as the rewritten fixtures (anchors the fixtures to
    // the real table, not just to each other)
    val cur = EventTime.events(spark, sf).select(col("event_id"), col("t_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val fix = EventTime.events(spark, dNanos).select(col("event_id"), col("t_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cur == fix)
  }

  test("EventTime rejects an unsupported ts type instead of mis-reading it") {
    import org.apache.spark.sql.types.StringType
    val e = intercept[IllegalArgumentException](EventTime.microsExpr(StringType))
    assert(e.getMessage.contains("unsupported"))
  }
}
