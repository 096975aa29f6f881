package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 skew dispatch for the event surface: q_b3/q_b4 pick the plain
  * or salted plan from `spark.graft.events.salted` (on/off/auto) — auto is
  * a size floor plus a bounded head-sample skew probe. This spec pins BOTH
  * sides of every flip by plan shape (the HotUserSkewSpec predicate: a
  * salted plan never runs a per-EVENT window partitioned on user_id
  * alone; a plain plan always does) and proves the probe's positive and
  * negative paths on real data.
  */
class EventDispatchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"
  private var hotDir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-dispatch-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    hotDir = writeHotFixture()
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Minimal hot fixture: one user holds ~90 % of events (well above the
    * 5 % probe threshold); enough orders for q_b4 to be non-vacuous.
    */
  private def writeHotFixture(): String = {
    val s = spark
    import s.implicits._
    val t0 = 1700000000000000L
    val hot = (0 until 1800).map(i => (i.toLong, t0 + i * 60000000L, 1L))
    val cold = (0 until 200).map(i => (10000L + i, t0 + i * 300000000L, 2L + (i % 20)))
    val dir = Files.createTempDirectory("dispatchhot").toString
    (hot ++ cold).toDF("event_id", "tsu", "user_id")
      .select(col("event_id"), timestamp_micros(col("tsu")).as("ts"),
        col("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.parquet(s"$dir/events.parquet")
    (1L to 21L).map(u => (u * 10, u, t0 + 1000000L, 5.0))
      .toDF("o_orderkey", "o_custkey", "odate_us", "o_totalprice")
      .select(col("o_orderkey"), col("o_custkey"),
        timestamp_micros(col("odate_us")).cast("timestamp_ntz").as("o_orderdate"),
        col("o_totalprice"))
      .write.parquet(s"$dir/orders.parquet")
    dir
  }

  /** True iff the optimized plan runs a per-EVENT window partitioned on
    * user_id alone (the skew-hazard shape the salted plans eliminate).
    */
  private def hasUnsaltedEventWindow(name: String, dir: String): Boolean =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.optimizedPlan.toString.linesIterator
      .exists(l => l.contains("windowspecdefinition(user_id") && !l.contains("bk") &&
        (l.contains("tsu#") || l.contains("t_us#")))

  private def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("default auto keeps the plain plan below the size floor") {
    for (q <- Seq("q_b3_sessionize", "q_b4_asof_join"))
      assert(hasUnsaltedEventWindow(q, sf), s"$q should dispatch PLAIN at tiny SF")
  }

  test("salted=on forces the salted plan; rows stay identical to plain") {
    withConf("spark.graft.events.salted" -> "on") {
      for (q <- Seq("q_b3_sessionize", "q_b4_asof_join"))
        assert(!hasUnsaltedEventWindow(q, sf), s"$q should dispatch SALTED when forced on")
      val salted = SparkEntry.queries("q_b3_sessionize")(spark, sf)
        .collect().map(_.toString).toSeq
      spark.conf.set("spark.graft.events.salted", "off")
      val plain = SparkEntry.queries("q_b3_sessionize")(spark, sf)
        .collect().map(_.toString).toSeq
      assert(salted == plain && plain.nonEmpty)
    }
  }

  test("the probe's tail sample catches a hot user living only in the LAST part file") {
    // head-sample blind spot (round-14 lead 2): uniform users fill the
    // early part files; the hot user's rows are appended as a separate
    // part renamed to sort last. A head-only probe sees uniform data and
    // would dispatch plain; the tail sample must flip it.
    val s = spark
    import s.implicits._
    val t0 = 1700000000000000L
    val dir = java.nio.file.Files.createTempDirectory("tailhot").toString
    val evPath = s"$dir/events.parquet"
    (0 until 2000).map(i => (i.toLong, t0 + i * 60000000L, 2L + (i % 500)))
      .toDF("event_id", "tsu", "user_id")
      .select(col("event_id"), timestamp_micros(col("tsu")).as("ts"),
        col("user_id"), lit("view").as("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .repartition(3).write.parquet(evPath)
    (0 until 2000).map(i => (50000L + i, t0 + i * 60000000L, 1L))
      .toDF("event_id", "tsu", "user_id")
      .select(col("event_id"), timestamp_micros(col("tsu")).as("ts"),
        col("user_id"), lit("view").as("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .coalesce(1).write.mode("append").parquet(evPath)
    // rename the appended (hot) part so it is lexicographically LAST
    val p = new org.apache.hadoop.fs.Path(evPath)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(p).map(_.getPath)
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    val hot = parts.maxBy(f => fs.getFileStatus(f).getModificationTime)
    fs.rename(hot, new org.apache.hadoop.fs.Path(evPath, "part-zzz-hot.parquet"))
    (1L to 21L).map(u => (u * 10, u, t0 + 1000L, 5.0))
      .toDF("o_orderkey", "o_custkey", "odate_us", "o_totalprice")
      .select(col("o_orderkey"), col("o_custkey"),
        timestamp_micros(col("odate_us")).cast("timestamp_ntz").as("o_orderdate"),
        col("o_totalprice"))
      .write.parquet(s"$dir/orders.parquet")
    withConf("spark.graft.events.saltBytes" -> "0") {
      assert(!hasUnsaltedEventWindow("q_b3_sessionize", dir),
        "a tail-file hot user (50% of events) must probe as skewed -> salted plan")
    }
  }

  test("auto above the floor probes skew: hot fixture flips, uniform stays plain") {
    // floor 0 puts every table above the size floor, so the probe decides.
    // The benign side uses sf0.01 (max user share 0.86 %) — sf0.001 has
    // only 15 users (top share 8.8 %) and legitimately probes as skewed.
    withConf("spark.graft.events.saltBytes" -> "0") {
      for (q <- Seq("q_b3_sessionize", "q_b4_asof_join")) {
        assert(!hasUnsaltedEventWindow(q, hotDir),
          s"$q: the 90%-hot fixture must probe as skewed -> salted plan")
        assert(hasUnsaltedEventWindow(q, "/root/testdata/sf0.01"),
          s"$q: the uniform driver fixture must probe as benign -> plain plan")
      }
    }
  }
}
