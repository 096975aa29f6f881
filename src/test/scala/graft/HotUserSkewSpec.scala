package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The event-surface hot-key guard (round 12, VERDICT lead 4): the salted
  * sessionize/as-of variants must be ROW-IDENTICAL to the plain
  * user_id-partitioned plans — on the real driver events AND on a synthetic
  * power-law fixture where one user carries ~85 % of all events (the shape
  * that would straggler the plain window's single partition at scale). The
  * fixture spans ~10 days with gaps straddling the 30-minute session bound
  * and the 6 h salt-bucket boundaries, so bucket-first chaining, empty-
  * bucket breaks, multi-bucket sessions, and the cross-bucket order carry
  * all genuinely occur (asserted non-vacuous below).
  */
class HotUserSkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var hotDir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-hotuser-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    hotDir = writeHotFixture()
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** 1 hot user (~12 000 events) + 50 cold users (~40 each) over 10 days;
    * per-user orders scattered over the same span (plus NULL-key rows to
    * exercise the parity filters).
    */
  private def writeHotFixture(): String = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val t0 = 1700000000000000L // µs epoch, arbitrary
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String, Double)]
    var id = 0L
    // hot user: mixed gaps — mostly short (intra-session), some > 30 min
    // (session breaks), some > 6 h (bucket-skipping breaks)
    var t = t0
    (0 until 12000).foreach { _ =>
      val gap = rnd.nextInt(100) match {
        // mostly just-under-the-bound gaps: sessions chain for hours and
        // MUST span several 6 h salt buckets (the multi-bucket carry path)
        case g if g < 85 => 1200000000L + rnd.nextInt(540000000).toLong  // 20 – 29 min
        case g if g < 95 => 5000000L + rnd.nextInt(600000000).toLong     // 5 s – 10 min
        case g if g < 98 => 1900000000L + rnd.nextInt(1000000000).toLong // 32 – 48 min
        case _           => 22000000000L + (rnd.nextDouble() * 50000000000L).toLong // 6 h+
      }
      t += gap
      id += 1
      rows += ((id, t, 1L, if (rnd.nextBoolean()) "click" else "view", rnd.nextDouble() * 10))
    }
    (2L to 51L).foreach { u =>
      var tu = t0 + rnd.nextInt(1000000000).toLong
      (0 until 40).foreach { _ =>
        tu += 60000000L + (rnd.nextDouble() * 3000000000L).toLong
        id += 1
        rows += ((id, tu, u, "view", rnd.nextDouble()))
      }
    }
    val dir = Files.createTempDirectory("hotuser").toString
    rows.toSeq.toDF("event_id", "tsu", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("tsu")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
      .write.parquet(s"$dir/events.parquet")
    // orders: several per user across the span; one NULL custkey, one NULL date
    val orders = (1L to 51L).flatMap { u =>
      (0 until 6).map { k =>
        (u * 100 + k, u, t0 + k * 200000000000L + rnd.nextInt(1000000000).toLong,
          100.0 + k)
      }
    }
    orders.toDF("o_orderkey", "o_custkey", "odate_us", "o_totalprice")
      .select(col("o_orderkey"), col("o_custkey"),
        timestamp_micros(col("odate_us")).cast("timestamp_ntz").as("o_orderdate"),
        col("o_totalprice"))
      .unionByName(Seq(
        (9001L, Option.empty[Long], Option(t0 + 1000L), 1.0),
        (9002L, Option(1L), Option.empty[Long], 2.0))
        .toDF("o_orderkey", "o_custkey", "odate_us", "o_totalprice")
        .select(col("o_orderkey"), col("o_custkey"),
          timestamp_micros(col("odate_us")).cast("timestamp_ntz").as("o_orderdate"),
          col("o_totalprice")))
      .write.parquet(s"$dir/orders.parquet")
    dir
  }

  private def rows(name: String, dir: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir).collect().toSeq.map(_.toString)

  test("salted sessionize == plain sessionize on the power-law fixture and sf0.001") {
    for (dir <- Seq(hotDir, "/root/testdata/sf0.001")) {
      val plain = rows("q_b3_sessionize", dir)
      val salted = rows("q_b3_sessionize_salted", dir)
      assert(plain == salted, s"sessionize diverges on $dir: " +
        s"${plain.toSet.diff(salted.toSet).take(3)} vs ${salted.toSet.diff(plain.toSet).take(3)}")
    }
    // non-vacuous: the hot user must have multi-session, multi-bucket shape
    val hot = SparkEntry.queries("q_b3_sessionize")(spark, hotDir)
      .filter(col("user_id") === 1L)
    assert(hot.count() > 100, "hot user should produce many sessions")
    assert(hot.filter(col("session_end_us") - col("session_start_us") > 21600000000L)
      .count() > 0, "at least one session must span multiple 6 h salt buckets")
  }

  test("salted as-of join == plain as-of join on the power-law fixture and sf0.001") {
    for (dir <- Seq(hotDir, "/root/testdata/sf0.001")) {
      val plain = rows("q_b4_asof_join", dir)
      val salted = rows("q_b4_asof_salted", dir)
      assert(plain == salted, s"as-of diverges on $dir")
      assert(plain.nonEmpty, s"vacuous as-of comparison on $dir")
    }
  }

  test("salted plans window on (user_id, bucket), never on user_id alone") {
    for (q <- Seq("q_b3_sessionize_salted", "q_b4_asof_salted")) {
      val plan = SparkEntry.queries(q)(spark, hotDir)
        .queryExecution.optimizedPlan.toString
    // every per-EVENT window must carry the bk salt next to user_id; the
    // only user_id-alone windows permitted are over bucket/session-level
    // rows (the O(buckets) carry chain and the session renumbering)
      val eventWindows = plan.linesIterator
        .filter(l => l.contains("windowspecdefinition(user_id") && !l.contains("bk"))
        .toSeq
      // bucket-level windows order by bk; session windows by sess_start.
      // An event-level window would order by (tsu|t_us, event_id|tag ...).
      val offending = eventWindows.filterNot(l =>
        l.contains("bk#") || l.contains("sess_start"))
        .filter(l => l.contains("tsu#") || l.contains("t_us#"))
      assert(offending.isEmpty,
        s"$q has an unsalted per-event window:\n${offending.mkString("\n")}")
    }
  }
}
