package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Evt

/** Streaming twins of Q-B1..B3 driven through MemoryStream — proves the
  * batch plans are genuinely streaming-ready (watermarks, state).
  */
class StreamingOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("tumbling window aggregates an unbounded stream (Q-B1 streaming twin)") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[Evt]
    val q = StreamingOps.tumblingCounts(input.toDF()).writeStream
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("ckpt_t").toString).format("memory").queryName("tumbling").outputMode("complete").start()
    input.addData(
      Evt(1, ts(5), 10, "click", 1.0),
      Evt(2, ts(20), 10, "click", 2.0),
      Evt(3, ts(59), 11, "view", 3.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT event_type, cnt, total_value FROM tumbling ORDER BY event_type").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("click", 2L), ("view", 1L)))
    q.stop()
  }

  test("streaming dedup drops re-deliveries within the watermark") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[Evt]
    val q = StreamingOps.dedupStream(input.toDF()).writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_d").toString)
      .format("memory").queryName("dedup").outputMode("append").start()
    input.addData(
      Evt(1, ts(5), 10, "click", 1.0),
      Evt(2, ts(6), 10, "click", 2.0),
      Evt(1, ts(5), 10, "click", 1.0)) // same-batch duplicate
    q.processAllAvailable()
    // cross-batch re-delivery, re-stamped LATER by the at-least-once
    // source (the dropDuplicatesWithinWatermark case), plus a new event
    input.addData(
      Evt(1, ts(9), 10, "click", 1.0),
      Evt(3, ts(10), 11, "view", 3.0))
    q.processAllAvailable()
    val ids = spark.sql("SELECT event_id FROM dedup ORDER BY event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L, 2L, 3L))
    q.stop()
  }

  test("session_window groups by 30-minute gaps (Q-B3 streaming twin)") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[Evt]
    val q = StreamingOps.sessionWindows(input.toDF()).writeStream
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("ckpt_s").toString).format("memory").queryName("sessions").outputMode("complete").start()
    // user 10: events at :00 and :10 (one session), then :50 (new session)
    input.addData(
      Evt(1, ts(0), 10, "click", 1.0),
      Evt(2, ts(10), 10, "click", 1.0),
      Evt(3, ts(50), 10, "click", 1.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT user_id, n_events FROM sessions ORDER BY session_start").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((10L, 2L), (10L, 1L)))
    q.stop()
  }

  test("session_window stream equals the batch lag+flag q_b3 plan on real events") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val dir = "/root/testdata/sf0.001"
    // expected sessions from the REGISTERED batch plan (lag + cumulative
    // new-session flag) — the oracle-exact q_b3
    val batch = graft.operators.EventQueries.defs
      .find(_.name == "q_b3_sessionize").get.plan(sp, dir)
      .select(col("user_id"), col("session_start_us"), col("session_end_us"),
        col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // the same events as an unbounded stream in three chunks; chunk order
    // follows file order, so later chunks contain EARLIER timestamps —
    // session_window state must merge them (complete mode, lax watermark)
    val evts = graft.core.EventTime.events(sp, dir)
      .select(col("event_id"), timestamp_micros(col("t_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Evt].collect()
    assert(evts.length >= 1000, "fixture sanity")
    val input = MemoryStream[Evt]
    val q = StreamingOps.sessionWindows(input.toDF(), watermark = "365 days")
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_p").toString)
      .format("memory").queryName("sw_parity").outputMode("complete").start()
    for (chunk <- evts.grouped(evts.length / 3 + 1)) {
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    // session_window's end = last event + gap; subtract the gap to compare
    // against the batch plan's last-event-timestamp session_end_us
    val got = sp.sql(
      """SELECT user_id, unix_micros(session_start),
        |       unix_micros(session_end) - 1800000000, n_events
        |FROM sw_parity""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == batch)
    q.stop()
  }

  test("streaming as-of join equals the batch q_b4 union-stream plan") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    import StreamingOps.{AsOfIn, AsOfOut}
    val dir = "/root/testdata/sf0.001"
    val batch = graft.operators.EventQueries.defs
      .find(_.name == "q_b4_asof_join").get.plan(sp, dir)
      .select(col("event_id"), col("ts_us"), col("user_id"),
        col("last_orderkey"),
        unix_micros(col("last_orderdate").cast("timestamp")).as("od_us"),
        col("last_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .toSet
    val orders = graft.core.Tables(sp, dir, "orders")
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t_us"),
        col("o_orderkey"), col("o_totalprice"))
      .collect()
      .map(r => AsOfIn(r.getLong(0), r.getLong(1), 0, 0L, r.getLong(2),
        r.getLong(1), r.getDouble(3)))
    val events = graft.core.EventTime.events(sp, dir)
      .select(col("user_id"), col("t_us"), col("event_id"))
      .collect()
      .map(r => AsOfIn(r.getLong(0), r.getLong(1), 1, r.getLong(2), 0L, 0L, 0.0))
    // deliver in global event-time order (the stream-stream watermark
    // contract) across three micro-batches: state must carry the latest
    // order per user between triggers
    val all = (orders ++ events).sortBy(r => (r.t_us, r.tag, r.o_orderkey))
    val input = MemoryStream[AsOfIn]
    val q = StreamingOps.asOfJoin(input.toDS()).writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_asof").toString)
      .format("memory").queryName("asof_stream").outputMode("append").start()
    for (chunk <- all.grouped(all.length / 3 + 1)) {
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val got = sp.sql(
      """SELECT event_id, ts_us, user_id, last_orderkey, last_orderdate_us,
        |       last_totalprice FROM asof_stream""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .toSet
    assert(got == batch)
    q.stop()
  }

  test("stream-stream interval join equals the batch q_b9 pair counts on real events") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val dir = "/root/testdata/sf0.001"
    val batch = graft.operators.EventQueries.defs
      .find(_.name == "q_b9_interval_join").get.plan(sp, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val evts = graft.core.EventTime.events(sp, dir)
      .select(col("event_id"), timestamp_micros(col("t_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Evt].collect()
    val input = MemoryStream[Evt]
    // the SAME MemoryStream feeds both sides of the self-join (two
    // lineages over one source, the streaming analog of q_b9's self-join)
    val pairs = StreamingOps.intervalPairs(input.toDF(), input.toDF(),
      watermark = "365 days")
    val q = pairs.writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_iv").toString)
      .format("memory").queryName("iv_pairs").outputMode("append").start()
    for (chunk <- evts.grouped(evts.length / 3 + 1)) {
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val got = sp.sql("SELECT user_id, COUNT(*) FROM iv_pairs GROUP BY 1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    q.stop()
    assert(got == batch,
      s"streaming pair counts diverge from batch q_b9 (got ${got.size} users, want ${batch.size})")
  }

  test("chained stateful ops: windowed pair counts AFTER the interval join equal batch") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val dir = "/root/testdata/sf0.001"
    val evtsDf = graft.core.EventTime.events(sp, dir)
      .select(col("event_id"), timestamp_micros(col("t_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
    // batch reference: the SAME naive interval self-join, windowed with the
    // SAME window() expression over ts_a (the smaller-id event's time)
    val bPairs = evtsDf.as("a").join(evtsDf.as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("a.event_id") < col("b.event_id") &&
        abs(unix_micros(col("a.ts")) - unix_micros(col("b.ts"))) <= 60000000L)
      .select(col("a.user_id").as("user_id"), col("a.ts").as("ts_a"))
    val batch = bPairs.groupBy(col("user_id"), window(col("ts_a"), "10 minutes"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("user_id"), col("window.start").cast("long").as("ws"),
        col("n_pairs"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty, "vacuous: no windowed pairs at sf0.001")

    // streaming: deliver in event-time order (watermark contract), then a
    // far-future sentinel pushes the watermark past every real window end
    // so the append-mode aggregation finalizes them. The sentinel user has
    // one event — it can never form a pair, so it adds no rows.
    val evts = evtsDf.as[Evt].collect().sortBy(e => e.ts.getTime)
    val input = MemoryStream[Evt]
    val counts = StreamingOps.intervalPairCounts(
      StreamingOps.intervalPairs(input.toDF(), input.toDF(), watermark = "2 minutes"))
    val q = counts.writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_ivagg").toString)
      .format("memory").queryName("iv_counts").outputMode("append").start()
    for (chunk <- evts.grouped(evts.length / 3 + 1)) {
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val maxTs = evts.map(_.ts.getTime).max
    input.addData(Evt(-1L, new Timestamp(maxTs + 7L * 24 * 3600 * 1000), -1L, "x", 0.0))
    q.processAllAvailable()
    val got = sp.sql("SELECT user_id, CAST(w_start AS LONG), n_pairs FROM iv_counts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    assert(got == batch,
      s"chained streaming agg diverges: missing=${(batch -- got).take(3)} extra=${(got -- batch).take(3)}")
  }

  test("streaming passage dedup (fMGWS) equals the batch q_c20 plan on real documents") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val dir = "/root/testdata/sf0.01"
    val docs = sp.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val occ = StreamingOps.passageOccurrences(input.toDF().toDF("doc_id", "text"))
      .as[StreamingOps.PassageOcc]
    val q = StreamingOps.passageCounts(occ).writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_pass").toString)
      .format("memory").queryName("passages").outputMode("update").start()
    // three micro-batches split by position: passages shared across docs in
    // DIFFERENT triggers cross the nd 1 → 2 boundary between triggers, so
    // the snapshot re-emission must retro-flag earlier contributors — the
    // path a single-batch run would never exercise
    for (chunk <- docs.grouped(docs.length / 3 + 1)) {
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val served = StreamingOps.passageDedupServe(sp.table("passages")).collect()
    q.stop()
    val batch = graft.operators.PipelineQueries.defs
      .find(_.name == "q_c20_passage_dedup").get.plan(sp, dir).collect()
    graft.core.CachedRdds.drain() // q_c20 persists its (passage, doc) frame
    assert(served.length == batch.length,
      s"served ${served.length} rows vs batch ${batch.length}")
    served.zip(batch).foreach { case (s, b) => assert(s == b, s"$s != $b") }
  }

  test("streaming split assignment equals batch q_c37 on real documents") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val dir = "/root/testdata/sf0.01"
    val docs = graft.core.Tables(sp, dir, "documents")
      .select(col("doc_id"), col("source")).as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.splitAssignments(input.toDF().toDF("doc_id", "source"))
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_split").toString)
      .format("memory").queryName("splits").outputMode("append").start()
    for (chunk <- docs.grouped(docs.length / 3 + 1)) {
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val streamed = sp.table("splits").orderBy("doc_id").collect().map(_.toString).toSeq
    q.stop()
    val batch = SparkEntry.queries("q_c37_corpus_split")(sp, dir)
      .collect().map(_.toString).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming entropy scoring equals batch q_c38 on real documents") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val dir = "/root/testdata/sf0.01"
    val docs = graft.core.Tables(sp, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.entropyStats(input.toDF().toDF("doc_id", "text"))
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_ent").toString)
      .format("memory").queryName("entstats").outputMode("append").start()
    for (chunk <- docs.grouped(docs.length / 3 + 1)) {
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val streamed = sp.table("entstats").orderBy("doc_id").collect().map(_.toString).toSeq
    q.stop()
    val batch = SparkEntry.queries("q_c38_bigram_entropy")(sp, dir)
      .collect().map(_.toString).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming media signatures equal batch q_c41 hashes on real payloads") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val dir = "/root/testdata/sf0.001"
    val ids = graft.core.Tables(sp, dir, "documents")
      .select(col("doc_id")).as[Long].collect()
    val input = MemoryStream[Long]
    val q = StreamingOps.mediaSignatures(input.toDS())
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_sig").toString)
      .format("memory").queryName("sigs").outputMode("append").start()
    for (chunk <- ids.grouped(ids.length / 3 + 1)) {
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val streamed = sp.table("sigs").orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    q.stop()
    val batch = SparkEntry.queries("q_c41_media_neardup")(sp, dir)
      .select("media_id", "ahash").orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("heavy-hitter serve drops emptied shards instead of serving stale candidates") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val k = 4
    val input = MemoryStream[String]
    // 1 shard: fill k distinct counters at count 1, then a (k+1)-th
    // distinct term triggers decrement-all → state EMPTIES
    val q = StreamingOps.heavyHitterUpdates(input.toDS(), shards = 1, k = k).toDF()
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_hh2").toString)
      .format("memory").queryName("hh_empty").outputMode("update").start()
    input.addData((1 to k).map(i => s"t$i"))
    q.processAllAvailable()
    input.addData(Seq("t_overflow"))
    q.processAllAvailable()
    val served = StreamingOps.heavyHitterServe(sp.table("hh_empty")).collect()
    q.stop()
    assert(served.isEmpty,
      s"stale candidates served after eviction-to-empty: ${served.mkString(",")}")
  }

  test("streaming image dedup keeps exactly the batch q_c41 family representatives") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val dir = "/root/testdata/sf0.001"
    val ids = graft.core.Tables(sp, dir, "documents")
      .select(col("doc_id")).as[Long].collect().sorted
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val q = StreamingOps.mediaDedupStream(
      input.toDF().toDF("media_id", "ts"))
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_mdd").toString)
      .format("memory").queryName("mdedup").outputMode("append").start()
    // arrival in id order with increasing event time, well inside one
    // watermark horizon — the first arrival per signature family is the
    // family's min id
    for (chunk <- ids.grouped(ids.length / 3 + 1)) {
      input.addData(chunk.toSeq.map(id =>
        (id, new java.sql.Timestamp(1700000000000L + id * 1000L))))
      q.processAllAvailable()
    }
    val kept = sp.table("mdedup").select("media_id").collect().map(_.getLong(0)).toSet
    q.stop()
    val reps = SparkEntry.queries("q_c41_media_neardup")(sp, dir)
      .select("rep_id").collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty && kept == reps,
      s"kept ${kept.size} vs batch representatives ${reps.size}")
    assert(kept.size < ids.length, "dedup dropped nothing")
  }

  test("streaming Misra-Gries heavy hitters: bounds hold vs exact batch counts") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val dir = "/root/testdata/sf0.001"
    val shards = 8
    val k = 16
    val terms = graft.core.Tables(sp, dir, "documents")
      .selectExpr("explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS t")
      .as[String].collect()
    val input = MemoryStream[String]
    val q = StreamingOps.heavyHitterUpdates(input.toDS(), shards, k).toDF()
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_hh").toString)
      .format("memory").queryName("hh_updates").outputMode("update").start()
    for (chunk <- terms.grouped(terms.length / 4 + 1)) {
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
    val cands = sp.table("hh_updates")
      .withColumn("mver", org.apache.spark.sql.functions.max(col("ver")).over(w))
      .filter(col("ver") === col("mver"))
      .filter(org.apache.spark.sql.functions.length(col("term")) > 0)
      .select("shard", "term", "est", "shard_n").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    q.stop()

    // exact shard-local truth
    val shardOf = (t: String) => (t.hashCode % shards + shards) % shards
    val exact = terms.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val shardN = terms.groupBy(shardOf).view.mapValues(_.length.toLong).toMap

    // bounded state
    val perShard = cands.groupBy(_._1).view.mapValues(_.length)
    assert(perShard.values.forall(_ <= k), s"state exceeded k: $perShard")
    // every true heavy hitter retained
    for ((t, c) <- exact) {
      val s = shardOf(t)
      if (c > shardN(s) / (k + 1))
        assert(cands.exists(r => r._2 == t), s"heavy term '$t' ($c) dropped")
    }
    // estimates within the MG envelope, and shard_n exact
    for ((s, t, est, n) <- cands) {
      assert(n == shardN(s))
      val c = exact(t)
      assert(est <= c && c - est <= n / (k + 1),
        s"'$t': est $est vs true $c outside envelope (n=$n)")
    }
    // serve path returns the global top candidates
    val served = StreamingOps.heavyHitterServe(sp.table("hh_updates")).collect()
    assert(served.nonEmpty && served.length <= 20)
  }

  test("streaming A-ES weighted sample (fMGWS) equals batch q_c81 on real documents") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val dir = "/root/testdata/sf0.01"
    val docs = graft.core.Tables(sp, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.weightedSampleUpdates(input.toDF().toDF("doc_id", "text"))
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_es").toString)
      .format("memory").queryName("esample").outputMode("update").start()
    // deliberately uneven batches: 1 doc, the bulk, a 9-doc tail
    for (chunk <- Seq(docs.take(1), docs.slice(1, docs.length - 9),
        docs.takeRight(9))) {
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val streamed = StreamingOps.weightedSampleServe(sp.table("esample"))
      .select("doc_id", "n_tokens", "es_key", "rnk")
      .collect().map(_.toString).toSeq
    q.stop()
    val batch = SparkEntry.queries("q_c81_weighted_sample")(sp, dir)
      .select("doc_id", "n_tokens", "es_key", "rnk")
      .collect().map(_.toString).toSeq
    graft.core.CachedRdds.drain()
    assert(streamed.nonEmpty && streamed == batch,
      "the sharded top-k union must serve exactly the batch sample")
  }

  test("streaming classifier scoring equals batch q_c30 on real documents") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val dir = "/root/testdata/sf0.01"
    val docs = graft.core.Tables(sp, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.classifierScores(input.toDF().toDF("doc_id", "text"))
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_cls").toString)
      .format("memory").queryName("clsscores").outputMode("append").start()
    for (chunk <- docs.grouped(docs.length / 3 + 1)) {
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val streamed = sp.table("clsscores").orderBy("doc_id").collect().map(_.toString).toSeq
    q.stop()
    val batch = SparkEntry.queries("q_c30_quality_classifier")(sp, dir)
      .collect().map(_.toString).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming TRAINED classifier scoring equals batch q_c138 on persisted weights") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val dir = "/root/testdata/sf0.001"
    // the model is REFERENCE STATE: trained batch-side, persisted, then
    // loaded from the stored artifact (never retrained per batch)
    val path = graft.operators.QualityClassifierTrainer.modelArtifact(sp, dir)
    val (bias, w) = graft.operators.QualityClassifierTrainer.loadModel(sp, path)
    val docs = graft.core.Tables(sp, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps
      .classifierScoresTrained(input.toDF().toDF("doc_id", "text"), bias, w)
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_clst").toString)
      .format("memory").queryName("clstrained").outputMode("append").start()
    // deliberately uneven batches: 1 doc, the bulk, a 9-doc tail
    for (chunk <- Seq(docs.take(1), docs.slice(1, docs.length - 9),
        docs.takeRight(9))) {
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val streamed = sp.table("clstrained").orderBy("doc_id")
      .collect().map(_.toString).toSeq
    q.stop()
    val batch = SparkEntry.queries("q_c138_classifier_scores")(sp, dir)
      .collect().map(_.toString).toSeq
    graft.core.CachedRdds.drain()
    assert(streamed.nonEmpty && streamed == batch,
      "trained scoring must be identical on the batch and stream paths")
  }

  test("streaming drift monitor: serve == batch drift report after EVERY micro-batch prefix") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val dir = "/root/testdata/sf0.001"
    // model + baseline are REFERENCE STATE off the stored artifact —
    // the monitor never retrains or rescans the training corpus
    val path = graft.operators.QualityClassifierTrainer.modelArtifact(sp, dir)
    val (bias, w) = graft.operators.QualityClassifierTrainer.loadModel(sp, path)
    val docs = graft.core.Tables(sp, dir, "documents")
      .filter(col("doc_id") % 10 === 3)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps
      .driftUpdates(input.toDF().toDF("doc_id", "text"), bias, w)
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_drift").toString)
      .format("memory").queryName("drift_cells").outputMode("complete").start()
    // deliberately uneven: 1 doc, the bulk, a 7-doc tail; after EVERY
    // trigger the served report equals the batch report over the prefix
    var seen = Seq.empty[(Long, String)]
    for (chunk <- Seq(docs.take(1), docs.slice(1, docs.length - 7),
        docs.takeRight(7))) {
      input.addData(chunk.toSeq)
      q.processAllAvailable()
      seen = seen ++ chunk
      val served = StreamingOps.driftServe(sp, path, sp.table("drift_cells"))
        .collect().map(_.toString).toSeq
      val batch = graft.operators.QualityClassifierTrainer
        .driftReport(sp, path, seen.toDF("doc_id", "text"))
        .collect().map(_.toString).toSeq
      assert(served == batch,
        s"streamed drift report must equal batch after ${seen.length} docs")
    }
    // ... and the full stream serves exactly the REGISTERED q_c143 row
    val fin = StreamingOps.driftServe(sp, path, sp.table("drift_cells"))
      .collect().map(_.toString).toSeq
    q.stop()
    val reg = SparkEntry.queries("q_c143_model_drift")(sp, dir)
      .collect().map(_.toString).toSeq
    graft.core.CachedRdds.drain()
    assert(fin.nonEmpty && fin == reg)
  }

  test("streaming source-mixture (fMGWS) equals batch q_c28 with a late new source") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val dir = "/root/testdata/sf0.01"
    val docs = sp.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source")).as[(Long, String)].collect()
    // hold one source back entirely until the LAST trigger: its arrival
    // must shrink every other source's quota retroactively (the
    // data-dependent-threshold path a prefix-only run never exercises)
    val lateSource = docs.map(_._2).distinct.sorted.head
    val early = docs.filterNot(_._2 == lateSource)
    val late = docs.filter(_._2 == lateSource)
    val input = MemoryStream[StreamingOps.MixIn]
    val q = StreamingOps.mixtureCandidates(input.toDS()).writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_mix").toString)
      .format("memory").queryName("mix_updates").outputMode("update").start()
    for (chunk <- early.grouped(early.length / 2 + 1) ++ Iterator(late)) {
      input.addData(chunk.toSeq.map { case (id, src) => StreamingOps.MixIn(id, src) })
      q.processAllAvailable()
    }
    val served = StreamingOps.mixtureServe(sp.table("mix_updates"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    q.stop()
    val batch = graft.operators.PipelineQueries.defs
      .find(_.name == "q_c28_source_mixture").get.plan(sp, dir)
      .select(col("source"), col("doc_id"), col("rnk"), col("n_take"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(batch.nonEmpty)
    assert(served.length == batch.length,
      s"served ${served.length} rows vs batch ${batch.length}")
    served.zip(batch).foreach { case (s, b) => assert(s == b, s"$s != $b") }
  }

  test("flatMapGroupsWithState sessionization carries custom per-key state") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[Evt]
    val q = StreamingOps.sessionize(input.toDS()).writeStream
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("ckpt_c").toString).format("memory").queryName("custom_sessions").outputMode("update").start()
    input.addData(
      Evt(1, ts(0), 10, "click", 1.0),
      Evt(2, ts(10), 10, "click", 1.0))
    q.processAllAvailable()
    input.addData(Evt(3, ts(50), 10, "click", 1.0)) // gap > 30m → new session
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT n_events, closed FROM custom_sessions ORDER BY session_start_us, closed").collect()
    // trigger 1: open 2-event session; trigger 2: that session re-emitted
    // closed, plus the fresh open 1-event one
    assert(rows.map(r => (r.getLong(0), r.getBoolean(1))).toSeq ==
      Seq((2L, false), (2L, true), (1L, false)))
    q.stop()
  }

  test("sessionize emits EVERY session closed within one micro-batch") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[Evt]
    val q = StreamingOps.sessionize(input.toDS()).writeStream
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("ckpt_m").toString).format("memory").queryName("multi_sessions").outputMode("update").start()
    // three sessions in ONE batch: {0m,10m}, {50m}, {100m,101m} — the old
    // mapGroupsWithState shape emitted only the last; both intermediates
    // must now surface as closed rows in the same trigger
    input.addData(
      Evt(1, ts(0), 10, "click", 1.0),
      Evt(2, ts(10), 10, "click", 1.0),
      Evt(3, ts(50), 10, "click", 1.0),
      Evt(4, ts(100), 10, "click", 1.0),
      Evt(5, ts(101), 10, "click", 1.0))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT n_events, closed FROM multi_sessions ORDER BY session_start_us").collect()
    assert(rows.map(r => (r.getLong(0), r.getBoolean(1))).toSeq ==
      Seq((2L, true), (1L, true), (2L, false)))
    q.stop()
  }

  test("file source: incremental discovery + checkpoint recovery (Q-B1 over files)") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt_files").toString
    def at(s: String) = Timestamp.valueOf(s)
    def run(expect: Seq[(String, Long)]): Unit = {
      val schema = Seq.empty[Evt].toDS.schema
      val q = StreamingOps.tumblingCounts(sp.readStream.schema(schema).parquet(dir))
        .writeStream.option("checkpointLocation", ckpt)
        .format("memory").queryName("file_tumbling").outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val rows = sp.sql(
        "SELECT CAST(window_start AS STRING) w, cnt FROM file_tumbling ORDER BY w, event_type")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows == expect)
    }
    // batch 1: two clicks in hour 0
    Seq(
      Evt(1, at("2024-01-01 00:05:00"), 10, "click", 1.0),
      Evt(2, at("2024-01-01 00:20:00"), 10, "click", 1.0)
    ).toDF.write.mode("append").parquet(dir)
    run(Seq(("2024-01-01 00:00:00", 2L)))
    // batch 2 lands later: one more hour-0 click + a new hour-1 view; the
    // restarted query resumes from the SAME checkpoint and must pick up
    // only the new file (source offsets), yielding cumulative counts
    Seq(
      Evt(3, at("2024-01-01 00:40:00"), 11, "click", 1.0),
      Evt(4, at("2024-01-01 01:10:00"), 11, "view", 2.0)
    ).toDF.write.mode("append").parquet(dir)
    run(Seq(("2024-01-01 00:00:00", 3L), ("2024-01-01 01:00:00", 1L)))
  }

  test("epoch-µs lift keeps sub-millisecond precision through sessionize") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[Evt]
    // 12:00:00.000123456 → µs must carry the 123 (ms-truncated getTime
    // alone would drop it)
    val t = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    t.setNanos(123456)
    val q = StreamingOps.sessionize(input.toDS()).writeStream
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("ckpt_u").toString).format("memory").queryName("us_sessions").outputMode("update").start()
    input.addData(Evt(1, t, 10, "click", 1.0))
    q.processAllAvailable()
    val r = spark.sql("SELECT session_start_us FROM us_sessions").collect().head
    assert(r.getLong(0) % 1000000L == 123L)
    q.stop()
  }
}
