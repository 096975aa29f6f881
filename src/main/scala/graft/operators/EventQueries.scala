package graft.operators

import graft.core.{Decimals, EventTime, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream surface Q-B1..Q-B4 (SURVEY §2.4-B), run in batch over the
  * `events` table but written with the same operators Structured Streaming
  * uses (`window()`, session gap logic, as-of ordering), so each plan is
  * streaming-ready: swap `read` for `readStream`, add a watermark.
  *
  * Event-time canonicalization is SCHEMA-ADAPTIVE ([[graft.core.EventTime]]):
  * every plan reads the events table through `EventTime.events`, which
  * inspects the loaded `ts` type (BIGINT nanos / TIMESTAMP / TIMESTAMP_NTZ —
  * the physical layout has changed across data generations) and appends a
  * canonical `t_us` int64 epoch-µs column — the exact value DuckDB's
  * `epoch_us(ts)` produces on every layout — so every comparison, window
  * bucket and gap test is identical integer arithmetic on both engines.
  * `timestamp_micros()` lifts back to a (lossless) Spark timestamp where the
  * idiomatic operator wants one (`window()`, as-of range join).
  *
  * The streaming variants live in [[graft.streaming.StreamingOps]].
  */
object EventQueries {
  import Decimals._

  val defs: Seq[QueryDef] = Seq(
    // ---- Q-B1: tumbling window aggregate ---------------------------------
    QueryDef(
      "q_b1_tumbling_window",
      Some("""SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
             |  COUNT(*) AS cnt,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total_value
             |FROM events
             |GROUP BY 1, 2
             |ORDER BY window_start_us, event_type""".stripMargin)
    ) { (s, d) =>
      EventTime.events(s, d)
        .withColumn("ets", timestamp_micros(col("t_us")))
        .groupBy(window(col("ets"), "1 hour").as("w"), col("event_type"))
        .agg(
          count(lit(1)).as("cnt"),
          sumMoney(col("value")).as("total_value")
        )
        .select(
          unix_micros(col("w.start")).as("window_start_us"),
          col("event_type"),
          col("cnt"),
          col("total_value")
        )
        .orderBy(col("window_start_us"), col("event_type"))
    },

    // ---- Q-B2: sliding window (1h window, 15m slide) ---------------------
    // Spark assigns each event to windowDuration/slide = 4 epoch-aligned
    // windows; the oracle reproduces that assignment with 15m buckets - k·15m.
    QueryDef(
      "q_b2_sliding_window",
      Some("""WITH ks AS (SELECT ts, value, unnest(range(4)) AS k FROM events)
             |SELECT epoch_us(ts) - epoch_us(ts) % 900000000 - k * 900000000 AS window_start_us,
             |  COUNT(*) AS cnt,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total_value
             |FROM ks
             |GROUP BY 1
             |ORDER BY window_start_us""".stripMargin)
    ) { (s, d) =>
      EventTime.events(s, d)
        .withColumn("ets", timestamp_micros(col("t_us")))
        .groupBy(window(col("ets"), "1 hour", "15 minutes").as("w"))
        .agg(
          count(lit(1)).as("cnt"),
          sumMoney(col("value")).as("total_value")
        )
        .select(
          unix_micros(col("w.start")).as("window_start_us"),
          col("cnt"),
          col("total_value")
        )
        .orderBy(col("window_start_us"))
    },

    // ---- Q-B3: sessionization (30-minute inactivity gap) -----------------
    // Batch analog of session_window(ts, '30 minutes'): lag + cumulative
    // new-session flag, all in exact int64 µs arithmetic.
    QueryDef(
      "q_b3_sessionize",
      Some("""WITH t AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS tsu,
             |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_tsu
             |  FROM events),
             |f AS (
             |  SELECT *, CASE WHEN prev_tsu IS NULL
             |                   OR tsu - prev_tsu > 1800000000
             |                 THEN 1 ELSE 0 END AS new_sess
             |  FROM t),
             |s AS (
             |  SELECT user_id, tsu, event_id,
             |         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tsu, event_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM f)
             |SELECT user_id, session_id, COUNT(*) AS n_events,
             |       MIN(tsu) AS session_start_us, MAX(tsu) AS session_end_us
             |FROM s GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)
    ) { (s, d) =>
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("tsu"), col("event_id"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      EventTime.events(s, d)
        .withColumn("tsu", col("t_us"))
        .withColumn("prev_tsu", lag(col("tsu"), 1).over(wOrd))
        .withColumn(
          "new_sess",
          when(
            col("prev_tsu").isNull || (col("tsu") - col("prev_tsu") > 1800000000L),
            1L
          ).otherwise(0L)
        )
        .withColumn("session_id", sum(col("new_sess")).over(wRun))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("tsu")).as("session_start_us"),
          max(col("tsu")).as("session_end_us")
        )
        .orderBy(col("user_id"), col("session_id"))
    },

    // ---- Q-B4: as-of join (latest prior order per event) -----------------
    // UNION-STREAM form: tag orders (0) and events (1), union them keyed by
    // user, sort once within user by (time, tag, orderkey), and carry the
    // most recent order forward with last(..., ignoreNulls) over a running
    // window. One shuffle on user_id, zero pair amplification — the naive
    // join-then-rank form materializes O(events_per_user × orders_per_user)
    // rows per key before the window prunes them, which is quadratic on a
    // skewed power-user at scale. Tie-break parity with the declared oracle
    // (ROW_NUMBER ... ORDER BY o_orderdate DESC, o_orderkey DESC → rn=1):
    // orders sort before events at equal time (tag 0 < 1, matching the
    // inclusive o_orderdate <= ts bound) and ascending orderkey within a
    // timestamp makes the running `last` adopt the max orderkey — exactly
    // the rn=1 winner. Events with no prior order drop (inner-join parity).
    QueryDef(
      "q_b4_asof_join",
      Some("""SELECT event_id, ts_us, user_id, last_orderkey, last_orderdate, last_totalprice
             |FROM (
             |  SELECT e.event_id, epoch_us(e.ts) AS ts_us, e.user_id,
             |         o.o_orderkey AS last_orderkey,
             |         o.o_orderdate AS last_orderdate,
             |         o.o_totalprice AS last_totalprice,
             |         ROW_NUMBER() OVER (PARTITION BY e.event_id
             |           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
             |  FROM events e
             |  JOIN orders o ON e.user_id = o.o_custkey AND epoch_us(o.o_orderdate) <= epoch_us(e.ts)
             |)
             |WHERE rn = 1
             |ORDER BY event_id""".stripMargin)
    ) { (s, d) =>
      val ev = EventTime.events(s, d)
        // join-key parity: the oracle's inner join on e.user_id = o.o_custkey
        // drops NULL keys; the union-stream window would otherwise co-locate
        // NULL-keyed events and orders in one partition and pair them up
        .filter(col("user_id").isNotNull)
        .select(
          col("user_id"),
          col("t_us"),
          lit(1).as("tag"),
          col("event_id"),
          lit(null).cast("bigint").as("o_orderkey"),
          lit(null).cast("timestamp_ntz").as("o_orderdate"),
          lit(null).cast("double").as("o_totalprice")
        )
      val or = Tables(s, d, "orders")
        // join parity: the oracle's `epoch_us(o_orderdate) <= ts` predicate
        // drops NULL-dated orders; without this filter a NULL t_us sorts
        // nulls-first and would become every event's carry. The custkey
        // filter mirrors the events leg (inner-join NULL-key parity).
        .filter(col("o_orderdate").isNotNull && col("o_custkey").isNotNull)
        .select(
          col("o_custkey").as("user_id"),
          // o_orderdate is TIMESTAMP_NTZ; session TZ is UTC so the cast is
          // the identity epoch mapping and unix_micros == DuckDB epoch_us
          unix_micros(col("o_orderdate").cast("timestamp")).as("t_us"),
          lit(0).as("tag"),
          lit(null).cast("bigint").as("event_id"),
          col("o_orderkey"),
          col("o_orderdate"),
          col("o_totalprice")
        )
      val w = Window
        .partitionBy(col("user_id"))
        .orderBy(col("t_us"), col("tag"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.unionByName(or)
        .withColumn(
          "ord",
          last(
            when(col("tag") === 0,
              struct(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))),
            ignoreNulls = true
          ).over(w)
        )
        .filter(col("tag") === 1 && col("ord").isNotNull)
        .select(
          col("event_id"),
          col("t_us").as("ts_us"),
          col("user_id"),
          col("ord.o_orderkey").as("last_orderkey"),
          col("ord.o_orderdate").as("last_orderdate"),
          col("ord.o_totalprice").as("last_totalprice")
        )
        .orderBy(col("event_id"))
    },

    // ---- Q-B9: banded interval self-join ---------------------------------
    // Count per-user event pairs within 60 s of each other. The naive form
    // is an inequality self-join (quadratic per user — the oracle runs
    // exactly that). The scale form is BUCKET BLOCKING: band time into
    // 60 s buckets; a qualifying pair's buckets differ by 0 or 1, so two
    // equi-joins on (user, bucket) — same-bucket (id-ordered) and
    // adjacent-bucket (time-ordered, id order implied impossible to
    // double-count) — cover every pair exactly once. Candidates scale with
    // events per (user, minute), not events per user; both joins shuffle
    // on high-cardinality composite keys.
    QueryDef(
      "q_b9_interval_join",
      Some("""SELECT a.user_id, COUNT(*) AS n_pairs
             |FROM events a JOIN events b
             |  ON a.user_id = b.user_id AND a.event_id < b.event_id
             | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ) { (s, d) =>
      val W = 60000000L // 60 s in µs
      val e = EventTime.events(s, d)
        .select(col("event_id"), col("user_id"), col("t_us").as("us"))
        .withColumn("bk", expr(s"us DIV $W"))
      def side(tag: String) = e.select(
        col("user_id"), col("bk"),
        col("event_id").as(s"id_$tag"), col("us").as(s"us_$tag"))
      val a = side("a")
      val b = side("b")
      val same = a.join(b, Seq("user_id", "bk"))
        .filter(col("id_a") < col("id_b")
          && col("us_b") - col("us_a") <= W && col("us_a") - col("us_b") <= W)
      val cross = a.join(b.withColumn("bk", col("bk") - 1), Seq("user_id", "bk"))
        .filter(col("us_b") - col("us_a") <= W) // us_b > us_a by bucket order
      same.select(col("user_id")).unionAll(cross.select(col("user_id")))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id"))
    }
  )
}
