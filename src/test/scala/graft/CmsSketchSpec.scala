package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c74 — the Count-Min sketch's structural guarantees, beyond the
  * oracle's value hash (which already pins the grid and the top-100
  * estimates bit-for-bit):
  *
  *  - NEVER-undercount: est ≥ exact for EVERY vocabulary term, not just
  *    the reported top-100 (the one-sided error direction is the
  *    sketch's defining property);
  *  - bounded state: the grid is ≤ depth·width rows regardless of
  *    vocabulary size;
  *  - LINEARITY: sketch(A ⊎ B) = cellwise sum of per-shard sketches —
  *    what makes CMS a mergeable one-pass summary across shards or
  *    stream batches.
  */
class CmsSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-cms-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q_c74: estimate never undercounts, over the FULL vocabulary") {
    val tc = graft.operators.TextQueries.termCounts(spark, sf)
    val sl = graft.operators.TextQueries.cmsSlots(tc)
    val sk = graft.operators.TextQueries.cmsSketch(sl)
    val probed = graft.operators.TextQueries.cmsParams.indices.foldLeft(sl) {
      (acc, i) =>
        acc.join(
          broadcast(sk.filter(col("row_i") === i)
            .select(col("slot").as(s"s$i"), col("c").as(s"c$i"))),
          Seq(s"s$i"))
    }
    val under = probed
      .filter(least(col("c0"), col("c1"), col("c2")) < col("cnt"))
      .count()
    assert(under === 0L, "CMS must never undercount any term")
    assert(sk.count() <= 3L * 1024L, "grid state is bounded by depth x width")
  }

  test("q_c74: sketch is linear (per-shard sketches merge cellwise)") {
    val s = spark
    import s.implicits._
    val tc = Seq(("alpha", 5L), ("beta", 3L), ("gamma", 11L), ("delta", 2L),
      ("epsilon", 7L), ("zeta", 1L))
      .toDF("term", "cnt")
    val whole = graft.operators.TextQueries
      .cmsSketch(graft.operators.TextQueries.cmsSlots(tc))
    val shardA = tc.filter(length(col("term")) <= 4)
    val shardB = tc.filter(length(col("term")) > 4)
    val merged = graft.operators.TextQueries
      .cmsSketch(graft.operators.TextQueries.cmsSlots(shardA))
      .unionByName(graft.operators.TextQueries
        .cmsSketch(graft.operators.TextQueries.cmsSlots(shardB)))
      .groupBy(col("row_i"), col("slot"))
      .agg(sum(col("c")).cast("long").as("c"))
    val w = whole.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val m = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(w === m, "sketch(A ∪ B) must equal the cellwise-summed shard sketches")
  }

  test("q_c74 streaming twin: the streamed grid equals the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val docs = graft.core.Tables(sp, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps
      .cmsUpdates(input.toDF().toDF("doc_id", "text"))
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_cms").toString)
      .format("memory").queryName("cmsgrid").outputMode("complete").start()
    // deliberately uneven batches: 1 doc, the bulk, then a 5-doc tail
    for (chunk <- Seq(docs.take(1), docs.slice(1, docs.length - 5),
        docs.takeRight(5))) {
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val streamed = sp.table("cmsgrid")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    q.stop()
    val tc = graft.operators.TextQueries.termCounts(sp, sf)
    val batch = graft.operators.TextQueries
      .cmsSketch(graft.operators.TextQueries.cmsSlots(tc))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    graft.core.CachedRdds.drain()
    assert(streamed.nonEmpty && streamed === batch,
      "linearity makes the streamed grid identical to the batch grid")
  }
}
