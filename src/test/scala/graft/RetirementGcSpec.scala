package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextQueries

/** q_c141 — the retirement GC verb. q_c133 certifies that segments are
  * retire-able; this spec proves the ACTION: certified segments are
  * deleted and the search the index exists for is unchanged (the
  * Int8CompactSpec corpus-deletes-first discipline — the post-GC search
  * runs with the source corpus gone, so it provably serves from the
  * surviving artifact alone), the decision is journaled, and — the
  * half that makes the gate real — a compaction that is NOT a faithful
  * union refuses to drop anything.
  */
class RetirementGcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"
  private val terms = Seq("hash", "join", "filter")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-gc-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("GC drops certified segments; post-GC search == pre-GC search with the corpus deleted") {
    // build over a COPY of the corpus so the source can be deleted
    // before the post-GC search — proof the artifact serves alone
    val tmp = Files.createTempDirectory("graft-gc-proof")
    val docCopy = tmp.resolve("documents.parquet")
    Files.copy(Paths.get(sf, "documents.parquet"), docCopy)
    // the pre-GC answer: scored straight off the segment union (the
    // layout a reader would hit BEFORE compaction + GC)
    val segPath = TextQueries.bm25SegmentsIndex(spark, tmp.toString)
    val pre = TextQueries.bm25Score(
      spark.read.parquet(s"$segPath/seg0/postings", s"$segPath/seg1/postings"),
      spark.read.parquet(s"$segPath/seg0/stats", s"$segPath/seg1/stats")
        .agg(sum(col("n_docs")).cast("double").as("n_docs"),
          sum(col("tot")).cast("double").as("tot")),
      terms).collect().map(_.toString).toSeq
    val gcPath = TextQueries.bm25GcIndex(spark, tmp.toString)
    Files.delete(docCopy)
    // the segments are GONE — the verb acted
    assert(!Files.exists(Paths.get(gcPath, "segments", "seg0")))
    assert(!Files.exists(Paths.get(gcPath, "segments", "seg1")))
    // and the journal says exactly that, verdicts included
    val log = spark.read.parquet(s"$gcPath/gc_log").collect()
      .map(r => (r.getString(0), r.getLong(4), r.getString(5)))
      .sortBy(_._1).toSeq
    assert(log == Seq(("compacted", 1L, "kept"),
      ("seg0", 1L, "dropped"), ("seg1", 1L, "dropped")))
    // the search the index exists for is unchanged by retirement
    val post = TextQueries
      .bm25SearchStored(spark, s"$gcPath/compacted", terms)
      .collect().map(_.toString).toSeq
    assert(post.nonEmpty && post == pre,
      "post-GC search must equal the pre-GC segment-union search")
    graft.core.CachedRdds.drain()
  }

  test("a tampered compaction refuses to GC: verdict 0, nothing deleted") {
    val s = spark
    import s.implicits._
    val tmp = Files.createTempDirectory("graft-gc-refuse").toString
    val seg0 = Seq(("hash", 1L, 2L, 10L), ("join", 2L, 1L, 7L))
    val seg1 = Seq(("filter", 3L, 3L, 12L), ("hash", 4L, 1L, 5L))
    seg0.toDF("term", "doc_id", "tf", "dl")
      .write.parquet(s"$tmp/seg0/postings")
    seg1.toDF("term", "doc_id", "tf", "dl")
      .write.parquet(s"$tmp/seg1/postings")
    // the compaction LOST a row — not a faithful union
    (seg0 ++ seg1).tail.toDF("term", "doc_id", "tf", "dl")
      .write.parquet(s"$tmp/compacted/postings")
    val log = TextQueries.retirementGc(spark,
      Seq("seg0" -> s"$tmp/seg0", "seg1" -> s"$tmp/seg1"),
      s"$tmp/compacted", "postings")
    assert(log.exists(_._5 == 0L), "the verdict must catch the lost row")
    assert(log.forall(_._6 == "kept"), "no segment may be dropped on a failed verdict")
    // the directories are untouched — the refusal is real
    assert(Files.exists(Paths.get(s"$tmp/seg0/postings")))
    assert(Files.exists(Paths.get(s"$tmp/seg1/postings")))
    graft.core.CachedRdds.drain()
  }

  test("q_c141's registered frame is well-formed: search rows + GC outcome") {
    val out = SparkEntry.queries("q_c141_retirement_gc")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_dropped") == 2L)
      assert(r.getAs[Long]("n_live_segments") == 0L)
    }
    // descending score order, unique docs
    val scores = out.map(_.getAs[Double]("bm25")).toSeq
    assert(scores == scores.sorted.reverse)
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == out.length)
    graft.core.CachedRdds.drain()
  }
}
