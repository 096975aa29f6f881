package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c101 — batch source-mixing report.
  *
  * Fixture is id-BLOCKED (how crawls actually arrive: source after
  * source): 4 sources × 160 contiguous doc_ids (0..639). Then:
  *  - sequential loader: block size ⌈640/64⌉ = 10 < 160 ⇒ every
  *    contiguous batch sits inside ONE source block: n_sources = 1,
  *    max_share_pm = hhi_pm = 1000 — the measured failure mode the
  *    shuffle exists to fix.
  *  - shuffled loader (q_c56's epoch-0 assignment): batches draw ~10
  *    docs pseudo-uniformly across the 4 blocks — the spec re-derives
  *    every batch's source multiset INDEPENDENTLY in Scala from the
  *    same LCG and asserts the reported n_sources/n_docs match exactly,
  *    plus the aggregate claim: the mean shuffled hhi is far below the
  *    sequential 1000.
  */
class BatchMixingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-batchmix-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-batchmix").toString
    val s = spark
    import s.implicits._
    (0 until 640).map(i => (i.toLong, s"doc number $i", s"blk${i / 160}"))
      .toDF("doc_id", "text", "source").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.core.LocalArtifacts.deleteRecursively(dir)
  }

  private def lcgBatch(id: Long): Long =
    ((id % 1000000007L) * 1103515245L + 12345L) % 1000000007L % 64L

  test("q_c101: sequential batches are single-source on a blocked corpus; shuffled mix, cross-checked against an independent LCG replay") {
    val rows = SparkEntry.queries("q_c101_batch_mixing")(spark, dir).collect()
    graft.core.CachedRdds.drain()
    val (seq, shuf) = rows.partition(_.getString(0) == "sequential")
    assert(seq.nonEmpty && shuf.nonEmpty)

    // sequential: every batch inside one 160-doc source block
    seq.foreach { r =>
      assert(r.getLong(2) === 10L, "block size ceil(640/64) = 10")
      assert(r.getLong(3) === 1L)
      assert(r.getAs[Long]("max_share_pm") === 1000L)
      assert(r.getAs[Long]("hhi_pm") === 1000L)
    }
    assert(seq.map(_.getLong(2)).sum === 640L)

    // shuffled: exact per-batch (n_docs, n_sources) from an independent
    // replay of the same assignment
    val expect = (0L until 640L).groupBy(lcgBatch)
      .map { case (b, ids) => b -> (ids.size.toLong, ids.map(_ / 160).distinct.size.toLong) }
    val got = shuf.map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got === expect)
    assert(shuf.map(_.getLong(2)).sum === 640L)

    // the aggregate mixing claim: mean shuffled concentration well below
    // the sequential loader's uniform 1000
    val meanHhi = shuf.map(_.getAs[Long]("hhi_pm")).sum / shuf.length
    assert(meanHhi < 600L,
      s"hash-bucketed batches must mix the 4 blocks (mean hhi_pm $meanHhi)")
  }

  test("q_c101 streaming serve: streamed counts reproduce the batch shuffled report") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val rows = graft.core.Tables(sp, dir, "documents")
      .select(col("doc_id"), col("source"))
      .as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps
      .mixingUpdates(input.toDF().toDF("doc_id", "source"))
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_mix").toString)
      .format("memory").queryName("mixstate").outputMode("complete").start()
    // deliberately uneven micro-batches
    for (chunk <- Seq(rows.take(7), rows.slice(7, 100), rows.drop(100))) {
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val served = graft.streaming.StreamingOps
      .mixingServe(sp.table("mixstate"))
      .collect().map(_.toString).sorted.toSeq
    q.stop()
    val batch = SparkEntry.queries("q_c101_batch_mixing")(sp, dir)
      .collect().filter(_.getString(0) == "shuffled")
      .map(_.toString).sorted.toSeq
    graft.core.CachedRdds.drain()
    assert(served.nonEmpty && served === batch,
      "additive counts through the shared mixingReport tail make serve ≡ batch")
  }

  test("q_c101 on sf0.001: totals conserved per mode, metrics in range") {
    val rows = SparkEntry.queries("q_c101_batch_mixing")(spark,
      "/root/testdata/sf0.001").collect()
    graft.core.CachedRdds.drain()
    assert(rows.nonEmpty)
    Seq("sequential", "shuffled").foreach { m =>
      val part = rows.filter(_.getString(0) == m)
      assert(part.map(_.getLong(2)).sum === 500L, s"$m must cover every doc once")
    }
    rows.foreach { r =>
      val hhi = r.getAs[Long]("hhi_pm")
      val ms = r.getAs[Long]("max_share_pm")
      assert(hhi >= 0L && hhi <= 1000L)
      assert(ms >= 1L && ms <= 1000L)
      assert(r.getLong(3) >= 1L)
    }
  }
}
