package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c115 packing fragmentation / cross-doc attention report.
  *
  * The planted fixture is hand-computable packing geometry over one
  * source (doc lengths 512/200/400/100 → 3 sequences, one split doc,
  * 5 segments, cross-pair arithmetic worked out in the assertions);
  * the sf0.001 test reconciles the report with q_c25's per-document
  * spans.
  */
class PackingFragmentationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-packfrag-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-packfrag").toString
    val s = spark
    import s.implicits._
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    Seq(
      (1L, words(512), "s1"), // fills seq 0 exactly
      (2L, words(200), "s1"), // seq 1 [512, 712)
      (3L, words(400), "s1"), // [712, 1112) — splits across seq 1/2
      (4L, words(100), "s1")) // seq 2 [1112, 1212)
      .toDF("doc_id", "text", "source").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.core.LocalArtifacts.deleteRecursively(dir)
  }

  test("planted packing: splits, segments, cross-pair arithmetic") {
    val rows = SparkEntry.queries("q_c115_packing_fragmentation")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    // seq0: [512]               → T=512, cross 0
    // seq1: [200, 312]          → T=512, cross 512²−200²−312² = 124800
    // seq2: [88, 100]           → T=188, cross 188²−88²−100²  = 17600
    // all_pairs = 2·512² + 188² = 559632; 142400·1000 DIV 559632 = 254
    assert(rows === Seq(
      ("s1", 3L, 4L, 1L, 250L, 1666L, 254L)))
  }

  test("sf0.001: report reconciles with q_c25's per-document spans") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q_c115_packing_fragmentation")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(6))).toSeq
    val spans = SparkEntry.queries("q_c25_sequence_pack")(spark, sf)
      .collect().map(r => (r.getString(1), r.getLong(6))) // (source, n_seqs)
    graft.core.CachedRdds.drain()
    assert(rows.nonEmpty)
    val bySrc = spans.groupBy(_._1)
    for ((src, nSeqs, nDocs, nSplit, contamPm) <- rows) {
      assert(nDocs == bySrc(src).length.toLong, s"$src doc count")
      assert(nSplit == bySrc(src).count(_._2 > 1).toLong, s"$src split count")
      assert(nSeqs >= 1 && contamPm >= 0 && contamPm <= 1000)
    }
  }
}
