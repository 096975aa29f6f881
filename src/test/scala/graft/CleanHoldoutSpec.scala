package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c113 self-decontaminated holdout construction.
  *
  * The planted fixture pins the whole contract by hand against the
  * known q_c37 bucket assignments (doc 1 → train, 2/19/23 → val,
  * 11/15/28 → test): an exact-copy val doc and a test doc containing
  * the train sentence as an interior 13-gram both drop, a short
  * (<13-token) holdout doc has zero grams and survives, clean docs
  * survive, and train rows never appear in the report.
  */
class CleanHoldoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-holdout-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-holdout").toString
    val s = spark
    import s.implicits._
    val a = "a b c d e f g h i j k l m" // 13 tokens — the train sentence
    Seq(
      (1L, a, "s1"),                     // train (bucket 583)
      (2L, a, "s1"),                     // val (821): exact copy → dropped
      (19L, "n o p q r s t u v w x y zz", "s1"), // val (860): clean → kept
      (23L, "aa bb cc dd ee ff gg hh ii jj kk ll mm", "s1"), // val (805): clean
      (11L, s"z $a", "s1"),              // test (956): interior 13-gram → dropped
      (15L, "short doc", "s1"),          // test (908): < 13 tokens → kept
      (28L, "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12 p13", "s2")) // test (995): clean
      .toDF("doc_id", "text", "source").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.core.LocalArtifacts.deleteRecursively(dir)
  }

  test("planted corpus: drops, survivals, short-doc rule, train exclusion") {
    val rows = SparkEntry.queries("q_c113_clean_holdout")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(rows === Seq(
      ("s1", "test", 2L, 1L, 1L, 500L),
      ("s1", "val", 3L, 1L, 2L, 333L),
      ("s2", "test", 1L, 0L, 1L, 0L)))
  }

  test("sf0.001: conservation and consistency with the q_c37 split") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q_c113_clean_holdout")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val split = SparkEntry.queries("q_c37_corpus_split")(spark, sf)
      .collect().map(r => (r.getString(1), r.getString(3)))
    graft.core.CachedRdds.drain()
    assert(rows.nonEmpty && rows.forall(_._2 != "train"))
    // per-(source, split) doc counts reconcile with q_c37's assignment
    val expected = split.filter(_._2 != "train")
      .groupBy(identity).map { case (k, g) => (k, g.length.toLong) }
    assert(rows.map(r => ((r._1, r._2), r._3)).toMap === expected)
    for ((_, _, n, d, k, pm) <- rows)
      assert(d + k == n && pm == d * 1000 / n)
  }
}
