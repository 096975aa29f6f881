package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c75 — winnowing's structural guarantees (Schleimer, Wilkerson & Aho
  * 2003), beyond the oracle's value hash:
  *
  *  - DETECTION GUARANTEE: two documents sharing a run of ≥ w+k-1 = 6
  *    consecutive words always share at least one fingerprint;
  *  - DENSITY: a document selects at most one fingerprint per window
  *    (≤ #grams − w + 1) and each fingerprint is one of its gram hashes;
  *  - POSITION ROBUSTNESS: prepending unrelated text before a copied
  *    span never removes the span's shared fingerprint (the property
  *    q_c8's whole-doc rolling fingerprint lacks).
  */
class WinnowingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-winnowing-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fps(rows: Seq[(Long, String)]): Map[Long, Set[Long]] = {
    val s = spark
    import s.implicits._
    graft.operators.DedupQueries
      .winnowFingerprints(rows.toDF("doc_id", "text"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
  }

  test("detection guarantee: a shared 6-word run yields a shared fingerprint") {
    val run = "the quick brown fox jumps high"
    val m = fps(Seq(
      1L -> s"alpha beta gamma $run delta epsilon zeta",
      2L -> s"one two $run three four five six seven"))
    assert((m(1L) intersect m(2L)).nonEmpty,
      "winnowing must fingerprint a shared w+k-1 = 6 word run")
  }

  test("density and membership: ≤ one fingerprint per window, all gram hashes") {
    val text = "a b c d e f g h i j k l m n o p"
    val words = text.split(" ")
    val grams = words.sliding(3).map(_.mkString(" ")).toSeq
    val hashOf = (g: String) =>
      g.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L)
    val gramHashes = grams.map(hashOf).toSet
    val m = fps(Seq(1L -> text))
    assert(m(1L).subsetOf(gramHashes), "every fingerprint is a gram hash")
    assert(m(1L).size <= grams.size - 4 + 1, "at most one selection per window")
  }

  test("short docs: fewer grams than the window still fingerprint their minimum") {
    val m = fps(Seq(1L -> "alpha beta gamma delta")) // 2 grams < w=4
    assert(m(1L).size === 1, "sub-window docs select exactly the stream minimum")
  }

  test("position robustness: a long unrelated prefix keeps the span's match") {
    val span = "shared content that repeats verbatim across documents here"
    val prefix = (1 to 40).map(i => s"filler$i").mkString(" ")
    val m = fps(Seq(1L -> span, 2L -> s"$prefix $span"))
    assert((m(1L) intersect m(2L)).nonEmpty,
      "an insertion far from the copied span must not break the match")
  }

  test("q_c85 agreement table is the exact contingency of the three generators") {
    val sf = "/root/testdata/sf0.001"
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val g1 = pairSet(graft.operators.DedupQueries.minhashCandidatesShared(spark, sf))
    val g2 = pairSet(graft.operators.DedupQueries.winnowPairs(spark, sf))
    val g3 = pairSet(graft.operators.DedupQueries.verifiedJaccardPairs(spark, sf))
    val expected = (g1 ++ g2 ++ g3).toSeq
      .map(p => (if (g1(p)) 1 else 0, if (g2(p)) 1 else 0, if (g3(p)) 1 else 0))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = SparkEntry.queries("q_c85_candidate_agreement")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    graft.core.CachedRdds.drain()
    assert(got === expected, "the report must be the exact mask contingency")
    assert(got.keys.exists(k => k._3 == 1),
      "exact-verified pairs must appear (non-vacuous fixture)")
  }
}
