package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c86 — the family-level agreement report between MinHash-fed and
  * winnowing-fed clustering.
  *
  * Test 1 plants two exact-duplicate pairs plus an unrelated singleton:
  * identical texts share every shingle (hence every minhash band key)
  * and every winnowing fingerprint, so BOTH generators must link each
  * pair, both CC sides must agree on the family, and the singleton —
  * absent from both candidate graphs — must not appear at all.
  *
  * Test 2 rebuilds the full report on sf0.001 through the INDEPENDENT
  * CC implementation (min-label propagation, the PipelineCcSpec
  * cross-check) and a driver-side cross-tab — pinning the production
  * path (star-CC + session-shared family memo + full-outer coalesce)
  * against a second implementation end to end.
  */
class FamilyAgreementSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-famagree-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-famagree").toString
    val s = spark
    import s.implicits._
    val dupA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val dupB = "north south east west upward downward inward outward forward backward sideways around"
    val docs = Seq(
      (1L, dupA), (2L, dupA),
      (3L, dupB), (4L, dupB),
      (5L, "solitary unique text nothing shares these particular words ever at all today"))
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.core.LocalArtifacts.deleteRecursively(dir)
  }

  test("q_c86: exact duplicates co-cluster under BOTH generators; singletons stay out") {
    val rows = SparkEntry.queries("q_c86_family_agreement")(spark, dir).collect()
    graft.core.CachedRdds.drain()
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 1L, 2L), (3L, 3L, 2L)),
      "each dup pair must form ONE family with the same id on both sides, " +
        s"and doc 5 must appear nowhere; got $got")
  }

  test("q_c86 on sf0.001 == cross-tab over the independent propagation-CC labels") {
    val rows = SparkEntry.queries("q_c86_family_agreement")(spark, sf).collect()
    graft.core.CachedRdds.drain()
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val mhPairs = graft.operators.DedupQueries.minhashCandidatesShared(spark, sf)
    val wnPairs = graft.operators.DedupQueries.winnowPairs(spark, sf)
      .select("doc_a", "doc_b")
    def labels(cand: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      graft.operators.PipelineQueries.connectedComponentsPropagation(spark, cand)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mh = labels(mhPairs)
    val wn = labels(wnPairs)
    graft.core.CachedRdds.drain()
    assert(mh.nonEmpty && wn.nonEmpty, "fixture must cluster on both sides")
    val expected = (mh.keySet ++ wn.keySet)
      .groupBy(id => (mh.getOrElse(id, id), wn.getOrElse(id, id)))
      .map { case ((a, b), members) => (a, b, members.size.toLong) }
      .toSet
    assert(got === expected)
  }
}
