package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c78 — the asymmetric-geometry claim, on a planted corpus: a long
  * corpus document that swallows a short benchmark document whole must be
  * flagged by containment (C = 1) even though its Jaccard similarity is
  * far below q_c47's 0.3 threshold — the inclusion case a
  * Jaccard-thresholded decontaminator misses by construction.
  */
class ContainmentDeconSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  // the bench slice is doc_id % 17 == 3
  private val benchText = "the secret benchmark answer is forty two exactly"
  private val filler = (1 to 80).map(i => s"filler$i").mkString(" ")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-containment-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-cont").toString
    val s = spark
    import s.implicits._
    Seq(
      (3L, benchText), // held-out
      (1L, s"$filler $benchText"), // swallows it whole
      (2L, "completely unrelated corpus text with nothing shared at all here")
    ).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.core.LocalArtifacts.deleteRecursively(dir)
  }

  private def shingleSet(text: String): Set[String] =
    text.toLowerCase.split(" ").sliding(3).map(_.mkString(" ")).toSet

  test("q_c78 flags full inclusion that Jaccard misses") {
    val rows = SparkEntry.queries("q_c78_containment_decon")(spark, dir).collect()
    graft.core.CachedRdds.drain()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 3L)
    assert(r.getAs[Double]("containment") === 1.0,
      "every held-out shingle appears in the swallowing doc")
    // the same pair under q_c47's Jaccard rule: shared·10 >= uni·3 FAILS
    val a = shingleSet(s"$filler $benchText")
    val b = shingleSet(benchText)
    val shared = (a intersect b).size
    val uni = (a union b).size
    assert(r.getLong(2) === shared.toLong && r.getLong(3) === b.size.toLong)
    assert(shared * 10 < uni * 3,
      "the planted pair must sit BELOW the Jaccard decon threshold")
  }
}
