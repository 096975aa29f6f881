package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c91 — the cross-source near-dup matrix. The planted corpus pins
  * both cells: one duplicate pair WITHIN a source (diagonal) and one
  * ACROSS sources (off-diagonal, unordered), with an unrelated filler
  * that must not contribute. The sf0.001 test asserts the matrix is a
  * partition of the verified τ = 0.5 pair set (q_b6) — every pair lands
  * in exactly one cell.
  */
class SourceDupMatrixSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-srcdup-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-srcdup").toString
    val s = spark
    import s.implicits._
    val crossTxt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val withinTxt = "north south east west upward downward inward outward forward backward"
    val docs = Seq(
      (1L, crossTxt, "web"), (2L, crossTxt, "books"),       // cross-source dup
      (3L, withinTxt, "web"), (4L, withinTxt, "web"),       // within-source dup
      (5L, "solitary unique text nothing shares these words today", "books"))
    docs.toDF("doc_id", "text", "source").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.core.LocalArtifacts.deleteRecursively(dir)
  }

  test("q_c91 planted: within-source on the diagonal, cross-source unordered off it") {
    val rows = SparkEntry.queries("q_c91_source_dup_matrix")(spark, dir).collect()
    graft.core.CachedRdds.drain()
    val got = rows.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("books", "web", 1L), ("web", "web", 1L)))
  }

  test("q_c91 on sf0.001: the matrix partitions the verified pair set") {
    val rows = SparkEntry.queries("q_c91_source_dup_matrix")(spark, sf).collect()
    graft.core.CachedRdds.drain()
    val exact = SparkEntry.queries("q_b6_jaccard_neardup")(spark, sf).count()
    graft.core.CachedRdds.drain()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === exact)
    rows.foreach { r =>
      assert(r.getString(0) <= r.getString(1),
        "cells are unordered source pairs: source_a <= source_b")
      assert(r.getAs[Long]("n_pairs") >= 1L)
    }
  }
}
