package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c109 cross-source vocabulary-overlap matrix.
  *
  * The planted fixture pins the contract by hand — the Jaccard
  * arithmetic and the no-shared-types ⇒ no-row rule — and the sf0.001
  * test checks the set-algebra invariants against independently
  * computed per-source vocabularies.
  */
class SourceVocabOverlapSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-srcvocab-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-srcvocab").toString
    val s = spark
    import s.implicits._
    Seq(
      (1L, "a b c", "s1"),
      (2L, "b c d", "s2"),
      (3L, "x y", "s3")) // shares nothing with s1/s2 → no rows
      .toDF("doc_id", "text", "source").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.core.LocalArtifacts.deleteRecursively(dir)
  }

  test("planted corpus: Jaccard arithmetic and the zero-overlap rule") {
    val rows = SparkEntry.queries("q_c109_source_vocab_overlap")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // only (s1,s2) share types: {b,c} of union {a,b,c,d} → 2/4 = 500‰
    assert(rows === Seq(("s1", "s2", 3L, 3L, 2L, 500L)))
  }

  test("sf0.001: set-algebra invariants vs independent vocabularies") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q_c109_source_vocab_overlap")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    graft.core.CachedRdds.drain()
    val vocab = graft.core.Tables(spark, sf, "documents")
      .selectExpr("source", "explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS t")
      .distinct().groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    for ((sa, sb, va, vb, sh, jac) <- rows) {
      assert(sa < sb, "canonical pair orientation")
      assert(va == vocab(sa) && vb == vocab(sb), s"vocab sizes for ($sa,$sb)")
      assert(sh >= 1 && sh <= math.min(va, vb), s"shared bound for ($sa,$sb)")
      assert(jac == sh * 1000 / (va + vb - sh) && jac <= 1000)
    }
  }
}
