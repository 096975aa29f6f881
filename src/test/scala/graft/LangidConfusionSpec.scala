package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c104 lang-ID confusion matrix.
  *
  * The planted fixture pins every cell by hand — including the score-tie
  * argmax rule (DESC struct sort: 'fr' beats 'es' at equal score) and
  * the zero-score 'und' row — and the streaming test proves the
  * complete-mode cell counts served through the shared report tail
  * reproduce the batch matrix across uneven micro-batches (additive
  * counts ⇒ linearity). The sf0.001 test checks conservation: cell
  * counts sum to the corpus size, and each gold row sums to its
  * gold_total.
  */
class LangidConfusionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-langidconf-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-langidconf").toString
    val s = spark
    import s.implicits._
    Seq(
      (1L, "en", "the of and x"), // en=3 → pred en
      (2L, "en", "qq zz"),        // all scores 0 → und
      (3L, "fr", "de la"),        // es=2, fr=2 tie → DESC struct sort → fr
      (4L, "es", "el que"),       // es=2 → es
      (5L, "zh", "的 是"))         // zh=2 → zh
      .toDF("doc_id", "lang", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.core.LocalArtifacts.deleteRecursively(dir)
  }

  private def asTuples(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))).toSeq

  test("planted corpus: cells, tie-break, und row, permille shares") {
    val rows = asTuples(
      SparkEntry.queries("q_c104_langid_confusion")(spark, dir).collect())
    assert(rows === Seq(
      ("en", "en", 1L, 2L, 1L, 500L, 1000L),
      ("en", "und", 1L, 2L, 1L, 500L, 1000L),
      ("es", "es", 1L, 1L, 1L, 1000L, 1000L),
      ("fr", "fr", 1L, 1L, 1L, 1000L, 1000L),
      ("zh", "zh", 1L, 1L, 1L, 1000L, 1000L)))
  }

  test("streaming serve: streamed cell counts reproduce the batch matrix") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val rows = graft.core.Tables(sp, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect()
    val input = MemoryStream[(Long, String, String)]
    val q = graft.streaming.StreamingOps
      .langidUpdates(input.toDF().toDF("doc_id", "lang", "text"))
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_langid").toString)
      .format("memory").queryName("langidstate").outputMode("complete").start()
    for (chunk <- Seq(rows.take(9), rows.slice(9, 120), rows.drop(120))) {
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val served = graft.streaming.StreamingOps
      .langidServe(sp.table("langidstate"))
      .collect().map(_.toString).sorted.toSeq
    q.stop()
    val batch = SparkEntry.queries("q_c104_langid_confusion")(
      sp, "/root/testdata/sf0.001").collect().map(_.toString).sorted.toSeq
    graft.core.CachedRdds.drain()
    assert(served.nonEmpty && served === batch,
      "additive cell counts through the shared report tail make serve ≡ batch")
  }

  test("sf0.001: conservation — cells sum to corpus, rows sum to gold_total") {
    val rows = asTuples(SparkEntry.queries("q_c104_langid_confusion")(
      spark, "/root/testdata/sf0.001").collect())
    graft.core.CachedRdds.drain()
    val n = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents").count()
    assert(rows.map(_._3).sum == n, "every document lands in exactly one cell")
    for ((gold, g) <- rows.groupBy(_._1))
      assert(g.map(_._3).sum == g.head._4,
        s"gold row $gold: cells must sum to its gold_total")
  }
}
