package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c96 (FIM transform) and q_c97 (intra-doc passage scrub).
  *
  * The FIM test is a LOSSLESSNESS property over the real sf0.001
  * corpus: for every PSM row, re-assembling prefix ++ middle ++ suffix
  * from the <PRE>/<SUF>/<MID> segments must reproduce the document's
  * token stream exactly, with span_start/span_len equal to the segment
  * geometry — the transform reorders, never drops. The scrub test
  * plants a document with a repeated 8-token passage and one without.
  */
class FimScrubSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-fimscrub-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-fimscrub").toString
    val s = spark
    import s.implicits._
    val p1 = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val p2 = "one two three four five six seven eight"       // 8 tokens
    Seq(
      (1L, s"$p1 $p2 $p1"),                                  // chunk 3 repeats chunk 1
      (2L, s"$p1 $p2"),                                      // no repeats
      (3L, s"$p1 $p1 $p1 $p2"))                              // chunks 2,3 repeat chunk 1
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.core.LocalArtifacts.deleteRecursively(dir)
  }

  test("q_c96 on sf0.001: PSM re-assembly is lossless, geometry columns match") {
    val rows = SparkEntry.queries("q_c96_fim_transform")(spark, sf).collect()
    graft.core.CachedRdds.drain()
    val docs = graft.core.Tables(spark, sf, "documents")
      .collect().map(r => r.getLong(0) ->
        "[a-z0-9]+".r.findAllIn(r.getAs[String]("text").toLowerCase).toSeq).toMap
    graft.core.CachedRdds.drain()
    assert(rows.nonEmpty)
    val applied = rows.filter(_.getAs[Long]("fim_applied") == 1L)
    val plain = rows.filter(_.getAs[Long]("fim_applied") == 0L)
    assert(applied.nonEmpty && plain.nonEmpty,
      "the 50% LCG rate must produce both classes on a real corpus")
    applied.foreach { r =>
      val toks = docs(r.getLong(0))
      val out = r.getAs[String]("text_out")
      assert(out.startsWith("<PRE> "))
      val Array(pre, rest) = out.stripPrefix("<PRE> ").split(" <SUF> ", 2)
      val Array(suf, mid) = rest.split(" <MID> ", 2)
      def tok(s: String) = if (s.isEmpty) Seq.empty[String] else s.split(" ").toSeq
      assert(tok(pre) ++ tok(mid) ++ tok(suf) === toks,
        s"doc ${r.getLong(0)}: PSM re-assembly must reproduce the token stream")
      assert(r.getAs[Long]("span_start") === tok(pre).length.toLong)
      assert(r.getAs[Long]("span_len") === tok(mid).length.toLong)
    }
    plain.foreach { r =>
      assert(r.getAs[String]("text_out") === docs(r.getLong(0)).mkString(" "))
      assert(r.getAs[Long]("span_len") === 0L)
    }
  }

  test("q_c97 planted: repeated passages drop, first occurrences and partials survive") {
    val rows = SparkEntry.queries("q_c97_self_dedup")(spark, dir).collect()
    graft.core.CachedRdds.drain()
    val byDoc = rows.map(r => r.getLong(0) -> r).toMap
    val p1 = "alpha beta gamma delta epsilon zeta eta theta"
    val p2 = "one two three four five six seven eight"
    assert(byDoc(1L).getAs[Long]("n_passages") === 3L)
    assert(byDoc(1L).getAs[Long]("n_dropped") === 1L)
    assert(byDoc(1L).getAs[String]("scrubbed_text") === s"$p1 $p2")
    assert(byDoc(2L).getAs[Long]("n_dropped") === 0L)
    assert(byDoc(2L).getAs[String]("scrubbed_text") === s"$p1 $p2")
    assert(byDoc(3L).getAs[Long]("n_passages") === 4L)
    assert(byDoc(3L).getAs[Long]("n_dropped") === 2L)
    assert(byDoc(3L).getAs[String]("scrubbed_text") === s"$p1 $p2")
  }
}
