package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c108 frequency-of-frequencies spectrum + raw Good-Turing.
  *
  * The planted fixture pins the whole contract by hand (bucket counts,
  * permille mass shares, the r* ratio, and the missing-next-bucket → 0
  * rule); the sf0.001 test checks the two conservation identities the
  * spectrum must satisfy against independently computed corpus totals:
  * Σ r·n_r = total tokens and Σ n_r = vocabulary size.
  */
class TokenSpectrumSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-spectrum-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-spectrum").toString
    val s = spark
    import s.implicits._
    // corpus counts: a=3, b=2, c=1 → spectrum r=1,2,3 each with one term
    Seq((1L, "a a a b"), (2L, "b c"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.core.LocalArtifacts.deleteRecursively(dir)
  }

  test("planted corpus: buckets, mass shares, Good-Turing ratios, gap rule") {
    val rows = SparkEntry.queries("q_c108_token_spectrum")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(rows === Seq(
      // r=1 (c): mass 1/6 → 166‰; r* = 2·n_2/n_1 = 2
      (1L, 1L, 1L, 166L, 2.0),
      // r=2 (b): mass 2/6 → 333‰; r* = 3·n_3/n_2 = 3
      (2L, 1L, 2L, 333L, 3.0),
      // r=3 (a): mass 3/6 → 500‰; n_4 missing → raw r* = 0
      (3L, 1L, 3L, 500L, 0.0)))
  }

  test("streaming serve: streamed term counts reproduce the batch spectrum") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val rows = graft.core.Tables(sp, sf, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps
      .spectrumUpdates(input.toDF().toDF("doc_id", "text"))
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_spec").toString)
      .format("memory").queryName("spectrumstate").outputMode("complete").start()
    // deliberately uneven micro-batches: term counts must merge ACROSS
    // batches (a term split over two chunks lands in a different bucket
    // than either per-batch count — the nonlinearity the serve-side
    // report absorbs)
    for (chunk <- Seq(rows.take(5), rows.slice(5, 111), rows.drop(111))) {
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val served = graft.streaming.StreamingOps
      .spectrumServe(sp.table("spectrumstate"))
      .collect().map(_.toString).toSeq
    q.stop()
    val batch = SparkEntry.queries("q_c108_token_spectrum")(spark, sf)
      .collect().map(_.toString).toSeq
    graft.core.CachedRdds.drain()
    assert(served.nonEmpty && served === batch,
      "additive term-count state through the shared spectrum tail makes serve ≡ batch")
  }

  test("sf0.001: conservation — Σ mass = tokens, Σ n_r = vocabulary") {
    val rows = SparkEntry.queries("q_c108_token_spectrum")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    graft.core.CachedRdds.drain()
    val toks = graft.core.Tables(spark, sf, "documents")
      .selectExpr("explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS t")
    val nTokens = toks.count()
    val vocab = toks.distinct().count()
    assert(rows.map(_._3).sum == nTokens, "Σ r·n_r must equal the token count")
    assert(rows.map(_._2).sum == vocab, "Σ n_r must equal the vocabulary size")
    assert(rows.map(_._1) == rows.map(_._1).sorted && rows.nonEmpty)
  }
}
