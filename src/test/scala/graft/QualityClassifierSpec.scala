package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c30 hashed-bag-of-words linear classifier: the whole model is
  * deterministic integer arithmetic, so this spec re-implements it
  * independently in plain Scala (regex tokenize → rolling char hash mod 64
  * → LCG weight → sum) and asserts the distributed plan reproduces the
  * reference (n_tokens, wsum-derived verdict, exact score) on every
  * sf0.001 document — plus that the sign threshold is non-vacuous (both
  * verdicts occur).
  */
class QualityClassifierSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-classifier-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Independent reference: q_c8's rolling hash, 64 buckets, LCG weights. */
  private def refScore(text: String): (Long, Long) = {
    val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
    val wsum = toks.map { w =>
      val h = w.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L)
      ((h % 64) * 1103515245L + 12345L) % 2048L - 1024L
    }.sum
    (toks.length.toLong, wsum)
  }

  test("q_c30 matches an independent Scala reference on every sf0.001 doc") {
    val docs = graft.core.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val out = SparkEntry.queries("q_c30_quality_classifier")(spark, sf).collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (nRef, wsumRef) = refScore(docs(id))
      assert(r.getAs[Long]("n_tokens") == nRef, s"n_tokens mismatch for doc $id")
      val clsRef = if (wsumRef > 0) "keep" else "drop"
      assert(r.getAs[String]("cls") == clsRef, s"verdict mismatch for doc $id")
      if (nRef > 0) {
        // the plan emits through DECIMAL(38,6): quantize the reference the
        // same way (6 dp, HALF_UP) before comparing
        val scoreRef = (BigDecimal(wsumRef) / BigDecimal(nRef * 1024))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        assert(math.abs(r.getAs[Double]("score") - scoreRef.toDouble) < 1e-12,
          s"score mismatch for doc $id")
      } else assert(r.getAs[Double]("score") == 0.0)
    }
    val verdicts = out.map(_.getAs[String]("cls")).toSet
    assert(verdicts == Set("keep", "drop"), "sign threshold must be non-vacuous")
  }

  test("q_c31 rules each discriminate on sf0.01 and pass == AND of the flags") {
    val out = SparkEntry.queries("q_c31_rules_filter")(spark, "/root/testdata/sf0.01")
      .collect()
    for (flag <- Seq("r_words", "r_wlen", "r_stop", "r_ttr")) {
      val vals = out.map(_.getAs[Int](flag)).toSet
      assert(vals == Set(0, 1), s"rule $flag is vacuous on sf0.01 (values $vals)")
    }
    out.foreach { r =>
      val and = Seq("r_words", "r_wlen", "r_stop", "r_ttr").map(r.getAs[Int]).min
      assert(r.getAs[Int]("pass") == and, s"pass != AND of flags for doc ${r.getLong(0)}")
    }
    assert(out.map(_.getAs[Int]("pass")).toSet == Set(0, 1))
  }

  test("q_c32 matches a brute-force Scala BPE pair count on sf0.001") {
    val texts = graft.core.Tables(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val wf = scala.collection.mutable.Map.empty[String, Long]
    texts.flatMap(t => "[a-z0-9]+".r.findAllIn(t.toLowerCase))
      .foreach(w => wf(w) = wf.getOrElse(w, 0L) + 1)
    val occ = scala.collection.mutable.Map.empty[String, Long]
    val words = scala.collection.mutable.Map.empty[String, Set[String]]
    for ((w, f) <- wf; if w.length >= 2; i <- 0 until w.length - 1) {
      val p = w.substring(i, i + 2)
      occ(p) = occ.getOrElse(p, 0L) + f
      words(p) = words.getOrElse(p, Set.empty) + w
    }
    val expected = occ.toSeq
      .map { case (p, c) => (p, c, words(p).size.toLong) }
      .sortBy { case (p, c, _) => (-c, p) }
      .take(20)
    val got = SparkEntry.queries("q_c32_bpe_pair_stats")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }
}
