package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c36 DSIR importance resampling + q_c37 hash split: both are
  * deterministic functions of the corpus, so this spec re-implements each
  * independently in plain Scala and asserts the distributed plans
  * reproduce the reference exactly on sf0.001 — plus the non-vacuity that
  * makes DSIR meaningful: the selected top-k must be ENRICHED in the
  * target language relative to the raw pool (that is the operator's whole
  * purpose), and every split class must be non-empty.
  */
class DsirSplitSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-dsir-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Mirror of Spark's Cast(double → DECIMAL(18,6)): shortest-repr
    * BigDecimal then HALF_UP at scale 6 (the q_c26 quantization).
    */
  private def q6(d: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP)

  private def buckets(text: String): Seq[Int] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq.map { w =>
      val h = w.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L)
      (h % 64).toInt
    }

  test("q_c36 matches an independent Scala DSIR reference on sf0.001") {
    val docs = graft.core.Tables(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    val docBuckets = docs.map { case (id, lang, text) => (id, lang, buckets(text)) }
    val cr = Array.fill(64)(0L)
    val ct = Array.fill(64)(0L)
    for ((_, lang, bs) <- docBuckets; b <- bs) {
      cr(b) += 1
      if (lang == "en") ct(b) += 1
    }
    val nt = ct.sum.toDouble
    val nr = cr.sum.toDouble
    // λ only exists for buckets observed in the raw pool (the query's
    // `raw LEFT JOIN tgt` frame)
    val lam: Map[Int, java.math.BigDecimal] = (0 until 64)
      .filter(b => cr(b) > 0)
      .map { b =>
        b -> q6(math.log((ct(b) + 1).toDouble / (nt + 64)) -
          math.log((cr(b) + 1).toDouble / (nr + 64)))
      }.toMap

    val ref = docBuckets
      .filter(_._3.nonEmpty) // docs with no tokens have no tfb rows
      .map { case (id, _, bs) =>
        val tf = bs.groupBy(identity).view.mapValues(_.size.toLong)
        val lw = tf.toSeq.map { case (b, c) => q6(c * lam(b).doubleValue) }
          .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
        (id, bs.length.toLong, lw)
      }
      .sortBy { case (id, _, lw) => (lw.negate, id) }
      .take(200)

    val got = SparkEntry.queries("q_c36_dsir_resample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    assert(got.length == ref.length, s"row count ${got.length} vs ref ${ref.length}")
    for (((gId, gN, gW), (rId, rN, rW)) <- got.zip(ref)) {
      assert(gId == rId && gN == rN && gW == rW.doubleValue,
        s"mismatch: got ($gId,$gN,$gW) ref ($rId,$rN,${rW.doubleValue})")
    }

    // non-vacuity: the selection must be target-enriched, else the
    // operator did nothing
    val langOf = docs.map(d => d._1 -> d._2).toMap
    val selEn = got.count(r => langOf(r._1) == "en").toDouble / got.length
    val poolEn = docs.count(_._2 == "en").toDouble / docs.length
    assert(selEn > poolEn,
      s"top-k en fraction $selEn not enriched over pool $poolEn")
  }

  test("q_c37 matches the LCG split reference; all classes non-empty") {
    val got = SparkEntry.queries("q_c37_corpus_split")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(got.nonEmpty)
    for ((id, _, bucket, split) <- got) {
      val hv = ((id % 1000000007L) * 1103515245L + 12345L) % 1000000007L % 1000L
      val refSplit = if (hv < 800) "train" else if (hv < 900) "val" else "test"
      assert(bucket == hv && split == refSplit, s"doc $id: ($bucket,$split) vs ($hv,$refSplit)")
    }
    val byClass = got.groupBy(_._4).view.mapValues(_.length).toMap
    assert(byClass.keySet == Set("train", "val", "test"), s"classes: $byClass")
    // split is a pure function of doc_id: assignment is stable under any
    // corpus growth/shrink by construction (no rank, no data-dependent
    // threshold) — spot-check that proportions are in the right regime
    val n = got.length.toDouble
    assert(byClass("train") / n > 0.6 && byClass("train") / n < 0.95)
  }
}
