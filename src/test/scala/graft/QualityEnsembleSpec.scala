package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c49's fused single-scan votes must agree with the four STANDALONE
  * quality queries on every document — the fusion is a plan optimization,
  * not a semantic fork — and the vote must be non-vacuous in both
  * directions on every signal.
  */
class QualityEnsembleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-ensemble-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("ensemble votes equal the standalone queries per document") {
    def byId(name: String): Map[Long, org.apache.spark.sql.Row] =
      SparkEntry.queries(name)(spark, sf).collect().map(r => r.getLong(0) -> r).toMap
    val ens = byId("q_c49_quality_ensemble")
    val rules = byId("q_c31_rules_filter")
    val cls = byId("q_c30_quality_classifier")
    val ppl = byId("q_c26_unigram_logprob")
    val ent = byId("q_c38_bigram_entropy")
    graft.core.CachedRdds.drain()
    assert(ens.nonEmpty && ens.keySet == rules.keySet)
    for ((id, e) <- ens) {
      val vRules = e.getAs[Int]("v_rules")
      val vCls = e.getAs[Int]("v_cls")
      val vPpl = e.getAs[Int]("v_ppl")
      val vEnt = e.getAs[Int]("v_ent")
      assert(vRules == rules(id).getAs[Int]("pass"), s"doc $id rules")
      assert(vCls == (if (cls(id).getAs[String]("cls") == "keep") 1 else 0), s"doc $id cls")
      val pplRow = ppl.get(id)
      assert(vPpl == (if (pplRow.exists(_.getAs[Double]("avg_nll") <= 3.45)) 1 else 0),
        s"doc $id ppl")
      val entRow = ent(id)
      assert(vEnt == (if (entRow.getAs[Long]("n_bigrams") > 0
        && entRow.getAs[Double]("entropy") >= 4.0) 1 else 0), s"doc $id ent")
      assert(e.getAs[Int]("n_pass") == vRules + vCls + vPpl + vEnt)
      assert(e.getAs[Int]("keep") == (if (vRules + vCls + vPpl + vEnt >= 3) 1 else 0))
    }
    // each signal must discriminate on this corpus (both vote values occur)
    for (c <- Seq("v_rules", "v_cls", "v_ppl", "v_ent", "keep"))
      assert(ens.values.map(_.getAs[Int](c)).toSet == Set(0, 1), s"$c vacuous")
  }

  test("q_c76 buckets are per-lang NLL terciles of q_c26's exact scores") {
    val buckets = SparkEntry.queries("q_c76_ppl_buckets")(spark, sf).collect()
    val ppl = SparkEntry.queries("q_c26_unigram_logprob")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_nll")).toMap
    graft.core.CachedRdds.drain()
    assert(buckets.map(_.getLong(0)).toSet === ppl.keySet,
      "bucket assignment covers exactly the scored documents")
    buckets.foreach(r => assert(r.getAs[Double]("avg_nll") === ppl(r.getLong(0)),
      "the bucket score IS q_c26's score (shared pipeline, no fork)"))
    for ((lang, rs) <- buckets.groupBy(_.getAs[String]("lang")) if rs.length >= 10) {
      val byBucket = rs.groupBy(_.getAs[String]("bucket"))
      assert(byBucket.keySet === Set("head", "middle", "tail"),
        s"$lang: all three buckets populated")
      // buckets are ordered: every head score < every middle < every tail
      // (equal scores always land in the same bucket, so max/min suffice)
      def scores(b: String) = byBucket(b).map(_.getAs[Double]("avg_nll"))
      assert(scores("head").max < scores("middle").min, s"$lang head/middle overlap")
      assert(scores("middle").max < scores("tail").min, s"$lang middle/tail overlap")
      // tercile balance: head holds between a quarter and a half of the docs
      val h = byBucket("head").length
      assert(h * 4 >= rs.length && h * 2 <= rs.length + 2, s"$lang head=$h of ${rs.length}")
    }
  }
}
