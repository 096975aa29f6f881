package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-18 trained-quality dispatch: `spark.graft.quality.trained`
  * swaps the FIXED-weight classifier for q_c137's trained model at both
  * consumption sites — the ensemble vote (q_c49's v_cls) and the
  * quality key behind the funnel's retention rule (q_c65/q_c114/
  * q_c116/q_c119) — while the registered q_c140 row carries the trained
  * funnel standalone. The EventDispatchSpec discipline: BOTH flip sides
  * pinned, plus the funnel-share gates the rows-only q_c140 is graded
  * by.
  */
class TrainedQualitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-trainedq-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  private def collectStr(name: String): Seq[String] = {
    val out = SparkEntry.queries(name)(spark, sf)
      .collect().map(_.toString).toSeq
    graft.core.CachedRdds.drain()
    out
  }

  test("fixed side (default conf): q_c49's classifier vote is q_c30's verdict") {
    val fixedKeep = SparkEntry.queries("q_c30_quality_classifier")(spark, sf)
      .select(col("doc_id"), col("cls")).collect()
      .map(r => r.getLong(0) -> (r.getString(1) == "keep")).toMap
    val ens = SparkEntry.queries("q_c49_quality_ensemble")(spark, sf)
      .select(col("doc_id"), col("v_cls")).collect()
    assert(ens.nonEmpty)
    ens.foreach(r => assert((r.getInt(1) == 1) == fixedKeep(r.getLong(0)),
      s"doc ${r.getLong(0)}: fixed v_cls must be q_c30's sign"))
    graft.core.CachedRdds.drain()
  }

  test("trained side (conf on): q_c49's vote is the q_c138 verdict; q_c119 IS the registered q_c140 plan") {
    val trainedKeep = SparkEntry.queries("q_c138_classifier_scores")(spark, sf)
      .select(col("doc_id"), col("cls")).collect()
      .map(r => r.getLong(0) -> (r.getString(1) == "keep")).toMap
    val c140 = collectStr("q_c140_trained_quality_funnel")
    val c119Fixed = collectStr("q_c119_quality_funnel_corpus")
    withConf("spark.graft.quality.trained" -> "true") {
      // the ensemble's classifier vote flips to the EXACT q_c138
      // verdict (same cnts fold, same marginExpr bits — a re-derivation
      // would disagree on threshold-straddling documents)
      val ens = SparkEntry.queries("q_c49_quality_ensemble")(spark, sf)
        .select(col("doc_id"), col("v_cls")).collect()
      ens.foreach(r => assert((r.getInt(1) == 1) == trainedKeep(r.getLong(0)),
        s"doc ${r.getLong(0)}: trained v_cls must be q_c138's verdict"))
      graft.core.CachedRdds.drain()
      // the conf-dispatched funnel is row-identical to the registered
      // trained row — production flip ≡ the driver-checked plan
      assert(collectStr("q_c119_quality_funnel_corpus") == c140)
    }
    // and the flip is clean: conf off again returns the fixed output
    assert(collectStr("q_c119_quality_funnel_corpus") == c119Fixed)
  }

  test("funnel-share gates: q_c140 survivors non-empty, non-family survivors identical to q_c119, diff confined to dup families") {
    val fam = graft.operators.PipelineQueries.ccFamiliesShared(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    def ids(name: String): Set[Long] = {
      val out = SparkEntry.queries(name)(spark, sf)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      graft.core.CachedRdds.drain()
      out
    }
    val fixed = ids("q_c119_quality_funnel_corpus")
    val trained = ids("q_c140_trained_quality_funnel")
    assert(trained.nonEmpty, "the trained funnel must retain documents")
    // the retention rule only reorders WITHIN near-dup families: every
    // doc outside a family survives (or not) identically
    val diff = (fixed diff trained) union (trained diff fixed)
    assert(diff.subsetOf(fam),
      s"survivor difference must be confined to dup families: ${diff diff fam}")
    // share gate: the trained funnel keeps a sane fraction of the
    // corpus (neither empty nor a no-op pass-through)
    val nDocs = graft.core.Tables(spark, sf, "documents").count()
    assert(trained.size < nDocs,
      "the trained funnel must drop something on the driver corpus")
  }
}
