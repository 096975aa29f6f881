package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c105 dedup family-diameter audit.
  *
  * The structural theorems the audit relies on, asserted against the
  * live sf0.001 pipeline frames rather than a planted graph: every
  * candidate edge is INTRA-family (that is what connected components
  * means — if it failed, per-family edge accounting would be meaningless),
  * the report's family set and member counts reconcile exactly with
  * q_c13's output, edge counts reconcile with the shared candidate
  * frame, and the verified-edge statistics respect the τ=0.5 verifier's
  * bound (permille ≥ 500 whenever a verified edge exists; 0 sentinel
  * only when none does).
  */
class FamilyDiameterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-famdiam-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("every candidate edge is intra-family (CC soundness for the audit)") {
    import org.apache.spark.sql.functions.col
    val fam = graft.operators.PipelineQueries.ccFamiliesShared(spark, sf)
    val cand = graft.operators.DedupQueries.minhashCandidatesShared(spark, sf)
    val cross = cand
      .join(fam.toDF("doc_a", "ca"), Seq("doc_a"))
      .join(fam.toDF("doc_b", "cb"), Seq("doc_b"))
      .filter(col("ca") =!= col("cb")).count()
    graft.core.CachedRdds.drain()
    assert(cross == 0L, "a candidate edge crossing two families breaks CC")
  }

  test("report reconciles with q_c13 families and the candidate frame") {
    val rows = SparkEntry.queries("q_c105_family_diameter")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val fam = SparkEntry.queries("q_c13_dup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nCand = graft.operators.DedupQueries
      .minhashCandidatesShared(spark, sf).count()
    graft.core.CachedRdds.drain()
    assert(rows.nonEmpty)
    // family ids and member counts are exactly q_c13's grouping
    val famCounts = fam.groupBy(_._2).map { case (c, g) => (c, g.length.toLong) }
    assert(rows.map(r => (r._1, r._2)).toMap === famCounts)
    // every family has >= 2 members (singletons never enter the graph)
    assert(rows.forall(_._2 >= 2))
    // edge accounting: every candidate edge lands in exactly one family
    assert(rows.map(_._3).sum == nCand)
    for ((fid, m, e, v, dens, lo, hi) <- rows) {
      assert(e >= 1 && e <= m * (m - 1) / 2, s"family $fid edge count")
      assert(v >= 0 && v <= e, s"family $fid verified count")
      assert(dens == e * 1000 / (m * (m - 1) / 2) && dens <= 1000,
        s"family $fid density")
      if (v > 0) assert(lo >= 500 && lo <= hi && hi <= 1000,
        s"family $fid verified permille out of the τ=0.5 verifier's range")
      else assert(lo == 0 && hi == 0, s"family $fid sentinel")
    }
  }

  test("q_c114: retention audit reconciles with q_c13 and the quality frame") {
    val rows = SparkEntry.queries("q_c114_family_quality")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val fam = SparkEntry.queries("q_c13_dup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val qkey = graft.operators.TextQueries.qualityKeyFrame(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    graft.core.CachedRdds.drain()
    assert(rows.nonEmpty)
    val famCounts = fam.groupBy(_._2).map { case (c, g) => (c, g.length.toLong) }
    assert(rows.map(r => (r._1, r._2)).toMap === famCounts)
    val byFam = fam.groupBy(_._2)
    for ((fid, _, retained, best, regret, isBest) <- rows) {
      assert(retained == qkey(fid), s"family $fid: retained ≠ root's qkey")
      assert(best == byFam(fid).map(m => qkey(m._1)).max,
        s"family $fid: best must be the member max")
      assert(regret == best - retained && regret >= 0, s"family $fid regret")
      assert(isBest == (if (regret == 0) 1L else 0L), s"family $fid flag")
    }
  }

  test("q_c116: quality-aware retention differs from q_c19 exactly on the regret families") {
    val q19 = SparkEntry.queries("q_c19_neardup_retained")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val q116 = SparkEntry.queries("q_c116_quality_retained")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val audit = SparkEntry.queries("q_c114_family_quality")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(5))).toSeq
    val qkey = graft.operators.TextQueries.qualityKeyFrame(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val fam = SparkEntry.queries("q_c13_dup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    graft.core.CachedRdds.drain()
    // both rules keep exactly one doc per family: same corpus size
    assert(q116.size == q19.size)
    // the rules differ exactly on the families q_c114 flags suboptimal
    val regretFams = audit.filter(_._3 == 0L).map(_._1).toSet
    assert((q19 -- q116) == regretFams,
      "q_c19-only survivors must be exactly the suboptimal roots")
    val byFam = fam.groupBy(_._2)
    val expectedNew = regretFams.map { fid =>
      byFam(fid).map(_._1).minBy(id => (-qkey(id), id))
    }
    assert((q116 -- q19) == expectedNew,
      "q_c116's new survivors must be each regret family's (qkey desc, id) argmax")
    // and every q_c116 survivor in a family carries that family's best qkey
    val bestByFam = audit.map(r => (r._1, r._2)).toMap
    for ((fid, members) <- byFam; m <- members.map(_._1) if q116.contains(m))
      assert(qkey(m) == bestByFam(fid), s"family $fid survivor not best-quality")
  }
}
