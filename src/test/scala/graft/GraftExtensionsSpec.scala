package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The pure-SQL extension point: a session created with
  * `spark.sql.extensions=graft.functions.GraftExtensions` must resolve
  * every fixed-name graft kernel from plain `spark.sql` with the same
  * values the per-session `register()` path produces (the two paths
  * share one injection triple per function — this drives the shared
  * path end-to-end).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("every fixed-name kernel resolves and evaluates via the extension") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-test")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      def one(sql: String): org.apache.spark.sql.Row = spark.sql(sql).head()

      val cos = one("SELECT cosine_similarity(array(1D, 0D), array(1D, 0D)) AS c")
      assert(math.abs(cos.getDouble(0) - 1.0) < 1e-12)

      val cb = one("SELECT char_bigram_stats('abab') AS s")
      val s = cb.getStruct(0)
      assert(s.getLong(0) === 3L && s.getLong(1) === 2L) // 3 bigrams, 2 distinct

      val hp = one("SELECT hyperplane_sig(array(0.3D, -0.2D, 0.9D), 16, 42L) AS h")
      assert(!hp.isNullAt(0))

      val ic = one(
        "SELECT intersect_count_sorted(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS n")
      assert(ic.getLong(0) === 2L)

      val sw = one("SELECT subword_count(lower('the data table')) AS n")
      assert(sw.getLong(0) > 0L)

      val vs = one(
        "SELECT vector_sum(v) AS v FROM VALUES (array(1D, 2D)), (array(3D, 4D)) AS t(v)")
      assert(vs.getSeq[Double](0) === Seq(4.0, 6.0))

      // int8_cos_q = dot(q8, v)/||q8|| (the IVF stage-1 form: the float
      // query's norm is constant per query and cancels in ranking) — on
      // a unit-direction pair it evaluates to ||v|| = 1 here
      val p8 = one("SELECT int8_cos_q(pack_int8(array(1D, 0D)), array(1D, 0D)) AS c")
      assert(math.abs(p8.getDouble(0) - 1.0) < 0.02)
      val qq = one(
        "SELECT int8_cos_qq(pack_int8(array(0.5D, -0.5D)), pack_int8(array(0.5D, -0.5D))) AS c")
      assert(math.abs(qq.getDouble(0) - 1.0) < 0.02)
    } finally spark.stop()
  }
}
