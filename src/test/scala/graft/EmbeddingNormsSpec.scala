package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c112 per-label embedding-geometry report.
  *
  * The planted fixture pins the arithmetic by hand on exactly-
  * representable norms (3-4-5 triangle, zero vector, unit vector) —
  * including the quartile interpolation on the integer rails and the
  * degenerate-vector count. The sf0.001 test checks the panel against
  * an independent per-vector norm computation.
  */
class EmbeddingNormsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-embnorm-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-embnorm").toString
    val s = spark
    import s.implicits._
    Seq(
      (1L, Seq(3.0f, 4.0f), 0),  // norm 5
      (2L, Seq(0.0f, 0.0f), 0),  // norm 0 — degenerate
      (3L, Seq(1.0f, 0.0f), 1))  // norm 1
      .toDF("vec_id", "embedding", "label").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.core.LocalArtifacts.deleteRecursively(dir)
  }

  test("planted vectors: norms, quartile interpolation, degenerate count") {
    val rows = SparkEntry.queries("q_c112_embedding_norms")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSeq
    assert(rows === Seq(
      // label 0: norms {0, 5} → mean 2.5, quartiles interpolate 1.25/2.5/3.75
      (0L, 2L, 2.5, 1.25, 2.5, 3.75, 1L),
      (1L, 1L, 1.0, 1.0, 1.0, 1.0, 0L)))
  }

  test("sf0.001: panel agrees with independent per-vector norms") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q_c112_embedding_norms")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(6))).toSeq
    graft.core.CachedRdds.drain()
    val norms = graft.core.Tables(spark, sf, "embeddings")
      .selectExpr("CAST(label AS BIGINT) AS label",
        "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), 0D, (a, x) -> a + x * x)) AS nrm")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.nonEmpty)
    val byLabel = norms.groupBy(_._1)
    for ((label, n, nSmall) <- rows) {
      assert(n == byLabel(label).length.toLong, s"label $label count")
      assert(nSmall == byLabel(label).count(_._2 < 0.5).toLong,
        s"label $label degenerate count")
    }
  }
}
