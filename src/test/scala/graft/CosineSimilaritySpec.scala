package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CosineSimilarity

class CosineSimilaritySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-cos-test")
      .config("spark.sql.shuffle.partitions", "2")
      // exercise the extension-injection path too
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("matches the reference fold formulation bit-for-bit (codegen path)") {
    CosineSimilarity.register(spark)
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2, 0.3), Array(-0.4, 0.5, -0.6)),
      (Array(1e-8, 2e8, -3.5), Array(7.0, -1e-9, 2.25))
    ).toDF("v", "qv")
    val both = df.select(
      expr("cosine_similarity(v, qv)").as("fused"),
      expr("aggregate(zip_with(v, qv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)" +
        " / (sqrt(aggregate(v, 0D, (acc, x) -> acc + x * x))" +
        " * sqrt(aggregate(qv, 0D, (acc, x) -> acc + x * x)))").as("folded"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null and zero-norm inputs return NULL; interpreted path agrees") {
    CosineSimilarity.register(spark)
    val rows = spark.sql(
      """SELECT cosine_similarity(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS a,
        |       cosine_similarity(array(0.0D, 0.0D), array(1.0D, 1.0D)) AS b,
        |       cosine_similarity(CAST(array() AS ARRAY<DOUBLE>), CAST(array() AS ARRAY<DOUBLE>)) AS c,
        |       cosine_similarity(array(2.0D), array(2.0D)) AS d""".stripMargin).collect()
    val r = rows.head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getDouble(3) == 1.0)
    // dimension mismatch → NULL, never a truncated score
    val mm = spark.sql(
      "SELECT cosine_similarity(array(1.0D, 2.0D, 3.0D), array(1.0D, 2.0D)) AS m").collect().head
    assert(mm.isNullAt(0))
    // interpreted (non-codegen) eval agrees
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val lit = (xs: Seq[Double]) =>
      Literal.create(ArrayData.toArrayData(xs.toArray), ArrayType(DoubleType))
    val e = CosineSimilarity(lit(Seq(1.0, 2.0)), lit(Seq(2.0, 4.0)))
    assert(math.abs(e.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
  }

  test("available through spark.sql via GraftExtensions injection") {
    // no manual register() on a fresh cloned session — extensions provide it
    val s2 = spark.newSession()
    val v = s2.sql("SELECT cosine_similarity(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c")
      .collect().head.getDouble(0)
    assert(v == 0.0)
  }
}
