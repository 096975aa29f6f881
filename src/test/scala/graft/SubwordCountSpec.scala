package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SubwordCount
import graft.operators.TextQueries

/** The native greedy subword tokenizer must be value-identical to the
  * higher-order-function form it replaced on the q_c22 hot path (the HOF
  * stays as the SQL twin, so this is the native↔HOF bridge; the
  * HOF↔DuckDB bridge is the driver's hash-exact oracle).
  */
class SubwordCountSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-subword-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SubwordCount.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def hofCount(text: String): Long = {
    import scala.jdk.CollectionConverters._
    spark.createDataset(Seq(text))(org.apache.spark.sql.Encoders.STRING)
      .toDF("text")
      .select(expr(TextQueries.subwordCountExpr("text")).as("c"))
      .collect().head.getLong(0)
  }

  test("hand-checked greedy matches") {
    def c(s: String): Long = SubwordCount.count(UTF8String.fromString(s))
    assert(c("") == 0L)
    assert(c("   ") == 0L) // empty words are skipped
    // "the" is a 3-gram entry, consumed whole
    assert(c("the") == 1L)
    // "that" 4-gram beats "th"+"at" (longest match wins)
    assert(c("that") == 1L)
    // "x" has no vocab entry → one single-char unit
    assert(c("x") == 1L)
    // "xx the xx" = 1 + 1 + 1 per word... "xx": no entry starts with x → 2
    assert(c("xx the xx") == 2L + 1L + 2L)
    // uppercase folds: TION → tion
    assert(c("TION") == 1L)
    // greedy is leftmost, not optimal: "ithe" → "it"+"he" (2), not "i"+"the"
    assert(c("ithe") == 2L)
    // multi-byte codepoints are single fallback units: 的是 → 2
    assert(c("的是") == 2L)
    // mixed: "the的" → "the" + 1 codepoint
    assert(c("the的") == 2L)
  }

  test("native equals HOF on adversarial strings") {
    val cases = Seq(
      "", " ", "  a  b  ", "the quick brown fox",
      "thethethe", "tionment", "withthat", "atat", "aaaa",
      "The Theory of Everything", "TION MENT THER",
      "的是了 在我", // zh stopwords
      "café résumé naïve", // latin-1 accents (2-byte UTF-8)
      "aétheéa", // vocab entry adjacent to multi-byte chars
      "😀 emoji the 😀", // 4-byte codepoints
      "ther therm thermal", "estethe", "ngng", "uresesth"
    )
    for (t <- cases)
      assert(SubwordCount.count(UTF8String.fromString(t)) == hofCount(t),
        s"mismatch on '$t'")
  }

  test("native equals HOF across the sf0.001 documents corpus, in codegen") {
    // raw loader: this test pins the EXPRESSION's codegen participation;
    // under the scan-spread loader the pre-execution plan is an AQE shell
    // whose WholeStageCodegen stages only materialize at runtime
    val docs = graft.core.Tables.raw(spark, "/root/testdata/sf0.001", "documents")
    val cmp = docs.select(
      col("doc_id"),
      expr("subword_count(text)").as("native"),
      expr(TextQueries.subwordCountExpr("text")).as("hof"))
    val bad = cmp.filter(col("native") =!= col("hof")).count()
    assert(bad == 0L)
    // and the plan stays inside whole-stage codegen (the point of the port)
    val plan = docs.select(expr("subword_count(text)"))
      .queryExecution.executedPlan
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      plan.toString)
  }
}
