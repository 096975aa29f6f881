package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two DOUBLE arrays in
  * a single fused pass (dot product + both norms in one loop), with full
  * whole-stage-codegen support (SURVEY §2.3's "custom Expression beats a
  * Scala UDF" preference, cf. the brute-force scorer shape of Q-B7).
  *
  * Semantics: sequential left-to-right IEEE accumulation — identical
  * result order to `aggregate(zip_with(...))` and to DuckDB's
  * `list_dot_product`, so oracle hash-equality is preserved when swapped
  * into the similarity queries. NULL if either side is NULL; 0-length or
  * zero-norm inputs yield NULL (no 0/0 NaNs in results).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity requires two ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // dimension mismatch → NULL (silent truncation would rank on garbage)
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |if ($x.numElements() != $y.numElements()) { ${ev.isNull} = true; } else {
         |  int $n = $x.numElements();
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = $x.getDouble($i);
         |    double $yi = $y.getDouble($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |  if ($denom == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $denom; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  private val info = new ExpressionInfo(
    classOf[CosineSimilarity].getName, "cosine_similarity")

  private[graft] val injection
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    info,
    (children: Seq[Expression]) => {
      require(children.length == 2, "cosine_similarity takes 2 arguments")
      CosineSimilarity(children.head, children(1))
    })

  /** Register `cosine_similarity` into a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      injection._1, injection._2, injection._3)
}

/** Session-extension hook: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * makes every fixed-name graft kernel available to every session,
  * including pure `spark.sql` users (SURVEY §2.3 extension point) — the
  * SAME injection triples the per-session `register()` helpers use, so
  * the two paths cannot fork. Model-bound families (`bpe_count_<id>`,
  * `unigram_seg_<id>`, `wordpiece_count_<id>`, `nearest_cells_<id>`) are
  * inherently per-model and keep their content-hashed session
  * registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    val all = Seq(
      CosineSimilarity.injection,
      CharBigramStats.injection,
      HyperplaneSignature.injection,
      IntersectCountSorted.injection,
      SubwordCount.injection,
      VectorSum.injection,
      PolyHash.injection,
      GramHashes.injection,
      SlidingMin.injection,
      TokenRepStats.injection) ++ Int8Ops.injections
    all.foreach(ext.injectFunction)
  }
}
