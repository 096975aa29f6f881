package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Native expressions for the STORED int8 IVF index (round 13, NEXT.md
  * lead 4): the round-12 `ivfSearchRerank` derives its int8 stage-1 scan
  * in-expression from the float corpus, which proves the recall math but
  * still READS 8-byte doubles. Storing the quantized vector as a BINARY
  * column (1 byte per element) makes the 4× stage-1 byte claim a
  * measurable in-engine property: a columnar scan of the `q8` column
  * reads ~dim bytes per row instead of ~8·dim.
  *
  * [[PackInt8]] (`pack_int8(v)`) — build-side: one fused pass computes
  * mx = max|x| and emits bytes round(x·127/max(mx, 1e-12)) — exactly the
  * `transform(v, x -> CAST(round(x * 127 / greatest(mx, 1e-12D)) AS INT))`
  * derivation in `ivfSearchRerank`, so stored and derived codes are
  * bit-identical by construction.
  *
  * [[Int8CosineQ]] (`int8_cos_q(q8, qv)`) — search-side: the stage-1
  * score dot(q8, qv)/‖q8‖ in one fused loop with the SAME sequential
  * IEEE accumulation order as the HOF form
  * (`aggregate(zip_with(q8, qv, (a, b) -> a * b), 0D, ...)` /
  * `greatest(sqrt(aggregate(q8, ...)), 1e-12D)`), so stored-index scores
  * equal derived scores to the bit and candidate sets cannot drift.
  * ‖qv‖ is constant per query — rank-invariant, omitted (the rerank
  * stage computes the true cosine).
  */
case class PackInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pack_int8 requires ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) { val ab = math.abs(v.getDouble(i)); if (ab > mx) mx = ab; i += 1 }
    val scale = 127.0 / math.max(mx, 1e-12)
    val out = new Array[Byte](n)
    i = 0
    // HALF_UP (away from zero), matching Spark SQL round(): Math.round
    // rounds half toward +inf and would differ on negative ties
    while (i < n) {
      val x = v.getDouble(i) * scale
      out(i) = (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val mx = ctx.freshName("mx")
      val ab = ctx.freshName("ab")
      val scale = ctx.freshName("scale")
      val out = ctx.freshName("out")
      s"""
         |int $n = $v.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $ab = java.lang.Math.abs($v.getDouble($i));
         |  if ($ab > $mx) $mx = $ab;
         |}
         |double $scale = 127.0 / java.lang.Math.max($mx, 1e-12);
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double ${ab}x = $v.getDouble($i) * $scale;
         |  $out[$i] = (byte) (${ab}x >= 0
         |    ? java.lang.Math.floor(${ab}x + 0.5) : java.lang.Math.ceil(${ab}x - 0.5));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PackInt8 =
    copy(child = newChild)
}

case class Int8CosineQ(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"int8_cos_q requires (BINARY, ARRAY<DOUBLE>), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[ArrayData]
    if (x.length != y.numElements()) return null
    var dot = 0.0; var nx = 0.0
    var i = 0
    while (i < x.length) {
      val xi = x(i).toDouble
      dot += xi * y.getDouble(i)
      nx += xi * xi
      i += 1
    }
    dot / math.max(math.sqrt(nx), 1e-12)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val xi = ctx.freshName("xi")
      s"""
         |if ($x.length != $y.numElements()) { ${ev.isNull} = true; } else {
         |  double $dot = 0.0; double $nx = 0.0;
         |  for (int $i = 0; $i < $x.length; $i++) {
         |    double $xi = (double) $x[$i];
         |    $dot += $xi * $y.getDouble($i);
         |    $nx += $xi * $xi;
         |  }
         |  ${ev.value} = $dot / java.lang.Math.max(java.lang.Math.sqrt($nx), 1e-12);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8CosineQ =
    copy(left = newLeft, right = newRight)
}

/** Symmetric int8 cosine: both sides are packed q8 codes. Used by the
  * LSH candidate PREFILTER ([[graft.operators.SimilarityQueries
  * .lshCosinePairs]]): quantized cosine differs from the true cosine by
  * at most ε = 4√d/254 (each dequantized coordinate is within half a
  * quantization step mx/254 of the truth, ‖a‖ ≥ mx, and the unit-vector
  * perturbation bound ‖x̂/‖x̂‖ − x/‖x‖‖ ≤ 2‖x̂−x‖/‖x‖ applies per side),
  * so `int8_cos_qq(qa, qb) ≥ τ − ε` is a CONSERVATIVE test — it can
  * never reject a pair whose true cosine reaches τ, while random
  * candidates (cosine ~ N(0, 1/√d)) sit many σ below the cut.
  */
case class Int8CosineQQ(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"int8_cos_qq requires (BINARY, BINARY), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) return null
    var dot = 0L; var nx = 0L; var ny = 0L
    var i = 0
    while (i < x.length) {
      val xi = x(i).toLong; val yi = y(i).toLong
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot.toDouble / math.max(math.sqrt(nx.toDouble) * math.sqrt(ny.toDouble), 1e-12)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($x.length != $y.length) { ${ev.isNull} = true; } else {
         |  long $dot = 0L; long $nx = 0L; long $ny = 0L;
         |  for (int $i = 0; $i < $x.length; $i++) {
         |    long $xi = (long) $x[$i]; long $yi = (long) $y[$i];
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  ${ev.value} = (double) $dot / java.lang.Math.max(
         |    java.lang.Math.sqrt((double) $nx) * java.lang.Math.sqrt((double) $ny), 1e-12);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8CosineQQ =
    copy(left = newLeft, right = newRight)
}

object Int8Ops {
  private[graft] val injections
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("pack_int8"),
      new ExpressionInfo(classOf[PackInt8].getName, "pack_int8"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "pack_int8 takes 1 argument")
        PackInt8(children.head)
      }),
    (FunctionIdentifier("int8_cos_q"),
      new ExpressionInfo(classOf[Int8CosineQ].getName, "int8_cos_q"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "int8_cos_q takes 2 arguments")
        Int8CosineQ(children.head, children(1))
      }),
    (FunctionIdentifier("int8_cos_qq"),
      new ExpressionInfo(classOf[Int8CosineQQ].getName, "int8_cos_qq"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "int8_cos_qq takes 2 arguments")
        Int8CosineQQ(children.head, children(1))
      }))

  /** Register `pack_int8`, `int8_cos_q`, `int8_cos_qq` (idempotent). */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (id, info, b) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, b)
    }
}
