package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native expression: |a ∩ b| for two SORTED string arrays via a single
  * O(n+m) merge pass — the PPJoin verify-step kernel. `array_intersect`
  * builds a hash set per row; on the similarity verify path (hundreds of
  * thousands of candidate pairs × ~300-element gram arrays) the merge is
  * the difference between the verify step being free and being the
  * bottleneck.
  *
  * PRECONDITION: both arrays sorted ascending with distinct elements
  * (as produced by `sort_array(collect_list(...))` over distinct rows);
  * unsorted input gives an undercount, so this is a library/internal
  * function, not a general SQL surface.
  */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _ => StringType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(t: DataType): Option[DataType] = t match {
      case ArrayType(et @ (StringType | LongType | IntegerType), _) => Some(et)
      case _ => None
    }
    (elem(left.dataType), elem(right.dataType)) match {
      // compare element types only — containsNull flags may differ
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"intersect_count_sorted requires two ARRAY<STRING>, two ARRAY<INT> or " +
          s"two ARRAY<BIGINT> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0L
    val et = elemType
    while (i < n && j < m) {
      val cmp = et match {
        case LongType => java.lang.Long.compare(x.getLong(i), y.getLong(j))
        case IntegerType => java.lang.Integer.compare(x.getInt(i), y.getInt(j))
        case _ => x.getUTF8String(i).compareTo(y.getUTF8String(j))
      }
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val cmpExpr = elemType match {
        case LongType => s"java.lang.Long.compare($x.getLong($i), $y.getLong($j))"
        case IntegerType => s"java.lang.Integer.compare($x.getInt($i), $y.getInt($j))"
        case _ => s"$x.getUTF8String($i).compareTo($y.getUTF8String($j))"
      }
      s"""
         |int $n = $x.numElements(); int $m = $y.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $n && $j < $m) {
         |  int $cmp = $cmpExpr;
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountSorted =
    copy(left = newLeft, right = newRight)
}

object IntersectCountSorted {
  private[graft] val injection
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("intersect_count_sorted"),
    new ExpressionInfo(classOf[IntersectCountSorted].getName, "intersect_count_sorted"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "intersect_count_sorted takes 2 arguments")
      IntersectCountSorted(children.head, children(1))
    })

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      injection._1, injection._2, injection._3)
}
