package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: sign-random-projection (hyperplane) LSH
  * signature of a DOUBLE vector — `bits` sign bits packed into one LONG.
  *
  * Hyperplane j is a deterministic Rademacher (±1) vector derived from
  * splitmix64(seed, j, i) — no stored projection matrix, so executors
  * need zero side data and the expression stays inside whole-stage
  * codegen (one static call per row, tight JIT'd loop). Bit j is set iff
  * dot(v, h_j) >= 0.
  *
  * LSH contract (Goemans–Williamson / Charikar SimHash for vectors):
  * P[bit match] = 1 − θ/π. Banded into b bands of r rows, a pair with
  * cosine ≥ τ collides in ≥1 band with prob 1 − (1 − p^r)^b; the q_c4
  * parameters (r=4, b=16) give a miss probability ≤ 4.3e-6 at τ=0.90 —
  * verified empirically against the exhaustive oracle at sf0.01/sf0.1.
  */
case class HyperplaneSignature(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if bits >= 1 && bits <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(s"hyperplane_sig bits must be in [1,64], got $bits")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"hyperplane_sig requires ARRAY<DOUBLE>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    HyperplaneSignature.compute(a.asInstanceOf[ArrayData], bits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneSignature.compute($c, $bits, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}

object HyperplaneSignature {

  /** splitmix64 finalizer — a strong, allocation-free bit mixer. */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Shared scalar kernel (interpreted eval AND generated code call this). */
  def compute(x: ArrayData, bits: Int, seed: Long): Long = {
    val n = x.numElements()
    var sig = 0L
    var j = 0
    while (j < bits) {
      val base = seed + j.toLong * 0x100000001b3L
      var acc = 0.0
      var i = 0
      while (i < n) {
        // Rademacher weight ±1 from one mixed bit per (hyperplane, dim)
        val w = if ((mix(base + i) & 1L) == 0L) 1.0 else -1.0
        acc += w * x.getDouble(i)
        i += 1
      }
      if (acc >= 0.0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  private val info = new ExpressionInfo(
    classOf[HyperplaneSignature].getName, "hyperplane_sig")

  /** Register `hyperplane_sig(vec, bits, seed)` (idempotent); bits/seed
    * must be literals.
    */
  private[graft] val injection
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hyperplane_sig"),
    info,
    (children: Seq[Expression]) => {
      require(children.length == 3, "hyperplane_sig takes (vec, bits, seed)")
      val bits = children(1).eval().asInstanceOf[Number].intValue()
      val seed = children(2).eval().asInstanceOf[Number].longValue()
      HyperplaneSignature(children.head, bits, seed)
    })

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      injection._1, injection._2, injection._3)
}
