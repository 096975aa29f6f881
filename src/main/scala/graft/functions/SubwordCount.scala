package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: greedy longest-match subword (BPE-style) token count
  * of a document against the fixed merge vocabulary [[SubwordCount.vocab]].
  *
  * Semantics are EXACTLY q_c22's higher-order-function form (TextQueries
  * `subwordCountExpr`, kept as the SQL twin): lowercase, split on single
  * spaces, and per word scan left-to-right consuming the longest vocab
  * entry matching at the cursor (one character when none matches),
  * counting consumed units. That HOF evaluates an interpreted
  * `filter(vocab, v -> substring(w, pos, len(v)) = v)` lambda at every
  * character position — 66 substring probes × lambda dispatch per char,
  * the round-10 bench's single most expensive query (13.1 s at sf0.1).
  * This expression compiles the same scan to a single byte-level pass with
  * a first-byte-indexed vocab table (the NearestCells model-constant
  * pattern), staying inside whole-stage codegen.
  *
  * Equivalence argument for the byte-level pass:
  *   - the vocab is pure ASCII and UTF-8 is self-synchronizing
  *     (continuation bytes are ≥ 0x80), so an ASCII byte sequence matches
  *     at a codepoint boundary iff the corresponding CHARACTER substring
  *     matches — identical to the HOF's `substring` probe;
  *   - no vocab entry contains a space, so a candidate match can never
  *     span the ' ' word delimiter — the per-word split collapses into one
  *     pass over the whole lowered string with space bytes skipped;
  *   - a non-match consumes one full codepoint (lead byte + continuation
  *     bytes), mirroring the HOF's advance-by-one-character fallback, so
  *     multi-byte text (e.g. the zh documents) counts identically.
  */
case class SubwordCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"subword_count requires STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SubwordCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SubwordCount$$.MODULE$$.count($c)")

  override protected def withNewChildInternal(newChild: Expression): SubwordCount =
    copy(child = newChild)
}

object SubwordCount {

  /** Greedy longest-match merge vocabulary (lengths 4 → 2): a fixed public
    * list of frequent English character merges; single characters are the
    * implicit fallback unit. Driver-side model constants compiled into the
    * expression — no broadcast join, no shuffle, no UDF.
    */
  val vocab: Seq[String] = Seq(
    "tion", "ment", "ther", "with", "that",
    "the", "ing", "and", "ent", "ion", "for", "ter", "ate", "est", "ers", "res",
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd", "ti", "es",
    "or", "te", "of", "ed", "is", "it", "al", "ar", "st", "to", "nt", "ng",
    "se", "ha", "as", "ou", "io", "le", "ve", "co", "me", "de", "hi", "ri",
    "ro", "ic", "ne", "ea", "ra", "ce", "li", "ch", "ll", "be", "ma", "si",
    "om", "ur")

  /** First-byte-indexed candidate table, each bucket length-descending so
    * the first hit IS the greedy longest match (≤ 7 candidates per bucket
    * vs 66 probes/char in the HOF form).
    */
  private val table: Array[Array[Array[Byte]]] = {
    val t = Array.fill(128)(Array.empty[Array[Byte]])
    vocab.groupBy(_.charAt(0)).foreach { case (c, vs) =>
      t(c.toInt) = vs.sortBy(v => (-v.length, v)).map(_.getBytes("UTF-8")).toArray
    }
    t
  }

  /** The full scan; called from both interpreted eval and generated code
    * (one monomorphic static call per row — the work stays compiled).
    */
  def count(s: UTF8String): Long = {
    val b = s.toLowerCase.getBytes
    val n = b.length
    var i = 0
    var cnt = 0L
    while (i < n) {
      val c = b(i)
      if (c == ' ') i += 1
      else {
        var adv = 0
        if (c >= 0) { // ASCII lead byte: vocab candidates exist only here
          val cands = table(c)
          var k = 0
          while (adv == 0 && k < cands.length) {
            val v = cands(k)
            val m = v.length
            if (i + m <= n) {
              var p = 1 // byte 0 equals c by bucket construction
              while (p < m && b(i + p) == v(p)) p += 1
              if (p == m) adv = m
            }
            k += 1
          }
        }
        if (adv == 0) {
          // consume one codepoint: lead byte + UTF-8 continuation bytes
          adv = 1
          while (i + adv < n && (b(i + adv) & 0xC0) == 0x80) adv += 1
        }
        cnt += 1L
        i += adv
      }
    }
    cnt
  }

  private[graft] val injection
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("subword_count"),
    new ExpressionInfo(classOf[SubwordCount].getName, "subword_count"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "subword_count takes 1 argument")
      SubwordCount(children.head)
    })

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      injection._1, injection._2, injection._3)
}
