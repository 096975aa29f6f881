package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native trained-WordPiece encoder: total token count of an
  * ARRAY<STRING> of words under a LEARNED vocabulary, using the published
  * BERT inference rule — GREEDY LONGEST-MATCH per position, continuation
  * positions matching against `##`-prefixed pieces, and a word with ANY
  * unmatchable position mapping to a SINGLE [UNK] token (BERT's
  * WordpieceTokenizer replaces the whole word, it does not skip
  * characters). (WordPiece inference is longest-match against the final
  * vocabulary, not a replay of the training merges — the documented
  * asymmetry vs BPE.)
  *
  * The vocabulary is driver-held model state carried as a constructor
  * parameter (the [[BpeEncodeTokens]] pattern); the hot loop probes a
  * HashSet from the longest candidate down, so a word costs
  * O(len · maxPieceLen) with zero allocation.
  */
case class WordPieceCountTokens(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_count requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val table: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(s.add)
    s
  }

  /** Longest piece body length (chars after any ## prefix). */
  @transient private lazy val maxBody: Int =
    if (vocab.isEmpty) 1
    else vocab.iterator.map(v => if (v.startsWith("##")) v.length - 2 else v.length).max

  def countWord(word: String): Long = {
    val n = word.length
    if (n == 0) return 0L
    var i = 0
    var cnt = 0L
    while (i < n) {
      val prefix = if (i == 0) "" else "##"
      var m = math.min(maxBody, n - i)
      var adv = 0
      while (adv == 0 && m >= 1) {
        if (table.contains(prefix + word.substring(i, i + m))) adv = m
        else m -= 1
      }
      if (adv == 0) return 1L // BERT rule: the WHOLE word becomes one [UNK]
      cnt += 1L
      i += adv
    }
    cnt
  }

  def countAll(words: ArrayData): Long = {
    var total = 0L
    var i = 0
    val n = words.numElements()
    while (i < n) {
      if (!words.isNullAt(i)) total += countWord(words.getUTF8String(i).toString)
      i += 1
    }
    total
  }

  override def nullSafeEval(a: Any): Any = countAll(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpEncoder", this, classOf[WordPieceCountTokens].getName)
    nullSafeCodeGen(ctx, ev, words => s"${ev.value} = $ref.countAll($words);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceCountTokens =
    copy(child = newChild)
}

object WordPieceCountTokens {
  /** Register `wordpiece_count_<hash>(words)` bound to THIS vocabulary
    * (content-hashed name; idempotent re-registration). Returns the
    * registered function name.
    */
  def register(spark: org.apache.spark.sql.SparkSession, vocab: Seq[String]): String = {
    import scala.util.hashing.MurmurHash3
    import graft.core.ContentId
    val h = ContentId.hex64(
      MurmurHash3.orderedHash(vocab, ContentId.SeedA),
      MurmurHash3.orderedHash(vocab, ContentId.SeedB))
    val name = s"wordpiece_count_$h"
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WordPieceCountTokens].getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"$name takes 1 argument")
        WordPieceCountTokens(children.head, vocab)
      })
    name
  }
}
