package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenizer model (Kudo 2018, the SentencePiece unigram
  * algorithm): a piece inventory with log-probabilities, applied to words
  * by VITERBI segmentation — the segmentation maximizing the sum of piece
  * log-probs. Driver-held model state carried into executors as an
  * embedded reference object (the [[NearestCells]] / [[BpeEncodeTokens]]
  * pattern), so both the trainer's E-step and corpus encoding run the DP
  * as plain JVM array code inside whole-stage codegen — no UDF, no
  * broadcast join against the piece table.
  *
  * Determinism contract (UnigramTrainerSpec pins it against an
  * independent reference): log-probs are quantized to 10⁻⁶ (micros) at
  * model build time so every engine evaluates identical doubles; the DP
  * scans candidate split points LEFT TO RIGHT with a STRICT `>` — on an
  * exact double tie the EARLIEST split (longest piece) wins. Words are
  * the `[a-z0-9]+` token alphabet, so indexing is plain Java chars.
  * A character absent from the inventory scores [[UnigramModel.UnkLogp]]
  * (finite, so out-of-domain words still segment deterministically).
  */
final case class UnigramModel(pieces: Array[String], logpMicros: Array[Long])
    extends Serializable {

  @transient private lazy val table: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      m.put(pieces(i), logpMicros(i) / 1e6)
      i += 1
    }
    m
  }

  @transient private lazy val maxLen: Int =
    if (pieces.isEmpty) 1 else pieces.iterator.map(_.length).max

  /** Viterbi DP over one word; returns the best segmentation's pieces. */
  def segment(word: String): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val dp = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      dp(i) = Double.NegativeInfinity
      back(i) = i - 1
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val p = table.get(word.substring(j, i))
        val lp =
          if (p != null) p.doubleValue
          else if (i - j == 1) UnigramModel.UnkLogp
          else Double.NegativeInfinity
        if (lp != Double.NegativeInfinity) {
          val cand = dp(j) + lp
          if (cand > dp(i)) { dp(i) = cand; back(i) = j }
        }
        j += 1
      }
      i += 1
    }
    var cnt = 0
    var k = n
    while (k > 0) { cnt += 1; k = back(k) }
    val out = new Array[String](cnt)
    k = n
    var w = cnt - 1
    while (k > 0) {
      out(w) = word.substring(back(k), k)
      w -= 1
      k = back(k)
    }
    out
  }

  def countWord(word: String): Long = segment(word).length.toLong
}

object UnigramModel {
  /** Finite unknown-single-char score: worse than any real piece (counts
    * are smoothed, so real log-probs are ≫ −100) but never −∞, keeping
    * segmentation total and deterministic on out-of-domain input.
    */
  val UnkLogp: Double = -100.0

  /** Content hash for per-model function names — ONE definition for both
    * registered expression families (a fork between them would break the
    * "same model ⇒ same name" idempotence contract).
    */
  def contentHash(model: UnigramModel): String = {
    import scala.util.hashing.MurmurHash3
    import graft.core.ContentId
    ContentId.hex64(
      MurmurHash3.arrayHash(model.pieces, ContentId.SeedA) * 31
        + MurmurHash3.arrayHash(model.logpMicros, ContentId.SeedA),
      MurmurHash3.arrayHash(model.pieces, ContentId.SeedB) * 31
        + MurmurHash3.arrayHash(model.logpMicros, ContentId.SeedB))
  }
}

/** `STRING word → ARRAY<STRING>` best segmentation — the trainer's E-step
  * kernel (explode me, aggregate piece counts).
  */
case class UnigramSegmentPieces(child: Expression, model: UnigramModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_seg requires STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  def segmentArray(word: UTF8String): ArrayData = {
    val parts = model.segment(word.toString)
    val out = new Array[AnyRef](parts.length)
    var i = 0
    while (i < parts.length) { out(i) = UTF8String.fromString(parts(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = segmentArray(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSeg", this, classOf[UnigramSegmentPieces].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $ref.segmentArray($w);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegmentPieces =
    copy(child = newChild)
}

/** `ARRAY<STRING> words → BIGINT` total Viterbi token count — the corpus
  * encoding kernel (q_c40), mirroring [[BpeEncodeTokens]]'s shape.
  */
case class UnigramCountTokens(child: Expression, model: UnigramModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_count requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  def countAll(words: ArrayData): Long = {
    var total = 0L
    var i = 0
    val n = words.numElements()
    while (i < n) {
      if (!words.isNullAt(i)) total += model.countWord(words.getUTF8String(i).toString)
      i += 1
    }
    total
  }

  override def nullSafeEval(a: Any): Any = countAll(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramCount", this, classOf[UnigramCountTokens].getName)
    nullSafeCodeGen(ctx, ev, words => s"${ev.value} = $ref.countAll($words);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramCountTokens =
    copy(child = newChild)
}

object UnigramSegmentPieces {
  /** Register `unigram_seg_<hash>(word)` bound to THIS model (content-
    * hashed name: per-round models in one session cannot collide,
    * re-registration is idempotent). Returns the function name.
    */
  def register(spark: org.apache.spark.sql.SparkSession, model: UnigramModel): String = {
    val name = s"unigram_seg_${UnigramModel.contentHash(model)}"
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[UnigramSegmentPieces].getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"$name takes 1 argument")
        UnigramSegmentPieces(children.head, model)
      })
    name
  }
}

object UnigramCountTokens {
  def register(spark: org.apache.spark.sql.SparkSession, model: UnigramModel): String = {
    val name = s"unigram_count_${UnigramModel.contentHash(model)}"
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[UnigramCountTokens].getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"$name takes 1 argument")
        UnigramCountTokens(children.head, model)
      })
    name
  }
}
