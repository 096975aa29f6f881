package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic Bloom-filter membership as a codegen'd Catalyst
  * expression over an md5-hex key column.
  *
  * The INGESTION-DEDUP scale pattern (q_c61): the retained corpus's key
  * set is summarized into m bits ONCE (driver-held, bounded by m — never
  * by corpus size), and an incoming batch is prefiltered map-side before
  * the exact confirm join, so bloom-negative rows (provably-new
  * documents — a Bloom filter has NO false negatives) never reach a
  * shuffle at all. Spark's own `bloomFilter`/runtime-filter machinery is
  * deliberately not used: its hash mixture is engine-private, so results
  * could never be pinned against an independent oracle. This filter's
  * hash family is the double-hashing construction from the md5 the
  * dedup already computes — position_i = (h1 + i·h2) mod m with h1/h2
  * the first two 48-bit words of the hex digest — reproducible in plain
  * SQL by any engine (the DuckDB oracle and the Spark-SQL twin both
  * derive it relationally; BloomParitySpec pins expression ≡ SQL).
  *
  * Reference-state pattern (NearestCells/BpeEncode): the bit array rides
  * inside the expression, registered per model under a 64-bit content-id
  * name.
  */
case class BloomMaybeContains(child: Expression, bits: Array[Long], mBits: Int, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType
        if mBits > 0 && mBits % 64 == 0 && bits.length == mBits / 64 && k >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure(
        s"bloom_maybe_contains: bad shape (|bits|=${bits.length} longs, m=$mBits, k=$k)")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"bloom_maybe_contains requires STRING (md5 hex), got ${t.catalogString}")
  }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(a: Any): Any =
    BloomFilterOps.maybeContains(a.asInstanceOf[UTF8String], bits, mBits, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomFilterOps.maybeContains($c, $b, $mBits, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMaybeContains =
    copy(child = newChild)
}

object BloomFilterOps {

  /** Parse `len` hex chars of a UTF8String starting at byte `off` into a
    * non-negative Long (the conv(substr(h, off+1, len), 16, 10) the SQL
    * derivations use). md5 output is lowercase hex; uppercase accepted
    * for symmetry with conv's tolerance.
    */
  def hexWord(s: UTF8String, off: Int, len: Int): Long = {
    val bytes = s.getBytes
    var v = 0L
    var i = 0
    while (i < len) {
      val c = bytes(off + i)
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else throw new IllegalArgumentException(
          s"bloom key is not hex at byte ${off + i}: ${s.toString}")
      v = (v << 4) | d
      i += 1
    }
    v
  }

  /** Double-hashing position stream over the two 48-bit digest words. */
  def position(h1: Long, h2: Long, i: Int, mBits: Int): Int =
    ((h1 + i.toLong * h2) % mBits).toInt

  def maybeContains(key: UTF8String, bits: Array[Long], mBits: Int, k: Int): Boolean = {
    val h1 = hexWord(key, 0, 12)
    val h2 = hexWord(key, 12, 12)
    var i = 0
    while (i < k) {
      val p = position(h1, h2, i, mBits)
      if ((bits(p >> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  private def setBit(bits: Array[Long], p: Int): Unit =
    bits(p >> 6) |= 1L << (p & 63)

  /** Build the bit array from a single-STRING-column frame of md5-hex
    * keys. Each partition folds its keys into a LOCAL m-bit array and
    * the partials OR together up a tree — the corpus never shuffles and
    * the driver holds exactly m bits regardless of corpus size (the
    * bounded-model-state class: 128 KiB at the default m = 2^20).
    */
  def build(keys: DataFrame, mBits: Int, k: Int): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0, s"m must be a multiple of 64, got $mBits")
    val words = mBits / 64
    // NULL keys (md5 of a NULL document) carry no membership information:
    // the expression side returns NULL for them too, so dropping them
    // here keeps build and probe consistent instead of NPE-ing the fold
    keys.select(keys.columns.head)
      .where(org.apache.spark.sql.functions.col(keys.columns.head).isNotNull)
      .rdd
      .treeAggregate(new Array[Long](words))(
        seqOp = (acc, row) => {
          val key = UTF8String.fromString(row.getString(0))
          val h1 = hexWord(key, 0, 12)
          val h2 = hexWord(key, 12, 12)
          var i = 0
          while (i < k) { setBit(acc, position(h1, h2, i, mBits)); i += 1 }
          acc
        },
        combOp = (a, b) => {
          var i = 0
          while (i < a.length) { a(i) |= b(i); i += 1 }
          a
        })
  }

  /** Register `bloom_maybe_<id>(key)` bound to THIS bit array and return
    * the generated name. 64-bit content id over the bits (the
    * WordPieceEncode collision-hardening convention) so two filters in
    * one session never alias.
    */
  def register(spark: SparkSession, bits: Array[Long], mBits: Int, k: Int): String = {
    import scala.util.hashing.MurmurHash3
    import graft.core.ContentId
    val h = ContentId.hex64(
      MurmurHash3.mix(MurmurHash3.arrayHash(bits, ContentId.SeedA), mBits * 31 + k),
      MurmurHash3.mix(MurmurHash3.arrayHash(bits, ContentId.SeedB), mBits * 31 + k))
    val name = s"bloom_maybe_$h"
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[BloomMaybeContains].getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"$name takes (key)")
        BloomMaybeContains(children.head, bits, mBits, k)
      })
    name
  }
}
