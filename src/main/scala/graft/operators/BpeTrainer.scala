package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary induction (Sennrich et al. 2016) — the full
  * multi-round trainer, not just one round's statistics (q_c32 is the
  * single-round counting query with a DuckDB oracle; this is the
  * fixpoint loop that consumes it).
  *
  * Shape per merge round, and why it scales (the q_c13 star-CC / q_c9
  * Lloyd discipline — driver holds MODEL state only, never data):
  *   1. pair statistics over the WORD-FREQUENCY table — explode adjacent
  *      symbol pairs weighted by word frequency, one Heaps-law-bounded
  *      shuffle on the pair key;
  *   2. argmax = orderBy(count desc, pair).limit(1) — ONE ROW reaches
  *      the driver (the learned merge, i.e. model parameters);
  *   3. re-encode: a codegen-friendly HOF fold applies the merge
  *      greedily left-to-right inside each word's symbol array — a pure
  *      projection over the vocabulary table, no shuffle.
  * The corpus is touched exactly once (the initial tokenize + word
  * count); every round after runs over the vocabulary — which is why
  * BPE training is tractable at 100 TB.
  *
  * The greedy fold: accumulator (out, prev); on symbol s, if
  * (prev, s) == (x, y) emit the merged token and clear prev (so 'aaa'
  * under (a,a) yields [aa, a] and 'abab' under (a,b) yields [ab, ab] —
  * exactly the standard non-overlapping left-to-right scan), else flush
  * prev and hold s. BpeTrainerSpec proves the engine's merge SEQUENCE
  * and counts identical to an independent Scala reference on the driver
  * corpora.
  */
object BpeTrainer {

  final case class Merge(rank: Int, left: String, right: String,
                         merged: String, n_occurrences: Long)

  /** Greedy non-overlapping application of merge (x, y) → `merged` to a
    * symbol array, as a single fold expression (no UDF). `merged`
    * defaults to plain concatenation (BPE); WordPiece passes the
    * continuation-stripped form.
    */
  private[operators] def applyMerge(syms: Column, x: String, y: String,
      merged: String = null): Column = {
    val m = if (merged == null) x + y else merged
    val init = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("prev"))
    aggregate(
      syms,
      init,
      (acc, s) =>
        when(acc("prev") === lit(x) && s === lit(y),
          struct(
            array_append(acc("out"), lit(m)).as("out"),
            lit(null).cast("string").as("prev")))
          .otherwise(struct(
            when(acc("prev").isNull, acc("out"))
              .otherwise(array_append(acc("out"), acc("prev"))).as("out"),
            s.as("prev"))),
      acc =>
        when(acc("prev").isNull, acc("out"))
          .otherwise(array_append(acc("out"), acc("prev"))))
  }

  /** The corpus's word-frequency table split into initial char symbols. */
  private def initialSymbols(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents")
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wf"))
      .select(col("wf"), expr("filter(split(word, ''), c -> c <> '')").as("syms"))

  // learned merges are pure model data (a tiny Seq, not bound to any
  // session), so q_c33/q_c34/q_c35 share one training run per
  // (dir, nMerges) instead of each retraining identical merges; the
  // content snapshot (metadata-only listing, the SessionMemo discipline)
  // invalidates on regeneration. Test hook: [[clearModelCache]].
  // BuildOnceCache holds the lock ACROSS the build so two concurrent
  // first callers share one training run instead of duplicating it.
  private val modelCache =
    new graft.core.BuildOnceCache[(String, Int), Seq[Merge]]

  private[graft] def clearModelCache(): Unit = modelCache.clear()

  /** Learn `nMerges` merges (cached per (dir, nMerges) + content
    * snapshot). Each round materializes one 1-row argmax on the driver;
    * the evolving symbol table stays distributed (persisted per round,
    * predecessor unpersisted).
    */
  def train(s: SparkSession, d: String, nMerges: Int): Seq[Merge] = {
    val snap = graft.core.SessionMemo.snapshot(s, Seq(s"$d/documents.parquet"))
    modelCache.getOrBuild((d, nMerges), snap)(trainUncached(s, d, nMerges))
  }

  private def trainUncached(s: SparkSession, d: String, nMerges: Int): Seq[Merge] = {
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    // the per-round stats run over the VOCABULARY (Heaps-bounded, tiny
    // relative to any corpus): AQE's per-stage materialization would cost
    // ~3 scheduler jobs per round for re-planning that has nothing to
    // re-plan (measured 50 → 17 jobs for 15 rounds). Restored after the
    // loop; the conf is read per-query so nothing else is affected.
    val aqeWas = s.conf.get("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    var syms = initialSymbols(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CachedRdds.registerDf(syms)
    // predecessor frames unpersist one round late: round k's argmax
    // materializes syms_k FROM syms_{k-1}'s cache, after which
    // syms_{k-1} is dead — eager unpersist keeps the loop's storage
    // footprint at two vocab frames instead of nMerges
    var prevSyms: Option[DataFrame] = None
    var k = 1
    var done = false
    while (k <= nMerges && !done) {
      val top = syms
        .filter(size(col("syms")) >= 2)
        .select(col("wf"), explode(expr(
          "transform(sequence(1, size(syms) - 1)," +
            " i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wf")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      // the collect above materialized the current syms; its parent is
      // no longer reachable by any future round
      prevSyms.foreach(_.unpersist(false))
      prevSyms = None
      if (top.isEmpty) done = true
      else {
        val (x, y, cnt) =
          (top(0).getAs[String]("l"), top(0).getAs[String]("r"), top(0).getAs[Long]("cnt"))
        merges += Merge(k, x, y, x + y, cnt)
        val next = syms
          .select(col("wf"), applyMerge(col("syms"), x, y).as("syms"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        graft.core.CachedRdds.registerDf(next)
        prevSyms = Some(syms)
        syms = next
        k += 1
      }
    }
    merges.toSeq
    } finally s.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  /** The trainer as a registered query: the learned merge table. The
    * fixpoint's argmax-per-round is driver-held model state (the q_c9
    * Lloyd precedent), so there is no single-SQL oracle — rows-only
    * driver check; BpeTrainerSpec carries the correctness burden against
    * an independent reference implementation.
    */
  def mergesDf(s: SparkSession, d: String, nMerges: Int = 15): DataFrame = {
    import s.implicits._
    train(s, d, nMerges)
      .toDF("rank", "left", "right", "merged", "n_occurrences")
      .orderBy(col("rank"))
  }

  /** q_c34: per-document token counts under the TRAINED tokenizer —
    * train the merges (driver model state), then one map-side projection
    * over the corpus counts whitespace words, raw chars, and BPE tokens
    * per document, plus the compression ratio in exact decimal. The
    * tokenizer rides into the projection as the codegen'd
    * [[graft.functions.BpeEncodeTokens]] expression carrying the merge
    * list as reference state (the q_c9 centroid-matrix pattern — a
    * nested-HOF fold was 37× slower, see the expression's scaladoc).
    * Like q_c33, model state ⇒ rows-only driver check, with
    * BpeTrainerSpec proving the encoder token-identical to the
    * reference.
    */
  def encodedCounts(s: SparkSession, d: String, nMerges: Int = 15): DataFrame = {
    import graft.core.Decimals._
    val fn = registerCounter(s, d, nMerges)
    Tables(s, d, "documents")
      .select(col("doc_id"),
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("words"))
      .select(
        col("doc_id"),
        size(col("words")).cast("long").as("n_words"),
        expr("aggregate(words, 0L, (a, w) -> a + length(w))").as("n_chars"),
        expr(s"$fn(words)").as("n_bpe_tokens"))
      .select(
        col("doc_id"), col("n_words"), col("n_chars"), col("n_bpe_tokens"),
        emit(
          when(col("n_bpe_tokens") === 0, lit(0).cast(D38))
            .otherwise((dec(col("n_chars")) / dec(col("n_bpe_tokens"))).cast(D38)))
          .as("chars_per_token"))
      .orderBy(col("doc_id"))
  }

  /** Train (memoized) and register the model-bound token counter —
    * returns the function name. ONE entry point shared by
    * [[encodedCounts]] and q_c110's fused fertility scan, so every
    * consumer counts with the SAME trained model.
    */
  def registerCounter(s: SparkSession, d: String, nMerges: Int = 15): String =
    graft.functions.BpeEncodeTokens.register(
      s, train(s, d, nMerges).map(m => (m.left, m.right)))

  /** q_c35: BPE-dropout encoding (Provilkov et al. 2020 subword
    * regularization — deterministic per-seed variant, see
    * [[graft.functions.BpeEncodeTokens]]): the SAME trained tokenizer
    * encodes each document twice, deterministically (p=0) and with 10 %
    * merge dropout (seed 7), emitting both token counts and the
    * inflation the regularization buys. One map-side projection over the
    * corpus; model state ⇒ rows-only; BpeTrainerSpec proves the dropout
    * encoder reference-identical and the inflation invariant
    * (dropout count ≥ deterministic count per doc, > overall).
    */
  def dropoutCounts(s: SparkSession, d: String, nMerges: Int = 15,
      permille: Int = 100, seed: Long = 7L): DataFrame = {
    import graft.core.Decimals._
    val merges = train(s, d, nMerges).map(m => (m.left, m.right))
    val det = graft.functions.BpeEncodeTokens.register(s, merges)
    val drop = graft.functions.BpeEncodeTokens.register(s, merges, permille, seed)
    Tables(s, d, "documents")
      .select(col("doc_id"),
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("words"))
      .select(
        col("doc_id"),
        expr(s"$det(words)").as("n_tokens_det"),
        expr(s"$drop(words)").as("n_tokens_dropout"))
      .select(
        col("doc_id"), col("n_tokens_det"), col("n_tokens_dropout"),
        emit(
          when(col("n_tokens_det") === 0, lit(0).cast(D38))
            .otherwise((dec(col("n_tokens_dropout")) / dec(col("n_tokens_det"))).cast(D38)))
          .as("inflation"))
      .orderBy(col("doc_id"))
  }
}
