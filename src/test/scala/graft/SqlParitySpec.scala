package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkSqlQueries

/** SQL-parser/analyzer surface proof: the ENTIRE query surface runs as
  * Spark SQL text (`SparkSqlQueries.sql`) and every statement's rows equal
  * the DataFrame program's rows exactly.
  *
  * The one exclusion from the static map is q_c9_ann_ivf, whose coarse
  * quantizer is trained by driver-side Lloyd iterations — there is no SQL
  * construct that reproduces that learned floating-point state; the
  * coverage test pins the exclusion so a new query can't silently skip
  * parity. Its SEARCH phase over the trained quantizer IS SQL text
  * (`qC9SearchSql`) and gets its own parity test below, so every query's
  * data path is exercised through the parser/analyzer.
  */
class SqlParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-sqlparity-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkSqlQueries.registerAll(spark, sf)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("SQL surface covers every registered query except the pinned exclusions") {
    // q_c9: driver-trained Lloyd centroids are not SQL-expressible state
    // (its search phase has its own parity test below). q_c13/q_c19: the
    // connected-components fixpoint needs UNION-distinct recursion, which
    // Spark 4.1's recursive CTE does not support (only UNION ALL) — the
    // candidate phase is q_c1's text and the fixpoint is the iterative
    // star rewiring. q_c33: the BPE trainer's per-round argmax is
    // driver-held model state (the q_c9 class); its single-ROUND
    // statistics query q_c32 carries the SQL text. q_c39/q_c40: the
    // unigram trainer's per-round EM counts are the same driver-held
    // model-state class (UnigramTrainerSpec carries their correctness).
    // q_c53: the Misra-Gries state machine is a sequential fold, not
    // SQL; HeavyHitterReplaySpec asserts its guarantees vs exact counts
    // and streaming ≡ replay. q_c58: Greenwald-Khanna sketch state is
    // engine-specific (no DuckDB twin by design); ApproxPercentileSpec
    // gates it against q_b8's exact answers within the GK rank bound.
    assert(SparkSqlQueries.sql.keySet ==
      SparkEntry.queries.keySet
        - "q_c9_ann_ivf" - "q_c71_ivf_append" - "q_c72_ivf_drift" // Lloyd centroids = driver state
        - "q_c13_dup_clusters" - "q_c19_neardup_retained"
        - "q_c64_leakage_split" - "q_c67_softdedup_weights" // family_rep = the q_c13 CC fixpoint (same exclusion)
        - "q_c86_family_agreement" // both sides are CC fixpoints (same exclusion)
        - "q_c105_family_diameter" // audits the q_c13 CC fixpoint (same exclusion)
        - "q_c114_family_quality" // audits the q_c13 CC fixpoint (same exclusion)
        - "q_c116_quality_retained" // acts on the q_c13 CC fixpoint (same exclusion)
        - "q_c117_pipeline_funnel" // composes the q_c13 CC fixpoint (same exclusion)
        - "q_c118_funnel_corpus" // emits the q_c117 funnel (same exclusion)
        - "q_c119_quality_funnel_corpus" // q_c116's rule through the funnel (same exclusion)
        - "q_c121_funnel_mixture_drift" // aggregates the q_c117 funnel (same exclusion)
        - "q_c33_bpe_train" - "q_c34_bpe_encode" - "q_c35_bpe_dropout"
        - "q_c39_unigram_train" - "q_c40_unigram_encode"
        - "q_c42_wordpiece_train" - "q_c43_wordpiece_encode"
        - "q_c110_tokenizer_fertility" // all three model-bound counters (same exclusion)
        - "q_c130_ivf_compacted" - "q_c131_ivf_stage1" // frozen Lloyd quantizer = driver state (q_c9 class)
        - "q_c132_ivf_nprobe_frontier" // probes the same learned quantizer (same exclusion)
        - "q_c133_segment_retirement" // digests stored artifact paths, not corpus views
        - "q_c134_minhash_retirement" - "q_c135_ivf_retirement" // same exclusion (q_c133 class)
        - "q_c136_phrase_retirement" // same exclusion (q_c133 class)
        - "q_c141_retirement_gc" // acts on stored artifact paths, not corpus views (q_c133 class)
        - "q_c144_minhash_gc" - "q_c145_ivf_gc" - "q_c146_phrase_gc" // same exclusion (GC verbs)
        - "q_c148_gc_audit" // reads the four GC artifacts' journals (q_c133 class)
        - "q_c137_classifier_train" - "q_c138_classifier_scores" // learned weights = driver model state (q_c33 trainer class)
        - "q_c139_classifier_holdout" - "q_c142_classifier_test_eval" // same exclusion (trainer class)
        - "q_c143_model_drift" // scores with stored learned weights (trainer class)
        - "q_c147_retrain_on_drift" // trains + scores with learned weights (trainer class)
        - "q_c140_trained_quality_funnel" // trained weights through the q_c13 CC fixpoint (both exclusions)
        - "q_c53_heavy_hitters" - "q_c58_percentiles_approx")
  }

  for (name <- SparkSqlQueries.sql.keys.toSeq.sorted)
    test(s"$name: spark.sql(text) == DataFrame plan") {
      val sqlRows = spark.sql(SparkSqlQueries.sql(name)).collect().map(_.toString).toSeq
      val dfRows = SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
      assert(sqlRows == dfRows)
      graft.core.CachedRdds.drain()
    }

  test("q_c9_ann_ivf search phase: spark.sql(qC9SearchSql) == DataFrame plan") {
    import graft.operators.SimilarityQueries
    graft.functions.CosineSimilarity.register(spark)
    val e = SimilarityQueries.ivfCorpus(spark, sf)
    val (fn, nprobe) = SimilarityQueries.trainIvf(spark, e)
    val sqlRows = spark.sql(SparkSqlQueries.qC9SearchSql(fn, nprobe))
      .collect().map(_.toString).toSeq
    val dfRows = SimilarityQueries.ivfSearch(e, fn, nprobe)
      .collect().map(_.toString).toSeq
    assert(sqlRows.nonEmpty && sqlRows == dfRows)
  }
}
