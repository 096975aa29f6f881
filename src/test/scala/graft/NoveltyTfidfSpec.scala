package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for q_c54 (tf-idf doc similarity) and q_c55 (n-gram
  * novelty) on a purpose-built corpus where the right answers are known
  * by construction — the DuckDB oracle proves engine parity, these prove
  * the queries measure what they claim.
  */
class NoveltyTfidfSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-novelty-tfidf-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-nt").toString
    val s = spark
    import s.implicits._
    // doc 0: the query-panel doc (0 % 500 == 0). doc 3 shares most of its
    // vocabulary; doc 7 is disjoint. doc 5 is an exact copy of doc 1
    // (novelty 0); doc 6 is doc 1 plus fresh tail text (novelty in (0,1)).
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq(
      (0L, s"$base lambda mu"),
      (1L, "one two three four five six seven eight nine ten"),
      (3L, s"$base lambda nu"),
      (5L, "one two three four five six seven eight nine ten"),
      (6L, "one two three four five six seven eight nine ten fresh words never seen before anywhere at all"),
      (7L, "completely different vocabulary with nothing shared here today")
    ).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.core.LocalArtifacts.deleteRecursively(dir)
  }

  test("q_c55: exact copy of an earlier doc scores 0; first occurrence scores 1; partial copy in between") {
    val rows = SparkEntry.queries("q_c55_ngram_novelty")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 1: all its 8-grams first occur there (doc 5/6 copies come later)
    assert(rows(1L)._3 === 1.0, s"first occurrence must be fully novel: ${rows(1L)}")
    // doc 5: byte-identical to doc 1 -> zero novelty
    assert(rows(5L)._3 === 0.0, s"exact later copy must score 0: ${rows(5L)}")
    assert(rows(5L)._1 > 0, "copy still has grams")
    // doc 6: copied prefix + fresh tail -> strictly between
    assert(rows(6L)._3 > 0.0 && rows(6L)._3 < 1.0,
      s"partial copy must land strictly between: ${rows(6L)}")
    assert(rows(6L)._2 < rows(6L)._1)
    // doc 7: short (fewer than 8 tokens is false here: 9 tokens) — fully novel
    assert(rows(7L)._3 === 1.0)
    // every doc from the table appears exactly once
    assert(rows.keySet === Set(0L, 1L, 3L, 5L, 6L, 7L))
  }

  test("q_c54: the near-identical document ranks first for the panel doc; disjoint docs never appear") {
    val rows = SparkEntry.queries("q_c54_tfidf_similarity")(spark, dir).collect()
    val forQ0 = rows.filter(_.getLong(0) == 0L)
      .sortBy(_.getLong(3)).map(r => (r.getLong(1), r.getDouble(2)))
    assert(forQ0.nonEmpty, "panel doc 0 must produce rankings")
    // doc 3 shares 11 of 12 terms with doc 0 — must rank first
    assert(forQ0.head._1 === 3L,
      s"near-identical doc must rank first, got ${forQ0.toSeq}")
    // 11/12 shared terms but the two docs' UNIQUE terms carry the highest
    // idf (df=1 vs df=2), so the cosine lands ~0.8, not ~1 — exactly the
    // rare-term emphasis tf-idf exists for
    assert(forQ0.head._2 > 0.5, s"near-identical similarity should be high: ${forQ0.head}")
    // docs sharing no term with doc 0 (1, 5, 6, 7) can never appear:
    // the dot is over shared terms only
    val ranked = forQ0.map(_._1).toSet
    assert(ranked.intersect(Set(1L, 5L, 6L, 7L)).isEmpty,
      s"term-disjoint docs must not rank: $ranked")
    // self is excluded
    assert(!ranked.contains(0L))
  }
}
