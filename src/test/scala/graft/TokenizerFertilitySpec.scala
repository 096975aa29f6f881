package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c110 tokenizer-fertility comparison.
  *
  * The q_c49 fusion discipline applied to the tokenizer families: each
  * family's fused corpus total must equal the standalone encode query's
  * per-document column summed (same session-memoized model via the
  * shared registerCounter entry points — a drift here would mean the
  * comparison scores different models than the ones q_c34/q_c40/q_c43
  * report). Plus the two structural bounds every whole-word subword
  * tokenizer satisfies: at least one token per word, at most one token
  * per character.
  */
class TokenizerFertilitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-fertility-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("fused totals == standalone encode queries; structural bounds hold") {
    val rows = SparkEntry.queries("q_c110_tokenizer_fertility")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    def standaloneSum(q: String, tokenCol: Int): Long =
      SparkEntry.queries(q)(spark, sf).collect().map(_.getLong(tokenCol)).sum
    val standalone = Map(
      "bpe" -> standaloneSum("q_c34_bpe_encode", 3),
      "unigram" -> standaloneSum("q_c40_unigram_encode", 3),
      "wordpiece" -> standaloneSum("q_c43_wordpiece_encode", 3))
    graft.core.CachedRdds.drain()
    assert(rows.nonEmpty && rows.map(_._2).distinct.sorted ==
      Seq("bpe", "unigram", "wordpiece"))
    for ((fam, g) <- rows.groupBy(_._2))
      assert(g.map(_._6).sum == standalone(fam),
        s"$fam fused total must equal the standalone encode query's sum")
    for ((src, fam, _, nWords, nChars, nToks, perKword) <- rows) {
      assert(nToks >= nWords && nToks <= nChars,
        s"($src,$fam): one-per-word / one-per-char bounds")
      assert(perKword == nToks * 1000 / nWords && perKword >= 1000,
        s"($src,$fam): fertility arithmetic")
    }
  }
}
