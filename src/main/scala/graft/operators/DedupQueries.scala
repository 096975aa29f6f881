package graft.operators

import graft.core.{Decimals, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication suite over `documents` (SURVEY §2.4-B + north-star ops):
  * exact hash dedup, word-shingle Jaccard near-dup, MinHash+LSH, SimHash,
  * char-n-gram Jaccard.
  *
  * Determinism rules so DuckDB can replicate every step:
  *  - token hash = polynomial rolling hash over characters,
  *    h = fold(31·acc + ascii(c)) mod 1e9+7 — identical arithmetic in both
  *    engines (no murmur3 dependency);
  *  - Jaccard thresholds are evaluated in integer arithmetic
  *    (shared·10 ≥ union·τ10), never in floating point;
  *  - pair output is canonical (doc_a < doc_b) with total ORDER BY.
  *
  * Scale posture (100 TB): every pipeline is explode → shuffle-on-token →
  * count — no driver materialization. LSH banding keeps the candidate-pair
  * blowup bounded (only docs sharing a band collide), which is the scale
  * path; the plain shingle self-join is the small-scale/oracle-checkable
  * variant.
  */
object DedupQueries {
  import Decimals._

  /** fold of (31·acc + ascii(c)) mod 1e9+7 over the characters of `c`. */
  private def rollingHash(c: String): String =
    s"aggregate(split($c, ''), 0L, (acc, ch) -> (acc * 31 + ascii(ch)) % 1000000007L)"

  /** DuckDB twin of [[rollingHash]]. */
  private def duckRollingHash(c: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(ascii(x) AS BIGINT) for x in string_split($c, '')]), (acc, ch) -> (acc * 31 + ch) % 1000000007)"

  /** doc_id + distinct word-3-shingles. */
  private def shingles(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents")
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(
        col("doc_id"),
        explode(
          expr(
            "array_distinct(transform(sequence(0, size(toks) - 3)," +
              " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"
          )
        ).as("shingle")
      )

  private val duckShingles: String =
    """toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |ks AS (SELECT doc_id, t, unnest(range(len(t) - 2)) AS k FROM toks WHERE len(t) >= 3),
      |sh AS (SELECT DISTINCT doc_id, t[k+1] || ' ' || t[k+2] || ' ' || t[k+3] AS shingle
      |       FROM ks)""".stripMargin

  /** MinHash permutation params h_i(x) = (a_i·x + b_i) mod p. The
    * multipliers must be large and pairwise-independent-ish: small
    * correlated constants (2,3,5..) make every band collide and the LSH
    * degenerates to all-pairs. Fixed arbitrary 9-digit odd constants.
    */
  private val minhashParams: Seq[(Long, Long)] =
    Seq(
      (487198041L, 259200101L), (741932517L, 373587883L),
      (268435399L, 608135813L), (104395303L, 36028797L),
      (655360001L, 177777773L), (920419813L, 51218317L))

  val defs: Seq[QueryDef] = Seq(
    // ---- Q-B5: exact dedup on content hash -------------------------------
    QueryDef(
      "q_b5_dedup_exact",
      Some("""SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id,
             |       COUNT(*) AS dup_count
             |FROM documents GROUP BY md5(text)
             |ORDER BY text_hash""".stripMargin)
    ) { (s, d) =>
      Tables(s, d, "documents")
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("dup_count"))
        .orderBy(col("text_hash"))
    },

    // ---- Q-B6: word-shingle Jaccard near-dup pairs -----------------------
    QueryDef(
      "q_b6_jaccard_neardup",
      Some(s"""WITH $duckShingles,
              |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
              |pairs AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
              |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              |  GROUP BY a.doc_id, b.doc_id),
              |j AS (
              |  SELECT doc_a, doc_b, shared, ca.n_sh + cb.n_sh - shared AS uni
              |  FROM pairs
              |  JOIN cnt ca ON doc_a = ca.doc_id
              |  JOIN cnt cb ON doc_b = cb.doc_id)
              |SELECT doc_a, doc_b, shared, uni,
              |  CAST(CAST(CAST(shared AS DECIMAL(18,6)) / CAST(uni AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS jaccard
              |FROM j WHERE shared * 10 >= uni * 5
              |ORDER BY doc_a, doc_b""".stripMargin)
    ) { (s, d) =>
      // Same exact AllPairs prefix-filter shape as q_c3 (see there for the
      // full rationale), at tau = 0.5: prefix length n - ceil(n/2) + 1,
      // dictionary-encoded shingle ids, merge-count verify. Output is
      // bit-identical to the naive self-join the oracle runs.
      graft.functions.IntersectCountSorted.register(s)
      val sh = shingles(s, d)
      val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val freq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("f"))
      // Distributed rarity rank: range-partitioned RDD sort + zipWithIndex
      // instead of a global Window.orderBy (which funnels the whole
      // vocabulary through ONE partition — fine for char-grams, a
      // scale-killer for unbounded word-shingle vocabularies). Only the
      // ORDER of gids matters downstream (prefix filter + sorted-merge
      // intersect), and (f, shingle) is a total order, so the dense ids
      // are deterministic.
      val ids = {
        import s.implicits._
        // cache the (small, vocab-sized) rank input: sortBy's sample pass
        // + sort pass would otherwise re-run the scan→explode→groupBy
        // lineage once each (4+ s of pure recompute under the per-job tax).
        // Registered so the harness unpersists it after materialization.
        val base = graft.core.CachedRdds.register(
          freq.select(col("shingle"), col("f")).as[(String, Long)].rdd
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        base
          .sortBy { case (g, f) => (f, g) }
          .zipWithIndex()
          .map { case ((g, _), i) => (g, i + 1L) }
          .toDF("shingle", "gid")
      }
      val sh2 = sh.join(ids, Seq("shingle")).select(col("doc_id"), col("gid"))
      val prefix = sh2
        .join(cnt, Seq("doc_id"))
        .withColumn(
          "rnk",
          row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("gid"))))
        .filter(col("rnk") <= col("n_sh") - expr("(n_sh + 1) DIV 2") + 1)
        .select(col("doc_id"), col("gid"))
      val cand = prefix.as("a")
        .join(
          prefix.as("b"),
          col("a.gid") === col("b.gid") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val garr = sh2.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("gid"))).as("gids"), count(lit(1)).as("n_sh"))
      cand
        .join(garr.select(col("doc_id").as("doc_a"), col("gids").as("ga"),
          col("n_sh").as("n_a")), Seq("doc_a"))
        .join(garr.select(col("doc_id").as("doc_b"), col("gids").as("gb"),
          col("n_sh").as("n_b")), Seq("doc_b"))
        .withColumn("shared", expr("intersect_count_sorted(ga, gb)"))
        .withColumn("uni", col("n_a") + col("n_b") - col("shared"))
        .filter(col("shared") * 10 >= col("uni") * 5)
        .select(
          col("doc_a"),
          col("doc_b"),
          col("shared"),
          col("uni"),
          emit((dec(col("shared")) / dec(col("uni"))).cast(D38)).as("jaccard")
        )
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- MinHash + LSH banded candidate pairs ----------------------------
    // The full scale path: 3-word shingles → 6 minhash permutations
    // h_i(x) = (a_i·x + b_i) mod 1e9+7 over rolling-hashed shingles →
    // 3 bands of 2 rows → candidates = docs sharing ≥1 band key.
    // Shingles (not unigrams) are essential: the corpus vocabulary is
    // tiny, so unigram sets are near-identical across docs and unigram
    // LSH would degenerate to all-pairs.
    QueryDef(
      "q_c1_minhash_lsh",
      Some {
        val mhCols = minhashParams.zipWithIndex
          .map { case ((a, b), i) => s"MIN(($a * th + $b) % 1000000007) AS mh$i" }
          .mkString(", ")
        s"""WITH $duckShingles,
           |h AS (SELECT doc_id, ${duckRollingHash("shingle")} AS th FROM sh),
           |sig AS (SELECT doc_id, $mhCols FROM h GROUP BY doc_id),
           |bands AS (
           |  SELECT doc_id, 0 AS band, mh0 || '_' || mh1 AS key FROM sig
           |  UNION ALL SELECT doc_id, 1, mh2 || '_' || mh3 FROM sig
           |  UNION ALL SELECT doc_id, 2, mh4 || '_' || mh5 FROM sig),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b
           |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
           |SELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b""".stripMargin
      }
    ) { (s, d) =>
      val h = shingles(s, d).select(col("doc_id"), expr(rollingHash("shingle")).as("th"))
      val mhAggs = minhashParams.zipWithIndex.map { case ((a, b), i) =>
        min(expr(s"($a * th + $b) % 1000000007L")).as(s"mh$i")
      }
      val sig = h.groupBy(col("doc_id")).agg(mhAggs.head, mhAggs.tail: _*)
      val bands = (0 until 3)
        .map { bandIdx =>
          sig.select(
            col("doc_id"),
            lit(bandIdx).as("band"),
            concat_ws("_", col(s"mh${2 * bandIdx}"), col(s"mh${2 * bandIdx + 1}")).as("key")
          )
        }
        .reduce(_ unionByName _)
      bands
        .as("a")
        .join(
          bands.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key")
            && col("a.doc_id") < col("b.doc_id")
        )
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- SimHash fingerprints (16-bit, token-count-weighted) -------------
    QueryDef(
      "q_c2_simhash",
      Some(s"""WITH toks AS (
              |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
              |h AS (SELECT doc_id, ${duckRollingHash("tok")} AS th FROM toks),
              |bits AS (
              |  SELECT doc_id, k,
              |         SUM(CASE WHEN (th >> CAST(k AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS s
              |  FROM h, range(16) r(k) GROUP BY doc_id, k),
              |fp AS (
              |  SELECT doc_id,
              |         CAST(SUM(CASE WHEN s > 0 THEN 1 << CAST(k AS INTEGER) ELSE 0 END) AS BIGINT) AS simhash
              |  FROM bits GROUP BY doc_id)
              |SELECT doc_id, simhash FROM fp ORDER BY doc_id""".stripMargin)
    ) { (s, d) =>
      val toks = Tables(s, d, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      val h = toks.select(col("doc_id"), expr(rollingHash("tok")).as("th"))
      h.select(col("doc_id"), col("th"), explode(expr("sequence(0, 15)")).as("k"))
        .groupBy(col("doc_id"), col("k"))
        .agg(
          sum(
            when(expr("(th >> CAST(k AS INT)) & 1") === 1, 1L).otherwise(-1L)
          ).as("s")
        )
        .groupBy(col("doc_id"))
        .agg(
          sum(when(col("s") > 0, expr("CAST(1 AS BIGINT) << CAST(k AS INT)")).otherwise(0L))
            .cast("long")
            .as("simhash")
        )
        .orderBy(col("doc_id"))
    },

    // ---- char-5-gram Jaccard near-dup, blocked by source -----------------
    // Blocking by `source` bounds the candidate space (the standard
    // pre-partitioning move before a quadratic comparison at scale).
    QueryDef(
      "q_c3_ngram_jaccard",
      Some("""WITH ks AS (
             |  SELECT doc_id, source, text, unnest(range(length(text) - 4)) AS k
             |  FROM documents WHERE length(text) >= 5),
             |g AS (
             |  SELECT DISTINCT doc_id, source, substr(text, CAST(k AS INTEGER) + 1, 5) AS gram
             |  FROM ks),
             |cnt AS (SELECT doc_id, COUNT(*) AS n_g FROM g GROUP BY doc_id),
             |pairs AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
             |  FROM g a JOIN g b
             |    ON a.source = b.source AND a.gram = b.gram AND a.doc_id < b.doc_id
             |  GROUP BY a.doc_id, b.doc_id),
             |j AS (
             |  SELECT doc_a, doc_b, shared, ca.n_g + cb.n_g - shared AS uni
             |  FROM pairs JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id)
             |SELECT doc_a, doc_b, shared, uni
             |FROM j WHERE shared * 10 >= uni * 6
             |ORDER BY doc_a, doc_b""".stripMargin)
    ) { (s, d) =>
      graft.functions.IntersectCountSorted.register(s)
      // Exact AllPairs prefix filtering (Bayardo et al.): index only each
      // doc's rarest p = n − ⌈τ·n⌉ + 1 grams (global rarity order); any
      // pair with Jaccard ≥ τ MUST collide inside these prefixes, so the
      // candidate join shrinks ~70× (38M → 0.5M pairs at sf0.1) while the
      // exact verify step reproduces the naive join's output bit-for-bit
      // (the DuckDB oracle stays the naive formulation). ⌈τ·n⌉ is computed
      // in integer arithmetic ((6n+9) DIV 10) — a float ceil could round
      // UP and silently shorten the prefix below the safe bound.
      // This is the 100 TB path: candidate volume tracks true similarity,
      // not corpus-wide gram frequency.
      val g = Tables(s, d, "documents")
        .filter(length(col("text")) >= 5)
        .select(
          col("doc_id"),
          col("source"),
          explode(
            expr(
              "array_distinct(transform(sequence(1, length(text) - 4)," +
                " i -> substr(text, i, 5)))"
            )
          ).as("gram")
        )
      val cnt = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n_g"))
      val freq = g.groupBy(col("source"), col("gram")).agg(count(lit(1)).as("f"))
      // Dictionary-encode (source, gram) to a dense BIGINT id in rarity
      // order: intersection COUNTS are invariant under the bijection, so
      // every later stage runs on 8-byte ids instead of 5-char strings
      // (the per-doc arrays shrink ~8x and the merge compares longs).
      // Distinct sources never share a gid, so joining on gid alone
      // enforces the source blocking. Same distributed rarity rank as
      // q_b6 (range-partitioned RDD sort + zipWithIndex) — no vocabulary
      // ever funnels through a single-partition window, so the dictionary
      // scales with executors even at unbounded gram vocabularies.
      val ids = {
        import s.implicits._
        // cached for the same reason as q_b6's rank input (see there)
        val base = graft.core.CachedRdds.register(
          freq.select(col("source"), col("gram"), col("f"))
            .as[(String, String, Long)].rdd
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        base
          .sortBy { case (src, gm, f) => (f, src, gm) }
          .zipWithIndex()
          .map { case ((src, gm, _), i) => (src, gm, i + 1L) }
          .toDF("source", "gram", "gid")
      }
      val g2 = g.join(ids, Seq("source", "gram")).select(col("doc_id"), col("gid"))
      val ranked = g2
        .join(cnt, Seq("doc_id"))
        .withColumn(
          "rnk",
          row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("gid"))))
      val prefix = ranked
        .filter(col("rnk") <= col("n_g") - expr("(6 * n_g + 9) DIV 10") + 1)
        .select(col("doc_id"), col("gid"))
      val cand = prefix.as("a")
        .join(
          prefix.as("b"),
          col("a.gid") === col("b.gid") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val garr = g2.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("gid"))).as("grams"), count(lit(1)).as("n_g"))
      // NOTE: broadcasting garr here measured 10x SLOWER than the shuffle
      // joins (copying the array per probe into the generated-code
      // stream); the shuffle join sorts doc-id pairs instead
      cand
        .join(garr.select(col("doc_id").as("doc_a"), col("grams").as("ga"),
          col("n_g").as("n_a")), Seq("doc_a"))
        .join(garr.select(col("doc_id").as("doc_b"), col("grams").as("gb"),
          col("n_g").as("n_b")), Seq("doc_b"))
        // O(n+m) merge on the sorted id arrays (native codegen'd
        // expression) — array_intersect's per-row hash set was the
        // verify-step bottleneck at 0.5M candidate pairs
        .withColumn("shared", expr("intersect_count_sorted(ga, gb)"))
        .withColumn("uni", col("n_a") + col("n_b") - col("shared"))
        .filter(col("shared") * 10 >= col("uni") * 6)
        .select(col("doc_a"), col("doc_b"), col("shared"), col("uni"))
        .orderBy(col("doc_a"), col("doc_b"))
    }
  )
}
