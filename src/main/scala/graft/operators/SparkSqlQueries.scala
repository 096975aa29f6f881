package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The full query surface as Spark-dialect SQL TEXT (SURVEY §7.1 M1:
  * "DataFrame programs and SQL strings").
  *
  * Every registered query except `q_c9_ann_ivf` has a SQL twin here that
  * produces exactly the same rows as its DataFrame program —
  * `SqlParitySpec` asserts `spark.sql(text)` ≡ plan output for all of
  * them. q_c9's TRAINING phase is excluded by construction: its coarse
  * quantizer is trained by Lloyd iterations whose centroids are
  * driver-side learned state; a SQL string has no construct that
  * reproduces the same floating-point training sequence. Its SEARCH
  * phase over the trained (registered) quantizer IS SQL —
  * [[qC9SearchSql]] — and parity-checked like the rest.
  *
  * The similarity queries use the library's REGISTERED Catalyst
  * expressions (`cosine_similarity`, `hyperplane_sig`) — registered
  * functions are part of the engine's SQL dialect, exactly like a
  * built-in (call [[registerAll]] first).
  *
  * Dialect notes vs the DuckDB oracles in the QueryDefs: `string_split`
  * → `split`, `list_*` → `array_*`, 1-based `[i]` → 0-based,
  * `unnest(range(n))` → `explode(sequence(0, n-1))`, `epoch_us(ts)` →
  * `t_us` from the `events_us` view (the schema-adaptive EventTime
  * canonicalization — events.ts has shipped as both BIGINT nanos and
  * timestamp[us] across data generations), `//` → `DIV`,
  * bare float literals carry a `D` suffix where the DataFrame side uses
  * doubles (Spark parses `1.0` as DECIMAL).
  */
object SparkSqlQueries {

  /** Register the parquet tables as temp views + the library's SQL
    * functions, making every string in [[sql]] runnable via `spark.sql`.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    // events + canonical epoch-µs `t_us`, adaptive to the shipped ts layout
    graft.core.EventTime.events(spark, dir).createOrReplaceTempView("events_us")
    graft.functions.CosineSimilarity.register(spark)
    graft.functions.HyperplaneSignature.register(spark)
    graft.functions.IntersectCountSorted.register(spark)
    graft.functions.SubwordCount.register(spark)
    graft.functions.PolyHash.register(spark)
    graft.functions.GramHashes.register(spark)
    graft.functions.SlidingMin.register(spark)
    graft.functions.TokenRepStats.register(spark)
  }

  /** Run one named query from [[sql]]. */
  def run(spark: SparkSession, dir: String, name: String): DataFrame = {
    registerAll(spark, dir)
    spark.sql(sql(name))
  }

  /** q_c9's SEARCH phase as SQL text, parameterized by the trained coarse
    * quantizer's registered function name (`SimilarityQueries.trainIvf`
    * returns it) and the probe fan-out. The TRAINING phase stays
    * DataFrame-only — its Lloyd centroids are driver-side learned state —
    * but once the quantizer is registered, the whole search plan (assign,
    * probe, bucket join, per-cell top-k, global top-k) is plain SQL over
    * the engine's dialect. SqlParitySpec asserts this text ≡
    * `SimilarityQueries.ivfSearch` row-for-row.
    */
  def qC9SearchSql(fn: String, nprobe: Int): String =
    s"""WITH e AS (
       |  SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |a AS (
       |  SELECT vec_id, v, element_at($fn(v, 1), 1) AS cell FROM e),
       |q AS (
       |  SELECT vec_id AS query_id, v AS qv, explode($fn(v, $nprobe)) AS cell
       |  FROM e WHERE vec_id % 100 = 0),
       |scored AS (
       |  SELECT /*+ BROADCAST(q) */ q.query_id, a.vec_id, a.cell,
       |    round(CAST(cosine_similarity(a.v, q.qv) AS DECIMAL(18,6)), 4) AS score
       |  FROM a JOIN q ON a.cell = q.cell
       |  WHERE a.vec_id <> q.query_id),
       |cellk AS (
       |  SELECT query_id, vec_id, score,
       |    row_number() OVER (PARTITION BY query_id, cell ORDER BY score DESC, vec_id) AS cell_rank
       |  FROM scored),
       |ranked AS (
       |  SELECT query_id, vec_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS BIGINT) AS rank
       |  FROM cellk WHERE cell_rank <= 5)
       |SELECT query_id, rank, vec_id, CAST(score AS DOUBLE) AS score
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  // ---- shared fragments --------------------------------------------------

  /** Spark twin of DedupQueries.rollingHash. */
  private def rh(c: String): String =
    s"aggregate(split($c, ''), 0L, (acc, ch) -> (acc * 31 + ascii(ch)) % 1000000007L)"

  private val shingleCtes =
    """t AS (SELECT doc_id, split(lower(text), ' ') AS toks FROM documents),
      |sh AS (SELECT doc_id,
      |  explode(array_distinct(transform(sequence(0, size(toks) - 3),
      |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS shingle
      |  FROM t WHERE size(toks) >= 3)""".stripMargin

  /** Banded-MinHash candidate CTE chain ending in `cand(doc_a, doc_b)` —
    * shared by q_c1 and q_c13 (twin of `DedupQueries.minhashCandidates`).
    */
  private val minhashCandCtes =
    s"""$shingleCtes,
       |h AS (SELECT doc_id, ${rh("shingle")} AS th FROM sh),
       |sig AS (SELECT doc_id,
       |  MIN((487198041 * th + 259200101) % 1000000007) AS mh0,
       |  MIN((741932517 * th + 373587883) % 1000000007) AS mh1,
       |  MIN((268435399 * th + 608135813) % 1000000007) AS mh2,
       |  MIN((104395303 * th + 36028797) % 1000000007) AS mh3,
       |  MIN((655360001 * th + 177777773) % 1000000007) AS mh4,
       |  MIN((920419813 * th + 51218317) % 1000000007) AS mh5
       |  FROM h GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, 0 AS band, concat_ws('_', mh0, mh1) AS key FROM sig
       |  UNION ALL SELECT doc_id, 1, concat_ws('_', mh2, mh3) FROM sig
       |  UNION ALL SELECT doc_id, 2, concat_ws('_', mh4, mh5) FROM sig),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)""".stripMargin

  /** Spark-dialect winnowing CTE chain ending in `wp$sfx(doc_a, doc_b)`
    * at window size `w` — q_c95's parameter grid (twin of
    * `DedupQueries.duckWinnowChain`).
    */
  private def sparkWinnowChain(sfx: String, w: Int): String =
    s"""tw$sfx AS (SELECT doc_id, split(lower(text), ' ') AS ts FROM documents),
       |g$sfx AS (SELECT doc_id,
       |  transform(sequence(0, size(ts) - 3), i ->
       |    aggregate(split(concat_ws(' ', ts[i], ts[i+1], ts[i+2]), ''), 0L,
       |      (acc, ch) -> (acc * 31 + ascii(ch)) % 1000000007L)) AS hs
       |  FROM tw$sfx WHERE size(ts) >= 3),
       |w$sfx AS (SELECT doc_id,
       |  CASE WHEN size(hs) >= $w
       |       THEN transform(sequence(0, size(hs) - $w), p -> array_min(slice(hs, p + 1, $w)))
       |       ELSE array(array_min(hs)) END AS sel
       |  FROM g$sfx),
       |fp$sfx AS (SELECT DISTINCT doc_id, fp FROM
       |        (SELECT doc_id, explode(sel) AS fp FROM w$sfx)),
       |dfc$sfx AS (SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY fp) AS dfc FROM fp$sfx),
       |kept$sfx AS (SELECT doc_id, fp FROM dfc$sfx WHERE dfc <= 50),
       |wp$sfx AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |       FROM kept$sfx a JOIN kept$sfx b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2 HAVING COUNT(*) >= 2)""".stripMargin

  /** Spark-dialect verified τ = 0.5 pair tail (assumes `sh` in scope)
    * ending in `jp(doc_a, doc_b, shared, uni)` — twin of
    * `DedupQueries.duckJaccardTail`, the ONE copy of the exact-pair base
    * shared by the q_b6/q_c85/q_c88/q_c91/q_c92/q_c95 twins.
    */
  private val sparkJaccardTail =
    """cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id),
      |jp AS (
      |  SELECT doc_a, doc_b, shared, ca.n_sh + cb.n_sh - shared AS uni
      |  FROM pairs
      |  JOIN cnt ca ON doc_a = ca.doc_id
      |  JOIN cnt cb ON doc_b = cb.doc_id
      |  WHERE shared * 10 >= (ca.n_sh + cb.n_sh - shared) * 5)""".stripMargin

  /** Cross-set fuzzy-decontamination CTE chain ending in
    * `fz(doc_id, bench_id, shared, uni, jaccard)` — shared by q_c47 and
    * q_c73 (twin of `DedupQueries.fuzzyDecontamPairs`).
    */
  private val fuzzyFzCtes =
    """toks AS (SELECT doc_id, split(lower(text), ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id, concat_ws(' ', t[k], t[k+1], t[k+2]) AS shingle
      |       FROM (SELECT doc_id, t, explode(sequence(0, size(t) - 3)) AS k
      |             FROM toks WHERE size(t) >= 3)),
      |h AS (SELECT doc_id,
      |        aggregate(split(shingle, ''), 0L, (acc, ch) -> (acc * 31 + ascii(ch)) % 1000000007L) AS th
      |      FROM sh),
      |sig AS (SELECT doc_id,
      |  MIN((487198041 * th + 259200101) % 1000000007L) AS mh0,
      |  MIN((741932517 * th + 373587883) % 1000000007L) AS mh1,
      |  MIN((268435399 * th + 608135813) % 1000000007L) AS mh2,
      |  MIN((104395303 * th + 36028797) % 1000000007L) AS mh3,
      |  MIN((655360001 * th + 177777773) % 1000000007L) AS mh4,
      |  MIN((920419813 * th + 51218317) % 1000000007L) AS mh5
      |  FROM h GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, 0 AS band, concat_ws('_', mh0, mh1) AS key FROM sig
      |  UNION ALL SELECT doc_id, 1, concat_ws('_', mh2, mh3) FROM sig
      |  UNION ALL SELECT doc_id, 2, concat_ws('_', mh4, mh5) FROM sig),
      |cand AS (
      |  SELECT DISTINCT a.doc_id, b.doc_id AS bench_id
      |  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
      |  WHERE a.doc_id % 17 <> 3 AND b.doc_id % 17 = 3),
      |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      |shr AS (
      |  SELECT a.doc_id, b.doc_id AS bench_id, COUNT(*) AS shared
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle
      |  WHERE a.doc_id % 17 <> 3 AND b.doc_id % 17 = 3
      |  GROUP BY a.doc_id, b.doc_id),
      |j AS (
      |  SELECT c.doc_id, c.bench_id, s.shared,
      |         ca.n_sh + cb.n_sh - s.shared AS uni
      |  FROM cand c
      |  JOIN shr s ON c.doc_id = s.doc_id AND c.bench_id = s.bench_id
      |  JOIN cnt ca ON c.doc_id = ca.doc_id
      |  JOIN cnt cb ON c.bench_id = cb.doc_id),
      |fz AS (
      |  SELECT doc_id, bench_id, shared, uni,
      |    CAST(CAST(CAST(shared AS DECIMAL(18,6)) / CAST(uni AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS jaccard
      |  FROM j WHERE shared * 10 >= uni * 3)""".stripMargin

  private val base: Map[String, String] = Map(
    // ---- relational core -------------------------------------------------
    "q_a1_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_a2_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0D - l_discount) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0D - l_discount) * (1.0D + l_tax) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
        |  CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) / COUNT(*) AS DECIMAL(38,6)) AS DOUBLE) AS avg_qty,
        |  CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) / COUNT(*) AS DECIMAL(38,6)) AS DOUBLE) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_a3_join_inner" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice, c_name
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |ORDER BY o_orderkey""".stripMargin,

    "q_a4_join_broadcast" ->
      """SELECT /*+ BROADCAST(supplier), BROADCAST(nation), BROADCAST(region) */ n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0D - l_discount) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q_a5_join_outer" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_count,
        |  CAST(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 0) AS DECIMAL(38,6)) AS DOUBLE) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,

    "q_a6_semi" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
        |ORDER BY p_partkey""".stripMargin,

    "q_a6_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_a7_downsample" ->
      """SELECT l_orderkey, CAST(l_linenumber DIV 2 AS BIGINT) AS ln_bucket,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_qty,
        |  MIN(l_quantity) AS min_qty,
        |  MAX(l_quantity) AS max_qty,
        |  COUNT(*) AS cnt
        |FROM lineitem
        |GROUP BY l_orderkey, CAST(l_linenumber DIV 2 AS BIGINT)
        |ORDER BY l_orderkey, ln_bucket""".stripMargin,

    "q_a8_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS distinct_parts,
        |  COUNT(DISTINCT l_suppkey) AS distinct_supps,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_a8_approx_distinct" ->
      """SELECT l_returnflag,
        |  approx_count_distinct(l_partkey) AS approx_parts,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_a9_rollup" ->
      """SELECT CAST(GROUPING(n_name) AS BIGINT) AS g_n,
        |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_p,
        |       n_name, o_orderpriority, COUNT(*) AS cnt,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, o_orderpriority)
        |ORDER BY g_n, g_p, n_name NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_a10_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
        |    CAST(RANK() OVER w AS BIGINT) AS rnk,
        |    CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q_a11_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)) AS DOUBLE) AS running_total
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_a12_lag" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  LAG(o_orderdate) OVER w AS prev_date,
        |  CAST(DATEDIFF(o_orderdate, LAG(o_orderdate) OVER w) AS BIGINT) AS gap_days
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_a13_topk" ->
      """SELECT l_partkey,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0D - l_discount) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY l_partkey
        |ORDER BY revenue DESC, l_partkey LIMIT 10""".stripMargin,

    "q_a14_setops" ->
      """WITH a AS (SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nkey FROM supplier),
        |     b AS (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nkey FROM customer)
        |SELECT op, nkey FROM (
        |  SELECT 'union' AS op, nkey FROM (SELECT nkey FROM a UNION SELECT nkey FROM b)
        |  UNION ALL
        |  SELECT 'intersect' AS op, nkey FROM (SELECT nkey FROM a INTERSECT SELECT nkey FROM b)
        |  UNION ALL
        |  SELECT 'except' AS op, nkey FROM (SELECT nkey FROM a EXCEPT SELECT nkey FROM b)
        |)
        |ORDER BY op, nkey""".stripMargin,

    "q_a15_subquery" ->
      """SELECT p_partkey, p_name, p_retailprice
        |FROM part
        |WHERE CAST(p_retailprice AS DECIMAL(18,6)) * (SELECT COUNT(*) FROM part)
        |      > (SELECT SUM(CAST(p_retailprice AS DECIMAL(18,6))) FROM part)
        |  AND p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
        |ORDER BY p_partkey""".stripMargin,

    "q_a16_case" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
        |            WHEN o_totalprice < 150000 THEN 'mid'
        |            ELSE 'high' END AS band,
        |       COUNT(*) AS cnt,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY band""".stripMargin,

    "q_a17_string" ->
      """SELECT p_partkey,
        |  upper(substr(p_name, 1, 5)) AS name_prefix,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  p_name LIKE '%wid%' AS is_widget,
        |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        |  CAST(length(trim(p_name)) AS BIGINT) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_a18_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(month(o_orderdate) AS BIGINT) AS o_month,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  last_day(o_orderdate) AS month_end,
        |  CAST(DATEDIFF(o_orderdate, DATE '1995-01-01') AS BIGINT) AS days_since_95
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_a19_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,6)), 1) AS DOUBLE) AS price_round,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  CAST(CAST(abs(l_extendedprice - l_quantity) AS DECIMAL(18,6)) AS DOUBLE) AS adiff,
        |  CAST(CAST(sqrt(l_extendedprice) AS DECIMAL(18,6)) AS DOUBLE) AS price_sqrt,
        |  CAST(CAST(pow(l_discount, 2) AS DECIMAL(18,6)) AS DOUBLE) AS disc_sq
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_a20_array" ->
      """SELECT p_partkey,
        |  element_at(split(p_name, ' '), 1) AS first_word,
        |  CAST(size(split(p_name, ' ')) AS BIGINT) AS n_words,
        |  array_contains(split(p_name, ' '), 'widget') AS has_widget,
        |  concat_ws('_', sort_array(split(p_name, ' '))) AS sorted_words
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_a20_json" ->
      """SELECT event_id,
        |  CAST(get_json_object(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,

    "q_a21_cube" ->
      """SELECT CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
        |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
        |       o_orderpriority, o_orderstatus, COUNT(*) AS cnt,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY CUBE(o_orderpriority, o_orderstatus)
        |ORDER BY g_pri, g_st, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,

    "q_a22_pivot" ->
      """SELECT user_id % 10 AS user_bucket,
        |  COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'view')     AS view
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // ---- event streams ---------------------------------------------------
    "q_b1_tumbling_window" ->
      """SELECT unix_micros(date_trunc('hour', timestamp_micros(t_us))) AS window_start_us,
        |  event_type, COUNT(*) AS cnt,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total_value
        |FROM events_us
        |GROUP BY 1, 2
        |ORDER BY window_start_us, event_type""".stripMargin,

    "q_b2_sliding_window" ->
      """SELECT unix_micros(window.start) AS window_start_us,
        |  COUNT(*) AS cnt,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total_value
        |FROM (SELECT timestamp_micros(t_us) AS ets, value FROM events_us)
        |GROUP BY window(ets, '1 hour', '15 minutes')
        |ORDER BY window_start_us""".stripMargin,

    "q_b3_sessionize" ->
      """WITH t AS (
        |  SELECT user_id, event_id, t_us AS tsu,
        |         lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS prev_tsu
        |  FROM events_us),
        |f AS (
        |  SELECT *, CASE WHEN prev_tsu IS NULL
        |                   OR tsu - prev_tsu > 1800000000 THEN 1L ELSE 0L END AS new_sess
        |  FROM t),
        |s AS (
        |  SELECT user_id, tsu, event_id,
        |         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |       MIN(tsu) AS session_start_us, MAX(tsu) AS session_end_us
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q_b4_asof_join" ->
      """SELECT event_id, ts_us, user_id, last_orderkey, last_orderdate, last_totalprice
        |FROM (
        |  SELECT e.event_id, e.t_us AS ts_us, e.user_id,
        |         o.o_orderkey AS last_orderkey,
        |         o.o_orderdate AS last_orderdate,
        |         o.o_totalprice AS last_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY e.event_id
        |           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events_us e
        |  JOIN orders o ON e.user_id = o.o_custkey
        |    AND unix_micros(CAST(o.o_orderdate AS TIMESTAMP)) <= e.t_us
        |)
        |WHERE rn = 1
        |ORDER BY event_id""".stripMargin,

    "q_b9_interval_join" ->
      """SELECT a.user_id, COUNT(*) AS n_pairs
        |FROM events_us a JOIN events_us b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(a.t_us - b.t_us) <= 60000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // ---- dedup -----------------------------------------------------------
    "q_b5_dedup_exact" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id,
        |       COUNT(*) AS dup_count
        |FROM documents GROUP BY md5(text)
        |ORDER BY text_hash""".stripMargin,

    "q_b6_jaccard_neardup" ->
      s"""WITH $shingleCtes,
         |$sparkJaccardTail
         |SELECT doc_a, doc_b, shared, uni,
         |  CAST(CAST(CAST(shared AS DECIMAL(18,6)) / CAST(uni AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS jaccard
         |FROM jp
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q_c100_dedup_threshold_curve" ->
      s"""WITH $shingleCtes,
         |$sparkJaccardTail,
         |taus AS (SELECT CAST(x AS BIGINT) AS tau10
         |         FROM (SELECT explode(array(5, 6, 7, 8, 9)) AS x)),
         |ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM documents),
         |hits AS (SELECT t.tau10, jp.doc_a, jp.doc_b
         |         FROM jp CROSS JOIN taus t
         |         WHERE jp.shared * 10 >= jp.uni * t.tau10),
         |np AS (SELECT tau10, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |       FROM hits GROUP BY 1),
         |ex AS (SELECT tau10, doc_a AS d FROM hits
         |       UNION SELECT tau10, doc_b FROM hits),
         |nd AS (SELECT tau10, CAST(COUNT(*) AS BIGINT) AS n_docs
         |       FROM ex GROUP BY 1)
         |SELECT t.tau10, COALESCE(np.n_pairs, 0L) AS n_pairs,
         |  COALESCE(nd.n_docs, 0L) AS n_docs, ntot.n_total,
         |  CAST(COALESCE(nd.n_docs, 0L) * 1000000 DIV ntot.n_total AS BIGINT) AS touched_ppm
         |FROM taus t
         |LEFT JOIN np ON np.tau10 = t.tau10
         |LEFT JOIN nd ON nd.tau10 = t.tau10
         |CROSS JOIN ntot
         |ORDER BY t.tau10""".stripMargin,

    "q_c1_minhash_lsh" ->
      s"""WITH $minhashCandCtes
         |SELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b""".stripMargin,

    "q_c2_simhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id, explode(split(lower(text), ' ')) AS tok FROM documents),
         |h AS (SELECT doc_id, ${rh("tok")} AS th FROM toks),
         |hb AS (SELECT doc_id, th, explode(sequence(0, 15)) AS k FROM h),
         |bits AS (
         |  SELECT doc_id, k,
         |         SUM(CASE WHEN (th >> CAST(k AS INT)) & 1 = 1 THEN 1L ELSE -1L END) AS s
         |  FROM hb GROUP BY doc_id, k)
         |SELECT doc_id,
         |  CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << CAST(k AS INT) ELSE 0L END) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_c3_ngram_jaccard" ->
      """WITH g AS (
        |  SELECT doc_id, source,
        |    explode(array_distinct(transform(sequence(1, length(text) - 4),
        |      i -> substr(text, i, 5)))) AS gram
        |  FROM documents WHERE length(text) >= 5),
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
        |ORDER BY doc_a, doc_b""".stripMargin,

    // ---- similarity (registered Catalyst expressions in SQL) -------------
    "q_b7_cosine_topk" ->
      """WITH e AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
        |scored AS (
        |  SELECT /*+ BROADCAST(q) */ query_id, vec_id,
        |    round(CAST(cosine_similarity(v, qv) AS DECIMAL(18,6)), 4) AS score
        |  FROM e CROSS JOIN q WHERE vec_id <> query_id),
        |ranked AS (
        |  SELECT query_id, vec_id, score,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, vec_id) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT query_id, rank, vec_id, CAST(score AS DOUBLE) AS score
        |FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    "q_c4_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, label, transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |sig AS (SELECT vec_id, label, hyperplane_sig(v, 64, 42L) AS sig FROM e),
        |bands AS (
        |  SELECT vec_id, label, bk.band AS band, bk.key AS key FROM (
        |    SELECT vec_id, label,
        |      explode(transform(sequence(0, 15),
        |        b -> struct(b AS band, shiftright(sig, b * 4) & 15 AS key))) AS bk
        |    FROM sig)),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM bands a JOIN bands b
        |    ON a.label = b.label AND a.band = b.band AND a.key = b.key
        |    AND a.vec_id < b.vec_id),
        |scored AS (
        |  SELECT vec_a, vec_b,
        |    round(CAST(cosine_similarity(av.v, bv.qv) AS DECIMAL(18,6)), 4) AS cos_sim
        |  FROM cand
        |  JOIN (SELECT vec_id AS vec_a, v FROM e) av USING (vec_a)
        |  JOIN (SELECT vec_id AS vec_b, v AS qv FROM e) bv USING (vec_b))
        |SELECT vec_a, vec_b, CAST(cos_sim AS DOUBLE) AS cos_sim
        |FROM scored WHERE cos_sim >= 0.90
        |ORDER BY vec_a, vec_b""".stripMargin,

    "q_c4b_embedding_neardup_planted" ->
      """WITH base AS (SELECT vec_id, label, transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |e AS (
        |  SELECT vec_id, label, v FROM base
        |  UNION ALL
        |  SELECT vec_id + 1000000L AS vec_id, label,
        |    transform(v, x -> x + 0.1D * x * x) AS v
        |  FROM base),
        |sig AS (SELECT vec_id, label, hyperplane_sig(v, 64, 42L) AS sig FROM e),
        |bands AS (
        |  SELECT vec_id, label, bk.band AS band, bk.key AS key FROM (
        |    SELECT vec_id, label,
        |      explode(transform(sequence(0, 15),
        |        b -> struct(b AS band, shiftright(sig, b * 4) & 15 AS key))) AS bk
        |    FROM sig)),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM bands a JOIN bands b
        |    ON a.label = b.label AND a.band = b.band AND a.key = b.key
        |    AND a.vec_id < b.vec_id),
        |scored AS (
        |  SELECT vec_a, vec_b,
        |    round(CAST(cosine_similarity(av.v, bv.qv) AS DECIMAL(18,6)), 4) AS cos_sim
        |  FROM cand
        |  JOIN (SELECT vec_id AS vec_a, v FROM e) av USING (vec_a)
        |  JOIN (SELECT vec_id AS vec_b, v AS qv FROM e) bv USING (vec_b))
        |SELECT vec_a, vec_b, CAST(cos_sim AS DOUBLE) AS cos_sim
        |FROM scored WHERE cos_sim >= 0.90
        |ORDER BY vec_a, vec_b""".stripMargin,

    "q_c29_semantic_dedup" ->
      """WITH base AS (SELECT vec_id, label, transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |e AS (
        |  SELECT vec_id, label, v FROM base
        |  UNION ALL
        |  SELECT vec_id + 1000000L AS vec_id, label,
        |    transform(v, x -> x + 0.1D * x * x) AS v
        |  FROM base),
        |sig AS (SELECT vec_id, label, hyperplane_sig(v, 64, 42L) AS sig FROM e),
        |bands AS (
        |  SELECT vec_id, label, bk.band AS band, bk.key AS key FROM (
        |    SELECT vec_id, label,
        |      explode(transform(sequence(0, 15),
        |        b -> struct(b AS band, shiftright(sig, b * 4) & 15 AS key))) AS bk
        |    FROM sig)),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM bands a JOIN bands b
        |    ON a.label = b.label AND a.band = b.band AND a.key = b.key
        |    AND a.vec_id < b.vec_id),
        |pairs AS (
        |  SELECT vec_a, vec_b
        |  FROM cand
        |  JOIN (SELECT vec_id AS vec_a, v FROM e) av USING (vec_a)
        |  JOIN (SELECT vec_id AS vec_b, v AS qv FROM e) bv USING (vec_b)
        |  WHERE round(CAST(cosine_similarity(av.v, bv.qv) AS DECIMAL(18,6)), 4) >= 0.90),
        |dom AS (SELECT vec_b AS vec_id, MIN(vec_a) AS representative FROM pairs GROUP BY vec_b)
        |SELECT e.vec_id, e.label,
        |  CAST(CASE WHEN d.representative IS NULL THEN 1 ELSE 0 END AS INT) AS kept,
        |  d.representative
        |FROM e LEFT JOIN dom d USING (vec_id)
        |ORDER BY e.vec_id""".stripMargin,

    // ---- text ------------------------------------------------------------
    "q_b8_percentiles" ->
      """SELECT lang,
        |  COUNT(*) AS n_docs,
        |  CAST(CAST(percentile(n_chars, 0.25) AS DECIMAL(18,6)) AS DOUBLE) AS p25,
        |  CAST(CAST(percentile(n_chars, 0.50) AS DECIMAL(18,6)) AS DOUBLE) AS p50,
        |  CAST(CAST(percentile(n_chars, 0.75) AS DECIMAL(18,6)) AS DOUBLE) AS p75
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_c5_langid" ->
      """WITH t AS (SELECT doc_id, array_distinct(split(lower(text), ' ')) AS toks FROM documents),
        |sc AS (SELECT doc_id,
        |  CAST(size(array_intersect(toks, array('der', 'die', 'und', 'das', 'von'))) AS BIGINT) AS score_de,
        |  CAST(size(array_intersect(toks, array('the', 'of', 'and', 'to', 'in'))) AS BIGINT) AS score_en,
        |  CAST(size(array_intersect(toks, array('el', 'de', 'la', 'que', 'en'))) AS BIGINT) AS score_es,
        |  CAST(size(array_intersect(toks, array('le', 'de', 'la', 'et', 'les'))) AS BIGINT) AS score_fr,
        |  CAST(size(array_intersect(toks, array('的', '是', '了', '在', '我'))) AS BIGINT) AS score_zh
        |  FROM t),
        |b AS (SELECT doc_id, score_de, score_en, score_es, score_fr, score_zh,
        |  reverse(array_sort(array(
        |    struct(score_de AS s, 'de' AS l), struct(score_en AS s, 'en' AS l),
        |    struct(score_es AS s, 'es' AS l), struct(score_fr AS s, 'fr' AS l),
        |    struct(score_zh AS s, 'zh' AS l))))[0] AS top
        |  FROM sc)
        |SELECT doc_id, score_de, score_en, score_es, score_fr, score_zh,
        |  CASE WHEN score_de + score_en + score_es + score_fr + score_zh = 0
        |       THEN 'und' ELSE top.l END AS pred_lang
        |FROM b ORDER BY doc_id""".stripMargin,

    "q_c104_langid_confusion" ->
      """WITH t AS (SELECT doc_id, lang, array_distinct(split(lower(text), ' ')) AS toks FROM documents),
        |sc AS (SELECT doc_id, lang,
        |  CAST(size(array_intersect(toks, array('der', 'die', 'und', 'das', 'von'))) AS BIGINT) AS score_de,
        |  CAST(size(array_intersect(toks, array('the', 'of', 'and', 'to', 'in'))) AS BIGINT) AS score_en,
        |  CAST(size(array_intersect(toks, array('el', 'de', 'la', 'que', 'en'))) AS BIGINT) AS score_es,
        |  CAST(size(array_intersect(toks, array('le', 'de', 'la', 'et', 'les'))) AS BIGINT) AS score_fr,
        |  CAST(size(array_intersect(toks, array('的', '是', '了', '在', '我'))) AS BIGINT) AS score_zh
        |  FROM t),
        |b AS (SELECT doc_id, lang, score_de, score_en, score_es, score_fr, score_zh,
        |  reverse(array_sort(array(
        |    struct(score_de AS s, 'de' AS l), struct(score_en AS s, 'en' AS l),
        |    struct(score_es AS s, 'es' AS l), struct(score_fr AS s, 'fr' AS l),
        |    struct(score_zh AS s, 'zh' AS l))))[0] AS top
        |  FROM sc),
        |p AS (SELECT lang,
        |  CASE WHEN score_de + score_en + score_es + score_fr + score_zh = 0
        |       THEN 'und' ELSE top.l END AS pred_lang
        |  FROM b),
        |c AS (SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        |      FROM p GROUP BY 1, 2)
        |SELECT lang, pred_lang, n_docs,
        |  CAST(SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS gold_total,
        |  CAST(SUM(n_docs) OVER (PARTITION BY pred_lang) AS BIGINT) AS pred_total,
        |  CAST(n_docs * 1000 DIV SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS share_of_gold_pm,
        |  CAST(n_docs * 1000 DIV SUM(n_docs) OVER (PARTITION BY pred_lang) AS BIGINT) AS share_of_pred_pm
        |FROM c ORDER BY lang, pred_lang""".stripMargin,

    "q_c6_quality" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars_actual,
        |    split(lower(text), ' ') AS toks
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, n_chars_actual,
        |    CAST(size(toks) AS BIGINT) AS n_tokens,
        |    CAST(size(array_distinct(toks)) AS BIGINT) AS n_uniq,
        |    CAST(size(array_intersect(toks, array('the', 'of', 'and', 'to', 'in', 'a', 'is'))) AS BIGINT) AS n_stop
        |  FROM t)
        |SELECT doc_id, n_chars_actual, n_tokens, n_uniq, n_stop,
        |  CAST(CAST(CAST(n_uniq AS DECIMAL(18,6)) / CAST(n_tokens AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS uniq_ratio,
        |  CAST(CAST(CAST(n_chars_actual AS DECIMAL(18,6)) / CAST(n_tokens AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS avg_token_len,
        |  (n_tokens >= 10 AND n_tokens <= 1000 AND n_uniq * 10 >= n_tokens * 3) AS passes_quality
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_c7_token_count" ->
      """SELECT doc_id,
        |  CAST(size(split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS BIGINT) AS re_tokens,
        |  CAST(size(array_distinct(split(lower(text), ' '))) AS BIGINT) AS uniq_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_c8_fingerprint" ->
      s"""SELECT doc_id, ${rh("text")} AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,

    // the tokenizer expression is SHARED with the DataFrame plan
    // (TextQueries.subwordCountExpr) — one source of truth for the greedy
    // longest-match fold on the Spark side
    "q_c22_subword_tokens" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(size(filter(split(lower(text), ' '), w -> length(w) > 0)) AS BIGINT) AS ws_tokens,
         |    ${TextQueries.subwordCountExpr("text")} AS subword_tokens
         |  FROM documents)
         |SELECT doc_id, ws_tokens, subword_tokens,
         |  CAST(CASE WHEN ws_tokens = 0 THEN CAST(0 AS DECIMAL(38,6))
         |       ELSE CAST(CAST(subword_tokens AS DECIMAL(18,6)) / CAST(ws_tokens AS DECIMAL(18,6)) AS DECIMAL(38,6)) END AS DOUBLE) AS fertility
         |FROM t ORDER BY doc_id""".stripMargin,

    "q_c12_bm25" ->
      """WITH toks AS (SELECT doc_id, explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS term FROM documents),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
        |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, CAST(SUM(dl) AS DOUBLE) AS tot FROM dl),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
        |       WHERE term IN ('hash', 'join', 'filter') GROUP BY 1, 2),
        |dfq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT /*+ BROADCAST(dfq), BROADCAST(stats) */ t.doc_id,
        |    CAST(ln(1.0D + (s.n_docs - q.df + 0.5D) / (q.df + 0.5D))
        |      * (t.tf * 2.2D) / (t.tf + 1.2D * (0.25D + 0.75D * d.dl / (s.tot / s.n_docs)))
        |      AS DECIMAL(18,6)) AS tscore
        |  FROM tf t JOIN dl d USING (doc_id) JOIN dfq q USING (term) CROSS JOIN stats s)
        |SELECT doc_id, CAST(SUM(tscore) AS DOUBLE) AS bm25
        |FROM scored GROUP BY 1
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,

    "q_c26_unigram_logprob" ->
      """WITH toks AS (SELECT doc_id, explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens FROM tf GROUP BY 1),
        |vocab AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM vocab),
        |scored AS (
        |  SELECT /*+ BROADCAST(tot) */ t.doc_id,
        |    CAST(t.tf * -ln(CAST(v.cnt AS DOUBLE) / s.tot) AS DECIMAL(18,6)) AS tscore
        |  FROM tf t JOIN vocab v USING (term) CROSS JOIN tot s),
        |agg AS (SELECT doc_id, CAST(SUM(tscore) AS DECIMAL(18,6)) AS nll FROM scored GROUP BY 1)
        |SELECT d.doc_id, d.n_tokens,
        |  CAST(CAST(a.nll / CAST(d.n_tokens AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS avg_nll
        |FROM dl d JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q_c30_quality_classifier" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS toks
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, CAST(size(toks) AS BIGINT) AS n_tokens,
        |    aggregate(toks, 0L, (acc, w) ->
        |      acc + ((aggregate(split(w, ''), 0L,
        |               (a, ch) -> (a * 31 + ascii(ch)) % 1000000007L) % 64)
        |             * 1103515245L + 12345L) % 2048L - 1024L) AS wsum
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  CAST(CASE WHEN n_tokens = 0 THEN CAST(0 AS DECIMAL(38,6))
        |    ELSE CAST(CAST(wsum AS DECIMAL(18,6)) / CAST(n_tokens * 1024 AS DECIMAL(18,6)) AS DECIMAL(38,6)) END
        |    AS DOUBLE) AS score,
        |  CASE WHEN wsum > 0 THEN 'keep' ELSE 'drop' END AS cls
        |FROM h ORDER BY doc_id""".stripMargin,

    "q_c31_rules_filter" ->
      """WITH t AS (
        |  SELECT doc_id, filter(split(lower(text), ' '), w -> length(w) > 0) AS ws
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, CAST(size(ws) AS BIGINT) AS n_words,
        |    aggregate(ws, 0L, (a, w) -> a + length(w)) AS sumlen,
        |    CAST(size(array_intersect(ws, array('the','of','and','to','in'))) AS BIGINT) AS stop_hits,
        |    CAST(size(array_distinct(ws)) AS BIGINT) AS uniq
        |  FROM t)
        |SELECT doc_id, n_words,
        |  CAST(CASE WHEN n_words >= 50 THEN 1 ELSE 0 END AS INT) AS r_words,
        |  CAST(CASE WHEN 3 * n_words <= sumlen AND 2 * sumlen <= 9 * n_words THEN 1 ELSE 0 END AS INT) AS r_wlen,
        |  CAST(CASE WHEN stop_hits >= 1 THEN 1 ELSE 0 END AS INT) AS r_stop,
        |  CAST(CASE WHEN 5 * uniq >= 2 * n_words THEN 1 ELSE 0 END AS INT) AS r_ttr,
        |  CAST(CASE WHEN n_words >= 50 AND 3 * n_words <= sumlen
        |    AND 2 * sumlen <= 9 * n_words AND stop_hits >= 1
        |    AND 5 * uniq >= 2 * n_words THEN 1 ELSE 0 END AS INT) AS pass
        |FROM m ORDER BY doc_id""".stripMargin,

    "q_c32_bpe_pair_stats" ->
      """WITH toks AS (SELECT explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS word FROM documents),
        |wf AS (SELECT word, COUNT(*) AS wf FROM toks GROUP BY word),
        |pairs AS (
        |  SELECT word, wf,
        |    explode(transform(sequence(1, length(word) - 1),
        |      i -> substring(word, i, 2))) AS pair
        |  FROM wf WHERE length(word) >= 2)
        |SELECT pair, CAST(SUM(wf) AS BIGINT) AS n_occurrences,
        |  CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words
        |FROM pairs GROUP BY pair
        |ORDER BY n_occurrences DESC, pair LIMIT 20""".stripMargin,

    // ---- multimodal ------------------------------------------------------
    "q_c10_multimodal_stats" ->
      """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
        |            WHEN doc_id % 3 = 1 THEN 'audio'
        |            ELSE 'video' END AS kind,
        |  COUNT(*) AS n_media,
        |  CAST(SUM(length(encode(text, 'UTF-8'))) AS BIGINT) AS total_bytes,
        |  CAST(SUM(CAST(n_chars % 640 + 1 AS INT)) AS BIGINT) AS total_width
        |FROM documents
        |GROUP BY 1 ORDER BY kind""".stripMargin,

    // closed form of the media generators — parity vs the DataFrame plan's
    // REAL javax.imageio / javax.sound.sampled decode is a second golden
    // proof of the lossless codec round-trip
    "q_c11_media_features" ->
      """WITH img_d AS (
        |  SELECT doc_id, doc_id % 56 + 8 AS w, doc_id % 40 + 8 AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |img_x AS (SELECT doc_id, h, explode(sequence(0, w - 1)) AS x FROM img_d),
        |img_xy AS (SELECT doc_id, x, explode(sequence(0, h - 1)) AS y FROM img_x),
        |img AS (
        |  SELECT doc_id AS media_id, 'image' AS kind,
        |         COUNT(*) AS n_units,
        |         CAST(SUM((doc_id * 31 + x * 7 + y * 13) % 256) AS BIGINT) AS value_sum
        |  FROM img_xy GROUP BY doc_id),
        |aud_d AS (
        |  SELECT doc_id, doc_id % 800 + 100 AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |aud_i AS (SELECT doc_id, explode(sequence(0, n - 1)) AS i FROM aud_d),
        |aud AS (
        |  SELECT doc_id AS media_id, 'audio' AS kind,
        |         COUNT(*) AS n_units,
        |         CAST(SUM((doc_id * 7919 + i * 104729) % 65536 - 32768) AS BIGINT) AS value_sum
        |  FROM aud_i GROUP BY doc_id),
        |vid_d AS (
        |  SELECT doc_id, doc_id % 4 + 2 AS f
        |  FROM documents WHERE doc_id % 3 = 2),
        |vid_f AS (SELECT doc_id, f, explode(sequence(0, f - 1)) AS fr FROM vid_d),
        |vid_fx AS (SELECT doc_id, f, fr, explode(sequence(0, 15)) AS x
        |           FROM vid_f WHERE fr % 2 = 0),
        |vid_fxy AS (SELECT doc_id, f, fr, x, explode(sequence(0, 11)) AS y FROM vid_fx),
        |vid AS (
        |  SELECT doc_id AS media_id, 'video' AS kind,
        |         CAST(MAX(f) AS BIGINT) AS n_units,
        |         CAST(SUM((doc_id * 31 + fr * 17 + x * 7 + y * 13) % 256) AS BIGINT) AS value_sum
        |  FROM vid_fxy GROUP BY doc_id)
        |SELECT media_id, kind, n_units, value_sum FROM
        |  (SELECT * FROM img UNION ALL SELECT * FROM aud UNION ALL SELECT * FROM vid)
        |ORDER BY media_id""".stripMargin,

    // ---- training-pipeline extras (PipelineQueries) ------------------------
    // q_c13_dup_clusters is EXCLUDED like q_c9's training phase: its
    // connected-components fixpoint needs UNION-distinct recursion, and
    // Spark 4.1's recursive CTE supports only UNION ALL
    // (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE) — a UNION ALL recursion over
    // a cyclic (symmetrized) edge list never reaches the empty working
    // set. The candidate phase IS this dialect's q_c1 text; the fixpoint
    // runs as the iterative DataFrame loop. The DuckDB oracle uses
    // UNION-distinct recursion.

    "q_c14_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, explode(split(lower(text), ' ')) AS tok FROM documents),
        |tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
        |t AS (SELECT doc_id, SUM(c) AS n_tok, COUNT(*) AS n_distinct, MAX(c) AS top_tok
        |      FROM tc GROUP BY doc_id),
        |lists AS (SELECT doc_id, split(lower(text), ' ') AS ts FROM documents),
        |bg AS (
        |  SELECT doc_id,
        |         explode(transform(sequence(0, size(ts) - 2),
        |           k -> concat(ts[k], ' ', ts[k+1]))) AS bigram
        |  FROM lists WHERE size(ts) >= 2),
        |bc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram),
        |b AS (SELECT doc_id, SUM(c) AS n_big, MAX(c) AS top_big FROM bc GROUP BY doc_id)
        |SELECT t.doc_id, n_tok,
        |  CAST(CAST(1 - CAST(n_distinct AS DECIMAL(18,6)) / CAST(n_tok AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS dup_tok_ratio,
        |  CAST(CAST(CAST(top_tok AS DECIMAL(18,6)) / CAST(n_tok AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS top_tok_share,
        |  CAST(CAST(COALESCE(CAST(top_big AS DECIMAL(18,6)) / CAST(n_big AS DECIMAL(18,6)), 0) AS DECIMAL(38,6)) AS DOUBLE) AS top_bigram_share
        |FROM t LEFT JOIN b ON t.doc_id = b.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    // closed form of the NN resize over the pixel generator — parity vs
    // the DataFrame plan's REAL javax.imageio decode + resample
    "q_c18_media_resize" ->
      """WITH img_d AS (
        |  SELECT doc_id, doc_id % 56 + 8 AS w, doc_id % 40 + 8 AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |ox AS (SELECT doc_id, w, h, explode(sequence(0, 15)) AS x FROM img_d),
        |oxy AS (SELECT doc_id, w, h, x, explode(sequence(0, 11)) AS y FROM ox),
        |px AS (
        |  SELECT doc_id,
        |         (doc_id * 31 + ((x * w) DIV 16) * 7 + ((y * h) DIV 12) * 13) % 256 AS v
        |  FROM oxy)
        |SELECT doc_id AS media_id, CAST(16 AS BIGINT) AS out_w,
        |       CAST(12 AS BIGINT) AS out_h,
        |       CAST(SUM(v) AS BIGINT) AS resized_sum
        |FROM px GROUP BY doc_id ORDER BY media_id""".stripMargin,

    "q_c17_embedding_quantize" ->
      """WITH m AS (
        |  SELECT vec_id,
        |         CAST(array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS DOUBLE) AS mx,
        |         CAST(size(embedding) AS BIGINT) AS dim,
        |         embedding
        |  FROM embeddings),
        |e AS (
        |  SELECT vec_id, mx, dim, posexplode(embedding) AS (i, x)
        |  FROM m WHERE mx > 0D),
        |q AS (
        |  SELECT vec_id, mx, dim,
        |         CAST(round(CAST(x AS DOUBLE) * 127 / mx) AS BIGINT) AS qi,
        |         CAST(i AS BIGINT) AS i
        |  FROM e)
        |SELECT vec_id, dim,
        |  CAST(CAST(mx / 127 AS DECIMAL(18,6)) AS DOUBLE) AS scale,
        |  SUM(qi) AS qsum,
        |  SUM(qi * (i + 1)) AS qdot
        |FROM q GROUP BY vec_id, dim, mx
        |ORDER BY vec_id""".stripMargin,

    "q_c16_retained_corpus" ->
      """WITH t AS (
        |  SELECT doc_id, source, text, split(lower(text), ' ') AS toks
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, source, text FROM t
        |  WHERE size(toks) BETWEEN 10 AND 1000
        |    AND size(array_distinct(toks)) * 10 >= size(toks) * 3),
        |k AS (SELECT md5(text) AS h, MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)),
        |kept AS (SELECT q.doc_id, q.source FROM q JOIN k ON q.doc_id = k.doc_id),
        |r AS (
        |  SELECT doc_id, source,
        |         ROW_NUMBER() OVER (PARTITION BY source
        |           ORDER BY ((CAST(doc_id AS BIGINT) % 1000000007L) * 1103515245L + 12345L) % 1000000007L, doc_id) AS rnk
        |  FROM kept)
        |SELECT source, doc_id FROM r WHERE rnk <= 5
        |ORDER BY source, doc_id""".stripMargin,

    "q_c15_stratified_sample" ->
      """WITH h AS (
        |  SELECT doc_id, source,
        |         ((CAST(doc_id AS BIGINT) % 1000000007L) * 1103515245L + 12345L) % 1000000007L AS hv
        |  FROM documents),
        |r AS (SELECT doc_id, source, hv,
        |             ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rnk
        |      FROM h)
        |SELECT source, doc_id, hv, rnk FROM r WHERE rnk <= 10
        |ORDER BY source, rnk""".stripMargin,

    "q_c20_passage_dedup" ->
      """WITH lists AS (
        |  SELECT doc_id, split(lower(text), ' ') AS ts FROM documents),
        |ch AS (
        |  SELECT doc_id,
        |    explode(transform(sequence(0, (size(ts) + 7) DIV 8 - 1),
        |      k -> array_join(slice(ts, 8*k + 1, 8), ' '))) AS passage
        |  FROM lists),
        |g AS (SELECT passage, doc_id, COUNT(*) AS c FROM ch GROUP BY passage, doc_id),
        |pc AS (SELECT passage, COUNT(*) AS nd FROM g GROUP BY passage)
        |SELECT g.doc_id AS doc_id,
        |  SUM(c) AS n_passages,
        |  SUM(CASE WHEN nd > 1 THEN c ELSE 0L END) AS n_dup_passages,
        |  CAST(CAST(CAST(SUM(CASE WHEN nd > 1 THEN c ELSE 0L END) AS DECIMAL(18,6))
        |    / CAST(SUM(c) AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS dup_passage_ratio
        |FROM g JOIN pc USING (passage)
        |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin,

    "q_c21_scrub_redact" ->
      """SELECT doc_id,
        |  CAST(size(regexp_extract_all(text, '\\b(customer|value|key)\\b', 0)) AS BIGINT) AS n_redacted,
        |  regexp_replace(text, '\\b(customer|value|key)\\b', '[REDACTED]') AS clean_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_c23_boilerplate_scrub" ->
      """WITH lists AS (
        |  SELECT doc_id, split(lower(text), ' ') AS ts FROM documents),
        |ch AS (
        |  SELECT doc_id, posexplode(transform(sequence(0, (size(ts) + 7) DIV 8 - 1),
        |      k -> array_join(slice(ts, 8*k + 1, 8), ' '))) AS (k, passage)
        |  FROM lists),
        |pc AS (SELECT passage, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY passage)
        |SELECT doc_id,
        |  COUNT(*) AS n_passages,
        |  SUM(CASE WHEN nd > 1 THEN 1L ELSE 0L END) AS n_dropped,
        |  array_join(transform(array_sort(collect_list(
        |    CASE WHEN nd <= 1 THEN named_struct('k', k, 'passage', passage) END)),
        |    p -> p.passage), ' ') AS clean_text
        |FROM ch JOIN pc USING (passage)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_c24_decontaminate" ->
      """WITH lists AS (
        |  SELECT doc_id, split(lower(text), ' ') AS ts FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN size(ts) >= 13 THEN transform(sequence(0, size(ts) - 13),
        |      k -> array_join(slice(ts, k + 1, 13), ' ')) ELSE array() END AS ngs
        |  FROM lists),
        |bn AS (SELECT DISTINCT ng
        |       FROM (SELECT explode(ngs) AS ng FROM g WHERE doc_id % 7 = 0)),
        |cg AS (SELECT doc_id, ng
        |       FROM g LATERAL VIEW OUTER explode(ngs) t AS ng
        |       WHERE doc_id % 7 <> 0)
        |SELECT cg.doc_id,
        |  SUM(CASE WHEN cg.ng IS NOT NULL THEN 1L ELSE 0L END) AS n_ngrams,
        |  SUM(CASE WHEN bn.ng IS NOT NULL THEN 1L ELSE 0L END) AS n_contaminated,
        |  CASE WHEN SUM(CASE WHEN bn.ng IS NOT NULL THEN 1L ELSE 0L END) > 0
        |    THEN 1L ELSE 0L END AS contaminated
        |FROM cg LEFT JOIN bn ON cg.ng = bn.ng
        |GROUP BY cg.doc_id ORDER BY doc_id""".stripMargin,

    // value-identical simple-window form of the DataFrame program's
    // block-structured prefix sum (the blocking changes the plan shape,
    // not the arithmetic)
    "q_c28_source_mixture" ->
      """WITH w AS (
        |  SELECT source, CAST(length(source) % 3 + 1 AS BIGINT) AS wt
        |  FROM (SELECT DISTINCT source FROM documents)),
        |tot AS (SELECT CAST(SUM(wt) AS BIGINT) AS tw FROM w),
        |quota AS (
        |  SELECT /*+ BROADCAST(tot) */ source, CAST(200 * wt DIV tw AS BIGINT) AS n_take
        |  FROM w CROSS JOIN tot),
        |h AS (
        |  SELECT doc_id, source,
        |         ((CAST(doc_id AS BIGINT) % 1000000007L) * 1103515245L + 12345L) % 1000000007L AS hv
        |  FROM documents),
        |r AS (SELECT doc_id, source, hv,
        |             ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rnk
        |      FROM h)
        |SELECT /*+ BROADCAST(quota) */ r.source, r.doc_id, CAST(r.rnk AS BIGINT) AS rnk, q.n_take
        |FROM r JOIN quota q ON r.source = q.source
        |WHERE r.rnk <= q.n_take
        |ORDER BY r.source, r.rnk""".stripMargin,

    "q_c27_incremental_dedup" ->
      """WITH lists AS (
        |  SELECT doc_id, split(lower(text), ' ') AS ts FROM documents),
        |ngrams AS (
        |  SELECT doc_id, array_join(slice(ts, k + 1, 13), ' ') AS ng
        |  FROM (SELECT doc_id, ts, explode(sequence(0, size(ts) - 13)) AS k
        |        FROM lists WHERE size(ts) >= 13)),
        |newg AS (SELECT DISTINCT doc_id, ng FROM ngrams WHERE doc_id % 10 = 7),
        |retg AS (SELECT ng FROM ngrams WHERE doc_id % 10 <> 7),
        |hits AS (SELECT /*+ BROADCAST(n) */ n.doc_id, CAST(COUNT(DISTINCT n.ng) AS BIGINT) AS n_hit
        |         FROM newg n JOIN retg r ON n.ng = r.ng GROUP BY 1),
        |ngc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams FROM newg GROUP BY 1),
        |newh AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 = 7),
        |ex AS (SELECT /*+ BROADCAST(n) */ DISTINCT n.doc_id FROM newh n
        |       JOIN (SELECT md5(text) AS h FROM documents WHERE doc_id % 10 <> 7) r
        |         ON n.h = r.h)
        |SELECT d.doc_id,
        |  CAST(COALESCE(g.n_ngrams, 0) AS BIGINT) AS n_ngrams,
        |  CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
        |  CAST(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS exact_dup,
        |  CAST(CASE WHEN COALESCE(h.n_hit, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS near_candidate
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 7) d
        |LEFT JOIN ngc g USING (doc_id)
        |LEFT JOIN hits h USING (doc_id)
        |LEFT JOIN ex e USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q_c25_sequence_pack" ->
      """WITH t AS (
        |  SELECT doc_id, source, CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L) AS tok_start
        |  FROM t)
        |SELECT doc_id, source, n_tokens, tok_start,
        |  tok_start DIV 512 AS seq_start,
        |  (tok_start + n_tokens - 1) DIV 512 AS seq_end,
        |  (tok_start + n_tokens - 1) DIV 512 - tok_start DIV 512 + 1L AS n_seqs
        |FROM c ORDER BY source, doc_id""".stripMargin,

    "q_c36_dsir_resample" ->
      """WITH t AS (
        |  SELECT doc_id, lang, explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS w
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, lang,
        |    aggregate(split(w, ''), 0L, (a, ch) -> (a * 31 + ascii(ch)) % 1000000007L) % 64 AS b
        |  FROM t),
        |tfb AS (SELECT doc_id, lang, b, COUNT(*) AS tf FROM h GROUP BY doc_id, lang, b),
        |tgt AS (SELECT b, CAST(SUM(tf) AS BIGINT) AS ct FROM tfb WHERE lang = 'en' GROUP BY b),
        |raw AS (SELECT b, CAST(SUM(tf) AS BIGINT) AS cr FROM tfb GROUP BY b),
        |nt AS (SELECT CAST(SUM(ct) AS DOUBLE) AS nt FROM tgt),
        |nr AS (SELECT CAST(SUM(cr) AS DOUBLE) AS nr FROM raw),
        |lam AS (
        |  SELECT /*+ BROADCAST(s, u) */ r.b,
        |    CAST(ln(CAST(COALESCE(t.ct, 0L) + 1L AS DOUBLE) / (s.nt + 64.0D))
        |       - ln(CAST(r.cr + 1L AS DOUBLE) / (u.nr + 64.0D)) AS DECIMAL(18,6)) AS lam
        |  FROM raw r LEFT JOIN tgt t USING (b) CROSS JOIN nt s CROSS JOIN nr u),
        |sc AS (
        |  SELECT /*+ BROADCAST(l) */ f.doc_id,
        |    CAST(SUM(CAST(f.tf * CAST(l.lam AS DOUBLE) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS lw
        |  FROM tfb f JOIN lam l USING (b) GROUP BY f.doc_id),
        |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens FROM tfb GROUP BY doc_id)
        |SELECT d.doc_id, d.n_tokens, CAST(s.lw AS DOUBLE) AS log_weight
        |FROM sc s JOIN dl d USING (doc_id)
        |ORDER BY s.lw DESC, d.doc_id LIMIT 200""".stripMargin,

    // q_c38's twin is the RELATIONAL form of the native char_bigram_stats
    // expression — parity here proves the one-pass map-side kernel equals
    // the explode + groupBy plan bit-for-bit
    "q_c38_bigram_entropy" ->
      """WITH t AS (SELECT doc_id, lower(text) AS lt FROM documents),
        |g AS (
        |  SELECT doc_id, explode(transform(sequence(1, length(lt) - 1),
        |    i -> substring(lt, i, 2))) AS gm
        |  FROM t WHERE length(lt) >= 2),
        |c AS (SELECT doc_id, gm, COUNT(*) AS c FROM g GROUP BY doc_id, gm),
        |n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
        |             CAST(COUNT(*) AS BIGINT) AS n_distinct
        |      FROM c GROUP BY doc_id),
        |tm AS (SELECT c.doc_id,
        |         CAST(c.c * (ln(CAST(n.n_bigrams AS DOUBLE)) - ln(CAST(c.c AS DOUBLE))) AS DECIMAL(18,6)) AS term
        |       FROM c JOIN n USING (doc_id)),
        |a AS (SELECT doc_id, CAST(SUM(term) AS DECIMAL(18,6)) AS sm FROM tm GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(n.n_bigrams, 0L) AS n_bigrams,
        |  COALESCE(n.n_distinct, 0L) AS n_distinct,
        |  CAST(CASE WHEN n.n_bigrams IS NULL THEN CAST(0 AS DECIMAL(38,6))
        |       ELSE CAST(a.sm / CAST(n.n_bigrams AS DECIMAL(18,6)) AS DECIMAL(38,6)) END AS DOUBLE) AS entropy
        |FROM documents d LEFT JOIN n USING (doc_id) LEFT JOIN a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_c50_zipf_fit" ->
      """WITH toks AS (SELECT doc_id, explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS term FROM documents),
        |c1 AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY term),
        |top AS (SELECT term, cnt FROM c1 ORDER BY cnt DESC, term LIMIT 100),
        |r AS (SELECT term, cnt,
        |        CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS rnk
        |      FROM top),
        |q AS (SELECT term, cnt, rnk,
        |        CAST(ln(CAST(rnk AS DOUBLE)) AS DECIMAL(18,6)) AS x,
        |        CAST(ln(CAST(cnt AS DOUBLE)) AS DECIMAL(18,6)) AS y,
        |        CAST(ln(CAST(rnk AS DOUBLE)) * ln(CAST(cnt AS DOUBLE)) AS DECIMAL(18,6)) AS xy,
        |        CAST(ln(CAST(rnk AS DOUBLE)) * ln(CAST(rnk AS DOUBLE)) AS DECIMAL(18,6)) AS xx
        |      FROM r),
        |s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |             CAST(SUM(xy) AS DOUBLE) AS sxy, CAST(SUM(xx) AS DOUBLE) AS sxx
        |      FROM q),
        |fit AS (SELECT
        |          CASE WHEN s.n >= 2 THEN CAST(CAST((s.n * s.sxy - s.sx * s.sy) / (s.n * s.sxx - s.sx * s.sx) AS DECIMAL(18,6)) AS DOUBLE) END AS slope,
        |          CASE WHEN s.n >= 2 THEN CAST(CAST((s.sy - (s.n * s.sxy - s.sx * s.sy) / (s.n * s.sxx - s.sx * s.sx) * s.sx) / s.n AS DECIMAL(18,6)) AS DOUBLE) END AS intercept,
        |          CAST(s.n AS BIGINT) AS n_terms
        |        FROM s)
        |SELECT q.rnk, q.term, q.cnt, f.n_terms, f.slope, f.intercept
        |FROM q CROSS JOIN fit f WHERE q.rnk <= 10
        |ORDER BY q.rnk""".stripMargin,

    "q_c46_heaps_curve" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    ((doc_id % 1000000007L) * 1103515245L + 12345L) % 1000000007L % 10L AS bkt,
        |    regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS ts
        |  FROM documents),
        |docs AS (SELECT bkt, COUNT(*) AS n_docs,
        |                CAST(SUM(size(ts)) AS BIGINT) AS n_tokens
        |         FROM b GROUP BY bkt),
        |t AS (SELECT bkt, explode(ts) AS term FROM b),
        |fb AS (SELECT term, MIN(bkt) AS first_bkt FROM t GROUP BY term),
        |nv AS (SELECT first_bkt AS bkt, COUNT(*) AS new_terms FROM fb GROUP BY first_bkt),
        |lv AS (
        |  SELECT d.bkt AS level, d.n_docs, d.n_tokens, COALESCE(nv.new_terms, 0L) AS new_terms
        |  FROM docs d LEFT JOIN nv ON d.bkt = nv.bkt)
        |SELECT level,
        |  CAST(SUM(n_docs) OVER w AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) OVER w AS BIGINT) AS n_tokens,
        |  CAST(SUM(new_terms) OVER w AS BIGINT) AS vocab_size,
        |  CAST(new_terms AS BIGINT) AS new_terms
        |FROM lv
        |WINDOW w AS (ORDER BY level ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY level""".stripMargin,

    // q_c51's twin aggregates the PARQUET side in Spark SQL; the DataFrame
    // plan aggregates the JSONL re-read — parity IS the round-trip proof
    "q_c51_jsonl_roundtrip" ->
      """SELECT source,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
        |  CAST(SUM(CAST(conv(substring(md5(text), 1, 14), 16, 10) AS BIGINT) % 1000000007L) AS BIGINT) AS checksum,
        |  CAST(SUM(CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), lang)), 1, 14), 16, 10) AS BIGINT) % 1000000007L) AS BIGINT) AS meta_checksum
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q_c49_quality_ensemble" ->
      """WITH t AS (
        |  SELECT doc_id, filter(split(lower(text), ' '), w -> length(w) > 0) AS ws,
        |         regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS toks,
        |         lower(text) AS lt
        |  FROM documents),
        |rules AS (
        |  SELECT doc_id,
        |    CASE WHEN size(ws) >= 50
        |      AND 3 * size(ws) <= aggregate(ws, 0L, (a, w) -> a + length(w))
        |      AND 2 * aggregate(ws, 0L, (a, w) -> a + length(w)) <= 9 * size(ws)
        |      AND size(array_intersect(ws, array('the','of','and','to','in'))) >= 1
        |      AND 5 * size(array_distinct(ws)) >= 2 * size(ws)
        |    THEN 1 ELSE 0 END AS v_rules
        |  FROM t),
        |cls AS (
        |  SELECT doc_id,
        |    CASE WHEN aggregate(toks, 0L, (acc, w) ->
        |      acc + ((aggregate(split(w, ''), 0L,
        |               (a, ch) -> (a * 31 + ascii(ch)) % 1000000007L) % 64)
        |             * 1103515245L + 12345L) % 2048L - 1024L) > 0 THEN 1 ELSE 0 END AS v_cls
        |  FROM t),
        |gr AS (
        |  SELECT doc_id, explode(transform(sequence(1, length(lt) - 1),
        |    i -> substring(lt, i, 2))) AS gm
        |  FROM t WHERE length(lt) >= 2),
        |gc AS (SELECT doc_id, gm, COUNT(*) AS c FROM gr GROUP BY doc_id, gm),
        |gn AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM gc GROUP BY doc_id),
        |gt AS (SELECT gc.doc_id,
        |         CAST(gc.c * (ln(CAST(gn.n AS DOUBLE)) - ln(CAST(gc.c AS DOUBLE))) AS DECIMAL(18,6)) AS term
        |       FROM gc JOIN gn USING (doc_id)),
        |ga AS (SELECT doc_id, CAST(SUM(term) AS DECIMAL(18,6)) AS sm FROM gt GROUP BY doc_id),
        |ent AS (
        |  SELECT t.doc_id,
        |    CASE WHEN gn.n IS NULL THEN 0
        |         WHEN CAST(CAST(ga.sm / CAST(gn.n AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) >= 4.0D
        |         THEN 1 ELSE 0 END AS v_ent
        |  FROM t LEFT JOIN gn ON t.doc_id = gn.doc_id LEFT JOIN ga ON t.doc_id = ga.doc_id),
        |ptoks AS (SELECT doc_id, explode(toks) AS term FROM t),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM ptoks GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens FROM tf GROUP BY doc_id),
        |vocab AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY term),
        |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM vocab),
        |scored AS (
        |  SELECT tf.doc_id,
        |    CAST(tf.tf * -ln(CAST(v.cnt AS DOUBLE) / s.tot) AS DECIMAL(18,6)) AS tscore
        |  FROM tf JOIN vocab v USING (term) CROSS JOIN tot s),
        |agg AS (SELECT doc_id, CAST(SUM(tscore) AS DECIMAL(18,6)) AS nll FROM scored GROUP BY doc_id),
        |ppl AS (
        |  SELECT t.doc_id,
        |    CASE WHEN dl.n_tokens IS NULL THEN 0
        |         WHEN CAST(CAST(agg.nll / CAST(dl.n_tokens AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) <= 3.45D
        |         THEN 1 ELSE 0 END AS v_ppl
        |  FROM t LEFT JOIN dl ON t.doc_id = dl.doc_id LEFT JOIN agg ON t.doc_id = agg.doc_id)
        |SELECT r.doc_id, r.v_rules, c.v_cls, p.v_ppl, e.v_ent,
        |  r.v_rules + c.v_cls + p.v_ppl + e.v_ent AS n_pass,
        |  CASE WHEN r.v_rules + c.v_cls + p.v_ppl + e.v_ent >= 3 THEN 1 ELSE 0 END AS keep
        |FROM rules r JOIN cls c USING (doc_id) JOIN ppl p USING (doc_id) JOIN ent e USING (doc_id)
        |ORDER BY r.doc_id""".stripMargin,

    "q_c102_score_calibration" ->
      """WITH t AS (
        |  SELECT doc_id, filter(split(lower(text), ' '), w -> length(w) > 0) AS ws,
        |         regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS toks,
        |         lower(text) AS lt
        |  FROM documents),
        |rules AS (
        |  SELECT doc_id,
        |    CASE WHEN size(ws) >= 50
        |      AND 3 * size(ws) <= aggregate(ws, 0L, (a, w) -> a + length(w))
        |      AND 2 * aggregate(ws, 0L, (a, w) -> a + length(w)) <= 9 * size(ws)
        |      AND size(array_intersect(ws, array('the','of','and','to','in'))) >= 1
        |      AND 5 * size(array_distinct(ws)) >= 2 * size(ws)
        |    THEN 1 ELSE 0 END AS v_rules
        |  FROM t),
        |cls AS (
        |  SELECT doc_id, CAST(size(toks) AS BIGINT) AS n_toks,
        |    aggregate(toks, 0L, (acc, w) ->
        |      acc + ((aggregate(split(w, ''), 0L,
        |               (a, ch) -> (a * 31 + ascii(ch)) % 1000000007L) % 64)
        |             * 1103515245L + 12345L) % 2048L - 1024L) AS wsum
        |  FROM t),
        |gr AS (
        |  SELECT doc_id, explode(transform(sequence(1, length(lt) - 1),
        |    i -> substring(lt, i, 2))) AS gm
        |  FROM t WHERE length(lt) >= 2),
        |gc AS (SELECT doc_id, gm, COUNT(*) AS c FROM gr GROUP BY doc_id, gm),
        |gn AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM gc GROUP BY doc_id),
        |gt AS (SELECT gc.doc_id,
        |         CAST(gc.c * (ln(CAST(gn.n AS DOUBLE)) - ln(CAST(gc.c AS DOUBLE))) AS DECIMAL(18,6)) AS term
        |       FROM gc JOIN gn USING (doc_id)),
        |ga AS (SELECT doc_id, CAST(SUM(term) AS DECIMAL(18,6)) AS sm FROM gt GROUP BY doc_id),
        |ent AS (
        |  SELECT t.doc_id,
        |    CASE WHEN gn.n IS NULL THEN 0
        |         WHEN CAST(CAST(ga.sm / CAST(gn.n AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) >= 4.0D
        |         THEN 1 ELSE 0 END AS v_ent
        |  FROM t LEFT JOIN gn ON t.doc_id = gn.doc_id LEFT JOIN ga ON t.doc_id = ga.doc_id),
        |ptoks AS (SELECT doc_id, explode(toks) AS term FROM t),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM ptoks GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens FROM tf GROUP BY doc_id),
        |vocab AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY term),
        |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM vocab),
        |scored AS (
        |  SELECT tf.doc_id,
        |    CAST(tf.tf * -ln(CAST(v.cnt AS DOUBLE) / s.tot) AS DECIMAL(18,6)) AS tscore
        |  FROM tf JOIN vocab v USING (term) CROSS JOIN tot s),
        |agg AS (SELECT doc_id, CAST(SUM(tscore) AS DECIMAL(18,6)) AS nll FROM scored GROUP BY doc_id),
        |ppl AS (
        |  SELECT t.doc_id,
        |    CASE WHEN dl.n_tokens IS NULL THEN 0
        |         WHEN CAST(CAST(agg.nll / CAST(dl.n_tokens AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) <= 3.45D
        |         THEN 1 ELSE 0 END AS v_ppl
        |  FROM t LEFT JOIN dl ON t.doc_id = dl.doc_id LEFT JOIN agg ON t.doc_id = agg.doc_id),
        |sig AS (
        |  SELECT r.doc_id,
        |    CASE WHEN c.n_toks = 0 THEN CAST(5 AS BIGINT)
        |         ELSE CAST(10 * (c.wsum + c.n_toks * 1024) DIV (c.n_toks * 2048) AS BIGINT) END AS bin,
        |    CASE WHEN r.v_rules + p.v_ppl + e.v_ent >= 2 THEN 1 ELSE 0 END AS keep_others,
        |    CASE WHEN c.n_toks = 0 THEN CAST(0 AS DECIMAL(18,6))
        |         ELSE CAST(CAST(c.wsum AS DOUBLE) / CAST(c.n_toks * 1024 AS DOUBLE) AS DECIMAL(18,6)) END AS score_q
        |  FROM rules r JOIN cls c ON c.doc_id = r.doc_id
        |               JOIN ppl p ON p.doc_id = r.doc_id
        |               JOIN ent e ON e.doc_id = r.doc_id)
        |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(keep_others) AS BIGINT) AS n_kept_others,
        |  CAST(SUM(keep_others) * 1000000 DIV COUNT(*) AS BIGINT) AS keep_ppm,
        |  CAST(CAST(CAST(SUM(score_q) AS DECIMAL(18,6)) / CAST(COUNT(*) AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS mean_score
        |FROM sig GROUP BY bin ORDER BY bin""".stripMargin,

    "q_c59_doc_chunking" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS BIGINT) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n, explode(sequence(0L, n - 1, 112L)) AS t_start
        |  FROM t WHERE n >= 1)
        |SELECT doc_id,
        |  CAST(t_start / 112 AS BIGINT) AS chunk_id,
        |  CAST(t_start AS BIGINT) AS t_start,
        |  CAST(LEAST(128, n - t_start) AS BIGINT) AS n_chunk_tokens,
        |  CASE WHEN t_start + 128 >= n THEN 1 ELSE 0 END AS is_last
        |FROM c
        |ORDER BY doc_id, chunk_id""".stripMargin,

    "q_c60_source_overlap" ->
      """WITH d AS (SELECT DISTINCT md5(text) AS h, source FROM documents),
        |f AS (SELECT h FROM (SELECT md5(text) AS h FROM documents)
        |      GROUP BY h HAVING COUNT(*) > 1),
        |s AS (SELECT d.h, d.source FROM d JOIN f USING (h)),
        |p AS (
        |  SELECT a.h, a.source AS source_a, b.source AS source_b
        |  FROM s a JOIN s b ON a.h = b.h AND a.source < b.source)
        |SELECT source_a, source_b,
        |  CAST(COUNT(DISTINCT h) AS BIGINT) AS n_shared_families
        |FROM p GROUP BY source_a, source_b
        |ORDER BY source_a, source_b""".stripMargin,

    "q_c57_source_report" ->
      """WITH d AS (
        |  SELECT doc_id, source, lang, CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS BIGINT) AS n_tokens,
        |    md5(text) AS h
        |  FROM documents),
        |hc AS (SELECT h, COUNT(*) AS c FROM d GROUP BY h),
        |per AS (SELECT d.*, CASE WHEN hc.c > 1 THEN 1L ELSE 0L END AS is_dup
        |        FROM d JOIN hc USING (h)),
        |agg AS (
        |  SELECT source,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |    CAST(SUM(is_dup) AS BIGINT) AS n_dup_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |  FROM per GROUP BY source),
        |lc AS (SELECT source, lang, COUNT(*) AS c FROM d GROUP BY source, lang),
        |tl AS (SELECT source, lang AS top_lang FROM (
        |         SELECT source, lang, ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, lang) AS r
        |         FROM lc) WHERE r = 1)
        |SELECT a.source, a.n_docs, a.n_tokens, a.n_dup_docs,
        |  CAST(CAST(CAST(a.n_dup_docs AS DECIMAL(18,6))
        |       / CAST(a.n_docs AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS dup_ratio,
        |  CAST(CAST(CAST(a.n_chars AS DECIMAL(18,6))
        |       / CAST(a.n_docs AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS mean_chars,
        |  tl.top_lang
        |FROM agg a JOIN tl USING (source)
        |ORDER BY a.source""".stripMargin,

    "q_c56_epoch_shuffle" ->
      """WITH e AS (SELECT explode(array(CAST(0 AS BIGINT), CAST(1 AS BIGINT))) AS epoch),
        |k AS (
        |  SELECT e.epoch, d.doc_id,
        |    ((d.doc_id % 1000000007L) * 1103515245L + 12345L + e.epoch * 987654321L) % 1000000007L AS skey
        |  FROM documents d CROSS JOIN e),
        |b AS (SELECT epoch, doc_id, skey, skey % 64L AS batch_id FROM k),
        |r AS (SELECT epoch, batch_id, doc_id, skey,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY epoch, batch_id ORDER BY skey, doc_id) AS BIGINT) AS pos
        |      FROM b)
        |SELECT epoch, batch_id, pos, doc_id, skey FROM r
        |ORDER BY epoch, batch_id, pos""".stripMargin,

    "q_c101_batch_mixing" ->
      """WITH nmx AS (SELECT CAST(MAX(doc_id) AS BIGINT) AS mx FROM documents),
        |a AS (
        |  SELECT 'shuffled' AS mode,
        |         CAST(((doc_id % 1000000007L) * 1103515245L + 12345L) % 1000000007L % 64 AS BIGINT) AS batch_id,
        |         source
        |  FROM documents
        |  UNION ALL
        |  SELECT 'sequential',
        |         CAST(doc_id DIV ((nmx.mx + 64) DIV 64) AS BIGINT),
        |         source
        |  FROM documents CROSS JOIN nmx),
        |c AS (SELECT mode, batch_id, source, CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM a GROUP BY 1, 2, 3),
        |tot AS (SELECT mode, batch_id, CAST(SUM(cnt) AS BIGINT) AS n_docs
        |        FROM c GROUP BY 1, 2),
        |sh AS (SELECT c.mode, c.batch_id, c.cnt,
        |         CAST(c.cnt * 1000 DIV t.n_docs AS BIGINT) AS share_pm
        |       FROM c JOIN tot t ON t.mode = c.mode AND t.batch_id = c.batch_id),
        |g AS (SELECT mode, batch_id,
        |        CAST(COUNT(*) AS BIGINT) AS n_sources,
        |        CAST(MAX(share_pm) AS BIGINT) AS max_share_pm,
        |        CAST(SUM(share_pm * share_pm) DIV 1000 AS BIGINT) AS hhi_pm
        |      FROM sh GROUP BY 1, 2)
        |SELECT t.mode, t.batch_id, t.n_docs, g.n_sources,
        |       g.max_share_pm, g.hhi_pm
        |FROM tot t JOIN g ON g.mode = t.mode AND g.batch_id = t.batch_id
        |ORDER BY t.mode, t.batch_id""".stripMargin,

    "q_c54_tfidf_similarity" ->
      """WITH t1 AS (SELECT doc_id, explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS term FROM documents),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM t1 GROUP BY doc_id, term),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
        |idf AS (SELECT term, df, ln(CAST((SELECT n FROM nn) AS DOUBLE) / CAST(df AS DOUBLE)) AS idf
        |        FROM df WHERE df < (SELECT n FROM nn)),
        |nrm AS (SELECT tf.doc_id,
        |          sqrt(CAST(SUM(CAST(CAST(tf.tf AS DOUBLE) * CAST(tf.tf AS DOUBLE) * idf.idf * idf.idf AS DECIMAL(18,6))) AS DOUBLE)) AS nrm
        |        FROM tf JOIN idf USING (term) GROUP BY tf.doc_id),
        |q AS (SELECT doc_id AS q_doc, term, tf AS qtf FROM tf WHERE doc_id % 500 = 0 AND doc_id < 10000),
        |dots AS (SELECT q.q_doc, tf.doc_id,
        |           CAST(SUM(CAST(CAST(q.qtf AS DOUBLE) * CAST(tf.tf AS DOUBLE) * idf.idf * idf.idf AS DECIMAL(18,6))) AS DOUBLE) AS dot
        |         FROM q JOIN idf USING (term) JOIN tf USING (term)
        |         WHERE tf.doc_id <> q.q_doc
        |         GROUP BY q.q_doc, tf.doc_id),
        |sim AS (SELECT d.q_doc, d.doc_id,
        |          CAST(CAST(d.dot / (nq.nrm * nd.nrm) AS DECIMAL(18,6)) AS DOUBLE) AS sim
        |        FROM dots d
        |        JOIN nrm nq ON nq.doc_id = d.q_doc
        |        JOIN nrm nd ON nd.doc_id = d.doc_id
        |        WHERE nq.nrm > 0 AND nd.nrm > 0),
        |rk AS (SELECT q_doc, doc_id, sim,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY q_doc ORDER BY sim DESC, doc_id) AS BIGINT) AS rnk
        |       FROM sim)
        |SELECT q_doc, doc_id, sim, rnk FROM rk WHERE rnk <= 10
        |ORDER BY q_doc, rnk""".stripMargin,

    "q_c55_ngram_novelty" ->
      """WITH t AS (SELECT doc_id, split(lower(text), ' ') AS ts FROM documents),
        |g AS (
        |  SELECT doc_id, array_join(slice(ts, k + 1, 8), ' ') AS gram
        |  FROM (SELECT doc_id, ts, explode(sequence(0, size(ts) - 8)) AS k
        |        FROM t WHERE size(ts) >= 8)),
        |fo AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram),
        |pg AS (SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS cnt FROM g GROUP BY doc_id, gram),
        |agg AS (
        |  SELECT pg.doc_id,
        |    CAST(SUM(pg.cnt) AS BIGINT) AS n_grams,
        |    CAST(SUM(CASE WHEN fo.first_doc = pg.doc_id THEN pg.cnt ELSE 0L END) AS BIGINT) AS n_novel
        |  FROM pg JOIN fo USING (gram) GROUP BY pg.doc_id)
        |SELECT t.doc_id,
        |  COALESCE(agg.n_grams, 0L) AS n_grams,
        |  COALESCE(agg.n_novel, 0L) AS n_novel,
        |  CAST(CASE WHEN COALESCE(agg.n_grams, 0L) = 0 THEN CAST(0 AS DECIMAL(38,6))
        |       ELSE CAST(CAST(agg.n_novel AS DECIMAL(18,6))
        |            / CAST(agg.n_grams AS DECIMAL(18,6)) AS DECIMAL(38,6)) END AS DOUBLE) AS novelty
        |FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    "q_c48_substr_dedup" ->
      """WITH t AS (SELECT doc_id, split(lower(text), ' ') AS ts FROM documents),
        |g AS (
        |  SELECT doc_id, x.k AS k, x.gram AS gram
        |  FROM (SELECT doc_id, explode(transform(sequence(0, size(ts) - 15),
        |          k -> struct(k, array_join(slice(ts, k + 1, 15), ' ') AS gram))) AS x
        |        FROM t WHERE size(ts) >= 15)),
        |gc AS (SELECT gram, COUNT(*) AS cnt FROM g GROUP BY gram),
        |dupk AS (SELECT g.doc_id, g.k FROM g JOIN gc USING (gram) WHERE gc.cnt >= 2),
        |nd AS (SELECT doc_id, COUNT(*) AS n_dup_grams FROM dupk GROUP BY doc_id),
        |pos AS (SELECT doc_id, explode(sequence(0, size(ts) - 1)) AS p FROM t),
        |cov AS (
        |  SELECT DISTINCT pos.doc_id, pos.p
        |  FROM pos JOIN dupk ON pos.doc_id = dupk.doc_id
        |    AND dupk.k <= pos.p AND pos.p <= dupk.k + 14),
        |nc AS (SELECT doc_id, COUNT(*) AS n_cov_tokens FROM cov GROUP BY doc_id)
        |SELECT t.doc_id, CAST(size(t.ts) AS BIGINT) AS n_tokens,
        |  COALESCE(nd.n_dup_grams, 0L) AS n_dup_grams,
        |  COALESCE(nc.n_cov_tokens, 0L) AS n_cov_tokens,
        |  CAST(CASE WHEN size(t.ts) = 0 THEN CAST(0 AS DECIMAL(38,6))
        |       ELSE CAST(CAST(COALESCE(nc.n_cov_tokens, 0L) AS DECIMAL(18,6))
        |            / CAST(size(t.ts) AS DECIMAL(18,6)) AS DECIMAL(38,6)) END AS DOUBLE) AS cov_ratio
        |FROM t LEFT JOIN nd ON t.doc_id = nd.doc_id
        |LEFT JOIN nc ON t.doc_id = nc.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    "q_c47_fuzzy_decontaminate" ->
      s"""WITH $fuzzyFzCtes
         |SELECT doc_id, bench_id, shared, uni, jaccard FROM fz
         |ORDER BY doc_id, bench_id""".stripMargin,

    "q_c73_contamination_report" ->
      s"""WITH $fuzzyFzCtes,
         |bg AS (
         |  SELECT DISTINCT doc_id AS bench_id, array_join(slice(t, k + 1, 13), ' ') AS ng
         |  FROM (SELECT doc_id, t, explode(sequence(0, size(t) - 13)) AS k
         |        FROM toks WHERE size(t) >= 13 AND doc_id % 17 = 3)),
         |bn AS (SELECT bench_id, COUNT(*) AS n_grams FROM bg GROUP BY bench_id),
         |cg AS (
         |  SELECT doc_id, array_join(slice(t, k + 1, 13), ' ') AS ng
         |  FROM (SELECT doc_id, t, explode(sequence(0, size(t) - 13)) AS k
         |        FROM toks WHERE size(t) >= 13 AND doc_id % 17 <> 3)),
         |hit AS (
         |  SELECT bg.bench_id, COUNT(DISTINCT bg.ng) AS n_hit_grams,
         |         COUNT(DISTINCT cg.doc_id) AS n_exact_partners
         |  FROM cg JOIN bg ON cg.ng = bg.ng GROUP BY bg.bench_id),
         |fzagg AS (
         |  SELECT bench_id, COUNT(*) AS n_fuzzy_partners,
         |         MAX(jaccard) AS max_jaccard
         |  FROM fz GROUP BY bench_id),
         |bd AS (SELECT doc_id AS bench_id FROM documents WHERE doc_id % 17 = 3)
         |SELECT bd.bench_id,
         |  CAST(COALESCE(bn.n_grams, 0) AS BIGINT) AS n_grams,
         |  CAST(COALESCE(hit.n_hit_grams, 0) AS BIGINT) AS n_hit_grams,
         |  CAST(COALESCE(hit.n_exact_partners, 0) AS BIGINT) AS n_exact_partners,
         |  CAST(COALESCE(fzagg.n_fuzzy_partners, 0) AS BIGINT) AS n_fuzzy_partners,
         |  CAST(COALESCE(fzagg.max_jaccard, 0.0D) AS DOUBLE) AS max_jaccard,
         |  CASE WHEN COALESCE(hit.n_hit_grams, 0) > 0 THEN 'exact'
         |       WHEN COALESCE(fzagg.n_fuzzy_partners, 0) > 0 THEN 'fuzzy'
         |       ELSE 'clean' END AS verdict
         |FROM bd
         |LEFT JOIN bn ON bd.bench_id = bn.bench_id
         |LEFT JOIN hit ON bd.bench_id = hit.bench_id
         |LEFT JOIN fzagg ON bd.bench_id = fzagg.bench_id
         |ORDER BY bd.bench_id""".stripMargin,

    "q_c44_bigram_logprob" ->
      """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS ts FROM documents),
        |t1 AS (SELECT doc_id, explode(ts) AS term FROM toks),
        |tf1 AS (SELECT doc_id, term, COUNT(*) AS tf FROM t1 GROUP BY doc_id, term),
        |c1 AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS n1 FROM tf1 GROUP BY term),
        |tot AS (SELECT CAST(SUM(n1) AS DOUBLE) AS t FROM c1),
        |prs AS (
        |  SELECT doc_id, p.w1 AS w1, p.w2 AS w2
        |  FROM (SELECT doc_id, explode(transform(sequence(1, size(ts) - 1),
        |          i -> struct(element_at(ts, i) AS w1, element_at(ts, i + 1) AS w2))) AS p
        |        FROM toks WHERE size(ts) >= 2)),
        |tf2 AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS k FROM prs GROUP BY doc_id, w1, w2),
        |c2 AS (SELECT w1, w2, CAST(SUM(k) AS BIGINT) AS n2 FROM tf2 GROUP BY w1, w2),
        |sc AS (
        |  SELECT f.doc_id,
        |    CAST(f.k * -ln(0.9D * (CAST(c2.n2 AS DOUBLE) / CAST(a.n1 AS DOUBLE))
        |                 + 0.1D * (CAST(b.n1 AS DOUBLE) / s.t)) AS DECIMAL(18,6)) AS term
        |  FROM tf2 f JOIN c2 USING (w1, w2)
        |  JOIN c1 a ON f.w1 = a.term JOIN c1 b ON f.w2 = b.term
        |  CROSS JOIN tot s),
        |agg AS (SELECT doc_id, CAST(SUM(term) AS DECIMAL(18,6)) AS nll FROM sc GROUP BY doc_id),
        |np AS (SELECT doc_id, CAST(size(ts) AS BIGINT) AS n_tokens,
        |              CAST(GREATEST(size(ts) - 1, 0) AS BIGINT) AS n_pairs FROM toks)
        |SELECT np.doc_id, np.n_tokens, np.n_pairs,
        |  CAST(CASE WHEN np.n_pairs = 0 OR agg.nll IS NULL THEN CAST(0 AS DECIMAL(38,6))
        |       ELSE CAST(agg.nll / CAST(np.n_pairs AS DECIMAL(18,6)) AS DECIMAL(38,6)) END AS DOUBLE) AS avg_nll
        |FROM np LEFT JOIN agg USING (doc_id)
        |ORDER BY np.doc_id""".stripMargin,

    // q_c52's twin assembles the same record with the media branch in
    // CLOSED FORM (the q_c11 convention) — parity re-proves the real
    // decode inside the joined result
    "q_c52_sample_assembly" ->
      """WITH txt AS (
        |  SELECT doc_id, source,
        |         CAST(size(filter(split(lower(text), ' '), w -> length(w) > 0)) AS BIGINT) AS n_tokens,
        |         CAST(length(text) AS BIGINT) AS n_chars
        |  FROM documents),
        |emb AS (
        |  SELECT vec_id,
        |         CAST(size(embedding) AS BIGINT) AS emb_dim,
        |         CAST(CAST(array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127D AS DECIMAL(18,6)) AS DOUBLE) AS emb_scale,
        |         aggregate(embedding, 0L, (a, x) -> a + CAST(round(CAST(x AS DOUBLE) * 127 /
        |           array_max(transform(embedding, y -> abs(CAST(y AS DOUBLE))))) AS BIGINT)) AS emb_qsum
        |  FROM embeddings
        |  WHERE array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0),
        |img AS (
        |  SELECT doc_id AS media_id, 'image' AS kind,
        |         CAST((doc_id % 56 + 8) * (doc_id % 40 + 8) AS BIGINT) AS n_units,
        |         aggregate(flatten(transform(sequence(0, CAST(doc_id % 56 + 8 AS INT) - 1),
        |           x -> transform(sequence(0, CAST(doc_id % 40 + 8 AS INT) - 1),
        |             y -> (doc_id * 31 + x * 7 + y * 13) % 256))), 0L, (a, v) -> a + v) AS value_sum
        |  FROM documents WHERE doc_id % 3 = 0),
        |aud AS (
        |  SELECT doc_id AS media_id, 'audio' AS kind,
        |         CAST(doc_id % 800 + 100 AS BIGINT) AS n_units,
        |         aggregate(transform(sequence(0, CAST(doc_id % 800 + 100 AS INT) - 1),
        |           i -> (doc_id * 7919 + i * 104729L) % 65536 - 32768), 0L, (a, v) -> a + v) AS value_sum
        |  FROM documents WHERE doc_id % 3 = 1),
        |vid AS (
        |  SELECT doc_id AS media_id, 'video' AS kind,
        |         CAST(doc_id % 4 + 2 AS BIGINT) AS n_units,
        |         aggregate(flatten(flatten(transform(
        |           filter(sequence(0, CAST(doc_id % 4 + 2 AS INT) - 1), fr -> fr % 2 = 0),
        |           fr -> transform(sequence(0, 15), x -> transform(sequence(0, 11),
        |             y -> (doc_id * 31 + fr * 17 + x * 7 + y * 13) % 256))))),
        |           0L, (a, v) -> a + v) AS value_sum
        |  FROM documents WHERE doc_id % 3 = 2),
        |med AS (SELECT * FROM img UNION ALL SELECT * FROM aud UNION ALL SELECT * FROM vid)
        |SELECT t.doc_id, t.source, t.n_tokens, t.n_chars,
        |       e.emb_dim, e.emb_scale, e.emb_qsum,
        |       md.kind, md.n_units, md.value_sum
        |FROM txt t
        |JOIN emb e ON t.doc_id = e.vec_id
        |JOIN med md ON t.doc_id = md.media_id
        |ORDER BY t.doc_id""".stripMargin,

    // q_c41's twin is the CLOSED-FORM generator arithmetic (the
    // q_c11/q_c18 convention): the DataFrame plan hashes real decoded
    // PNG pixels, so parity here re-proves the codec round-trip
    "q_c41_media_neardup" ->
      """WITH d AS (
        |  SELECT doc_id AS id,
        |    CASE WHEN (doc_id DIV 8) % 3 = 0 THEN doc_id * 1000003L + 500000009L
        |         ELSE doc_id DIV 8 END AS base
        |  FROM documents),
        |dim AS (SELECT id, base, base % 56 + 8 AS w, base % 40 + 8 AS h FROM d),
        |gxy AS (SELECT id, base, w, h, x, explode(sequence(0, 7)) AS y
        |        FROM (SELECT id, base, w, h, explode(sequence(0, 7)) AS x FROM dim)),
        |smp AS (
        |  SELECT id, x, y,
        |    (base * 31 + ((x * w) DIV 8) * 7 + ((y * h) DIV 8) * 13
        |     + CASE WHEN (((x * w) DIV 8) * 31 + ((y * h) DIV 8) * 17 + id * 13) % 149 = 0
        |            THEN 1 ELSE 0 END) % 256 AS v
        |  FROM gxy),
        |tot AS (SELECT id, SUM(v) AS s FROM smp GROUP BY id),
        |bits AS (
        |  SELECT smp.id,
        |    array_join(transform(array_sort(collect_list(named_struct(
        |      'p', smp.y * 8 + smp.x,
        |      'b', CASE WHEN smp.v * 64 > t.s THEN '1' ELSE '0' END))), e -> e.b), '') AS ahash
        |  FROM smp JOIN tot t ON smp.id = t.id GROUP BY smp.id),
        |cl AS (SELECT ahash, COUNT(*) AS n_members, MIN(id) AS rep_id
        |       FROM bits GROUP BY ahash)
        |SELECT b.id AS media_id, b.ahash, c.n_members, c.rep_id,
        |  CAST(CASE WHEN c.n_members > 1 THEN 1 ELSE 0 END AS BIGINT) AS is_neardup
        |FROM bits b JOIN cl c USING (ahash)
        |ORDER BY media_id""".stripMargin,

    "q_c37_corpus_split" ->
      """WITH h AS (
        |  SELECT doc_id, source,
        |    ((doc_id % 1000000007L) * 1103515245L + 12345L) % 1000000007L % 1000L AS bucket
        |  FROM documents)
        |SELECT doc_id, source, bucket,
        |  CASE WHEN bucket < 800 THEN 'train'
        |       WHEN bucket < 900 THEN 'val' ELSE 'test' END AS split
        |FROM h ORDER BY doc_id""".stripMargin,

    // q_c61's twin derives the Bloom test RELATIONALLY (position-set
    // containment) — parity with the DataFrame plan therefore validates
    // the codegen'd BloomMaybeContains expression against a pure-SQL
    // derivation of the same double-hashing family.
    "q_c61_bloom_ingest" ->
      """WITH r AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 10 <> 3),
        |rh AS (SELECT DISTINCT h,
        |         CAST(conv(substr(h, 1, 12), 16, 10) AS BIGINT) AS h1,
        |         CAST(conv(substr(h, 13, 12), 16, 10) AS BIGINT) AS h2 FROM r),
        |rp AS (SELECT DISTINCT (h1 + i * h2) % 1048576 AS pos
        |       FROM rh LATERAL VIEW explode(sequence(0L, 4L)) t AS i),
        |inc AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 2 = 1),
        |ih AS (SELECT doc_id,
        |         CAST(conv(substr(h, 1, 12), 16, 10) AS BIGINT) AS h1,
        |         CAST(conv(substr(h, 13, 12), 16, 10) AS BIGINT) AS h2 FROM inc),
        |ip AS (SELECT doc_id, (h1 + i * h2) % 1048576 AS pos
        |       FROM ih LATERAL VIEW explode(sequence(0L, 4L)) t AS i),
        |np AS (SELECT doc_id, COUNT(DISTINCT pos) AS n FROM ip GROUP BY doc_id),
        |mp AS (SELECT ip.doc_id, COUNT(DISTINCT ip.pos) AS nm
        |       FROM ip JOIN rp USING (pos) GROUP BY ip.doc_id),
        |bp AS (SELECT np.doc_id FROM np JOIN mp USING (doc_id) WHERE np.n = mp.nm),
        |ex AS (SELECT DISTINCT i.doc_id FROM inc i JOIN r ON i.h = r.h)
        |SELECT i.doc_id,
        |  CAST(CASE WHEN bp.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS bloom_positive,
        |  CAST(CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS exact_dup,
        |  CAST(CASE WHEN ex.doc_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS admitted
        |FROM inc i
        |LEFT JOIN bp ON i.doc_id = bp.doc_id
        |LEFT JOIN ex ON i.doc_id = ex.doc_id
        |ORDER BY i.doc_id""".stripMargin,

    "q_c69_source_kl" ->
      """WITH toks AS (SELECT doc_id, explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |src AS (SELECT doc_id, source FROM documents),
        |st AS (SELECT s.source, t.term, CAST(SUM(t.tf) AS BIGINT) AS cst
        |       FROM tf t JOIN src s USING (doc_id) GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(SUM(cst) AS BIGINT) AS ns FROM st GROUP BY 1),
        |ct AS (SELECT term, CAST(SUM(cst) AS BIGINT) AS ct FROM st GROUP BY 1),
        |nc AS (SELECT CAST(SUM(ct) AS DOUBLE) AS nc FROM ct),
        |k AS (
        |  SELECT st.source,
        |    CAST((CAST(st.cst AS DOUBLE) / CAST(ns.ns AS DOUBLE)) *
        |         ln((CAST(st.cst AS DOUBLE) * nc.nc)
        |            / (CAST(ns.ns AS DOUBLE) * CAST(ct.ct AS DOUBLE)))
        |      AS DECIMAL(18,6)) AS kterm
        |  FROM st JOIN ns USING (source) JOIN ct USING (term) CROSS JOIN nc),
        |agg AS (SELECT source, CAST(SUM(kterm) AS DECIMAL(18,6)) AS klsum,
        |               CAST(COUNT(*) AS BIGINT) AS n_terms
        |        FROM k GROUP BY 1)
        |SELECT a.source, ns.ns AS src_tokens, a.n_terms,
        |  CAST(CAST(a.klsum AS DECIMAL(38,6)) AS DOUBLE) AS kl
        |FROM agg a JOIN ns USING (source)
        |ORDER BY a.source""".stripMargin,

    "q_c99_doremi_weights" ->
      """WITH toks AS (SELECT doc_id, explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |src AS (SELECT doc_id, source FROM documents),
        |st AS (SELECT s.source, t.term, CAST(SUM(t.tf) AS BIGINT) AS cst
        |       FROM tf t JOIN src s USING (doc_id) GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(SUM(cst) AS BIGINT) AS ns FROM st GROUP BY 1),
        |ct AS (SELECT term, CAST(SUM(cst) AS BIGINT) AS ct FROM st GROUP BY 1),
        |nc AS (SELECT CAST(SUM(ct) AS DOUBLE) AS nc FROM ct),
        |k AS (
        |  SELECT st.source,
        |    CAST((CAST(st.cst AS DOUBLE) / CAST(ns.ns AS DOUBLE)) *
        |         ln((CAST(st.cst AS DOUBLE) * nc.nc)
        |            / (CAST(ns.ns AS DOUBLE) * CAST(ct.ct AS DOUBLE)))
        |      AS DECIMAL(18,6)) AS kterm
        |  FROM st JOIN ns USING (source) JOIN ct USING (term) CROSS JOIN nc),
        |agg AS (SELECT source, CAST(SUM(kterm) AS DECIMAL(18,6)) AS klsum,
        |               CAST(COUNT(*) AS BIGINT) AS n_terms
        |        FROM k GROUP BY 1),
        |j AS (SELECT a.source, ns.ns, a.n_terms,
        |        CAST(CAST(a.klsum AS DECIMAL(38,6)) AS DOUBLE) AS kl,
        |        GREATEST(CAST(a.klsum * 1000000 AS BIGINT), 0L) DIV 1000 AS kl_milli
        |      FROM agg a JOIN ns USING (source)),
        |tt AS (SELECT CAST(SUM(ns) AS BIGINT) AS tot FROM ns),
        |w AS (SELECT j.*, (j.ns DIV 1000 + 1) * (1000 + j.kl_milli) AS wnum FROM j),
        |sw AS (SELECT CAST(SUM(wnum) AS BIGINT) AS sw FROM w)
        |SELECT w.source, w.ns AS src_tokens, w.n_terms, w.kl,
        |  CAST(w.kl_milli AS BIGINT) AS kl_milli,
        |  CAST(w.ns DIV (tt.tot DIV 1000000 + 1) AS BIGINT) AS share_ppm,
        |  CAST(w.wnum DIV (sw.sw DIV 1000000 + 1) AS BIGINT) AS w_ppm,
        |  CAST(w.wnum DIV (sw.sw DIV 1000000 + 1)
        |       - w.ns DIV (tt.tot DIV 1000000 + 1) AS BIGINT) AS delta_ppm
        |FROM w CROSS JOIN tt CROSS JOIN sw
        |ORDER BY w.source""".stripMargin,

    "q_c62_temperature_mix" ->
      """WITH t AS (
        |  SELECT doc_id, source, CAST(size(split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |s AS (
        |  SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tokens,
        |         CAST(FLOOR(SQRT(CAST(SUM(n_tok) AS DOUBLE))) AS BIGINT) AS w
        |  FROM t GROUP BY source),
        |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw,
        |               CAST(SUM(src_tokens) DIV 4 AS BIGINT) AS budget FROM s),
        |thr AS (
        |  SELECT source, src_tokens, w,
        |         LEAST(1000000L, (1000000L * budget * w) DIV (tw * src_tokens)) AS thr_micro
        |  FROM s CROSS JOIN tot),
        |h AS (
        |  SELECT doc_id, source,
        |    (((((doc_id % 1000000007L) * 1103515245L + 12345L) % 1000000007L)
        |       * 1103515245L + 12345L) % 1000000007L) % 1000000L AS draw
        |  FROM t)
        |SELECT h.doc_id, h.source, r.src_tokens, r.w,
        |  CAST(r.thr_micro AS BIGINT) AS thr_micro,
        |  CAST(CASE WHEN h.draw < r.thr_micro THEN 1 ELSE 0 END AS BIGINT) AS sampled
        |FROM h JOIN thr r ON h.source = r.source
        |ORDER BY h.doc_id""".stripMargin,

    "q_c63_padding_waste" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(size(split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, (n + 127) DIV 128 - 1 AS nfull,
        |         n - ((n + 127) DIV 128 - 1) * 128 AS r
        |  FROM t),
        |seqs AS (
        |  SELECT CAST(128 AS BIGINT) AS bucket, nfull AS n_seqs, nfull * 128 AS used
        |  FROM c WHERE nfull > 0
        |  UNION ALL
        |  SELECT CAST(CASE WHEN r <= 16 THEN 16 WHEN r <= 32 THEN 32
        |                   WHEN r <= 64 THEN 64 ELSE 128 END AS BIGINT),
        |         CAST(1 AS BIGINT), r
        |  FROM c)
        |SELECT bucket,
        |  CAST(SUM(n_seqs) AS BIGINT) AS n_seqs,
        |  CAST(SUM(used) AS BIGINT) AS used_tokens,
        |  CAST(bucket * SUM(n_seqs) AS BIGINT) AS slots,
        |  CAST(bucket * SUM(n_seqs) - SUM(used) AS BIGINT) AS padded_slots,
        |  CAST(CAST(CAST(bucket * SUM(n_seqs) - SUM(used) AS DECIMAL(18,6))
        |    / CAST(bucket * SUM(n_seqs) AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE)
        |    AS waste_ratio
        |FROM seqs GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_c85_candidate_agreement" ->
      s"""WITH $minhashCandCtes,
         |$sparkJaccardTail,
         |wg AS (SELECT doc_id,
         |  transform(sequence(0, size(toks) - 3), i ->
         |    aggregate(split(concat_ws(' ', toks[i], toks[i+1], toks[i+2]), ''), 0L,
         |      (acc, ch) -> (acc * 31 + ascii(ch)) % 1000000007L)) AS hs
         |  FROM t WHERE size(toks) >= 3),
         |ww AS (SELECT doc_id,
         |  CASE WHEN size(hs) >= 4
         |       THEN transform(sequence(0, size(hs) - 4), p -> array_min(slice(hs, p + 1, 4)))
         |       ELSE array(array_min(hs)) END AS sel
         |  FROM wg),
         |wfp AS (SELECT DISTINCT doc_id, fp FROM
         |        (SELECT doc_id, explode(sel) AS fp FROM ww)),
         |wdfc AS (SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY fp) AS dfc FROM wfp),
         |wkept AS (SELECT doc_id, fp FROM wdfc WHERE dfc <= 50),
         |wp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |       FROM wkept a JOIN wkept b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |u AS (
         |  SELECT doc_a, doc_b, 1 AS f1, 0 AS f2, 0 AS f3 FROM cand
         |  UNION ALL SELECT doc_a, doc_b, 0, 1, 0 FROM wp
         |  UNION ALL SELECT doc_a, doc_b, 0, 0, 1 FROM jp),
         |m AS (SELECT doc_a, doc_b, MAX(f1) AS f1, MAX(f2) AS f2, MAX(f3) AS f3
         |      FROM u GROUP BY 1, 2)
         |SELECT CAST(f1 AS INT) AS in_minhash, CAST(f2 AS INT) AS in_winnow,
         |       CAST(f3 AS INT) AS in_jaccard, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM m GROUP BY 1, 2, 3
         |ORDER BY in_minhash, in_winnow, in_jaccard""".stripMargin,

    "q_c84_kn_heldout_ppl" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS ts FROM documents),
        |bg AS (SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        |       FROM (SELECT doc_id, ts, explode(sequence(0, size(ts) - 2)) AS i FROM t WHERE size(ts) >= 2)),
        |trn AS (SELECT w1, w2 FROM bg WHERE doc_id % 17 <> 3),
        |cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt FROM trn GROUP BY 1, 2),
        |lt AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS left_total,
        |              CAST(COUNT(*) AS BIGINT) AS left_types FROM cb GROUP BY 1),
        |ct AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS cont_types FROM cb GROUP BY 1),
        |dsc AS (SELECT
        |    CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
        |    CAST(SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
        |    CAST(COUNT(*) AS DOUBLE) AS types FROM cb),
        |vv AS (SELECT CAST(COUNT(DISTINCT term) AS DOUBLE) AS v
        |       FROM (SELECT explode(ts) AS term FROM t WHERE doc_id % 17 <> 3)),
        |hb AS (SELECT doc_id, w1, w2 FROM bg WHERE doc_id % 17 = 3),
        |sc AS (SELECT hb.doc_id,
        |  CAST(-ln(
        |    CASE WHEN cb.cnt IS NOT NULL THEN
        |      (CAST(cb.cnt AS DOUBLE)
        |         - (CASE WHEN d.n1 + 2 * d.n2 > 0 THEN d.n1 / (d.n1 + 2 * d.n2) ELSE 0.5D END))
        |        / CAST(lt.left_total AS DOUBLE)
        |      + (CASE WHEN d.n1 + 2 * d.n2 > 0 THEN d.n1 / (d.n1 + 2 * d.n2) ELSE 0.5D END)
        |        * CAST(lt.left_types AS DOUBLE) / CAST(lt.left_total AS DOUBLE)
        |        * ((CAST(COALESCE(ct.cont_types, 0L) AS DOUBLE) + 1) / (d.types + vv.v))
        |    WHEN lt.w1 IS NOT NULL THEN
        |      (CASE WHEN d.n1 + 2 * d.n2 > 0 THEN d.n1 / (d.n1 + 2 * d.n2) ELSE 0.5D END)
        |        * CAST(lt.left_types AS DOUBLE) / CAST(lt.left_total AS DOUBLE)
        |        * ((CAST(COALESCE(ct.cont_types, 0L) AS DOUBLE) + 1) / (d.types + vv.v))
        |    ELSE ((CAST(COALESCE(ct.cont_types, 0L) AS DOUBLE) + 1) / (d.types + vv.v))
        |    END) AS DECIMAL(18,6)) AS nll
        |  FROM hb LEFT JOIN cb ON cb.w1 = hb.w1 AND cb.w2 = hb.w2
        |          LEFT JOIN lt ON lt.w1 = hb.w1
        |          LEFT JOIN ct ON ct.w2 = hb.w2
        |          CROSS JOIN dsc d CROSS JOIN vv)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(CAST(CAST(SUM(nll) AS DECIMAL(18,6)) / CAST(COUNT(*) AS DECIMAL(18,6))
        |    AS DECIMAL(38,6)) AS DOUBLE) AS avg_nll
        |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "q_c83_mlm_masking" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS ts
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, ts,
        |    transform(ts, (w, i) -> CASE WHEN (((doc_id % 1000000007L) + i) * 1103515245L + 12345L) % 1000000007L % 1000L < 150L THEN 1 ELSE 0 END) AS mk
        |  FROM t)
        |SELECT doc_id,
        |  CAST(size(ts) AS BIGINT) AS n_tokens,
        |  CAST(aggregate(mk, 0L, (a, x) -> a + x) AS BIGINT) AS n_masked,
        |  array_join(zip_with(ts, mk, (w, m) -> IF(m = 1, '<mask>', w)), ' ') AS masked_text,
        |  array_join(zip_with(ts, mk, (w, m) -> IF(m = 1, w, NULL)), ' ') AS targets
        |FROM m ORDER BY doc_id""".stripMargin,

    "q_c81_weighted_sample" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CAST(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS BIGINT) AS n_tokens,
        |    ((doc_id % 1000000007L) * 1103515245L + 12345L) % 1000000007L AS hv
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, n_tokens, CAST(hv AS BIGINT) AS hv,
        |    CAST(CAST(ln(CAST(hv + 1 AS DOUBLE) / CAST(1000000008 AS DOUBLE)) / n_tokens
        |      AS DECIMAL(18,6)) AS DOUBLE) AS es_key
        |  FROM h WHERE n_tokens > 0),
        |sel AS (SELECT * FROM k ORDER BY es_key DESC, doc_id LIMIT 200)
        |SELECT doc_id, n_tokens, hv, es_key,
        |  CAST(ROW_NUMBER() OVER (ORDER BY es_key DESC, doc_id) AS BIGINT) AS rnk
        |FROM sel ORDER BY rnk""".stripMargin,

    "q_c82_epoch_plan" ->
      """WITH st AS (
        |  SELECT source,
        |    CAST(SUM(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))) AS BIGINT) AS toks
        |  FROM documents GROUP BY 1),
        |w AS (SELECT source, toks, CAST(length(source) % 3 + 1 AS BIGINT) AS wt FROM st),
        |tot AS (SELECT CAST(SUM(toks) AS BIGINT) * 4 AS budget,
        |               CAST(SUM(wt) AS BIGINT) AS sumw FROM w),
        |q AS (SELECT w.source, w.toks, w.wt,
        |        (tot.budget * w.wt) DIV tot.sumw AS quota,
        |        LEAST((tot.budget * w.wt) DIV tot.sumw, 4 * w.toks) AS capped
        |      FROM w CROSS JOIN tot),
        |ex AS (SELECT CAST(SUM(quota - capped) AS BIGINT) AS excess,
        |              CAST(SUM(CASE WHEN quota < 4 * toks THEN wt ELSE 0L END) AS BIGINT) AS uw
        |       FROM q)
        |SELECT q.source, q.toks, q.wt, q.quota,
        |  CAST(LEAST(q.capped + CASE WHEN q.quota < 4 * q.toks AND ex.uw > 0
        |                             THEN (ex.excess * q.wt) DIV ex.uw ELSE 0L END,
        |             4 * q.toks) AS BIGINT) AS served,
        |  CAST((LEAST(q.capped + CASE WHEN q.quota < 4 * q.toks AND ex.uw > 0
        |                              THEN (ex.excess * q.wt) DIV ex.uw ELSE 0L END,
        |              4 * q.toks) * 1000) DIV q.toks AS BIGINT) AS epochs_milli
        |FROM q CROSS JOIN ex
        |ORDER BY q.source""".stripMargin,

    "q_c80_kn_bigram_lm" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS ts FROM documents),
        |bg AS (SELECT ts[i] AS w1, ts[i + 1] AS w2
        |       FROM (SELECT ts, explode(sequence(0, size(ts) - 2)) AS i FROM t WHERE size(ts) >= 2)),
        |cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt FROM bg GROUP BY 1, 2),
        |lt AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS left_total,
        |              CAST(COUNT(*) AS BIGINT) AS left_types FROM cb GROUP BY 1),
        |ct AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS cont_types FROM cb GROUP BY 1),
        |dsc AS (SELECT
        |    CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
        |    CAST(SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
        |    CAST(COUNT(*) AS DOUBLE) AS types FROM cb),
        |top AS (SELECT w1, w2, cnt FROM cb ORDER BY cnt DESC, w1, w2 LIMIT 100)
        |SELECT top.w1, top.w2, top.cnt, lt.left_total, lt.left_types, ct.cont_types,
        |  CAST(CAST(
        |    (CAST(top.cnt AS DOUBLE)
        |       - (CASE WHEN d.n1 + 2 * d.n2 > 0 THEN d.n1 / (d.n1 + 2 * d.n2) ELSE 0.5D END))
        |      / CAST(lt.left_total AS DOUBLE)
        |    + (CASE WHEN d.n1 + 2 * d.n2 > 0 THEN d.n1 / (d.n1 + 2 * d.n2) ELSE 0.5D END)
        |      * CAST(lt.left_types AS DOUBLE) / CAST(lt.left_total AS DOUBLE)
        |      * CAST(ct.cont_types AS DOUBLE) / d.types
        |    AS DECIMAL(18,6)) AS DOUBLE) AS p_kn
        |FROM top JOIN lt USING (w1) JOIN ct USING (w2) CROSS JOIN dsc d
        |ORDER BY top.cnt DESC, top.w1, top.w2""".stripMargin,

    "q_c78_containment_decon" ->
      s"""WITH $shingleCtes,
         |cb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_b
         |       FROM sh WHERE doc_id % 17 = 3 GROUP BY 1),
         |shr AS (SELECT a.doc_id, b.doc_id AS bench_id,
         |               CAST(COUNT(*) AS BIGINT) AS shared
         |        FROM sh a JOIN sh b ON a.shingle = b.shingle
         |        WHERE a.doc_id % 17 <> 3 AND b.doc_id % 17 = 3
         |        GROUP BY 1, 2)
         |SELECT s.doc_id, s.bench_id, s.shared, c.n_b,
         |  CAST(CAST(CAST(s.shared AS DECIMAL(18,6)) / CAST(c.n_b AS DECIMAL(18,6))
         |    AS DECIMAL(38,6)) AS DOUBLE) AS containment
         |FROM shr s JOIN cb c ON c.doc_id = s.bench_id
         |WHERE s.shared * 2 >= c.n_b
         |ORDER BY s.doc_id, s.bench_id""".stripMargin,

    "q_c79_vocab_coverage" ->
      """WITH toks AS (SELECT explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS term FROM documents),
        |tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY 1),
        |ff AS (SELECT cnt, CAST(COUNT(*) AS BIGINT) AS nterms FROM tc GROUP BY 1),
        |cum AS (SELECT cnt, nterms,
        |  COALESCE(SUM(nterms) OVER (ORDER BY cnt DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L) AS terms_before,
        |  COALESCE(SUM(cnt * nterms) OVER (ORDER BY cnt DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L) AS tokens_before
        |  FROM ff),
        |tot AS (SELECT CAST(SUM(cnt * nterms) AS BIGINT) AS total_tokens,
        |               CAST(SUM(nterms) AS BIGINT) AS vocab FROM ff),
        |ks AS (SELECT CAST(m AS BIGINT) AS m,
        |              GREATEST((tot.vocab * m) DIV 64, 1L) AS k
        |       FROM (SELECT explode(array(1, 4, 8, 16, 32, 48)) AS m) CROSS JOIN tot),
        |sel AS (SELECT ks.m, ks.k,
        |          c.tokens_before + (ks.k - c.terms_before) * c.cnt AS covered
        |        FROM ks JOIN cum c
        |          ON c.terms_before < ks.k AND ks.k <= c.terms_before + c.nterms)
        |SELECT ks.m AS frac64, CAST(ks.k AS BIGINT) AS vocab_size,
        |  CAST(COALESCE(s.covered, tot.total_tokens) AS BIGINT) AS covered_tokens,
        |  tot.total_tokens,
        |  CAST(CAST(CAST(tot.total_tokens - COALESCE(s.covered, tot.total_tokens) AS DECIMAL(18,6))
        |    / CAST(tot.total_tokens AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS oov_rate
        |FROM ks LEFT JOIN sel s ON s.m = ks.m CROSS JOIN tot
        |ORDER BY frac64""".stripMargin,

    "q_c77_pmi_collocations" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS ts FROM documents),
        |p AS (
        |  SELECT ts[i] AS w1, ts[i + 1] AS w2
        |  FROM (SELECT ts, explode(sequence(0, size(ts) - 2)) AS i FROM t WHERE size(ts) >= 2)
        |  UNION ALL
        |  SELECT ts[i], ts[i + 2]
        |  FROM (SELECT ts, explode(sequence(0, size(ts) - 3)) AS i FROM t WHERE size(ts) >= 3)),
        |cp AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS pair_cnt
        |       FROM p GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
        |       FROM (SELECT explode(ts) AS term FROM t) GROUP BY 1),
        |nn AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM tc),
        |tp AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM p)
        |SELECT cp.w1, cp.w2, cp.pair_cnt,
        |  CAST(CAST(ln((CAST(cp.pair_cnt AS DOUBLE) * nn.n * nn.n)
        |    / (tp.t * CAST(a.cnt AS DOUBLE) * CAST(b.cnt AS DOUBLE)))
        |    AS DECIMAL(18,6)) AS DOUBLE) AS pmi
        |FROM cp JOIN tc a ON a.term = cp.w1 JOIN tc b ON b.term = cp.w2
        |CROSS JOIN nn CROSS JOIN tp
        |ORDER BY pmi DESC, cp.w1, cp.w2 LIMIT 50""".stripMargin,

    "q_c76_ppl_buckets" ->
      """WITH toks AS (SELECT doc_id, explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens FROM tf GROUP BY 1),
        |vocab AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM vocab),
        |scored AS (
        |  SELECT t.doc_id,
        |    CAST(t.tf * -ln(CAST(v.cnt AS DOUBLE) / s.tot) AS DECIMAL(18,6)) AS tscore
        |  FROM tf t JOIN vocab v USING (term) CROSS JOIN tot s),
        |agg AS (SELECT doc_id, CAST(SUM(tscore) AS DECIMAL(18,6)) AS nll FROM scored GROUP BY 1),
        |ppl AS (
        |  SELECT d.doc_id,
        |    CAST(CAST(a.nll / CAST(d.n_tokens AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS avg_nll
        |  FROM dl d JOIN agg a USING (doc_id)),
        |pl AS (SELECT p.doc_id, doc.lang, p.avg_nll
        |       FROM ppl p JOIN documents doc USING (doc_id)),
        |cuts AS (SELECT lang,
        |    CAST(CAST(percentile(avg_nll, 1.0D/3) AS DECIMAL(18,6)) AS DOUBLE) AS c33,
        |    CAST(CAST(percentile(avg_nll, 2.0D/3) AS DECIMAL(18,6)) AS DOUBLE) AS c66
        |  FROM pl GROUP BY 1)
        |SELECT pl.doc_id, pl.lang, pl.avg_nll,
        |  CASE WHEN pl.avg_nll <= c.c33 THEN 'head'
        |       WHEN pl.avg_nll <= c.c66 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM pl JOIN cuts c USING (lang)
        |ORDER BY pl.doc_id""".stripMargin,

    "q_c75_winnow_fingerprint" ->
      """WITH t AS (SELECT doc_id, split(lower(text), ' ') AS ts FROM documents),
        |g AS (SELECT doc_id,
        |  transform(sequence(0, size(ts) - 3), i ->
        |    aggregate(split(concat_ws(' ', ts[i], ts[i+1], ts[i+2]), ''), 0L,
        |      (acc, ch) -> (acc * 31 + ascii(ch)) % 1000000007L)) AS hs
        |  FROM t WHERE size(ts) >= 3),
        |w AS (SELECT doc_id,
        |  CASE WHEN size(hs) >= 4
        |       THEN transform(sequence(0, size(hs) - 4), p -> array_min(slice(hs, p + 1, 4)))
        |       ELSE array(array_min(hs)) END AS sel
        |  FROM g),
        |fp AS (SELECT DISTINCT doc_id, fp FROM
        |        (SELECT doc_id, explode(sel) AS fp FROM w)),
        |dfc AS (SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY fp) AS dfc FROM fp),
        |kept AS (SELECT doc_id, fp FROM dfc WHERE dfc <= 50)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(COUNT(*) AS BIGINT) AS shared_fp
        |FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_c74_cms_freq" ->
      """WITH toks AS (SELECT explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS term FROM documents),
        |tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY 1),
        |th AS (SELECT term, cnt,
        |  aggregate(split(term, ''), 0L, (acc, ch) -> (acc * 31 + ascii(ch)) % 1000000007L) AS th
        |  FROM tc),
        |sl AS (SELECT term, cnt,
        |  ((487198041L * th + 259200101L) % 1000000007L) % 1024L AS s0,
        |  ((741932517L * th + 373587883L) % 1000000007L) % 1024L AS s1,
        |  ((268435399L * th + 608135813L) % 1000000007L) % 1024L AS s2 FROM th),
        |sk AS (SELECT row_i, slot, CAST(SUM(cnt) AS BIGINT) AS c FROM (
        |  SELECT 0 AS row_i, s0 AS slot, cnt FROM sl
        |  UNION ALL SELECT 1, s1, cnt FROM sl
        |  UNION ALL SELECT 2, s2, cnt FROM sl) GROUP BY 1, 2)
        |SELECT sl.term, sl.cnt AS exact_cnt,
        |  LEAST(k0.c, k1.c, k2.c) AS cms_est,
        |  LEAST(k0.c, k1.c, k2.c) - sl.cnt AS overcount
        |FROM sl
        |JOIN sk k0 ON k0.row_i = 0 AND k0.slot = sl.s0
        |JOIN sk k1 ON k1.row_i = 1 AND k1.slot = sl.s1
        |JOIN sk k2 ON k2.row_i = 2 AND k2.slot = sl.s2
        |ORDER BY exact_cnt DESC, sl.term LIMIT 100""".stripMargin,

    "q_c65_curriculum" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS toks
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, CAST(size(toks) AS BIGINT) AS n_tokens,
        |    aggregate(toks, 0L, (acc, w) ->
        |      acc + ((aggregate(split(w, ''), 0L,
        |               (a, ch) -> (a * 31 + ascii(ch)) % 1000000007L) % 64)
        |             * 1103515245L + 12345L) % 2048L - 1024L) AS wsum
        |  FROM t),
        |q AS (
        |  SELECT doc_id, n_tokens,
        |    CASE WHEN n_tokens = 0 THEN 500L
        |         ELSE ((wsum + 1024L * n_tokens) * 1000L) DIV (2048L * n_tokens) END AS qkey
        |  FROM h),
        |c AS (
        |  SELECT doc_id, n_tokens, qkey,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY qkey DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L) AS cum_start,
        |    SUM(n_tokens) OVER () AS total
        |  FROM q)
        |SELECT doc_id, CAST(qkey AS BIGINT) AS qkey, n_tokens,
        |  CAST(cum_start AS BIGINT) AS cum_start,
        |  CAST(CASE WHEN total > 0 THEN LEAST(3L, (cum_start * 4L) DIV total)
        |       ELSE 0L END AS BIGINT) AS phase
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_c96_fim_transform" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS ts FROM documents),
        |h AS (SELECT doc_id, ts, CAST(size(ts) AS BIGINT) AS n,
        |        ((doc_id % 1000000007L) * 1103515245L + 12345L) % 1000000007L AS h1
        |      FROM t),
        |h2 AS (SELECT doc_id, ts, n, h1,
        |        (h1 * 1103515245L + 12345L) % 1000000007L AS h2
        |      FROM h),
        |h3 AS (SELECT doc_id, ts, n, h1, h2,
        |        (h2 * 1103515245L + 12345L) % 1000000007L AS h3
        |      FROM h2),
        |sp AS (SELECT doc_id, ts, n,
        |        CASE WHEN n >= 2 AND h1 % 1000 < 500 THEN 1 ELSE 0 END AS fim_applied,
        |        LEAST(h2 % (n + 1), h3 % (n + 1)) AS lo,
        |        GREATEST(h2 % (n + 1), h3 % (n + 1)) AS hi
        |      FROM h3)
        |SELECT doc_id, n AS n_tokens,
        |  CAST(fim_applied AS BIGINT) AS fim_applied,
        |  CAST(CASE WHEN fim_applied = 1 THEN lo ELSE 0L END AS BIGINT) AS span_start,
        |  CAST(CASE WHEN fim_applied = 1 THEN hi - lo ELSE 0L END AS BIGINT) AS span_len,
        |  CASE WHEN fim_applied = 1 THEN
        |    CONCAT('<PRE> ', array_join(slice(ts, 1, lo), ' '),
        |           ' <SUF> ', array_join(slice(ts, hi + 1, n - hi), ' '),
        |           ' <MID> ', array_join(slice(ts, lo + 1, hi - lo), ' '))
        |  ELSE array_join(ts, ' ') END AS text_out
        |FROM sp ORDER BY doc_id""".stripMargin,

    "q_c97_self_dedup" ->
      """WITH t AS (SELECT doc_id, split(lower(text), ' ') AS ts FROM documents),
        |c AS (SELECT doc_id,
        |        transform(sequence(0, (size(ts) + 7) div 8 - 1),
        |          k -> array_join(slice(ts, 8 * k + 1, 8), ' ')) AS ch
        |      FROM t),
        |k AS (SELECT doc_id, ch,
        |        filter(transform(ch, (c, i) ->
        |          IF(array_position(ch, c) = CAST(i + 1 AS BIGINT), c, NULL)),
        |          x -> x IS NOT NULL) AS kept
        |      FROM c)
        |SELECT doc_id,
        |  CAST(size(ch) AS BIGINT) AS n_passages,
        |  CAST(size(ch) - size(kept) AS BIGINT) AS n_dropped,
        |  array_join(kept, ' ') AS scrubbed_text
        |FROM k ORDER BY doc_id""".stripMargin,

    "q_c95_winnow_calibration" ->
      s"""WITH $shingleCtes,
         |$sparkJaccardTail,
         |${sparkWinnowChain("_2", 2)},
         |${sparkWinnowChain("_4", 4)},
         |${sparkWinnowChain("_8", 8)},
         |res AS (
         |  SELECT 2 AS win_w,
         |    (SELECT COUNT(*) FROM fp_2) AS n_fingerprints,
         |    (SELECT COUNT(*) FROM wp_2) AS n_pairs,
         |    (SELECT COUNT(*) FROM jp) AS n_exact,
         |    (SELECT COUNT(*) FROM wp_2 x JOIN jp j ON j.doc_a = x.doc_a AND j.doc_b = x.doc_b) AS n_recalled
         |  UNION ALL
         |  SELECT 4,
         |    (SELECT COUNT(*) FROM fp_4),
         |    (SELECT COUNT(*) FROM wp_4),
         |    (SELECT COUNT(*) FROM jp),
         |    (SELECT COUNT(*) FROM wp_4 x JOIN jp j ON j.doc_a = x.doc_a AND j.doc_b = x.doc_b)
         |  UNION ALL
         |  SELECT 8,
         |    (SELECT COUNT(*) FROM fp_8),
         |    (SELECT COUNT(*) FROM wp_8),
         |    (SELECT COUNT(*) FROM jp),
         |    (SELECT COUNT(*) FROM wp_8 x JOIN jp j ON j.doc_a = x.doc_a AND j.doc_b = x.doc_b))
         |SELECT CAST(win_w AS BIGINT) AS win_w,
         |  CAST(n_fingerprints AS BIGINT) AS n_fingerprints,
         |  CAST(n_pairs AS BIGINT) AS n_pairs,
         |  CAST(n_exact AS BIGINT) AS n_exact,
         |  CAST(n_recalled AS BIGINT) AS n_recalled,
         |  CAST(CAST(CAST(n_recalled AS DECIMAL(18,6)) / CAST(n_exact AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS recall
         |FROM res ORDER BY win_w""".stripMargin,

    "q_c94_kn_trigram_lm" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS ts FROM documents),
        |bg AS (SELECT ts[i] AS w1, ts[i + 1] AS w2
        |       FROM (SELECT ts, explode(sequence(0, size(ts) - 2)) AS i FROM t WHERE size(ts) >= 2)),
        |cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt FROM bg GROUP BY 1, 2),
        |lt AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS left_total,
        |              CAST(COUNT(*) AS BIGINT) AS left_types FROM cb GROUP BY 1),
        |ct AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS cont_types FROM cb GROUP BY 1),
        |dsc AS (SELECT
        |    CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
        |    CAST(SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
        |    CAST(COUNT(*) AS DOUBLE) AS types FROM cb),
        |tg AS (SELECT ts[i] AS w1, ts[i + 1] AS w2, ts[i + 2] AS w3
        |       FROM (SELECT ts, explode(sequence(0, size(ts) - 3)) AS i FROM t WHERE size(ts) >= 3)),
        |c3 AS (SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS cnt3 FROM tg GROUP BY 1, 2, 3),
        |lt3 AS (SELECT w1, w2, CAST(SUM(cnt3) AS BIGINT) AS ctx_total,
        |               CAST(COUNT(*) AS BIGINT) AS ctx_types FROM c3 GROUP BY 1, 2),
        |dsc3 AS (SELECT
        |    CAST(SUM(CASE WHEN cnt3 = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1_3,
        |    CAST(SUM(CASE WHEN cnt3 = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS n2_3 FROM c3),
        |top AS (SELECT w1, w2, w3, cnt3 FROM c3 ORDER BY cnt3 DESC, w1, w2, w3 LIMIT 100),
        |s0 AS (SELECT top.w1, top.w2, top.w3, top.cnt3,
        |         lt3.ctx_total, lt3.ctx_types,
        |         (CAST(cb.cnt AS DOUBLE)
        |            - (CASE WHEN d.n1 + 2 * d.n2 > 0 THEN d.n1 / (d.n1 + 2 * d.n2) ELSE 0.5D END))
        |           / CAST(lt.left_total AS DOUBLE)
        |         + (CASE WHEN d.n1 + 2 * d.n2 > 0 THEN d.n1 / (d.n1 + 2 * d.n2) ELSE 0.5D END)
        |           * CAST(lt.left_types AS DOUBLE) / CAST(lt.left_total AS DOUBLE)
        |           * CAST(ct.cont_types AS DOUBLE) / d.types AS pk2
        |       FROM top JOIN lt3 ON lt3.w1 = top.w1 AND lt3.w2 = top.w2
        |                JOIN cb ON cb.w1 = top.w2 AND cb.w2 = top.w3
        |                JOIN lt ON lt.w1 = top.w2
        |                JOIN ct ON ct.w2 = top.w3
        |                CROSS JOIN dsc d)
        |SELECT s0.w1, s0.w2, s0.w3, s0.cnt3, s0.ctx_total, s0.ctx_types,
        |  CAST(CAST(
        |    (CAST(s0.cnt3 AS DOUBLE)
        |       - (CASE WHEN d3.n1_3 + 2 * d3.n2_3 > 0 THEN d3.n1_3 / (d3.n1_3 + 2 * d3.n2_3) ELSE 0.5D END))
        |      / CAST(s0.ctx_total AS DOUBLE)
        |    + (CASE WHEN d3.n1_3 + 2 * d3.n2_3 > 0 THEN d3.n1_3 / (d3.n1_3 + 2 * d3.n2_3) ELSE 0.5D END)
        |      * CAST(s0.ctx_types AS DOUBLE) / CAST(s0.ctx_total AS DOUBLE) * s0.pk2
        |    AS DECIMAL(18,6)) AS DOUBLE) AS p_kn3
        |FROM s0 CROSS JOIN dsc3 d3
        |ORDER BY s0.cnt3 DESC, s0.w1, s0.w2, s0.w3""".stripMargin,

    "q_c87_kn_trigram_ppl" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS ts FROM documents),
        |bg AS (SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        |       FROM (SELECT doc_id, ts, explode(sequence(0, size(ts) - 2)) AS i FROM t WHERE size(ts) >= 2)),
        |trn AS (SELECT w1, w2 FROM bg WHERE doc_id % 17 <> 3),
        |cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt FROM trn GROUP BY 1, 2),
        |lt AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS left_total,
        |              CAST(COUNT(*) AS BIGINT) AS left_types FROM cb GROUP BY 1),
        |ct AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS cont_types FROM cb GROUP BY 1),
        |dsc AS (SELECT
        |    CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
        |    CAST(SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
        |    CAST(COUNT(*) AS DOUBLE) AS types FROM cb),
        |vv AS (SELECT CAST(COUNT(DISTINCT term) AS DOUBLE) AS v
        |       FROM (SELECT explode(ts) AS term FROM t WHERE doc_id % 17 <> 3)),
        |tg AS (SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2, ts[i + 2] AS w3
        |       FROM (SELECT doc_id, ts, explode(sequence(0, size(ts) - 3)) AS i FROM t WHERE size(ts) >= 3)),
        |trn3 AS (SELECT w1, w2, w3 FROM tg WHERE doc_id % 17 <> 3),
        |c3 AS (SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS cnt3 FROM trn3 GROUP BY 1, 2, 3),
        |lt3 AS (SELECT w1, w2, CAST(SUM(cnt3) AS BIGINT) AS ctx_total,
        |               CAST(COUNT(*) AS BIGINT) AS ctx_types FROM c3 GROUP BY 1, 2),
        |dsc3 AS (SELECT
        |    CAST(SUM(CASE WHEN cnt3 = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1_3,
        |    CAST(SUM(CASE WHEN cnt3 = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS n2_3 FROM c3),
        |hb AS (SELECT doc_id, w1, w2, w3 FROM tg WHERE doc_id % 17 = 3),
        |sc AS (SELECT doc_id,
        |  CAST(-ln(
        |    CASE WHEN cnt3 IS NOT NULL THEN
        |      (CAST(cnt3 AS DOUBLE)
        |         - (CASE WHEN d3.n1_3 + 2 * d3.n2_3 > 0 THEN d3.n1_3 / (d3.n1_3 + 2 * d3.n2_3) ELSE 0.5D END))
        |        / CAST(ctx_total AS DOUBLE)
        |      + (CASE WHEN d3.n1_3 + 2 * d3.n2_3 > 0 THEN d3.n1_3 / (d3.n1_3 + 2 * d3.n2_3) ELSE 0.5D END)
        |        * CAST(ctx_types AS DOUBLE) / CAST(ctx_total AS DOUBLE) * pbg
        |    WHEN ctx_total IS NOT NULL THEN
        |      (CASE WHEN d3.n1_3 + 2 * d3.n2_3 > 0 THEN d3.n1_3 / (d3.n1_3 + 2 * d3.n2_3) ELSE 0.5D END)
        |        * CAST(ctx_types AS DOUBLE) / CAST(ctx_total AS DOUBLE) * pbg
        |    ELSE pbg END) AS DECIMAL(18,6)) AS nll
        |  FROM (SELECT hb.doc_id, c3.cnt3, lt3.ctx_total, lt3.ctx_types,
        |          CASE WHEN cb.cnt IS NOT NULL THEN
        |            (CAST(cb.cnt AS DOUBLE)
        |               - (CASE WHEN d.n1 + 2 * d.n2 > 0 THEN d.n1 / (d.n1 + 2 * d.n2) ELSE 0.5D END))
        |              / CAST(lt.left_total AS DOUBLE)
        |            + (CASE WHEN d.n1 + 2 * d.n2 > 0 THEN d.n1 / (d.n1 + 2 * d.n2) ELSE 0.5D END)
        |              * CAST(lt.left_types AS DOUBLE) / CAST(lt.left_total AS DOUBLE)
        |              * ((CAST(COALESCE(ct.cont_types, 0L) AS DOUBLE) + 1) / (d.types + vv.v))
        |          WHEN lt.w1 IS NOT NULL THEN
        |            (CASE WHEN d.n1 + 2 * d.n2 > 0 THEN d.n1 / (d.n1 + 2 * d.n2) ELSE 0.5D END)
        |              * CAST(lt.left_types AS DOUBLE) / CAST(lt.left_total AS DOUBLE)
        |              * ((CAST(COALESCE(ct.cont_types, 0L) AS DOUBLE) + 1) / (d.types + vv.v))
        |          ELSE ((CAST(COALESCE(ct.cont_types, 0L) AS DOUBLE) + 1) / (d.types + vv.v))
        |          END AS pbg
        |        FROM hb LEFT JOIN c3 ON c3.w1 = hb.w1 AND c3.w2 = hb.w2 AND c3.w3 = hb.w3
        |                LEFT JOIN lt3 ON lt3.w1 = hb.w1 AND lt3.w2 = hb.w2
        |                LEFT JOIN cb ON cb.w1 = hb.w2 AND cb.w2 = hb.w3
        |                LEFT JOIN lt ON lt.w1 = hb.w2
        |                LEFT JOIN ct ON ct.w2 = hb.w3
        |                CROSS JOIN dsc d CROSS JOIN vv) s0
        |  CROSS JOIN dsc3 d3)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
        |  CAST(CAST(CAST(SUM(nll) AS DECIMAL(18,6)) / CAST(COUNT(*) AS DECIMAL(18,6))
        |    AS DECIMAL(38,6)) AS DOUBLE) AS avg_nll
        |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "q_c88_lsh_recall" ->
      s"""WITH $minhashCandCtes,
         |$sparkJaccardTail,
         |scal AS (SELECT jp.doc_a, jp.doc_b, jp.shared, jp.uni,
         |         CAST(jp.shared AS DOUBLE) / CAST(jp.uni AS DOUBLE) AS s,
         |         CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS detected
         |       FROM jp LEFT JOIN cand c ON c.doc_a = jp.doc_a AND c.doc_b = jp.doc_b),
         |eq AS (SELECT (shared * 10) DIV uni AS jac_decile, detected,
         |         CAST(1 - (1 - s * s) * (1 - s * s) * (1 - s * s) AS DECIMAL(18,6)) AS exp_p
         |       FROM scal)
         |SELECT CAST(jac_decile AS BIGINT) AS jac_decile,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(detected) AS BIGINT) AS n_detected,
         |  CAST(CAST(CAST(SUM(detected) AS DECIMAL(18,6)) / CAST(COUNT(*) AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS observed_recall,
         |  CAST(CAST(CAST(SUM(exp_p) AS DECIMAL(18,6)) / CAST(COUNT(*) AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS expected_recall
         |FROM eq GROUP BY 1 ORDER BY jac_decile""".stripMargin,

    "q_c120_lsh_band_grid" ->
      s"""WITH $minhashCandCtes,
         |$sparkJaccardTail,
         |${DedupQueries.lshGridSqlTail}""".stripMargin,

    "q_c122_export_shard_plan" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (SELECT doc_id, n_tokens,
        |        ROW_NUMBER() OVER (PARTITION BY doc_id DIV 4096
        |          ORDER BY n_tokens DESC, doc_id) - 1 AS rk FROM t),
        |asg AS (
        |  SELECT 'sized' AS strategy,
        |    CAST((CASE WHEN (rk DIV 8) % 2 = 0 THEN rk % 8 ELSE 7 - rk % 8 END
        |          + (doc_id DIV 4096) % 8) % 8 AS BIGINT) AS shard,
        |    n_tokens FROM r
        |  UNION ALL
        |  SELECT 'hash', CAST(hv % 8 AS BIGINT), n_tokens
        |  FROM (SELECT doc_id, n_tokens,
        |          ((doc_id % 1000000007L) * 1103515245L + 12345L) % 1000000007L AS hv FROM t)),
        |per AS (SELECT strategy, shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |          CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        |        FROM asg GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS ttot FROM t)
        |SELECT strategy, shard, n_docs, n_tokens,
        |  CAST(n_tokens * 10000 DIV ttot AS BIGINT) AS tok_bp,
        |  CAST(n_tokens * 80000 DIV ttot - 10000 AS BIGINT) AS dev_bp
        |FROM per CROSS JOIN tot ORDER BY strategy, shard""".stripMargin,

    "q_c124_export_manifest" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
        |         md5(text) AS h
        |  FROM documents),
        |r AS (SELECT doc_id, n_tokens, h,
        |        ROW_NUMBER() OVER (PARTITION BY doc_id DIV 4096
        |          ORDER BY n_tokens DESC, doc_id) - 1 AS rk FROM t),
        |a AS (SELECT
        |        CAST((CASE WHEN (rk DIV 8) % 2 = 0 THEN rk % 8 ELSE 7 - rk % 8 END
        |              + (doc_id DIV 4096) % 8) % 8 AS BIGINT) AS shard,
        |        n_tokens,
        |        CAST(conv(substring(h, 1, 16), 16, 10) AS DECIMAL(20,0)) AS c1,
        |        CAST(conv(substring(h, 17, 16), 16, 10) AS DECIMAL(20,0)) AS c2
        |      FROM r)
        |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CAST(c1 AS DECIMAL(38,0))) % 1152921504606846976 AS BIGINT) AS checksum_a,
        |  CAST(SUM(CAST(c2 AS DECIMAL(38,0))) % 1152921504606846976 AS BIGINT) AS checksum_b
        |FROM a GROUP BY 1 ORDER BY shard""".stripMargin,

    "q_c127_hybrid_rrf" ->
      """WITH toks AS (SELECT doc_id, explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS term FROM documents),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
        |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, CAST(SUM(dl) AS DOUBLE) AS tot FROM dl),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
        |       WHERE term IN ('hash', 'join', 'filter') GROUP BY 1, 2),
        |dfq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT /*+ BROADCAST(dfq), BROADCAST(stats) */ t.doc_id,
        |    CAST(ln(1.0D + (s.n_docs - q.df + 0.5D) / (q.df + 0.5D))
        |      * (t.tf * 2.2D) / (t.tf + 1.2D * (0.25D + 0.75D * d.dl / (s.tot / s.n_docs)))
        |      AS DECIMAL(18,6)) AS tscore
        |  FROM tf t JOIN dl d USING (doc_id) JOIN dfq q USING (term) CROSS JOIN stats s),
        |bm AS (SELECT doc_id, CAST(SUM(tscore) AS DOUBLE) AS bm25 FROM scored GROUP BY 1),
        |e AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |qv AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |ds AS (SELECT /*+ BROADCAST(qv) */ vec_id,
        |         round(CAST(cosine_similarity(v, qv) AS DECIMAL(18,6)), 4) AS score
        |       FROM e CROSS JOIN qv WHERE vec_id <> 0),
        |btop AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS br
        |         FROM (SELECT * FROM bm ORDER BY bm25 DESC, doc_id LIMIT 100)),
        |dtop AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS dr
        |         FROM (SELECT * FROM ds ORDER BY score DESC, vec_id LIMIT 100)),
        |f AS (SELECT COALESCE(b.doc_id, d.vec_id) AS id, b.br, d.dr
        |      FROM btop b FULL OUTER JOIN dtop d ON b.doc_id = d.vec_id)
        |SELECT id, CAST(COALESCE(br, 0L) AS BIGINT) AS bm25_rank,
        |  CAST(COALESCE(dr, 0L) AS BIGINT) AS dense_rank,
        |  CAST(COALESCE(CAST(1.0D / (60 + br) AS DECIMAL(18,6)), 0)
        |     + COALESCE(CAST(1.0D / (60 + dr) AS DECIMAL(18,6)), 0) AS DOUBLE) AS rrf
        |FROM f ORDER BY rrf DESC, id LIMIT 20""".stripMargin,

    "q_c126_ingest_quality_gate" ->
      """WITH t AS (
        |  SELECT doc_id, filter(split(lower(text), ' '), w -> length(w) > 0) AS ws
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, CAST(size(ws) AS BIGINT) AS n_words,
        |    aggregate(ws, 0L, (a, w) -> a + length(w)) AS sumlen,
        |    CAST(size(array_intersect(ws, array('the','of','and','to','in'))) AS BIGINT) AS stop_hits,
        |    CAST(size(array_distinct(ws)) AS BIGINT) AS uniq
        |  FROM t),
        |fl AS (SELECT
        |    CASE WHEN doc_id % 10 = 3 THEN 'batch' ELSE 'base' END AS grp,
        |    CASE WHEN n_words >= 50 THEN 1 ELSE 0 END AS r_words,
        |    CASE WHEN 3 * n_words <= sumlen AND 2 * sumlen <= 9 * n_words THEN 1 ELSE 0 END AS r_wlen,
        |    CASE WHEN stop_hits >= 1 THEN 1 ELSE 0 END AS r_stop,
        |    CASE WHEN 5 * uniq >= 2 * n_words THEN 1 ELSE 0 END AS r_ttr,
        |    CASE WHEN n_words >= 50 AND 3 * n_words <= sumlen
        |      AND 2 * sumlen <= 9 * n_words AND stop_hits >= 1
        |      AND 5 * uniq >= 2 * n_words THEN 1 ELSE 0 END AS pass
        |  FROM m),
        |ag AS (SELECT grp,
        |    CAST(SUM(r_words) * 1000 DIV COUNT(*) AS BIGINT) AS words_pm,
        |    CAST(SUM(r_wlen) * 1000 DIV COUNT(*) AS BIGINT) AS wlen_pm,
        |    CAST(SUM(r_stop) * 1000 DIV COUNT(*) AS BIGINT) AS stop_pm,
        |    CAST(SUM(r_ttr) * 1000 DIV COUNT(*) AS BIGINT) AS ttr_pm,
        |    CAST(SUM(pass) * 1000 DIV COUNT(*) AS BIGINT) AS pass_pm
        |  FROM fl GROUP BY grp),
        |x AS (
        |  SELECT stack(5,
        |      'pass_pm', a.pass_pm, b.pass_pm,
        |      'r_stop_pm', a.stop_pm, b.stop_pm,
        |      'r_ttr_pm', a.ttr_pm, b.ttr_pm,
        |      'r_wlen_pm', a.wlen_pm, b.wlen_pm,
        |      'r_words_pm', a.words_pm, b.words_pm) AS (metric, base_pm, batch_pm)
        |  FROM ag a CROSS JOIN ag b WHERE a.grp = 'base' AND b.grp = 'batch')
        |SELECT metric, base_pm, batch_pm,
        |  CAST(batch_pm - base_pm AS BIGINT) AS delta_pm,
        |  CAST(CASE WHEN abs(batch_pm - base_pm) >= 50 THEN 1 ELSE 0 END AS BIGINT) AS alarm
        |FROM x ORDER BY metric""".stripMargin,

    "q_c125_manifest_diff" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
        |         md5(text) AS h
        |  FROM documents),
        |g AS (SELECT doc_id, n_tokens,
        |        CAST(((doc_id % 1000000007L) * 1103515245L + 12345L) % 1000000007L % 8 AS BIGINT) AS shard,
        |        CAST(conv(substring(h, 1, 16), 16, 10) AS DECIMAL(20,0)) AS c1,
        |        CAST(conv(substring(h, 17, 16), 16, 10) AS DECIMAL(20,0)) AS c2
        |      FROM t),
        |va AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs_a,
        |         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_a,
        |         CAST(SUM(CAST(c1 AS DECIMAL(38,0))) % 1152921504606846976 AS BIGINT) AS ca1,
        |         CAST(SUM(CAST(c2 AS DECIMAL(38,0))) % 1152921504606846976 AS BIGINT) AS ca2
        |       FROM g WHERE doc_id % 10 <> 3 GROUP BY 1),
        |vb AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs_b,
        |         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_b,
        |         CAST(SUM(CAST(c1 AS DECIMAL(38,0))) % 1152921504606846976 AS BIGINT) AS cb1,
        |         CAST(SUM(CAST(c2 AS DECIMAL(38,0))) % 1152921504606846976 AS BIGINT) AS cb2
        |       FROM g GROUP BY 1)
        |SELECT vb.shard, CAST(COALESCE(va.n_docs_a, 0L) AS BIGINT) AS n_docs_a,
        |  vb.n_docs_b,
        |  CAST(vb.n_docs_b - COALESCE(va.n_docs_a, 0L) AS BIGINT) AS n_added,
        |  CAST(COALESCE(va.n_tokens_a, 0L) AS BIGINT) AS n_tokens_a, vb.n_tokens_b,
        |  CAST(CASE WHEN va.ca1 IS NULL OR va.ca1 <> vb.cb1 OR va.ca2 <> vb.cb2
        |       THEN 1 ELSE 0 END AS BIGINT) AS digest_changed
        |FROM vb LEFT JOIN va USING (shard) ORDER BY vb.shard""".stripMargin,

    "q_c91_source_dup_matrix" ->
      s"""WITH $shingleCtes,
         |$sparkJaccardTail,
         |sm AS (SELECT doc_id, source FROM documents),
         |px AS (SELECT LEAST(sa.source, sb.source) AS source_a,
         |              GREATEST(sa.source, sb.source) AS source_b
         |       FROM jp JOIN sm sa ON jp.doc_a = sa.doc_id
         |               JOIN sm sb ON jp.doc_b = sb.doc_id)
         |SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM px GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin,

    "q_c92_minhash_estimator" ->
      s"""WITH $minhashCandCtes,
         |$sparkJaccardTail,
         |me AS (SELECT jp.doc_a, jp.doc_b, jp.shared, jp.uni,
         |  (CASE WHEN a.mh0 = b.mh0 THEN 1 ELSE 0 END +
         |   CASE WHEN a.mh1 = b.mh1 THEN 1 ELSE 0 END +
         |   CASE WHEN a.mh2 = b.mh2 THEN 1 ELSE 0 END +
         |   CASE WHEN a.mh3 = b.mh3 THEN 1 ELSE 0 END +
         |   CASE WHEN a.mh4 = b.mh4 THEN 1 ELSE 0 END +
         |   CASE WHEN a.mh5 = b.mh5 THEN 1 ELSE 0 END) AS matches
         |  FROM jp JOIN sig a ON a.doc_id = jp.doc_a
         |          JOIN sig b ON b.doc_id = jp.doc_b),
         |eq AS (SELECT (shared * 10) DIV uni AS jac_decile, matches,
         |  CAST(CAST(matches AS DOUBLE) / CAST(6 AS DOUBLE) AS DECIMAL(18,6)) AS est,
         |  CAST(CAST(shared AS DOUBLE) / CAST(uni AS DOUBLE) AS DECIMAL(18,6)) AS tru
         |  FROM me)
         |SELECT CAST(jac_decile AS BIGINT) AS jac_decile,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(matches) AS BIGINT) AS sig_matches,
         |  CAST(CAST(CAST(SUM(est) AS DECIMAL(18,6)) / CAST(COUNT(*) AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS mean_est,
         |  CAST(CAST(CAST(SUM(tru) AS DECIMAL(18,6)) / CAST(COUNT(*) AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS mean_jaccard
         |FROM eq GROUP BY 1 ORDER BY jac_decile""".stripMargin,

    "q_c93_source_centroid_drift" ->
      """WITH ee AS (
        |  SELECT d.source, e.vec_id, e.embedding
        |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
        |ev AS (
        |  SELECT source, posexplode(embedding) AS (i, x) FROM ee),
        |nv AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_vecs
        |       FROM ee WHERE size(embedding) > 0 GROUP BY 1),
        |cen AS (SELECT source, CAST(i AS BIGINT) AS i,
        |         CAST(CAST(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE)
        |           / CAST(COUNT(*) AS DOUBLE) AS DECIMAL(18,6)) AS m
        |        FROM ev GROUP BY 1, 2),
        |nrm AS (SELECT source,
        |         CAST(SUM(CAST(CAST(m AS DOUBLE) * CAST(m AS DOUBLE) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS nn
        |        FROM cen GROUP BY 1),
        |dt AS (SELECT a.source AS source_a, b.source AS source_b,
        |         CAST(SUM(CAST(CAST(a.m AS DOUBLE) * CAST(b.m AS DOUBLE) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS dp
        |       FROM cen a JOIN cen b ON a.i = b.i AND a.source < b.source
        |       GROUP BY 1, 2)
        |SELECT dt.source_a, dt.source_b, na.n_vecs AS n_a, nb.n_vecs AS n_b,
        |  CASE WHEN x1.nn > 0 AND x2.nn > 0
        |       THEN CAST(CAST(CAST(dt.dp AS DOUBLE) / sqrt(CAST(x1.nn AS DOUBLE) * CAST(x2.nn AS DOUBLE)) AS DECIMAL(18,6)) AS DOUBLE)
        |       ELSE CAST(0 AS DOUBLE) END AS cosine
        |FROM dt JOIN nrm x1 ON x1.source = dt.source_a
        |        JOIN nrm x2 ON x2.source = dt.source_b
        |        JOIN nv na ON na.source = dt.source_a
        |        JOIN nv nb ON nb.source = dt.source_b
        |ORDER BY dt.source_a, dt.source_b""".stripMargin,

    "q_c98_drift_alarm" ->
      """WITH ee AS (
        |  SELECT d.source, e.vec_id, e.embedding,
        |         CASE WHEN ((e.vec_id % 1000000007) * 1103515245 + 12345) % 1000000007 % 10 < 8
        |              THEN 0 ELSE 1 END AS half
        |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
        |ev AS (
        |  SELECT source, half, posexplode(embedding) AS (i, x) FROM ee),
        |nv AS (SELECT source, half, CAST(COUNT(*) AS BIGINT) AS n_vecs
        |       FROM ee WHERE size(embedding) > 0 GROUP BY 1, 2),
        |cen AS (SELECT source, half, CAST(i AS BIGINT) AS i,
        |         CAST(CAST(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE)
        |           / CAST(COUNT(*) AS DOUBLE) AS DECIMAL(18,6)) AS m
        |        FROM ev GROUP BY 1, 2, 3),
        |nrm AS (SELECT source, half,
        |         CAST(SUM(CAST(CAST(m AS DOUBLE) * CAST(m AS DOUBLE) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS nn
        |        FROM cen GROUP BY 1, 2),
        |dt AS (SELECT a.source,
        |         CAST(SUM(CAST(CAST(a.m AS DOUBLE) * CAST(b.m AS DOUBLE) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS dp
        |       FROM cen a JOIN cen b ON a.source = b.source AND a.i = b.i
        |       WHERE a.half = 0 AND b.half = 1
        |       GROUP BY 1),
        |c AS (SELECT dt.source, na.n_vecs AS n_base, nb.n_vecs AS n_batch,
        |        CASE WHEN x1.nn > 0 AND x2.nn > 0
        |             THEN CAST(CAST(dt.dp AS DOUBLE) / sqrt(CAST(x1.nn AS DOUBLE) * CAST(x2.nn AS DOUBLE)) AS DECIMAL(18,6))
        |             ELSE CAST(0 AS DECIMAL(18,6)) END AS cos_dec
        |      FROM dt JOIN nrm x1 ON x1.source = dt.source AND x1.half = 0
        |              JOIN nrm x2 ON x2.source = dt.source AND x2.half = 1
        |              JOIN nv na ON na.source = dt.source AND na.half = 0
        |              JOIN nv nb ON nb.source = dt.source AND nb.half = 1)
        |SELECT source, n_base, n_batch,
        |  CAST(cos_dec AS DOUBLE) AS cosine,
        |  CAST(1000000 - CAST(cos_dec * 1000000 AS BIGINT) AS BIGINT) AS drift_q6,
        |  CAST(10000 + 4000000 DIV n_batch AS BIGINT) AS threshold_q6,
        |  CASE WHEN 1000000 - CAST(cos_dec * 1000000 AS BIGINT)
        |            > 10000 + 4000000 DIV n_batch
        |       THEN 'rebuild' ELSE 'ok' END AS verdict
        |FROM c ORDER BY source""".stripMargin,

    // q_c103 has no non-stored base query, so its twin IS the brute-force
    // full-scan form (lead-window adjacency over the corpus) — parity
    // proves positional-index search ≡ corpus scan inside Spark, the
    // same claim the DuckDB oracle makes across engines
    "q_c103_phrase_search" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS ts FROM documents),
        |bg AS (SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        |       FROM (SELECT doc_id, ts, explode(sequence(0, size(ts) - 2)) AS i FROM t WHERE size(ts) >= 2)),
        |top AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt FROM bg GROUP BY 1, 2
        |        ORDER BY cnt DESC, w1, w2 LIMIT 5),
        |hits AS (SELECT b.w1, b.w2, b.doc_id
        |         FROM bg b JOIN top tp ON b.w1 = tp.w1 AND b.w2 = tp.w2)
        |SELECT concat_ws(' ', w1, w2) AS phrase,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) AS BIGINT) AS n_occ,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
        |  CAST(MAX(doc_id) AS BIGINT) AS last_doc
        |FROM hits GROUP BY w1, w2 ORDER BY phrase""".stripMargin,

    // q_c106: same class — the twin is the brute-force positional scan
    "q_c106_proximity_search" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS ts FROM documents),
        |p AS (SELECT doc_id, ts[i] AS term, CAST(i AS BIGINT) AS pos
        |      FROM (SELECT doc_id, ts, explode(sequence(0, size(ts) - 1)) AS i FROM t WHERE size(ts) >= 1)),
        |bg AS (SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        |       FROM (SELECT doc_id, ts, explode(sequence(0, size(ts) - 2)) AS i FROM t WHERE size(ts) >= 2)),
        |top AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt FROM bg GROUP BY 1, 2
        |        ORDER BY cnt DESC, w1, w2 LIMIT 5),
        |occ AS (SELECT tp.w1, tp.w2, a.doc_id, b.pos - a.pos AS dist
        |        FROM top tp
        |        JOIN p a ON a.term = tp.w1
        |        JOIN p b ON b.term = tp.w2 AND b.doc_id = a.doc_id
        |                AND b.pos > a.pos AND b.pos <= a.pos + 3)
        |SELECT concat_ws(' ', w1, w2) AS phrase,
        |  CAST(COUNT(DISTINCT CASE WHEN dist = 1 THEN doc_id END) AS BIGINT) AS n_docs_adj,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_prox,
        |  CAST(SUM(CASE WHEN dist = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_occ_adj,
        |  CAST(COUNT(*) AS BIGINT) AS n_occ_prox,
        |  CAST(COUNT(DISTINCT doc_id) * 1000 DIV COUNT(DISTINCT CASE WHEN dist = 1 THEN doc_id END) AS BIGINT) AS expansion_pm
        |FROM occ GROUP BY w1, w2 ORDER BY phrase""".stripMargin,

    "q_c108_token_spectrum" ->
      """WITH toks AS (SELECT explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS term FROM documents),
        |tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY 1),
        |ff AS (SELECT cnt AS r, CAST(COUNT(*) AS BIGINT) AS n_r FROM tc GROUP BY 1),
        |tot AS (SELECT CAST(SUM(r * n_r) AS BIGINT) AS total_tokens FROM ff)
        |SELECT f.r, f.n_r, CAST(f.r * f.n_r AS BIGINT) AS mass,
        |  CAST(f.r * f.n_r * 1000 DIV tot.total_tokens AS BIGINT) AS mass_share_pm,
        |  CAST(CAST(CAST(COALESCE((f.r + 1) * nx.n_r, 0) AS DECIMAL(18,6))
        |    / CAST(f.n_r AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS gt_rstar
        |FROM ff f LEFT JOIN ff nx ON nx.r = f.r + 1 CROSS JOIN tot
        |ORDER BY f.r""".stripMargin,

    "q_c109_source_vocab_overlap" ->
      """WITH toks AS (SELECT doc_id, explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS term FROM documents),
        |st AS (SELECT DISTINCT d.source, t.term
        |       FROM toks t JOIN (SELECT doc_id, source FROM documents) d USING (doc_id)),
        |v AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab FROM st GROUP BY 1),
        |p AS (SELECT a.source AS source_a, b.source AS source_b,
        |             CAST(COUNT(*) AS BIGINT) AS shared_terms
        |      FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT p.source_a, p.source_b, va.vocab AS v_a, vb.vocab AS v_b,
        |  p.shared_terms,
        |  CAST(p.shared_terms * 1000 DIV (va.vocab + vb.vocab - p.shared_terms) AS BIGINT) AS jaccard_pm
        |FROM p JOIN v va ON va.source = p.source_a
        |       JOIN v vb ON vb.source = p.source_b
        |ORDER BY source_a, source_b""".stripMargin,

    "q_c111_term_burstiness" ->
      """WITH toks AS (SELECT doc_id, explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS term FROM documents),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
        |st AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cf,
        |              CAST(COUNT(*) AS BIGINT) AS df,
        |              CAST(MAX(tf) AS BIGINT) AS max_tf FROM tf GROUP BY 1)
        |SELECT term, cf, df, max_tf,
        |  CAST(cf * 1000 DIV df AS BIGINT) AS burst_pm,
        |  CAST(max_tf * 1000 DIV cf AS BIGINT) AS top_doc_share_pm
        |FROM st ORDER BY cf DESC, term LIMIT 50""".stripMargin,

    // q_c115's twin uses the value-identical simple-window prefix sum
    // (the q_c25 twin convention — blocking only changes the plan shape)
    "q_c115_packing_fragmentation" ->
      """WITH t AS (SELECT doc_id, source, CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L) AS tok_start FROM t),
        |p AS (SELECT doc_id, source, n_tokens, tok_start,
        |    CAST(tok_start DIV 512 AS BIGINT) AS seq_start,
        |    CAST((tok_start + n_tokens - 1) DIV 512 AS BIGINT) AS seq_end FROM c),
        |seg AS (SELECT source, k AS seq,
        |    LEAST(tok_start + n_tokens, (k + 1) * 512) - GREATEST(tok_start, k * 512) AS seg_len
        |  FROM (SELECT p.*, explode(sequence(seq_start, seq_end)) AS k FROM p)),
        |q AS (SELECT source, seq, CAST(SUM(seg_len) AS BIGINT) AS t_s,
        |    CAST(SUM(seg_len * seg_len) AS BIGINT) AS ss, CAST(COUNT(*) AS BIGINT) AS n_segs
        |  FROM seg GROUP BY 1, 2),
        |d AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(CASE WHEN seq_end > seq_start THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs
        |  FROM p GROUP BY 1)
        |SELECT q.source, CAST(COUNT(*) AS BIGINT) AS n_seqs, d.n_docs, d.n_split_docs,
        |  CAST(d.n_split_docs * 1000 DIV d.n_docs AS BIGINT) AS split_doc_pm,
        |  CAST(SUM(q.n_segs) * 1000 DIV COUNT(*) AS BIGINT) AS segs_per_seq_pm,
        |  CAST(SUM(q.t_s * q.t_s - q.ss) * 1000 DIV SUM(q.t_s * q.t_s) AS BIGINT) AS contamination_pm
        |FROM q JOIN d ON d.source = q.source
        |GROUP BY q.source, d.n_docs, d.n_split_docs
        |ORDER BY q.source""".stripMargin,

    "q_c113_clean_holdout" ->
      """WITH h AS (SELECT doc_id, source,
        |    ((CAST(doc_id AS BIGINT) % 1000000007) * 1103515245 + 12345) % 1000000007 % 1000 AS bucket,
        |    split(lower(text), ' ') AS ts FROM documents),
        |s AS (SELECT doc_id, source,
        |        CASE WHEN bucket < 800 THEN 'train'
        |             WHEN bucket < 900 THEN 'val' ELSE 'test' END AS split,
        |        CASE WHEN size(ts) >= 13 THEN transform(sequence(0, size(ts) - 13),
        |          k -> array_join(slice(ts, k + 1, 13), ' ')) ELSE array() END AS ngs
        |      FROM h),
        |tg AS (SELECT DISTINCT ng
        |       FROM (SELECT explode(ngs) AS ng FROM s WHERE split = 'train')),
        |cd AS (SELECT DISTINCT doc_id
        |       FROM (SELECT doc_id, explode(ngs) AS ng FROM s WHERE split <> 'train') hg
        |       LEFT SEMI JOIN tg ON hg.ng = tg.ng)
        |SELECT s.source, s.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(cd.doc_id) AS BIGINT) AS n_dropped,
        |  CAST(COUNT(*) - COUNT(cd.doc_id) AS BIGINT) AS n_kept,
        |  CAST(COUNT(cd.doc_id) * 1000 DIV COUNT(*) AS BIGINT) AS drop_pm
        |FROM s LEFT JOIN cd ON s.doc_id = cd.doc_id
        |WHERE s.split <> 'train'
        |GROUP BY s.source, s.split ORDER BY source, split""".stripMargin,

    "q_c112_embedding_norms" ->
      """WITH e AS (SELECT vec_id, label, transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT label,
        |        CAST(round(CAST(sqrt(aggregate(v, 0D, (a, x) -> a + x * x)) AS DECIMAL(18,6)), 4) * 10000 AS BIGINT) AS nq
        |      FROM e)
        |SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |  CAST(CAST(CAST(SUM(nq) AS DECIMAL(18,6)) / CAST(COUNT(*) * 10000 AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS mean_norm,
        |  CAST(CAST(percentile(nq, 0.25) / 10000 AS DECIMAL(18,6)) AS DOUBLE) AS p25,
        |  CAST(CAST(percentile(nq, 0.50) / 10000 AS DECIMAL(18,6)) AS DOUBLE) AS p50,
        |  CAST(CAST(percentile(nq, 0.75) / 10000 AS DECIMAL(18,6)) AS DOUBLE) AS p75,
        |  CAST(SUM(CASE WHEN nq < 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_small
        |FROM n GROUP BY label ORDER BY label""".stripMargin
  )

  /** The salted event variants are execution-strategy rewrites: their
    * user-facing SQL semantics (and oracle) ARE the plain queries', so the
    * SQL surface maps them to the same text (single-sourced from the
    * literal map above).
    */
  val sql: Map[String, String] = base ++ Map(
    "q_b3_sessionize_salted" -> base("q_b3_sessionize"),
    "q_b4_asof_salted" -> base("q_b4_asof_join"),
    // the stored-index search is an execution-strategy rewrite of q_c12:
    // identical user-facing semantics, same SQL text (parity proves the
    // index round-trip preserves every score)
    "q_c45_bm25_stored" -> base("q_c12_bm25"),
    // same class: q_c66 serves q_c1's candidates from the stored
    // signature index, and q_c68 from the base index + appended batch
    // signatures — parity proves round-trip and incremental maintenance
    // are both exact
    "q_c66_minhash_stored" -> base("q_c1_minhash_lsh"),
    "q_c68_minhash_append" -> base("q_c1_minhash_lsh"),
    // q_c129 merges the stored signature segments back into one
    // doc_id-sorted table — parity proves compaction ≡ one-shot build
    "q_c129_minhash_compacted" -> base("q_c1_minhash_lsh"),
    "q_c70_bm25_append" -> base("q_c12_bm25"),
    // q_c123 merges the stored segments back into one postings table —
    // parity proves compaction ≡ one-shot build
    "q_c123_bm25_compacted" -> base("q_c12_bm25"),
    // q_c107 appends batch positional postings + additive bigram counts
    // onto the base phrase index — parity proves append ≡ rebuild
    "q_c107_phrase_append" -> base("q_c103_phrase_search"),
    // q_c128 merges the stored phrase segments back into one postings +
    // bigram table — parity proves compaction ≡ one-shot build
    "q_c128_phrase_compacted" -> base("q_c103_phrase_search"))
}
