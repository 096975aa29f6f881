package graft.operators

import graft.core.{Decimals, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core surface Q-A1..Q-A20 (SURVEY §2.4-A).
  *
  * Every query: total ORDER BY on a unique key; money computed in exact
  * DECIMAL via [[Decimals]] and emitted as DOUBLE (driver-hash canonical
  * form); computed integers emitted as BIGINT.
  * Each Spark plan is paired with ANSI SQL the driver runs in DuckDB.
  *
  * Scale posture: filters/projections reach the parquet scan (verified via
  * explain — PushedFilters/ReadSchema); dims are broadcast explicitly where
  * the join is a star-join (Q-A4); everything else relies on
  * AQE + shuffle-hash/SMJ which is the right default at 100 TB.
  */
object RelationalQueries {
  import Decimals._

  private def li(s: SparkSession, d: String) = Tables(s, d, "lineitem")
  // scan-spread opt-out for the semi/anti probes whose lineitem side is
  // immediately collapsed to join keys (OPTIMIZATION_r18.md)
  private def liRaw(s: SparkSession, d: String) = Tables.raw(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables(s, d, "customer")
  private def supp(s: SparkSession, d: String) = Tables(s, d, "supplier")
  private def part(s: SparkSession, d: String) = Tables(s, d, "part")
  private def nat(s: SparkSession, d: String) = Tables(s, d, "nation")
  private def reg(s: SparkSession, d: String) = Tables(s, d, "region")

  val defs: Seq[QueryDef] = Seq(
    // ---- Q-A1: scan + filter + project (parquet pushdown) ----------------
    QueryDef(
      "q_a1_scan_filter",
      Some("""SELECT l_orderkey, l_linenumber, l_quantity
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
             |  AND l_discount > 0.05
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ) { (s, d) =>
      li(s, d)
        .filter(
          col("l_shipdate") >= lit("1995-01-01 00:00:00").cast("timestamp")
            && col("l_discount") > 0.05
        )
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- Q-A2: hash aggregate (pricing summary) --------------------------
    QueryDef(
      "q_a2_agg",
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_qty,
             |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_base_price,
             |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
             |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
             |  CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) / COUNT(*) AS DECIMAL(38,6)) AS DOUBLE) AS avg_qty,
             |  CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) / COUNT(*) AS DECIMAL(38,6)) AS DOUBLE) AS avg_price,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    ) { (s, d) =>
      li(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumMoney(col("l_quantity")).as("sum_qty"),
          sumMoney(col("l_extendedprice")).as("sum_base_price"),
          sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          sumMoney(
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              * (lit(1.0) + col("l_tax"))
          ).as("sum_charge"),
          avgMoney(col("l_quantity")).as("avg_qty"),
          avgMoney(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- Q-A3: equi inner join -------------------------------------------
    QueryDef(
      "q_a3_join_inner",
      Some("""SELECT o_orderkey, o_orderdate, o_totalprice, c_name
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |ORDER BY o_orderkey""".stripMargin)
    ) { (s, d) =>
      ord(s, d)
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment") === "BUILDING")
        .select(
          col("o_orderkey"),
          col("o_orderdate"),
          col("o_totalprice"),
          col("c_name")
        )
        .orderBy(col("o_orderkey"))
    },

    // ---- Q-A4: broadcast star-join chain ---------------------------------
    QueryDef(
      "q_a4_join_broadcast",
      Some("""SELECT n_name,
             |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name
             |ORDER BY n_name""".stripMargin)
    ) { (s, d) =>
      li(s, d)
        .join(broadcast(supp(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg(s, d)), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(
          sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue")
        )
        .orderBy(col("n_name"))
    },

    // ---- Q-A5: left outer join + null-aware aggregation ------------------
    QueryDef(
      "q_a5_join_outer",
      Some("""SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_count,
             |  CAST(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 0) AS DECIMAL(38,6)) AS DOUBLE) AS total_spent
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey, c_name
             |ORDER BY c_custkey""".stripMargin)
    ) { (s, d) =>
      cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          count(col("o_orderkey")).as("order_count"),
          emit(coalesce(sum(dec(col("o_totalprice"))), lit(0)).cast(D38))
            .as("total_spent")
        )
        .orderBy(col("c_custkey"))
    },

    // ---- Q-A6: left-semi join --------------------------------------------
    QueryDef(
      "q_a6_semi",
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
             |ORDER BY p_partkey""".stripMargin)
    ) { (s, d) =>
      part(s, d)
        .join(liRaw(s, d), col("p_partkey") === col("l_partkey"), "left_semi")
        .select(col("p_partkey"), col("p_name"))
        .orderBy(col("p_partkey"))
    },

    // ---- Q-A6b: left-anti join -------------------------------------------
    QueryDef(
      "q_a6_anti",
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)
    ) { (s, d) =>
      cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // ---- Q-A7: downsample-as-SQL (reference A1 windowed spatial reduce) --
    // Models the reference's 2× spatial downsample (imaris_to_zarr.py:532-674)
    // relationally: bucket the (orderkey, linenumber) grid by linenumber/2 and
    // reduce each window with sum/min/max — same groupBy shape as a
    // block-local 2×2×2 voxel reduce.
    QueryDef(
      "q_a7_downsample",
      Some("""SELECT l_orderkey, CAST(l_linenumber // 2 AS BIGINT) AS ln_bucket,
             |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_qty,
             |  MIN(l_quantity) AS min_qty,
             |  MAX(l_quantity) AS max_qty,
             |  COUNT(*) AS cnt
             |FROM lineitem
             |GROUP BY l_orderkey, l_linenumber // 2
             |ORDER BY l_orderkey, ln_bucket""".stripMargin)
    ) { (s, d) =>
      li(s, d)
        .groupBy(
          col("l_orderkey"),
          expr("CAST(l_linenumber DIV 2 AS BIGINT)").as("ln_bucket")
        )
        .agg(
          sumMoney(col("l_quantity")).as("sum_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          count(lit(1)).as("cnt")
        )
        .orderBy(col("l_orderkey"), col("ln_bucket"))
    },

    // ---- Q-A8: exact distinct --------------------------------------------
    QueryDef(
      "q_a8_distinct",
      Some("""SELECT l_returnflag,
             |  COUNT(DISTINCT l_partkey) AS distinct_parts,
             |  COUNT(DISTINCT l_suppkey) AS distinct_supps,
             |  COUNT(*) AS cnt
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ) { (s, d) =>
      li(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("distinct_parts"),
          countDistinct(col("l_suppkey")).as("distinct_supps"),
          count(lit(1)).as("cnt")
        )
        .orderBy(col("l_returnflag"))
    },

    // ---- Q-A8b: approx distinct (HLL) — rows-only check (approximate) ----
    QueryDef("q_a8_approx_distinct", None) { (s, d) =>
      li(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          count(lit(1)).as("cnt")
        )
        .orderBy(col("l_returnflag"))
    },

    // ---- Q-A9: rollup + grouping flags -----------------------------------
    QueryDef(
      "q_a9_rollup",
      Some("""SELECT CAST(GROUPING(n_name) AS BIGINT) AS g_n,
             |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_p,
             |       n_name, o_orderpriority, COUNT(*) AS cnt,
             |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY ROLLUP(n_name, o_orderpriority)
             |ORDER BY g_n, g_p, n_name NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    ) { (s, d) =>
      ord(s, d)
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("o_orderpriority"))
        .agg(
          grouping(col("n_name")).cast("long").as("g_n"),
          grouping(col("o_orderpriority")).cast("long").as("g_p"),
          count(lit(1)).as("cnt"),
          sumMoney(col("o_totalprice")).as("total")
        )
        .select(
          col("g_n"), col("g_p"), col("n_name"), col("o_orderpriority"),
          col("cnt"), col("total")
        )
        .orderBy(
          col("g_n"),
          col("g_p"),
          col("n_name").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first
        )
    },

    // ---- Q-A10: ranking window -------------------------------------------
    QueryDef(
      "q_a10_rank",
      Some("""SELECT * FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
             |    CAST(RANK() OVER w AS BIGINT) AS rnk,
             |    CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
             |) WHERE rn <= 3
             |ORDER BY o_custkey, rn""".stripMargin)
    ) { (s, d) =>
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      ord(s, d)
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          col("o_totalprice"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk")
        )
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    },

    // ---- Q-A11: running-frame window aggregate ---------------------------
    QueryDef(
      "q_a11_running_sum",
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
             |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)) AS DOUBLE) AS running_total
             |FROM orders
             |ORDER BY o_custkey, o_orderkey""".stripMargin)
    ) { (s, d) =>
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ord(s, d)
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          col("o_orderdate"),
          emit(sum(dec(col("o_totalprice"))).over(w).cast(D38)).as("running_total")
        )
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // ---- Q-A12: lag/lead analytics ---------------------------------------
    QueryDef(
      "q_a12_lag",
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
             |  LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_date,
             |  DATEDIFF('day',
             |    LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             |    o_orderdate) AS gap_days
             |FROM orders
             |ORDER BY o_custkey, o_orderkey""".stripMargin)
    ) { (s, d) =>
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      ord(s, d)
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(w).as("prev_date")
        )
        .withColumn(
          "gap_days",
          datediff(col("o_orderdate"), col("prev_date")).cast("long")
        )
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // ---- Q-A13: sort + limit top-k (TakeOrderedAndProject) ---------------
    QueryDef(
      "q_a13_topk",
      Some("""SELECT l_partkey,
             |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
             |FROM lineitem GROUP BY l_partkey
             |ORDER BY revenue DESC, l_partkey LIMIT 10""".stripMargin)
    ) { (s, d) =>
      li(s, d)
        .groupBy(col("l_partkey"))
        .agg(
          sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue")
        )
        .orderBy(col("revenue").desc, col("l_partkey"))
        .limit(10)
    },

    // ---- Q-A14: set operations -------------------------------------------
    QueryDef(
      "q_a14_setops",
      Some("""WITH a AS (SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nkey FROM supplier),
             |     b AS (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nkey FROM customer)
             |SELECT op, nkey FROM (
             |  SELECT 'union' AS op, nkey FROM (SELECT nkey FROM a UNION SELECT nkey FROM b)
             |  UNION ALL
             |  SELECT 'intersect' AS op, nkey FROM (SELECT nkey FROM a INTERSECT SELECT nkey FROM b)
             |  UNION ALL
             |  SELECT 'except' AS op, nkey FROM (SELECT nkey FROM a EXCEPT SELECT nkey FROM b)
             |)
             |ORDER BY op, nkey""".stripMargin)
    ) { (s, d) =>
      val a = supp(s, d).select(col("s_nationkey").cast("long").as("nkey")).distinct()
      val b = cust(s, d).select(col("c_nationkey").cast("long").as("nkey")).distinct()
      a.union(b).distinct().withColumn("op", lit("union"))
        .unionByName(a.intersect(b).withColumn("op", lit("intersect")))
        .unionByName(a.except(b).withColumn("op", lit("except")))
        .select(col("op"), col("nkey"))
        .orderBy(col("op"), col("nkey"))
    },

    // ---- Q-A15: scalar subquery + IN-subquery ----------------------------
    // "above average retail price" is expressed multiplicatively
    // (price * n > sum) so both engines compare exact decimals — no
    // division rounding in the filter.
    QueryDef(
      "q_a15_subquery",
      Some("""SELECT p_partkey, p_name, p_retailprice
             |FROM part
             |WHERE CAST(p_retailprice AS DECIMAL(18,6)) * (SELECT COUNT(*) FROM part)
             |      > (SELECT SUM(CAST(p_retailprice AS DECIMAL(18,6))) FROM part)
             |  AND p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
             |ORDER BY p_partkey""".stripMargin)
    ) { (s, d) =>
      val p = part(s, d)
      val stats = p.agg(
        sum(dec(col("p_retailprice"))).as("price_sum"),
        count(lit(1)).as("n_parts")
      )
      p.crossJoin(broadcast(stats))
        .filter(dec(col("p_retailprice")) * col("n_parts") > col("price_sum"))
        .join(
          liRaw(s, d).filter(col("l_quantity") > 45).select(col("l_partkey")),
          col("p_partkey") === col("l_partkey"),
          "left_semi"
        )
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .orderBy(col("p_partkey"))
    },

    // ---- Q-A16: CASE banding ---------------------------------------------
    QueryDef(
      "q_a16_case",
      Some("""SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
             |            WHEN o_totalprice < 150000 THEN 'mid'
             |            ELSE 'high' END AS band,
             |       COUNT(*) AS cnt,
             |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total
             |FROM orders GROUP BY 1 ORDER BY band""".stripMargin)
    ) { (s, d) =>
      ord(s, d)
        .select(
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 150000, "mid")
            .otherwise("high")
            .as("band"),
          col("o_totalprice")
        )
        .groupBy(col("band"))
        .agg(count(lit(1)).as("cnt"), sumMoney(col("o_totalprice")).as("total"))
        .orderBy(col("band"))
    },

    // ---- Q-A17: string functions -----------------------------------------
    QueryDef(
      "q_a17_string",
      Some("""SELECT p_partkey,
             |  upper(substr(p_name, 1, 5)) AS name_prefix,
             |  concat_ws('-', p_brand, p_type) AS brand_type,
             |  p_name LIKE '%wid%' AS is_widget,
             |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
             |  CAST(length(trim(p_name)) AS BIGINT) AS name_len
             |FROM part ORDER BY p_partkey""".stripMargin)
    ) { (s, d) =>
      part(s, d)
        .select(
          col("p_partkey"),
          upper(substring(col("p_name"), 1, 5)).as("name_prefix"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          col("p_name").like("%wid%").as("is_widget"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
          length(trim(col("p_name"))).cast("long").as("name_len")
        )
        .orderBy(col("p_partkey"))
    },

    // ---- Q-A18: date functions -------------------------------------------
    QueryDef(
      "q_a18_date",
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |  CAST(month(o_orderdate) AS BIGINT) AS o_month,
             |  date_trunc('month', o_orderdate) AS month_start,
             |  last_day(o_orderdate) AS month_end,
             |  DATEDIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ) { (s, d) =>
      ord(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year"),
          month(col("o_orderdate")).cast("long").as("o_month"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          last_day(col("o_orderdate")).as("month_end"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
            .cast("long")
            .as("days_since_95")
        )
        .orderBy(col("o_orderkey"))
    },

    // ---- Q-A19: math functions -------------------------------------------
    QueryDef(
      "q_a19_math",
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,6)), 1) AS DOUBLE) AS price_round,
             |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
             |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
             |  CAST(CAST(abs(l_extendedprice - l_quantity) AS DECIMAL(18,6)) AS DOUBLE) AS adiff,
             |  CAST(CAST(sqrt(l_extendedprice) AS DECIMAL(18,6)) AS DOUBLE) AS price_sqrt,
             |  CAST(CAST(pow(l_discount, 2) AS DECIMAL(18,6)) AS DOUBLE) AS disc_sq
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ) { (s, d) =>
      li(s, d)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          emit(round(dec(col("l_extendedprice")), 1)).as("price_round"),
          floor(col("l_extendedprice")).cast("long").as("price_floor"),
          ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
          emitQ(abs(col("l_extendedprice") - col("l_quantity"))).as("adiff"),
          emitQ(sqrt(col("l_extendedprice"))).as("price_sqrt"),
          emitQ(pow(col("l_discount"), 2)).as("disc_sq")
        )
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- Q-A20a: array functions -----------------------------------------
    QueryDef(
      "q_a20_array",
      Some("""SELECT p_partkey,
             |  string_split(p_name, ' ')[1] AS first_word,
             |  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
             |  list_contains(string_split(p_name, ' '), 'widget') AS has_widget,
             |  array_to_string(list_sort(string_split(p_name, ' ')), '_') AS sorted_words
             |FROM part ORDER BY p_partkey""".stripMargin)
    ) { (s, d) =>
      part(s, d)
        .select(col("p_partkey"), split(col("p_name"), " ").as("words"))
        .select(
          col("p_partkey"),
          element_at(col("words"), 1).as("first_word"),
          size(col("words")).cast("long").as("n_words"),
          array_contains(col("words"), "widget").as("has_widget"),
          concat_ws("_", sort_array(col("words"))).as("sorted_words")
        )
        .orderBy(col("p_partkey"))
    },

    // ---- Q-A20b: JSON extraction -----------------------------------------
    QueryDef(
      "q_a20_json",
      Some("""SELECT event_id,
             |  CAST(json_extract_string(props, 'k') AS BIGINT) AS k_val
             |FROM events ORDER BY event_id""".stripMargin)
    ) { (s, d) =>
      Tables(s, d, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val")
        )
        .orderBy(col("event_id"))
    },

    // ---- Q-A21: CUBE (full grouping-set lattice) -------------------------
    QueryDef(
      "q_a21_cube",
      Some("""SELECT CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
             |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
             |       o_orderpriority, o_orderstatus, COUNT(*) AS cnt,
             |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total
             |FROM orders
             |GROUP BY CUBE(o_orderpriority, o_orderstatus)
             |ORDER BY g_pri, g_st, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)
    ) { (s, d) =>
      // cube = all 4 grouping sets in ONE pass (Expand + partial agg —
      // no re-scan per set); same shuffle shape as a plain groupBy
      ord(s, d)
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(
          grouping(col("o_orderpriority")).cast("long").as("g_pri"),
          grouping(col("o_orderstatus")).cast("long").as("g_st"),
          count(lit(1)).as("cnt"),
          sumMoney(col("o_totalprice")).as("total")
        )
        .select(col("g_pri"), col("g_st"), col("o_orderpriority"),
          col("o_orderstatus"), col("cnt"), col("total"))
        .orderBy(col("g_pri"), col("g_st"),
          col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)
    },

    // ---- Q-A22: PIVOT (event_type -> per-type count columns) -------------
    QueryDef(
      "q_a22_pivot",
      Some("""SELECT user_id % 10 AS user_bucket,
             |  COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
             |  COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
             |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             |  COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
             |  COUNT(*) FILTER (WHERE event_type = 'view')     AS view
             |FROM events
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ) { (s, d) =>
      // explicit value list => deterministic output columns AND one-pass
      // pivot (no extra distinct-values job); compiles to the same
      // conditional aggregation the oracle spells out
      Tables(s, d, "events")
        .withColumn("user_bucket", col("user_id") % 10)
        .groupBy(col("user_bucket"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy(col("user_bucket"))
    }
  )
}
