package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Session factory tuned for the local[32] test harness but configured the
  * way a production cluster session would be: AQE on (runtime re-plan,
  * skew-join handling), UTC, broadcast threshold generous enough that the
  * TPC-H-ish dims (region/nation/supplier/customer at test SF) broadcast.
  */
object GraftSession {
  def local(cores: Int = 32, shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is TIMESTAMP(NANOS); read as BIGINT nanos (see
      // EventQueries scaladoc for the µs canonicalization contract)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

/** Parquet table loader over the driver test data layout
  * (`TESTDATA.md`: one parquet per table under the SF dir).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

/** Decimal canonicalization for DuckDB-oracle hash equality (SURVEY §2.4):
  * money/double aggregates are computed as SUM(CAST(x AS DECIMAL(18,6)))
  * and emitted as DECIMAL(38,6); averages as decimal sum / count. Products
  * of doubles are computed IN DOUBLE (identical IEEE order on both
  * engines) and cast to decimal exactly once — this avoids divergent
  * decimal precision-propagation rules between Spark and DuckDB.
  */
object Decimals {
  val D18: DecimalType = DecimalType(18, 6)
  val D38: DecimalType = DecimalType(38, 6)

  /** Canonical intermediate decimal. */
  def dec(c: Column): Column = c.cast(D18)

  /** Canonical emitted decimal. */
  def money(c: Column): Column = c.cast(D38)

  /** SUM(CAST(x AS DECIMAL(18,6))) :: DECIMAL(38,6) */
  def sumMoney(c: Column): Column = sum(dec(c)).cast(D38)

  /** Exact decimal average: sum/count, both exact, emitted DECIMAL(38,6). */
  def avgMoney(c: Column): Column =
    (sum(dec(c)).cast(D38) / count(lit(1))).cast(D38)
}

/** A named query with its DuckDB oracle. `oracle=None` ⇒ the driver records
  * a weaker rows-only check (used for ops whose internals are not
  * SQL-expressible, e.g. ANN with learned centroids).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String]
)(val plan: (SparkSession, String) => DataFrame)
