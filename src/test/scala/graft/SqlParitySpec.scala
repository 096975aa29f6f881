package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SQL-parser surface proof: for oracle strings that are ANSI (not
  * DuckDB-dialect), running them through `spark.sql` over registered temp
  * views must produce exactly the DataFrame plans' results.
  */
class SqlParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  // oracles that parse in both engines (no string_split/list_*/epoch_us)
  private val ansiQueries = Seq("q_a2_agg", "q_a3_join_inner", "q_a13_topk", "q_a16_case")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-sqlparity-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      spark.read.parquet(s"$sf/$t.parquet").createOrReplaceTempView(t)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  for (name <- ansiQueries)
    test(s"$name: spark.sql(oracle) == DataFrame plan") {
      val sqlRows = spark.sql(SparkEntry.oracleSql(name)).collect().map(_.toString).toSeq
      val dfRows = SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
      assert(sqlRows == dfRows)
    }
}
