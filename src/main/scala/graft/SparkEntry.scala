package graft

import graft.core.QueryDef
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2.4 is registered here as a
  * named query; `oracleSql` carries the DuckDB twin the driver
  * hash-compares against.
  */
object SparkEntry {

  /** All registered query definitions, in declaration order. */
  def allDefs: Seq[QueryDef] =
    RelationalQueries.defs ++ EventQueries.defs ++ DedupQueries.defs ++
      SimilarityQueries.defs ++ TextQueries.defs ++ MultimodalOps.defs ++
      PipelineQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val q2 = allDefs.find(_.name == "q_a2_agg").get
    q2.plan(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.plan).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
