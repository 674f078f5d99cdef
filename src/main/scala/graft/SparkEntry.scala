package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.{OrdinaryPayment, RunParams, WorkflowType}
import graft.queries.{ExtQueries, ParityQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full nested-document output (SURVEY §3.1) over the whole date range.
    */
  def entry(spark: SparkSession): DataFrame =
    OrdinaryPayment(spark, "/root/testdata/sf0.001",
      RunParams(WorkflowType.OneTimeInforce, "1995-01-01", "2002-01-01"))

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Contract: applying an entry returns a LAZY DataFrame — no job runs
    * until the caller acts on it. One documented exception:
    * `x120_orchestrated_dag` executes its publish/consume DAG eagerly on
    * application (distributed writes can't stay lazy); see
    * [[graft.queries.ExtQueries.x120OrchestratedDag]].
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ ExtQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ParityQueries.oracles ++ ExtQueries.oracles
}
