package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.pipeline.PipelineQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are grouped by module; each has a DuckDB oracle in [[oracleSql]]
  * unless the operator is not SQL-expressible (rows-only check).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full parse -> enrich -> route -> aggregate pipeline's per-sink
    * delivery counters (the reference's primary correctness metric).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("pipe_e2e_counts")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    PipelineQueries.queries ++ graft.ops.GenericQueries.queries ++
      graft.ops.TrainingOps.queries ++ graft.ops.Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    PipelineQueries.oracleSql ++ graft.ops.GenericQueries.oracleSql ++
      graft.ops.TrainingOps.oracleSql ++ graft.ops.Multimodal.oracleSql
}
