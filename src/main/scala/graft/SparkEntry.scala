package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by the operator modules under graft.ops; each
  * carries its own DuckDB oracle SQL where ANSI-expressible.
  */
object SparkEntry {
  /** Every registered query across all modules. */
  def registry: Seq[Q] =
    Rel.all ++ CdcQueries.all ++ Text.all ++ Dedup.all ++ Similarity.all ++
      AnnIndex.all ++ Multimodal.all ++ Events.all ++ Sampling.all ++
      AsOf.all ++ StreamGates.all ++ TableQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
