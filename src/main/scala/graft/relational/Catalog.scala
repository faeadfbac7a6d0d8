package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-expressible operator catalog over the driver testdata tables
  * (SURVEY.md §2 — every row that DuckDB can mirror gets a `queries` +
  * `oracleSql` pair; t2 compares at sf0.01). Filled out milestone M6.
  */
object Catalog {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map.empty

  def oracleSql: Map[String, String] = Map.empty
}
