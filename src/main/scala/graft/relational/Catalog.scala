package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-expressible operator catalog over the driver testdata tables
  * (SURVEY.md §2 — every row DuckDB can mirror gets a `queries` +
  * `oracleSql` pair; t2 compares at sf0.01). Split by family:
  * CatalogCore (joins/aggs/windows/setops), CatalogText (dedup + text
  * analysis + dictionary ops), CatalogEmbed (similarity search +
  * multimodal stub), CatalogUdf (registered pal_* semantics UDFs).
  */
object Catalog {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CatalogCore.queries ++ CatalogText.queries ++ CatalogEmbed.queries ++ CatalogUdf.queries

  def oracleSql: Map[String, String] =
    CatalogCore.oracleSql ++ CatalogText.oracleSql ++ CatalogEmbed.oracleSql ++ CatalogUdf.oracleSql
}
