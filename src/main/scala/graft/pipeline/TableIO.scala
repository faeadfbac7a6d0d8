package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Table abstraction over the storage layer (SURVEY.md §7.4): the north
  * rule targets Iceberg graph tables, but the sandbox ships no Iceberg
  * jars, so the local implementation is partitioned Parquet with the
  * GraphSink manifest protocol standing in for snapshot metadata. At
  * deploy time an IcebergTables implementation is a config swap —
  * `writeTo(table).partitionedBy(...)` + snapshot id as lineage — with
  * no changes to the pipeline stages, which only see this trait.
  */
trait TableIO {
  def read(spark: SparkSession, table: String): DataFrame
  def write(df: DataFrame, table: String, partitionCols: Seq[String], mode: SaveMode): Unit
  /** Opaque lineage token for the table's current state (Iceberg:
    * snapshot id; Parquet: xor of manifest fingerprints).
    */
  def lineage(spark: SparkSession, table: String): String
}

/** Partitioned-Parquet implementation rooted at `baseDir`. */
final class ParquetTables(baseDir: String) extends TableIO {

  private def path(table: String) = s"$baseDir/$table"

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(path(table))

  override def write(df: DataFrame, table: String, partitionCols: Seq[String], mode: SaveMode): Unit = {
    val w = df.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path(table))
  }

  override def lineage(spark: SparkSession, table: String): String = {
    val manifests = new org.apache.hadoop.fs.Path(s"${path(table)}/../_manifests")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(manifests)) "none"
    else {
      val fps = fs.listStatus(manifests).map { st =>
        val content = new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(fs.open(st.getPath)),
          java.nio.charset.StandardCharsets.UTF_8)
        """"fingerprint":(-?\d+)""".r.findFirstMatchIn(content).map(_.group(1).toLong).getOrElse(0L)
      }
      fps.foldLeft(0L)(_ ^ _).toString
    }
  }
}
