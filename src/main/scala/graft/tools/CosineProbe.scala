package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CosineProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val d = "/root/testdata/sf0.1"
    t("warm: trivial parquet count") { spark.read.parquet(s"$d/embeddings.parquet").count() }
    val base = spark.read.parquet(s"$d/embeddings.parquet").select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    t("norm+bucket count") {
      graft.relational.CatalogEmbed.cosineDupes(base, 2.0).count() // minCos 2.0 -> joins but no output rows
    }
    t("full query (1st)") { graft.relational.CatalogEmbed.queries("e_cosine_dupes")(spark, d).count() }
    t("full query (2nd)") { graft.relational.CatalogEmbed.queries("e_cosine_dupes")(spark, d).count() }
    spark.stop()
  }
}
