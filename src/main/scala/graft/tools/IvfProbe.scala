package graft.tools
import org.apache.spark.sql.SparkSession
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").count() // warm
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.relational.CatalogEmbed.queries("e_ann_ivf")(spark, "/root/testdata/sf0.1").count()
      println(f"[probe] e_ann_ivf run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
