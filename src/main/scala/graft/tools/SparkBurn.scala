package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SparkBurn {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val spark = SparkSession.builder().master(s"local[$n]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    spark.range(0, 8000000000L, 1, n).select(max(xxhash64(col("id")))).collect()
    println(f"[burn] threads=$n wall=${(System.nanoTime()-t0)/1e9}%.2f")
    spark.stop()
  }
}
