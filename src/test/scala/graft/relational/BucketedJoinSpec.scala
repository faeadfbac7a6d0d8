package graft.relational

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing for co-located joins (SURVEY.md §4.2 / builder prompt:
  * "repartition/bucketing for co-located joins"): writing both fact
  * tables bucketed + sorted by the join key lets the sort-merge join
  * run with ZERO exchanges — the shuffle is paid once at write time and
  * amortized over every subsequent join, the standard pattern for the
  * 100 TB layout (Iceberg bucket(conv_id) partitioning at deploy).
  */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val warehouse = java.nio.file.Files.createTempDirectory("wh").toString

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("bucketed")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bucketed+sorted tables join without any exchange") {
    val sfDir = "/root/testdata/sf0.001"
    // getOrCreate may hand back another suite's session — re-assert the
    // runtime-settable configs this test depends on
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // ... and drop tables AND their locations defensively
    for (t <- Seq("lineitem_b", "orders_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        spark.table("lineitem_b")("l_orderkey") === spark.table("orders_b")("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

    // and it computes the right thing
    val n = joined.count()
    val expected = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .join(spark.read.parquet(s"$sfDir/orders.parquet"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .count()
    assert(n == expected)
  }
}
