package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components loop at its intended scale regime (above the
  * driver-union-find threshold): 240k synthetic nodes in chains and
  * stars — verifies the iterative DataFrame path converges to correct
  * labels within the iteration bound on a graph 1000× the alias graphs
  * the corpus produces.
  */
class CcStressSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("ccstress")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("iterative CC labels 240k nodes (chains of 6 + stars of 12) correctly") {
    // 20k chains of 6 nodes: ids c*1000+0..5 linked linearly (diameter 5)
    // 10k stars of 12 nodes: hub s, spokes s+1..s+11
    val chains = spark.range(20000).selectExpr("id * 1000 AS base")
    val chainNodes = chains.selectExpr("explode(transform(sequence(0, 5), i -> base + i)) AS node_id")
    val chainEdges = chains.selectExpr(
      "explode(transform(sequence(0, 4), i -> struct(base + i AS src, base + i + 1 AS dst))) AS e")
      .select(col("e.src"), col("e.dst"))
    val stars = spark.range(10000).selectExpr("100000000 + id * 1000 AS hub")
    val starNodes = stars.selectExpr("explode(transform(sequence(0, 11), i -> hub + i)) AS node_id")
    val starEdges = stars.selectExpr(
      "explode(transform(sequence(1, 11), i -> struct(hub AS src, hub + i AS dst))) AS e")
      .select(col("e.src"), col("e.dst"))

    val nodes = chainNodes.union(starNodes)
    val edges = chainEdges.union(starEdges)
    assert(nodes.count() == 240000)

    val labels = KgPipeline.connectedComponentsLoop(nodes, edges)
    // every node's component must equal its group minimum
    val wrong = labels
      .withColumn("expected",
        when(col("node_id") >= 100000000L, (floor((col("node_id") - 100000000L) / 1000) * 1000) + 100000000L)
          .otherwise(floor(col("node_id") / 1000) * 1000))
      .where(col("component") =!= col("expected"))
      .count()
    assert(wrong == 0, s"$wrong nodes mislabeled")
    val nComponents = labels.select(col("component")).distinct().count()
    assert(nComponents == 30000)
  }
}
