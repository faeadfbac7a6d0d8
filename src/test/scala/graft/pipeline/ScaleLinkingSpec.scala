package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural gates for the ScaleLinking harness at small size (the
  * bench runs it at 450k nodes): every alias family merges into exactly
  * one component, hot blocks overflow the cap (counted, dropped), and
  * the salted resolve assigns entity ids to every triple.
  */
class ScaleLinkingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("scale-linking")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("alias families merge 3->1, hot blocks capped, salted resolve covers") {
    val nEntities = 2000L
    val nodes = ScaleLinking.syntheticNodes(spark, nEntities).cache()
    assert(nodes.count() == 3 * nEntities)
    // cap 50 < the 100-per-name hot blocks (2000/20 v1-forms etc.)
    val (edges, overflow) = KgPipeline.candidateEdges(nodes, maxBlock = 50)
    assert(overflow.count() > 0, "hot first-name blocks must overflow the cap")
    val labels = KgPipeline.connectedComponentsLoop(nodes, edges)
    val nComp = labels.select(col("component")).distinct().count()
    assert(nComp == nEntities, s"expected $nEntities components, got $nComp")
    val canonMap = KgPipeline.canonicalize(nodes, labels)
    val triples = ScaleLinking.syntheticTriples(spark, 5000L, nEntities)
    val resolved = KgPipeline.resolveTriplesSalted(triples, canonMap)
    val n = resolved.count()
    val withId = resolved.where(col("subj_id").isNotNull && col("obj_id").isNotNull).count()
    assert(n == 5000L && withId == n, s"salted resolve left ${n - withId} triples unresolved")
    nodes.unpersist()
  }
}
