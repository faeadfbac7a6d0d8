package graft.tools
import graft.pipeline.{KgPipeline, ScaleLinking}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CcPlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val nodes = ScaleLinking.syntheticNodes(spark, 150000L).cache(); nodes.count()
    val (edges, _) = KgPipeline.candidateEdges(nodes)
    val e = edges.cache(); e.count()
    // replicate symmetrized+initialLabels+one ccStep manually
    val nP = spark.sessionState.conf.numShufflePartitions
    val sym = e.select($"src", $"dst").union(e.select($"dst".as("src"), $"src".as("dst")))
      .repartition(nP, $"src").localCheckpoint()
    val labels = nodes.select($"node_id", $"node_id".as("component"))
      .repartition(nP, $"node_id").localCheckpoint()
    System.err.println("[ccplan] sym partitioning: " + sym.queryExecution.executedPlan.outputPartitioning)
    System.err.println("[ccplan] labels partitioning: " + labels.queryExecution.executedPlan.outputPartitioning)
    val nbrMin = sym.join(labels, sym("src") === labels("node_id"))
      .groupBy($"dst").agg(min($"component").as("nbr_component"))
    val next = labels.join(nbrMin, labels("node_id") === nbrMin("dst"), "left")
      .select(labels("node_id"),
        least($"component", coalesce($"nbr_component", $"component")).as("component"))
    next.write.format("noop").mode("overwrite").save()
    System.err.println("[ccplan] executed plan:")
    System.err.println(next.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
