package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the plans that matter at scale:
  * scan pushdown/pruning, broadcast selection, aggregate strategy,
  * whole-stage codegen spans (SURVEY.md §4.2 checklist).
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val targets = Seq("r_pricing_agg", "r_broadcast_dims", "r_semi_join",
      "t_minhash_lsh", "e_knn_quantized")
    for (name <- targets) {
      println(s"\n=============== $name ===============")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    println("\n=============== kg surface nodes agg ===============")
    val b = Kg2.smallBuild(spark)
    b.nodes.explain("formatted")
    println("\n=============== kg resolved triples (salted join) ===============")
    b.resolvedTriples.explain()
    println("\n=============== gazetteer salted disambiguation ===============")
    // The salted path does not FORCE a join strategy — it removes the
    // broadcast hint and adds the salt keys. At tiny sizes the planner
    // still broadcasts (harmless: the salts just ride along); past the
    // autoBroadcastJoinThreshold the join shuffles on (block_key, salt)
    // / (norm, tag, m_salt), which is where the salting spreads hot
    // keys. Both sizes are planned here (planning only — no execution).
    val gaz = graft.pipeline.ScaleLinking.syntheticAliasTable(spark, 200, 50)
    val men = graft.pipeline.ScaleLinking.syntheticGazMentions(spark, 1000, 200, 50)
    graft.pipeline.Gazetteer.disambiguateSalted(men, gaz).explain("formatted")
    println("\n===== gazetteer salted disambiguation AT BENCH SCALE (planned) =====")
    val gazXl = graft.pipeline.ScaleLinking.syntheticAliasTable(spark, 150000)
    val menXl = graft.pipeline.ScaleLinking.syntheticGazMentions(spark, 1000000, 150000)
    graft.pipeline.Gazetteer.disambiguateSalted(menXl, gazXl).explain()
    spark.stop()
  }

  object Kg2 {
    def smallBuild(spark: SparkSession): graft.pipeline.KgPipeline.KgOutput = {
      val labeled = graft.pipeline.Transcripts.generateLabeled(spark, 30)
      val model = graft.pipeline.NerTraining.trainAndBroadcast(
        spark, graft.pipeline.Transcripts.trainSplit(labeled))
      graft.pipeline.KgPipeline.run(spark,
        graft.pipeline.Transcripts.generate(spark, 30), model)
    }
  }
}
