package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2.
  * KG-pipeline queries run on the deterministic synthetic transcript
  * corpus (FIXTURES.md §B — the driver corpus has no capitalizable
  * entities) and therefore have no DuckDB oracle; relational operators
  * run on the driver's testdata tables WITH `oracleSql`.
  */
object SparkEntry {

  /** Flagship: the full KG job (NER + triples + linking + CC) on an
    * sf0.001-scale corpus; returns canonically-resolved triples.
    */
  def entry(spark: SparkSession): DataFrame =
    Kg.built(spark, "/root/testdata/sf0.001").out.resolvedTriples

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    kgQueries ++ graft.relational.Catalog.queries

  def oracleSql: Map[String, String] = graft.relational.Catalog.oracleSql

  // ------------------------------------------------- KG pipeline queries
  private def kgQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kg_turns" -> ((s, d) => Kg.built(s, d).out.tagged.toDF()
      .select("conv_id", "turn_idx", "turn_ord", "role", "tool", "ts")),
    "kg_train_dict" -> ((s, d) => {
      val dict = graft.pipeline.NerTraining.dictionaryDF(
        graft.pipeline.Transcripts.trainSplit(Kg.built(s, d).labeled))
      dict.toDF("dict", "key", "value", "count")
    }),
    "kg_mentions" -> ((s, d) => Kg.built(s, d).out.mentions),
    "kg_triples" -> ((s, d) => Kg.built(s, d).out.triples),
    "kg_surface_nodes" -> ((s, d) => Kg.built(s, d).out.nodes),
    "kg_components" -> ((s, d) => Kg.built(s, d).out.components),
    "kg_entities" -> ((s, d) => Kg.built(s, d).out.entities),
    "kg_resolved_triples" -> ((s, d) => Kg.built(s, d).out.resolvedTriples),
    "kg_edges" -> ((s, d) => Kg.built(s, d).out.edges),
    "kg_block_overflow" -> ((s, d) => Kg.built(s, d).out.blockOverflow),
    "kg_eval_prf" -> ((s, d) => Kg.evalPrf(s, d)),
    "kg_ner_errors" -> ((s, d) => Kg.nerErrors(s, d)),
    "kg_role_confusion" -> ((s, d) =>
      graft.pipeline.ClassifyStage.confusion(Kg.roleScored(s, d))),
    "kg_role_accuracy" -> ((s, d) =>
      graft.pipeline.ClassifyStage.accuracy(Kg.roleScored(s, d))),
    "kg_gazetteer_disambig" -> ((s, d) =>
      graft.pipeline.Gazetteer.disambiguate(
        Kg.built(s, d).out.mentions, graft.pipeline.Gazetteer.aliasTable(s))),
    // skew diagnostics (SURVEY.md §2 row 59): quantiles of turns/conv and
    // mentions/entity — drives the salt-factor choice
    "kg_skew_diagnostics" -> ((s, d) => {
      val b = Kg.built(s, d)
      val convSizes = b.out.tagged.toDF().groupBy(col("conv_id")).agg(count(lit(1)).as("n"))
        .agg(lit("turns_per_conv").as("dist"),
          expr("percentile_approx(n, array(0.5, 0.9, 0.99, 0.999))").as("quantiles"),
          max(col("n")).as("max_n"))
      val entitySizes = b.out.mentions.groupBy(col("norm")).agg(count(lit(1)).as("n"))
        .agg(lit("mentions_per_surface").as("dist"),
          expr("percentile_approx(n, array(0.5, 0.9, 0.99, 0.999))").as("quantiles"),
          max(col("n")).as("max_n"))
      convSizes.unionByName(entitySizes)
    }),
    // metrics rollup with HLL approx-distinct (rows 57-58)
    "kg_metrics_rollup" -> ((s, d) => Kg.built(s, d).out.resolvedTriples
      .withColumn("day", to_date(col("ts")))
      .rollup(col("day"), col("pred"))
      .agg(count(lit(1)).as("n_triples"),
        approx_count_distinct(col("conv_id")).as("approx_convs"))
      .select(coalesce(col("day").cast("string"), lit("ALL")).as("day"),
        coalesce(col("pred"), lit("ALL")).as("pred"),
        col("n_triples"), col("approx_convs"))
      .orderBy(col("day"), col("pred"))),
    // graph materialization: writes partitioned triples + per-bucket
    // manifests (resumable), returns the manifest table (row 8, §7.5)
    // CategoryEntries merge as a UDAF (SURVEY.md §2 row 62): per-surface
    // tag-confidence distribution; map sorted to array for determinism
    "kg_surface_type_dist" -> ((s, d) => {
      graft.functions.CategoryMergeAggregator.register(s)
      Kg.built(s, d).out.mentions.createOrReplaceTempView("mentions_v")
      s.sql(
        """SELECT norm,
          |  array_sort(map_entries(pal_category_merge(tag, conf))) AS tag_dist,
          |  count(*) AS n
          |FROM mentions_v GROUP BY norm ORDER BY norm""".stripMargin)
    }),
    "kg_materialize" -> ((s, d) => {
      val b = Kg.built(s, d)
      val outDir = s"/tmp/graft_kg_out/${new java.io.File(d).getName}"
      graft.pipeline.GraphSink.writeTriples(s, b.out.resolvedTriples, outDir, 16)
      graft.pipeline.GraphSink.writeEntities(b.out.entities, outDir)
      graft.pipeline.GraphSink.writeEdges(b.out.edges, outDir)
      s.read.json(s"$outDir/_manifests").orderBy(col("bucket"))
    })
  )
}
