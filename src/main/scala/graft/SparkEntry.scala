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
        Kg.built(s, d).out.mentions, graft.pipeline.Gazetteer.aliasTable(s)))
  )
}
