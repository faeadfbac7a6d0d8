package graft.pipeline

import graft.corpus.TranscriptGen
import graft.semantics.{Linker, Similarity, StringOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Gazetteer lookup + heuristic disambiguation (SURVEY.md §2 rows 11/33/
  * 44/46): a knowledge-base alias table is broadcast-joined to mentions
  * on a cheap blocking key, candidates are scored with column arithmetic
  * (string similarity + type agreement + popularity prior), and the
  * per-mention argmax is taken with one window (max_by shape).
  */
object Gazetteer {

  /** alias table: (alias, alias_norm, block_key, entity_id, entity_type,
    * popularity). Built from the synthetic KB; at deploy scale this is a
    * dimension table scan.
    */
  def aliasTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = for {
      e <- TranscriptGen.entities
      surface <- e.surfaces
      norm = StringOps.normalizeSurface(surface)
      key <- Linker.blockKeys(norm).headOption // first-token stem key
    } yield (surface, norm, key, e.id, e.tp, 1.0 / (1 + e.id % 7))
    rows.toDF("alias", "alias_norm", "block_key", "entity_id", "entity_type", "popularity")
  }

  /** Candidate generation (broadcast equi-join on block key) + residual
    * fuzzy predicate + scored disambiguation.
    *
    * Scoring runs on DISTINCT (norm, tag) surfaces, not on the mention
    * stream: the expensive similarity UDF touches a few hundred distinct
    * surfaces instead of millions of mention rows, and the winning
    * entity per surface is broadcast-joined back — same result, ~1000×
    * less UDF work at corpus scale.
    */
  def disambiguate(mentions: DataFrame, gazetteer: DataFrame): DataFrame = {
    val simUdf = udf((a: String, b: String) => Similarity.ngramSim(a, b))
    val keyUdf = udf((norm: String) => Linker.blockKeys(norm).headOption.orNull)
    val distinctSurfaces = mentions.select(col("norm"), col("tag")).distinct()
    val cands = distinctSurfaces
      .withColumn("block_key", keyUdf(col("norm")))
      .join(broadcast(gazetteer), Seq("block_key"), "inner")
      .withColumn("sim", simUdf(col("norm"), col("alias_norm")))
      .where(col("sim") >= 0.3) // residual theta predicate after equi-join
      .withColumn("score",
        round(col("sim") * 0.6 +
          when(col("tag") === col("entity_type"), 0.3).otherwise(0.0) +
          col("popularity") * 0.1, 6))
    import org.apache.spark.sql.expressions.Window
    // alias in the ordering makes the argmax a TOTAL order: two aliases
    // of the same entity can tie on (score, entity_id), and row_number
    // over a partial order is nondeterministic (caught by the r2
    // cross-engine oracle — DuckDB picked the other alias)
    val w = Window.partitionBy(col("norm"), col("tag"))
      .orderBy(col("score").desc, col("entity_id"), col("alias"))
    val best = cands.withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("norm"), col("tag"), col("entity_id"), col("alias"), col("score"))
    mentions.join(broadcast(best), Seq("norm", "tag"), "inner")
      .select(col("conv_id"), col("turn_idx"), col("start"), col("end"),
        col("value"), col("tag"), col("entity_id"), col("alias"), col("score"))
  }
}
