package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Span-level NER evaluation with MUC-style error classes (SURVEY.md §2
  * row 38): full outer join on exact spans, plus an interval-overlap
  * (range) join to distinguish wrong-boundary/wrong-type from pure
  * miss/spurious.
  */
object NerEval {

  /** pred/gold: (conv_id, turn_idx, start, end, tag). Returns one row per
    * error-class with counts: correct, wrong_type, wrong_boundary, miss,
    * spurious.
    */
  def errorClasses(spark: SparkSession, pred: DataFrame, gold: DataFrame): DataFrame = {
    val p = pred.select(col("conv_id"), col("turn_idx"),
      col("start").as("p_start"), col("end").as("p_end"), col("tag").as("p_tag"))
    val g = gold.select(col("conv_id"), col("turn_idx"),
      col("start").as("g_start"), col("end").as("g_end"), col("tag").as("g_tag"))
    // interval-overlap join within the same turn (range-join shape).
    // localCheckpoint (r6): this subtree feeds THREE consumers below
    // (the class projection, matchedPred, matchedGold) and re-executed
    // per reference inside the one final plan; the overlap table is
    // eval-split-sized, so materializing it once is strictly cheaper
    // than three span joins.
    val overlap = p.join(g, Seq("conv_id", "turn_idx"))
      .where(col("p_start") < col("g_end") && col("g_start") < col("p_end"))
      .withColumn("cls",
        when(col("p_start") === col("g_start") && col("p_end") === col("g_end") &&
          col("p_tag") === col("g_tag"), "correct")
          .when(col("p_start") === col("g_start") && col("p_end") === col("g_end"), "wrong_type")
          .otherwise("wrong_boundary"))
      .localCheckpoint()
    val matchedPred = overlap.select(col("conv_id"), col("turn_idx"),
      col("p_start").as("start"), col("p_end").as("end")).distinct()
    val matchedGold = overlap.select(col("conv_id"), col("turn_idx"),
      col("g_start").as("start"), col("g_end").as("end")).distinct()
    val spurious = p.join(matchedPred,
        p("conv_id") === matchedPred("conv_id") && p("turn_idx") === matchedPred("turn_idx") &&
          col("p_start") === matchedPred("start") && col("p_end") === matchedPred("end"),
        "left_anti")
      .select(lit("spurious").as("cls"))
    val miss = g.join(matchedGold,
        g("conv_id") === matchedGold("conv_id") && g("turn_idx") === matchedGold("turn_idx") &&
          col("g_start") === matchedGold("start") && col("g_end") === matchedGold("end"),
        "left_anti")
      .select(lit("miss").as("cls"))
    overlap.select(col("cls")).unionByName(spurious).unionByName(miss)
      .groupBy(col("cls")).agg(count(lit(1)).as("n"))
      .orderBy(col("cls"))
  }
}
