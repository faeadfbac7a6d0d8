package graft.pipeline

import graft.corpus.Turn
import graft.semantics.{Classify => CoreClassify, _}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The dictionary text classifier as Spark stages (SURVEY.md §3.1,
  * §2 rows 34–37): train = one hash-agg shuffle -> collect -> broadcast;
  * score = shuffle-free mapPartitions with the broadcast DictModel.
  * Demonstrated on transcripts predicting `role` from `text` (roles have
  * distinct template vocabularies, so accuracy is meaningfully high).
  */
object ClassifyStage {

  val fs: FeatureSetting = FeatureSetting(charGrams = false, minN = 1, maxN = 2, maxTerms = 1000)

  /** Training aggregation: docs.flatMap(ngrams) -> groupBy(term, cat)
    * .count() (+ per-category doc counts), assembled into a DictModel.
    *
    * Pruning happens DISTRIBUTEDLY, before the collect: r1 collected the
    * full bigram vocabulary to the driver and pruned there — at corpus
    * scale the driver collect is the bottleneck (and an OOM risk).
    * The distributed `HAVING sum(n) >= 2` produces the exact same model
    * as the old collect-then-pruned(2), so classifier accuracy is
    * unchanged (pinned by SparkParitySpec). categoryTermCounts is
    * computed BEFORE the prune (totals over all term occurrences), also
    * matching the old semantics.
    */
  def train(turns: Dataset[Turn]): DictModel = {
    val spark = turns.sparkSession
    import spark.implicits._
    val tc = turns
      .flatMap(t => NGrams.terms(t.text, fs).map(term => (term, t.role)))
      .toDF("term", "cat")
      .groupBy(col("term"), col("cat")).agg(count(lit(1)).as("n"))
      .cache()
    val catTerms = tc.groupBy(col("cat")).agg(sum(col("n")).as("tot"))
      .as[(String, Long)].collect().toMap
    val kept = tc
      .withColumn("tot", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("term"))))
      .where(col("tot") >= 2)
      .select(col("term"), col("cat"), col("n"))
      .as[(String, String, Long)].collect()
    tc.unpersist()
    // relational groupBy, not groupByKey(_.role): the typed path
    // deserializes every Turn into an object just to read one column —
    // the columnar agg reads `role` off the cached rows directly
    val docCounts = turns.toDF().groupBy(col("role")).agg(count(lit(1)))
      .as[(String, Long)].collect()
    val dict = kept.groupBy(_._1).map { case (term, xs) =>
      term -> xs.map { case (_, cat, n) => cat -> n.toInt }.toMap
    }
    DictModel(dict, docCounts.toMap, catTerms, docCounts.map(_._2).sum)
  }

  /** Shuffle-free scoring pass. */
  def score(turns: Dataset[Turn], model: DictModel, scorer: Scorer): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    turns.mapPartitions { it =>
      val m = bc.value
      it.map { t =>
        val (cat, conf) = CoreClassify(t.text, m, fs, scorer)
        (t.conv_id, t.turn_idx, t.role, cat, conf)
      }
    }.toDF("conv_id", "turn_idx", "actual", "predicted", "conf")
  }

  /** Confusion matrix + accuracy (SURVEY.md §2 row 37). */
  def confusion(scored: DataFrame): DataFrame =
    scored.groupBy(col("actual"))
      .pivot("predicted", Seq("user", "assistant", "tool"))
      .count()
      .na.fill(0L)
      .orderBy(col("actual"))

  def accuracy(scored: DataFrame): DataFrame =
    scored.agg(
      round(avg(when(col("actual") === col("predicted"), 1.0).otherwise(0.0)), 6).as("accuracy"),
      count(lit(1)).as("n"))
}
