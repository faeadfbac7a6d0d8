package graft.pipeline

import graft.corpus.{TranscriptGen, Turn}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Distributed transcript-corpus materialization (SURVEY.md §2 row 1).
  *
  * Generation is `spark.range(nConvs).flatMap(turnsForConv)` — a pure
  * function of the conversation index, so it parallelizes across
  * executors with zero shuffle and regenerates identically at any
  * parallelism (the splitmix64 PRNG is keyed by (seed, conv, turn), never
  * by partition or clock). At deploy scale the same corpus would instead
  * be an Iceberg `transcripts` table; `fromParquet` is the scan path.
  */
object Transcripts {

  /** Corpus size matched to the driver's sf steps: sf0.001 ≈ 6k turns
    * (like lineitem), sf0.01 ≈ 60k, sf0.1 ≈ 600k (TESTDATA.md).
    * Mean turns/conv ≈ 8 → convs = sf * 750k.
    */
  def convsForSfDir(sfDir: String): Long = {
    val sf = raw"sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.001)
    math.max(60L, (sf * 750000L).toLong)
  }

  def generate(spark: SparkSession, nConvs: Long): Dataset[Turn] = {
    import spark.implicits._
    spark.range(nConvs)
      .repartition(spark.sparkContext.defaultParallelism)
      .flatMap(convIdx => TranscriptGen.turnsForConv(convIdx).map(_.turn))
  }

  /** Turns with gold mention labels — NER training input. */
  def generateLabeled(spark: SparkSession, nConvs: Long): Dataset[LabeledRow] = {
    import spark.implicits._
    spark.range(nConvs)
      .repartition(spark.sparkContext.defaultParallelism)
      .flatMap { convIdx =>
        TranscriptGen.turnsForConv(convIdx).map { lt =>
          LabeledRow(lt.turn.conv_id, lt.turn.turn_idx, lt.turn.role,
            lt.turn.text, lt.turn.tool, lt.turn.ts, lt.gold.map(MentionRow.of).toSeq)
        }
      }
  }

  /** Train-split labeled turns (every 5th conversation held out —
    * mirror of TranscriptGen.isEval).
    */
  def trainSplit(labeled: Dataset[LabeledRow]): Dataset[LabeledRow] =
    labeled.filter(r => !TranscriptGen.isEval(r.conv_id.drop(1).toLong))

  def write(ds: Dataset[Turn], path: String): Unit =
    ds.write.mode("overwrite").parquet(path)

  def fromParquet(spark: SparkSession, path: String): Dataset[Turn] = {
    import spark.implicits._
    spark.read.parquet(path).as[Turn]
  }
}
