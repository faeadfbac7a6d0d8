package graft.sources

import graft.pipeline.MentionRow
import graft.semantics.CorpusFormats
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Corpus readers (SURVEY.md §2 rows 2–4).
  *
  * - CSV classifier datasets (`text;category` per line) via the native
  *   Spark CSV source (header/sep options; scan gets pushdown for free).
  * - Column-format NER corpora (`token<TAB>tag`, blank line between
  *   docs): read with wholeText per file, split + rebuilt through the
  *   pure CorpusFormats functions — document reassembly needs the
  *   blank-line structure, so a per-file map beats a fragile
  *   line-number window reconstruction.
  * - Inline-XML tagged text: one tagged document per line.
  */
object CorpusSources {

  final case class LabeledText(text: String, category: String)
  final case class TaggedDocRow(doc_idx: Int, text: String, mentions: Seq[MentionRow])

  /** CsvDatasetReader twin: `text<sep>category`, optional header. */
  def readCsvDataset(spark: SparkSession, path: String,
      sep: String = ";", header: Boolean = false): Dataset[LabeledText] = {
    import spark.implicits._
    spark.read
      .option("header", header.toString)
      .option("sep", sep)
      .option("quote", "\"")
      .schema("text STRING, category STRING")
      .csv(path)
      .as[LabeledText]
  }

  /** Column-format NER corpus → one row per document with mention spans. */
  def readColumnCorpus(spark: SparkSession, path: String): Dataset[TaggedDocRow] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .as[String]
      .flatMap { content =>
        CorpusFormats.parseColumnCorpus(content).zipWithIndex.map {
          case ((text, ms), i) => TaggedDocRow(i, text, ms.map(MentionRow.of).toSeq)
        }
      }
  }

  /** Inline-XML tagged text, one document per line. */
  def readInlineXml(spark: SparkSession, path: String): Dataset[TaggedDocRow] = {
    import spark.implicits._
    spark.read.text(path).as[String]
      .filter((s: String) => s.trim.nonEmpty)
      .map { line =>
        val (text, ms) = CorpusFormats.parseInlineXml(line)
        TaggedDocRow(0, text, ms.map(MentionRow.of).toSeq)
      }
  }

  /** Write a tagged corpus in column format (one file; golden fixtures). */
  def writeColumnCorpus(docs: Seq[(String, Array[graft.semantics.Mention])], path: String): Unit = {
    val content = docs.map { case (t, ms) => CorpusFormats.toColumn(t, ms) }.mkString("\n\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), content)
  }
}
