package graft.sources

import graft.corpus.TranscriptGen
import graft.semantics.CorpusFormats
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Spark-path corpus readers (SURVEY.md §2 rows 2–4): the distributed
  * readers must reproduce the pure CorpusFormats parses.
  */
class SourcesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("sources")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val tmp = java.nio.file.Files.createTempDirectory("sources").toString

  test("csv dataset reader") {
    val p = s"$tmp/cls.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      "spark shuffle join;eng\ncrema espresso roast;coffee\n")
    val ds = CorpusSources.readCsvDataset(spark, p).collect()
    assert(ds.map(r => (r.text, r.category)).toSet ==
      Set(("spark shuffle join", "eng"), ("crema espresso roast", "coffee")))
  }

  test("column corpus reader reproduces the pure parse") {
    val docs = TranscriptGen.corpus(3).filter(_.gold.nonEmpty).take(8)
      .map(lt => (lt.turn.text, lt.gold))
    val p = s"$tmp/corpus.col"
    CorpusSources.writeColumnCorpus(docs, p)
    val viaSpark = CorpusSources.readColumnCorpus(spark, p).collect()
      .sortBy(_.doc_idx)
      .map(d => (d.text, d.mentions.map(m => (m.value, m.tag))))
    val viaPure = CorpusFormats.parseColumnCorpus(
        java.nio.file.Files.readString(java.nio.file.Paths.get(p)))
      .map { case (t, ms) => (t, ms.map(m => (m.value, m.tag)).toSeq) }
    assert(viaSpark.toSeq == viaPure)
    assert(viaSpark.length == docs.length)
  }

  test("inline xml reader") {
    val p = s"$tmp/tagged.xml.txt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      "<PER>Alice Smithson</PER> works at <ORG>Quantum Data Labs</ORG>.\n" +
        "<LOC>Silver Lake</LOC> is quiet.\n")
    val rows = CorpusSources.readInlineXml(spark, p).collect()
    assert(rows.length == 2)
    val tags = rows.flatMap(_.mentions.map(m => (m.value, m.tag))).toSet
    assert(tags == Set(("Alice Smithson", "PER"), ("Quantum Data Labs", "ORG"), ("Silver Lake", "LOC")))
  }
}
