package graft.tools

import graft.corpus.TranscriptGen
import graft.oracle.Oracle

import java.nio.file.{Files, Paths}

/** Regenerates the committed golden files (FIXTURES.md §B): oracle
  * outputs over the first GOLDEN_CONVS conversations, pinned as CSV so
  * any semantics change shows up as a reviewable diff. Run explicitly:
  * `sbt "runMain graft.tools.GoldenGen"` — never from tests.
  */
object GoldenGen {

  val GOLDEN_CONVS = 12
  val DIR = "src/test/resources/golden"

  def main(args: Array[String]): Unit = {
    val corpus = TranscriptGen.corpus(GOLDEN_CONVS)
    val train = corpus.filterNot(lt => TranscriptGen.isEval(lt.turn.conv_id.drop(1).toLong))
    val model = Oracle.trainNer(train)
    val tagged = Oracle.tag(corpus, model)

    Files.createDirectories(Paths.get(DIR))
    val mentions = tagged.flatMap { case (lt, ms) =>
      ms.map(m => s"${lt.turn.conv_id},${lt.turn.turn_idx},${m.start},${m.end},${m.tag},${quote(m.value)}")
    }
    write("gold_mentions.csv", "conv_id,turn_idx,start,end,tag,value" +: mentions)

    val triples = Oracle.triples(tagged).map(t =>
      s"${t.convId},${t.turnIdx},${quote(t.subj)},${t.pred},${quote(t.obj)}")
    write("gold_triples.csv", "conv_id,turn_idx,subj,pred,obj" +: triples)

    val comps = Oracle.components(tagged.flatMap(_._2).map(m => (m.value, m.tag)))
      .toSeq.map(_.toSeq.sorted.mkString("|")).sorted
    write("gold_components.csv", "surfaces" +: comps)
    println(s"[golden] wrote ${mentions.size} mentions, ${triples.size} triples, ${comps.size} components")
  }

  private def quote(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""

  private def write(name: String, lines: Seq[String]): Unit =
    Files.writeString(Paths.get(s"$DIR/$name"), lines.mkString("\n") + "\n")
}
