package graft.oracle

import graft.corpus.TranscriptGen
import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source

/** Golden-file regression pin (SURVEY.md §5.2 item 2 / FIXTURES.md §B):
  * today's oracle output must equal the committed CSVs byte-for-byte.
  * A legitimate semantics change requires an explicit
  * `runMain graft.tools.GoldenGen` + reviewed diff.
  */
class GoldenSpec extends AnyFunSuite {

  private implicit val codec: scala.io.Codec = scala.io.Codec.UTF8

  private def golden(name: String): Seq[String] = {
    val src = Source.fromResource(s"golden/$name")
    try src.getLines().drop(1).toList finally src.close()
  }

  private lazy val corpus = TranscriptGen.corpus(graft.tools.GoldenGen.GOLDEN_CONVS)
  private lazy val train = corpus.filterNot(lt => TranscriptGen.isEval(lt.turn.conv_id.drop(1).toLong))
  private lazy val model = Oracle.trainNer(train)
  private lazy val tagged = Oracle.tag(corpus, model)

  private def quote(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""

  test("mentions match golden") {
    val now = tagged.flatMap { case (lt, ms) =>
      ms.map(m => s"${lt.turn.conv_id},${lt.turn.turn_idx},${m.start},${m.end},${m.tag},${quote(m.value)}")
    }
    assert(now == golden("gold_mentions.csv"))
  }

  test("triples match golden") {
    val now = Oracle.triples(tagged).map(t =>
      s"${t.convId},${t.turnIdx},${quote(t.subj)},${t.pred},${quote(t.obj)}")
    assert(now == golden("gold_triples.csv"))
  }

  test("components match golden") {
    val now = Oracle.components(tagged.flatMap(_._2).map(m => (m.value, m.tag)))
      .toSeq.map(_.toSeq.sorted.mkString("|")).sorted
    assert(now == golden("gold_components.csv"))
  }
}
