package graft.semantics

import graft.corpus.TranscriptGen
import org.scalatest.funsuite.AnyFunSuite

class CorpusFormatsSpec extends AnyFunSuite {

  test("inline xml round-trips") {
    val tagged = "<PER>Jim Carrey</PER> starred in <MISC>The Truman Show</MISC>."
    val (text, ms) = CorpusFormats.parseInlineXml(tagged)
    assert(text == "Jim Carrey starred in The Truman Show.")
    assert(ms.map(m => (m.value, m.tag)).toSeq == Seq(("Jim Carrey", "PER"), ("The Truman Show", "MISC")))
    for (m <- ms) assert(text.substring(m.start, m.end) == m.value)
    assert(CorpusFormats.toInlineXml(text, ms) == tagged)
  }

  test("column format conversion assigns tags per token") {
    val text = "Alice Smithson works at Quantum Data Labs."
    val ms = Array(Mention(0, 14, "Alice Smithson", "PER", 1.0),
      Mention(24, 41, "Quantum Data Labs", "ORG", 1.0))
    val col = CorpusFormats.toColumn(text, ms)
    assert(col.split('\n').toSeq == Seq(
      "Alice\tPER", "Smithson\tPER", "works\tO", "at\tO",
      "Quantum\tORG", "Data\tORG", "Labs\tORG", ".\tO"))
  }

  test("column corpus parse recovers mention surfaces and tags") {
    val corpus = TranscriptGen.corpus(5)
    val docs = corpus.filter(_.gold.nonEmpty).take(20)
      .map(lt => (lt.turn.text, lt.gold))
    val content = docs.map { case (t, ms) => CorpusFormats.toColumn(t, ms) }.mkString("\n\n")
    val parsed = CorpusFormats.parseColumnCorpus(content)
    assert(parsed.size == docs.size)
    for (((_, gold), (ptext, pms)) <- docs.zip(parsed)) {
      // whitespace-lossy round-trip: surfaces + tags survive, exact
      // offsets are rebuilt against the reconstructed text
      assert(pms.map(m => (m.value, m.tag)).toSeq ==
        gold.map(m => (m.value, m.tag)).toSeq)
      for (m <- pms) assert(ptext.substring(m.start, m.end) == m.value)
    }
  }
}
