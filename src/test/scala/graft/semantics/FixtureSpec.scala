package graft.semantics

import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source

/** Table-driven fixtures (FIXTURES.md §C): committed files load through
  * the pure semantics functions so the same cases can be replayed
  * against the reference's own resources if the reference tree ever
  * materializes (SURVEY.md §0).
  */
class FixtureSpec extends AnyFunSuite {

  private implicit val codec: scala.io.Codec = scala.io.Codec.UTF8

  private def fixture(name: String): Seq[Array[String]] = {
    val src = Source.fromResource(s"fixtures/$name")
    try src.getLines().filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map(_.split('\t')).toList
    finally src.close()
  }

  test("tokenizer fixture table") {
    for (cols <- fixture("tokenizer_cases.tsv")) {
      val got = Tokenizer.words(cols(0)).mkString("|")
      assert(got == cols(1), s"input: ${cols(0)}")
    }
  }

  test("date fixture table") {
    for (cols <- fixture("date_cases.tsv")) {
      val parsed = DateParser.parse(cols(0))
      if (cols(1) == "NONE") assert(parsed.isEmpty, s"should not parse: ${cols(0)}")
      else {
        assert(parsed.isDefined, s"should parse: ${cols(0)}")
        assert(parsed.get.iso.startsWith(cols(1)), s"${cols(0)} -> ${parsed.get.iso}")
        assert(parsed.get.exactness == cols(2))
      }
    }
  }

  test("string tagger fixture table") {
    for (cols <- fixture("tagger_cases.tsv")) {
      val expected = if (cols.length > 1) cols(1) else ""
      val got = StringTagger.tag(cols(0)).map(_.value).mkString("|")
      assert(got == expected, s"input: ${cols(0)}")
    }
  }

  test("classifier tiny csv trains to exact counts") {
    val docs = fixture("classifier_tiny.csv").flatMap { cols =>
      cols(0).split(';') match { case Array(t, c) => Some((t, c)); case _ => None }
    }
    val model = DictModel.train(docs, FeatureSetting(charGrams = false, 1, 1, 100))
    assert(model.dict("spark") == Map("eng" -> 2))
    assert(model.dict("espresso") == Map("coffee" -> 2))
    assert(Classify("espresso please", model, FeatureSetting(charGrams = false, 1, 1, 100), DefaultScorer)._1 == "coffee")
  }

  test("inline xml fixture round-trips through column format") {
    val src = Source.fromResource("fixtures/ner_sample.xml.txt")
    val lines = try src.getLines().filter(_.nonEmpty).toList finally src.close()
    for (line <- lines) {
      val (text, ms) = CorpusFormats.parseInlineXml(line)
      assert(ms.nonEmpty)
      // xml -> (text, mentions) -> column -> (text', mentions'):
      // surfaces + tags survive the (whitespace-lossy) column round-trip
      val (t2, m2) = CorpusFormats.parseColumnDoc(CorpusFormats.toColumn(text, ms))
      assert(m2.map(m => (m.value, m.tag)).toSeq == ms.map(m => (m.value, m.tag)).toSeq, line)
      // and the xml render inverts the parse exactly
      assert(CorpusFormats.toInlineXml(text, ms) == line)
    }
  }
}
