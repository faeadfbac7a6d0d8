package graft.semantics

import org.scalatest.funsuite.AnyFunSuite

/** ADVICE r1 regression pins: priority-based overlap resolution in the
  * regex-tagger union, and null-safety of jaroWinkler.
  */
class OverlapNullSpec extends AnyFunSuite {

  test("tagAll drops lower-priority partially-overlapping mentions") {
    // URL contains a date fragment: DATE span partially overlaps the URL
    // span and must lose (URL > DATE priority); result is overlap-free
    val text = "see https://a.example.org/2021-07-04/x and 2022-01-02 :)"
    val ms = RegexTaggers.tagAll(text)
    for (i <- ms.indices; j <- (i + 1) until ms.length)
      assert(ms(i).end <= ms(j).start || ms(j).end <= ms(i).start,
        s"overlapping mentions survived: ${ms.mkString(", ")}")
    assert(ms.exists(_.tag == "URL"))
    // the standalone date and smiley survive
    assert(ms.exists(m => m.tag == "DATE" && m.value == "2022-01-02"))
    assert(ms.exists(_.tag == "SMILEY"))
    // no DATE inside the URL span
    val url = ms.find(_.tag == "URL").get
    assert(!ms.exists(m => m.tag == "DATE" && m.start >= url.start && m.start < url.end))
  }

  test("jaroWinkler handles null/empty inputs") {
    assert(Similarity.jaroWinkler(null, null) == 1.0)
    assert(Similarity.jaroWinkler("", "") == 1.0)
    assert(Similarity.jaroWinkler(null, "abc") == 0.0)
    assert(Similarity.jaroWinkler("abc", null) == 0.0)
    assert(Similarity.jaroWinkler("", "abc") == 0.0)
    // unchanged on normal inputs (textbook value)
    assert(math.abs(Similarity.jaroWinkler("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
  }
}
