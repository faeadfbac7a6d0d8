package graft.semantics

import scala.collection.mutable.ArrayBuffer

/** Sentence boundary detection with abbreviation and URL masking.
  *
  * Modeled on the reference's sentence detector (reconstructed:
  * ws.palladian.extraction.sentence.* — SURVEY.md §2 row 16). A boundary is
  * a run of `.`, `!`, `?` followed by whitespace and an uppercase letter,
  * digit or opening quote — unless the preceding token is a known
  * abbreviation, a single initial ("J."), or part of a URL/number.
  */
object SentenceSplitter {

  private val abbreviations: Set[String] = Set(
    "dr", "mr", "mrs", "ms", "prof", "sr", "jr", "st", "no", "vs", "etc",
    "inc", "ltd", "co", "corp", "dept", "est", "fig", "gen", "gov", "hon",
    "jan", "feb", "mar", "apr", "jun", "jul", "aug", "sep", "sept", "oct",
    "nov", "dec", "mt", "rd", "ave", "blvd", "approx", "appt", "min", "max"
  )

  def split(text: String): Array[Sentence] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = new ArrayBuffer[Sentence](4)
    val n = text.length
    var sentStart = 0
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == '.' || c == '!' || c == '?') {
        // swallow a run of terminators ("!!", "?!", "...")
        var j = i
        while (j + 1 < n && (text.charAt(j + 1) == '.' || text.charAt(j + 1) == '!' || text.charAt(j + 1) == '?'))
          j += 1
        if (isBoundary(text, i, j)) {
          val end = j + 1
          val s = text.substring(sentStart, end)
          if (s.trim.nonEmpty) out += Sentence(sentStart, end, s)
          // advance past whitespace to next sentence start
          var k = end
          while (k < n && Character.isWhitespace(text.charAt(k))) k += 1
          sentStart = k
          i = k
        } else i = j + 1
      } else i += 1
    }
    if (sentStart < n) {
      val s = text.substring(sentStart, n)
      if (s.trim.nonEmpty) out += Sentence(sentStart, n, s)
    }
    out.toArray
  }

  /** True if the terminator run [i..j] closes a sentence. */
  private def isBoundary(text: String, i: Int, j: Int): Boolean = {
    val n = text.length
    if (j == n - 1) return true // end of text
    // must be followed by whitespace, then an uppercase/digit/quote
    if (!Character.isWhitespace(text.charAt(j + 1))) return false
    var k = j + 1
    while (k < n && Character.isWhitespace(text.charAt(k))) k += 1
    if (k < n) {
      val nc = text.charAt(k)
      if (!(Character.isUpperCase(nc) || Character.isDigit(nc) || nc == '"' || nc == '“' || nc == '\'')) return false
    }
    if (text.charAt(i) != '.') return true // '!'/'?' always end given follow-set
    // reject if preceding word is an abbreviation or single initial
    var w = i - 1
    while (w >= 0 && (Character.isLetter(text.charAt(w)) || Character.isDigit(text.charAt(w)))) w -= 1
    val word = text.substring(w + 1, i)
    if (word.length == 1 && word.forall(Character.isUpperCase)) return false // "J. Smith"
    if (abbreviations.contains(word.toLowerCase)) return false
    // reject "e.g." style: char before word is '.'
    if (w >= 0 && text.charAt(w) == '.') return false
    // reject decimal numbers "3. 14"? (digit before '.' and digit after skip) — keep simple:
    true
  }
}
