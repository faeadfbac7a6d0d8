package graft.semantics

import scala.collection.mutable.ArrayBuffer

/** Rule-based candidate entity mention detection via capitalization
  * patterns (reconstructed: ws.palladian.extraction.entity.StringTagger —
  * SURVEY.md §2 rows 28–30). The reference drives this with one large
  * case-signature regex; we use an equivalent token-scan (same emitted
  * spans, pinned by fixtures in tagger_cases.tsv) because it is easier to
  * verify and to keep overlap-free by construction.
  *
  * A candidate is a maximal token run of:
  *  - capitalized words ("Paris", "Green"),
  *  - ALL-CAPS acronyms ("NASA", "IBM2"),
  *  - camelCase/product tokens ("iPhone", "PlayStation"),
  *  - short digit tokens if they FOLLOW a qualifying token ("PlayStation 3"),
  *  - lowercase particles (van/de/of/...) if they CONNECT qualifying tokens.
  *
  * Sentence-initial single common words are kept as candidates here — the
  * NER stage's case dictionary decides whether they are real entities
  * (SURVEY.md §2 row 32).
  */
object StringTagger {

  val TAG_CANDIDATE = "CANDIDATE"

  private val particles: Set[String] = Set(
    "van", "von", "de", "der", "den", "del", "della", "di", "da", "dos",
    "of", "the", "and", "&", "for", "am", "zu")

  private def isCapWord(t: String): Boolean =
    t.length >= 1 && Character.isUpperCase(t.charAt(0)) &&
      t.exists(Character.isLetter) &&
      t.forall(c => Character.isLetterOrDigit(c) || c == '\'' || c == '’' || c == '-' || c == '.')

  private def isCamel(t: String): Boolean = {
    // iPhone, eBay: starts lowercase, has an uppercase later
    t.length >= 2 && Character.isLowerCase(t.charAt(0)) &&
      t.exists(Character.isUpperCase) && t.forall(c => Character.isLetterOrDigit(c))
  }

  private def isShortNumber(t: String): Boolean =
    t.nonEmpty && t.length <= 4 && t.forall(Character.isDigit)

  private def qualifies(t: String): Boolean = isCapWord(t) || isCamel(t)

  /** Detect candidate mentions in `text`. Emitted spans cover the token run
    * from the first to the last qualifying token (single space-joined in
    * `value` exactly as the substring appears).
    */
  def tag(text: String): Array[Mention] = {
    val tokens = Tokenizer.tokenize(text)
    tagTokens(text, tokens)
  }

  def tagTokens(text: String, tokens: Array[Token]): Array[Mention] = {
    val out = new ArrayBuffer[Mention](4)
    var i = 0
    val n = tokens.length
    while (i < n) {
      if (qualifies(tokens(i).value)) {
        var last = i // index of last *qualifying* token in the run
        var j = i + 1
        var continue = true
        while (j < n && continue) {
          val t = tokens(j).value
          // tokens must be adjacent-ish (no intervening sentence punctuation)
          val gap = text.substring(tokens(j - 1).end, tokens(j).start)
          if (gap.exists(c => !Character.isWhitespace(c) && c != ' ')) continue = false
          else if (qualifies(t)) { last = j; j += 1 }
          else if (isShortNumber(t)) { last = j; j += 1 }
          else if (particles.contains(t) && j + 1 < n && qualifies(tokens(j + 1).value)) {
            // particle connects two qualifying tokens: absorb it, continue
            j += 1
          } else continue = false
        }
        // trim trailing bare numbers only if the run is a single number (defensive)
        if (!(last == i && isShortNumber(tokens(i).value))) {
          val start = tokens(i).start
          val end = tokens(last).end
          val value = text.substring(start, end)
          out += Mention(start, end, value, TAG_CANDIDATE, 1.0)
        }
        i = last + 1
      } else i += 1
    }
    removeOverlaps(out.toArray)
  }

  /** Sort by (start asc, end desc) and drop spans nested inside longer
    * spans (reconstructed: ws.palladian.extraction.entity.Annotations —
    * SURVEY.md §2 row 29). Maximal-run construction already avoids most
    * overlaps; this is the canonical invariant enforcement shared with any
    * other mention source (regex taggers, gazetteer matches).
    */
  def removeOverlaps(ms: Array[Mention]): Array[Mention] = {
    if (ms.length <= 1) return ms
    val sorted = ms.sortBy(m => (m.start, -m.end))
    val out = new ArrayBuffer[Mention](sorted.length)
    var maxEnd = -1
    for (m <- sorted) {
      if (m.end > maxEnd) { out += m; maxEnd = m.end }
      // else fully nested in a previous span → drop
    }
    out.toArray
  }

  /** k tokens of left/right context for each mention (SURVEY.md §2 row 30). */
  def contexts(text: String, tokens: Array[Token], m: Mention, k: Int): (Array[String], Array[String]) = {
    val leftIdx = tokens.indexWhere(_.end > m.start) // first token of mention
    val rightIdx = tokens.lastIndexWhere(_.start < m.end) // last token of mention
    val left =
      if (leftIdx <= 0) Array.empty[String]
      else tokens.slice(math.max(0, leftIdx - k), leftIdx).map(_.value)
    val right =
      if (rightIdx < 0 || rightIdx >= tokens.length - 1) Array.empty[String]
      else tokens.slice(rightIdx + 1, math.min(tokens.length, rightIdx + 1 + k)).map(_.value)
    (left, right)
  }
}
