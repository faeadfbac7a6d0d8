package graft.semantics

/** Entity-linking semantics: blocking keys + the same-entity match
  * predicate (SURVEY.md §2 rows 44–48). Pure functions shared by the
  * oracle's union-find and the Spark salted-join + connected-components
  * pipeline, so both sides generate the identical candidate-edge set.
  *
  * Blocking bounds the O(n²) comparison space: two surfaces are compared
  * only if they share at least one block key. Keys are chosen so every
  * alias class the corpus contains (misspelling, acronym, initial,
  * prefix/suffix truncation, particle variant) collides with its
  * canonical on >= 1 key.
  */
object Linker {

  private val particleTokens: Set[String] = Set(
    "van", "von", "de", "der", "den", "del", "della", "di", "da", "dos",
    "of", "the", "and")

  def normalize(surface: String): String = StringOps.normalizeSurface(surface)

  def tokens(norm: String): Array[String] =
    if (norm.isEmpty) Array.empty else norm.split(' ')

  def acronymOf(norm: String): String = {
    val ts = tokens(norm).filterNot(particleTokens.contains)
    if (ts.length < 2) "" else ts.map(_.charAt(0)).mkString
  }

  /** All block keys for one normalized surface. */
  def blockKeys(norm: String): Seq[String] = {
    val ts = tokens(norm)
    if (ts.isEmpty) return Seq.empty
    val keys = Seq.newBuilder[String]
    keys += "s:" + PorterStemmer.stem(ts.head)
    if (ts.length > 1) keys += "s:" + PorterStemmer.stem(ts.last)
    keys += "p:" + norm.take(2)
    val ac = acronymOf(norm)
    if (ac.nonEmpty) keys += "a:" + ac
    if (ts.length == 1 && ts.head.length <= 5) keys += "a:" + ts.head // acronym form itself
    keys.result().distinct
  }

  private def stripParticles(ts: Array[String]): Array[String] =
    ts.filterNot(particleTokens.contains)

  /** Same-entity decision for two normalized surfaces of the same type.
    * Conservative per-rule, with transitive closure (connected components)
    * doing the rest.
    */
  def isMatch(a: String, b: String): Boolean = {
    if (a == b) return true
    if (a.isEmpty || b.isEmpty) return false
    val ta = tokens(a); val tb = tokens(b)
    // 1. misspelling: same token count, exactly ONE token differs, and the
    //    differing pair shares its first char with edit distance <= 2.
    //    (A raw whole-string levenshtein <= 2 falsely merges "c haas" with
    //    "f haas" and "atlas core analytics" with "atlas forge analytics".)
    if (misspellMatch(ta, tb)) return true
    // 2. particle-stripped equality ("maarten van dijkstra" = "maarten dijkstra")
    if (stripParticles(ta).sameElements(stripParticles(tb))) return true
    // 3. initial form ("a smithson" ~ "alice smithson")
    if (initialMatch(ta, tb) || initialMatch(tb, ta)) return true
    // 4. token-prefix truncation ("green river" ⊂ "green river valley",
    //    "gamestation" ⊂ "gamestation 5") — at most one token dropped
    if (prefixMatch(ta, tb) || prefixMatch(tb, ta)) return true
    // 5. acronym ("qdl" ~ "quantum data labs")
    if (ta.length == 1 && ta.head.length >= 2 && ta.head == acronymOf(b)) return true
    if (tb.length == 1 && tb.head.length >= 2 && tb.head == acronymOf(a)) return true
    false
  }

  private def misspellMatch(ta: Array[String], tb: Array[String]): Boolean = {
    if (ta.length != tb.length) return false
    var diffIdx = -1
    var i = 0
    while (i < ta.length) {
      if (ta(i) != tb(i)) {
        if (diffIdx >= 0) return false // more than one differing token
        diffIdx = i
      }
      i += 1
    }
    if (diffIdx < 0) return true // identical (caller already handled, defensive)
    val x = ta(diffIdx); val y = tb(diffIdx)
    x.nonEmpty && y.nonEmpty && x.charAt(0) == y.charAt(0) &&
      math.max(x.length, y.length) >= 4 &&
      Similarity.levenshtein(x, y) <= 2
  }

  private def initialMatch(short: Array[String], long: Array[String]): Boolean =
    short.length >= 2 && short.length == long.length &&
      short.head.length == 1 && long.head.nonEmpty &&
      short.head.charAt(0) == long.head.charAt(0) &&
      short.tail.sameElements(long.tail)

  private def prefixMatch(short: Array[String], long: Array[String]): Boolean =
    short.nonEmpty && long.length == short.length + 1 &&
      long.startsWith(short)
}
