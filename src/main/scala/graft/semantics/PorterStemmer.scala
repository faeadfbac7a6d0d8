package graft.semantics

/** Porter stemming algorithm (Porter, 1980, "An algorithm for suffix
  * stripping" — public algorithm; the reference wraps Snowball,
  * SURVEY.md §2 row 19; hand-written here because no third-party libs
  * resolve in this sandbox). Standard 5-step implementation.
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word == null || word.length <= 2) return if (word == null) "" else word.toLowerCase
    var w = word.toLowerCase
    if (!w.forall(c => c >= 'a' && c <= 'z')) return w
    w = step1a(w); w = step1b(w); w = step1c(w)
    w = step2(w); w = step3(w); w = step4(w); w = step5(w)
    w
  }

  private def isCons(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => if (i == 0) true else !isCons(w, i - 1)
    case _ => true
  }

  /** Measure m: number of VC sequences in the stem. */
  private def measure(w: String): Int = {
    var m = 0; var i = 0; val n = w.length
    while (i < n && isCons(w, i)) i += 1
    while (i < n) {
      while (i < n && !isCons(w, i)) i += 1
      if (i < n) { m += 1; while (i < n && isCons(w, i)) i += 1 }
    }
    m
  }

  private def containsVowel(w: String): Boolean =
    w.indices.exists(i => !isCons(w, i))

  private def endsDoubleCons(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) && isCons(w, w.length - 1)

  /** *o: stem ends cvc where second c is not w, x, y. */
  private def cvc(w: String): Boolean = {
    val n = w.length
    if (n < 3) return false
    if (!isCons(w, n - 1) || isCons(w, n - 2) || !isCons(w, n - 3)) return false
    val c = w.charAt(n - 1)
    c != 'w' && c != 'x' && c != 'y'
  }

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s") && w.length > 1) w.dropRight(1)
    else w

  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w.dropRight(1) else w
    } else {
      val stem =
        if (w.endsWith("ed") && containsVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      stem match {
        case None => w
        case Some(s) =>
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
          else if (endsDoubleCons(s) && !"lsz".contains(s.last)) s.dropRight(1)
          else if (measure(s) == 1 && cvc(s)) s + "e"
          else s
      }
    }
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w.dropRight(1) + "i" else w

  private val step2Suffixes = List(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val step3Suffixes = List(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val step4Suffixes = List(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def replaceSuffix(w: String, rules: List[(String, String)], minM: Int): String = {
    rules.find { case (suf, _) => w.endsWith(suf) } match {
      case Some((suf, rep)) =>
        val stem = w.dropRight(suf.length)
        if (measure(stem) > minM - 1) stem + rep else w
      case None => w
    }
  }

  private def step2(w: String): String = replaceSuffix(w, step2Suffixes, 1)
  private def step3(w: String): String = replaceSuffix(w, step3Suffixes, 1)

  private def step4(w: String): String = {
    step4Suffixes.find(w.endsWith) match {
      case Some(suf) =>
        val stem = w.dropRight(suf.length)
        if (suf == "ion" || (suf == "ent" && w.endsWith("sion"))) w // handled below
        else if (measure(stem) > 1) stem
        else w
      case None =>
        if (w.endsWith("ion")) {
          val stem = w.dropRight(3)
          if (stem.nonEmpty && (stem.last == 's' || stem.last == 't') && measure(stem) > 1) stem else w
        } else w
    }
  }

  private def step5(w: String): String = {
    var r = w
    if (r.endsWith("e")) {
      val stem = r.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !cvc(stem))) r = stem
    }
    if (r.endsWith("ll") && measure(r) > 1) r = r.dropRight(1)
    r
  }
}
