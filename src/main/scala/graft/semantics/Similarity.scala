package graft.semantics

/** String/set similarity measures (reconstructed reference surface:
  * ws.palladian.helper.nlp.*Similarity, ws.palladian.helper.math
  * .SetSimilarities — SURVEY.md §2 rows 21–22). Pure functions; the
  * Spark side prefers built-in `levenshtein`/`array_intersect` where
  * exactly equivalent and falls back to these in mapPartitions stages.
  */
object Similarity {

  def levenshtein(a: String, b: String): Int = {
    if (a == null || a.isEmpty) return if (b == null) 0 else b.length
    if (b == null || b.isEmpty) return a.length
    val n = b.length
    var prev = Array.tabulate(n + 1)(identity)
    var curr = new Array[Int](n + 1)
    var i = 1
    while (i <= a.length) {
      curr(0) = i
      var j = 1
      while (j <= n) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        curr(j) = math.min(math.min(curr(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(n)
  }

  def jaroWinkler(a: String, b: String): Double = {
    // null/empty short-circuit BEFORE the prefix loop: jaro() returns 1.0
    // for both-null/both-empty, and the prefix computation would NPE on
    // null inputs (reachable from SQL via pal_jaro_winkler on null rows)
    if (a == null || b == null || a.isEmpty || b.isEmpty) return jaro(a, b)
    val j = jaro(a, b)
    if (j <= 0.7) return j
    var prefix = 0
    val maxPrefix = math.min(4, math.min(a.length, b.length))
    while (prefix < maxPrefix && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    j + prefix * 0.1 * (1 - j)
  }

  private def jaro(a: String, b: String): Double = {
    if (a == null || b == null || a.isEmpty || b.isEmpty)
      return if ((a == null || a.isEmpty) && (b == null || b.isEmpty)) 1.0 else 0.0
    if (a == b) return 1.0
    val window = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val aM = new Array[Boolean](a.length)
    val bM = new Array[Boolean](b.length)
    var matches = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < a.length) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / a.length + m / b.length + (m - transpositions / 2.0) / m) / 3.0
  }

  def jaccard[T](a: Set[T], b: Set[T]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val inter = a.intersect(b).size
    inter.toDouble / (a.size + b.size - inter)
  }

  def dice[T](a: Set[T], b: Set[T]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    2.0 * a.intersect(b).size / (a.size + b.size)
  }

  def overlap[T](a: Set[T], b: Set[T]): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    a.intersect(b).size.toDouble / math.min(a.size, b.size)
  }

  /** Character trigram Jaccard on normalized surfaces. */
  def ngramSim(a: String, b: String, n: Int = 3): Double =
    jaccard(NGrams.charNGrams(a, n, n).toSet, NGrams.charNGrams(b, n, n).toSet)
}
