package graft.semantics

import scala.collection.mutable.ArrayBuffer

/** Char/word n-gram feature extraction per FeatureSetting (reconstructed:
  * ws.palladian.classification.text.{FeatureSetting, Preprocessor} —
  * SURVEY.md §2 row 17).
  */
final case class FeatureSetting(
    charGrams: Boolean = true,
    minN: Int = 3,
    maxN: Int = 6,
    maxTerms: Int = 1000,
    lowercase: Boolean = true)

object FeatureSetting {
  val charDefault: FeatureSetting = FeatureSetting(charGrams = true, 3, 6, 1000)
  val wordDefault: FeatureSetting = FeatureSetting(charGrams = false, 1, 2, 1000)
}

object NGrams {

  def charNGrams(text: String, minN: Int, maxN: Int): Array[String] = {
    if (text == null) return Array.empty
    val out = new ArrayBuffer[String](math.max(16, text.length))
    var n = minN
    while (n <= maxN) {
      var i = 0
      while (i + n <= text.length) {
        out += text.substring(i, i + n)
        i += 1
      }
      n += 1
    }
    out.toArray
  }

  def wordNGrams(tokens: Array[String], minN: Int, maxN: Int): Array[String] = {
    val out = new ArrayBuffer[String](tokens.length * 2)
    var n = minN
    while (n <= maxN) {
      var i = 0
      while (i + n <= tokens.length) {
        if (n == 1) out += tokens(i)
        else {
          val sb = new java.lang.StringBuilder
          var k = 0
          while (k < n) {
            if (k > 0) sb.append(' ')
            sb.append(tokens(i + k))
            k += 1
          }
          out += sb.toString
        }
        i += 1
      }
      n += 1
    }
    out.toArray
  }

  /** Full preprocessing: text → capped term stream (order-preserving, first
    * maxTerms), per the FeatureSetting.
    */
  def terms(text: String, fs: FeatureSetting): Array[String] = {
    if (text == null) return Array.empty
    val t = if (fs.lowercase) text.toLowerCase else text
    val all =
      if (fs.charGrams) charNGrams(t, fs.minN, fs.maxN)
      else wordNGrams(Tokenizer.words(t), fs.minN, fs.maxN)
    if (all.length > fs.maxTerms) all.take(fs.maxTerms) else all
  }

  /** Word shingles for near-duplicate detection (k consecutive words). */
  def shingles(text: String, k: Int): Array[String] =
    wordNGrams(Tokenizer.words(if (text == null) "" else text.toLowerCase), k, k)
}
