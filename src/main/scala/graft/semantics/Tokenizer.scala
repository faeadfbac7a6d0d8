package graft.semantics

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** Span-preserving word tokenizer.
  *
  * Behavior modeled on the reference's regex tokenizer (reconstructed:
  * ws.palladian.extraction.token.Tokenizer — SURVEY.md §2 row 15; the
  * reference checkout was empty, so this is our canonical spec, pinned by
  * fixtures in src/test/resources/fixtures/tokenizer_cases.tsv):
  *
  *  - URLs and e-mail addresses are single tokens.
  *  - Common abbreviations ("e.g.", "Dr.", "etc.") keep their periods.
  *  - Words may contain internal apostrophes and hyphens ("don't",
  *    "state-of-the-art").
  *  - Numbers may contain decimal points/commas ("3.14", "1,000").
  *  - All other punctuation characters are single-character tokens.
  *
  * Parity-critical: the SAME compiled JDK pattern runs inside Spark
  * mapPartitions and in the oracle — never SQL `split` (dialect drift,
  * SURVEY.md §7.6).
  */
object Tokenizer {

  // Compiled once per JVM (executor), reused across rows.
  private val pattern: Pattern = Pattern.compile(
    // URL | email | abbreviation | number | word | single non-space char
    "(?:https?://|www\\.)[\\p{L}\\p{Nd}._~:/?#\\[\\]@!$&'()*+,;=%-]+" +
      "|[\\p{L}\\p{Nd}._%+-]+@[\\p{L}\\p{Nd}.-]+\\.\\p{L}{2,}" +
      "|(?:\\p{L}\\.){2,}" + // e.g., i.e., U.S.
      "|\\p{Lu}\\.(?=\\s)" + // single initial: "C. Haas"
      "|\\p{L}{1,4}\\.(?=\\s\\p{Ll})" + // Dr. / etc. followed by lowercase
      "|\\p{Nd}+(?:[.,]\\p{Nd}+)*" +
      "|\\p{L}[\\p{L}\\p{Nd}]*(?:['’-][\\p{L}\\p{Nd}]+)*" +
      "|[^\\s]"
  )

  def tokenize(text: String): Array[Token] = {
    if (text == null || text.isEmpty) return Array.empty
    val m = pattern.matcher(text)
    val out = new ArrayBuffer[Token](16)
    while (m.find()) out += Token(m.start, m.end, m.group)
    out.toArray
  }

  /** Token values only (classifier preprocessing path). */
  def words(text: String): Array[String] = tokenize(text).map(_.value)
}
