package graft.semantics

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** Fixed-tag regex mention detectors (reconstructed:
  * ws.palladian.extraction.entity.{UrlTagger, DateAndTimeTagger,
  * SmileyTagger} — SURVEY.md §2 row 24). Each emits mentions with a fixed
  * tag; unioned with StringTagger candidates by the pipeline (row 54).
  */
object RegexTaggers {

  private val urlPattern: Pattern = Pattern.compile(
    "(?:https?://|www\\.)[\\p{L}\\p{Nd}._~:/?#\\[\\]@!$&'()*+,;=%-]+")

  private val smileyPattern: Pattern = Pattern.compile(
    "(?<=^|\\s)(?::-?[)(DPp|]|;-?\\)|<3|:'\\()(?=\\s|$)")

  private def tagAll(text: String, p: Pattern, tag: String): Array[Mention] = {
    if (text == null || text.isEmpty) return Array.empty
    val m = p.matcher(text)
    val out = new ArrayBuffer[Mention](2)
    while (m.find()) out += Mention(m.start, m.end, m.group, tag, 1.0)
    out.toArray
  }

  def tagUrls(text: String): Array[Mention] = tagAll(text, urlPattern, "URL")

  def tagSmileys(text: String): Array[Mention] = tagAll(text, smileyPattern, "SMILEY")

  def tagDates(text: String): Array[Mention] =
    DateParser.findDates(text).map { case (s, e, _) =>
      Mention(s, e, text.substring(s, e), "DATE", 1.0)
    }

  /** All regex-tagger mentions, overlap-resolved with priority URL > DATE > SMILEY. */
  def tagAll(text: String): Array[Mention] =
    StringTagger.removeOverlaps(tagUrls(text) ++ tagDates(text) ++ tagSmileys(text))
}
