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

  private val priority: Map[String, Int] = Map("URL" -> 0, "DATE" -> 1, "SMILEY" -> 2)

  /** All regex-tagger mentions, overlap-resolved with explicit priority
    * URL > DATE > SMILEY: any lower-priority span overlapping (even
    * partially) a kept higher-priority span is dropped, so the union is
    * overlap-free by construction — the invariant TripleAssembler
    * requires. (StringTagger.removeOverlaps only drops fully-nested
    * spans; a partial URL/DATE overlap would have survived it.)
    */
  def tagAll(text: String): Array[Mention] = {
    val all = tagUrls(text) ++ tagDates(text) ++ tagSmileys(text)
    if (all.length <= 1) return all
    val byPriority = all.sortBy(m => (priority.getOrElse(m.tag, 9), m.start, -m.end))
    val kept = new ArrayBuffer[Mention](all.length)
    for (m <- byPriority)
      if (!kept.exists(k => m.start < k.end && k.start < m.end)) kept += m
    kept.sortBy(m => (m.start, -m.end)).toArray
  }
}
