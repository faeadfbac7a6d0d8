package graft.semantics

import scala.collection.mutable.ArrayBuffer

/** Tagged-corpus format conversions (reconstructed:
  * ws.palladian.extraction.entity.FileFormatParser — SURVEY.md §2 rows
  * 3–4): column format (`token<TAB>tag` per line, blank line between
  * documents) ↔ inline-XML tagged text (`<PER>Jim Carrey</PER> said …`).
  * Pure string functions; the Spark readers in graft.sources wrap these.
  */
object CorpusFormats {

  val OUTSIDE = "O"

  /** Parse inline-XML tagged text into (cleanText, mentions). Tags are
    * simple uppercase element names; nesting is not supported (matches
    * the reference's flat annotation model).
    */
  def parseInlineXml(tagged: String): (String, Array[Mention]) = {
    if (tagged == null) return ("", Array.empty)
    val re = java.util.regex.Pattern.compile("<([A-Z][A-Z0-9_]*)>(.*?)</\\1>", java.util.regex.Pattern.DOTALL)
    val m = re.matcher(tagged)
    val sb = new java.lang.StringBuilder(tagged.length)
    val mentions = new ArrayBuffer[Mention](4)
    var last = 0
    while (m.find()) {
      sb.append(tagged, last, m.start)
      val start = sb.length
      sb.append(m.group(2))
      mentions += Mention(start, sb.length, m.group(2), m.group(1), 1.0)
      last = m.end
    }
    sb.append(tagged, last, tagged.length)
    (sb.toString, mentions.toArray)
  }

  /** Render (text, mentions) as inline-XML tagged text. Mentions must be
    * sorted and non-overlapping (Annotations invariant, row 29).
    */
  def toInlineXml(text: String, mentions: Array[Mention]): String = {
    val sb = new java.lang.StringBuilder(text.length + mentions.length * 12)
    var last = 0
    for (m <- mentions.sortBy(_.start)) {
      sb.append(text, last, m.start)
      sb.append('<').append(m.tag).append('>')
      sb.append(text, m.start, m.end)
      sb.append("</").append(m.tag).append('>')
      last = m.end
    }
    sb.append(text, last, text.length)
    sb.toString
  }

  /** Convert one document's (text, mentions) to column format:
    * `token<TAB>tag` lines, tag = mention tag for tokens inside a
    * mention span, "O" outside.
    */
  def toColumn(text: String, mentions: Array[Mention]): String = {
    val toks = Tokenizer.tokenize(text)
    val lines = toks.map { t =>
      val tag = mentions.find(m => t.start >= m.start && t.end <= m.end)
        .map(_.tag).getOrElse(OUTSIDE)
      s"${t.value}\t$tag"
    }
    lines.mkString("\n")
  }

  /** Parse a whole column-format corpus (blank-line separated docs) back
    * into documents: text is rebuilt with single spaces (the column
    * format does not preserve exact whitespace — same lossiness as the
    * reference); consecutive same-tag tokens merge into one mention.
    */
  def parseColumnCorpus(content: String): Seq[(String, Array[Mention])] = {
    if (content == null || content.trim.isEmpty) return Seq.empty
    content.split("\n\\s*\n").toSeq.filter(_.trim.nonEmpty).map(parseColumnDoc)
  }

  def parseColumnDoc(block: String): (String, Array[Mention]) = {
    val pairs = block.split('\n').toSeq.filter(_.nonEmpty).map { line =>
      val i = line.lastIndexOf('\t')
      if (i < 0) (line, OUTSIDE) else (line.substring(0, i), line.substring(i + 1))
    }
    val sb = new java.lang.StringBuilder
    val mentions = new ArrayBuffer[Mention](4)
    var curTag: String = OUTSIDE
    var curStart = -1
    var curEnd = -1
    def flush(): Unit = {
      if (curTag != OUTSIDE && curStart >= 0)
        mentions += Mention(curStart, curEnd, sb.substring(curStart, curEnd), curTag, 1.0)
      curTag = OUTSIDE; curStart = -1
    }
    for ((tok, tag) <- pairs) {
      if (sb.length > 0 && !isPunct(tok)) sb.append(' ')
      else if (sb.length > 0 && isPunct(tok) && tag != OUTSIDE && tag == curTag) sb.append(' ')
      val s = sb.length
      sb.append(tok)
      if (tag == curTag && tag != OUTSIDE) curEnd = sb.length
      else {
        flush()
        if (tag != OUTSIDE) { curTag = tag; curStart = s; curEnd = sb.length }
      }
    }
    flush()
    (sb.toString, mentions.toArray)
  }

  private def isPunct(tok: String): Boolean =
    tok.length == 1 && !Character.isLetterOrDigit(tok.charAt(0))
}
