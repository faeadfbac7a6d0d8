package graft.semantics

import scala.collection.mutable.ArrayBuffer

/** Per-turn (subj, pred, obj) triple assembly from typed mentions
  * (SURVEY.md §3.3 step 4). Relation predicates come from a fixed
  * connector-phrase table matched against the text BETWEEN two mentions in
  * the same sentence; every typed mention additionally yields an
  * `instance_of` triple, and tool turns yield `used_tool` triples. All
  * rules are pure functions so the oracle and the Spark mapPartitions
  * stage emit byte-identical triples.
  */
object TripleAssembler {

  /** connector phrase (lowercased, tokenized, space-joined) -> predicate.
    * Longest-match wins; connectors longer than MAX_CONNECTOR_TOKENS never
    * match (bounds work per mention pair).
    */
  val relationPatterns: Map[String, String] = Map(
    "works at" -> "works_for", "works for" -> "works_for",
    "is employed by" -> "works_for", "joined" -> "works_for",
    "is the ceo of" -> "ceo_of", "is ceo of" -> "ceo_of", "leads" -> "leads",
    "founded" -> "founded", "co-founded" -> "founded",
    "visited" -> "visited", "visit" -> "visited", "traveled to" -> "traveled_to",
    "moved to" -> "moved_to", "met" -> "met", "met with" -> "met",
    "lives in" -> "lives_in", "is located in" -> "located_in",
    "located in" -> "located_in", "is based in" -> "located_in",
    "headquartered in" -> "located_in", "is in" -> "located_in",
    "was born in" -> "born_in", "born in" -> "born_in",
    "released" -> "released", "launched" -> "released",
    "announced" -> "announced", "acquired" -> "acquired",
    "bought" -> "acquired", "uses" -> "uses", "used" -> "uses",
    "recommended" -> "recommends", "recommends" -> "recommends",
    "partnered with" -> "partner_of", "is part of" -> "part_of",
    "compared" -> "compared", "reviewed" -> "reviewed")

  val MAX_CONNECTOR_TOKENS = 5

  /** Normalize the inter-mention text to a connector key. */
  private def connectorKey(text: String): Option[String] = {
    val toks = Tokenizer.words(text)
      .map(_.toLowerCase)
      .filter(t => t.exists(Character.isLetterOrDigit) || t == "-")
    if (toks.isEmpty || toks.length > MAX_CONNECTOR_TOKENS) None
    else Some(toks.mkString(" "))
  }

  /** Predicate for the text between two mentions, if any. Tries the full
    * connector first, then drops leading tokens (so "then visited" still
    * matches "visited") — first (longest-suffix) hit wins.
    */
  def matchPredicate(between: String): Option[String] =
    connectorKey(between).flatMap { key =>
      var toks = key.split(' ')
      while (toks.nonEmpty) {
        val k = toks.mkString(" ")
        relationPatterns.get(k) match {
          case Some(p) => return Some(p)
          case None => toks = toks.drop(1)
        }
      }
      None
    }

  /** Assemble triples for one turn. `mentions` must be typed and
    * overlap-free, sorted by start.
    */
  def assemble(
      convId: String,
      turnIdx: Int,
      role: String,
      text: String,
      tool: String,
      mentions: Array[Mention]): Array[Triple] = {
    val out = new ArrayBuffer[Triple](mentions.length + 2)
    // instance_of triples
    for (m <- mentions)
      out += Triple(convId, turnIdx, m.value, "instance_of", m.tag, m.tag, "TYPE")
    // relation triples: adjacent mention pairs within one sentence
    val sentences = SentenceSplitter.split(text)
    for (s <- sentences) {
      val inSent = mentions.filter(m => m.start >= s.start && m.end <= s.end)
      var i = 0
      while (i < inSent.length - 1) {
        val a = inSent(i); val b = inSent(i + 1)
        val between = text.substring(a.end, b.start)
        matchPredicate(between).foreach { pred =>
          out += Triple(convId, turnIdx, a.value, pred, b.value, a.tag, b.tag)
        }
        i += 1
      }
    }
    // tool triples
    if (tool != null && tool.nonEmpty) {
      out += Triple(convId, turnIdx, convId, "used_tool", tool, "CONV", "TOOL")
      for (m <- mentions.take(1))
        out += Triple(convId, turnIdx, m.value, "queried_via", tool, m.tag, "TOOL")
    }
    out.toArray
  }
}
