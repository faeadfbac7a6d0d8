package graft.semantics

import scala.collection.mutable

/** Dictionary-based NER: training builds entity/token/context/case
  * dictionaries from a tagged corpus; tagging classifies StringTagger
  * candidates with them and applies post-rules (reconstructed:
  * ws.palladian.extraction.entity.tagger.PalladianNer — SURVEY.md §2
  * rows 31–32). Everything here is pure Scala; the Spark path builds the
  * same four dictionaries with groupBy().count() aggregations, collects,
  * and broadcasts one NerModel per job.
  */
final case class NerModel(
    entityDict: Map[String, Map[String, Int]],  // normalized full surface -> type counts
    tokenDict: Map[String, Map[String, Int]],   // lowercased mention token -> type counts
    contextDict: Map[String, Map[String, Int]], // lowercased context token -> type counts
    caseDict: Map[String, Map[String, Int]],    // lowercased token -> case-signature counts (mid-sentence only)
    removeWords: Set[String]) extends Serializable {

  /** True if this token is dominantly lowercase mid-sentence in training —
    * used to reject sentence-initial false candidates ("The", "However").
    */
  def isCommonWord(token: String): Boolean =
    caseDict.get(token.toLowerCase).exists { sigs =>
      val total = sigs.valuesIterator.sum
      val lower = sigs.filter(_._1.startsWith("a")).valuesIterator.sum
      total >= 2 && lower.toDouble / total > 0.5
    }
}

object NerModel {

  val CONTEXT_WINDOW = 3

  final case class TaggedDoc(text: String, mentions: Array[Mention])

  // dictionary discriminators in the flattened training-event stream
  val D_ENTITY = "entity"; val D_TOKEN = "token"; val D_CONTEXT = "context"; val D_CASE = "case"

  /** Flatten one tagged document into training events
    * (dict, key, value). Both training paths — the oracle's in-memory
    * fold and the Spark groupBy(dict, key, value).count() aggregation —
    * consume exactly this stream, so the resulting models are identical
    * by construction (SURVEY.md §5.2).
    */
  def events(doc: TaggedDoc): Seq[(String, String, String)] = {
    val out = mutable.ArrayBuffer.empty[(String, String, String)]
    val toks = Tokenizer.tokenize(doc.text)
    val sentStarts = SentenceSplitter.split(doc.text).map(_.start).toSet
    // case dictionary from mid-sentence tokens only
    for (t <- toks if !sentStarts.contains(t.start) && t.value.exists(Character.isLetter))
      out += ((D_CASE, t.value.toLowerCase, StringOps.caseSignature(t.value)))
    for (m <- doc.mentions) {
      out += ((D_ENTITY, StringOps.normalizeSurface(m.value), m.tag))
      for (w <- Tokenizer.words(m.value) if w.exists(Character.isLetter))
        out += ((D_TOKEN, w.toLowerCase, m.tag))
      val (l, r) = StringTagger.contexts(doc.text, toks, m, CONTEXT_WINDOW)
      for (c <- l ++ r if c.exists(Character.isLetter))
        out += ((D_CONTEXT, c.toLowerCase, m.tag))
    }
    out.toSeq
  }

  /** Assemble a model from aggregated event counts
    * ((dict, key, value) -> count) — shared by oracle and Spark.
    */
  def assemble(counts: Iterable[((String, String, String), Long)]): NerModel = {
    val dicts = Map(
      D_ENTITY -> mutable.Map.empty[String, Map[String, Int]],
      D_TOKEN -> mutable.Map.empty[String, Map[String, Int]],
      D_CONTEXT -> mutable.Map.empty[String, Map[String, Int]],
      D_CASE -> mutable.Map.empty[String, Map[String, Int]])
    for (((d, k, v), n) <- counts; dict <- dicts.get(d))
      dict(k) = dict.getOrElse(k, Map.empty) + (v -> n.toInt)
    val token = dicts(D_TOKEN).toMap
    val cases = dicts(D_CASE).toMap
    val remove = cases.collect {
      case (w, sigs) if !token.contains(w) &&
        sigs.valuesIterator.sum >= 3 &&
        sigs.filter(_._1.startsWith("a")).valuesIterator.sum.toDouble / sigs.valuesIterator.sum > 0.8 => w
    }.toSet
    NerModel(dicts(D_ENTITY).toMap, token, dicts(D_CONTEXT).toMap, cases, remove)
  }

  /** Single-threaded training (oracle path). */
  def train(docs: Seq[TaggedDoc]): NerModel = {
    val counts = mutable.Map.empty[(String, String, String), Long]
    for (doc <- docs; e <- events(doc))
      counts(e) = counts.getOrElse(e, 0L) + 1
    assemble(counts)
  }

  private def votes(dict: Map[String, Map[String, Int]], key: String): Map[String, Double] =
    dict.get(key) match {
      case Some(cats) =>
        val total = cats.valuesIterator.sum.toDouble
        cats.map { case (c, n) => c -> n / total }
      case None => Map.empty
    }

  private def addWeighted(acc: mutable.Map[String, Double], m: Map[String, Double], w: Double): Unit =
    for ((k, v) <- m) acc(k) = acc.getOrElse(k, 0.0) + v * w

  val W_ENTITY = 1.0
  val W_TOKEN = 0.6
  val W_CONTEXT = 0.4

  /** Classify + post-rules for one document's candidates (SURVEY.md §2
    * row 32). Returns typed mentions; candidates with zero evidence or
    * hit by a post-rule are dropped.
    */
  def tag(text: String, model: NerModel): Array[Mention] = {
    val toks = Tokenizer.tokenize(text)
    val sentStarts = SentenceSplitter.split(text).map(_.start).toSet
    val candidates = StringTagger.tagTokens(text, toks)
    val out = mutable.ArrayBuffer.empty[Mention]
    for (cand <- candidates) {
      var m = cand
      // post-rule: iteratively strip leading capitalized common words
      // ("Did Alice Smith" -> "Alice Smith"; sentence-initial trap) unless
      // the full surface is itself a known entity.
      var stripping = true
      while (stripping) {
        val mToks = Tokenizer.tokenize(m.value)
        if (mToks.length > 1 && model.isCommonWord(mToks(0).value) &&
            !model.entityDict.contains(StringOps.normalizeSurface(m.value))) {
          val off = mToks(1).start
          m = Mention(m.start + off, m.end, m.value.substring(off), m.tag, m.conf)
        } else stripping = false
      }
      val surface = StringOps.normalizeSurface(m.value)
      val words = Tokenizer.words(m.value)
      val singleTok = !surface.contains(' ')
      val sentenceInitial = sentStarts.contains(m.start)
      val dropCommon = singleTok && sentenceInitial && model.isCommonWord(m.value) &&
        !model.entityDict.contains(surface)
      val dropRemove = singleTok && model.removeWords.contains(surface) &&
        !model.entityDict.contains(surface)
      val dropDate = StringOps.containsDateFragment(m.value)
      if (!dropCommon && !dropRemove && !dropDate) {
        val acc = mutable.Map.empty[String, Double]
        addWeighted(acc, votes(model.entityDict, surface), W_ENTITY)
        for (w <- words if w.exists(Character.isLetter))
          addWeighted(acc, votes(model.tokenDict, w.toLowerCase), W_TOKEN / math.max(1, words.length))
        // acronym-shape heuristic: an unseen ALL-CAPS 2–6 letter token is
        // an ORG candidate even without dictionary evidence (case-signature
        // rule NER — SURVEY.md §2 row 28 behavior class "ALL-CAPS")
        if (acc.isEmpty && singleTok) {
          val sig = StringOps.caseSignature(m.value)
          if ((sig == "A" || sig == "A0") && m.value.length >= 2 && m.value.length <= 6)
            acc("ORG") = 0.5
        }
        // lexical evidence gate: context votes alone must not create
        // mentions (precision guard, SURVEY.md §7.6 #2)
        val hasLexical = acc.nonEmpty
        if (hasLexical) {
          val (l, r) = StringTagger.contexts(text, toks, m, CONTEXT_WINDOW)
          val nCtx = math.max(1, l.length + r.length)
          for (c <- l ++ r if c.exists(Character.isLetter))
            addWeighted(acc, votes(model.contextDict, c.toLowerCase), W_CONTEXT / nCtx)
          val (tagName, score) = acc.maxBy { case (k, v) => (v, k) }
          val conf = score / acc.values.sum
          out += Mention(m.start, m.end, m.value, tagName, conf)
        }
      }
    }
    StringTagger.removeOverlaps(out.toArray)
  }
}
