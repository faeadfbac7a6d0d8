package graft.tools

import graft.corpus.TranscriptGen
import graft.oracle.Oracle
import graft.semantics._

/** Scratch diagnostics for the M0 gates — not part of the driver contract. */
object DevCheck {
  def main(args: Array[String]): Unit = {
    if (args.contains("probe")) { probe(); return }
    val corpus = TranscriptGen.corpus(60)
    val train = corpus.filterNot(lt => TranscriptGen.isEval(lt.turn.conv_id.drop(1).toLong))
    val eval = corpus.filter(lt => TranscriptGen.isEval(lt.turn.conv_id.drop(1).toLong))
    val model = Oracle.trainNer(train)

    val tagged = Oracle.tag(eval, model)
    var shownFn = 0; var shownFp = 0
    for ((lt, ms) <- tagged) {
      val predSet = ms.map(m => (m.start, m.end, m.tag)).toSet
      val goldSet = lt.gold.map(m => (m.start, m.end, m.tag)).toSet
      for (g <- lt.gold if !predSet.contains((g.start, g.end, g.tag)) && shownFn < 20) {
        shownFn += 1
        println(s"FN [${g.tag}] '${g.value}' in: ${lt.turn.text}")
        println(s"   predicted: ${ms.map(m => s"'${m.value}'/${m.tag}").mkString(", ")}")
      }
      for (p <- ms if !goldSet.contains((p.start, p.end, p.tag)) && shownFp < 20) {
        shownFp += 1
        println(s"FP [${p.tag}] '${p.value}' in: ${lt.turn.text}")
      }
    }

    println("---- bad merges ----")
    val comps = Oracle.components(corpus.flatMap(_.gold.map(m => (m.value, m.tag))))
    val surfToEntity = TranscriptGen.entities.flatMap(e => e.surfaces.map(s => Linker.normalize(s) -> e.id)).toMap
    for (p <- comps) {
      val ids = p.flatMap(surfToEntity.get)
      if (ids.size > 1) println(s"MERGE ids=$ids surfaces=$p")
    }
  }

  /** Edge-case probes: empty corpus, surrogate pairs, garbage input. */
  def probe(): Unit = {
    val empty = Oracle.runKg(0)
    println(s"PROBE empty corpus: mentions=${empty.mentions.size} triples=${empty.triples.size} canonical=${empty.canonical.size}")
    val emoji = "Alice Smithson 😀 visited Green River Valley 🌍 today."
    val toks = Tokenizer.tokenize(emoji)
    val spansOk = toks.forall(t => emoji.substring(t.start, t.end) == t.value)
    println(s"PROBE surrogate pairs: tokens=${toks.length} spansReconstruct=$spansOk")
    val ms = StringTagger.tag(emoji)
    println(s"PROBE tagger with emoji: ${ms.map(m => s"'${m.value}'").mkString(", ")}")
    println(s"PROBE tokenizer null/empty: ${Tokenizer.tokenize(null).length}/${Tokenizer.tokenize("").length}")
    println(s"PROBE dates garbage: ${Seq("99/99/9999", "0000", "Jul 32, 2021", "").map(DateParser.parse(_).isDefined)}")
    println(s"PROBE stemmer unicode passthrough: ${PorterStemmer.stem("Übungen")}")
    val longTok = "x" * 100000
    println(s"PROBE 100k-char single token: ${Tokenizer.tokenize(longTok).length} token(s)")
    println(s"PROBE classify with empty model: ${Classify("anything", DictModel(Map.empty, Map.empty, Map.empty, 0), FeatureSetting.wordDefault, DefaultScorer)}")
  }
}
