package graft.tools

import graft.corpus.TranscriptGen
import graft.semantics._

/** Single-threaded microbenchmark of the NLP kernel (r6): attributes the
  * per-turn cost of the tag stage — tokenizer, sentence splitter,
  * candidate tagger, NER classify+post-rules, triple assembly — so
  * optimization effort lands on the real hot spot (the tag stage is the
  * dominant compute of the flagship, stream-job and incremental paths).
  * No Spark: pure JVM walls, min-of-k after warmup.
  */
object TagMicro {
  def main(args: Array[String]): Unit = {
    val nConvs = if (args.nonEmpty) args(0).toLong else 2000L
    val turns = (0L until nConvs).flatMap(TranscriptGen.turnsForConv)
    val texts = turns.map(_.turn.text).toArray
    println(s"[tagmicro] ${texts.length} turns, ${texts.map(_.length.toLong).sum} chars")

    // train a small model like the pipeline does (single-threaded path)
    val docs = turns.take(2000).map(t =>
      NerModel.TaggedDoc(t.turn.text, t.gold))
    val model = NerModel.train(docs)

    def bench(name: String, reps: Int)(f: String => Unit): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        var i = 0
        while (i < texts.length) { f(texts(i)); i += 1 }
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[tagmicro] $name: $best%.3f s (${best * 1e6 / texts.length}%.1f us/turn)")
    }

    bench("tokenize", 5)(t => Tokenizer.tokenize(t))
    bench("sentence_split", 5)(t => SentenceSplitter.split(t))
    bench("tagTokens(candidates)", 5) { t =>
      StringTagger.tagTokens(t, Tokenizer.tokenize(t))
    }
    bench("ner_tag_full", 5)(t => NerModel.tag(t, model))
    var i = 0
    bench("tag_plus_assemble", 5) { t =>
      val ms = NerModel.tag(t, model)
      TripleAssembler.assemble("c", i, "user", t, "tool", ms)
      i += 1
    }
  }
}
