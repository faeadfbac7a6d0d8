package graft.semantics

import org.scalatest.funsuite.AnyFunSuite

/** Char-ngram dictionary language classifier (SURVEY.md §2 row 14's real
  * design, wired through DictModel with charGrams=true). The driver
  * `documents` testdata has NO language signal (identical 31-word vocab
  * across langs — verified r2), so accuracy is proven here on a corpus
  * with genuine per-language character distributions, where the ngram
  * classifier must beat the stopword-ratio heuristic that shipped in r1.
  */
class LangNgramSpec extends AnyFunSuite {

  private val fs = FeatureSetting(charGrams = true, minN = 3, maxN = 3, maxTerms = 10000)

  // deterministic synthetic corpora with language-typical character
  // patterns (English th/ing/and vs German sch/ung/ein vs French eau/oux)
  private val enWords = Array("the", "thing", "and", "with", "nation", "running",
    "lighting", "another", "things", "standing")
  private val deWords = Array("schnell", "zeitung", "eindruck", "nichts", "straße",
    "verwaltung", "geschichte", "mädchen", "übung", "schreiben")
  private val frWords = Array("eau", "beaucoup", "châteaux", "heureux", "travaux",
    "montagne", "jusqu'à", "français", "toujours", "nouveaux")

  private val stopArr = Array("the", "and", "with", "of", "to")

  /** Code-switched doc: every 4th word is an English stopword (realistic
    * for technical text in any language), which defeats a stopword-RATIO
    * heuristic while leaving the character distribution dominated by the
    * true language.
    */
  private def doc(words: Array[String], seed: Int, codeSwitch: Boolean, n: Int = 30): String = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      if (codeSwitch && i % 4 == 3) stopArr(rnd.nextInt(stopArr.length))
      else words(rnd.nextInt(words.length))
    }.mkString(" ")
  }

  private def corpus(): Seq[(String, String)] =
    (0 until 40).map(i => (doc(enWords, i, codeSwitch = false), "en")) ++
      (0 until 40).map(i => (doc(deWords, 1000 + i, codeSwitch = true), "de")) ++
      (0 until 40).map(i => (doc(frWords, 2000 + i, codeSwitch = true), "fr"))

  test("char-ngram classifier beats the stopword heuristic on signal-bearing text") {
    val all = corpus()
    val (train, test) = all.zipWithIndex.partition(_._2 % 2 == 0)
    val model = DictModel.train(train.map(_._1), fs)
    val stops = Set("the", "a", "of", "to", "and", "in", "is", "on", "for", "with")

    var ngramHits = 0
    var heuristicHits = 0
    for (((text, lang), _) <- test) {
      val (pred, _) = Classify(text, model, fs, BayesScorer)
      if (pred == lang) ngramHits += 1
      // the r1 heuristic: stopword ratio >= 0.12 -> "en", else "other";
      // score it generously (any non-en counts as "other" hit)
      val toks = text.split(' ').filter(_.nonEmpty)
      val ratio = toks.count(stops.contains).toDouble / math.max(1, toks.length)
      val hPred = if (ratio >= 0.12) "en" else "other"
      if ((hPred == "en" && lang == "en") || (hPred == "other" && lang != "en")) heuristicHits += 1
    }
    val n = test.size
    val ngramAcc = ngramHits.toDouble / n
    val heuristicAcc = heuristicHits.toDouble / n
    assert(ngramAcc >= 0.95, s"ngram classifier accuracy $ngramAcc < 0.95")
    assert(ngramAcc > heuristicAcc,
      s"ngram ($ngramAcc) must beat heuristic ($heuristicAcc)")
  }

  test("charGrams FeatureSetting produces 3-grams incl. spaces") {
    val terms = NGrams.terms("ab cd", FeatureSetting(charGrams = true, 3, 3, 100))
    assert(terms.toSeq == Seq("ab ", "b c", " cd"))
  }
}
