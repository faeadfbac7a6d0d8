package graft.semantics

import scala.collection.mutable

/** Dictionary text-classifier model + scorers (reconstructed:
  * ws.palladian.classification.text.{PalladianTextClassifier,
  * DictionaryTrieModel, Scorer implementations} — SURVEY.md §2 rows 34–36,
  * 61). The model is a plain hash map here (SURVEY.md D10 records the
  * trie-vs-map decision: a map is acceptable at broadcast sizes and we
  * prune, row 13). On the Spark side the SAME class is built from a
  * relational (term, category, count) DataFrame, collected, and broadcast.
  */
final case class DictModel(
    dict: Map[String, Map[String, Int]],       // term -> category -> count
    categoryDocCounts: Map[String, Long],      // category -> #docs
    categoryTermCounts: Map[String, Long],     // category -> total term occurrences
    numDocs: Long) extends Serializable {

  @transient lazy val categories: Array[String] = categoryDocCounts.keys.toArray.sorted
  @transient lazy val vocabularySize: Long = dict.size.toLong

  def prior(cat: String): Double =
    if (numDocs == 0) 0.0 else categoryDocCounts.getOrElse(cat, 0L).toDouble / numDocs

  /** Drop terms whose total count is below `minCount` (SURVEY.md §2 row 13). */
  def pruned(minCount: Int): DictModel =
    copy(dict = dict.filter { case (_, cats) => cats.valuesIterator.sum >= minCount })
}

object DictModel {

  /** Single-threaded training — the oracle path; the Spark path computes
    * identical counts with groupBy(term, category).count().
    */
  def train(docs: Seq[(String, String)], fs: FeatureSetting): DictModel = {
    val dict = mutable.Map.empty[String, mutable.Map[String, Int]]
    val catDocs = mutable.Map.empty[String, Long]
    val catTerms = mutable.Map.empty[String, Long]
    for ((text, cat) <- docs) {
      catDocs(cat) = catDocs.getOrElse(cat, 0L) + 1
      for (term <- NGrams.terms(text, fs)) {
        dict.getOrElseUpdate(term, mutable.Map.empty)(cat) =
          dict(term).getOrElse(cat, 0) + 1
        catTerms(cat) = catTerms.getOrElse(cat, 0L) + 1
      }
    }
    DictModel(dict.map { case (k, v) => k -> v.toMap }.toMap,
      catDocs.toMap, catTerms.toMap, docs.size.toLong)
  }
}

/** Pluggable scoring strategy — the reference's PalladianTextClassifier
  * .Scorer interface as a Scala trait (SURVEY.md §2 row 61).
  */
trait Scorer extends Serializable {
  /** Score all categories for one document's term multiset.
    * Returns category -> unnormalized score (higher = more likely).
    */
  def score(terms: Iterable[String], model: DictModel): Map[String, Double]
}

/** Palladian-default-style scorer: for each document term with dictionary
  * evidence, add P(category | term); ties broken by category prior.
  */
object DefaultScorer extends Scorer {
  def score(terms: Iterable[String], model: DictModel): Map[String, Double] = {
    val acc = mutable.Map.empty[String, Double]
    var matched = false
    for (t <- terms; cats <- model.dict.get(t)) {
      val total = cats.valuesIterator.sum.toDouble
      for ((c, n) <- cats) {
        acc(c) = acc.getOrElse(c, 0.0) + n / total
        matched = true
      }
    }
    if (!matched) model.categoryDocCounts.map { case (c, _) => c -> model.prior(c) }
    else acc.toMap
  }
}

/** Multinomial naive Bayes with Laplace smoothing over the same dictionary
  * counts (the reference's BayesScorer analogue). Log-space accumulation.
  */
object BayesScorer extends Scorer {
  def score(terms: Iterable[String], model: DictModel): Map[String, Double] = {
    val v = math.max(1L, model.vocabularySize).toDouble
    model.categoryDocCounts.keys.map { c =>
      var logp = math.log(math.max(model.prior(c), 1e-12))
      val catTotal = model.categoryTermCounts.getOrElse(c, 0L).toDouble
      for (t <- terms) {
        val n = model.dict.get(t).flatMap(_.get(c)).getOrElse(0)
        logp += math.log((n + 1.0) / (catTotal + v))
      }
      c -> logp
    }.toMap
  }
}

object Classify {

  /** Normalize scores to a probability distribution (CategoryEntries
    * normalization, SURVEY.md §2 row 36). Log-space inputs (BayesScorer)
    * are exp-shifted first.
    */
  def normalize(scores: Map[String, Double], logSpace: Boolean): Map[String, Double] = {
    if (scores.isEmpty) return scores
    val vals =
      if (logSpace) { val m = scores.values.max; scores.map { case (k, v) => k -> math.exp(v - m) } }
      else scores
    val total = vals.values.sum
    if (total <= 0) vals.map { case (k, _) => k -> 1.0 / vals.size }
    else vals.map { case (k, v) => k -> v / total }
  }

  /** getMostLikely with deterministic tie-break on category name. */
  def mostLikely(scores: Map[String, Double]): (String, Double) =
    if (scores.isEmpty) ("", 0.0)
    else scores.maxBy { case (k, v) => (v, k) }

  def apply(text: String, model: DictModel, fs: FeatureSetting, scorer: Scorer): (String, Double) = {
    val terms = NGrams.terms(text, fs)
    val raw = scorer.score(terms, model)
    val probs = normalize(raw, logSpace = scorer eq BayesScorer)
    mostLikely(probs)
  }
}
