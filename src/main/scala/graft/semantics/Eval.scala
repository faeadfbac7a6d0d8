package graft.semantics

/** Precision/recall/F1 evaluation (reconstructed:
  * ws.palladian.helper.math.ConfusionMatrix +
  * ws.palladian.extraction.entity.evaluation.EvaluationResult —
  * SURVEY.md §2 rows 37–38). Powers the P/R >= 0.95 gate.
  */
final case class PRF(tp: Long, fp: Long, fn: Long) {
  def precision: Double = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
  def recall: Double = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
  def f1: Double = {
    val p = precision; val r = recall
    if (p + r == 0) 0.0 else 2 * p * r / (p + r)
  }
  def +(o: PRF): PRF = PRF(tp + o.tp, fp + o.fp, fn + o.fn)
}

object Eval {

  /** Exact-match span evaluation over arbitrary keyed items. */
  def setPRF[T](pred: Set[T], gold: Set[T]): PRF = {
    val tp = pred.intersect(gold).size.toLong
    PRF(tp, pred.size - tp, gold.size - tp)
  }

  /** Per-document exact-span NER evaluation: items are
    * (docKey, start, end, tag).
    */
  def mentionPRF(
      pred: Seq[(String, Mention)],
      gold: Seq[(String, Mention)]): PRF = {
    val p = pred.map { case (k, m) => (k, m.start, m.end, m.tag) }.toSet
    val g = gold.map { case (k, m) => (k, m.start, m.end, m.tag) }.toSet
    setPRF(p, g)
  }

  def triplePRF(pred: Seq[Triple], gold: Seq[Triple]): PRF = {
    def key(t: Triple) = (t.convId, t.turnIdx, t.subj, t.pred, t.obj)
    setPRF(pred.map(key).toSet, gold.map(key).toSet)
  }

  /** Multi-class confusion matrix from (actual, predicted) pairs. */
  final case class Confusion(counts: Map[(String, String), Long]) {
    lazy val labels: Seq[String] =
      (counts.keys.map(_._1) ++ counts.keys.map(_._2)).toSeq.distinct.sorted
    def accuracy: Double = {
      val total = counts.values.sum
      if (total == 0) 0.0
      else counts.collect { case ((a, p), n) if a == p => n }.sum.toDouble / total
    }
    def prfFor(label: String): PRF = {
      val tp = counts.getOrElse((label, label), 0L)
      val fp = counts.collect { case ((a, p), n) if p == label && a != label => n }.sum
      val fn = counts.collect { case ((a, p), n) if a == label && p != label => n }.sum
      PRF(tp, fp, fn)
    }
    def macroF1: Double =
      if (labels.isEmpty) 0.0 else labels.map(prfFor(_).f1).sum / labels.size
  }

  def confusion(pairs: Seq[(String, String)]): Confusion =
    Confusion(pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong })
}
