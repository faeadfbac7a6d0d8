package graft.oracle

import graft.corpus.TranscriptGen
import graft.semantics._
import org.scalatest.funsuite.AnyFunSuite

/** M0 gates: generator determinism, gold-span sanity, NER train→tag
  * P/R >= 0.95 on held-out conversations, linking cluster recovery
  * (SURVEY.md §5.2, BASELINE.md).
  */
class OracleSpec extends AnyFunSuite {

  private val N_CONVS = 150
  private lazy val corpus = TranscriptGen.corpus(N_CONVS)
  private lazy val train = corpus.filterNot(lt => TranscriptGen.isEval(lt.turn.conv_id.drop(1).toLong))
  private lazy val eval = corpus.filter(lt => TranscriptGen.isEval(lt.turn.conv_id.drop(1).toLong))
  private lazy val model = Oracle.trainNer(train)

  test("generator is deterministic") {
    val a = TranscriptGen.turnsForConv(7)
    val b = TranscriptGen.turnsForConv(7)
    assert(a.map(_.turn) == b.map(_.turn))
    assert(a.flatMap(_.gold) == b.flatMap(_.gold))
  }

  test("gold spans match inserted surfaces") {
    for (lt <- corpus; m <- lt.gold)
      assert(lt.turn.text.substring(m.start, m.end) == m.value)
  }

  test("entities are unique by canonical surface") {
    val canon = TranscriptGen.entities.map(_.canonical)
    assert(canon.distinct.size == canon.size)
    val allSurf = TranscriptGen.entities.flatMap(e => e.surfaces.map(s => (Linker.normalize(s), e.id)))
    val collisions = allSurf.groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1)
    assert(collisions.isEmpty, s"alias collisions across entities: ${collisions.keys}")
  }

  test("corpus has skew: hot entity present") {
    val hot = TranscriptGen.hotEntity.canonical
    val hits = corpus.count(_.gold.exists(_.value == hot))
    assert(hits > corpus.size / 50, s"hot entity only in $hits/${corpus.size} turns")
  }

  test("NER P/R >= 0.95 on held-out conversations") {
    val tagged = Oracle.tag(eval, model)
    val pred = tagged.flatMap { case (lt, ms) =>
      ms.map(m => (lt.turn.conv_id + "#" + lt.turn.turn_idx, m.copy(conf = 1.0)))
    }
    val gold = eval.flatMap(lt => lt.gold.map(m => (lt.turn.conv_id + "#" + lt.turn.turn_idx, m)))
    val prf = Eval.mentionPRF(pred, gold)
    info(f"NER precision=${prf.precision}%.4f recall=${prf.recall}%.4f f1=${prf.f1}%.4f (tp=${prf.tp} fp=${prf.fp} fn=${prf.fn})")
    assert(prf.precision >= 0.95, f"precision ${prf.precision}%.4f < 0.95")
    assert(prf.recall >= 0.95, f"recall ${prf.recall}%.4f < 0.95")
  }

  test("triple P/R >= 0.95 on held-out conversations") {
    val tagged = Oracle.tag(eval, model)
    val pred = Oracle.triples(tagged)
    val gold = eval.flatMap(_.goldTriples)
    val prf = Eval.triplePRF(pred, gold)
    info(f"triples precision=${prf.precision}%.4f recall=${prf.recall}%.4f (tp=${prf.tp} fp=${prf.fp} fn=${prf.fn})")
    assert(prf.precision >= 0.95, f"precision ${prf.precision}%.4f < 0.95")
    assert(prf.recall >= 0.95, f"recall ${prf.recall}%.4f < 0.95")
  }

  test("linking recovers gold alias clusters") {
    // gold clusters: surfaces of each entity that actually occur in corpus
    val occurring = corpus.flatMap(_.gold.map(m => (Linker.normalize(m.value), m.tag))).toSet
    val goldClusters = TranscriptGen.entities
      .map(e => e.surfaces.map(s => Linker.normalize(s)).filter(n => occurring.exists(_._1 == n)).toSet)
      .filter(_.nonEmpty)
    val predClusters = Oracle.components(corpus.flatMap(_.gold.map(m => (m.value, m.tag))))
    // every gold cluster must sit inside one predicted component (no split),
    // and no predicted component may span two gold entities (no bad merge)
    val surfToEntity = TranscriptGen.entities.flatMap(e => e.surfaces.map(s => Linker.normalize(s) -> e.id)).toMap
    var splits = 0
    for (g <- goldClusters if g.size > 1) {
      val containing = predClusters.count(p => g.subsetOf(p))
      if (containing != 1) splits += 1
    }
    var merges = 0
    for (p <- predClusters) {
      val ids = p.flatMap(surfToEntity.get)
      if (ids.size > 1) merges += 1
    }
    info(s"gold clusters=${goldClusters.size} predicted=${predClusters.size} splits=$splits badMerges=$merges")
    assert(splits == 0, s"$splits gold clusters split across components")
    assert(merges == 0, s"$merges components merge distinct entities")
  }

  test("dictionary classifier accuracy threshold on role prediction") {
    // classifier accuracy-threshold gate (FIXTURES.md §C.3 analogue):
    // roles have distinct template vocabularies -> the dictionary
    // classifier must clearly beat the majority-class baseline
    val fs = FeatureSetting(charGrams = false, minN = 1, maxN = 2, maxTerms = 1000)
    val trainDocs = train.map(lt => (lt.turn.text, lt.turn.role))
    val model = DictModel.train(trainDocs, fs)
    val evalDocs = eval.map(lt => (lt.turn.text, lt.turn.role))
    val pairs = evalDocs.map { case (t, actual) =>
      (actual, Classify(t, model, fs, BayesScorer)._1)
    }
    val c = Eval.confusion(pairs)
    val majority = evalDocs.groupBy(_._2).values.map(_.size).max.toDouble / evalDocs.size
    info(f"role classifier accuracy=${c.accuracy}%.4f macroF1=${c.macroF1}%.4f majority=$majority%.4f")
    assert(c.accuracy >= 0.85, f"accuracy ${c.accuracy}%.4f < 0.85")
    assert(c.accuracy > majority, "must beat majority baseline")
  }

  test("oracle triples are deterministic across runs") {
    val r1 = Oracle.runKg(10).triples
    val r2 = Oracle.runKg(10).triples
    assert(r1 == r2)
  }
}
