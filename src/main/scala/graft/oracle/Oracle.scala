package graft.oracle

import graft.corpus.{LabeledTurn, TranscriptGen}
import graft.semantics._

import scala.collection.mutable

/** Single-threaded reference executor (SURVEY.md §5.2): maps the exact
  * same `semantics` functions over a fixture corpus with plain Scala
  * collections. Distribution-parity tests assert the Spark pipeline's
  * output equals this, proving the Spark plumbing (ordering, explode,
  * joins, CC) preserves semantics.
  */
object Oracle {

  /** Train a NER model from the gold-labeled train split. */
  def trainNer(train: Seq[LabeledTurn]): NerModel =
    NerModel.train(train.map(lt => NerModel.TaggedDoc(lt.turn.text, lt.gold)))

  /** Tag every turn with the model. Returns (turnKey, mentions). */
  def tag(corpus: Seq[LabeledTurn], model: NerModel): Seq[(LabeledTurn, Array[Mention])] =
    corpus.map(lt => lt -> NerModel.tag(lt.turn.text, model))

  def triples(tagged: Seq[(LabeledTurn, Array[Mention])]): Seq[Triple] =
    tagged.flatMap { case (lt, ms) =>
      TripleAssembler.assemble(lt.turn.conv_id, lt.turn.turn_idx, lt.turn.role,
        lt.turn.text, lt.turn.tool, ms)
    }

  /** Union-find entity canonicalization over distinct (normSurface, type)
    * nodes — the oracle twin of the Spark blocking-join + connected
    * components loop. Returns normSurface -> canonical surface (the
    * lexicographically smallest member of its component).
    */
  def linkEntities(surfaces: Seq[(String, String)]): Map[(String, String), (String, String)] = {
    val nodes = surfaces.map { case (s, t) => (Linker.normalize(s), t) }.distinct.filter(_._1.nonEmpty)
    val parent = Array.tabulate(nodes.size)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); var c = x; while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }; r }
    def union(a: Int, b: Int): Unit = { val ra = find(a); val rb = find(b); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    // blocking
    val blocks = mutable.Map.empty[String, mutable.ArrayBuffer[Int]]
    for ((node @ (norm, tp), i) <- nodes.zipWithIndex; k <- Linker.blockKeys(norm))
      blocks.getOrElseUpdate(tp + "|" + k, mutable.ArrayBuffer.empty) += i
    for ((_, members) <- blocks; ai <- members.indices; bi <- (ai + 1) until members.size) {
      val a = members(ai); val b = members(bi)
      if (nodes(a)._2 == nodes(b)._2 && Linker.isMatch(nodes(a)._1, nodes(b)._1)) union(a, b)
    }
    val byRoot = nodes.indices.groupBy(find)
    val canonicalOf = byRoot.flatMap { case (_, members) =>
      val canon = members.map(nodes).minBy(_._1)
      members.map(m => nodes(m) -> canon)
    }
    canonicalOf
  }

  /** Components as sets of normalized surfaces (for cluster-set parity —
    * id schemes differ between oracle and Spark by design).
    */
  def components(surfaces: Seq[(String, String)]): Set[Set[String]] =
    linkEntities(surfaces).groupBy(_._2).values.map(_.keys.map(_._1).toSet).toSet

  // ------------------------------------------------------------ full run
  final case class KgResult(
      mentions: Seq[(LabeledTurn, Array[Mention])],
      triples: Seq[Triple],
      canonical: Map[(String, String), (String, String)])

  def runKg(nConvs: Int): KgResult = {
    val corpus = TranscriptGen.corpus(nConvs)
    val train = corpus.filterNot(lt => TranscriptGen.isEval(lt.turn.conv_id.drop(1).toLong))
    val model = trainNer(train)
    val tagged = tag(corpus, model)
    val ts = triples(tagged)
    val surfaces = tagged.flatMap(_._2).map(m => (m.value, m.tag))
    KgResult(tagged, ts, linkEntities(surfaces))
  }
}
