package graft.corpus

import graft.semantics.{Mention, Triple, TripleAssembler}

/** Deterministic synthetic transcript corpus (FIXTURES.md §B).
  *
  * The input contract (BASELINE.json input_hint) is an Iceberg table
  * `transcripts(conv_id STRING, turn_idx INT, role STRING, text STRING,
  * tool STRING, ts TIMESTAMP)`. The driver test data contains no
  * capitalizable entities, so this generator synthesizes the corpus — a
  * pure function of (seed=42, convIdx, turnIdx) via a splitmix64-style
  * PRNG, so any slice regenerates identically at any scale and on any
  * executor (no Math.random / clocks / shared state).
  *
  * Gold labels: each generated turn carries its exact inserted entity
  * mention spans + types, independent of the tagger — this is the
  * evaluation gold for the P/R >= 0.95 gate.
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: java.sql.Timestamp)

final case class LabeledTurn(turn: Turn, gold: Array[Mention]) {
  def goldTriples: Array[Triple] =
    TripleAssembler.assemble(turn.conv_id, turn.turn_idx, turn.role, turn.text, turn.tool, gold)
}

final case class Entity(id: Long, canonical: String, tp: String, aliases: Seq[String]) {
  /** canonical + aliases; index 0 is canonical. */
  def surfaces: Seq[String] = canonical +: aliases
}

object TranscriptGen {

  val SEED = 42L

  // ---------------------------------------------------------------- PRNG
  /** splitmix64 — public-domain mixing function (Steele et al. 2014). */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  final class Rng(seed: Long) {
    private var state = seed
    def nextLong(): Long = { state = mix64(state); state }
    def nextInt(bound: Int): Int = {
      val r = nextLong() >>> 1
      (r % bound).toInt
    }
    def nextDouble(): Double = (nextLong() >>> 11) * (1.0 / (1L << 53))
    def pick[T](xs: IndexedSeq[T]): T = xs(nextInt(xs.length))
  }

  def rng(parts: Long*): Rng =
    new Rng(parts.foldLeft(SEED)((acc, p) => mix64(acc ^ p)))

  // ------------------------------------------------------------ entities
  // Surface-form classes cover every StringTagger behavior class
  // (FIXTURES.md §B): Title Case multi-word, particles, ALL-CAPS,
  // camelCase, digit suffixes; aliases exercise blocking + fuzzy linking.

  private val perFirst = Vector("Alice", "Bruno", "Carla", "Dmitri", "Elena",
    "Farid", "Grace", "Hiro", "Ingrid", "Jonas", "Karim", "Lena", "Marco",
    "Nadia", "Otto", "Priya", "Rosa", "Stefan", "Tara", "Viktor")
  private val perLast = Vector("Smithson", "Johansson", "Petrov", "Nakamura",
    "Weber", "Okafor", "Silveira", "Kowalski", "Bianchi", "Larsen",
    "Moreau", "Tanaka", "Novak", "Fischer", "Lindgren", "Costa", "Meyer",
    "Duarte", "Haas", "Vargas")
  private val perParticle = Vector(
    ("Maarten", "van", "Dijkstra"), ("Sofia", "de", "Lucca"),
    ("Erik", "von", "Hagen"), ("Ines", "della", "Rocca"))

  private val orgAdj = Vector("Quantum", "Stellar", "Golden", "Crimson",
    "Northern", "Pacific", "Atlas", "Vertex", "Orion", "Zenith", "Green",
    "Silver")
  private val orgNoun = Vector("Data", "Cloud", "River", "Core", "Wave",
    "Grid", "Peak", "Forge")
  private val orgSuffix = Vector("Labs", "Systems", "Analytics", "Group")

  private val locNames = Vector(
    "Green River Valley", "Silver Lake", "North Haven", "Port Aurora",
    "Mount Kestrel", "Lake Verona", "Elm Harbor", "Crystal Bay",
    "Redwood Springs", "Falcon Ridge", "Amber Coast", "Stone Hollow",
    "Green Meadows", "Cedar Point", "Willow Creek", "Iron Gate")

  private val prodNames = Vector(
    "GameStation 5", "NovaPad 11", "AeroPhone 12", "HyperDrive 2",
    "TurboLens 7", "MegaFrame 3", "UltraDock 9", "PixelBoard 4",
    "iSense", "eTrack", "SkyWatch Pro", "DeepScan Max", "FlexCharge Duo",
    "SwiftKey Prime")

  /** Deterministic misspelling: drop the 3rd character of the last word. */
  private def misspell(s: String): String = {
    val words = s.split(' ')
    val w = words.last
    if (w.length < 5) s
    else (words.dropRight(1) :+ (w.substring(0, 2) + w.substring(3))).mkString(" ")
  }

  private def acronym(s: String): String =
    s.split(' ').filter(_.nonEmpty).map(_.charAt(0).toUpper).mkString

  /** The full gazetteer: id, canonical, type, aliases. Pure value. */
  lazy val entities: IndexedSeq[Entity] = {
    val pers = (0 until 24).map { i =>
      val first = perFirst(i % perFirst.length)
      // the +i/20 shift keeps (first, last) combos collision-free for i<24
      val last = perLast((i * 7 + 3 + i / 20) % perLast.length)
      val canonical = s"$first $last"
      Entity(1000 + i, canonical, "PER",
        Seq(s"${first.charAt(0)}. $last", misspell(canonical)))
    } ++ perParticle.zipWithIndex.map { case ((f, p, l), i) =>
      val canonical = s"$f $p $l"
      Entity(1024 + i, canonical, "PER", Seq(s"$f $l", misspell(canonical)))
    }
    val orgCanonicals = (0 until 20).map { i =>
      s"${orgAdj(i % orgAdj.length)} ${orgNoun((i * 5 + 1) % orgNoun.length)} ${orgSuffix(i % orgSuffix.length)}"
    }
    // acronym aliases only where unambiguous: "GCA" for both Golden Core
    // Analytics and Green Core Analytics would create an unresolvable merge
    val acronymCounts = orgCanonicals.groupBy(acronym).view.mapValues(_.size).toMap
    val orgs = orgCanonicals.zipWithIndex.map { case (canonical, i) =>
      val al = (if (acronymCounts(acronym(canonical)) == 1) Seq(acronym(canonical)) else Seq.empty) :+
        misspell(canonical)
      Entity(2000 + i, canonical, "ORG", al.distinct.filterNot(_ == canonical))
    } ++ Vector("NARO", "QUDEX", "BRIMCO", "VOLTA").zipWithIndex.map {
      case (a, i) => Entity(2020 + i, a, "ORG", Seq(a.toLowerCase.capitalize))
    }
    val locs = locNames.zipWithIndex.map { case (n, i) =>
      val al = if (n.split(' ').length > 2) Seq(n.split(' ').take(2).mkString(" "), misspell(n))
               else Seq(misspell(n))
      Entity(3000 + i, n, "LOC", al.distinct.filterNot(_ == n))
    }
    val prods = prodNames.zipWithIndex.map { case (n, i) =>
      val base = n.split(' ')
      val al = if (base.last.forall(_.isDigit)) Seq(base.dropRight(1).mkString(" "))
               else Seq(misspell(n))
      Entity(4000 + i, n, "PRODUCT", al.distinct.filterNot(_ == n))
    }
    (pers ++ orgs ++ locs ++ prods).toIndexedSeq
  }

  lazy val byType: Map[String, IndexedSeq[Entity]] = entities.groupBy(_.tp)

  /** The hot entity (~10% of entity slots — skew knob, BASELINE.json). */
  lazy val hotEntity: Entity = byType("ORG").head

  // ----------------------------------------------------------- templates
  // {PER} {PER2} {ORG} {ORG2} {LOC} {PROD} placeholders. Connector phrases
  // are drawn from TripleAssembler.relationPatterns so gold triples exist
  // by construction. Sentence-initial capitalized template words all also
  // appear lowercase mid-sentence in filler turns (caseDict evidence).
  private val assistantTemplates = Vector(
    "{PER} works at {ORG}.",
    "{PER} visited {LOC} last summer.",
    "{ORG} released {PROD} recently.",
    "{ORG} is located in {LOC}.",
    "{PER} met {PER2} during the conference.",
    "{ORG} acquired {ORG2} last quarter.",
    "{PER} lives in {LOC}.",
    "{PER} founded {ORG} years ago.",
    "{PER} leads {ORG} these days.",
    "{PER} recommends {PROD} for daily use.",
    "{ORG} partnered with {ORG2} on the project.",
    "{PER} traveled to {LOC} by train.",
    "{PER} uses {PROD} at work.",
    "According to the records, {PER} works for {ORG}.",
    "Reports say {ORG} is based in {LOC}.")

  private val userTemplates = Vector(
    "Tell me about {PER}.",
    "What do you know about {ORG}?",
    "Did {PER} really visit {LOC}?",
    "Can you compare {PROD} with something similar?",
    "Where is {ORG} located?",
    "Who leads {ORG} right now?")

  private val toolTemplates = Vector(
    "retrieved 5 records for {PER} from the knowledge base.",
    "lookup complete: 3 facts about {ORG} were found.",
    "search finished for {LOC} with 7 results.")

  private val fillerTexts = Vector(
    "thanks, that was helpful and i will tell you if i need more details about what they did.",
    "sure, i can look into it and let you know what i found so far.",
    "ok, please go on and tell me more about it when you can.",
    "understood, the records say nothing else about it right now.",
    "noted, i did check and there is nothing new to report today.",
    "right, who would have thought, and where does that leave us now.",
    "fine, can you keep watching it and report back if anything changes.")

  private val toolNames = Vector("kb_search", "web_lookup", "calc", "graph_query")

  // -------------------------------------------------------- construction
  private val slotRe = java.util.regex.Pattern.compile("\\{(PER2?|ORG2?|LOC|PROD)\\}")

  /** Fill a template, tracking exact inserted spans. */
  def fill(template: String, r: Rng): (String, Array[Mention]) = {
    val sb = new java.lang.StringBuilder(template.length + 32)
    val gold = scala.collection.mutable.ArrayBuffer.empty[Mention]
    val m = slotRe.matcher(template)
    var last = 0
    var firstPer: Entity = null
    var firstOrg: Entity = null
    while (m.find()) {
      sb.append(template, last, m.start)
      val slot = m.group(1)
      val tp = slot.stripSuffix("2") match { case "PROD" => "PRODUCT"; case t => t }
      var ent =
        if (tp == "ORG" && r.nextDouble() < 0.10) hotEntity
        else r.pick(byType(tp))
      // {X2} must differ from the first {X}
      if (slot == "PER2" && firstPer != null)
        while (ent.id == firstPer.id) ent = r.pick(byType("PER"))
      if (slot == "ORG2" && firstOrg != null)
        while (ent.id == firstOrg.id) ent = r.pick(byType("ORG"))
      if (slot == "PER" && firstPer == null) firstPer = ent
      if (slot == "ORG" && firstOrg == null) firstOrg = ent
      val surfaces = ent.surfaces
      val surface =
        if (surfaces.length == 1 || r.nextDouble() < 0.7) surfaces.head
        else surfaces(1 + r.nextInt(surfaces.length - 1))
      val start = sb.length
      sb.append(surface)
      gold += Mention(start, sb.length, surface, ent.tp, 1.0)
      last = m.end
    }
    sb.append(template, last, template.length)
    (sb.toString, gold.toArray)
  }

  /** Conversation length: Zipf-ish, 4..24 turns; conv 0 is the long-conv
    * skew outlier (BASELINE.json skew knob).
    */
  def convLength(convIdx: Long): Int = {
    if (convIdx == 0) 320
    else {
      val u = new Rng(mix64(SEED ^ convIdx)).nextDouble()
      4 + math.min(20, (math.pow(1.0 - u, -0.6) - 1.0).toInt * 4)
    }
  }

  private val baseTsMillis = 1735689600000L // 2025-01-01T00:00:00Z

  /** All labeled turns of one conversation — THE generation kernel, called
    * per conv both by the oracle (sequentially) and by Spark
    * (spark.range(nConvs).flatMap), so generation itself distributes.
    */
  def turnsForConv(convIdx: Long): Seq[LabeledTurn] = {
    val convId = f"c$convIdx%07d"
    val n = convLength(convIdx)
    (0 until n).map { ti =>
      val r = rng(convIdx, ti.toLong)
      val role =
        if (ti % 2 == 0) "user"
        else if (r.nextDouble() < 0.15) "tool"
        else "assistant"
      val (text, gold, tool) = role match {
        case "user" =>
          if (r.nextDouble() < 0.25) (r.pick(fillerTexts), Array.empty[Mention], null)
          else { val (t, g) = fill(r.pick(userTemplates), r); (t, g, null) }
        case "assistant" =>
          val (t, g) = fill(r.pick(assistantTemplates), r)
          if (r.nextDouble() < 0.2) {
            val extra = r.pick(fillerTexts)
            (t + " " + extra.capitalize, g, null)
          } else (t, g, null)
        case _ =>
          val (t, g) = fill(r.pick(toolTemplates), r)
          (t, g, toolNames(r.nextInt(toolNames.length)))
      }
      val ts = new java.sql.Timestamp(baseTsMillis + convIdx * 3600000L + ti * 30000L)
      LabeledTurn(Turn(convId, ti, role, text, tool, ts), gold)
    }
  }

  /** Driver-side corpus for the oracle and unit tests. */
  def corpus(nConvs: Int): Seq[LabeledTurn] =
    (0L until nConvs.toLong).flatMap(turnsForConv)

  /** Train/eval split: every 5th conversation is held out. The
    * constants are the single source of truth — Kg.isEvalCol builds the
    * codegen'd column twin from them, so the split cannot silently
    * diverge between the generator and the query paths.
    */
  val SPLIT_MOD = 5
  val EVAL_REMAINDER = 4
  def isEval(convIdx: Long): Boolean = convIdx % SPLIT_MOD == EVAL_REMAINDER
}
