package graft.semantics

/** English singular/plural transformation rules (reconstructed:
  * ws.palladian.semantics.WordTransformer — SURVEY.md §2 row 20). Used to
  * normalize alias surfaces for entity-linking blocking keys.
  */
object WordTransformer {

  private val irregularToSingular: Map[String, String] = Map(
    "men" -> "man", "women" -> "woman", "children" -> "child",
    "feet" -> "foot", "teeth" -> "tooth", "geese" -> "goose",
    "mice" -> "mouse", "people" -> "person", "indices" -> "index",
    "matrices" -> "matrix", "vertices" -> "vertex", "analyses" -> "analysis",
    "data" -> "datum", "media" -> "medium", "criteria" -> "criterion")

  private val uncountable: Set[String] = Set(
    "series", "species", "news", "information", "equipment", "money",
    "software", "physics", "mathematics")

  def toSingular(word: String): String = {
    if (word == null || word.isEmpty) return ""
    val w = word.toLowerCase
    if (uncountable.contains(w)) return w
    irregularToSingular.get(w) match {
      case Some(s) => s
      case None =>
        if (w.endsWith("ies") && w.length > 3) w.dropRight(3) + "y"
        else if (w.endsWith("ves") && w.length > 3) w.dropRight(3) + "f"
        else if (w.endsWith("xes") || w.endsWith("ses") || w.endsWith("zes") ||
                 w.endsWith("ches") || w.endsWith("shes")) w.dropRight(2)
        else if (w.endsWith("ss") || w.endsWith("us") || w.endsWith("is")) w
        else if (w.endsWith("s") && w.length > 1) w.dropRight(1)
        else w
    }
  }

  private val irregularToPlural: Map[String, String] =
    irregularToSingular.map(_.swap)

  def toPlural(word: String): String = {
    if (word == null || word.isEmpty) return ""
    val w = word.toLowerCase
    if (uncountable.contains(w)) return w
    irregularToPlural.get(w) match {
      case Some(p) => p
      case None =>
        if (w.endsWith("y") && w.length > 1 && !"aeiou".contains(w.charAt(w.length - 2)))
          w.dropRight(1) + "ies"
        else if (w.endsWith("s") || w.endsWith("x") || w.endsWith("z") ||
                 w.endsWith("ch") || w.endsWith("sh")) w + "es"
        else w + "s"
    }
  }
}
