package graft.semantics

/** Core span types shared by the Spark pipeline and the single-threaded
  * oracle (SURVEY.md §5.2). Offsets are Java String (UTF-16) indices,
  * end-exclusive, mirroring the reference's Annotation convention
  * (reconstructed: ws.palladian.core.Annotation — /root/reference was empty
  * at survey time, see SURVEY.md §0).
  */
final case class Token(start: Int, end: Int, value: String)

final case class Sentence(start: Int, end: Int, text: String)

/** A detected entity mention. `tag` is CANDIDATE after StringTagger, a
  * concrete type (PER/ORG/LOC/PRODUCT/...) after NER classification.
  */
final case class Mention(start: Int, end: Int, value: String, tag: String, conf: Double)

/** A knowledge-graph triple attributed to one transcript turn. */
final case class Triple(
    convId: String,
    turnIdx: Int,
    subj: String,
    pred: String,
    obj: String,
    subjTag: String,
    objTag: String)
