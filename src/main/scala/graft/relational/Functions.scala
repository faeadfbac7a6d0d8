package graft.relational

import graft.semantics._
import org.apache.spark.sql.SparkSession

/** SQL UDF registry (SURVEY.md §2 row 64): every parity-critical
  * `semantics` function registered once so all operators are also
  * runnable from `spark.sql`. Registration is idempotent.
  */
object Functions {

  def register(spark: SparkSession): Unit = {
    val u = spark.udf
    u.register("pal_tokenize", (s: String) => Tokenizer.words(s))
    u.register("pal_token_spans", (s: String) => Tokenizer.tokenize(s))
    u.register("pal_sentences", (s: String) => SentenceSplitter.split(s).map(_.text))
    u.register("pal_char_ngrams", (s: String, minN: Int, maxN: Int) => NGrams.charNGrams(s, minN, maxN))
    u.register("pal_word_ngrams", (s: String, minN: Int, maxN: Int) =>
      NGrams.wordNGrams(Tokenizer.words(if (s == null) "" else s.toLowerCase), minN, maxN))
    u.register("pal_shingles", (s: String, k: Int) => NGrams.shingles(s, k))
    u.register("pal_case_signature", (s: String) => StringOps.caseSignature(s))
    u.register("pal_clean", (s: String) => StringOps.clean(s))
    u.register("pal_normalize", (s: String) => StringOps.normalizeSurface(s))
    u.register("pal_stem", (s: String) => PorterStemmer.stem(s))
    u.register("pal_singular", (s: String) => WordTransformer.toSingular(s))
    u.register("pal_plural", (s: String) => WordTransformer.toPlural(s))
    u.register("pal_levenshtein", (a: String, b: String) => Similarity.levenshtein(a, b))
    u.register("pal_jaro_winkler", (a: String, b: String) => Similarity.jaroWinkler(a, b))
    u.register("pal_ngram_sim", (a: String, b: String) => Similarity.ngramSim(a, b))
    u.register("pal_date_parse", (s: String) =>
      DateParser.parse(s).map(d => d.iso + "|" + d.exactness).orNull)
    u.register("pal_is_date_fragment", (s: String) => StringOps.containsDateFragment(s))
    u.register("pal_tag_candidates", (s: String) => StringTagger.tag(s).map(_.value))
    u.register("pal_tag_urls", (s: String) => RegexTaggers.tagUrls(s).map(_.value))
    u.register("pal_tag_dates", (s: String) => RegexTaggers.tagDates(s).map(_.value))
    u.register("pal_tag_smileys", (s: String) => RegexTaggers.tagSmileys(s).map(_.value))
    u.register("pal_tag_all", (s: String) => RegexTaggers.tagAll(s).map(m => m.tag + ":" + m.value))
    u.register("pal_block_keys", (s: String) => Linker.blockKeys(StringOps.normalizeSurface(s)))
    u.register("pal_link_match", (a: String, b: String) =>
      Linker.isMatch(StringOps.normalizeSurface(a), StringOps.normalizeSurface(b)))
  }
}
