package graft.relational

import graft.semantics.NGrams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data pipeline operators over the `documents` table:
  * deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash), text
  * analysis (language-ID heuristic, quality scoring, token counting,
  * fingerprinting), TF-IDF, dictionary training/pruning (SURVEY.md §2
  * rows 13, 34, 42–43 + the builder prompt's training-data ops).
  *
  * DuckDB-expressible ops carry oracles; hash-based ops (MinHash/SimHash
  * use Spark's xxhash64 — no DuckDB twin) are rows-only by design.
  */
object CatalogText {

  private def docs(s: SparkSession, d: String) = s.read.parquet(s"$d/documents.parquet")

  /** Stopword list shared with the oracle SQL literally. */
  private val stops = Seq("the", "a", "of", "to", "and", "in", "is", "on", "for", "with")
  private val stopsSqlList = stops.map(w => s"'$w'").mkString(", ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------------ dedup family
    // exact dedup via content hash: keeper = min doc_id per text
    "t_dedup_exact" -> ((s, d) => docs(s, d)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .groupBy(col("n_copies"))
      .agg(count(lit(1)).as("n_groups"))
      .orderBy(col("n_copies"))),

    // word-3-gram shingle Jaccard near-dup pairs (blocked to doc_id<200)
    "t_ngram_jaccard" -> ((s, d) => {
      val sh = docs(s, d).where(col("doc_id") < 200)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(split(text, ' ')) - 3), " +
            "i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))")).as("shingle"))
        .distinct()
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = sh.as("a").join(sh.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("i"))
      inter
        .join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"), "da")
        .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"), "db")
        .withColumn("jaccard", round(col("i") / (col("na") + col("nb") - col("i")), 6))
        .where(col("jaccard") >= 0.2)
        .select(col("da"), col("db"), col("jaccard"))
        .orderBy(col("da"), col("db"))
    }),

    // MinHash + LSH banding (16 hashes, 4 bands × 4 rows) — candidate
    // near-dup pairs via bucket join; rows-only (xxhash64 has no DuckDB
    // twin). Plan shape: ONE hash aggregation computes all 16 signature
    // mins as separate agg functions (no 16× posexplode row blowup),
    // then stack() unpivots the 4 band buckets — one shuffle over docs.
    "t_minhash_lsh" -> ((s, d) => {
      val sh = docs(s, d)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(split(text, ' ')) - 3), " +
            "i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))")).as("shingle"))
      val aggCols = (0 until 16).map(i => min(expr(s"xxhash64(shingle, $i)")).as(s"h$i"))
      val sigs = sh.groupBy(col("doc_id")).agg(aggCols.head, aggCols.tail: _*)
      val bandExprs = (0 until 4).map { b =>
        val hs = (0 until 4).map(j => s"h${b * 4 + j}").mkString(", ")
        s"$b, xxhash64(CAST($b AS BIGINT), $hs)"
      }.mkString(", ")
      val bands = sigs.select(col("doc_id"),
        expr(s"stack(4, $bandExprs) AS (band, bucket)"))
      bands.as("a").join(bands.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.band") === col("b.band") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
        .orderBy(col("da"), col("db"))
    }),

    // SimHash (64-bit, token-hash bit voting): all 64 bit-vote sums in a
    // single hash aggregation (no 64× explode); rows-only
    "t_simhash" -> ((s, d) => {
      val tok = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .where(col("tok") =!= "")
        .withColumn("h", xxhash64(col("tok")))
      val voteCols = (0 until 64).map(b =>
        sum(expr(s"CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END")).as(s"v$b"))
      val assemble = (0 until 64)
        .map(b => s"(CASE WHEN v$b > 0 THEN shiftleft(1L, $b) ELSE 0L END)")
        .mkString(" + ")
      tok.groupBy(col("doc_id")).agg(voteCols.head, voteCols.tail: _*)
        .select(col("doc_id"), expr(assemble).as("simhash"))
        .orderBy(col("doc_id"))
    }),

    // ------------------------------------------------ text analysis family
    // language-ID heuristic: stopword ratio (deterministic rule, compared
    // against the lang column as a confusion table)
    "t_lang_confusion" -> ((s, d) => docs(s, d)
      .withColumn("toks", expr("filter(split(text, ' '), x -> x <> '')"))
      .withColumn("stop_ratio",
        expr(s"size(filter(toks, x -> x IN ($stopsSqlList)))") / greatest(size(col("toks")), lit(1)))
      .withColumn("pred_lang", when(col("stop_ratio") >= 0.12, "en").otherwise("other"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))),

    // quality scoring: length/word-count/avg-word-len/stopword-ratio
    "t_quality" -> ((s, d) => docs(s, d)
      .withColumn("toks", expr("filter(split(text, ' '), x -> x <> '')"))
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_m"),
        size(col("toks")).as("n_words"),
        round(expr("aggregate(toks, 0L, (acc, x) -> acc + length(x))") /
          greatest(size(col("toks")), lit(1)).cast("double"), 6).as("avg_word_len"),
        round(expr(s"size(filter(toks, x -> x IN ($stopsSqlList)))") /
          greatest(size(col("toks")), lit(1)).cast("double"), 6).as("stop_ratio"))
      .where(col("doc_id") < 300)
      .orderBy(col("doc_id"))),

    // token counting per source
    "t_token_stats" -> ((s, d) => docs(s, d)
      .withColumn("n_toks", size(expr("filter(split(text, ' '), x -> x <> '')")))
      .groupBy(col("source"))
      .agg(sum(col("n_toks")).as("total_tokens"),
        round(avg(col("n_toks")), 4).as("avg_tokens"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("source"))),

    // document fingerprinting (content hash prefix)
    "t_fingerprint" -> ((s, d) => docs(s, d)
      .where(col("doc_id") < 100)
      .select(col("doc_id"), substring(md5(col("text")), 1, 16).as("fp"))
      .orderBy(col("doc_id"))),

    // ---------------------------------------------- dictionary/classifier
    // dictionary training as relational agg (term × category counts,
    // SURVEY.md §2 row 34's oracleSql twin)
    "t_dict_train" -> ((s, d) => docs(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .where(col("term") =!= "")
      .groupBy(col("term"), col("source"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("term"), col("source"))),

    // dictionary pruning (HAVING count >= k, row 13)
    "t_dict_prune" -> ((s, d) => docs(s, d)
      .select(explode(split(col("text"), " ")).as("term"))
      .where(col("term") =!= "")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= 100)
      .orderBy(col("term"))),

    // TF-IDF document frequencies (row 42)
    "t_tfidf" -> ((s, d) => {
      val n = docs(s, d).count()
      docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .where(col("term") =!= "")
        .groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .withColumn("idf", round(log(lit(n.toDouble) / col("df")), 6))
        .orderBy(col("term"))
    }),

    // Bag analytics: global top-10 terms (row 43)
    "t_top_terms" -> ((s, d) => docs(s, d)
      .select(explode(split(col("text"), " ")).as("term"))
      .where(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(10)),

    // stop-word removal (higher-order filter, row 10)
    "t_stopword_removal" -> ((s, d) => docs(s, d)
      .where(col("doc_id") < 50)
      .select(col("doc_id"),
        size(expr("filter(split(text, ' '), x -> x <> '')")).as("n_before"),
        size(expr(s"filter(split(text, ' '), x -> x <> '' AND NOT x IN ($stopsSqlList))")).as("n_after"))
      .orderBy(col("doc_id"))),

    // deterministic k-fold assignment (row 39): fold = doc_id % 5 (driver
    // data has dense ids; the transcript pipeline uses xxhash64-based folds)
    "t_fold_split" -> ((s, d) => docs(s, d)
      .withColumn("fold", pmod(col("doc_id"), lit(5)).cast("int"))
      .groupBy(col("fold")).agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      .orderBy(col("fold"))),

    // χ² feature ranking (row 40): doc-presence contingency vs source
    "t_chi2_terms" -> ((s, d) => {
      val n = docs(s, d).count().toDouble
      val dt = docs(s, d)
        .select(col("doc_id"), col("source"),
          explode(array_distinct(expr("filter(split(text, ' '), x -> x <> '')"))).as("term"))
      val obs = dt.groupBy(col("term"), col("source")).agg(count(lit(1)).as("o"))
      val termTot = obs.groupBy(col("term")).agg(sum(col("o")).as("tt"))
      val catTot = docs(s, d).groupBy(col("source")).agg(count(lit(1)).as("ct"))
      obs.join(termTot, "term").join(catTot, "source")
        .withColumn("e", col("tt") * col("ct") / lit(n))
        .withColumn("contrib", (col("o") - col("e")) * (col("o") - col("e")) / col("e"))
        .groupBy(col("term"))
        .agg(round(sum(col("contrib")), 4).as("chi2"))
        .orderBy(col("term"))
    }),

    // ZeroR baseline (row 41): global majority class
    "t_zeror" -> ((s, d) => docs(s, d)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("source"))
      .limit(1))
  )

  def oracleSql: Map[String, String] = Map(
    "t_dedup_exact" ->
      """SELECT n_copies, count(*) AS n_groups FROM (
        |  SELECT md5(text) AS content_hash, min(doc_id) AS keeper, count(*) AS n_copies
        |  FROM documents GROUP BY 1)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "t_ngram_jaccard" ->
      """WITH words AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 200),
        |sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |  FROM words, unnest(generate_series(1, len(w) - 2)) AS t(i)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da, db, round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
        |FROM inter JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
        |WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.2
        |ORDER BY da, db""".stripMargin,
    "t_lang_confusion" ->
      s"""SELECT lang, pred_lang, count(*) AS n FROM (
         |  SELECT lang,
         |  CASE WHEN len(list_filter(string_split(text, ' '), x -> x IN ($stopsSqlList))) * 1.0 /
         |    greatest(len(list_filter(string_split(text, ' '), x -> x <> '')), 1) >= 0.12
         |  THEN 'en' ELSE 'other' END AS pred_lang
         |  FROM documents)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t_quality" ->
      s"""SELECT doc_id, length(text) AS n_chars_m,
         |len(toks) AS n_words,
         |round(list_sum(list_transform(toks, x -> length(x))) * 1.0 / greatest(len(toks), 1), 6) AS avg_word_len,
         |round(len(list_filter(toks, x -> x IN ($stopsSqlList))) * 1.0 / greatest(len(toks), 1), 6) AS stop_ratio
         |FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks, text
         |      FROM documents WHERE doc_id < 300)
         |ORDER BY doc_id""".stripMargin,
    "t_token_stats" ->
      """SELECT source, sum(n_toks) AS total_tokens, round(avg(n_toks), 4) AS avg_tokens,
        |count(*) AS n_docs FROM (
        |  SELECT source, len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_toks
        |  FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "t_fingerprint" ->
      """SELECT doc_id, substring(md5(text), 1, 16) AS fp FROM documents
        |WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "t_dict_train" ->
      """SELECT term, source, count(*) AS n FROM (
        |  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents)
        |WHERE term <> '' GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t_dict_prune" ->
      """SELECT term, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |WHERE term <> '' GROUP BY 1 HAVING count(*) >= 100 ORDER BY 1""".stripMargin,
    "t_tfidf" ->
      """SELECT term, df, round(ln((SELECT count(*) FROM documents) * 1.0 / df), 6) AS idf FROM (
        |  SELECT term, count(DISTINCT doc_id) AS df FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |  WHERE term <> '' GROUP BY 1)
        |ORDER BY term""".stripMargin,
    "t_top_terms" ->
      """SELECT term, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |WHERE term <> '' GROUP BY 1 ORDER BY n DESC, term LIMIT 10""".stripMargin,
    "t_stopword_removal" ->
      s"""SELECT doc_id,
         |len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_before,
         |len(list_filter(string_split(text, ' '), x -> x <> '' AND NOT x IN ($stopsSqlList))) AS n_after
         |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin,
    "t_fold_split" ->
      """SELECT CAST(doc_id % 5 AS INT) AS fold, count(*) AS n, sum(n_chars) AS chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "t_chi2_terms" ->
      """WITH dt AS (
        |  SELECT DISTINCT doc_id, source, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        |  FROM documents),
        |obs AS (SELECT term, source, count(*) AS o FROM dt GROUP BY 1, 2),
        |tt AS (SELECT term, sum(o) AS tt FROM obs GROUP BY 1),
        |ct AS (SELECT source, count(*) AS ct FROM documents GROUP BY 1),
        |n AS (SELECT count(*) * 1.0 AS n FROM documents)
        |SELECT term, round(sum((o - e) * (o - e) / e), 4) AS chi2 FROM (
        |  SELECT obs.term, obs.o, tt.tt * ct.ct / n.n AS e
        |  FROM obs JOIN tt ON obs.term = tt.term JOIN ct ON obs.source = ct.source, n)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "t_zeror" ->
      """SELECT source, count(*) AS n FROM documents GROUP BY 1
        |ORDER BY n DESC, source LIMIT 1""".stripMargin
  )
}
