package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Queries exercising the registered `pal_*` UDFs from SQL (SURVEY.md §2
  * rows 15–25, 64). Two carry cross-engine oracles chosen so DuckDB can
  * mirror the semantics exactly:
  *  - token counts on the pure `[a-z ]` documents corpus == nonempty
  *    whitespace split;
  *  - case signature == a run-collapsing regexp_replace chain.
  * The rest (stemmer, date parser, Jaro-Winkler, StringTagger) have no
  * DuckDB twin (zero-egress blocks even DuckDB's fts extension) and are
  * pinned by ScalaTest fixtures instead.
  */
object CatalogUdf {

  private def withUdfs(s: SparkSession): SparkSession = { Functions.register(s); s }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "u_tokenize_sql" -> ((s, d) => {
      withUdfs(s).read.parquet(s"$d/documents.parquet").createOrReplaceTempView("documents_v")
      s.sql(
        """SELECT doc_id, size(pal_tokenize(text)) AS n_toks
          |FROM documents_v WHERE doc_id < 200 ORDER BY doc_id""".stripMargin)
    }),
    "u_case_signature" -> ((s, d) => {
      withUdfs(s).read.parquet(s"$d/customer.parquet").createOrReplaceTempView("customer_v")
      s.sql(
        """SELECT c_custkey, pal_case_signature(c_name) AS sig
          |FROM customer_v WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin)
    }),
    "u_stem_vocab" -> ((s, d) => {
      withUdfs(s).read.parquet(s"$d/documents.parquet").createOrReplaceTempView("documents_v")
      s.sql(
        """SELECT term, pal_stem(term) AS stem, pal_plural(term) AS plural, count(*) AS n
          |FROM (SELECT explode(split(text, ' ')) AS term FROM documents_v)
          |WHERE term <> '' GROUP BY term ORDER BY term""".stripMargin)
    }),
    "u_date_parse" -> ((s, d) => {
      withUdfs(s).read.parquet(s"$d/orders.parquet").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT ds, pal_date_parse(ds) AS parsed FROM (
          |  SELECT DISTINCT date_format(o_orderdate, 'yyyy-MM-dd') AS ds FROM orders_v)
          |ORDER BY ds""".stripMargin)
    }),
    // regex taggers (SURVEY.md §2 rows 24/54): URL/date/smiley mention
    // detection + prioritized union, over deterministic synthesized text
    "u_regex_taggers" -> ((s, d) => {
      withUdfs(s).read.parquet(s"$d/documents.parquet").createOrReplaceTempView("documents_v")
      s.sql(
        """SELECT doc_id,
          |  pal_tag_urls(txt) AS urls,
          |  pal_tag_dates(txt) AS dates,
          |  pal_tag_smileys(txt) AS smileys,
          |  pal_tag_all(txt) AS unioned
          |FROM (
          |  SELECT doc_id, concat('ping https://kb.example.org/doc/', doc_id,
          |    ' :) on 2021-07-0', 1 + doc_id % 9, ' ok') AS txt
          |  FROM documents_v WHERE doc_id < 50)
          |ORDER BY doc_id""".stripMargin)
    }),
    "u_similarity" -> ((s, d) => {
      withUdfs(s).read.parquet(s"$d/nation.parquet").createOrReplaceTempView("nation_v")
      s.sql(
        """SELECT a.n_name AS na, b.n_name AS nb,
          |pal_levenshtein(a.n_name, b.n_name) AS lev,
          |round(pal_jaro_winkler(a.n_name, b.n_name), 6) AS jw,
          |round(pal_ngram_sim(a.n_name, b.n_name), 6) AS tri
          |FROM nation_v a JOIN nation_v b ON a.n_nationkey < b.n_nationkey
          |ORDER BY na, nb""".stripMargin)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "u_tokenize_sql" ->
      """SELECT doc_id, len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_toks
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,
    "u_case_signature" ->
      """SELECT c_custkey, translate(regexp_replace(regexp_replace(regexp_replace(
        |regexp_replace(c_name, '[A-Z]+', 'U', 'g'), '[a-z]+', 'l', 'g'),
        |'[0-9]+', 'd', 'g'), '[^Uld]+', '-', 'g'), 'Uld', 'Aa0') AS sig
        |FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin
  )
}
