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
    // re-stemmed stems (stem -> pal_stem(stem)) — the second dump the
    // u_stem_invariants oracle joins so DuckDB can evaluate idempotence
    // without an offline stemmer of its own (VERDICT r2 next-round #4b)
    "u_stem_restem" -> ((s, d) => {
      withUdfs(s).read.parquet(s"$d/documents.parquet").createOrReplaceTempView("documents_v")
      s.sql(
        """SELECT stem, pal_stem(stem) AS restem FROM (
          |  SELECT DISTINCT pal_stem(term) AS stem
          |  FROM (SELECT explode(split(text, ' ')) AS term FROM documents_v)
          |  WHERE term <> '')
          |ORDER BY stem""".stripMargin)
    }),
    // structural invariants of the stemmer, computed LIVE from pal_stem
    // on the Spark side and recomputed in DuckDB purely from the
    // (term,stem) + (stem,restem) dumps: idempotence (stem∘stem = stem),
    // no-growth (|stem| <= |term|), first-char preservation (Porter only
    // rewrites suffixes). A mismatch means either a corrupted dump or a
    // nondeterministic/law-breaking stemmer — the structural oracle the
    // stemmer can have without a DuckDB Porter twin.
    "u_stem_invariants" -> ((s, d) => {
      withUdfs(s).read.parquet(s"$d/documents.parquet").createOrReplaceTempView("documents_v")
      s.sql(
        """SELECT count(*) AS n_terms,
          |  CAST(sum(CASE WHEN pal_stem(stem) = stem THEN 1 ELSE 0 END) AS BIGINT) AS n_idempotent,
          |  CAST(sum(CASE WHEN length(stem) <= length(term) THEN 1 ELSE 0 END) AS BIGINT) AS n_no_growth,
          |  CAST(sum(CASE WHEN substring(term, 1, 1) = substring(stem, 1, 1) THEN 1 ELSE 0 END) AS BIGINT) AS n_first_char
          |FROM (
          |  SELECT term, pal_stem(term) AS stem FROM (
          |    SELECT DISTINCT explode(split(text, ' ')) AS term FROM documents_v)
          |  WHERE term <> '')""".stripMargin)
    }),
    // date parsing across FORMATS (SURVEY.md §2 row 25): each distinct
    // order date rendered in 5 formats (ISO, European, US, month-name,
    // bare year), parsed by pal_date_parse back to ISO+exactness. The
    // DuckDB oracle computes the expected ISO instant from the source
    // date per format — a genuine cross-engine parse check.
    "u_date_parse" -> ((s, d) => {
      withUdfs(s).read.parquet(s"$d/orders.parquet").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT ds, fmt, pal_date_parse(ds) AS parsed FROM (
          |  SELECT fmt, CASE fmt
          |    WHEN 'iso' THEN date_format(dt, 'yyyy-MM-dd')
          |    WHEN 'eu'  THEN date_format(dt, 'd.M.yyyy')
          |    WHEN 'us'  THEN date_format(dt, 'M/d/yyyy')
          |    WHEN 'mon' THEN date_format(dt, 'MMMM yyyy')
          |    ELSE date_format(dt, 'yyyy') END AS ds
          |  FROM (SELECT DISTINCT o_orderdate AS dt FROM orders_v)
          |  LATERAL VIEW explode(array('iso', 'eu', 'us', 'mon', 'yr')) AS fmt)
          |GROUP BY ds, fmt, parsed
          |ORDER BY ds, fmt""".stripMargin)
    }),
    // regex taggers (SURVEY.md §2 rows 24/54): URL/date/smiley mention
    // detection + prioritized union, over deterministic synthesized text.
    // Outputs stringified (array_join) — the driver's pandas-based verify
    // harness cannot sort/hash ARRAY cells (r1 dump-err).
    "u_regex_taggers" -> ((s, d) => {
      withUdfs(s).read.parquet(s"$d/documents.parquet").createOrReplaceTempView("documents_v")
      s.sql(
        """SELECT doc_id,
          |  array_join(pal_tag_urls(txt), ' ; ') AS urls,
          |  array_join(pal_tag_dates(txt), ' ; ') AS dates,
          |  array_join(pal_tag_smileys(txt), ' ; ') AS smileys,
          |  array_join(pal_tag_all(txt), ' ; ') AS unioned
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
    // stemmer structural invariants recomputed in DuckDB from the vocab +
    // restem dumps (see the query's scaladoc): n_idempotent via the
    // (stem -> restem) join, no-growth and first-char directly from the
    // (term, stem) pairs — the live-pal_stem aggregate must agree
    "u_stem_invariants" ->
      """WITH v AS (SELECT term, stem FROM '__OUTDIR__/u_stem_vocab/*.parquet'),
        |r AS (SELECT stem, restem FROM '__OUTDIR__/u_stem_restem/*.parquet')
        |SELECT count(*) AS n_terms,
        |  CAST(sum(CASE WHEN r.restem = v.stem THEN 1 ELSE 0 END) AS BIGINT) AS n_idempotent,
        |  CAST(sum(CASE WHEN length(v.stem) <= length(v.term) THEN 1 ELSE 0 END) AS BIGINT) AS n_no_growth,
        |  CAST(sum(CASE WHEN substring(v.term, 1, 1) = substring(v.stem, 1, 1) THEN 1 ELSE 0 END) AS BIGINT) AS n_first_char
        |FROM v JOIN r USING (stem)""".stripMargin,
    // constructive oracle: the input text is synthesized per doc_id, so
    // DuckDB re-derives each expected mention (URL token, the known date,
    // the smiley) and the priority-ordered union analytically — an
    // independent derivation pinning the tagger + overlap-resolution
    // output exactly (the smiley lookaround pattern itself has no RE2
    // twin, but its expected matches on this fixture do)
    "u_regex_taggers" ->
      """SELECT doc_id,
        |  'https://kb.example.org/doc/' || doc_id AS urls,
        |  '2021-07-0' || CAST(1 + doc_id % 9 AS VARCHAR) AS dates,
        |  ':)' AS smileys,
        |  'URL:https://kb.example.org/doc/' || doc_id ||
        |    ' ; SMILEY::) ; DATE:2021-07-0' || CAST(1 + doc_id % 9 AS VARCHAR) AS unioned
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin,
    // DuckDB ships levenshtein + jaro_winkler_similarity natively, and
    // the trigram-set Jaccard is expressible with list ops — so the whole
    // similarity battery is cross-engine checked (r1 left it rows-only).
    "u_similarity" ->
      """WITH pairs AS (
        |  SELECT a.n_name AS na, b.n_name AS nb
        |  FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey),
        |g AS (
        |  SELECT na, nb,
        |    list_distinct(list_transform(generate_series(1, greatest(length(na) - 2, 0)),
        |      i -> substring(na, i, 3))) AS ga,
        |    list_distinct(list_transform(generate_series(1, greatest(length(nb) - 2, 0)),
        |      i -> substring(nb, i, 3))) AS gb
        |  FROM pairs)
        |SELECT na, nb,
        |  levenshtein(na, nb) AS lev,
        |  round(jaro_winkler_similarity(na, nb), 6) AS jw,
        |  round(CASE WHEN len(ga) = 0 AND len(gb) = 0 THEN 1.0
        |    ELSE len(list_distinct(list_intersect(ga, gb))) * 1.0 /
        |      len(list_distinct(list_concat(ga, gb))) END, 6) AS tri
        |FROM g ORDER BY na, nb""".stripMargin,
    "u_date_parse" ->
      """WITH dts AS (SELECT DISTINCT o_orderdate AS dt FROM orders),
        |rendered AS (
        |  SELECT fmt, CASE fmt
        |    WHEN 'iso' THEN strftime(dt, '%Y-%m-%d')
        |    WHEN 'eu'  THEN strftime(dt, '%-d.%-m.%Y')
        |    WHEN 'us'  THEN strftime(dt, '%-m/%-d/%Y')
        |    WHEN 'mon' THEN strftime(dt, '%B %Y')
        |    ELSE strftime(dt, '%Y') END AS ds,
        |  CASE fmt
        |    WHEN 'mon' THEN strftime(date_trunc('month', dt), '%Y-%m-%dT00:00:00Z') || '|MONTH'
        |    WHEN 'yr'  THEN strftime(date_trunc('year', dt), '%Y-%m-%dT00:00:00Z') || '|YEAR'
        |    ELSE strftime(dt, '%Y-%m-%dT00:00:00Z') || '|DAY' END AS parsed
        |  FROM dts, unnest(['iso', 'eu', 'us', 'mon', 'yr']) AS u(fmt))
        |SELECT DISTINCT ds, fmt, parsed FROM rendered ORDER BY ds, fmt""".stripMargin,
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
