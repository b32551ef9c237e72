package graft.text

import graft.core.{Num, QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the text half of a
  * large-scale training-data pipeline: token counting, quality scoring,
  * n-gram language-ID heuristic, and document fingerprinting (rolling hash +
  * SHA-256 content hash).
  *
  * Everything is built from codegen'd Catalyst expressions (`split`,
  * higher-order `transform`/`filter`/`aggregate`) — no UDFs, so the whole
  * stage stays inside WholeStageCodegen and scales as a pure narrow map over
  * document partitions (zero shuffles).
  */
object TextAnalysis {

  /** Tokens = single-space split (the corpus is space-joined words; the same
    * split is used on the DuckDB side, keeping token arity oracle-exact).
    */
  private val toks = "split(text, ' ')"
  private val toksSql = "string_split(text, ' ')"

  private val stopwords = Seq("the", "a", "and", "of", "to", "in", "is")
  private val stopArr = stopwords.map(w => s"'$w'").mkString("array(", ", ", ")")
  private val stopList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** THE quality-score formula (length adequacy + lexical diversity +
    * stopword plausibility, fixed weights) over a token-array expression —
    * one definition per engine, shared by `doc_quality_score` and the
    * filter funnel so the funnel's threshold provably applies the same
    * bit-stable value the score query emits.
    */
  private[text] def qualitySql(t: String) =
    s"""0.4 * least(1.0, CAST(len($t) AS DOUBLE) / 100.0)
       |  + 0.3 * (CAST(len(list_distinct($t)) AS DOUBLE) / CAST(len($t) AS DOUBLE))
       |  + 0.3 * least(1.0,
       |      (CAST(len(list_filter($t, x -> list_contains($stopList, x))) AS DOUBLE)
       |        / CAST(len($t) AS DOUBLE)) * 5.0)""".stripMargin

  private[text] def qualitySpark(t: String) =
    s"""0.4D * least(1.0D, CAST(size($t) AS DOUBLE) / 100.0D)
       | + 0.3D * (CAST(size(array_distinct($t)) AS DOUBLE) / CAST(size($t) AS DOUBLE))
       | + 0.3D * least(1.0D,
       |     (CAST(size(filter($t, x -> array_contains($stopArr, x))) AS DOUBLE)
       |       / CAST(size($t) AS DOUBLE)) * 5.0D)""".stripMargin

  /** Token counting + quality-score signals: length, token count, distinct
    * tokens, type/token ratio, stopword ratio, average token length.
    */
  val textStats: QueryDef = QueryDef(
    "text_stats",
    s"""SELECT doc_id,
       |  CAST(length(text) AS INTEGER) AS n_chars,
       |  CAST(len($toksSql) AS INTEGER) AS n_tokens,
       |  CAST(len(list_distinct($toksSql)) AS INTEGER) AS n_distinct_tokens,
       |  CAST(len(list_distinct($toksSql)) AS DOUBLE) / CAST(len($toksSql) AS DOUBLE) AS type_token_ratio,
       |  CAST(len(list_filter($toksSql, t -> list_contains($stopList, t))) AS DOUBLE)
       |    / CAST(len($toksSql) AS DOUBLE) AS stopword_ratio,
       |  CAST(length(text) - (len($toksSql) - 1) AS DOUBLE)
       |    / CAST(len($toksSql) AS DOUBLE) AS avg_token_len
       |FROM documents""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir).selectExpr(
      "doc_id",
      "length(text) AS n_chars",
      s"size($toks) AS n_tokens",
      s"size(array_distinct($toks)) AS n_distinct_tokens",
      s"CAST(size(array_distinct($toks)) AS DOUBLE) / CAST(size($toks) AS DOUBLE) AS type_token_ratio",
      s"CAST(size(filter($toks, t -> array_contains($stopArr, t))) AS DOUBLE) / CAST(size($toks) AS DOUBLE) AS stopword_ratio",
      s"CAST(length(text) - (size($toks) - 1) AS DOUBLE) / CAST(size($toks) AS DOUBLE) AS avg_token_len")
  }

  /** Language-ID heuristic: count stopword hits per language profile, pick the
    * max with a deterministic alphabetical tiebreak (`greatest` + first-match
    * CASE, identical in both engines). A real corpus would use char-n-gram
    * profiles; the mechanism (profile scores -> argmax, pure narrow map) is
    * identical.
    */
  val langGuess: QueryDef = {
    val profiles: Seq[(String, Seq[String])] = Seq(
      "de" -> Seq("der", "die", "und", "nicht", "das"),
      "en" -> Seq("the", "a", "and", "is", "of"),
      "es" -> Seq("el", "la", "los", "que", "de"),
      "fr" -> Seq("le", "la", "et", "les", "des"),
      "zh" -> Seq("shi", "de", "le", "bu", "wo"))
    def scoreSpark(words: Seq[String]) = {
      val arr = words.map(w => s"'$w'").mkString("array(", ", ", ")")
      s"size(filter(split(text, ' '), t -> array_contains($arr, t)))"
    }
    def scoreSql(words: Seq[String]) = {
      val l = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"CAST(len(list_filter(string_split(text, ' '), t -> list_contains($l, t))) AS INTEGER)"
    }
    val langs = profiles.map(_._1)
    val caseExpr =
      "CASE " + langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ") + " END"
    QueryDef(
      "lang_guess",
      s"""WITH scored AS (
         |  SELECT doc_id, lang AS lang_actual,
         |    ${profiles.map { case (l, ws) => s"${scoreSql(ws)} AS s_$l" }.mkString(",\n    ")}
         |  FROM documents),
         |m AS (SELECT *, greatest(${langs.map("s_" + _).mkString(", ")}) AS m FROM scored)
         |SELECT doc_id, lang_actual,
         |  $caseExpr AS lang_guess,
         |  ${langs.map(l => s"s_$l").mkString(", ")}
         |FROM m""".stripMargin) { (spark, dir) =>
      val scored = Tables.documents(spark, dir).selectExpr(
        Seq("doc_id", "lang AS lang_actual") ++
          profiles.map { case (l, ws) => s"${scoreSpark(ws)} AS s_$l" }: _*)
      scored
        .withColumn("m", greatest(langs.map(l => col(s"s_$l")): _*))
        .selectExpr(
          Seq("doc_id", "lang_actual", s"$caseExpr AS lang_guess") ++
            langs.map(l => s"s_$l"): _*)
    }
  }

  /** Document fingerprinting: (a) a polynomial rolling hash over character
    * codes folded with exact modular integer arithmetic (bit-identical in any
    * engine — the hash constants are public math, not engine internals),
    * computed by the codegen'd [[graft.functions.PolyHash]] expression (a
    * tight per-string loop; the composable
    * `aggregate(transform(sequence(...)))` form allocates an index array and
    * an interpreted lambda call per character), and (b) SHA-256 of the
    * content (Spark `sha2` == DuckDB `sha256`, both lowercase hex).
    */
  val textFingerprint: QueryDef = QueryDef(
    "text_fingerprint",
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(text) + 1),
      |                     i -> CAST(unicode(text[i]) AS BIGINT))),
      |    (h, c) -> (h * 31 + c) % 1000000007) AS poly_hash,
      |  sha256(text) AS sha_hex
      |FROM documents""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir).select(
      col("doc_id"),
      graft.functions.PolyHash.polyHash(col("text")).as("poly_hash"),
      sha2(col("text"), 256).as("sha_hex"))
  }

  /** BPE-ish regex tokenization: letter runs / digit runs / single symbols —
    * the pre-tokenizer shape BPE vocabularies are trained over (whitespace
    * handled by exclusion). Identical regex in both engines (basic character
    * classes only, portable between Java regex and RE2).
    */
  val textTokensRegex: QueryDef = {
    val pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    QueryDef(
      "text_tokens_regex",
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(lower(text), '$pat')) AS INTEGER) AS n_tokens,
         |  CAST(len(list_filter(regexp_extract_all(lower(text), '$pat'),
         |       t -> regexp_matches(t, '^[a-z]+$$'))) AS INTEGER) AS n_word,
         |  CAST(len(list_filter(regexp_extract_all(lower(text), '$pat'),
         |       t -> regexp_matches(t, '^[0-9]+$$'))) AS INTEGER) AS n_num,
         |  CAST(len(list_filter(regexp_extract_all(lower(text), '$pat'),
         |       t -> NOT regexp_matches(t, '^[a-z0-9]+$$'))) AS INTEGER) AS n_punct,
         |  CAST(len(list_filter(regexp_extract_all(lower(text), '$pat'),
         |       t -> NOT regexp_matches(t, '^[a-z0-9]+$$'))) AS DOUBLE)
         |    / CAST(len(regexp_extract_all(lower(text), '$pat')) AS INTEGER) AS punct_ratio
         |FROM documents
         |WHERE len(regexp_extract_all(lower(text), '$pat')) > 0""".stripMargin) { (spark, dir) =>
      Tables.documents(spark, dir)
        .selectExpr(
          "doc_id",
          s"regexp_extract_all(lower(text), '$pat', 0) AS toks")
        .filter(size(col("toks")) > 0)
        .selectExpr(
          "doc_id",
          "size(toks) AS n_tokens",
          "size(filter(toks, t -> t RLIKE '^[a-z]+$')) AS n_word",
          "size(filter(toks, t -> t RLIKE '^[0-9]+$')) AS n_num",
          "size(filter(toks, t -> NOT (t RLIKE '^[a-z0-9]+$'))) AS n_punct",
          "CAST(size(filter(toks, t -> NOT (t RLIKE '^[a-z0-9]+$'))) AS DOUBLE) / size(toks) AS punct_ratio")
    }
  }

  /** Character-trigram language-ID (the classic n-gram profile method):
    * trigram set of the document vs a static per-language trigram profile,
    * overlap ratio as the score, argmax with deterministic tiebreak.
    */
  val langNgram: QueryDef = {
    val profiles: Seq[(String, Seq[String])] = Seq(
      "de" -> Seq("der", "ie ", "und", "ein", "sch", "ich"),
      "en" -> Seq("the", "he ", "ing", "and", "ion", " th"),
      "es" -> Seq("de ", "os ", "la ", "que", "ión", "ent"),
      "fr" -> Seq("es ", "le ", "de ", "ent", "ou ", "une"),
      "zh" -> Seq("shi", "de ", "le ", "zh ", "ng ", "wo "))
    val langs = profiles.map(_._1)
    def esc(w: String) = w.replace("'", "''")
    // |trigrams(text) ∩ profile| == the number of profile trigrams the text
    // contains — membership tests replace materializing the trigram set
    // (30 codegen'd `contains` calls per row vs an interpreted per-position
    // array build).
    def scoreSpark(ws: Seq[String]) =
      ws.map(w => s"(CASE WHEN contains(text, '${esc(w)}') THEN 1 ELSE 0 END)").mkString(" + ")
    def scoreSql(ws: Seq[String]) =
      ws.map(w => s"(CASE WHEN strpos(text, '${esc(w)}') > 0 THEN 1 ELSE 0 END)").mkString(" + ")
    val caseExpr = "CASE " + langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ") + " END"
    QueryDef(
      "lang_ngram",
      s"""WITH scored AS (
         |  SELECT doc_id, lang AS lang_actual,
         |    ${profiles.map { case (l, ws) => s"CAST(${scoreSql(ws)} AS INTEGER) AS s_$l" }
                .mkString(",\n    ")}
         |  FROM documents),
         |m AS (SELECT *, greatest(${langs.map("s_" + _).mkString(", ")}) AS m FROM scored)
         |SELECT doc_id, lang_actual, $caseExpr AS lang_guess,
         |  ${langs.map(l => s"s_$l").mkString(", ")}
         |FROM m""".stripMargin) { (spark, dir) =>
      val scored = Tables.documents(spark, dir).selectExpr(
        Seq("doc_id", "lang AS lang_actual") ++
          profiles.map { case (l, ws) => s"CAST(${scoreSpark(ws)} AS INT) AS s_$l" }: _*)
      scored
        .withColumn("m", greatest(langs.map(l => col(s"s_$l")): _*))
        .selectExpr(
          Seq("doc_id", "lang_actual", s"$caseExpr AS lang_guess") ++
            langs.map(l => s"s_$l"): _*)
    }
  }

  /** Composite document quality score — the filter signal a training-data
    * pipeline thresholds on: length adequacy, lexical diversity, stopword
    * plausibility, combined with fixed weights. Every term derives from
    * exact integer counts in a fixed-order double expression (bit-stable).
    */
  val docQualityScore: QueryDef = QueryDef(
    "doc_quality_score",
    s"""SELECT doc_id,
       |  ${qualitySql(toksSql)} AS quality_score
       |FROM documents
       |WHERE len($toksSql) > 0""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .selectExpr("doc_id", s"$toks AS t")
      .filter(size(col("t")) > 0)
      .selectExpr("doc_id", s"${qualitySpark("t")} AS quality_score")
  }

  /** The corpus filter funnel — the keep/drop accounting every training-data
    * pipeline reports: each document lands in its FIRST failing filter
    * (exact-dup non-survivor → too-short → low-quality) or `kept`, with doc
    * and token totals per bucket. One window (exact-dup survivor) + one
    * aggregate; the quality threshold reuses the bit-stable score formula of
    * `doc_quality_score`, so the double comparison is cross-engine exact.
    */
  val corpusFilterFunnel: QueryDef = {
    QueryDef(
      "corpus_filter_funnel",
      s"""WITH d AS (
         |  SELECT doc_id, $toksSql AS t,
         |         min(doc_id) OVER (PARTITION BY text) AS keep_id
         |  FROM documents),
         |r AS (
         |  SELECT t,
         |    CASE WHEN doc_id <> keep_id THEN 'dup'
         |         WHEN len(t) < 10 THEN 'too_short'
         |         WHEN ${qualitySql("t")} < 0.5 THEN 'low_quality'
         |         ELSE 'kept' END AS reason
         |  FROM d)
         |SELECT reason,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(len(t)) AS BIGINT) AS n_tokens
         |FROM r GROUP BY 1""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("text"))
      Tables.documents(spark, dir)
        .withColumn("keep_id", min(col("doc_id")).over(w))
        .selectExpr("doc_id", "keep_id", s"$toks AS t")
        .selectExpr(
          "t",
          s"""CASE WHEN doc_id <> keep_id THEN 'dup'
             |     WHEN size(t) < 10 THEN 'too_short'
             |     WHEN ${qualitySpark("t")} < 0.5D THEN 'low_quality'
             |     ELSE 'kept' END AS reason""".stripMargin)
        .groupBy(col("reason"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(col("t")).cast("long")).as("n_tokens"))
    }
  }

  /** Text normalization — the cleaning stage before dedup/tokenization:
    * lowercase, digit-masking, whitespace collapse, trim. (DuckDB's
    * regexp_replace needs the explicit 'g' flag for replace-all; Spark
    * replaces globally by default.)
    */
  val textNormalize: QueryDef = QueryDef(
    "text_normalize",
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '#', 'g'),
      |                      ' +', ' ', 'g')) AS norm_text,
      |  CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '#', 'g'),
      |                                  ' +', ' ', 'g'))) AS INTEGER) AS norm_len
      |FROM documents""".stripMargin) { (spark, dir) =>
    val norm = trim(regexp_replace(regexp_replace(lower(col("text")), "[0-9]+", "#"), " +", " "))
    Tables.documents(spark, dir)
      .select(col("doc_id"), norm.as("norm_text"), length(norm).as("norm_len"))
  }

  /** Deterministic train/val/test split (80/10/10) keyed on a multiplicative
    * hash of doc_id — the split a training-data pipeline must be able to
    * reproduce byte-for-byte on any engine, any partitioning, any rerun
    * (random()-based splits can't be audited or resumed). Per-split counts
    * plus an order-free membership checksum oracle-check the *assignment*,
    * not just the sizes.
    */
  val datasetSplit: QueryDef = QueryDef(
    "dataset_split",
    s"""SELECT CASE WHEN h < 3435973837 THEN 'train'
      |            WHEN h < 3865470566 THEN 'val'
      |            ELSE 'test' END AS split,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
      |FROM (SELECT doc_id, ${Num.sqlSplitHash("doc_id")} AS h FROM documents)
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    val h = Num.splitHash(col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("h", h)
      .withColumn("split",
        when(col("h") < lit(3435973837L), "train") // floor(0.8 * 2^32)
          .when(col("h") < lit(3865470566L), "val") // floor(0.9 * 2^32)
          .otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_checksum"))
  }

  /** Single-scan profile of the documents table (the text-side counterpart
    * of `profile_lineitem`): row counts, distinct sources/langs, token and
    * length extremes, null accounting — the first query run against any new
    * corpus drop.
    */
  val profileDocuments: QueryDef = QueryDef(
    "profile_documents",
    s"""SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(text) AS BIGINT) AS text_nonnull,
       |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       |  CAST(min(doc_id) AS BIGINT) AS doc_id_min,
       |  CAST(max(doc_id) AS BIGINT) AS doc_id_max,
       |  CAST(SUM(coalesce(len($toksSql), 0)) AS BIGINT) AS total_tokens,
       |  CAST(min(length(text)) AS INTEGER) AS min_chars,
       |  CAST(max(length(text)) AS INTEGER) AS max_chars
       |FROM documents""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir).agg(
      count(lit(1)).as("n_docs"),
      count(col("text")).as("text_nonnull"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      min(col("doc_id")).as("doc_id_min"),
      max(col("doc_id")).as("doc_id_max"),
      sum(coalesce(size(split(col("text"), " ")).cast("long"), lit(0L))).as("total_tokens"),
      min(length(col("text"))).as("min_chars"),
      max(length(col("text"))).as("max_chars"))
  }

  /** PII redaction — the scrubbing stage a training-data pipeline runs before
    * anything else: detect + mask emails, phone numbers, and IPv4 addresses.
    * The synthetic corpus carries no PII, so the query first splices
    * deterministic doc_id-derived PII spans into a derived column (same
    * expression in both engines) and then redacts them — the detector runs
    * against realistic, varied positives instead of vacuous zeros.
    *
    * The patterns use only portable regex constructs (character classes,
    * bounded repeats; `[.]` instead of an escaped dot) so Java regex (Spark)
    * and RE2 (DuckDB) agree byte-for-byte. Row-local, zero shuffles.
    */
  val piiRedact: QueryDef = {
    val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
    val phonePat = "[0-9]{3}[ -][0-9]{3}-[0-9]{4}"
    val ipPat = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
    // single line: embedding a multi-line fragment whose lines start with
    // '||' into an outer stripMargin template would re-strip them to '|'
    def enrich(cast: String) =
      s"text || CASE WHEN doc_id % 2 = 0 THEN ' contact user' || CAST(doc_id AS $cast)" +
        s" || '@example.com' ELSE '' END" +
        s" || CASE WHEN doc_id % 3 = 0 THEN ' call 202 555-'" +
        s" || lpad(CAST(doc_id % 10000 AS $cast), 4, '0') ELSE '' END" +
        s" || CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS $cast)" +
        s" || '.' || CAST(doc_id % 250 AS $cast) ELSE '' END"
    QueryDef(
      "pii_redact",
      s"""WITH e AS (SELECT doc_id, ${enrich("VARCHAR")} AS x FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(x, '$emailPat')) AS INTEGER) AS n_emails,
         |  CAST(len(regexp_extract_all(x, '$phonePat')) AS INTEGER) AS n_phones,
         |  CAST(len(regexp_extract_all(
         |    regexp_replace(x, '$emailPat', '<EMAIL>', 'g'), '$ipPat')) AS INTEGER) AS n_ips,
         |  regexp_replace(regexp_replace(regexp_replace(x,
         |    '$emailPat', '<EMAIL>', 'g'),
         |    '$phonePat', '<PHONE>', 'g'),
         |    '$ipPat', '<IP>', 'g') AS redacted
         |FROM e""".stripMargin) { (spark, dir) =>
      Tables.documents(spark, dir)
        .selectExpr("doc_id", s"${enrich("STRING")} AS x")
        .selectExpr(
          "doc_id",
          s"CAST(size(regexp_extract_all(x, '$emailPat', 0)) AS INT) AS n_emails",
          s"CAST(size(regexp_extract_all(x, '$phonePat', 0)) AS INT) AS n_phones",
          // IP count runs on the email-redacted form: the email local/domain
          // parts can contain digit.digit runs that would double-count
          s"""CAST(size(regexp_extract_all(
             |  regexp_replace(x, '$emailPat', '<EMAIL>'), '$ipPat', 0)) AS INT) AS n_ips""".stripMargin,
          s"""regexp_replace(regexp_replace(regexp_replace(x,
             |  '$emailPat', '<EMAIL>'),
             |  '$phonePat', '<PHONE>'),
             |  '$ipPat', '<IP>') AS redacted""".stripMargin)
    }
  }

  /** Overlapping token-window chunking (windows of 64, stride 48 — 16-token
    * overlap): the RAG/embedding preprocessing step that turns documents into
    * model-sized passages. One generator (`posexplode` of the stride
    * positions) per row — narrow, shuffle-free, and the chunk count per doc
    * is `ceil(n/stride)` regardless of corpus size.
    */
  val docChunks: QueryDef = {
    val win = 64
    val stride = 48
    QueryDef(
      "doc_chunks",
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS t, len($toksSql) AS n
         |  FROM documents WHERE len($toksSql) > 0)
         |SELECT doc_id,
         |  CAST(n AS INTEGER) AS n_tokens,
         |  CAST(s // $stride AS INTEGER) AS chunk_idx,
         |  CAST(s AS INTEGER) AS start_tok,
         |  CAST(least($win, n - s) AS INTEGER) AS chunk_tokens,
         |  array_to_string(list_slice(t, s + 1, s + least($win, n - s)), ' ') AS chunk_text
         |FROM (SELECT doc_id, t, n, unnest(range(0, n, $stride)) AS s FROM t)""".stripMargin) {
      (spark, dir) =>
        Tables.documents(spark, dir)
          .selectExpr("doc_id", s"$toks AS t")
          .filter(size(col("t")) > 0)
          .selectExpr(
            "doc_id", "t", "size(t) AS n",
            s"posexplode(sequence(0, size(t) - 1, $stride)) AS (chunk_idx, start_tok)")
          .selectExpr(
            "doc_id",
            "CAST(n AS INT) AS n_tokens",
            "CAST(chunk_idx AS INT) AS chunk_idx",
            "CAST(start_tok AS INT) AS start_tok",
            s"CAST(least($win, n - start_tok) AS INT) AS chunk_tokens",
            s"array_join(slice(t, start_tok + 1, least($win, n - start_tok)), ' ') AS chunk_text")
    }
  }

  /** Per-group quantile gating — "keep only documents above their
    * language's 75th size percentile", the relative-threshold cousin of the
    * fixed-threshold funnel. The thresholds are one tiny row per group
    * (exact interpolated percentile over the BIGINT size column — the same
    * arithmetic in both engines, cf. `agg_percentiles`), broadcast back and
    * compared row-locally: no window over the corpus, no second shuffle of
    * the big side. Strictly-above keeps the predicate unambiguous at the
    * interpolated boundary.
    */
  val qualityQuantileFilter: QueryDef = QueryDef(
    "quality_quantile_filter",
    """WITH th AS (
      |  SELECT lang, quantile_cont(n_chars, 0.75) AS p75
      |  FROM documents GROUP BY lang)
      |SELECT d.lang, th.p75,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(*) FILTER (WHERE d.n_chars > th.p75) AS BIGINT) AS n_kept
      |FROM documents d JOIN th ON th.lang = d.lang
      |GROUP BY d.lang, th.p75""".stripMargin) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val th = docs.groupBy(col("lang"))
      .agg(expr("percentile(n_chars, 0.75D)").as("p75"))
    docs.join(broadcast(th), "lang")
      .groupBy(col("lang"), col("p75"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_chars") > col("p75"), 1L).otherwise(0L)).as("n_kept"))
  }

  /** Edit distance between consecutive documents' normalized 32-char
    * prefixes — the fuzzy-match primitive (title reconciliation, OCR-noise
    * pairing) over an already-candidate-paired stream. Levenshtein is
    * O(len²) per pair, which is exactly why the engine only ever runs it on
    * CANDIDATE pairs (here the consecutive-id join; in the dedup family the
    * LSH bucket join) — never all-pairs. The prefix is lowercased and
    * stripped to `[a-z ]` so both engines compare identical ASCII, and
    * capped at 32 chars to bound the DP table.
    */
  val levenshteinConsecutive: QueryDef = QueryDef(
    "levenshtein_consecutive",
    """WITH p AS (
      |  SELECT doc_id,
      |         substring(regexp_replace(lower(text), '[^a-z ]', '', 'g'), 1, 32) AS pfx
      |  FROM documents)
      |SELECT a.doc_id AS doc_id, b.doc_id AS next_doc_id,
      |  CAST(levenshtein(a.pfx, b.pfx) AS INTEGER) AS lev,
      |  1.0 - CAST(levenshtein(a.pfx, b.pfx) AS DOUBLE)
      |      / CAST(greatest(length(a.pfx), length(b.pfx), 1) AS DOUBLE) AS sim
      |FROM p a JOIN p b ON b.doc_id = a.doc_id + 1""".stripMargin) { (spark, dir) =>
    val p = Tables.documents(spark, dir)
      .selectExpr("doc_id",
        "substring(regexp_replace(lower(text), '[^a-z ]', ''), 1, 32) AS pfx")
    val a = p.select(col("doc_id"), col("pfx").as("pa"))
    val b = p.select(col("doc_id").as("next_doc_id"), col("pfx").as("pb"))
    a.join(b, col("next_doc_id") === col("doc_id") + 1)
      .select(
        col("doc_id"), col("next_doc_id"),
        levenshtein(col("pa"), col("pb")).cast("int").as("lev"),
        (lit(1.0) - levenshtein(col("pa"), col("pb")).cast("double") /
          greatest(length(col("pa")), length(col("pb")), lit(1)).cast("double")).as("sim"))
  }

  val all: Seq[QueryDef] = Seq(
    textStats, langGuess, textFingerprint, textTokensRegex, langNgram,
    docQualityScore, corpusFilterFunnel, textNormalize, datasetSplit,
    profileDocuments, piiRedact, docChunks, qualityQuantileFilter,
    levenshteinConsecutive)
}
