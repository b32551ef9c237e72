package graft.text

import graft.core.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Language-model-adjacent corpus structures: the inverted index (search /
  * retrieval over the training corpus), bigram statistics with add-one
  * smoothing (the classic count-based LM and the basis of corpus-quality
  * perplexity filters), and fixed-length sliding token windows (the
  * next-token-prediction example generator that complements
  * [[Corpus]]'s concat-and-chunk `pack_sequences`).
  *
  * Everything row-local is a codegen'd higher-order-function expression
  * (`transform`/`sequence`/`slice` over the token array) — no UDFs; the only
  * shuffles are the term- or bigram-keyed aggregates, which all benefit from
  * map-side partial aggregation because their key spaces (vocabulary,
  * vocabulary²-observed) are tiny relative to token occurrences.
  */
object LanguageModel {

  /** Inverted index over the corpus: for each term, its document frequency
    * and the first 10 postings (doc_ids ascending — the deterministic
    * prefix; a real index would keep the full sorted list per term, sharded
    * by term). Gate output is the 20 highest-df terms.
    *
    * Scale shape: one shuffle keyed by term. `array_distinct` before the
    * explode makes the shuffled row count one per (doc, distinct term) —
    * df aggregation never sees repeated in-doc occurrences. The posting-list
    * `collect_list` is the one non-partial aggregate; capping the emitted
    * prefix bounds the output row width, and at 100 TB the same plan holds
    * because postings are grouped per term across the cluster (the worst
    * case is a stopword term's full posting list in one task — the standard
    * mitigation, also used here, is to only materialize a bounded prefix or
    * to range-shard hot terms). The posting prefix crosses the gate as a CSV
    * string (the `array_agg_sorted` pattern — the harness can't sort raw
    * array cells).
    */
  val invertedIndex: QueryDef = QueryDef(
    "inverted_index",
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
      |  FROM documents)
      |SELECT term,
      |  CAST(count(*) AS BIGINT) AS df,
      |  array_to_string((list_sort(list(doc_id)))[1:10], ',') AS postings_csv
      |FROM toks
      |GROUP BY term
      |ORDER BY df DESC, term
      |LIMIT 20""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("term"))
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        array_join(transform(slice(sort_array(collect_list(col("doc_id"))), 1, 10),
          _.cast("string")), ",").as("postings_csv"))
      .orderBy(col("df").desc, col("term"))
      .limit(20)
  }

  /** Bigram language model with add-one smoothing: the 20 most frequent
    * bigrams with their raw count, context count (occurrences of w1 as a
    * bigram head), vocabulary size, and the smoothed conditional probability
    * `p = (c + 1) / (ctx + V)`.
    *
    * The context counts are derived FROM the bigram table (a second
    * aggregate over vocabulary²-observed rows, broadcast back) — not from a
    * second corpus scan; the vocabulary size is one distinct-count over
    * exploded tokens. All counts are exact integers, and the probability is
    * a single integer-ratio division, so the result is bit-stable under any
    * partitioning. At 100 TB: bigram extraction is row-local; both
    * aggregates are map-side combined (bigram key space saturates at the
    * observed-vocabulary², orders of magnitude below token occurrences).
    */
  /** Shared bigram-model building blocks — `bigram_lm` states the model,
    * `doc_lm_score` applies it, and sharing ONE definition per engine (the
    * CTE chain, the positioned bigram stream, the smoothing formula) is what
    * keeps the two queries provably in lockstep: an edit to tokenization or
    * the smoothing constant reaches both or neither.
    */
  private val modelSqlCtes =
    """t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |bg AS (
      |  SELECT doc_id, CAST(i AS INTEGER) AS pos, tk[i] AS w1, tk[i + 1] AS w2
      |  FROM t, UNNEST(range(1, len(tk))) AS u(i)),
      |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY 1, 2),
      |ctx AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS ctx_n FROM c2 GROUP BY 1),
      |v AS (
      |  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vocab
      |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents))""".stripMargin

  private val smoothedSql = "CAST(c2.n + 1 AS DOUBLE) / CAST(ctx.ctx_n + v.vocab AS DOUBLE)"

  /** (doc_id, pos, w1, w2) positioned bigram stream (row-local expansion). */
  private def bigramsWithPos(spark: org.apache.spark.sql.SparkSession, dir: String) =
    bigramsOf(Tables.documents(spark, dir))

  private def bigramsOf(docs: org.apache.spark.sql.DataFrame) =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 2) // sequence(1, 0, 1) is an error in Spark
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(tk) - 1, 1),
          |  i -> struct(CAST(i AS INT) AS pos,
          |              element_at(tk, i) AS w1,
          |              element_at(tk, i + 1) AS w2))""".stripMargin)).as("b"))
      .select(col("doc_id"), col("b.pos"), col("b.w1"), col("b.w2"))

  private def vocabOf(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(countDistinct(col("tok")).as("vocab"))

  /** The whole-corpus bigram model — the (w1, w2, n) count table and the
    * 1-row vocabulary size — materialized ONCE per (session, corpus) and
    * shared by every consumer (`bigram_lm`, `doc_lm_score`,
    * `lm_score_histogram`): the model is trained once, then fanned out to
    * statement/scoring/reporting, exactly as a production LM-filter stage
    * would run. Both tables are model-sized (observed-vocabulary² and 1
    * row), so the pin is cheap; the saving is the model-building corpus
    * scan per consumer.
    */
  private def pinnedModel(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    graft.core.Pinned.value(spark, dir, "bigram_model") {
      val c2 = bigramsWithPos(spark, dir)
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val v = vocabOf(spark, dir).localCheckpoint()
      (c2, v)
    }

  private val smoothedP =
    ((col("n") + lit(1)).cast("double") / (col("ctx_n") + col("vocab")).cast("double"))

  val bigramLm: QueryDef = QueryDef(
    "bigram_lm",
    s"""WITH $modelSqlCtes
       |SELECT c2.w1, c2.w2, c2.n, ctx.ctx_n, v.vocab,
       |  $smoothedSql AS p_smoothed
       |FROM c2 JOIN ctx ON ctx.w1 = c2.w1 CROSS JOIN v
       |ORDER BY c2.n DESC, c2.w1, c2.w2
       |LIMIT 20""".stripMargin) { (spark, dir) =>
    // the pinned count table feeds both the context rollup and the output
    // join — the corpus bigram extraction ran once, shared with the
    // scoring/reporting consumers
    val (bigrams, vocab) = pinnedModel(spark, dir)
    val contexts = bigrams.groupBy(col("w1")).agg(sum(col("n")).as("ctx_n"))
    bigrams
      .join(broadcast(contexts), "w1")
      .crossJoin(broadcast(vocab))
      .select(
        col("w1"), col("w2"), col("n"), col("ctx_n"), col("vocab"),
        smoothedP.as("p_smoothed"))
      .orderBy(col("n").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** Sliding-window next-token training examples: length-8 input windows at
    * stride 4, each labeled with the following token. Documents shorter than
    * 9 tokens yield no examples. Pure row-local expansion (`sequence` +
    * `slice` inside one codegen'd projection — zero shuffles, embarrassingly
    * parallel at any corpus size); contrast with `pack_sequences`, which
    * needs cross-document offsets. The windows-per-document ratio is
    * (len-8)/4, so output volume scales linearly with corpus tokens. The
    * window itself crosses the gate space-joined (tokens are space-split, so
    * the join is lossless and round-trippable).
    */
  val slidingTokenWindows: QueryDef = QueryDef(
    "sliding_token_windows",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
      |SELECT doc_id,
      |  CAST(s AS BIGINT) AS win_start,
      |  array_to_string(tk[s:s + 7], ' ') AS input_text,
      |  tk[s + 8] AS target_token
      |FROM t, UNNEST(range(1, len(tk) - 7, 4)) AS u(s)
      |WHERE len(tk) >= 9""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 9)
      .select(
        col("doc_id"),
        explode(expr(
          """transform(sequence(1, size(tk) - 8, 4),
            |  s -> struct(CAST(s AS BIGINT) AS win_start,
            |              array_join(slice(tk, s, 8), ' ') AS input_text,
            |              element_at(tk, s + 8) AS target_token))""".stripMargin)).as("w"))
      .select(col("doc_id"), col("w.win_start"), col("w.input_text"), col("w.target_token"))
  }

  /** The hashing trick: every token mapped into a fixed 256-bucket feature
    * space via the portable polynomial hash, with per-document bucket
    * counts — the fixed-width sparse featurization (CountVectorizer without
    * a vocabulary pass) that keeps feature extraction single-pass at any
    * corpus size. ZERO shuffles: the histogram is built row-locally with
    * higher-order functions over the token array (O(distinct·tokens) per
    * row, bounded by the 256-bucket space), so the stage is a pure codegen'd
    * map — the scale ceiling is I/O, not the operator. The oracle replays
    * the identical hash fold per token in SQL, proving the featurization
    * engine-independent (same property that makes train/serve skew
    * impossible for this featurizer). The sparse vector crosses the gate as
    * two parallel CSV strings (sorted buckets; counts in bucket order).
    */
  val featureHashing: QueryDef = QueryDef(
    "feature_hashing",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |h AS (
      |  SELECT doc_id,
      |    list_transform(tk, t -> CAST(list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_transform(range(1, length(t) + 1), i -> CAST(unicode(t[i]) AS BIGINT))),
      |      (h, c) -> (h * 31 + c) % 1000000007) % 256 AS INTEGER)) AS bs
      |  FROM t)
      |SELECT doc_id,
      |  CAST(len(list_distinct(bs)) AS INTEGER) AS n_features,
      |  array_to_string(list_sort(list_distinct(bs)), ',') AS buckets_csv,
      |  array_to_string(list_transform(list_sort(list_distinct(bs)),
      |                  b -> CAST(len(list_filter(bs, x -> x = b)) AS BIGINT)), ',') AS counts_csv
      |FROM h""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .selectExpr(
        "doc_id",
        "transform(tk, t -> CAST(poly_hash(t) % 256 AS INT)) AS bs")
      .selectExpr(
        "doc_id",
        "CAST(size(array_distinct(bs)) AS INT) AS n_features",
        "array_join(transform(array_sort(array_distinct(bs)), x -> CAST(x AS STRING)), ',') AS buckets_csv",
        """array_join(transform(array_sort(array_distinct(bs)),
          |  b -> CAST(size(filter(bs, x -> x = b)) AS STRING)), ',') AS counts_csv""".stripMargin)
  }

  /** LM-based document scoring: every document's mean smoothed bigram
    * probability under the corpus-trained bigram model — the count-based
    * stand-in for perplexity filtering (log-space perplexity is libm-defined
    * and NOT bit-stable across engines; the probability mean is). Summation
    * order is pinned by folding each document's probabilities in bigram
    * POSITION order inside a row-local `aggregate` (an unordered SUM of
    * doubles would be partitioning-dependent), so the score is
    * deterministic under any cluster layout. Two aggregate shuffles build
    * the model from the same bigram stream being scored (no second corpus
    * scan per model table); the scoring join is (w1, w2)-keyed and the
    * final rollup doc-keyed. Self-scoring here; scoring corpus B under
    * model A is the same plan with two inputs.
    */
  val docLmScore: QueryDef = QueryDef(
    "doc_lm_score",
    s"""WITH $modelSqlCtes,
       |scored AS (
       |  SELECT bg.doc_id, bg.pos,
       |    $smoothedSql AS p
       |  FROM bg JOIN c2 ON c2.w1 = bg.w1 AND c2.w2 = bg.w2
       |          JOIN ctx ON ctx.w1 = bg.w1 CROSS JOIN v)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_bigrams,
       |  list_reduce(list(p ORDER BY pos), (a, x) -> a + x) / count(*) AS mean_p
       |FROM scored GROUP BY doc_id""".stripMargin) { (spark, dir) =>
    selfScores(spark, dir)
  }

  /** The self-scoring plan shared by [[docLmScore]] and
    * [[lmScoreHistogram]]: (doc_id, n_bigrams, mean_p) for every document
    * with ≥ 2 tokens, scored under the model trained on the whole corpus.
    * Pinned per (session, corpus): the corpus is scored ONCE and the score
    * table (3 narrow columns, one row per document) fans out to the
    * per-doc report and the per-source histogram — the score-then-consume
    * shape of a real quality-filter stage. Unlike the constant-size model
    * pins, this one is corpus-row-sized; it is still the right trade
    * because every consumer would otherwise repeat the full scoring join.
    */
  private def selfScores(
      spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    graft.core.Pinned.table(spark, dir, "lm_self_scores")(selfScoresPlan(spark, dir))

  private def selfScoresPlan(
      spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val bg = bigramsWithPos(spark, dir)
    // the pinned model (c2 feeds ctx AND the scoring join): one
    // model-building corpus pass shared across consumers + one scoring pass
    val (c2, vocab) = pinnedModel(spark, dir)
    val ctx = c2.groupBy(col("w1")).agg(sum(col("n")).as("ctx_n"))
    bg.join(c2, Seq("w1", "w2"))
      .join(broadcast(ctx), "w1")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("pos"), smoothedP.as("p"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        collect_list(struct(col("pos"), col("p"))).as("ps"))
      .select(
        col("doc_id"), col("n_bigrams"),
        (expr("aggregate(transform(array_sort(ps), x -> x.p), 0D, (a, x) -> a + x)")
          / col("n_bigrams")).as("mean_p"))
  }

  /** Per-source LM-score distribution: every document's mean smoothed
    * bigram probability bucketed into twentieths (`floor(mean_p · 20)` —
    * row-local and exact on doubles, unlike a quantile cut whose
    * interpolation is not cross-engine bit-stable on arbitrary doubles),
    * counted per (source, bucket) with the exact min/max score per cell —
    * the "which sources does the model consider low-quality" diagnostic
    * that drives mixture reweighting. Composes the pinned-model scoring
    * plan with one doc-keyed join to recover the source column and a
    * (source × ≤21)-bounded rollup; min/max are order-independent on
    * doubles, so every output cell is deterministic under any
    * partitioning.
    */
  val lmScoreHistogram: QueryDef = QueryDef(
    "lm_score_histogram",
    s"""WITH $modelSqlCtes,
       |scored AS (
       |  SELECT bg.doc_id, bg.pos,
       |    $smoothedSql AS p
       |  FROM bg JOIN c2 ON c2.w1 = bg.w1 AND c2.w2 = bg.w2
       |          JOIN ctx ON ctx.w1 = bg.w1 CROSS JOIN v),
       |docscore AS (
       |  SELECT doc_id,
       |    list_reduce(list(p ORDER BY pos), (a, x) -> a + x) / count(*) AS mean_p
       |  FROM scored GROUP BY doc_id)
       |SELECT dd.source,
       |  CAST(floor(ds.mean_p * 20) AS BIGINT) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  min(ds.mean_p) AS min_p,
       |  max(ds.mean_p) AS max_p
       |FROM docscore ds JOIN documents dd ON dd.doc_id = ds.doc_id
       |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    selfScores(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"), floor(col("mean_p") * 20).as("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("mean_p")).as("min_p"),
        max(col("mean_p")).as("max_p"))
  }

  /** Cross-dataset LM scoring — train on one corpus partition, score
    * ANOTHER: the bigram model is fit on the even-numbered sources and every
    * odd-source document is scored under it (the held-out-perplexity shape
    * every data-quality pipeline runs: "score candidate corpus B under the
    * reference model A"). Same plan as [[docLmScore]] with two inputs — the
    * model table is built once (pinned, vocabulary²-bounded), and scoring is
    * a LEFT join so out-of-model bigrams surface as coverage (`n_scored` of
    * `n_bigrams`) instead of silently dropping rows; `mean_p` averages only
    * in-model bigrams, folded in position order for bit-stability, and is
    * NULL when nothing matched. At 100 TB: one scan of each corpus side, a
    * (w1, w2)-keyed join against the model, one doc-keyed rollup.
    */
  val docLmScoreCross: QueryDef = {
    def whereSrc(parity: Int) =
      s" WHERE TRY_CAST(substring(source, 4) AS INTEGER) % 2 = $parity"
    QueryDef(
      "doc_lm_score_cross",
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
         |           FROM documents${whereSrc(0)}),
         |bg AS (
         |  SELECT doc_id, CAST(i AS INTEGER) AS pos, tk[i] AS w1, tk[i + 1] AS w2
         |  FROM t, UNNEST(range(1, len(tk))) AS u(i)),
         |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY 1, 2),
         |ctx AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS ctx_n FROM c2 GROUP BY 1),
         |v AS (
         |  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vocab
         |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
         |        FROM documents${whereSrc(0)})),
         |st AS (SELECT doc_id, string_split(text, ' ') AS tk
         |       FROM documents${whereSrc(1)}),
         |sbg AS (
         |  SELECT doc_id, CAST(i AS INTEGER) AS pos, tk[i] AS w1, tk[i + 1] AS w2
         |  FROM st, UNNEST(range(1, len(tk))) AS u(i)),
         |scored AS (
         |  SELECT sbg.doc_id, sbg.pos, $smoothedSql AS p
         |  FROM sbg LEFT JOIN c2 ON c2.w1 = sbg.w1 AND c2.w2 = sbg.w2
         |           LEFT JOIN ctx ON ctx.w1 = sbg.w1 CROSS JOIN v)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(count(p) AS BIGINT) AS n_scored,
         |  CASE WHEN count(p) > 0
         |       THEN list_reduce(list(p ORDER BY pos) FILTER (WHERE p IS NOT NULL),
         |                        (a, x) -> a + x) / count(p)
         |  END AS mean_p
         |FROM scored GROUP BY doc_id""".stripMargin) { (spark, dir) =>
      val srcParity = expr("TRY_CAST(substring(source, 4) AS INT) % 2")
      val docs = Tables.documents(spark, dir)
      val trainDocs = docs.filter(srcParity === 0)
      val scoreDocs = docs.filter(srcParity === 1)
      // pin the model: c2 feeds both ctx and the scoring join, and nothing
      // downstream may re-scan the training corpus
      val c2 = bigramsOf(trainDocs)
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n")).localCheckpoint()
      val ctx = c2.groupBy(col("w1")).agg(sum(col("n")).as("ctx_n"))
      val vocab = trainDocs
        .select(explode(split(col("text"), " ")).as("tok"))
        .agg(countDistinct(col("tok")).as("vocab"))
      bigramsOf(scoreDocs)
        .join(c2, Seq("w1", "w2"), "left")
        .join(broadcast(ctx), Seq("w1"), "left")
        .crossJoin(broadcast(vocab))
        .select(col("doc_id"), col("pos"), smoothedP.as("p"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_bigrams"),
          count(col("p")).as("n_scored"),
          collect_list(when(col("p").isNotNull, struct(col("pos"), col("p")))).as("ps"))
        .select(
          col("doc_id"), col("n_bigrams"), col("n_scored"),
          when(col("n_scored") > 0,
            expr("aggregate(transform(array_sort(ps), x -> x.p), 0D, (a, x) -> a + x)")
              / col("n_scored")).as("mean_p"))
    }
  }

  /** BPE merge-step statistics: frequency-weighted adjacent-character-pair
    * counts — the exact quantity byte-pair-encoding tokenizer training
    * maximizes at each merge. The critical scale trick is REAL BPE's own:
    * pair expansion runs over the DISTINCT-WORD table weighted by word
    * frequency, not over corpus tokens — one token-keyed aggregate shrinks
    * the data to vocabulary size, the per-word expansion is row-local, and
    * the pair rollup's key space is bounded by alphabet² (map-side combine
    * saturates). Gate output: the 20 highest-count pairs (the first merge
    * candidates), deterministic via the (n desc, a, b) total order.
    */
  val bpePairCounts: QueryDef = QueryDef(
    "bpe_pair_counts",
    """WITH wf AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS wf
      |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY tok),
      |pairs AS (
      |  SELECT substring(tok, i, 1) AS a, substring(tok, i + 1, 1) AS b, wf
      |  FROM wf, UNNEST(range(1, length(tok))) AS u(i))
      |SELECT a, b, CAST(SUM(wf) AS BIGINT) AS n
      |FROM pairs GROUP BY 1, 2
      |ORDER BY n DESC, a, b
      |LIMIT 20""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("wf"))
      .filter(length(col("tok")) >= 2) // sequence(1, 0, 1) is an error in Spark
      .select(col("wf"), explode(expr(
        """transform(sequence(1, length(tok) - 1, 1),
          |  i -> struct(substring(tok, i, 1) AS a, substring(tok, i + 1, 1) AS b))""".stripMargin))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("wf")).as("n"))
      .orderBy(col("n").desc, col("a"), col("b"))
      .limit(20)
  }

  /** Oracle CTEs for one BPE training round over w{r-1}(wid, wf, toks):
    * adjacent-pair counts, the argmax pair (count desc, pair asc), then
    * GREEDY LEFT-TO-RIGHT merge application stated relationally — the only
    * subtlety is a run of overlapping candidate positions (a == b over a
    * token run, e.g. merging (a,a) into 'aaaa' must give [aa,aa]): greedy
    * takes every other candidate of each maximal consecutive-position run,
    * so candidates are grouped into runs (i - row_number is constant on a
    * run) and odd row_numbers within the run are the taken merges. A
    * position is consumed if the previous position was taken; survivors
    * rebuild the word with `list(.. ORDER BY i)`.
    */
  private def bpeRoundSql(r: Int): String = {
    val (prev, p, t, w) = (s"w${r - 1}", s"p$r", s"t$r", s"w$r")
    s"""$p AS (
       |  SELECT wid, wf, i, toks[i] AS ta, toks[i + 1] AS tb
       |  FROM $prev, UNNEST(range(1, len(toks))) AS u(i)),
       |$t AS (
       |  SELECT ta AS a, tb AS b, CAST(sum(wf) AS BIGINT) AS n
       |  FROM $p GROUP BY 1, 2 ORDER BY n DESC, a, b LIMIT 1),
       |taken$r AS (
       |  SELECT wid, i FROM (
       |    SELECT wid, i,
       |           row_number() OVER (PARTITION BY wid, grp ORDER BY i) AS rn
       |    FROM (
       |      SELECT c.wid, c.i,
       |             c.i - row_number() OVER (PARTITION BY c.wid ORDER BY c.i) AS grp
       |      FROM $p c, $t
       |      WHERE c.ta = $t.a AND c.tb = $t.b))
       |  WHERE rn % 2 = 1),
       |$w AS (
       |  SELECT pos.wid, min(pos.wf) AS wf,
       |         list(CASE WHEN tk.i IS NOT NULL
       |                   THEN (SELECT a || b FROM $t) ELSE pos.t END
       |              ORDER BY pos.i)
       |           FILTER (WHERE cn.i IS NULL) AS toks
       |  FROM (SELECT wid, wf, i, toks[i] AS t
       |        FROM $prev, UNNEST(range(1, len(toks) + 1)) AS u(i)) pos
       |  LEFT JOIN taken$r tk ON tk.wid = pos.wid AND tk.i = pos.i
       |  LEFT JOIN taken$r cn ON cn.wid = pos.wid AND cn.i = pos.i - 1
       |  GROUP BY pos.wid)""".stripMargin
  }

  /** Three rounds of actual BPE tokenizer TRAINING: repeatedly find the
    * most frequent adjacent token pair (count desc, then pair asc — a total
    * order) and merge it everywhere, greedily left-to-right (runs merge
    * pairwise: (a,a) over 'aaaa' -> [aa,aa] — LanguageModelSpec pins this
    * against a reference trainer). Returns the merge table (round, a, b,
    * n) — the artifact a BPE trainer ships.
    *
    * The engine iterates on the DISTINCT-WORD table (vocabulary-sized, the
    * real-world BPE trick — corpus token occurrences only weight the
    * counts), pinned per round with `localCheckpoint` so each round's pair
    * scan reads the previous round's merged vocabulary, never the corpus.
    * Words are token ARRAYS; a merge round is ONE codegen'd row-local
    * `aggregate` fold per word (state = built array + held token — greedy
    * non-overlap needs exactly that one-token lookbehind), so merge
    * application never shuffles anything. Per round the driver holds ONE
    * row (the argmax pair — the k-means-centroid precedent); at 100 TB the
    * corpus is scanned once for word frequencies and never again, and each
    * round is a vocabulary-sized scan + one map-side-combined pair rollup.
    */
  val bpeMergeRounds: QueryDef = QueryDef(
    "bpe_merge_rounds",
    s"""WITH wf AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS wf
       |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY tok),
       |w0 AS (SELECT tok AS wid, wf, string_split_regex(tok, '') AS toks FROM wf),
       |${bpeRoundSql(1)},
       |${bpeRoundSql(2)},
       |${bpeRoundSql(3)}
       |SELECT CAST(round AS INTEGER) AS round, a, b, n FROM (
       |  SELECT 1 AS round, a, b, n FROM t1
       |  UNION ALL SELECT 2, a, b, n FROM t2
       |  UNION ALL SELECT 3, a, b, n FROM t3)""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    trainedPinned(spark, dir)._1.toDF("round", "a", "b", "n")
  }

  /** The APPLY side of the trained tokenizer: the tokens-per-word
    * distribution of the merged vocabulary, weighted by corpus word
    * frequency — how much the 3 learned merges compress the corpus. Shares
    * the pinned training run with [[bpeMergeRounds]]; the rollup is over
    * the vocabulary-sized final word table. The oracle re-derives the same
    * distribution from its own w3 (round-3 vocabulary) CTE.
    */
  val bpeApplyVocab: QueryDef = QueryDef(
    "bpe_apply_vocab",
    s"""WITH wf AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS wf
       |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY tok),
       |w0 AS (SELECT tok AS wid, wf, string_split_regex(tok, '') AS toks FROM wf),
       |${bpeRoundSql(1)},
       |${bpeRoundSql(2)},
       |${bpeRoundSql(3)}
       |SELECT CAST(len(toks) AS INTEGER) AS n_tokens,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(wf) AS BIGINT) AS total_freq
       |FROM w3 GROUP BY 1""".stripMargin) { (spark, dir) =>
    trainedPinned(spark, dir)._2
      .groupBy(size(col("toks")).as("n_tokens"))
      .agg(count(lit(1)).as("n_words"), sum(col("wf")).as("total_freq"))
  }

  /** BPE training loop over a (tok, wf) word-frequency table: `rounds`
    * iterations of argmax-pair (count desc, pair asc) + greedy merge-all.
    * Returns the merge table rows (round, a, b, pair count).
    *
    * Merge application is a row-local `aggregate` fold per word: the
    * accumulator carries (out array, held token); `held == a && t == b`
    * emits the merged token and clears the hold (so a merged token is never
    * reused as a left side — greedy non-overlap), anything else flushes the
    * hold and holds the current token. Corpus tokens are [a-z0-9]+, so the
    * pair literals interpolate into the lambda safely.
    */
  def bpeMerges(
      wordFreq: org.apache.spark.sql.DataFrame,
      rounds: Int): Seq[(Int, String, String, Long)] =
    bpeTrain(wordFreq, rounds)._1

  /** BPE training returning BOTH artifacts: the merge table and the final
    * merged vocabulary (toks array + word frequency) — the thing a trained
    * tokenizer applies. See [[bpeMerges]].
    */
  def bpeTrain(
      wordFreq: org.apache.spark.sql.DataFrame,
      rounds: Int): (Seq[(Int, String, String, Long)], org.apache.spark.sql.DataFrame) = {
    var words = wordFreq
      .select(split(col("tok"), "").as("toks"), col("wf"))
      .localCheckpoint()
    val merges = (1 to rounds).map { round =>
      val top = words
        .filter(size(col("toks")) >= 2) // sequence(1, 0, 1) is an error in Spark
        .select(col("wf"), explode(expr(
          """transform(sequence(1, size(toks) - 1, 1),
            |  i -> struct(element_at(toks, i) AS a, element_at(toks, i + 1) AS b))""".stripMargin))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wf")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect().head
      val (a, b) = (top.getAs[String]("a"), top.getAs[String]("b"))
      words = words
        .withColumn("toks", expr(
          s"""aggregate(
             |  toks,
             |  named_struct('out', CAST(array() AS ARRAY<STRING>),
             |               'held', CAST(NULL AS STRING)),
             |  (acc, t) -> IF(acc.held = '$a' AND t = '$b',
             |    named_struct('out', concat(acc.out, array('$a$b')),
             |                 'held', CAST(NULL AS STRING)),
             |    named_struct(
             |      'out',
             |      IF(acc.held IS NULL, acc.out, concat(acc.out, array(acc.held))),
             |      'held', t)),
             |  acc -> IF(acc.held IS NULL, acc.out,
             |            concat(acc.out, array(acc.held))))""".stripMargin))
        .localCheckpoint()
      (round, a, b, top.getAs[Long]("n"))
    }
    (merges, words)
  }

  /** One training run per (session, dir), shared by the merge-table and
    * apply-side queries.
    */
  private def trainedPinned(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): (Seq[(Int, String, String, Long)], org.apache.spark.sql.DataFrame) =
    graft.core.Pinned.value(spark, dir, "bpe_training") {
      val wordFreq = Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("wf"))
      bpeTrain(wordFreq, rounds = 3)
    }

  /** EXACT heavy hitters (tokens above 1% of the corpus token stream)
    * computed with bounded state: a mergeable Misra-Gries sketch pass
    * ([[graft.functions.MisraGriesAggregator]], 200 counters — candidates
    * are guaranteed to cover everything above N/201) followed by an exact
    * recount restricted to the ≤200 candidates. The final filter
    * `100·n > N` is exact, so the answer is deterministic even though the
    * sketch's surviving key set is merge-order-dependent.
    *
    * The 100 TB story is the whole point: a naive `groupBy(token) HAVING`
    * shuffles the full vocabulary; this plan's first pass carries 200
    * counters per partition into one merge, and the recount's exchange
    * only ever sees rows matching candidate keys.
    */
  val heavyHittersTokens: QueryDef = QueryDef(
    "heavy_hitters_tokens",
    """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM t)
      |SELECT tok, CAST(count(*) AS BIGINT) AS n, (SELECT total FROM n) AS total
      |FROM t GROUP BY tok
      |HAVING 100 * count(*) > (SELECT total FROM n)""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.Encoders
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
    val mg = udaf(new graft.functions.MisraGriesAggregator(200), Encoders.STRING)
    val sketch = toks
      .agg(mg(col("tok")).as("cands"), count(lit(1)).as("total"))
      .collect().head
    val cands = sketch.getSeq[String](sketch.fieldIndex("cands"))
    val total = sketch.getAs[Long]("total")
    toks.filter(col("tok").isin(cands: _*))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
      .filter(lit(100L) * col("n") > lit(total))
      .withColumn("total", lit(total))
  }

  val all: Seq[QueryDef] =
    Seq(invertedIndex, bigramLm, slidingTokenWindows, featureHashing, docLmScore,
      docLmScoreCross, lmScoreHistogram, bpePairCounts, bpeMergeRounds, bpeApplyVocab,
      heavyHittersTokens)
}
