package graft.text

import graft.core.{Num, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level operators over `documents` — the cluster/statistics half of a
  * training-data pipeline (the pairwise half lives in [[Dedup]]):
  *
  *  - duplicate-cluster formation: connected components over the near-dup
  *    pair graph (every real dedup pipeline needs this step — pairwise output
  *    alone can't answer "keep one doc per duplicate group" when dups chain
  *    a~b~c);
  *  - corpus vocabulary (term + document frequency, deterministic top-k);
  *  - per-document distinctive terms via tf-idf with a *rational* idf
  *    (`tf·N/df`: one integer product + one IEEE division, bit-identical in
  *    any engine — `ln` is transcendental and implementation-defined, so it
  *    could never hash-match a foreign oracle);
  *  - repetition/quality signals (Gopher-style duplicate-token and
  *    duplicate-trigram ratios), all row-local — zero shuffles;
  *  - deterministic sequence packing: concatenate the ordered token stream
  *    and cut every `budget` tokens (the standard pre-training packing step),
  *    computed with the scalable two-pass prefix-sum pattern instead of one
  *    global-window sort.
  */
object Corpus {

  /** Connected components by min-label propagation (Pregel-style hash-to-min):
    * every node starts labeled with itself; each round a node takes the min of
    * its own and its neighbors' labels; fixpoint = per-component min doc_id.
    *
    * Rounds = eccentricity of each component's min node — near-dup clusters
    * are near-cliques, so 1–2 rounds in practice; worst case O(diameter)
    * (the large-star/small-star variant would bound it at O(log n) rounds at
    * the cost of re-materializing edges — unnecessary for dedup graphs).
    * Each round is one shuffle on node id; `localCheckpoint` truncates the
    * growing lineage so plan size stays constant per round.
    *
    * Input: (doc_a, doc_b) undirected pair rows. Output: (doc_id, cluster_id).
    */
  def connectedComponents(pairs: DataFrame): DataFrame =
    connectedComponentsInstrumented(pairs)._1

  /** [[connectedComponents]] plus the number of propagation rounds it took
    * to reach the fixpoint — the quantity that governs cost at scale (one
    * shuffle per round), asserted by the long-chain stress spec.
    */
  def connectedComponentsInstrumented(pairs: DataFrame): (DataFrame, Int) = {
    val fwd = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val edges = fwd
      .union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("lbl", col("doc_id"))
      .localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      val nbrMin = edges
        .join(labels, edges("src") === labels("doc_id"))
        .groupBy(col("dst"))
        .agg(min(col("lbl")).as("nlbl"))
      // the convergence flag rides the SAME projection that builds `next`,
      // so detecting the fixpoint is one scan of the checkpoint — not an
      // extra labels-sized join + shuffle-read job per round
      val next = labels
        .join(nbrMin, labels("doc_id") === nbrMin("dst"), "left")
        .select(labels("doc_id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"),
          (coalesce(col("nlbl"), col("lbl")) < col("lbl")).as("chg"))
        .localCheckpoint()
      changed = next.filter(col("chg")).count()
      labels = next.drop("chg")
      rounds += 1
    }
    (labels.withColumnRenamed("lbl", "cluster_id"), rounds)
  }

  /** Connected components by alternating large-star/small-star contraction
    * — the O(log n)-rounds alternative to hash-to-min's O(diameter), from
    * the public MapReduce-CC literature (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14). Reach for this when
    * components may be long paths (link graphs, session stitching); for
    * near-clique dup graphs hash-to-min's 2-3 rounds is already optimal.
    *
    * large-star: every node points its LARGER neighbors at the minimum of
    * its neighborhood (incl. itself); small-star: every node and its
    * smaller neighbors re-attach to the minimum among them. Both preserve
    * connectivity and strictly shrink tree height; alternating them
    * converges to a star forest rooted at each component's min node.
    * Each round re-materializes edges (2 aggregates + 2 joins) — the price
    * for the exponentially better round bound.
    *
    * Input/output contract matches [[connectedComponents]]; also returns
    * the round count.
    */
  def connectedComponentsStar(pairs: DataFrame): (DataFrame, Int) = {
    val nodes = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct().localCheckpoint()

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      sym.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b")).distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      val mins = dir.groupBy("u").agg(min(col("v")).as("m"))
      val moved = dir.join(mins, "u")
        .select(col("v").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
      val centers = mins.select(col("u").as("a"), col("m").as("b"))
      moved.union(centers).distinct()
    }

    // order-free edge-set fingerprint for the convergence check: count +
    // xor of row hashes (xor can't overflow under ANSI, unlike sum)
    def signature(e: DataFrame) = {
      val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("a"), col("b")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var edges = pairs
      .select(greatest(col("doc_a"), col("doc_b")).as("a"), least(col("doc_a"), col("doc_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()
    var sig = signature(edges)
    var rounds = 0
    var converged = false
    while (!converged) {
      edges = smallStar(largeStar(edges)).localCheckpoint()
      val next = signature(edges)
      converged = next == sig
      sig = next
      rounds += 1
    }
    // star forest: every remaining edge is (child, root); isolated input
    // nodes (self-pair-only rows were filtered) label themselves
    val labels = nodes
      .join(edges.select(col("a").as("doc_id"), col("b").as("lbl")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lbl"), col("doc_id")).as("cluster_id"))
    (labels, rounds)
  }

  /** Duplicate clusters over the MinHash-LSH verified near-dup pairs
    * (Jaccard >= 0.5; [[Dedup.lshVerifiedPairs]]). cluster_id = min doc_id of
    * the component (the canonical survivor). The oracle rebuilds the same
    * edge set exhaustively and closes it with a recursive CTE, so the hash
    * match proves both the LSH recall AND the component labeling.
    */
  /** Shared oracle CTE chain — exhaustive near-dup edges closed into
    * connected components (sh → nz → pairs → edges → reach → comp): the
    * ONE definition of the cluster labeling that the three
    * cluster-consuming oracles (clusters, keep-best, grouped split)
    * replay. A threshold or shingle change lands in all three or none.
    * Pre-stripped; interpolate after `WITH RECURSIVE `, no trailing comma.
    */
  private lazy val componentsOracleCtes: String =
    s"""sh AS (
       |  SELECT doc_id, ${Dedup.shinglesSql("text")} AS s
       |  FROM documents),
       |nz AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
       |pairs AS (
       |  SELECT a.doc_id AS src, b.doc_id AS dst
       |  FROM nz a JOIN nz b ON b.doc_id > a.doc_id
       |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / CAST(len(list_distinct(a.s || b.s)) AS DOUBLE) >= 0.5),
       |edges AS (
       |  SELECT src, dst FROM pairs
       |  UNION ALL
       |  SELECT dst AS src, src AS dst FROM pairs),
       |reach(doc_id, lbl) AS (
       |  SELECT DISTINCT src AS doc_id, src AS lbl FROM edges
       |  UNION
       |  SELECT e.dst AS doc_id, r.lbl FROM reach r JOIN edges e ON e.src = r.doc_id),
       |comp AS (SELECT doc_id, min(lbl) AS cluster_id FROM reach GROUP BY doc_id)""".stripMargin

  val dedupClusters: QueryDef = QueryDef(
    "dedup_clusters",
    s"""WITH RECURSIVE $componentsOracleCtes
       |SELECT c.doc_id, c.cluster_id, CAST(s.n AS BIGINT) AS cluster_size
       |FROM comp c
       |JOIN (SELECT cluster_id, count(*) AS n FROM comp GROUP BY cluster_id) s
       |  ON s.cluster_id = c.cluster_id""".stripMargin) { (spark, dir) =>
    val comp = connectedComponents(
      Dedup.lshVerifiedPairsPinned(spark, dir).select(col("doc_a"), col("doc_b")))
    val sizes = comp.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
  }

  /** Corpus vocabulary: term frequency + document frequency, top 20 by tf
    * with an alphabetical tiebreak (deterministic top-k set). Classic
    * vocabulary-building step; partial (map-side) aggregation makes the
    * token-explode shuffle carry one row per distinct (partition, token),
    * not one per token occurrence.
    */
  val vocabTopk: QueryDef = QueryDef(
    "vocab_topk",
    """SELECT tok, CAST(count(*) AS BIGINT) AS tf,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
      |GROUP BY tok
      |ORDER BY tf DESC, tok
      |LIMIT 20""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("tok"))
      .limit(20)
  }

  /** Per-document top-3 distinctive terms by tf-idf with rational idf
    * `score = (tf * N) / df` (see object doc for why not `ln`). The df table
    * is vocabulary-sized — broadcast; the single shuffle is the per-(doc,term)
    * tf aggregation.
    */
  val tfidfTopTerms: QueryDef = QueryDef(
    "tfidf_top_terms",
    """WITH tf AS (
      |  SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
      |  GROUP BY doc_id, tok),
      |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |    CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
      |  FROM tf JOIN df ON df.term = tf.term CROSS JOIN n),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
      |  FROM scored)
      |SELECT doc_id, term, tf, df, score, CAST(rnk AS INTEGER) AS rnk
      |FROM ranked WHERE rnk <= 3""".stripMargin) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"), col("rnk"))
  }

  private val trigramsSpark =
    """CASE WHEN size(toks) >= 3
      |THEN zip_with(
      |       zip_with(slice(toks, 1, size(toks) - 2), slice(toks, 2, size(toks) - 2),
      |         (a, b) -> concat(a, ' ', b)),
      |       slice(toks, 3, size(toks) - 2),
      |       (ab, c) -> concat(ab, ' ', c))
      |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin

  private val trigramsSql =
    """CASE WHEN len(toks) >= 3
      |THEN list_transform(range(1, len(toks) - 1),
      |       i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
      |ELSE [] END""".stripMargin

  /** Gopher-style repetition signals per document: duplicate-token ratio,
    * top-token share (most frequent token's fraction of all tokens), and
    * duplicate-trigram ratio. Every expression is row-local higher-order
    * array code — the whole query is a narrow codegen'd map over document
    * partitions, so it scales with zero shuffles.
    */
  val docRepetition: QueryDef = QueryDef(
    "doc_repetition",
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |g AS (SELECT doc_id, toks, $trigramsSql AS tris FROM t)
       |SELECT doc_id,
       |  CAST(len(toks) AS INTEGER) AS n_tokens,
       |  CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dup_token_ratio,
       |  CAST(list_max(list_transform(list_distinct(toks),
       |         d -> len(list_filter(toks, x -> x = d)))) AS DOUBLE)
       |    / len(toks) AS top_token_share,
       |  CASE WHEN len(tris) > 0
       |    THEN CAST(len(tris) - len(list_distinct(tris)) AS DOUBLE) / len(tris)
       |    ELSE NULL END AS dup_trigram_ratio
       |FROM g""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .selectExpr("doc_id", "toks", s"$trigramsSpark AS tris")
      .selectExpr(
        "doc_id",
        "size(toks) AS n_tokens",
        "CAST(size(toks) - size(array_distinct(toks)) AS DOUBLE) / size(toks) AS dup_token_ratio",
        """CAST(array_max(transform(array_distinct(toks),
          |       d -> size(filter(toks, x -> x = d)))) AS DOUBLE)
          |  / size(toks) AS top_token_share""".stripMargin,
        """CASE WHEN size(tris) > 0
          |  THEN CAST(size(tris) - size(array_distinct(tris)) AS DOUBLE) / size(tris)
          |  ELSE NULL END AS dup_trigram_ratio""".stripMargin)
  }

  /** Lexical diversity via the Simpson index `1 − Σc_i²/n²` (probability two
    * sampled tokens differ). Chosen over Shannon entropy deliberately:
    * entropy needs `ln`, whose last-bit rounding is libm-implementation-
    * defined, so it could never hash-match a foreign engine — Simpson is
    * exact integer sums plus one IEEE division (the same reasoning as
    * tf-idf's rational idf). Row-local, zero shuffles.
    */
  val docTokenDiversity: QueryDef = QueryDef(
    "doc_token_diversity",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |c AS (SELECT doc_id,
      |        CAST(len(toks) AS BIGINT) AS n_tokens,
      |        CAST(list_sum(list_transform(list_distinct(toks),
      |               d -> len(list_filter(toks, x -> x = d))
      |                    * len(list_filter(toks, x -> x = d)))) AS BIGINT) AS sum_sq
      |      FROM t WHERE len(toks) > 0)
      |SELECT doc_id, n_tokens, sum_sq,
      |  1.0 - CAST(sum_sq AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
      |    AS simpson_diversity
      |FROM c""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .filter(size(col("toks")) > 0)
      // sum_sq = sum of squared run lengths over the SORTED token array:
      // O(n log n) instead of the naive filter-per-distinct-token
      // O(distinct · n) (a single 50k-token doc would cost ~10⁹ comparisons
      // and straggle). `ends` holds the 1-based positions where a run of
      // equal tokens finishes; run length = end - previous end. The value
      // is algorithm-independent (an exact integer), so the oracle keeps
      // its straightforward per-distinct form. Counts go through BIGINT
      // before squaring — a token with >=46341 occurrences would overflow
      // the 32-bit product (ANSI error) where BIGINT is exact.
      .selectExpr("doc_id", "size(toks) AS n", "array_sort(toks) AS sorted")
      .selectExpr(
        "doc_id", "n",
        """filter(sequence(1, n),
          |  i -> i = n OR NOT (element_at(sorted, i) <=> try_element_at(sorted, i + 1)))
          |  AS ends""".stripMargin)
      .selectExpr(
        "doc_id",
        "CAST(n AS BIGINT) AS n_tokens",
        """aggregate(
          |  zip_with(ends, concat(array(0), slice(ends, 1, size(ends) - 1)),
          |    (e, s) -> CAST(e - s AS BIGINT) * CAST(e - s AS BIGINT)),
          |  0L, (acc, v) -> acc + v) AS sum_sq""".stripMargin)
      .selectExpr(
        "doc_id", "n_tokens", "sum_sq",
        """1.0D - CAST(sum_sq AS DOUBLE)
          |  / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)) AS simpson_diversity""".stripMargin)
  }

  private val PackBudget = 256
  private val MaxPackShards = 4096L

  /** Deterministic sequence packing: documents ordered by doc_id form one
    * token stream, cut into fixed `PackBudget`-token chunks; each doc reports
    * the chunk range it lands in (docs may span chunks — the standard
    * concat-and-chunk pre-training packing).
    *
    * Scale path: a single global cumsum window would serialize on one
    * partition. Instead: (1) per-shard token totals (tiny aggregate), (2)
    * prefix offsets over the shard totals (window over #shards rows), (3)
    * broadcast the offsets back and cumsum *within* each shard in parallel.
    * Same two-pass trick DuckDB/Trino use for large window frames; the oracle
    * states the plain global-window spec it must equal. The shard COUNT is
    * bounded (<= `MaxPackShards`), not the shard size — a fixed-size shard
    * would give only a constant-factor reduction and the offset window would
    * still grow linearly with the corpus.
    */
  val packSequences: QueryDef = QueryDef(
    "pack_sequences",
    s"""WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
       |c AS (SELECT doc_id, n,
       |        sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS e
       |      FROM t)
       |SELECT doc_id,
       |  CAST(n AS BIGINT) AS n_tokens,
       |  CAST(e - n AS BIGINT) AS start_off,
       |  CAST((e - n) // $PackBudget AS BIGINT) AS chunk_first,
       |  CAST((e - 1) // $PackBudget AS BIGINT) AS chunk_last,
       |  CAST((e - 1) // $PackBudget - (e - n) // $PackBudget + 1 AS BIGINT) AS n_chunks
       |FROM c""".stripMargin) { (spark, dir) =>
    packed(Tables.documents(spark, dir))
  }

  /** The sharded two-pass packing over any (doc_id, text) frame.
    *
    * Shard function: `(doc_id - min_id) div width` with `width` sized from
    * the id span so there are at most [[MaxPackShards]] shards — monotone in
    * doc_id (so shard-major + within-shard order == global doc_id order) and
    * bounded regardless of corpus size: the unpartitioned offset window below
    * never sees more than ~4096 rows whether the corpus is 10^5 or 10^10
    * docs. Costs one min/max bounds lookup (column-stats cheap) up front.
    */
  def packed(docs: DataFrame): DataFrame = {
    val b = docs.agg(
      min(col("doc_id")).cast("long"), max(col("doc_id")).cast("long")).head()
    val (minId, span) =
      if (b.isNullAt(0)) (0L, 1L) else (b.getLong(0), b.getLong(1) - b.getLong(0) + 1L)
    val width = math.max(1L, (span + MaxPackShards - 1L) / MaxPackShards)
    val t = docs.selectExpr(
      "doc_id",
      "CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens",
      s"(doc_id - $minId) div $width AS shard")
    // single-partition prefix sum over the (bounded, <= MaxPackShards) shard
    // totals: one partition is the INTENDED plan here — the input can't
    // exceed ~4096 rows whatever the corpus size. The partition key must be
    // constant-valued but not foldable (`shard % 1`), or the optimizer
    // strips it back to the empty spec and WindowExec warns as if the input
    // were unbounded.
    val wOff = Window.partitionBy(pmod(col("shard"), lit(1L)))
      .orderBy(col("shard")).rowsBetween(Window.unboundedPreceding, -1)
    val shardOff = t.groupBy(col("shard")).agg(sum(col("n_tokens")).as("tot"))
      .withColumn("off", coalesce(sum(col("tot")).over(wOff), lit(0L)))
      .select(col("shard"), col("off"))
    val wIn = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.join(broadcast(shardOff), "shard")
      .withColumn("end_off", col("off") + sum(col("n_tokens")).over(wIn))
      .selectExpr(
        "doc_id",
        "n_tokens",
        "end_off - n_tokens AS start_off",
        s"(end_off - n_tokens) div $PackBudget AS chunk_first",
        s"(end_off - 1) div $PackBudget AS chunk_last",
        s"(end_off - 1) div $PackBudget - (end_off - n_tokens) div $PackBudget + 1 AS n_chunks")
  }

  /** Train/test decontamination report over any (doc_id, text) frame with a
    * `split` column: for each test document, how many of its word-bigram
    * shingles also appear in ANY training document. Scale shape: the join
    * shuffles only (shingle) keys, the train side is distinct-reduced first,
    * and nothing is ever pairwise — at 100 TB the string shingles would be
    * compressed to 64-bit hashes before the shuffle (here they stay strings
    * so the DuckDB oracle replays byte-for-byte).
    */
  def decontaminationReport(docs: DataFrame): DataFrame = {
    val sh = docs.selectExpr("doc_id", "split", s"${Dedup.shinglesSpark("text")} AS s")
    val trainGrams = sh.filter(col("split") === "train")
      .select(explode(col("s")).as("g")).distinct()
    val test = sh.filter(col("split") === "test")
    val hits = test.select(col("doc_id"), explode(col("s")).as("g"))
      .join(trainGrams, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared")) // shingle arrays are distinct per doc
    test.select(col("doc_id"), size(col("s")).cast("long").as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0L).as("contaminated"))
  }

  /** Decontamination on the deterministic 80/10/10 split (same
    * multiplicative hash as `dataset_split`): every test document scored
    * for n-gram overlap against the train split — the standard
    * "is my eval set leaked into training data" check.
    */
  val decontaminateSplit: QueryDef = QueryDef(
    "decontaminate_split",
    s"""WITH sh AS (
       |  SELECT doc_id,
       |         ${graft.core.Num.sqlSplitHash("doc_id")} AS h,
       |         ${Dedup.shinglesSql("text")} AS s
       |  FROM documents),
       |tr AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE h < 3435973837),
       |te AS (SELECT doc_id, s FROM sh WHERE h >= 3865470566),
       |hits AS (
       |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shared
       |  FROM (SELECT doc_id, unnest(s) AS g FROM te) t
       |  JOIN tr ON tr.g = t.g
       |  GROUP BY 1)
       |SELECT te.doc_id,
       |  CAST(len(te.s) AS BIGINT) AS n_shingles,
       |  coalesce(h.n_shared, 0) AS n_shared,
       |  coalesce(h.n_shared, 0) > 0 AS contaminated
       |FROM te LEFT JOIN hits h ON h.doc_id = te.doc_id""".stripMargin) { (spark, dir) =>
    val hash = graft.core.Num.splitHash(col("doc_id"))
    val docs = Tables.documents(spark, dir)
      .withColumn("split",
        when(hash < lit(3435973837L), "train")
          .when(hash < lit(3865470566L), "val")
          .otherwise("test"))
    decontaminationReport(docs)
  }

  /** Corpus mixture rebalancing: deterministically downsample every source
    * to the token budget of the SMALLEST source (equal-token mixing — the
    * static form of training-data reweighting). Per-source rate =
    * min_source_tokens / source_tokens; membership = the same engine-free
    * multiplicative hash as `dataset_split`, so the exact sampled set is
    * reproducible anywhere. The per-source totals are bounded model state
    * (one row per source — the same shape as k-means centroids): computed
    * once, rates derived on the driver, and the acceptance threshold
    * applied as a literal-map lookup — one aggregate to learn the totals,
    * one filtered aggregate to sample, zero re-derived subplans (the naive
    * all-relational form re-planned the totals per consumer: 11 exchanges
    * vs 3).
    */
  val corpusMixtureSample: QueryDef = QueryDef(
    "corpus_mixture_sample",
    s"""WITH t AS (
       |  SELECT source, doc_id,
       |         CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT) AS n
       |  FROM documents),
       |s AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tot FROM t GROUP BY 1),
       |m AS (SELECT min(tot) AS mn FROM s),
       |acc AS (
       |  SELECT t.source, t.n
       |  FROM t JOIN s ON t.source IS NOT DISTINCT FROM s.source CROSS JOIN m
       |  WHERE CAST(${graft.core.Num.sqlSplitHash("t.doc_id")} AS DOUBLE)
       |        < CAST(m.mn AS DOUBLE) / CAST(s.tot AS DOUBLE) * 4294967296.0)
       |SELECT s.source,
       |  s.tot AS n_tokens_total,
       |  CAST(m.mn AS DOUBLE) / CAST(s.tot AS DOUBLE) AS target_rate,
       |  CAST(coalesce(a.n_docs, 0) AS BIGINT) AS n_docs_sampled,
       |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens_sampled
       |FROM s CROSS JOIN m
       |LEFT JOIN (SELECT source, count(*) AS n_docs, SUM(n) AS n_tokens
       |           FROM acc GROUP BY 1) a
       |  ON a.source IS NOT DISTINCT FROM s.source""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    // NULL-safe contract matching the oracle's GROUP BY: a null source is a
    // real group (represented by a sentinel in the driver-side map — Spark
    // literal maps reject null keys), null text counts 0 tokens.
    val NullSrc = "\u0000<null-source>"
    val t = Tables.documents(spark, dir).select(
      coalesce(col("source"), lit(NullSrc)).as("source"), col("doc_id"),
      coalesce(size(split(col("text"), " ")).cast("long"), lit(0L)).as("n"))
    val totals = t.groupBy(col("source")).agg(sum(col("n")).as("tot"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (totals.isEmpty) {
      Seq.empty[(String, Long, Double, Long, Long)]
        .toDF("source", "n_tokens_total", "target_rate", "n_docs_sampled", "n_tokens_sampled")
    } else {
      val mn = totals.values.min
      // same IEEE sequence as the oracle: (mn / tot) evaluated first, then
      // scaled to the hash range
      val thresholds =
        totals.map { case (src, tot) => src -> mn.toDouble / tot.toDouble * 4294967296.0 }
      val h = graft.core.Num.splitHash(col("doc_id"))
      val acc = t.filter(h.cast("double") < element_at(typedLit(thresholds), col("source")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
      totals.toSeq.toDF("source", "n_tokens_total")
        .join(acc, Seq("source"), "left")
        .select(
          when(col("source") === NullSrc, lit(null)).otherwise(col("source")).as("source"),
          col("n_tokens_total"),
          element_at(typedLit(totals.map { case (src, tot) =>
            src -> mn.toDouble / tot.toDouble
          }), col("source")).as("target_rate"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs_sampled"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens_sampled"))
    }
  }

  /** Unigram-LM commonality score — the cheap "perplexity-proxy" quality
    * signal: how corpus-typical a document's tokens are. Per document,
    * `weight_sum = Σ_t tf_doc(t) · tf_corpus(t)` (exact BIGINT — integer sums
    * are order-independent, so the value is bit-identical in any engine,
    * unlike a float log-prob sum), normalized to
    * `commonality = weight_sum / (n_tokens · corpus_tokens)` — the
    * probability a random token of the doc equals an independently drawn
    * corpus token. Low = rare/unusual content, high = boilerplate.
    *
    * Scale shape: one (doc, token) tf aggregate, one token-level corpus-tf
    * aggregate (vocabulary-sized → broadcast back), one per-doc rollup that
    * reuses the (doc, token) partitioning. A real 100 TB run would cap the
    * broadcast with a top-K vocabulary + OOV bucket; the mechanism is
    * identical. tf·ctf stays within int64 up to ~10^13 corpus tokens per
    * 10^5-token doc.
    */
  val tokenCommonality: QueryDef = QueryDef(
    "token_commonality",
    """WITH tf AS (
      |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
      |  GROUP BY 1, 2),
      |ctf AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS ctf FROM tf GROUP BY 1),
      |tot AS (SELECT CAST(SUM(ctf) AS BIGINT) AS total FROM ctf)
      |SELECT tf.doc_id,
      |  CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
      |  CAST(SUM(tf.tf * c.ctf) AS BIGINT) AS weight_sum,
      |  CAST(SUM(tf.tf * c.ctf) AS DOUBLE)
      |    / (CAST(SUM(tf.tf) AS DOUBLE) * CAST(t.total AS DOUBLE)) AS commonality
      |FROM tf JOIN ctf c ON c.tok = tf.tok CROSS JOIN tot t
      |GROUP BY tf.doc_id, t.total""".stripMargin) { (spark, dir) =>
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val ctf = tf.groupBy(col("tok")).agg(sum(col("tf")).as("ctf"))
    val total = ctf.agg(sum(col("ctf")).as("total"))
    tf.join(broadcast(ctf), "tok")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("ctf")).as("weight_sum"))
      .crossJoin(broadcast(total))
      .select(
        col("doc_id"), col("n_tokens"), col("weight_sum"),
        (col("weight_sum").cast("double")
          / (col("n_tokens").cast("double") * col("total").cast("double"))).as("commonality"))
  }

  /** Keep-best dedup consolidation — the step that turns near-dup clusters
    * into a training set: every document labeled with its duplicate cluster
    * (singletons cluster with themselves), the highest-quality member kept
    * (quality ties broken by min doc_id). Composes the LSH pair graph,
    * connected components, and the bit-stable quality score; the oracle
    * replays all three exhaustively, so the hash match proves the survivor
    * choice end to end.
    */
  val dedupKeepBest: QueryDef = QueryDef(
    "dedup_keep_best",
    s"""WITH RECURSIVE $componentsOracleCtes,
       |scored AS (
       |  SELECT doc_id, ${TextAnalysis.qualitySql("t")} AS quality
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
       |  WHERE len(t) > 0),
       |lab AS (
       |  SELECT s.doc_id, coalesce(c.cluster_id, s.doc_id) AS cluster_id, s.quality
       |  FROM scored s LEFT JOIN comp c ON c.doc_id = s.doc_id),
       |rk AS (
       |  SELECT *, row_number() OVER (PARTITION BY cluster_id
       |                               ORDER BY quality DESC, doc_id) AS rn
       |  FROM lab)
       |SELECT doc_id, cluster_id, quality, rn = 1 AS kept FROM rk""".stripMargin) {
    (spark, dir) =>
      val comp = connectedComponents(
        Dedup.lshVerifiedPairsPinned(spark, dir).select(col("doc_a"), col("doc_b")))
      val scored = Tables.documents(spark, dir)
        .selectExpr("doc_id", "split(text, ' ') AS t")
        .filter(size(col("t")) > 0)
        .selectExpr("doc_id", s"${TextAnalysis.qualitySpark("t")} AS quality")
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("quality").desc, col("doc_id"))
      scored
        .join(comp, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
          col("quality"))
        .withColumn("kept", row_number().over(w) === 1)
  }

  /** Term co-occurrence mining over a bounded vocabulary: which of the top
    * 50 corpus terms appear together in a document, counted over all docs —
    * the classic PMI/embedding-prior statistic. The vocabulary bound is
    * what makes this scale: per-doc pairs come from at most 50 vocab terms
    * (≤ 1225 row-local pairs regardless of doc length), so there is no
    * token-level self-join anywhere — one shuffle to re-group tokens per
    * doc, local pair expansion, then a map-side-combined pair count. The
    * oracle states it as the exhaustive token self-join.
    */
  val termCooccurrence: QueryDef = QueryDef(
    "term_cooccurrence",
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      |  FROM documents),
      |vocab AS (
      |  SELECT tok FROM tok GROUP BY tok ORDER BY count(*) DESC, tok LIMIT 50),
      |ft AS (SELECT doc_id, tok FROM tok WHERE tok IN (SELECT tok FROM vocab)),
      |pairs AS (
      |  SELECT a.tok AS tok_a, b.tok AS tok_b
      |  FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.tok < b.tok)
      |SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) AS n_docs
      |FROM pairs GROUP BY 1, 2 ORDER BY n_docs DESC, tok_a, tok_b LIMIT 20""".stripMargin) {
    (spark, dir) =>
      cooccurrence(Tables.documents(spark, dir), vocabSize = 50, topK = 20)
  }

  /** Vocab-bounded co-occurrence over any (doc_id, text) frame: count the
    * documents in which each pair of top-`vocabSize` tokens (by document
    * frequency, alphabetical tiebreak) appears together; top `topK` pairs.
    */
  def cooccurrence(docs: DataFrame, vocabSize: Int, topK: Int): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
    // document frequency ranks the vocabulary; (df desc, tok) is a total
    // order, so the top-N SET is deterministic
    val vocab = tok.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok"))
      .limit(vocabSize)
      .select(col("tok"))
    // the per-doc pair expansion below multiplies rows by up to C(50,2) =
    // 1225: pin the doc_id exchange to the configured parallelism (groupBy
    // reuses it — one shuffle either way) so AQE's input-byte coalescing
    // can't serialize the expansion stage (measured: 1.1 s in ONE task).
    // Shuffle-byte note (Par's map-side-combining caveat): the exchange
    // carries raw (doc_id, tok) rows, but they are ALREADY distinct per
    // doc (array_distinct upstream, ≤50 vocab tokens/doc), so the partial
    // collect_set this pin forgoes would shuffle the same token bytes
    // grouped per doc — the delta is doc_id repetition only (~8 B × k per
    // doc), and repartitioning the post-agg (doc_id, vt) frame instead
    // would shuffle those same set bytes a SECOND time.
    graft.core.Par.fanOutBy(tok.join(broadcast(vocab), "tok"), col("doc_id"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("tok"))).as("vt"))
      // row-local pair expansion over the sorted per-doc vocab terms:
      // x (0-based index i) pairs with every later element, so tok_a <
      // tok_b by construction
      .select(explode(expr(
        """flatten(transform(vt, (x, i) ->
          |  transform(slice(vt, i + 2, size(vt)),
          |    y -> named_struct('tok_a', x, 'tok_b', y))))""".stripMargin)).as("p"))
      .groupBy(col("p.tok_a").as("tok_a"), col("p.tok_b").as("tok_b"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("tok_a"), col("tok_b"))
      .limit(topK)
  }

  /** Pairwise vocabulary overlap between sources — exact Jaccard over each
    * source's distinct-token set, for every source pair. The comparative
    * corpus statistic behind mixture design ("how redundant are these two
    * crawls?") and the set-similarity dual of the per-document near-dup
    * family. Scale shape: the (source, token) distinct table is
    * vocabulary-sized per source; the intersection join is TOKEN-keyed (one
    * shuffle, each token meeting only its |sources|² co-occurrences — never
    * a document-level pairwise comparison), and the Jaccard assembles from
    * broadcast per-source sizes as an exact integer ratio.
    */
  val sourceVocabOverlap: QueryDef = QueryDef(
    "source_vocab_overlap",
    """WITH st AS (
      |  SELECT DISTINCT source, unnest(list_distinct(string_split(text, ' '))) AS tok
      |  FROM documents),
      |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM st GROUP BY 1),
      |inter AS (
      |  SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS n_common
      |  FROM st a JOIN st b ON b.tok = a.tok AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT i.src_a, i.src_b, i.n_common, sa.n AS n_a, sb.n AS n_b,
      |  CAST(i.n_common AS DOUBLE) / CAST(sa.n + sb.n - i.n_common AS DOUBLE) AS jaccard
      |FROM inter i
      |JOIN sizes sa ON sa.source = i.src_a
      |JOIN sizes sb ON sb.source = i.src_b""".stripMargin) { (spark, dir) =>
    // ONE corpus scan: group the (source, token) distinct table by token
    // into per-token source sets (vocabulary-sized), pin it with an eager
    // localCheckpoint, and derive BOTH the per-source sizes and the
    // intersection counts from that — the naive sizes + self-join form
    // re-executes the corpus scan three times.
    val tokSources = Tables.documents(spark, dir)
      .select(col("source"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .distinct()
      .groupBy(col("tok"))
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .localCheckpoint()
    val sizes = tokSources
      .select(explode(col("srcs")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    // row-local pair expansion over each token's sorted source set (the
    // term_cooccurrence pattern): src_a < src_b by construction
    val inter = tokSources
      .select(explode(expr(
        """flatten(transform(srcs, (x, i) ->
          |  transform(slice(srcs, i + 2, size(srcs)),
          |    y -> named_struct('src_a', x, 'src_b', y))))""".stripMargin)).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("n_a"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("n_b"))), "src_b")
      .select(
        col("src_a"), col("src_b"), col("n_common"), col("n_a"), col("n_b"),
        Num.ratio(col("n_common"), col("n_a") + col("n_b") - col("n_common")).as("jaccard"))
  }

  /** Cross-source near-duplicate audit: how many verified near-dup pairs
    * (exact Jaccard ≥ 0.5 over 3-shingles, via MinHash-LSH candidates) link
    * documents from DIFFERENT sources — the inter-source contamination
    * matrix that tells a mixture designer which feeds overlap. The pair's
    * source endpoints are canonicalized (`least`/`greatest`) so each
    * unordered source pair is one row; output is bounded by #sources².
    * Engine side this is the FOURTH consumer of the pinned LSH edge table
    * ([[Dedup.lshVerifiedPairsPinned]]) — no new signature/band/verify
    * work, just two doc-keyed joins to label pair endpoints and a
    * map-side-combined rollup. The oracle rebuilds the edge set
    * exhaustively (O(n²) in DuckDB only), so the hash match again proves
    * realized recall, now under the source-pair rollup.
    */
  val crossSourceNeardup: QueryDef = QueryDef(
    "cross_source_neardup",
    s"""WITH sh AS (
       |  SELECT doc_id, source, ${Dedup.shinglesSql("text")} AS s
       |  FROM documents),
       |nz AS (SELECT doc_id, source, s FROM sh WHERE len(s) > 0),
       |pairs AS (
       |  SELECT a.source AS sa, b.source AS sb
       |  FROM nz a JOIN nz b ON b.doc_id > a.doc_id
       |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / CAST(len(list_distinct(a.s || b.s)) AS DOUBLE) >= 0.5)
       |SELECT least(sa, sb) AS src_a, greatest(sa, sb) AS src_b,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(count(*) FILTER (WHERE sa <> sb) AS BIGINT) AS n_cross
       |FROM pairs
       |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    val srcOf = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    Dedup.lshVerifiedPairsPinned(spark, dir)
      .join(srcOf.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(srcOf.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .groupBy(
        least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .agg(
        count(lit(1)).as("n_pairs"),
        count(when(col("sa") =!= col("sb"), 1)).as("n_cross"))
  }

  /** Token-budget corpus selection: per source, keep the highest-quality
    * documents whose RUNNING token total stays within a fixed budget (600
    * tokens here) — the data-selection step that builds a fixed-size
    * training mix from ranked candidates ("fill each source's quota best
    * first"). Quality ties break on doc_id, so the per-source ranking is a
    * total order and the inclusive running sum (exact integer token
    * counts) is engine-independent. Plan: ONE shuffle on source, one
    * per-source sort inside the window — no self-join, no global sort. At
    * 100 TB the unit of work is a source partition; for a pathologically
    * hot source the same selection can run as the two-pass
    * quantile-threshold approximation (`quality_quantile_filter`) — the
    * exact-prefix form here is the per-group-tractable case.
    */
  val corpusBudgetSelect: QueryDef = QueryDef(
    "corpus_budget_select",
    s"""WITH t AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
       |s AS (
       |  SELECT doc_id, source, CAST(len(tk) AS BIGINT) AS n_tok,
       |    ${TextAnalysis.qualitySql("tk")} AS quality
       |  FROM t WHERE len(tk) > 0),
       |c AS (
       |  SELECT *, CAST(SUM(n_tok) OVER (PARTITION BY source
       |    ORDER BY quality DESC, doc_id
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM s)
       |SELECT doc_id, source, n_tok, quality, cum_tokens
       |FROM c WHERE cum_tokens <= 600""".stripMargin) { (spark, dir) =>
    val s = Tables.documents(spark, dir)
      .selectExpr("doc_id", "source", "split(text, ' ') AS tk")
      .filter(size(col("tk")) > 0)
      .selectExpr(
        "doc_id", "source", "CAST(size(tk) AS BIGINT) AS n_tok",
        s"${TextAnalysis.qualitySpark("tk")} AS quality")
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s.withColumn("cum_tokens", sum(col("n_tok")).over(w))
      .filter(col("cum_tokens") <= 600)
      .select(col("doc_id"), col("source"), col("n_tok"), col("quality"), col("cum_tokens"))
  }

  /** Leakage-safe (group-aware) train/val/test split: a document's split is
    * decided by its near-dup CLUSTER representative, not its own id — so two
    * near-duplicates can never land on opposite sides of the train/test
    * boundary (the eval-contamination vector a per-doc split leaves open;
    * `dataset_split` is the per-doc baseline, `decontaminate_split` removes
    * known eval docs, and this closes the remaining hole). Singleton docs
    * group as themselves. Assignment hashes the group key through the ONE
    * engine-free multiplicative hash (`Num.splitHash`), so the split is
    * reproducible on any engine/partitioning; being a pure function of the
    * group, it is leakage-free BY CONSTRUCTION, and the per-split
    * n_groups/checksum columns hash-verify the realized assignment. Fifth
    * consumer of the pinned LSH edge table — cluster labels derive once per
    * session; the docs-side join is one doc_id-keyed exchange against the
    * (tiny) clustered-docs label table.
    */
  val datasetSplitGrouped: QueryDef = QueryDef(
    "dataset_split_grouped",
    s"""WITH RECURSIVE $componentsOracleCtes,
       |g AS (
       |  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS grp
       |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id)
       |SELECT CASE WHEN h < 3435973837 THEN 'train'
       |            WHEN h < 3865470566 THEN 'val'
       |            ELSE 'test' END AS split,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(DISTINCT grp) AS BIGINT) AS n_groups,
       |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
       |FROM (SELECT doc_id, grp, ${Num.sqlSplitHash("grp")} AS h FROM g)
       |GROUP BY 1""".stripMargin) { (spark, dir) =>
    val comp = connectedComponents(
      Dedup.lshVerifiedPairsPinned(spark, dir).select(col("doc_a"), col("doc_b")))
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("grp", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("h", Num.splitHash(col("grp")))
      .withColumn("split",
        when(col("h") < lit(3435973837L), "train") // floor(0.8 * 2^32)
          .when(col("h") < lit(3865470566L), "val") // floor(0.9 * 2^32)
          .otherwise("test"))
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        count_distinct(col("grp")).as("n_groups"),
        sum(col("doc_id")).as("id_checksum"))
  }

  val all: Seq[QueryDef] =
    Seq(dedupClusters, vocabTopk, tfidfTopTerms, docRepetition, docTokenDiversity,
      packSequences, decontaminateSplit, corpusMixtureSample, tokenCommonality,
      dedupKeepBest, termCooccurrence, sourceVocabOverlap, crossSourceNeardup,
      corpusBudgetSelect, datasetSplitGrouped)
}
