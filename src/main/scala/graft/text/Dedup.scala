package graft.text

import graft.core.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — the dedup half of a
  * training-data pipeline:
  *
  *  - exact dedup: group-by full content (hash-groupBy; one shuffle on the
  *    content hash);
  *  - n-gram Jaccard: shingle arrays + `array_intersect`/`array_union`;
  *  - MinHash + LSH: shingle -> k minhashes -> banded bucket-join, candidate
  *    pairs verified with exact Jaccard. This is the 100 TB path: candidate
  *    generation shuffles only (band_id, band_key) — never the O(n²) pair
  *    space;
  *  - SimHash: 64-bit signature from per-token hashes, near-dup candidates via
  *    16-bit chunk blocking (Hamming ≤ 3 guarantees two equal chunks by
  *    pigeonhole over 4 chunks).
  *
  * MinHash/SimHash carry FULL DuckDB oracles like every other registered
  * query — not by restating the hash functions (MinHash's signature loop
  * uses xxhash64; SimHash uses a portable polynomial family) but because
  * each near-dup oracle states the EXHAUSTIVE O(n²) answer, which is
  * hash-independent: a hash match is therefore a realized-recall proof for
  * the candidate generator. ScalaTest additionally pins the
  * planted-near-duplicate behavior (dups must pair; disjoint docs must not).
  */
object Dedup {

  /** Exact dedup via full-content group-by; emits the canonical survivor
    * (min doc_id) + multiplicity + content hash.
    */
  val dedupExact: QueryDef = QueryDef(
    "dedup_exact_text",
    """SELECT sha256(text) AS text_hash,
      |  CAST(min(doc_id) AS BIGINT) AS keep_id,
      |  CAST(count(*) AS BIGINT) AS n_copies
      |FROM documents
      |GROUP BY text""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(sha2(col("text"), 256).as("text_hash"), col("keep_id"), col("n_copies"))
  }

  /** Word-bigram shingle set of `text` (distinct), as a SQL expression.
    * `zip_with(tokens, tokens[1:], concat)` — the naive
    * `transform(sequence(...), i -> element_at(split(...), i))` form
    * re-evaluates `split` *per element* (O(tokens²) per row); this form
    * evaluates it a constant number of times.
    */
  private[text] def shinglesSpark(textCol: String): String =
    s"""CASE WHEN size(split($textCol, ' ')) >= 2
       |THEN array_distinct(zip_with(
       |       slice(split($textCol, ' '), 1, size(split($textCol, ' ')) - 1),
       |       slice(split($textCol, ' '), 2, size(split($textCol, ' ')) - 1),
       |       (a, b) -> concat(a, ' ', b)))
       |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin

  private[text] def shinglesSql(textCol: String): String =
    s"""CASE WHEN len(string_split($textCol, ' ')) >= 2
       |THEN list_distinct(list_transform(
       |       range(1, len(string_split($textCol, ' '))),
       |       i -> string_split($textCol, ' ')[i] || ' ' || string_split($textCol, ' ')[i + 1]))
       |ELSE [] END""".stripMargin

  /** n-gram (word-bigram) Jaccard similarity between consecutive documents —
    * a deterministic, oracle-checkable exercise of the shingle/Jaccard
    * machinery (the scale path for *candidate generation* is the LSH query
    * below; Jaccard verification itself is this same expression).
    */
  val ngramJaccardConsecutive: QueryDef = QueryDef(
    "ngram_jaccard_consecutive",
    s"""WITH sh AS (
       |  SELECT doc_id, ${shinglesSql("text")} AS s
       |  FROM documents)
       |SELECT a.doc_id AS doc_id, b.doc_id AS next_doc_id,
       |  CAST(len(list_intersect(a.s, b.s)) AS INTEGER) AS n_common,
       |  CAST(len(list_distinct(list_concat(a.s, b.s))) AS INTEGER) AS n_union,
       |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |    / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) AS jaccard
       |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
       |WHERE len(list_distinct(list_concat(a.s, b.s))) > 0""".stripMargin) { (spark, dir) =>
    val sh = Tables.documents(spark, dir)
      .selectExpr("doc_id", s"${shinglesSpark("text")} AS s")
    val a = sh.as("a")
    val b = sh.as("b")
    a.join(b, col("b.doc_id") === col("a.doc_id") + 1)
      .select(
        col("a.doc_id").as("doc_id"),
        col("b.doc_id").as("next_doc_id"),
        size(array_intersect(col("a.s"), col("b.s"))).as("n_common"),
        size(array_union(col("a.s"), col("b.s"))).as("n_union"))
      .filter(col("n_union") > 0)
      .withColumn("jaccard", col("n_common").cast("double") / col("n_union").cast("double"))
  }

  private val NumHashes = 16
  private val BandSize = 4 // 4 bands x 4 rows
  /** Bands in the LSH banding scheme — public so state-size bounds in specs
    * derive from the scheme (≤ one bucket per band per in-horizon doc)
    * instead of hard-coding the current 16/4 split.
    */
  val NumBands: Int = NumHashes / BandSize

  /** doc_id + shingle array + minhash signature array (length [[NumHashes]]):
    * one codegen'd pass over the shingles via
    * [[graft.functions.MinHashSignature]] (double-hashing family), replacing
    * k interpreted `array_min(transform(...))` walks.
    */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    signaturesOf(Tables.documents(spark, dir))

  /** Same signature derivation over any (doc_id, text) frame — batch or
    * streaming (all expressions here are row-local, so the streaming planner
    * accepts them unchanged).
    */
  def signaturesOf(docs: DataFrame, carry: Seq[String] = Nil): DataFrame =
    docs
      .selectExpr(Seq("doc_id") ++ carry ++ Seq(s"${shinglesSpark("text")} AS s"): _*)
      .filter(size(col("s")) > 0)
      .withColumn("sig",
        graft.functions.MinHashSignature.minhashSigs(col("s"), NumHashes))

  /** MinHash+LSH near-dup pairs: band the signature, shuffle on
    * (band, band-key), emit within-bucket pairs, verify with exact Jaccard,
    * keep pairs >= 0.5. Candidate generation is linear in documents (no
    * cross join anywhere); the only quadratic term is within a bucket, which
    * LSH keeps tiny by construction.
    */
  /** (doc_id, band, key) bucket rows from a signature frame. Band keys are a
    * single 64-bit hash of the band's minhash slice — the bucket shuffle
    * carries (doc_id, band, key) only, never the shingle arrays (at 100 TB
    * the arrays dominate the row size; shuffling them with every band would
    * multiply shuffle IO by bands x array-size). Shared by the batch LSH
    * query and the streaming stateful variant.
    */
  def bandBuckets(sig: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val bandKeys = (0 until NumHashes / BandSize).map { b =>
      val slots = (0 until BandSize)
        .map(j => s"element_at(sig, ${b * BandSize + j + 1})").mkString(", ")
      struct(lit(b).as("band"), expr(s"xxhash64($b, $slots)").as("key"))
    }
    val keep = col("doc_id") +: carry.map(col)
    sig
      .select(keep :+ explode(array(bandKeys: _*)).as("bk"): _*)
      .select(keep ++ Seq(col("bk.band").as("band"), col("bk.key").as("key")): _*)
  }

  /** The oracle is the *exhaustive* answer — every pair with exact Jaccard
    * ≥ 0.5 via an O(n²) self-join in DuckDB. The LSH query's output equals
    * it only if candidate generation missed no qualifying pair, so the hash
    * match doubles as a 100%-realized-recall proof for this corpus (28/25/
    * 256 pairs at sf0.001/0.01/0.1, all verified equal; the banding theory
    * makes a miss at J ≥ 0.8 a ≤1e-2 event per pair, and the fixed seed
    * makes the outcome deterministic).
    */
  /** The exhaustive O(n²) near-dup oracle, shared by the batch LSH query and
    * its streaming-ingest sibling: both must equal it exactly, so each hash
    * match is a realized-recall proof for its candidate generator.
    */
  private val exhaustiveNearDupSql: String =
    s"""WITH sh AS (
       |  SELECT doc_id, ${shinglesSql("text")} AS s
       |  FROM documents),
       |nz AS (SELECT doc_id, s FROM sh WHERE len(s) > 0)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |    / CAST(len(list_distinct(a.s || b.s)) AS DOUBLE) AS jaccard
       |FROM nz a JOIN nz b ON b.doc_id > a.doc_id
       |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |    / CAST(len(list_distinct(a.s || b.s)) AS DOUBLE) >= 0.5""".stripMargin

  val minhashLsh: QueryDef = QueryDef(
    "dedup_minhash_lsh", exhaustiveNearDupSql) { (spark, dir) =>
    lshVerifiedPairsPinned(spark, dir)
  }

  /** The STREAMING ingest form of the near-dup pipeline through the gate:
    * documents arrive as a stream, signatures/band keys are computed
    * row-locally in-flight, per-bucket state pairs each arrival against its
    * bucket history ([[graft.streaming.Streams.streamingLshCandidates]] —
    * candidates stream out incrementally, state linear in corpus size), and
    * the exact-Jaccard verification runs as the batch stage downstream of
    * the candidate stream — precisely how a continuous-ingest corpus keeps
    * its near-dup edge set current. Run over the same corpus it must emit
    * the batch pipeline's verified pair set, so the SAME exhaustive oracle
    * grades it (hash match = the incremental generator lost no pair).
    */
  val streamingLshIngest: QueryDef = QueryDef(
    "streaming_lsh_ingest", exhaustiveNearDupSql) { (spark, dir) =>
    val sess = spark.newSession()
    // state parallelism derived, not pinned: documents footprint / 64 MB,
    // floored at the measured gate-scale optimum (8) and capped at the
    // parent's configured parallelism — a constant here capped the ingest
    // at 8-way state regardless of core count or corpus size
    sess.conf.set("spark.sql.shuffle.partitions",
      graft.streaming.Streams.statePartitions(
        spark, dir, Seq("documents"), floor = 8).toString)
    // Injectable state-store provider (`spark.graft.lsh.stateProvider` on
    // the calling session: "hdfs" default | "rocksdb"). At real scale
    // RocksDB is the right provider — state no longer bounded by executor
    // heap — while the HDFS-backed default here is a measured GATE-SCALE
    // optimization only (RocksDB's per-partition snapshot lifecycle costs
    // seconds per micro-batch at this corpus size). StreamsSpec runs the
    // candidate generator under BOTH providers and asserts identical
    // output, so the choice is performance-only, never a semantic fork.
    if (spark.conf.get("spark.graft.lsh.stateProvider", "hdfs") == "rocksdb")
      sess.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val docs = graft.streaming.Streams.readTableStream(sess, dir, "documents")
    val cands = graft.streaming.Streams.streamingLshCandidates(sess, docs).toDF()
    val table = s"graft_streaming_lsh_${System.nanoTime()}"
    val emitted = graft.streaming.Streams
      .runAvailableNowToMemory(sess, cands, table,
        org.apache.spark.sql.streaming.OutputMode.Append())
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b") // a pair may collide in several bands
    // verification signatures: fan the narrow docs out before the per-row
    // k-hash MinHash loop (it ran in one task off the single-split scan),
    // and checkpoint so BOTH verify joins read one derivation instead of
    // recomputing the signatures per join side
    val sigs = signaturesOf(graft.core.Par.fanOut(Tables.documents(sess, dir)))
      .select(col("doc_id"), col("s")).localCheckpoint()
    verifyPairs(emitted, sigs)
  }

  /** Exact-Jaccard verification of an LSH candidate pair set — ONE
    * definition for the batch and streaming ingest paths (the threshold
    * and the shingle representation must never fork between them): join
    * the (candidate-count-sized) pairs back to the shingle arrays and keep
    * pairs with Jaccard >= 0.5.
    */
  private def verifyPairs(cand: DataFrame, signatures: DataFrame): DataFrame = {
    val sh = signatures.select(col("doc_id"), col("s"))
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("s").as("sa")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("s").as("sb")), Seq("doc_b"))
      .withColumn("n_common", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("n_union", size(array_union(col("sa"), col("sb"))))
      .withColumn("jaccard", col("n_common").cast("double") / col("n_union").cast("double"))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** LSH candidate pairs verified with exact Jaccard >= 0.5 — columns
    * (doc_a, doc_b, jaccard), doc_a < doc_b. The near-dup *edge set* consumed
    * both by the pair query above and by the cluster-formation step
    * ([[Corpus.dedupClusters]]).
    */
  def lshVerifiedPairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignatures(spark, dir)
    val buckets = bandBuckets(sig)
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") &&
          col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    verifyPairs(cand, sig)
  }

  /** [[lshVerifiedPairs]] materialized once per (session, corpus) and shared
    * by every consumer — the pair query, cluster formation, and keep-best
    * consolidation all read ONE pinned edge table instead of re-running the
    * signature/band-join/Jaccard derivation per query. This is how the dedup
    * stage runs in a real pipeline (edges are derived once, then fanned out
    * to reporting + clustering + survivor selection); the pinned table is
    * candidate-pair-sized, orders of magnitude below the corpus.
    */
  def lshVerifiedPairsPinned(spark: SparkSession, dir: String): DataFrame =
    graft.core.Pinned.table(spark, dir, "lsh_verified_pairs")(lshVerifiedPairs(spark, dir))

  /** 64-bit SimHash per document: per-token xxhash64, each of the 64 bits
    * votes +1/-1, sign of the tally is the signature bit.
    *
    * Computed per row by the codegen'd [[graft.functions.SimHash64]]
    * expression — the token array never leaves the row, so there is no
    * generator, no shuffle, and no 64-buffer aggregation (the previous
    * explode → groupBy(doc_id) formulation paid all three; signatures are
    * bit-identical, DedupSpec asserts the equivalence).
    */
  def simhashTable(docs: DataFrame, portable: Boolean = false): DataFrame =
    docs.select(
      col("doc_id"),
      graft.functions.SimHash64.simhash64(split(col("text"), " "), portable).as("sh"))

  /** SimHash near-dup candidates: block on any equal 15-bit chunk
    * (pigeonhole: Hamming ≤ 3 over 4 chunks ⇒ some chunk equal), then
    * verify Hamming ≤ 3.
    *
    * Uses the *portable* 60-bit hash family of
    * [[graft.functions.SimHash64]], so the DuckDB oracle rebuilds the exact
    * signatures from polynomial code-point folds and answers the exhaustive
    * O(n²) Hamming question. Equality here is STRUCTURAL, not corpus luck:
    * chunk blocking can never miss a Hamming ≤ 3 pair, so LSH output ==
    * exhaustive output on any data.
    */
  val simhashNearDup: QueryDef = QueryDef(
    "dedup_simhash",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |folds AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(range(1, length(tok) + 1), i -> CAST(ord(tok[i]) AS BIGINT))),
      |      (a, c) -> (a * 31 + c) % 1073741789) AS p1,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(range(1, length(tok) + 1), i -> CAST(ord(tok[i]) AS BIGINT))),
      |      (a, c) -> (a * 131 + c) % 1073741783) AS p2
      |  FROM toks),
      |mix1 AS (
      |  SELECT doc_id,
      |    (p1 * p1 + 987654321) % 1073741789 AS y1,
      |    (p2 * p2 + 987654321) % 1073741783 AS y2
      |  FROM folds),
      |th AS (
      |  SELECT doc_id,
      |    ((y1 * y1 + 123456789) % 1073741789) * 1073741824
      |    + ((y2 * y2 + 123456789) % 1073741783) AS h
      |  FROM mix1),
      |bits AS (
      |  SELECT doc_id, b.b AS b,
      |         SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      |  FROM th, (SELECT unnest(range(0, 60)) AS b) b
      |  GROUP BY 1, 2),
      |sig AS (
      |  SELECT doc_id,
      |         CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS sh
      |  FROM bits GROUP BY 1)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
      |FROM sig a JOIN sig b ON b.doc_id > a.doc_id
      |WHERE bit_count(xor(a.sh, b.sh)) <= 3""".stripMargin) { (spark, dir) =>
    // per-row simhash64 is two polynomial folds over every character plus
    // 60 bit votes per token — fan the docs out so the signature pass
    // doesn't run in the single-row-group scan's one task (guide §2.4/§8)
    val docs = simhashTable(graft.core.Par.fanOut(Tables.documents(spark, dir)),
      portable = true)
    val chunked = docs.select(
      col("doc_id"), col("sh"),
      explode(expr(
        "transform(sequence(0, 3), c -> struct(c AS chunk, shiftright(sh, c * 15) & 32767L AS key))")).as("ck"))
      .select(col("doc_id"), col("sh"), col("ck.chunk").as("chunk"), col("ck.key").as("key"))
    val a = chunked.as("a")
    val b = chunked.as("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") &&
          col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("int").as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= 3)
  }

  /** Blocked fuzzy join (entity resolution): every corrupted part name —
    * one deterministic character deletion at a key-derived position —
    * matched back to the catalog of distinct names at edit distance ≤ 1,
    * WITHOUT an all-pairs comparison. Blocking is the pigeonhole half
    * scheme (PassJoin's k+1-segment idea at k=1, and the string analog of
    * [[simhash]]'s chunk blocking): one edit can damage only one half of
    * the original, so every true match shares either its intact FIRST half
    * (as the corrupted string's prefix) or its intact SECOND half (as its
    * suffix). Candidates therefore come from an equi-join on
    * (side, segment); the bounded per-row key fan-out (one prefix + one
    * suffix per possible half length, derived from the catalog's 2-row
    * min/max length bounds) replaces the O(n·m) cross product, and the
    * exact `levenshtein` verify is row-local. The oracle is the EXHAUSTIVE
    * O(n·m) distance scan in DuckDB, so the hash match proves the blocking
    * lost no qualifying pair — realized recall, the `dedup_minhash_lsh`
    * contract for edit distance. At 100 TB the same plan holds: the
    * shuffle carries only (side, segment) keys and the catalog side is
    * segment-indexed once.
    */
  val fuzzyJoinBlocked: QueryDef = QueryDef(
    "fuzzy_join_blocked",
    """WITH names AS (SELECT DISTINCT p_name FROM part),
      |c AS (
      |  SELECT p_partkey AS c_key,
      |    substring(p_name, 1, pos - 1) || substring(p_name, pos + 1) AS c_name
      |  FROM (SELECT p_partkey, p_name,
      |          2 + (p_partkey % (length(p_name) - 2)) AS pos
      |        FROM part))
      |SELECT c.c_key, c.c_name, n.p_name AS matched_name,
      |  CAST(levenshtein(c.c_name, n.p_name) AS INTEGER) AS dist
      |FROM c JOIN names n ON levenshtein(c.c_name, n.p_name) <= 1""".stripMargin) {
    (spark, dir) =>
      val parts = Tables.part(spark, dir)
      val names = parts.select(col("p_name")).distinct()
        .withColumn("len", length(col("p_name")))
      // 2-row driver-held model state: the catalog's half-length bounds
      // decide how many prefix/suffix keys each corrupted row emits
      val Array(minH1, maxH2) = {
        val r = names.agg(min(expr("CAST(len / 2 AS INT)")), max(expr("len - CAST(len / 2 AS INT)"))).head()
        Array(r.getInt(0), r.getInt(1))
      }
      val segs = names
        .select(col("p_name").as("matched_name"), lit(1).as("side"),
          expr("substring(p_name, 1, CAST(len / 2 AS INT))").as("seg"))
        .unionByName(names
          .select(col("p_name").as("matched_name"), lit(2).as("side"),
            expr("substring(p_name, CAST(len / 2 AS INT) + 1)").as("seg")))
      val corrupted = parts
        .select(col("p_partkey").as("c_key"),
          expr("2 + p_partkey % (length(p_name) - 2)").as("pos"), col("p_name"))
        .select(col("c_key"),
          expr("concat(substring(p_name, 1, pos - 1), substring(p_name, pos + 1))").as("c_name"))
      val ckeys = corrupted
        .select(col("c_key"), col("c_name"), explode(expr(
          s"""flatten(array(
             |  transform(sequence($minH1, $maxH2),
             |    h -> struct(1 AS side, substring(c_name, 1, h) AS seg)),
             |  transform(sequence($minH1, $maxH2),
             |    h -> struct(2 AS side, substring(c_name, length(c_name) - h + 1, h) AS seg))))""".stripMargin))
          .as("k"))
        .select(col("c_key"), col("c_name"), col("k.side"), col("k.seg"))
      ckeys.join(segs, Seq("side", "seg"))
        .select(col("c_key"), col("c_name"), col("matched_name"))
        .dropDuplicates("c_key", "c_name", "matched_name")
        .filter(levenshtein(col("c_name"), col("matched_name")) <= 1)
        .select(
          col("c_key"), col("c_name"), col("matched_name"),
          levenshtein(col("c_name"), col("matched_name")).cast("int").as("dist"))
  }

  /** Span-level exact dedup (the substring-granularity pass of a
    * training-data pipeline, after the document-level passes above): find
    * every window of [[SpanW]] consecutive tokens that also occurs in at
    * least one OTHER document, and report per-document how much of the text
    * is made of such cross-document spans. Whole-doc dedup misses boilerplate
    * (shared headers, license blocks, templated paragraphs) that repeats
    * inside otherwise-distinct documents; this query is the standard remedy
    * (cf. the suffix-array dedup of "Deduplicating Training Data Makes
    * Language Models Better" — here with fixed-width windows, which is the
    * shuffle-friendly distributed formulation).
    *
    * Plan shape (the 100 TB story): span explosion is row-local (O(tokens)
    * spans per doc, each materialized once from a pinned token array — never
    * the O(tokens·W) re-split form). The position rows then shuffle ONCE on
    * the span string (`repartition(span)` ahead of the (span, doc_id)
    * aggregate lets the span-partitioned dup-marking window reuse the SAME
    * exchange — HashPartitioning(span) satisfies both), and the per-doc
    * rollup is the only other exchange. One corpus scan, no join against a
    * dup-span table at all — the join formulation either broadcasts that
    * table (OOM when boilerplate is heavy at scale) or re-shuffles the spans.
    * At larger W you would shuffle a 128-bit span hash instead of the text
    * (sha256 keeps it engine-independent); at W = 8 over word tokens the
    * string is already hash-sized, so the plain string keeps the oracle
    * simple.
    */
  private val SpanW = 8

  val spanDedup: QueryDef = QueryDef(
    "dedup_span_exact",
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |spans AS (
       |  SELECT doc_id, array_to_string(t[u.i : u.i + ${SpanW - 1}], ' ') AS span
       |  FROM toks, UNNEST(range(1, len(t) - ${SpanW - 2})) AS u(i)
       |  WHERE len(t) >= $SpanW),
       |dup AS (
       |  SELECT span FROM spans GROUP BY span
       |  HAVING count(DISTINCT doc_id) >= 2)
       |SELECT s.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_spans,
       |  CAST(sum(CASE WHEN d.span IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
       |  CAST(sum(CASE WHEN d.span IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS dup_frac
       |FROM spans s LEFT JOIN dup d USING (span)
       |GROUP BY 1""".stripMargin) { (spark, dir) =>
    // the span explode below multiplies each doc into ~token-count rows of
    // W-token strings (measured: 7.7 MB of spans built in ONE task off the
    // single-split scan) — fan the narrow docs out first (guide §2.4/§8)
    val spans = graft.core.Par.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= SpanW)
      .select(col("doc_id"),
        explode(expr(
          s"transform(sequence(1, size(t) - ${SpanW - 1}), i -> array_join(slice(t, i, $SpanW), ' '))"))
          .as("span"))
    val pairs = spans
      .repartition(col("span"))
      .groupBy(col("span"), col("doc_id"))
      .agg(count(lit(1)).as("n_pos"))
    val nDocs = count(lit(1)).over(Window.partitionBy(col("span")))
    pairs
      .withColumn("n_docs", nDocs)
      .groupBy(col("doc_id"))
      .agg(
        sum(col("n_pos")).as("n_spans"),
        sum(when(col("n_docs") >= 2, col("n_pos")).otherwise(0L)).as("n_dup_spans"))
      .withColumn("dup_frac",
        col("n_dup_spans").cast("double") / col("n_spans").cast("double"))
  }

  /** Containment (quote / subset) join: all ORDERED pairs (a, b) with
    * containment |sh(a) ∩ sh(b)| / |sh(a)| >= 0.8 over distinct word-bigram
    * shingles — the asymmetric near-dup question Jaccard-based LSH
    * structurally misses (a short doc quoted inside a long one has high
    * containment but low Jaccard, so no MinHash band agrees).
    *
    * Engine plan is PREFIX FILTERING (the PPJoin family — Xiao et al.,
    * WWW'08): containment >= 0.8 means b misses at most floor(|sh(a)|/5)
    * of a's shingles, so ANY (floor(|sh(a)|/5)+1)-subset of sh(a) must hit
    * b — the candidate join only explodes that prefix of each probe doc,
    * taken in ascending global document frequency so the joined posting
    * lists are the rarest (smallest) available. The pigeonhole makes the
    * candidate set provably COMPLETE for any prefix choice; df-ordering is
    * purely the bucket-size optimization. Verification is one row-local
    * `array_intersect` per candidate, and the >= 0.8 test is exact integer
    * arithmetic (5·inter >= 4·|sh(a)|). The oracle answers exhaustively
    * (O(n²) — gate-scale ground truth, turning the hash match into a
    * realized-recall proof like dedup_embedding_lsh's).
    *
    * At 100 TB: df rollup + one shingle-keyed candidate exchange whose
    * volume is Σ_docs (|prefix| · df(shingle)) — bounded by construction
    * because prefixes prefer rare shingles — plus doc-keyed joins back to
    * shingle arrays. No all-pairs work anywhere in the engine path.
    */
  val containmentJoin: QueryDef = QueryDef(
    "dedup_containment",
    s"""WITH sh AS (
       |  SELECT doc_id, ${shinglesSql("text")} AS s FROM documents),
       |f AS (SELECT doc_id, s FROM sh WHERE len(s) >= 1)
       |SELECT a.doc_id AS a, b.doc_id AS b,
       |  CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
       |  CAST(len(a.s) AS BIGINT) AS na,
       |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / CAST(len(a.s) AS DOUBLE)
       |    AS containment
       |FROM f a, f b
       |WHERE a.doc_id != b.doc_id
       |  AND 5 * len(list_intersect(a.s, b.s)) >= 4 * len(a.s)""".stripMargin) {
    (spark, dir) =>
      containmentPairsPinned(spark, dir)
  }

  /** Prefix-filtered containment >= 0.8 over (doc_id, s: array<string>)
    * rows; see [[containmentJoin]].
    *
    * Shingles are first DICTIONARY-ENCODED to dense integer ids in global
    * (df, shingle) order — the standard "integerize before the similarity
    * join" move. It buys three things at once: (1) each doc's id array
    * sorted ascending IS its df-ranked order, so the rare prefix is a
    * plain `slice` — no per-doc struct sort; (2) the verification
    * intersects int arrays instead of string arrays (the string hashing
    * dominated the original plan: 10M candidate verifications × ~50-string
    * hash sets — observed 37 s at sf0.1, ~6× this form); (3) candidate and
    * index rows ship 8-byte ids. Id assignment runs over the vocabulary-
    * sized df table through [[graft.ops.Ranking.globalRankBy]] — the
    * range-partitioned global rank, so the dictionary derivation has NO
    * single-partition stage and survives a vocabulary that grows with the
    * corpus. A size filter
    * (containment 0.8 forces 5·|B| >= 4·|A|) prunes candidates before the
    * pair dedup. Results are identical to the string form: the encoding is
    * bijective.
    */
  def containmentPairs(sh: DataFrame): DataFrame =
    containmentPairsFromIds(shingleIds(sh))

  /** Dictionary-encode (doc_id, s: array<string>) rows to (doc_id,
    * ids: sorted array<int> in global (df, shingle) order, n) — the shared
    * representation both set-similarity joins verify on.
    *
    * The id is the range-partitioned global rank of the shingle under the
    * total order (df, shingle) ([[graft.ops.Ranking.globalRankBy]]): the
    * same dense 1..V numbering a bare `row_number() OVER (ORDER BY df, sh)`
    * would produce, but with the vocabulary range-exchanged across
    * partitions instead of serialized through one window task — the
    * derivation scales with the corpus vocabulary. Ids stay `int`: the
    * verify kernel ([[graft.functions.VectorFunctions.sortedIntersectCount]])
    * walks int arrays, and a >2^31 SHINGLE VOCABULARY would first break
    * the arrays themselves, not this cast.
    */
  def shingleIds(sh: DataFrame): DataFrame = {
    val ex = sh.select(col("doc_id"), explode(col("s")).as("sh"))
    val df = ex.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val dict = graft.ops.Ranking.globalRankBy(df, Seq("df", "sh"), "sid")
      .select(col("sh"), col("sid").cast("int").as("sid"))
    ex.join(dict, "sh")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(col("sid"))).as("ids"))
      .select(col("doc_id"), col("ids"), size(col("ids")).as("n"))
  }

  /** Session-pinned dictionary-id table of the documents corpus — derived
    * once, checkpointed, shared by the containment and exact-Jaccard joins
    * (prefixes, indexes, and verify sides all read it).
    */
  def docShingleIdsPinned(spark: SparkSession, dir: String): DataFrame =
    graft.core.Pinned.table(spark, dir, "shingle_ids")(
      shingleIds(
        Tables.documents(spark, dir)
          .selectExpr("doc_id", s"${shinglesSpark("text")} AS s")
          .filter(size(col("s")) >= 1)))

  /** Session-pinned containment >= 0.8 pair table over the pinned
    * dictionary ids — derived once, shared by [[containmentJoin]] and the
    * corpus dedup report (which consumes it twice: pair count + endpoint
    * union). Pair-sized, orders of magnitude below the corpus.
    */
  def containmentPairsPinned(spark: SparkSession, dir: String): DataFrame =
    graft.core.Pinned.table(spark, dir, "containment_pairs")(
      containmentPairsFromIds(docShingleIdsPinned(spark, dir)))

  /** Session-pinned exact-Jaccard >= 0.8 pair table; same sharing contract
    * as [[containmentPairsPinned]].
    */
  def jaccardPairsPinned(spark: SparkSession, dir: String): DataFrame =
    graft.core.Pinned.table(spark, dir, "jaccard_pairs")(
      jaccardPairsFromIds(docShingleIdsPinned(spark, dir)))

  /** Prefix-filtered containment >= 0.8 over dictionary-id rows. */
  def containmentPairsFromIds(sidsIn: DataFrame): DataFrame = {
    val sids = sidsIn
    val prefix = sids.select(
      col("doc_id").as("a"), col("n").as("na"),
      // rarest floor(|s|/5)+1 shingle ids: any 0.8-containing doc must share one
      explode(expr("slice(ids, 1, CAST(n div 5 AS INT) + 1)")).as("sid"))
    val index = sids.select(
      col("doc_id").as("b"), col("n").as("nb"),
      posexplode(col("ids")).as(Seq("pb0", "sid")))
    // PPJoin positional filter: take s = the SMALLEST shared id of a
    // qualifying pair. Its position in b satisfies pb <= |B| - ceil(0.8|A|)
    // + 1 (the >= 0.8|A| shared ids sit at distinct positions >= pb), i.e.
    // 5*pb <= 5*nb - 4*na + 5 — so keeping only index entries passing that
    // bound still keeps at least one generating match per true pair, while
    // dropping the bulk of each posting list. The size filter
    // (5|B| >= 4|A|) is the pb >= 1 special case but cheaper to test first.
    val candidates = prefix
      .join(index, "sid")
      .filter(
        col("a") =!= col("b") &&
          lit(5) * col("nb") >= lit(4) * col("na") &&
          lit(5) * (col("pb0") + 1) <= lit(5) * col("nb") - lit(4) * col("na") + 5)
      .select(col("a"), col("b"))
      .distinct()
    candidates
      .join(sids.select(col("doc_id").as("a"), col("ids").as("ia")), "a")
      .join(sids.select(col("doc_id").as("b"), col("ids").as("ib")), "b")
      .select(
        col("a"), col("b"),
        graft.functions.VectorFunctions
          .sortedIntersectCount(col("ia"), col("ib")).as("inter"),
        size(col("ia")).cast("long").as("na"))
      .filter(lit(5) * col("inter") >= lit(4) * col("na"))
      .withColumn("containment", graft.core.Num.ratio(col("inter"), col("na")))
  }

  /** EXACT Jaccard >= 0.8 similarity SELF-JOIN by all-pairs prefix
    * filtering (Bayardo et al., WWW'07; the PPJoin family) — the
    * deterministic-recall counterpart of [[minhashLsh]]: where MinHash
    * banding finds near-dups with probabilistic recall (and the oracle
    * certifies what it realized), this join PROVABLY finds every
    * qualifying pair. J(A,B) >= t forces the (df, shingle)-ordered
    * prefixes of length |·|/5+1 to intersect, so candidates come from a
    * PREFIX-to-PREFIX join (quadratically smaller than prefix-to-all —
    * the reason all-pairs beats inverted-index probing), plus the length
    * filter 4|A| <= 5|B| ∧ 4|B| <= 5|A|. Verification is the codegen'd
    * merge walk with the threshold in exact integers:
    * 9·inter >= 4·(|A|+|B|). Shares the session-pinned dictionary-id
    * table with [[containmentJoin]].
    */
  val jaccardExact: QueryDef = QueryDef(
    "dedup_jaccard_exact",
    s"""WITH sh AS (
       |  SELECT doc_id, ${shinglesSql("text")} AS s FROM documents),
       |f AS (SELECT doc_id, s FROM sh WHERE len(s) >= 1)
       |SELECT a.doc_id AS a, b.doc_id AS b,
       |  CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
       |  CAST(len(a.s) AS BIGINT) AS na, CAST(len(b.s) AS BIGINT) AS nb,
       |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
       |    CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE)
       |    AS jaccard
       |FROM f a, f b
       |WHERE a.doc_id < b.doc_id
       |  AND 9 * len(list_intersect(a.s, b.s)) >= 4 * (len(a.s) + len(b.s))""".stripMargin) {
    (spark, dir) =>
      jaccardPairsPinned(spark, dir)
  }

  /** All-pairs exact Jaccard >= 0.8 over dictionary-id rows; see
    * [[jaccardExact]].
    */
  def jaccardPairsFromIds(sids: DataFrame): DataFrame = {
    def prefixOf(side: String) = sids.select(
      col("doc_id").as(side), col("n").as(s"n$side"),
      // (1-t)|x|+1 = |x|/5+1 rarest ids: two 0.8-similar sets' prefixes meet
      explode(expr("slice(ids, 1, CAST(n div 5 AS INT) + 1)")).as("sid"))
    val candidates = prefixOf("a")
      .join(prefixOf("b"), "sid")
      .filter(
        col("a") < col("b") &&
          lit(4) * col("na") <= lit(5) * col("nb") &&
          lit(4) * col("nb") <= lit(5) * col("na"))
      .select(col("a"), col("b"))
      .distinct()
    candidates
      .join(sids.select(col("doc_id").as("a"), col("ids").as("ia")), "a")
      .join(sids.select(col("doc_id").as("b"), col("ids").as("ib")), "b")
      .select(
        col("a"), col("b"),
        graft.functions.VectorFunctions
          .sortedIntersectCount(col("ia"), col("ib")).as("inter"),
        size(col("ia")).cast("long").as("na"),
        size(col("ib")).cast("long").as("nb"))
      .filter(lit(9) * col("inter") >= lit(4) * (col("na") + col("nb")))
      .withColumn("jaccard",
        graft.core.Num.ratio(col("inter"), col("na") + col("nb") - col("inter")))
  }

  /** The corpus dedup REPORT: one accounting row composing the dedup
    * family — total docs, how many are redundant exact copies (non-
    * survivors of text groups), how many exact-Jaccard >= 0.8 near-dup
    * pairs and containment >= 0.8 quote pairs exist, and how many docs are
    * CLEAN (not an exact copy, not an endpoint of either pair relation).
    * This is the decision artifact a dedup stage ships to the pipeline
    * owner before anything is dropped.
    *
    * Engine cost is near zero beyond its parts: BOTH pair relations are
    * session-pinned tables ([[jaccardPairsPinned]] /
    * [[containmentPairsPinned]] — each consumed twice here, count leg +
    * endpoint union, so pinning is what keeps the report from re-deriving
    * the joins), the exact groups are one text rollup, and the clean count
    * is two anti-joins against pair-endpoint sets. The oracle recomputes
    * all four legs relationally (the pair legs exhaustively — gate-scale
    * ground truth).
    */
  val dedupReport: QueryDef = QueryDef(
    "corpus_dedup_report",
    s"""WITH sh AS (
       |  SELECT doc_id, ${shinglesSql("text")} AS s FROM documents),
       |f AS (SELECT doc_id, s FROM sh WHERE len(s) >= 1),
       |jp AS (
       |  SELECT a.doc_id AS a, b.doc_id AS b FROM f a, f b
       |  WHERE a.doc_id < b.doc_id
       |    AND 9 * len(list_intersect(a.s, b.s)) >= 4 * (len(a.s) + len(b.s))),
       |cp AS (
       |  SELECT a.doc_id AS a, b.doc_id AS b FROM f a, f b
       |  WHERE a.doc_id != b.doc_id
       |    AND 5 * len(list_intersect(a.s, b.s)) >= 4 * len(a.s)),
       |exact_extra AS (
       |  SELECT CAST(sum(cnt - 1) AS BIGINT) AS n
       |  FROM (SELECT count(*) AS cnt FROM documents GROUP BY text)),
       |paired AS (
       |  SELECT a AS d FROM jp UNION SELECT b FROM jp
       |  UNION SELECT a FROM cp UNION SELECT b FROM cp),
       |dup_text_docs AS (
       |  SELECT doc_id FROM documents
       |  WHERE text IN (SELECT text FROM documents GROUP BY text HAVING count(*) > 1))
       |SELECT
       |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
       |  (SELECT n FROM exact_extra) AS n_exact_redundant,
       |  (SELECT CAST(count(*) AS BIGINT) FROM jp) AS n_neardup_pairs,
       |  (SELECT CAST(count(*) AS BIGINT) FROM cp) AS n_containment_pairs,
       |  (SELECT CAST(count(*) AS BIGINT) FROM documents
       |   WHERE doc_id NOT IN (SELECT d FROM paired)
       |     AND doc_id NOT IN (SELECT doc_id FROM dup_text_docs)) AS n_clean""".stripMargin) {
    (spark, dir) =>
      val docs = Tables.documents(spark, dir)
      val jp = jaccardPairsPinned(spark, dir).select(col("a"), col("b"))
      val cp = containmentPairsPinned(spark, dir).select(col("a"), col("b"))
      val nDocs = docs.agg(count(lit(1)).as("v"))
      val nExactRedundant = docs.groupBy(col("text"))
        .agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt") - 1).as("v"))
      val nJp = jp.agg(count(lit(1)).as("v"))
      val nCp = cp.agg(count(lit(1)).as("v"))
      val paired = jp.select(col("a").as("d")).unionByName(jp.select(col("b").as("d")))
        .unionByName(cp.select(col("a").as("d"))).unionByName(cp.select(col("b").as("d")))
        .distinct()
      val dupTextDocs = docs.groupBy(col("text")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1).select(col("text"))
        .join(docs, "text").select(col("doc_id"))
      val nClean = docs.select(col("doc_id"))
        .join(paired, col("doc_id") === col("d"), "left_anti")
        .join(dupTextDocs, Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("v"))
      nDocs.select(col("v").as("n_docs"))
        .crossJoin(nExactRedundant.select(col("v").cast("long").as("n_exact_redundant")))
        .crossJoin(nJp.select(col("v").as("n_neardup_pairs")))
        .crossJoin(nCp.select(col("v").as("n_containment_pairs")))
        .crossJoin(nClean.select(col("v").as("n_clean")))
  }

  val all: Seq[QueryDef] =
    Seq(dedupExact, ngramJaccardConsecutive, minhashLsh, streamingLshIngest, simhashNearDup,
      fuzzyJoinBlocked, spanDedup, containmentJoin, jaccardExact, dedupReport)
}
