package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dedup family over planted corpora: exact dups must collapse, near-dups
  * must pair up under MinHash-LSH and SimHash, disjoint docs must not.
  */
class DedupSpec extends SparkSpec {

  /** Write a documents.parquet into a temp dir shaped like the driver data. */
  private def docsDir(docs: Seq[(Long, String)])(f: String => Unit): Unit =
    withTempDir { dir =>
      import spark.implicits._
      docs.toDF("doc_id", "text")
        .withColumn("lang", lit("en"))
        .withColumn("source", lit("test"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      f(dir.getAbsolutePath)
    }

  private val base = "the quick brown fox jumps over the lazy dog while the cat sleeps near the warm fire and the birds sing in the tall green trees above the quiet garden"
  private val nearDup = base.replace("quiet garden", "silent yard") // small edit
  private val disjoint = "completely different words about spark shuffle partitions and broadcast joins in distributed query engines running on large clusters"

  test("simhash64 expression is bit-identical to the explode/aggregate formulation") {
    import spark.implicits._
    val docs = Seq(1L -> base, 2L -> nearDup, 3L -> disjoint, 4L -> "one", 5L -> base)
      .toDF("doc_id", "text")
    val viaExpr = Dedup.simhashTable(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tokens = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$b")
    }
    val voted = tokens.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sh = (0 until 64)
      .map(b => when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
      .reduce(_ + _)
    val viaAgg = voted.select(col("doc_id"), sh.as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr === viaAgg)
  }

  test("portable token hash: byte fast path equals the code-point fold on any string") {
    import graft.functions.SimHash64
    import org.apache.spark.unsafe.types.UTF8String
    def reference(str: String): Long = { // pure code-point fold + mixing
      var p1 = 0L; var p2 = 0L; var i = 0
      while (i < str.length) {
        val cp = str.codePointAt(i)
        p1 = (p1 * 31L + cp) % SimHash64.Mod1
        p2 = (p2 * 131L + cp) % SimHash64.Mod2
        i += Character.charCount(cp)
      }
      SimHash64.mix(p1, SimHash64.Mod1) * 1073741824L + SimHash64.mix(p2, SimHash64.Mod2)
    }
    val cases = Seq(
      "", "a", "hello", "ascii then ünïcode", "ünïcode first", "汉字漢字",
      "mixed 汉 ascii 字 tail", "emoji 😀 pair", "é́")
    val rnd = new scala.util.Random(11)
    val fuzz = (1 to 200).map(_ => rnd.nextString(rnd.nextInt(24)))
    (cases ++ fuzz).foreach { s =>
      assert(SimHash64.portableHash(UTF8String.fromString(s)) === reference(s), s"for ${s.toList}")
    }
  }

  test("exact dedup collapses identical texts to min doc_id") {
    docsDir(Seq(1L -> base, 2L -> base, 3L -> disjoint)) { dir =>
      val out = Dedup.dedupExact.fn(spark, dir).collect()
      val byCopies = out.map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
      assert(byCopies === Map(1L -> 2L, 3L -> 1L))
    }
  }

  test("minhash LSH pairs near-duplicates, not disjoint docs") {
    docsDir(Seq(1L -> base, 2L -> nearDup, 3L -> disjoint)) { dir =>
      val pairs = Dedup.minhashLsh.fn(spark, dir)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((1L, 2L)))
    }
  }

  test("simhash pairs near-duplicates within hamming 3, not disjoint docs") {
    // SimHash at hamming<=3 is a near-identical detector: one token edited in
    // a ~400-token doc (its real operating envelope); short noisy edits
    // belong to MinHash/Jaccard above.
    val longBase = (0 until 400).map(i => s"w${(i * 17) % 97}").mkString(" ")
    val longNear = longBase.replaceFirst("w33 ", "edited ")
    val longOther = (0 until 400).map(i => s"v${(i * 23) % 89}").mkString(" ")
    docsDir(Seq(1L -> longBase, 2L -> longNear, 3L -> longOther)) { dir =>
      val pairs = Dedup.simhashNearDup.fn(spark, dir)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((1L, 2L)))
    }
  }

  test("ngram jaccard: identical texts = 1.0, near-dups high, disjoint = 0") {
    docsDir(Seq(1L -> base, 2L -> base, 3L -> nearDup, 4L -> disjoint)) { dir =>
      val rows = Dedup.ngramJaccardConsecutive.fn(spark, dir)
        .select("doc_id", "jaccard").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(rows(1L) === 1.0) // 1 vs 2: identical
      assert(rows(2L) > 0.8 && rows(2L) < 1.0) // 2 vs 3: near dup
      assert(rows(3L) === 0.0) // 3 vs 4: disjoint
    }
  }

  test("jaccard bounds: self-similarity 1.0, disjoint 0.0, everything in [0,1]") {
    val docs = (1L to 6L).map(i => i -> s"${"wa wb wc " * i.toInt} tail$i end$i")
    docsDir(docs) { dir =>
      val rows = Dedup.ngramJaccardConsecutive.fn(spark, dir)
        .select("jaccard").collect().map(_.getDouble(0))
      assert(rows.nonEmpty)
      assert(rows.forall(j => j >= 0.0 && j <= 1.0))
    }
  }

  test("simhash of identical documents is identical (hamming 0)") {
    val t = (0 until 100).map(i => s"tok${i % 13}").mkString(" ")
    docsDir(Seq(1L -> t, 2L -> t)) { dir =>
      val out = Dedup.simhashNearDup.fn(spark, dir).collect()
      assert(out.length === 1)
      assert(out.head.getAs[Long]("hamming") === 0L)
    }
  }

  test("minhash signature is stable and has the configured width") {
    docsDir(Seq(1L -> base)) { dir =>
      val sig1 = Dedup.minhashSignatures(spark, dir).select("sig").head().getSeq[Long](0)
      val sig2 = Dedup.minhashSignatures(spark, dir).select("sig").head().getSeq[Long](0)
      assert(sig1.length === 16)
      assert(sig1 === sig2) // deterministic
    }
  }

  test("fuzzy_join_blocked: every corrupted name recovers its original; dist bounded by 1") {
    val dir = "/root/testdata/sf0.001"
    val rows = Dedup.fuzzyJoinBlocked.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, c, m, d) =>
      assert(d >= 0 && d <= 1)
      assert(levenshteinRef(c, m) === d, s"dist($c, $m)")
    }
    // recall: each part's corrupted form must match its own original name
    // (deletion distance is exactly 1) — the pigeonhole blocking may not
    // lose it
    val parts = graft.core.Tables.part(spark, dir)
      .select("p_partkey", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val matched = rows.map(r => (r._1, r._3)).toSet
    parts.foreach { case (key, name) =>
      assert(matched.contains((key, name)), s"part $key lost its own original '$name'")
    }
  }

  test("span dedup counts cross-doc duplicated windows, ignores within-doc repeats") {
    // doc 1 and doc 2 share the 10-token `base` prefix (boilerplate); doc 3
    // is disjoint; doc 4 repeats ITS OWN 8-token phrase twice but shares it
    // with no other doc — its spans must not count as duplicated.
    val tenTok = base.split(" ").take(10).mkString(" ")            // 10 tokens -> 3 spans of 8
    val selfRep = "alpha beta gamma delta epsilon zeta eta theta"  // exactly 8 tokens
    docsDir(Seq(
      1L -> (tenTok + " unique tail one"),
      2L -> (tenTok + " other ending words two"),
      3L -> disjoint,
      4L -> (selfRep + " " + selfRep))) { dir =>
      val out = Dedup.spanDedup.fn(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans")))).toMap
      // 13-token doc -> 6 spans; the 3 spans inside the shared 10-token
      // prefix are the cross-doc duplicated ones.
      assert(out(1L) === ((6L, 3L)))
      assert(out(2L) === ((7L, 3L)))
      assert(out(3L)._2 === 0L)
      // 16 tokens -> 9 spans (the 8-token phrase occurs at positions 1 AND
      // 9 — same doc twice), all from a phrase no OTHER doc has.
      assert(out(4L) === ((9L, 0L)))
    }
  }

  test("containmentPairs: complete vs brute force; catches the quote LSH misses") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val vocabWords = (0 until 60).map(i => s"w$i")
    // 30 random docs + a planted quote: doc 100's text appears inside doc
    // 101's much longer text (high containment 100->101, low Jaccard)
    val short = Seq.fill(12)(vocabWords(rnd.nextInt(60))).mkString(" ")
    val long = (Seq.fill(40)(vocabWords(rnd.nextInt(60))) ++ short.split(" ") ++
      Seq.fill(40)(vocabWords(rnd.nextInt(60)))).mkString(" ")
    val docs = (1L to 30L).map(i =>
      (i, Seq.fill(6 + rnd.nextInt(30))(vocabWords(rnd.nextInt(60))).mkString(" "))) ++
      Seq((100L, short), (101L, long))
    val sh = docs.toDF("doc_id", "text")
      .selectExpr("doc_id", s"${Dedup.shinglesSpark("text")} AS s")
      .filter(size(col("s")) >= 1)
    val got = Dedup.containmentPairs(sh)
      .select("a", "b", "inter", "na").as[(Long, Long, Long, Long)].collect().toSet
    // brute force over the same shingle sets
    val sets = sh.select("doc_id", "s").as[(Long, Seq[String])].collect()
      .map { case (id, s) => id -> s.toSet }.toMap
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b
      inter = (sa & sb).size.toLong
      if 5 * inter >= 4 * sa.size.toLong
    } yield (a, b, inter, sa.size.toLong)).toSet
    assert(got === want)
    // the planted quote is found in the contained direction...
    assert(got.exists { case (a, b, _, _) => a == 100L && b == 101L })
    // ...and it is exactly the case Jaccard misses: similarity is low
    val (s100, s101) = (sets(100L), sets(101L))
    val jac = (s100 & s101).size.toDouble / (s100 | s101).size.toDouble
    assert(jac < 0.3, s"quote pair should be low-Jaccard, got $jac")
  }

  test("jaccardPairsFromIds: complete vs brute force on seeded docs with planted near-dups") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vocabWords = (0 until 50).map(i => s"w$i")
    def doc(n: Int) = Seq.fill(n)(vocabWords(rnd.nextInt(50))).mkString(" ")
    val base = doc(40)
    // planted: identical pair + one-word-substituted near-dup
    val nearDup = {
      val t = base.split(" "); t(5) = "zz"; t.mkString(" ")
    }
    val docs = (1L to 25L).map(i => (i, doc(8 + rnd.nextInt(40)))) ++
      Seq((100L, base), (101L, base), (102L, nearDup))
    val sh = docs.toDF("doc_id", "text")
      .selectExpr("doc_id", s"${Dedup.shinglesSpark("text")} AS s")
      .filter(size(col("s")) >= 1)
    val got = Dedup.jaccardPairsFromIds(Dedup.shingleIds(sh))
      .select("a", "b", "inter").as[(Long, Long, Long)].collect().toSet
    val sets = sh.select("doc_id", "s").as[(Long, Seq[String])].collect()
      .map { case (id, s) => id -> s.toSet }.toMap
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size.toLong
      if 9 * inter >= 4 * (sa.size.toLong + sb.size.toLong)
    } yield (a, b, inter)).toSet
    assert(got === want)
    assert(got.exists { case (a, b, _) => a == 100L && b == 101L }) // identical pair
    assert(got.exists { case (a, b, _) => Set(a, b).subsetOf(Set(100L, 101L, 102L)) &&
      (a, b) != ((100L, 101L)) }) // the substituted near-dup pairs too
  }

  test("shingleIds: dictionary derivation has no single-partition exchange") {
    import spark.implicits._
    // spark.range-derived input so nothing constant-folds away (literal
    // local DataFrames fold; see PlanSpec conventions)
    val sh = spark.range(200)
      .selectExpr("id AS doc_id",
        "transform(sequence(0, cast(id % 7 AS int)), i -> concat('w', (id + i) % 40)) AS s")
      .filter(size(col("s")) >= 1)
    val ids = Dedup.shingleIds(sh)
    val plan = ids.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"dictionary-id derivation must range-partition, got:\n$plan")
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"),
      s"expected a range exchange in:\n$plan")
    // and the ids are still the dense global (df, sh) rank: 1..V, bijective
    val dict = sh.select(explode(col("s")).as("sh")).groupBy("sh").count()
    val v = dict.count()
    val seen = ids.select(explode(col("ids")).as("sid")).distinct()
      .as[Int].collect().sorted
    assert(seen.head >= 1 && seen.last <= v)
  }

  test("corpus_dedup_report: legs are mutually consistent on the test corpus") {
    val r = Dedup.dedupReport.fn(spark, "/root/testdata/sf0.001").collect().head
    val nDocs = r.getAs[Long]("n_docs")
    val nExact = r.getAs[Long]("n_exact_redundant")
    val nClean = r.getAs[Long]("n_clean")
    assert(nDocs === 500L)
    // every exact-dup pair is also a Jaccard-1.0 near-dup pair, so the near
    // -dup relation is at least as large as the pairs inside text groups
    assert(r.getAs[Long]("n_neardup_pairs") >= nExact)
    // containment counts ordered pairs; identical docs contain each other
    // both ways, so it at least doubles the exact-redundancy evidence
    assert(r.getAs[Long]("n_containment_pairs") >= 2L * nExact)
    // clean + flagged-by-something never exceeds the corpus; the near-dup
    // leg actually flagged docs (this corpus has no exact text copies, so
    // the pair relations are what bite)
    assert(nClean < nDocs && nClean > 0L)
    assert(r.getAs[Long]("n_neardup_pairs") > 0L)
    assert(r.getAs[Long]("n_containment_pairs") > 0L)
  }

  /** Reference Levenshtein (full DP) to pin the engine's distance. */
  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
