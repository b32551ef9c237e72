package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus operators: connected-components convergence beyond the near-clique
  * dup graphs the pipeline usually sees.
  */
class CorpusSpec extends SparkSpec {

  test("connected components: long chain converges in O(diameter) rounds with one component") {
    import spark.implicits._
    // path graph 0-1-2-...-11: diameter 11, worst case for hash-to-min
    // (min-label moves exactly one hop per round — no shortcutting)
    val n = 12
    val pairs = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Corpus.connectedComponentsInstrumented(pairs)
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === n)
    assert(out.values.toSet === Set(0L), s"one component labeled by its min: $out")
    // label 0 reaches node k at round k; one extra round detects fixpoint.
    // This documents the O(diameter) bound — near-clique dup graphs finish
    // in 2-3 rounds, a pathological chain in d+1.
    assert(rounds === n, s"expected diameter+1 = $n rounds, got $rounds")
  }

  test("star-contraction CC: same labels as hash-to-min in O(log n) rounds on a long chain") {
    import spark.implicits._
    val n = 32 // diameter 31: hash-to-min would need 32 rounds
    val pairs = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Corpus.connectedComponentsStar(pairs)
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === n)
    assert(out.values.toSet === Set(0L))
    assert(rounds <= 8, s"star contraction should be ~log2($n)+c rounds, got $rounds")
  }

  test("star-contraction CC agrees with hash-to-min on a random multi-component graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // ~3 loose components over 60 nodes, random extra edges inside each
    val pairs = (0 until 3).flatMap { c =>
      val ids = (0 until 20).map(i => (c * 100 + i).toLong)
      val chain = ids.sliding(2).map { case Seq(a, b) => (a, b) }.toSeq
      val extra = (1 to 10).map(_ => (ids(rnd.nextInt(ids.size)), ids(rnd.nextInt(ids.size))))
      chain ++ extra
    }.filter { case (a, b) => a != b }
    val df = pairs.toDF("doc_a", "doc_b")
    val star = Corpus.connectedComponentsStar(df)._1.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h2m = Corpus.connectedComponents(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star === h2m)
  }

  test("sharded packing equals the naive single global cumsum on random sparse ids") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // sparse, shuffled doc_ids (gaps + a huge id) exercise the bounded
    // shard-width derivation; random token counts exercise chunk spans
    val rnd = new scala.util.Random(13)
    val rows = (0 until 300).map { i =>
      val id = i.toLong * 37 + rnd.nextInt(17)
      (id, Seq.fill(1 + rnd.nextInt(40))("w").mkString(" "))
    } :+ ((5_000_000L, "lone far doc"))
    val docs = rows.toMap.toSeq.toDF("doc_id", "text").repartition(7)
    val sharded = Corpus.packed(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val wNaive = Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, 0)
    val naive = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .withColumn("e", sum(col("n")).over(wNaive))
      .selectExpr(
        "doc_id", "n",
        "e - n AS start_off",
        "(e - n) div 256 AS chunk_first",
        "(e - 1) div 256 AS chunk_last",
        "(e - 1) div 256 - (e - n) div 256 + 1 AS n_chunks")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(sharded === naive)
  }

  test("decontamination: planted train/test overlap is flagged, clean test docs are not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "train"),
      (2L, "completely different training material here", "train"),
      (3L, "the quick brown fox appears again today", "test"), // shares shingles with 1
      (4L, "nothing in common with anything else whatsoever", "test"),
      (5L, "irrelevant validation text", "val")
    ).toDF("doc_id", "text", "split")
    val out = Corpus.decontaminationReport(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out.keySet === Set(3L, 4L)) // only test docs are scored
    assert(out(3L)._2, "doc 3 shares 'the quick'/'quick brown' with train doc 1")
    assert(out(3L)._1 >= 2L)
    assert(out(4L) === ((0L, false)))
  }

  test("connected components: disjoint chains get independent min labels") {
    import spark.implicits._
    val pairs = Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), // component 0
      (10L, 11L), (11L, 12L), // component 10
      (20L, 21L) // component 20
    ).toDF("doc_a", "doc_b")
    val (labels, _) = Corpus.connectedComponentsInstrumented(pairs)
    val byCluster = labels.collect()
      .groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(byCluster === Map(
      0L -> Set(0L, 1L, 2L, 3L),
      10L -> Set(10L, 11L, 12L),
      20L -> Set(20L, 21L)))
  }

  test("co-occurrence: hand-computed pair counts, vocab bound excludes rare terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat dog cat"), // distinct {cat, dog}
      (2L, "cat dog bird"),
      (3L, "cat bird"),
      (4L, "dog zebra"), // zebra: df=1, below the vocab cut
      (5L, "cat dog")
    ).toDF("doc_id", "text")
    // df: cat=4 dog=4 bird=2 zebra=1 -> vocab(3) = {cat, dog, bird}
    val got = Corpus.cooccurrence(docs, vocabSize = 3, topK = 10)
      .as[(String, String, Long)].collect().toSeq
    assert(got === Seq(
      ("cat", "dog", 3L), // docs 1, 2, 5
      ("bird", "cat", 2L), // docs 2, 3
      ("bird", "dog", 1L))) // doc 2; zebra pairs absent entirely
  }

  test("source_vocab_overlap: jaccard bounds, symmetry of the pair set, exact on one pair") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val rows = Corpus.sourceVocabOverlap.fn(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, common, na, nb, j) =>
      assert(a < b, "each unordered pair appears once, ordered lexically")
      assert(common <= math.min(na, nb))
      assert(j >= 0.0 && j <= 1.0)
      assert(j === common.toDouble / (na + nb - common).toDouble)
    }
    // exact recomputation for the first pair
    val (a, b, common, na, nb, _) = rows.head
    def vocab(src: String) = graft.core.Tables.documents(spark, dir)
      .filter(col("source") === src)
      .select(explode(split(col("text"), " ")).as("tok"))
      .distinct().collect().map(_.getString(0)).toSet
    val (va, vb) = (vocab(a), vocab(b))
    assert(na === va.size.toLong && nb === vb.size.toLong)
    assert(common === (va intersect vb).size.toLong)
  }

  test("cross_source_neardup: rollup agrees with the pinned pair table joined to sources") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val got = Corpus.crossSourceNeardup.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got.nonEmpty)
    got.foreach { case ((a, b), (n, cross)) =>
      assert(a <= b, "canonical source pair")
      assert(cross <= n)
      assert(if (a == b) cross == 0L else cross == n, "cross counts exactly the a!=b pairs")
    }
    // direct recomputation from the same pinned edge table
    val srcOf = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val direct = Dedup.lshVerifiedPairsPinned(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (srcOf(r.getLong(0)), srcOf(r.getLong(1))))
      .map { case (x, y) => if (x <= y) (x, y) else (y, x) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got.view.mapValues(_._1).toMap === direct)
  }

  test("corpus_budget_select: per-source quality-desc prefix, exact running sums, maximal") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val got = Corpus.corpusBudgetSelect.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(got.nonEmpty)
    // replay the selection directly: same quality expression, Scala-side scan
    val ranked = graft.core.Tables.documents(spark, dir)
      .selectExpr("doc_id", "source", "split(text, ' ') AS tk")
      .filter(size(col("tk")) > 0)
      .selectExpr("doc_id", "source", "CAST(size(tk) AS BIGINT) AS n_tok",
        s"${TextAnalysis.qualitySpark("tk")} AS quality")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._2)
    val expected = ranked.toSeq.flatMap { case (_, docs) =>
      val ordered = docs.sortBy(d => (-d._4, d._1))
      val cums = ordered.scanLeft(0L)(_ + _._3).tail
      ordered.zip(cums).takeWhile(_._2 <= 600L)
        .map { case ((id, src, n, q), c) => (id, src, n, q, c) }
    }.toSet
    assert(got.toSet === expected)
    // maximality: for each source either everything is kept or the next doc overflows
    ranked.foreach { case (src, docs) =>
      val keptTokens = got.filter(_._2 == src).map(_._3).sum
      val ordered = docs.sortBy(d => (-d._4, d._1))
      val nKept = got.count(_._2 == src)
      if (nKept < ordered.length)
        assert(keptTokens + ordered(nKept)._3 > 600L, s"$src selection is maximal")
    }
  }

  test("grouped split: near-dup pairs never straddle splits; rollup matches recompute") {
    import graft.core.{Num, Tables}
    val dir = "/root/testdata/sf0.001"
    // doc-level assignment recomputed exactly as the query defines it
    val comp = Corpus.connectedComponents(
      Dedup.lshVerifiedPairsPinned(spark, dir).select(col("doc_a"), col("doc_b")))
    val perDoc = Tables.documents(spark, dir)
      .select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("grp", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("h", Num.splitHash(col("grp")))
      .withColumn("split",
        when(col("h") < lit(3435973837L), "train")
          .when(col("h") < lit(3865470566L), "val")
          .otherwise("test"))
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // every verified near-dup pair lands on ONE side
    val pairs = Dedup.lshVerifiedPairsPinned(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "testdata must contain planted near-dups")
    pairs.foreach { case (a, b) =>
      assert(perDoc(a) === perDoc(b), s"pair ($a,$b) straddles the split boundary")
    }
    // the query's rollup equals the per-doc recomputation
    val got = Corpus.datasetSplitGrouped.fn(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    val expected = perDoc.toSeq.groupBy(_._2)
      .map { case (s, xs) => s -> ((xs.size.toLong, xs.map(_._1).sum)) }
    assert(got === expected)
    assert(perDoc.size === 500)
  }
}
