package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[LanguageModel]] — defining properties checked independently of the
  * DuckDB oracle, on the sf0.001 testdata like the queries themselves.
  */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("inverted_index: postings are a sorted ≤10-prefix and df counts each doc once") {
    val rows = LanguageModel.invertedIndex.fn(spark, dir)
      .as[(String, Long, String)].collect()
      .map { case (term, df, csv) => (term, df, csv.split(',').map(_.toLong).toSeq) }
    assert(rows.length === 20)
    // one aggregate recomputes every term's df (not a scan per term)
    val expectedDf = graft.core.Tables.documents(spark, dir)
      .select(explode(array_distinct(split(col("text"), " "))).as("term"))
      .groupBy("term").count()
      .as[(String, Long)].collect().toMap
    rows.foreach { case (term, df, postings) =>
      assert(postings.length <= 10, s"$term postings capped at 10")
      assert(postings === postings.sorted, s"$term postings ascending")
      assert(postings.distinct.length === postings.length, s"$term postings distinct")
      assert(df >= postings.length.toLong, s"$term df covers the prefix")
      assert(df === expectedDf(term), s"$term df")
    }
  }

  test("bigram_lm: smoothed probabilities are valid and context counts aggregate the bigrams") {
    val rows = LanguageModel.bigramLm.fn(spark, dir)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(rows.length === 20)
    val vocab = rows.head._5
    rows.foreach { case (_, _, n, ctx, v, p) =>
      assert(v === vocab, "single corpus-wide vocabulary size")
      assert(n >= 1 && ctx >= n, "context count dominates any one bigram")
      assert(p > 0.0 && p <= 1.0, "smoothed probability in (0, 1]")
      assert(math.abs(p - (n + 1).toDouble / (ctx + v).toDouble) < 1e-15, "add-one formula")
    }
    // counts descend (the deterministic top-k ordering)
    assert(rows.map(_._3).toSeq === rows.map(_._3).sorted(Ordering[Long].reverse).toSeq)
  }

  test("sliding_token_windows: stride-4 starts, 8-token inputs, target is the 9th token") {
    val df = LanguageModel.slidingTokenWindows.fn(spark, dir).cache()
    val bad = df.filter(
      size(split(col("input_text"), " ")) =!= 8 ||
        (col("win_start") - 1) % 4 =!= 0 ||
        col("win_start") < 1).count()
    assert(bad === 0L)
    // re-derive one document's windows exactly
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 9)
      .as[(Long, Seq[String])].head(3)
    docs.foreach { case (docId, tk) =>
      val got = df.filter(col("doc_id") === docId)
        .orderBy(col("win_start"))
        .as[(Long, Long, String, String)].collect()
      val expected = (1 to (tk.length - 8) by 4).map { s =>
        (s.toLong, tk.slice(s - 1, s + 7).mkString(" "), tk(s + 7))
      }
      assert(got.map(r => (r._2, r._3, r._4)).toSeq === expected, s"doc $docId")
    }
    df.unpersist()
  }

  test("feature_hashing: counts reconstruct token totals; sql poly_hash matches the Column API") {
    val df = LanguageModel.featureHashing.fn(spark, dir)
      .withColumn("buckets", expr("transform(split(buckets_csv, ','), x -> CAST(x AS INT))"))
      .withColumn("counts", expr("transform(split(counts_csv, ','), x -> CAST(x AS BIGINT))"))
      .cache()
    // per-doc sum of bucket counts == token count; buckets sorted distinct in [0, 256)
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
    val joined = df.join(docs, "doc_id")
    val badTotals = joined
      .filter(expr("aggregate(counts, 0L, (a, x) -> a + x)") =!= col("n_tok").cast("long"))
      .count()
    assert(badTotals === 0L)
    val badBuckets = df.filter(
      expr("sort_array(array_distinct(buckets))") =!= col("buckets") ||
        expr("exists(buckets, b -> b < 0 OR b >= 256)")).count()
    assert(badBuckets === 0L)
    df.unpersist()
    // the SQL-registered poly_hash is the same expression as the Column API
    val mismatch = graft.core.Tables.documents(spark, dir)
      .select(
        graft.functions.PolyHash.polyHash(col("text")).as("a"),
        expr("poly_hash(text)").as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatch === 0L)
  }

  test("doc_lm_score: probabilities average the smoothed model in position order") {
    import org.apache.spark.sql.functions.explode
    val got = LanguageModel.docLmScore.fn(spark, dir)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // rebuild the model and one doc's score directly in Scala
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .as[(Long, Seq[String])].collect()
    val allBigrams = docs.flatMap { case (_, tk) => tk.sliding(2).filter(_.length == 2) }
      .map(p => (p(0), p(1)))
    val c2 = allBigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ctx = allBigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val vocab = docs.flatMap(_._2).distinct.length.toLong
    docs.filter(_._2.length >= 2).take(5).foreach { case (docId, tk) =>
      val ps = tk.sliding(2).filter(_.length == 2).map { w =>
        (c2((w(0), w(1))) + 1).toDouble / (ctx(w(0)) + vocab).toDouble
      }.toSeq
      val mean = ps.foldLeft(0.0)(_ + _) / ps.length
      val (n, gm) = got(docId)
      assert(n === ps.length.toLong, s"doc $docId n_bigrams")
      assert(gm === mean, s"doc $docId mean_p")
    }
    // scores are valid probabilities
    got.values.foreach { case (_, p) => assert(p > 0.0 && p <= 1.0) }
  }

  test("doc_lm_score_cross: scores only odd sources under the even-source model, with coverage") {
    val rows = LanguageModel.docLmScoreCross.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.nonEmpty)
    // scored docs are exactly the odd-source docs with >= 2 tokens
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("tk"))
      .as[(Long, String, Seq[String])].collect()
    val expectedIds = docs.collect {
      case (id, src, tk) if src.drop(3).toInt % 2 == 1 && tk.length >= 2 => id
    }.toSet
    assert(rows.map(_._1).toSet === expectedIds)
    rows.foreach { case (id, nBg, nScored, meanP) =>
      assert(nScored <= nBg, s"doc $id coverage bounded")
      assert(meanP.isDefined === (nScored > 0), s"doc $id mean_p null iff uncovered")
      meanP.foreach(p => assert(p > 0.0 && p <= 1.0, s"doc $id probability range"))
    }
    // replay one scored doc's mean under a model built directly in Scala
    val trainBg = docs.filter(_._2.drop(3).toInt % 2 == 0)
      .flatMap(_._3.sliding(2).filter(_.length == 2)).map(p => (p(0), p(1)))
    val c2 = trainBg.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ctx = trainBg.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val vocab = docs.filter(_._2.drop(3).toInt % 2 == 0).flatMap(_._3).distinct.length.toLong
    val got = rows.map(r => r._1 -> r).toMap
    docs.filter(d => expectedIds.contains(d._1)).take(5).foreach { case (id, _, tk) =>
      val ps = tk.sliding(2).filter(_.length == 2).flatMap { w =>
        c2.get((w(0), w(1))).map(n => (n + 1).toDouble / (ctx(w(0)) + vocab).toDouble)
      }.toSeq
      val (_, nBg, nScored, meanP) = got(id)
      assert(nBg === tk.length - 1L, s"doc $id n_bigrams")
      assert(nScored === ps.length.toLong, s"doc $id n_scored")
      if (ps.nonEmpty) assert(meanP.get === ps.foldLeft(0.0)(_ + _) / ps.length, s"doc $id mean_p")
      else assert(meanP.isEmpty, s"doc $id mean_p empty")
    }
  }

  test("lm_score_histogram: cells partition the scored docs and agree with doc_lm_score") {
    val hist = LanguageModel.lmScoreHistogram.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // rebuild the histogram from doc_lm_score + the source column
    val scores = LanguageModel.docLmScore.fn(spark, dir)
      .join(graft.core.Tables.documents(spark, dir).select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), col("mean_p"))
      .as[(String, Double)].collect()
    val direct = scores.groupBy { case (src, p) => (src, math.floor(p * 20).toLong) }
      .view.mapValues(vs => (vs.length.toLong, vs.map(_._2).min, vs.map(_._2).max)).toMap
    assert(hist === direct)
    // min/max sit inside their bucket and cells cover every scored doc once
    hist.foreach { case ((src, b), (_, lo, hi)) =>
      assert(math.floor(lo * 20).toLong === b, s"($src,$b) min in bucket")
      assert(math.floor(hi * 20).toLong === b, s"($src,$b) max in bucket")
      assert(lo <= hi)
    }
    assert(hist.values.map(_._1).sum === scores.length.toLong)
  }

  test("bpe_pair_counts matches a direct frequency-weighted pair count") {
    val got = LanguageModel.bpePairCounts.fn(spark, dir)
      .as[(String, String, Long)].collect()
    assert(got.length === 20)
    val words = graft.core.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .as[String].collect()
    val direct = words
      .flatMap(w => w.sliding(2).filter(_.length == 2).map(p => (p.substring(0, 1), p.substring(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    got.foreach { case (a, b, n) => assert(n === direct((a, b)), s"pair ($a,$b)") }
    // descending and complete: the 20th count bounds everything not shown
    val floor = got.last._3
    assert(got.map(_._3).toSeq === got.map(_._3).sorted(Ordering[Long].reverse).toSeq)
    assert(direct.values.count(_ > floor) <= 20)
  }

  /** Single-threaded reference BPE trainer: argmax pair (count desc, pair
    * asc), greedy left-to-right merge application per word.
    */
  private def bpeRef(
      wordFreq: Seq[(String, Long)], rounds: Int): Seq[(Int, String, String, Long)] = {
    var vocab = wordFreq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    (1 to rounds).map { r =>
      val counts = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      vocab.foreach { case (toks, f) =>
        toks.indices.dropRight(1).foreach(i => counts((toks(i), toks(i + 1))) += f)
      }
      val ((a, b), n) = counts.toSeq.sortBy { case ((x, y), c) => (-c, x, y) }.head
      vocab = vocab.map { case (toks, f) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += toks(i); i += 1 }
        }
        (out.result(), f)
      }
      (r, a, b, n)
    }
  }

  test("bpeMerges matches the reference trainer, including overlapping runs") {
    // 'aaaa' forces the overlap question: merge (a,a) greedily l2r -> aa|aa
    val wf = Seq(("aaaa", 10L), ("aab", 6L), ("abab", 4L), ("ba", 3L), ("b", 9L))
    val df = wf.toDF("tok", "wf")
    val got = LanguageModel.bpeMerges(df, rounds = 4)
    assert(got === bpeRef(wf, rounds = 4))
    // round 1 must be (a,a): 3*10 + 6 + 0... aaaa has 3 adjacent (a,a) pairs
    assert(got.head._2 === "a" && got.head._3 === "a")
  }

  test("bpeMerges on a seeded random vocabulary tracks the reference") {
    val rnd = new scala.util.Random(11)
    val wf = (1 to 120).map { _ =>
      val len = 1 + rnd.nextInt(8)
      (Seq.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString, 1L + rnd.nextInt(20))
    }.distinct.groupBy(_._1).view.mapValues(_.head._2).toSeq
    assert(LanguageModel.bpeMerges(wf.toDF("tok", "wf"), 5) === bpeRef(wf, 5))
  }

  test("bpe_apply_vocab: distribution partitions the vocabulary; freq is conserved") {
    val hist = LanguageModel.bpeApplyVocab.fn(spark, dir).collect()
      .map(r => (r.getAs[Int]("n_tokens"), r.getAs[Long]("n_words"), r.getAs[Long]("total_freq")))
    val toks = graft.core.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok")).as[String].collect()
    // every corpus token occurrence lands in exactly one histogram cell
    assert(hist.map(_._3).sum === toks.length.toLong)
    assert(hist.map(_._2).sum === toks.distinct.length.toLong)
    // merges only shorten: no word has more tokens than characters
    val maxChars = toks.distinct.map(_.length).max
    assert(hist.map(_._1).max <= maxChars)
    // 3 merges happened: some word is shorter than its character count
    val charHist = toks.distinct.groupBy(_.length).view
      .mapValues(_.size.toLong).toMap
    assert(hist.map { case (k, v, _) => (k, v) }.toMap !== charHist)
  }

  test("heavy_hitters_tokens equals the full groupBy HAVING answer") {
    val got = LanguageModel.heavyHittersTokens.fn(spark, dir)
      .select("tok", "n", "total").as[(String, Long, Long)].collect().toSet
    val toks = graft.core.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok")).as[String].collect()
    val total = toks.length.toLong
    val want = toks.groupBy(identity).view.mapValues(_.length.toLong)
      .filter { case (_, n) => 100L * n > total }
      .map { case (t, n) => (t, n, total) }.toSet
    assert(got === want && got.nonEmpty)
  }
}
