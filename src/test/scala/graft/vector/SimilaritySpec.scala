package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Similarity search: identical vectors rank first with cosine 1.0; the IVF
  * probe recalls brute-force results when cells are well separated.
  */
class SimilaritySpec extends SparkSpec {

  /** Deterministic synthetic embeddings: two well-separated clusters around
    * axis directions, labels = cluster; vec 0 and vec 100 identical.
    */
  private def embDir(f: String => Unit): Unit =
    withTempDir { dir =>
      import spark.implicits._
      val dim = 8
      // (i*13 + d*5) % 41 is injective in i for i < 40, so every vector is
      // distinct — except vec 100, a deliberate exact copy of vec 0.
      def vec(i: Int): Array[Float] = {
        val cluster = i % 2
        Array.tabulate(dim) { d =>
          (if (d == cluster) 1.0f else 0.05f) + 0.01f * ((i * 13 + d * 5) % 41)
        }
      }
      val rows: Seq[(Long, Array[Float], Int)] =
        (0 until 40).map(i => (i.toLong, vec(i), i % 2)) :+ ((100L, vec(0), 0))
      rows.toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      f(dir.getAbsolutePath)
    }

  test("brute-force knn: the identical vector is the top neighbor with cos 1.0") {
    embDir { dir =>
      val top = Similarity.knnBrute.fn(spark, dir)
        .filter(col("query_id") === 0 && col("rnk") === 1)
        .select("cand_id", "cos_sim").head()
      assert(top.getLong(0) === 100L)
      assert(top.getDouble(1) === 1.0)
    }
  }

  test("knn returns exactly k deterministic neighbors per query") {
    embDir { dir =>
      val out = Similarity.knnBrute.fn(spark, dir).collect()
      val byQuery = out.groupBy(_.getAs[Long]("query_id")).view.mapValues(_.length).toMap
      assert(byQuery.values.toSet === Set(10))
      val again = Similarity.knnBrute.fn(spark, dir).collect()
      assert(out.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
    }
  }

  test("IVF probe recalls the brute-force top-10 on separated clusters") {
    embDir { dir =>
      def topSet(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "cand_id").collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val brute = topSet(Similarity.knnBrute.fn(spark, dir))
      val ivf = topSet(Similarity.annIvfProbe.fn(spark, dir))
      // probing 2 of 2 cells => IVF must equal brute force here
      assert(ivf === brute)
    }
  }

  test("embedding LSH pairs the planted identical vector, few false buckets") {
    embDir { dir =>
      val pairs = Similarity.embeddingLshNearDup.fn(spark, dir)
        .select("vec_a", "vec_b", "cos_sim").collect()
      val planted = pairs.filter(r => r.getLong(0) === 0L && r.getLong(1) === 100L)
      assert(planted.length === 1)
      assert(planted.head.getDouble(2) === 1.0)
    }
  }

  test("k-means IVF: learned cells, deterministic assignment, high recall vs brute force") {
    embDir { dir =>
      val out = Similarity.annIvfKmeans.fn(spark, dir).collect()
      // identical planted vector shares query 0's cell => probed first, cos 1.0
      val top0 = out.filter(r => r.getAs[Long]("query_id") == 0L && r.getAs[Int]("rnk") == 1).head
      assert(top0.getAs[Long]("cand_id") === 100L)
      assert(top0.getAs[Double]("cos_sim") === 1.0)
      // recall vs the exhaustive scan, probing 2 of 8 learned cells
      def topSet(rows: Array[org.apache.spark.sql.Row]) =
        rows.groupBy(_.getAs[Long]("query_id")).view
          .mapValues(_.map(_.getAs[Long]("cand_id")).toSet).toMap
      val brute = topSet(Similarity.knnBrute.fn(spark, dir).collect())
      val ivf = topSet(out)
      val recall = ivf.map { case (q, s) =>
        s.intersect(brute(q)).size.toDouble / brute(q).size
      }.sum / ivf.size
      assert(recall >= 0.7, s"mean recall $recall")
      // learned structure is exactly reproducible
      val again = Similarity.annIvfKmeans.fn(spark, dir).collect()
      assert(out.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
    }
  }

  test("PQ-ADC: subspace-structured data makes the codebook lossless; PQ order equals exact L2") {
    withTempDir { dir =>
      import spark.implicits._
      // 64-dim vectors built from 8 per-subspace profiles: every 16-dim
      // slice is exactly one of 8 distinct patterns and the first 8 vec_ids
      // cover all of them, so the seeded per-subspace k-means converges to
      // the profiles themselves — a LOSSLESS codebook. PQ's approx distance
      // must then equal the exact squared L2, rank for rank.
      val rows = (0 until 50).map { i =>
        val v = Array.tabulate(64) { j =>
          val m = j / 16; val d = j % 16; val c = (i + m) % 8
          0.5f * c + 0.01f * d
        }
        (i.toLong, v, 0)
      }
      rows.toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val pq = Similarity.annPqAdc.fn(spark, dir.getAbsolutePath).collect()

      val qd = Similarity.quantized(spark, dir.getAbsolutePath)
        .filter(col("norm2") > 0).select(col("vec_id"), col("q"))
      val queries = qd.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("q").as("qa"))
      val exact = qd.join(broadcast(queries), col("vec_id") =!= col("query_id"))
        .withColumn("dist",
          aggregate(zip_with(col("qa"), col("q"), (x, y) => (x - y) * (x - y)),
            lit(0L), (acc, v) => acc + v))
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))))
        .filter(col("rnk") <= 10)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
          r.getAs[Long]("dist"), r.getAs[Int]("rnk"))).toSet
      val got = pq.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
        r.getAs[Long]("approx_dist"), r.getAs[Int]("rnk"))).toSet
      assert(got === exact, "lossless codebook must reproduce exact L2 ranks AND distances")
    }
  }

  test("PQ-ADC on driver testdata: recall far above random, deterministic replay") {
    val dir = "/root/testdata/sf0.001"
    val pq = Similarity.annPqAdc.fn(spark, dir).collect()
    def topSet(rows: Array[org.apache.spark.sql.Row], cand: String) =
      rows.groupBy(_.getAs[Long]("query_id")).view
        .mapValues(_.map(_.getAs[Long](cand)).toSet).toMap
    // exact L2 top-10 (the metric PQ approximates — cosine would mismeasure)
    val qd = Similarity.quantized(spark, dir)
      .filter(col("norm2") > 0).select(col("vec_id"), col("q"))
    val queries = qd.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("q").as("qa"))
    val exact = qd.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("dist",
        aggregate(zip_with(col("qa"), col("q"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))))
      .filter(col("rnk") <= 10).collect()
    val e = topSet(exact, "vec_id")
    val p = topSet(pq, "cand_id")
    val recall = p.map { case (q, s) => s.intersect(e(q)).size.toDouble / e(q).size }.sum / p.size
    // unstructured embeddings cap PQ recall well below IVF's on clustered
    // data — the floor pins "far above random" (random ≈ 10/500 = 0.02)
    assert(recall >= 0.1, s"mean recall $recall")
    val again = Similarity.annPqAdc.fn(spark, dir).collect()
    assert(pq.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }

  test("PQ sampled training: different codebooks than full training, same recall regime") {
    val dir = "/root/testdata/sf0.001"
    val full = Similarity.annPqAdc.fn(spark, dir).collect()
    val samp = Similarity.annPqTrainSample.fn(spark, dir).collect()
    assert(samp.nonEmpty)
    // both run the same ADC ranking shape: 10 candidates per query
    def byQuery(rows: Array[org.apache.spark.sql.Row]) =
      rows.groupBy(_.getAs[Long]("query_id")).view
        .mapValues(_.map(_.getAs[Long]("cand_id")).toSet).toMap
    val f = byQuery(full); val s = byQuery(samp)
    assert(s.keySet === f.keySet)
    assert(s.values.forall(_.size == 10))
    // the sampled Lloyd passes saw only a quarter of the corpus, so the
    // learned structure must actually DIFFER from full training — if the
    // approx distances were identical the query would be vacuous
    val fullDists = full.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id")) -> r.getAs[Long]("approx_dist")).toMap
    val sampDists = samp.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id")) -> r.getAs[Long]("approx_dist")).toMap
    val shared = fullDists.keySet.intersect(sampDists.keySet)
    assert(shared.exists(k => fullDists(k) != sampDists(k)) ||
      fullDists.keySet != sampDists.keySet,
      "sampled training produced bit-identical codebooks — sample predicate is not being applied")
    // ...but training on a quarter must still beat random against the
    // EXACT L2 top-10 (on unstructured noise two PQ codebooks rank almost
    // independently of each other, so set-overlap between them is not a
    // meaningful bar — distance to ground truth is)
    val qd = Similarity.quantized(spark, dir)
      .filter(col("norm2") > 0).select(col("vec_id"), col("q"))
    val queries = qd.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("q").as("qa"))
    val exact = qd.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("dist",
        aggregate(zip_with(col("qa"), col("q"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))))
      .filter(col("rnk") <= 10).collect()
    val e = exact.groupBy(_.getAs[Long]("query_id")).view
      .mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val recall = s.map { case (q, cs) => cs.intersect(e(q)).size.toDouble / e(q).size }.sum / s.size
    assert(recall >= 0.04, s"sampled-training recall vs exact L2 fell to random ($recall)")
    // deterministic replay (the pinned codebooks are keyed per regime)
    val again = Similarity.annPqTrainSample.fn(spark, dir).collect()
    assert(samp.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }

  test("IVF-PQ: composed index agrees with the standalone fine quantizer and prunes by cell") {
    val dir = "/root/testdata/sf0.001"
    val ivfpq = Similarity.annIvfPq.fn(spark, dir).collect()
    assert(ivfpq.nonEmpty)
    // ≤ 10 ranked rows per query; probed cells per query bounded by the
    // probe budget (coarse pruning actually engaged)
    val byQuery = ivfpq.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (q, rows) =>
      assert(rows.length <= 10, s"query $q")
      assert(rows.map(_.getAs[Long]("cell")).distinct.length <= 2, s"query $q probes >2 cells")
      assert(rows.map(_.getAs[Int]("rnk")).sorted.toSeq === (1 to rows.length))
    }
    // SAME corpus + seeds ⇒ identical PQ codebooks in both queries: any
    // (query, cand) pair the standalone ADC also ranked must carry the
    // IDENTICAL approx distance — the composition changed candidate
    // pruning, not the metric
    val adc = Similarity.annPqAdc.fn(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id")) -> r.getAs[Long]("approx_dist"))
      .toMap
    val shared = ivfpq.flatMap { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))
      adc.get(k).map(d => (k, r.getAs[Long]("approx_dist"), d))
    }
    assert(shared.nonEmpty, "some candidates must overlap between the two indexes")
    shared.foreach { case (k, a, b) => assert(a === b, s"pair $k metric drifted") }
    // deterministic replay of the whole composed structure
    val again = Similarity.annIvfPq.fn(spark, dir).collect()
    assert(ivfpq.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }

  test("banded LSH recall: planted cos~0.9 near-dup pairs are found, verified exactly") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(42)
    def base(): Array[Long] = Array.fill(dim)((rnd.nextInt(2001) - 1000).toLong)
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      dot / (math.sqrt(a.map(x => x * x).sum.toDouble) * math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    // plant 10 (2i, 2i+1) near-dup pairs: perturb until cosine lands in
    // [0.85, 0.95] — the regime the single 16-bit signature had lost
    val planted = (0 until 10).map { i =>
      val a = base()
      var b = a.clone()
      var scale = 0.30
      def perturb(s: Double) = a.map(x => x + ((rnd.nextInt(2001) - 1000) * s).toLong)
      b = perturb(scale)
      while (cos(a, b) < 0.85 || cos(a, b) > 0.95) {
        scale = if (cos(a, b) < 0.85) scale * 0.8 else scale * 1.2
        b = perturb(scale)
      }
      (2L * i, a, 2L * i + 1, b)
    }
    val fillers = (0 until 30).map(i => (100L + i, base()))
    val rows = planted.flatMap { case (ia, a, ib, b) => Seq((ia, a.toSeq), (ib, b.toSeq)) } ++
      fillers.map { case (i, v) => (i, v.toSeq) }
    val q = rows.toDF("vec_id", "q")
      .withColumn("norm2", expr("aggregate(zip_with(q, q, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
    val found = Similarity.lshNearDupPairs(q, 0.85)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = planted.map { case (ia, _, ib, _) => (ia, ib) }.toSet
    val recalled = expected.count(found.contains)
    // banded OR: per-pair collision ~0.85-0.95 here; deterministic planes
    // make this exact-repeatable — assert the high-recall regime holds
    assert(recalled >= 8, s"recalled only $recalled/10: $found")
    // verification step guarantees zero false positives vs the exact scan
    val exact = (rows.combinations(2).collect {
      case Seq((i1, v1), (i2, v2))
        if cos(v1.toArray, v2.toArray) >= 0.85 => (math.min(i1, i2), math.max(i1, i2))
    }).toSet
    assert(found.subsetOf(exact))
  }

  test("banded LSH on an empty frame returns an empty result, not an error") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Long], Long)].toDF("vec_id", "q", "norm2")
    assert(Similarity.lshNearDupPairs(empty, 0.9).count() === 0)
  }

  test("cosine of consecutive planted dims is exact and symmetric-ish sane") {
    embDir { dir =>
      val sims = Similarity.cosineConsecutive.fn(spark, dir)
        .select("cos_sim").collect().map(_.getDouble(0))
      assert(sims.nonEmpty)
      assert(sims.forall(s => s >= -1.0 && s <= 1.000000001))
    }
  }

  test("embedding_quantize_int8: saturation at the max element, bounded round-trip error") {
    embDir { dir =>
      val rows = Similarity.embeddingQuantizeInt8.fn(spark, dir).collect()
      assert(rows.length === 41)
      rows.foreach { r =>
        val qscale = r.getAs[Double]("qscale")
        val nDims = r.getAs[Int]("n_dims")
        val qSum = r.getAs[Long]("q_sum")
        val nSat = r.getAs[Int]("n_saturated")
        val err = r.getAs[Double]("max_abs_err")
        // the max-abs element maps to exactly +-127 -> always >= 1 saturated
        assert(nSat >= 1 && nSat <= nDims)
        assert(math.abs(qSum) <= 127L * nDims)
        // worst-case quantization step is qscale/254; allow float-widening slack
        assert(err >= 0.0 && err <= qscale / 254.0 + qscale * 1e-6,
          s"err $err vs bound ${qscale / 254.0}")
      }
    }
  }

  test("embedding_gram_matrix: upper triangle only, diagonal = sum of squared norms components") {
    embDir { dir =>
      val rows = Similarity.embeddingGramMatrix.fn(spark, dir).collect()
      val d = 8
      assert(rows.length === d * (d + 1) / 2)
      val byPair = rows.map(r => (r.getAs[Int]("dim_i"), r.getAs[Int]("dim_j")) ->
        (r.getAs[Long]("gram"), r.getAs[Long]("n_vecs"), r.getAs[Double]("gram_mean"))).toMap
      byPair.foreach { case ((i, j), (g, n, mean)) =>
        assert(i <= j, "upper triangle")
        assert(n === 41L)
        assert(math.abs(mean - g.toDouble / n.toDouble) < 1e-12)
        if (i == j) assert(g >= 0L, s"diagonal $i non-negative")
      }
      // cross-check one cell against a direct computation over the quantized frame
      val q = Similarity.quantized(spark, dir)
        .select("q").collect().map(_.getSeq[Long](0))
      val direct = q.map(v => v(0) * v(1)).sum
      assert(byPair((1, 2))._1 === direct)
    }
  }
  test("label_centroid_cosine: matches a direct centroid computation, upper triangle, |cos| <= 1") {
    embDir { dir =>
      val rows = Similarity.labelCentroidCosine.fn(spark, dir).collect()
        .map(r => (r.getAs[Int]("label_a"), r.getAs[Int]("label_b")) ->
          (r.getAs[Long]("dot"), r.getAs[Double]("cos_sim"))).toMap
      // two labels -> exactly one pair, a < b
      assert(rows.keySet === Set((0, 1)))
      rows.values.foreach { case (_, c) => assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12) }
      // direct recomputation from the quantized frame
      val q = Similarity.quantized(spark, dir)
        .select("label", "q").collect()
        .map(r => r.getAs[Int]("label") -> r.getSeq[Long](1))
      val cent = q.groupBy(_._1).view.mapValues(vs =>
        vs.map(_._2.toIndexedSeq).toSeq.transpose.map(_.sum)).toMap
      val dot = cent(0).zip(cent(1)).map { case (a, b) => a * b }.sum
      val na = math.sqrt(cent(0).map(x => x * x).sum.toDouble)
      val nb = math.sqrt(cent(1).map(x => x * x).sum.toDouble)
      assert(rows((0, 1))._1 === dot)
      assert(rows((0, 1))._2 === dot.toDouble / (na * nb))
    }
  }
}
