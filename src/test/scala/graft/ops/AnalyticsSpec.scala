package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics]] — each query's defining property re-checked independently
  * of the DuckDB oracle (the oracle proves cross-engine equality; these
  * prove the math means what the scaladoc says). Runs on the sf0.001
  * testdata like the queries themselves.
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("window_ntile_cume: quartiles balanced within 1, ranks in range") {
    val df = Analytics.windowNtileCume.fn(spark, dir).cache()
    val byGroup = df.groupBy("o_orderpriority", "quartile").count()
      .groupBy("o_orderpriority")
      .agg(max("count").as("mx"), min("count").as("mn"), countDistinct("quartile").as("nq"))
      .collect()
    byGroup.foreach { r =>
      assert(r.getAs[Long]("nq") === 4L)
      assert(r.getAs[Long]("mx") - r.getAs[Long]("mn") <= 1L)
    }
    val bounds = df.agg(
      min("pct_rank"), max("pct_rank"), min("cum_dist"), max("cum_dist"))
      .as[(Double, Double, Double, Double)].head()
    assert(bounds._1 === 0.0 && bounds._2 === 1.0)
    assert(bounds._3 > 0.0 && bounds._4 === 1.0)
    df.unpersist()
  }

  test("agg_skew_kurt_exact matches a direct Scala computation") {
    val got = Analytics.aggSkewKurtExact.fn(spark, dir)
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val ds = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), round(col("l_extendedprice")).cast("long").as("d"))
      .as[(String, Long)].collect().groupBy(_._1)
    ds.foreach { case (flag, rows) =>
      val xs = rows.map(_._2.toDouble)
      val n = xs.length.toDouble
      val m = xs.sum / n
      val c2 = xs.map(x => (x - m) * (x - m)).sum / n
      val c3 = xs.map(x => math.pow(x - m, 3)).sum / n
      val c4 = xs.map(x => math.pow(x - m, 4)).sum / n
      val (skew, kurt) = got(flag)
      assert(math.abs(skew - c3 / (c2 * math.sqrt(c2))) < 1e-6, s"skew $flag")
      assert(math.abs(kurt - (c4 / (c2 * c2) - 3.0)) < 1e-6, s"kurt $flag")
    }
  }

  test("pivot_returnflag_revenue equals the conditional-aggregate form") {
    val got = Analytics.pivotReturnflagRevenue.fn(spark, dir)
    val expect = graft.core.Tables.lineitem(spark, dir)
      .select(year(col("l_shipdate")).as("yr"), col("l_returnflag"),
        graft.core.Num.cents(col("l_extendedprice")).as("c"))
      .groupBy("yr")
      .agg(
        graft.core.Num.centsToDouble(
          sum(when(col("l_returnflag") === "A", col("c")))).as("rev_a"),
        graft.core.Num.centsToDouble(
          sum(when(col("l_returnflag") === "N", col("c")))).as("rev_n"),
        graft.core.Num.centsToDouble(
          sum(when(col("l_returnflag") === "R", col("c")))).as("rev_r"))
    assert(got.exceptAll(expect).count() === 0)
    assert(expect.exceptAll(got).count() === 0)
  }

  test("join_null_safe: NULL keys pair up exactly (and plain = drops them)") {
    val nullSupp = graft.core.Tables.supplier(spark, dir)
      .filter(col("s_nationkey") % 7 === 3).count()
    val nullCust = graft.core.Tables.customer(spark, dir)
      .filter(col("c_nationkey") % 7 === 5).count()
    val got = Analytics.joinNullSafe.fn(spark, dir).cache()
    val nullPairs = got.filter(col("k").isNull).select("n_pairs").as[Long].collect()
    if (nullSupp * nullCust > 0) assert(nullPairs.toSeq === Seq(nullSupp * nullCust))
    else assert(nullPairs.isEmpty)
    // residues 3 (left-nulled) and 5 (right-nulled) can never appear as keys
    assert(got.filter(col("k").isin(3, 5)).count() === 0)
    got.unpersist()
  }

  test("ts_locf_fill: present rows keep their value, gaps carry the last one forward") {
    val got = Analytics.tsLocfFill.fn(spark, dir).cache()
    val series = graft.core.Tables.orders(spark, dir)
      .select((col("o_custkey") % 50).as("bucket"),
        date_trunc("month", col("o_orderdate")).as("month"),
        graft.core.Num.cents(col("o_totalprice")).as("cc"))
      .groupBy("bucket", "month")
      .agg(graft.core.Num.centsToDouble(sum(col("cc"))).as("own_total"))
    // a present month's filled value is its own total
    val present = got.filter(col("was_present"))
      .join(series, Seq("bucket", "month"))
    assert(present.filter(col("filled_total") =!= col("own_total")).count() === 0)
    // after each bucket's first present month every fill is non-null; rows
    // are bucket x full calendar (same month span for every bucket)
    val firstPresent = got.filter(col("was_present"))
      .groupBy("bucket").agg(min("month").as("fm"))
    val afterFirst = got.join(firstPresent, "bucket").filter(col("month") >= col("fm"))
    assert(afterFirst.filter(col("filled_total").isNull).count() === 0)
    val spans = got.groupBy("bucket").count().select("count").distinct().count()
    assert(spans === 1L)
    got.unpersist()
  }

  test("rolling_ewma matches a direct Scala computation per bucket") {
    val got = Analytics.rollingEwma.fn(spark, dir)
      .as[(Long, java.sql.Date, Double, Int)].collect()
      .map(r => (r._1, r._2.toString) -> (r._3, r._4)).toMap
    val series = graft.core.Tables.orders(spark, dir)
      .select((col("o_custkey") % 50).as("bucket"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        graft.core.Num.cents(col("o_totalprice")).as("cc"))
      .groupBy("bucket", "month").agg(sum("cc").as("c"))
      .as[(Long, java.sql.Date, Long)].collect()
      .groupBy(_._1).map { case (b, rows) => b -> rows.sortBy(_._2.toString) }
    series.foreach { case (bucket, rows) =>
      rows.zipWithIndex.foreach { case ((_, month, _), i) =>
        val lags = (0 to 6).flatMap(k => if (i - k >= 0) Some(k -> rows(i - k)._3) else None)
        val num = lags.map { case (k, c) => c * (1L << (6 - k)) }.sum
        val den = lags.map { case (k, _) => 1L << (6 - k) }.sum
        val expected = num.toDouble / den.toDouble / 100.0
        val (ewma, nw) = got((bucket, month.toString))
        assert(nw === lags.length, s"bucket $bucket month $month window size")
        assert(math.abs(ewma - expected) < 1e-9, s"bucket $bucket month $month")
      }
    }
  }

  test("mad_outliers matches a direct Scala median/MAD computation") {
    val got = Analytics.madOutliers.fn(spark, dir)
      .as[(String, Double, Double, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val byFlag = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), graft.core.Num.cents(col("l_extendedprice")).as("c"))
      .as[(String, Long)].collect().groupBy(_._1)
    def medianOf(xs: Array[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    byFlag.foreach { case (flag, rows) =>
      val xs = rows.map(_._2.toDouble)
      val med = medianOf(xs)
      val devs = xs.map(x => math.abs(x - med))
      val mad = medianOf(devs)
      val nOut = devs.count(_ > 3.0 * mad)
      val (gMed, gMad, gN, gOut) = got(flag)
      assert(gMed === med / 100.0, s"$flag median")
      assert(gMad === mad / 100.0, s"$flag mad")
      assert(gN === xs.length.toLong && gOut === nOut.toLong, s"$flag counts")
    }
  }

  test("incremental_agg_merge equals the from-scratch aggregate") {
    val got = Analytics.incrementalAggMerge.fn(spark, dir)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val full = graft.core.Tables.orders(spark, dir)
      .groupBy((col("o_custkey") % 50).as("bucket"))
      .agg(sum(graft.core.Num.cents(col("o_totalprice"))).as("t"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
    assert(full.length === got.size)
    full.foreach { case (b, t, n) =>
      val (gt, gn, gavg) = got(b)
      assert(gt === t && gn === n, s"bucket $b")
      assert(gavg === t.toDouble / n.toDouble, s"bucket $b avg")
    }
  }

  test("quantile_binning: 10 contiguous equal-population bins ordered by value range") {
    val rows = Analytics.quantileBinning.fn(spark, dir)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1 to 10))
    val total = rows.map(_._2).sum
    // deciles: every bin within 2% of total/10 (ties on boundaries shift a few rows)
    rows.foreach { case (bin, n, mn, mx) =>
      assert(mn <= mx)
      assert(math.abs(n - total / 10.0) <= total * 0.02, s"bin $bin population $n")
    }
    // value ranges do not overlap across consecutive bins
    rows.sliding(2).foreach { case Array((_, _, _, mxPrev), (_, _, mnNext, _)) =>
      assert(mxPrev <= mnNext)
    }
  }

  test("rolling_median matches a direct trailing-window computation") {
    val got = Analytics.rollingMedian.fn(spark, dir)
      .as[(Long, java.sql.Date, Double)].collect()
      .map(r => (r._1, r._2.toString) -> r._3).toMap
    val series = graft.core.Tables.orders(spark, dir)
      .select((col("o_custkey") % 50).as("bucket"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        graft.core.Num.cents(col("o_totalprice")).as("cc"))
      .groupBy("bucket", "month").agg(sum("cc").as("c"))
      .as[(Long, java.sql.Date, Long)].collect()
      .groupBy(_._1).map { case (b, rows) => b -> rows.sortBy(_._2.toString) }
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    series.foreach { case (bucket, rows) =>
      rows.zipWithIndex.foreach { case ((_, month, _), i) =>
        val window = rows.slice(math.max(0, i - 6), i + 1).map(_._3.toDouble)
        val expected = medianOf(window) / 100.0
        assert(got((bucket, month.toString)) === expected, s"bucket $bucket month $month")
      }
    }
  }

  test("agg_multi_distinct equals per-column distinct counts") {
    val got = Analytics.aggMultiDistinct.fn(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val li = graft.core.Tables.lineitem(spark, dir)
    got.keys.foreach { flag =>
      val sub = li.filter(col("l_returnflag") === flag)
      val (_, ns, np, no, rev) = got(flag)
      assert(ns === sub.select("l_suppkey").distinct().count())
      assert(np === sub.select("l_partkey").distinct().count())
      assert(no === sub.select("l_orderkey").distinct().count())
      assert(rev === sub.agg(sum(graft.core.Num.cents(col("l_extendedprice")))).head().getLong(0))
    }
  }

  test("join_key_skew_profile: stats agree with a direct per-key count scan") {
    val r = Analytics.joinKeySkewProfile.fn(spark, dir).collect().head
    val counts = graft.core.Tables.lineitem(spark, dir)
      .groupBy("l_suppkey").count()
      .collect().map(_.getLong(1)).sorted
    assert(r.getAs[Long]("n_keys") === counts.length.toLong)
    assert(r.getAs[Long]("max_n") === counts.max)
    val mean = counts.sum.toDouble / counts.length
    assert(r.getAs[Double]("mean_n") === mean)
    assert(r.getAs[Double]("skew_factor") === counts.max.toDouble / mean)
    assert(r.getAs[Double]("skew_factor") >= 1.0)
    // p50/p99 bracket the distribution and sit inside [min, max]
    val p50 = r.getAs[Double]("p50_n"); val p99 = r.getAs[Double]("p99_n")
    assert(p50 <= p99 && p50 >= counts.min.toDouble && p99 <= counts.max.toDouble)
  }

  test("skyline2D: matches the O(n^2) domination definition on seeded points") {
    val rnd = new scala.util.Random(42)
    val pts = (1L to 200L).map(i => (i, rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)) ++
      // duplicates + exact ties on each axis
      Seq((201L, 5L, 5L), (202L, 5L, 5L), (203L, 0L, 0L), (204L, 0L, 29L))
    val df = pts.toDF("id", "x", "y")
    val got = Analytics.skyline2D(df, "x", "y")
      .select("id").as[Long].collect().toSet
    val want = pts.filter { case (_, qx, qy) =>
      !pts.exists { case (_, px, py) =>
        px <= qx && py >= qy && (px < qx || py > qy)
      }
    }.map(_._1).toSet
    assert(got === want)
    assert(want.contains(204L)) // (0, 29) dominates everything dominatable
  }

  test("skyline2D: duplicate points both survive; dominated duplicates both drop") {
    val df = Seq((1L, 1L, 10L), (2L, 1L, 10L), (3L, 2L, 9L), (4L, 2L, 9L), (5L, 2L, 10L))
      .toDF("id", "x", "y")
    val got = Analytics.skyline2D(df, "x", "y").select("id").as[Long].collect().toSet
    // (1,10) twins are undominated twins; (2,9) twins are dominated by (1,10)
    // and by (2,10); (2,10) is dominated by (1,10) on x with equal y
    assert(got === Set(1L, 2L))
  }

  test("basket_rules: counts and ratios agree with a brute-force basket scan") {
    val rows = Analytics.basketRules.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    val baskets = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .as[(Long, Long)].collect().toSeq.distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nb = baskets.size.toLong
    val itemN = baskets.values.toSeq.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      val (u, v) = (r.getAs[Long]("u"), r.getAs[Long]("v"))
      val nUv = baskets.values.count(b => b.contains(u) && b.contains(v)).toLong
      assert(u < v)
      assert(r.getAs[Long]("n_uv") === nUv && nUv >= 2L)
      assert(r.getAs[Long]("n_u") === itemN(u))
      assert(r.getAs[Long]("n_v") === itemN(v))
      assert(r.getAs[Long]("n_baskets") === nb)
      assert(r.getAs[Double]("conf_u_v") === nUv.toDouble / itemN(u).toDouble)
      assert(r.getAs[Double]("lift") ===
        (nUv * nb).toDouble / (itemN(u) * itemN(v)).toDouble)
    }
    // completeness: every pair with support >= 2 is present
    val allPairs = baskets.values.toSeq
      .flatMap(b => b.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size).filter(_._2 >= 2).keys.toSet
    assert(rows.map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"))).toSet === allPairs)
  }

  test("trend_by_nation: OLS matches a direct least-squares fit per nation") {
    val rows = Analytics.trendByNation.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    val monthly = graft.core.Tables.lineitem(spark, dir)
      .join(graft.core.Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(graft.core.Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        ((year(col("l_shipdate")) - 1995) * 12 + month(col("l_shipdate")) - 1)
          .cast("long").as("x"))
      .agg(sum(graft.core.Num.cents(
        col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("y"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    rows.foreach { r =>
      val pts = monthly(r.getAs[String]("n_name"))
      val n = pts.size.toLong
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val (sxy, sxx) = (pts.map(p => p._1 * p._2).sum, pts.map(p => p._1 * p._1).sum)
      val den = (n * sxx - sx * sx).toDouble
      assert(r.getAs[Long]("n_months") === n)
      val slope = r.getAs[Double]("slope_cents")
      assert(slope === (n * sxy - sx * sy).toDouble / den)
      assert(r.getAs[Double]("intercept_cents") === (sy * sxx - sx * sxy).toDouble / den)
      // sanity: the fitted line's residual sum is orthogonal to x (normal
      // equations hold within double rounding)
      val intercept = r.getAs[Double]("intercept_cents")
      val resDotX = pts.map(p => (p._2.toDouble - slope * p._1 - intercept) * p._1).sum
      val scale = pts.map(p => math.abs(p._2.toDouble * p._1)).sum
      assert(math.abs(resDotX) / scale < 1e-9)
    }
  }

  test("source_gini_diversity: gini equals 1 - sum(p^2); bounds hold") {
    val rows = Analytics.sourceGiniDiversity.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    val counts = graft.core.Tables.documents(spark, dir)
      .groupBy("lang", "source").count().as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    rows.foreach { r =>
      val ns = counts(r.getAs[String]("lang"))
      val n = ns.sum
      assert(r.getAs[Long]("n_docs") === n)
      assert(r.getAs[Long]("n_sources") === ns.size.toLong)
      val gini = r.getAs[Double]("gini")
      assert(gini === (n * n - ns.map(x => x * x).sum).toDouble / (n * n).toDouble)
      // 0 <= gini <= 1 - 1/k for k sources
      assert(gini >= 0.0 && gini <= 1.0 - 1.0 / ns.size)
    }
  }

  test("backtest_naive_mae: per-nation MAE equals a direct series walk") {
    val rows = Analytics.backtestNaiveMae.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    val series = graft.core.Tables.lineitem(spark, dir)
      .join(graft.core.Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(graft.core.Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .agg(sum(graft.core.Num.cents(
        col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("y"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    rows.foreach { r =>
      val ys = series(r.getAs[String]("n_name"))
      val errs = ys.sliding(2).filter(_.length == 2)
        .map(w => math.abs(w(1) - w(0))).toSeq
      assert(r.getAs[Long]("n_evals") === errs.size.toLong)
      assert(r.getAs[Long]("total_abs_err_cents") === errs.sum)
      assert(r.getAs[Double]("mae_cents") === errs.sum.toDouble / errs.size)
    }
  }

  test("median_binary_search: selection equals the sorted k-th; proof counts bracket k") {
    val r = Analytics.medianBinarySearch.fn(spark, dir).collect().head
    val xs = graft.core.Tables.lineitem(spark, dir)
      .select(graft.core.Num.cents(col("l_extendedprice")).as("x"))
      .as[Long].collect().sorted
    val k = (xs.length + 1) / 2
    assert(r.getAs[Long]("n") === xs.length.toLong)
    assert(r.getAs[Long]("k") === k.toLong)
    assert(r.getAs[Long]("median_cents") === xs(k - 1))
    // certificate: cnt_lt < k <= cnt_le
    assert(r.getAs[Long]("cnt_lt") < k.toLong && k.toLong <= r.getAs[Long]("cnt_le"))
  }

  test("market_concentration_hhi: index equals a direct share computation; bounds hold") {
    val rows = Analytics.marketConcentrationHhi.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    val revs = graft.core.Tables.lineitem(spark, dir)
      .join(graft.core.Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(graft.core.Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("l_suppkey"))
      .agg(sum(graft.core.Num.cents(
        col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("rev"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    rows.foreach { r =>
      val rs = revs(r.getAs[String]("n_name"))
      assert(r.getAs[Long]("n_suppliers") === rs.size.toLong)
      val hhi = r.getAs[Double]("hhi")
      val num = rs.map(x => BigInt(x) * BigInt(x)).sum
      val den = rs.sum.toDouble * rs.sum.toDouble
      assert(hhi === num.toDouble / den)
      // 1/n (even market) <= HHI <= 1 (monopoly)
      assert(hhi >= 1.0 / rs.size - 1e-12 && hhi <= 1.0)
    }
  }

  test("pipeline_observe: metrics equal a direct recount, on one scan") {
    val r = Analytics.pipelineObserve.fn(spark, dir).collect().head
    val li = graft.core.Tables.lineitem(spark, dir)
    assert(r.getAs[Long]("n_input") === li.count())
    assert(r.getAs[Long]("n_output") === li.filter(col("l_quantity") >= 25).count())
    val cents = li.agg(sum(graft.core.Num.cents(col("l_extendedprice"))))
      .collect().head.getLong(0)
    assert(r.getAs[Long]("revenue_cents") === cents)
  }
}
