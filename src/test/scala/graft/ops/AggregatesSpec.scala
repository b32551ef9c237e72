package graft.ops

import graft.SparkSpec
import graft.functions.{ScoredId, TopKAggregator}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  test("topk aggregator equals the window row_number formulation") {
    val agg = Relational.topkAggregatorSuppliers.fn(spark, sf)
      .select("n_name", "s_suppkey", "rnk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val win = Relational.topkSuppliersPerNation.fn(spark, sf)
      .select("n_name", "s_suppkey", "rnk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(agg === win)
  }

  test("topk aggregator: pure merge semantics match a plain sort (property)") {
    val k = 3
    val agg = new TopKAggregator(k)
    val gen = Gen.listOf(Gen.zip(Gen.chooseNum(-1000L, 1000L), Gen.chooseNum(0L, 50L)))
    checkProp(Prop.forAll(gen) { xs =>
      val items = xs.map { case (s, i) => ScoredId(s, i) }
      // arbitrary split into two partitions, reduced then merged
      val (l, r) = items.splitAt(items.length / 2)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      val expected = items.sortBy(e => (-e.score, e.id)).take(k)
      merged == expected
    })
  }

  test("salted two-stage aggregation equals the direct group-by") {
    val salted = Relational.aggSaltedTwoStage.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val direct = graft.core.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(
        graft.core.Num.centsToDouble(
          sum(graft.core.Num.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))).as("revenue"),
        count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === direct)
  }

  test("approx_percentile within-2%-of-exact contract flag holds everywhere") {
    val rows = Relational.aggApproxPercentile.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("exact_p50") > 0)
      assert(r.getAs[Boolean]("approx_within_2pct"), r.toString)
    }
  }

  test("approx_count_distinct within-10%-of-exact contract flag holds everywhere") {
    val rows = Relational.aggApproxDistinct.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_parts") > 0)
      assert(r.getAs[Boolean]("hll_within_10pct"), r.toString)
    }
  }

  test("markov_transitions: rows are a stochastic matrix over event_transitions") {
    val dir = "/root/testdata/sf0.001"
    val probs = Events.markovTransitions.fn(spark, dir)
      .as[(String, String, Long, Long, Double)].collect()
    val counts = Events.eventTransitions.fn(spark, dir)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(probs.map(r => (r._1, r._2)).toSet === counts.keySet)
    probs.groupBy(_._1).foreach { case (from, rows) =>
      val total = rows.head._4
      assert(rows.forall(_._4 == total), s"$from single row_total")
      assert(rows.map(_._3).sum === total, s"$from total aggregates its row")
      assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-12, s"$from probabilities sum to 1")
      rows.foreach { r => assert(r._5 === r._3.toDouble / total.toDouble) }
    }
  }

  test("tpch_q8_style: market share in (0,1), revenue consistent with the unconditional join") {
    val dir = "/root/testdata/sf0.001"
    val got = Relational.tpchQ8Style.fn(spark, dir)
      .as[(Int, Double, Double, Long)].collect()
    assert(got.nonEmpty)
    val Array(yearBounds) = graft.core.Tables.orders(spark, dir)
      .agg(min(year(col("o_orderdate"))), max(year(col("o_orderdate")))).collect()
    val (yMin, yMax) = (yearBounds.getInt(0), yearBounds.getInt(1))
    got.foreach { case (yr, share, total, n) =>
      assert(yr >= yMin && yr <= yMax)
      assert(share >= 0.0 && share <= 1.0)
      assert(total > 0.0 && n > 0L)
    }
  }

  test("snapshot_diff: classes partition the key union and match the modular derivation") {
    val dir = "/root/testdata/sf0.001"
    val got = Relational.snapshotDiff.fn(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val keys = graft.core.Tables.orders(spark, dir)
      .select("o_orderkey").as[Long].collect()
    val inA = keys.filter(_ % 7 != 0).toSet
    val inB = keys.filter(_ % 5 != 0).toSet
    assert(got("added")._1 === (inB -- inA).size.toLong)
    assert(got("removed")._1 === (inA -- inB).size.toLong)
    val both = inA intersect inB
    assert(got("changed")._1 === both.count(_ % 3 == 0).toLong)
    assert(got("unchanged")._1 === both.count(_ % 3 != 0).toLong)
    // value bumps are +100 cents each on changed keys; added/removed deltas nonzero
    assert(got("changed")._2 === 100L * got("changed")._1)
    assert(got("unchanged")._2 === 0L)
  }

  test("dq_referential: the sampled relation finds orphans, intact relations are clean") {
    val dir = "/root/testdata/sf0.001"
    val got = Relational.dqReferential.fn(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val (_, orphans) = got("lineitem->orders_sampled")
    assert(orphans > 0L, "sampling the parent must surface orphans")
    assert(got("lineitem->supplier")._2 === 0L)
    assert(got("customer->nation")._2 === 0L)
    // orphan counts never exceed the child row count
    got.values.foreach { case (n, o) => assert(o <= n) }
  }

  test("corr_matrix: six pairs, r in [-1,1], close to Spark's streaming corr()") {
    val got = Relational.corrMatrix.fn(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(got.length === 6)
    assert(got.map(r => Set(r._1, r._2)).distinct.length === 6)
    val li = graft.core.Tables.lineitem(spark, sf).select(
      round(col("l_quantity")).cast("long").as("qty"),
      graft.core.Num.cents(col("l_extendedprice")).as("price_c"),
      round(col("l_discount") * 10000).cast("long").as("disc_bp"),
      round(col("l_tax") * 10000).cast("long").as("tax_bp"))
    got.foreach { case (a, b, n, r) =>
      assert(n > 0L && r >= -1.0 && r <= 1.0, s"($a,$b)")
      val ref = li.agg(corr(col(a), col(b))).head().getDouble(0)
      assert(math.abs(r - ref) < 1e-9, s"($a,$b): $r vs corr() $ref")
    }
  }

  test("contingency_cells: expected margins reproduce observed totals; chi2 formula per cell") {
    val dir = "/root/testdata/sf0.001"
    val rows = Events.contingencyCells.fn(spark, dir)
      .as[(String, Long, Long, Double, Double)].collect()
    val total = rows.map(_._3).sum
    // expected counts sum back to the observed total (within fp slack)
    assert(math.abs(rows.map(_._4).sum - total.toDouble) < 1e-6)
    rows.foreach { case (t, c, o, e, chi2) =>
      val rowN = rows.filter(_._1 == t).map(_._3).sum
      val colN = rows.filter(_._2 == c).map(_._3).sum
      assert(e === rowN.toDouble * colN.toDouble / total.toDouble, s"cell ($t,$c) expected")
      assert(chi2 === (o - e) * (o - e) / e, s"cell ($t,$c) chi2")
    }
  }

  test("journey_trigrams equals a single-threaded session walk") {
    val got = Events.journeyTrigrams.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getAs[Long]("n")).toMap
    val ev = graft.core.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val want = scala.collection.mutable.Map[(String, String, String), Long]().withDefaultValue(0L)
    ev.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      // split on >30min gaps, then count consecutive type triples
      val sessions = sorted.foldLeft(Vector.empty[Vector[(Long, Long, Long, String)]]) {
        case (acc, e) =>
          if (acc.isEmpty || e._2 - acc.last.last._2 > 1800L * 1000) acc :+ Vector(e)
          else acc.init :+ (acc.last :+ e)
      }
      sessions.foreach { s =>
        s.sliding(3).filter(_.size == 3).foreach { w =>
          want((w(0)._4, w(1)._4, w(2)._4)) += 1L
        }
      }
    }
    assert(got === want.toMap)
    assert(got.values.sum > 0L)
  }

  test("cogroup_order_totals equals the join+group formulation, covers all orders") {
    val got = Relational.cogroupOrderTotals.fn(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = graft.core.Tables.orders(spark, sf)
      .select(col("o_orderkey"), graft.core.Num.cents(col("o_totalprice")).as("total_cents"))
      .join(
        graft.core.Tables.lineitem(spark, sf)
          .select(col("l_orderkey").as("o_orderkey"),
            graft.core.Num.cents(col("l_extendedprice")).as("c")),
        Seq("o_orderkey"), "left")
      .groupBy("o_orderkey", "total_cents")
      .agg(count(col("c")).as("n_items"),
        coalesce(sum(col("c")), lit(0L)).as("sum_item_cents"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.size === graft.core.Tables.orders(spark, sf).count().toInt)
  }
}
