package graft.ops

import graft.SparkSpec
import graft.core.{Num, Tables}
import graft.functions.ZOrder2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("zorder2 equals a naive bit-by-bit interleave") {
    val rnd = new scala.util.Random(7)
    def naive(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 32) {
        z |= ((x >> i) & 1L) << (2 * i)
        if (2 * i + 1 < 64) z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    for (_ <- 1 to 500) {
      val x = rnd.nextLong() & 0xFFFFFFFFL
      val y = rnd.nextLong() & 0x7FFFFFFFL
      assert(ZOrder2.compute(x, y) === naive(x, y), s"x=$x y=$y")
    }
    assert(ZOrder2.compute(0L, 0L) === 0L)
    assert(ZOrder2.compute(1L, 0L) === 1L)
    assert(ZOrder2.compute(0L, 1L) === 2L)
  }

  test("expression evaluates identically through codegen and matches compute()") {
    import spark.implicits._
    val rows = (1L to 1000L).map(i => (i * 2654435761L & 0xFFFFFFFFL, i % 64))
    val df = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder2.zorder2(col("x"), col("y")).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) === ZOrder2.compute(r.getLong(0), r.getLong(1)))
    }
  }

  /** Per-file (min, max) of a column after writing `path`. */
  private def fileRanges(df: DataFrame, c: String): Map[String, (Double, Double)] =
    df.groupBy(input_file_name().as("f"))
      .agg(min(col(c).cast("double")).as("lo"), max(col(c).cast("double")).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap

  test("writeZOrdered handles a constant column (degenerate range) without dividing by zero") {
    withTempDir { dir =>
      import spark.implicits._
      val df = (1L to 100L).map(i => (i, 7L)).toDF("x", "c")
      Layout.writeZOrdered(df, "x", "c", s"$dir/const", 4)
      val back = spark.read.parquet(s"$dir/const")
      assert(back.count() === 100)
      assert(back.select(countDistinct(col("c"))).head().getLong(0) === 1)
    }
  }

  test("writeZOrdered still clusters when one extreme outlier would flatten min/max bins") {
    withTempDir { dir =>
      import spark.implicits._
      val rnd = new scala.util.Random(11)
      // uniform mass in [0,1000]^2 plus one extreme x outlier: min/max
      // normalization would put every regular row in x-bin 0 and cluster
      // nothing; quantile bins ignore the outlier's leverage
      val rows = (1 to 4000).map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong)) :+
        ((1000000000000L, 500L))
      val df = rows.toDF("x", "y")
      val nFiles = 8
      Layout.writeZOrdered(df, "x", "y", s"$dir/outlier", nFiles)
      val back = spark.read.parquet(s"$dir/outlier")
      assert(back.count() === 4001)
      val xRanges = fileRanges(back, "x")
      val yRanges = fileRanges(back, "y")
      def overlapping(ranges: Map[String, (Double, Double)], lo: Double, hi: Double) =
        ranges.count { case (_, (flo, fhi)) => fhi >= lo && flo <= hi }
      // a bottom-eighth box on either dimension skips files on BOTH
      // dimensions (min/max normalization would leave x fully unclustered:
      // every regular row in x-bin 0, all 8 files overlapping any x box).
      // Threshold has one file of slack: repartitionByRange samples its
      // boundaries, so file splits wobble run to run.
      assert(overlapping(xRanges, 0, 125) <= nFiles / 2 + 1,
        s"x overlap ${overlapping(xRanges, 0, 125)} of $nFiles: $xRanges")
      assert(overlapping(yRanges, 0, 125) <= nFiles / 2 + 1,
        s"y overlap ${overlapping(yRanges, 0, 125)} of $nFiles: $yRanges")
    }
  }

  test("writeZOrdered: empty input and null coordinates write without failing") {
    withTempDir { dir =>
      import spark.implicits._
      val empty = Seq.empty[(Long, Long)].toDF("x", "y")
      Layout.writeZOrdered(empty, "x", "y", s"$dir/empty", 2)
      assert(spark.read.parquet(s"$dir/empty").count() === 0)

      val withNulls = Seq((Some(1L), Some(2L)), (None, Some(5L)), (Some(9L), None))
        .map { case (a, b) => (a.map(Long.box).orNull, b.map(Long.box).orNull) }
        .toDF("x", "y")
      Layout.writeZOrdered(withNulls, "x", "y", s"$dir/nulls", 2)
      assert(spark.read.parquet(s"$dir/nulls").count() === 3)

      val allNull = Seq((null: java.lang.Long, java.lang.Long.valueOf(4L))).toDF("x", "y")
      Layout.writeZOrdered(allNull, "x", "y", s"$dir/allnull", 2)
      assert(spark.read.parquet(s"$dir/allnull").count() === 1)
    }
  }

  test("z-ordered layout skips files on BOTH dimensions; single sort only on its own") {
    withTempDir { dir =>
      val li = Tables.lineitem(spark, sf)
        .select(
          Num.cents(col("l_extendedprice")).as("cents"),
          round(col("l_quantity")).cast("long").as("qty"))
      val nFiles = 16

      Layout.writeZOrdered(li, "cents", "qty", s"$dir/zordered", nFiles)
      val z = spark.read.parquet(s"$dir/zordered")

      li.repartitionByRange(nFiles, col("cents"))
        .sortWithinPartitions(col("cents"))
        .write.mode("overwrite").parquet(s"$dir/centssorted")
      val s = spark.read.parquet(s"$dir/centssorted")

      def overlapping(ranges: Map[String, (Double, Double)], lo: Double, hi: Double) =
        ranges.count { case (_, (flo, fhi)) => fhi >= lo && flo <= hi }

      // narrow box on each dimension (bottom ~sixth of each range)
      val zCents = fileRanges(z, "cents")
      val zQty = fileRanges(z, "qty")
      val sCents = fileRanges(s, "cents")
      val sQty = fileRanges(s, "qty")
      assert(zCents.size === nFiles)

      val centsHi = 800000.0 // bottom ~1/16 of [~90k, ~11.5M]
      val qtyHi = 4.0 // bottom ~1/16 of [1, 50]

      val zSkipCents = overlapping(zCents, 0, centsHi)
      val zSkipQty = overlapping(zQty, 1, qtyHi)
      val sSkipCents = overlapping(sCents, 0, centsHi)
      val sSkipQty = overlapping(sQty, 1, qtyHi)

      // z-order prunes meaningfully on BOTH columns (the curve wanders, so
      // a slab touches more files than its volume share — but far from all)
      assert(zSkipCents <= nFiles / 2, s"z cents overlap $zSkipCents of $nFiles")
      assert(zSkipQty <= nFiles / 2, s"z qty overlap $zSkipQty of $nFiles")
      // the cents-sorted layout prunes cents at least as well...
      assert(sSkipCents <= 2, s"sorted cents overlap $sSkipCents")
      // ...but is blind on qty: (almost) every file spans the qty box
      assert(sSkipQty >= nFiles - 1, s"sorted qty overlap $sSkipQty")
    }
  }

  test("compact_small_files: 48 fragments become 4 range-disjoint files with identical content") {
    val dir = "/root/testdata/sf0.001"
    val (fragmented, compacted) = Layout.compactFixture(spark, dir)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(fragmented).length === 48)
    val files = parquetFiles(compacted)
    assert(files.length === 4)
    // content identical under the rewrite
    val a = spark.read.parquet(fragmented).orderBy("l_suppkey", "month").collect()
    val b = spark.read.parquet(compacted).orderBy("l_suppkey", "month").collect()
    assert(a.toSeq === b.toSeq)
    // range clustering: per-file suppkey intervals are pairwise disjoint
    val ranges = files.map { f =>
      val d = spark.read.parquet(f.getAbsolutePath)
        .agg(org.apache.spark.sql.functions.min("l_suppkey"),
          org.apache.spark.sql.functions.max("l_suppkey")).head()
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) => assert(hi <= lo) }
  }

  test("targeted_delete_rewrite: zero listed users survive; everyone else untouched") {
    val dir = "/root/testdata/sf0.001"
    val out = Layout.deleteRewriteFixture(spark, dir)
    val rewritten = spark.read.parquet(out)
    assert(rewritten.filter(col("user_id") % 13 === 0).count() === 0L)
    val expected = graft.core.Tables.events(spark, dir)
      .filter(col("user_id") % 13 =!= 0).count()
    assert(rewritten.count() === expected)
  }
}
