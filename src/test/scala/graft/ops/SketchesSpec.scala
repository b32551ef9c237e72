package graft.ops

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("count-min estimates never under-count and stay within eps*n of exact") {
    val rows = Sketches.cmsSupplierFreq.fn(spark, sf).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_n") >= 0)
      assert(r.getAs[Boolean]("cms_within_bound"), s"CMS bound violated: $r")
    }
  }

  test("bloom filter has no false negatives and bounded false positives") {
    val keys = Tables.lineitem(spark, sf).select(col("l_suppkey"))
    val present = keys.distinct().collect().map(_.getLong(0)).toSet
    val bloom = keys.stat.bloomFilter("l_suppkey", expectedNumItems = 1000L, fpp = 0.03)
    present.foreach(k => assert(bloom.mightContain(k), s"false negative for $k"))
    val absentProbes = (100000L until 102000L).filterNot(present)
    val falsePositives = absentProbes.count(bloom.mightContain)
    assert(falsePositives.toDouble / absentProbes.size < 0.06,
      s"$falsePositives / ${absentProbes.size} false positives")
  }
}
