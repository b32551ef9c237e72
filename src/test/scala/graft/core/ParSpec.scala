package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Par]] — the round-16 parallelism-pinning helper. Pins the two claims
  * the optimization relies on: the fan-out really spreads a single-split
  * frame to the configured shuffle parallelism (AQE must not re-coalesce
  * it), and fanning out never changes WHAT a query computes — only where
  * its rows sit. Also pins the two internals the fan-out was threaded
  * through: the k-means trainer must learn identical centroids on any
  * input layout, and the pinned-count partitioned write must still put
  * exactly one file in each hive directory.
  */
class ParSpec extends SparkSpec {
  import spark.implicits._

  private def shufflePartitions: Int =
    spark.conf.get("spark.sql.shuffle.partitions").toInt

  test("fanOut spreads a 1-partition frame to the configured parallelism") {
    val one = spark.range(0, 1000, 1, 1).toDF("id")
    assert(one.rdd.getNumPartitions === 1)
    val fanned = Par.fanOut(one)
    // executed layout, not the plan: write through an action and count
    // distinct task partitions — AQE must not have re-coalesced the pinned
    // exchange below the session parallelism
    val parts = fanned.select(spark_partition_id().as("p")).distinct().count()
    assert(parts === shufflePartitions.toLong)
    // and the rows are exactly the input's
    assert(fanned.agg(count(lit(1)), sum("id")).as[(Long, Long)].head()
      === ((1000L, 499500L)))
  }

  test("fanOutBy clusters by key at the configured parallelism") {
    val df = spark.range(0, 200, 1, 1)
      .select((col("id") % 7).as("k"), col("id").as("v"))
    val fanned = Par.fanOutBy(df, col("k"))
    // same-key rows land in the same partition (hash clustering holds)
    val spread = fanned
      .select(col("k"), spark_partition_id().as("p"))
      .groupBy("k").agg(countDistinct("p").as("np"))
      .filter(col("np") > 1).count()
    assert(spread === 0L)
    // and the groupBy on the same key computes the same aggregate
    val got = fanned.groupBy("k").agg(sum("v").as("s")).orderBy("k").as[(Long, Long)].collect()
    val want = df.groupBy("k").agg(sum("v").as("s")).orderBy("k").as[(Long, Long)].collect()
    assert(got.toSeq === want.toSeq)
  }

  test("kmeansCells learns identical centroids on 1-partition and fanned input") {
    val vecs = Seq.tabulate(60) { i =>
      (i.toLong, Array.tabulate(4)(j => ((i * 37 + j * 11) % 23).toLong))
    }
    def frame(slices: Int) = {
      val base = spark.createDataFrame(
        spark.sparkContext.parallelize(vecs, slices)
          .map { case (id, q) => (id, q.toSeq) })
        .toDF("vec_id", "q")
      base.withColumn("norm2", expr("aggregate(q, 0L, (a, x) -> a + x * x)"))
    }
    val (a1, c1) = graft.vector.Similarity.kmeansCells(frame(1), 4, 2)
    val (a2, c2) = graft.vector.Similarity.kmeansCells(frame(7), 4, 2)
    assert(c1.map { case (c, a) => (c, a.toSeq) } === c2.map { case (c, a) => (c, a.toSeq) })
    val l1 = a1.select("vec_id", "cell").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val l2 = a2.select("vec_id", "cell").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(l1 === l2)
  }

  test("writeProcessed's pinned-count clustering still writes one file per hive dir") {
    withTempDir { dir =>
      val df = Seq.tabulate(120) { i =>
        (i, s"R$i", s"S${i % 10}", java.sql.Date.valueOf(s"202${i % 3}-0${i % 9 + 1}-01"), 100.0 + i)
      }.toDF("RegionID", "RegionName", "StateName", "month", "median_rent")
      graft.rentals.Io.writeProcessed(df, dir.getAbsolutePath)
      val leafDirs = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("StateName="))
        .flatMap(st => Option(st.listFiles()).getOrElse(Array.empty))
        .filter(f => f.isDirectory && f.getName.startsWith("year="))
      assert(leafDirs.nonEmpty)
      leafDirs.foreach { leaf =>
        val files = Option(leaf.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        assert(files.length === 1,
          s"expected exactly one parquet file in ${leaf}, got ${files.length}")
      }
    }
  }
}
