package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinHashExpressionSpec extends SparkSpec {

  private def sigOf(xs: Seq[String], k: Int = 16): Seq[Long] = {
    import spark.implicits._
    Seq(Tuple1(xs)).toDF("s")
      .select(MinHashSignature.minhashSigs(col("s"), k).as("sig"))
      .head().getSeq[Long](0)
  }

  test("signature has width k, is deterministic, and is order-invariant (set semantics)") {
    val xs = Seq("alpha beta", "beta gamma", "gamma delta")
    val s1 = sigOf(xs)
    assert(s1.length === 16)
    assert(s1 === sigOf(xs))
    assert(s1 === sigOf(scala.util.Random.shuffle(xs)))
    assert(s1 === sigOf(xs ++ xs)) // duplicates don't change a min
  }

  test("signature of a union is the elementwise min (mergeability at scale)") {
    val a = Seq("a b", "b c", "c d")
    val b = Seq("x y", "y z")
    val sa = sigOf(a)
    val sb = sigOf(b)
    val su = sigOf(a ++ b)
    assert(su === sa.zip(sb).map { case (x, y) => math.min(x, y) })
  }

  test("identical sets agree on every slot; disjoint sets agree on almost none") {
    val a = (1 to 200).map(i => s"tok$i tok${i + 1}")
    val b = (1000 to 1200).map(i => s"tok$i tok${i + 1}")
    assert(sigOf(a) === sigOf(a))
    val agree = sigOf(a).zip(sigOf(b)).count { case (x, y) => x == y }
    assert(agree <= 2, s"$agree of 16 slots agree for disjoint sets")
  }

  test("slot-agreement fraction tracks true Jaccard for overlapping sets") {
    val base = (1 to 100).map(i => s"w$i w${i + 1}")
    val near = base.drop(5) ++ (1 to 5).map(i => s"x$i x${i + 1}") // J ~ 90/110
    val k = 128
    val agree = sigOf(base, k).zip(sigOf(near, k)).count { case (x, y) => x == y }
    val est = agree.toDouble / k
    val trueJ = 90.0 / 110.0
    assert(math.abs(est - trueJ) < 0.2, s"estimate $est vs true $trueJ")
  }

  test("SQL surface minhash_sigs works and equals the Column API") {
    import spark.implicits._
    Seq(Tuple1(Seq("p q", "q r"))).toDF("s").createOrReplaceTempView("mh_t")
    val viaSql = spark.sql("SELECT minhash_sigs(s, 16) AS sig FROM mh_t")
      .head().getSeq[Long](0)
    assert(viaSql === sigOf(Seq("p q", "q r")))
  }
}
