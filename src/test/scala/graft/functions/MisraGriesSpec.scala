package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** [[MisraGriesAggregator]] — the mergeable-summary guarantee: for ANY
  * partitioning of the stream and ANY merge order, every item with true
  * frequency > N/(s+1) must survive in the summary, and the state never
  * exceeds s counters. (The surviving set may vary with order; the
  * guarantee may not.)
  */
class MisraGriesSpec extends AnyFunSuite {

  private def zipfStream(n: Int, keys: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    // p(k) ~ 1/k over key ids 1..keys
    val weights = (1 to keys).map(1.0 / _)
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    Seq.fill(n) {
      val u = rnd.nextDouble()
      s"k${cum.indexWhere(u <= _) + 1}"
    }
  }

  private def summarize(
      agg: MisraGriesAggregator,
      stream: Seq[String],
      chunkSizes: Seq[Int],
      rnd: scala.util.Random): Map[String, Long] = {
    val chunks = scala.collection.mutable.Buffer[Map[String, Long]]()
    var rest = stream
    var i = 0
    while (rest.nonEmpty) {
      val k = math.max(1, chunkSizes(i % chunkSizes.size))
      chunks += rest.take(k).foldLeft(agg.zero)(agg.reduce)
      rest = rest.drop(k)
      i += 1
    }
    // merge in a random tree order
    val buf = rnd.shuffle(chunks)
    buf.reduceLeft(agg.merge)
  }

  test("survivor guarantee holds under random chunkings and merge orders") {
    val s = 20
    val agg = new MisraGriesAggregator(s)
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(100 + seed)
      val stream = zipfStream(n = 5000, keys = 200, seed = seed)
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val threshold = stream.size.toLong / (s + 1).toLong
      val mustSurvive = truth.filter(_._2 > threshold).keySet
      assert(mustSurvive.nonEmpty, "test needs real heavy hitters")
      for (trial <- 1 to 3) {
        val chunkSizes = Seq.fill(8)(1 + rnd.nextInt(400))
        val summary = summarize(agg, stream, chunkSizes, rnd)
        assert(summary.size <= s)
        assert(mustSurvive.subsetOf(summary.keySet),
          s"seed=$seed trial=$trial lost ${mustSurvive -- summary.keySet}")
        // counter error bound: estimate never exceeds truth, short by <= N/(s+1)
        summary.foreach { case (k, est) =>
          assert(est <= truth(k))
          assert(truth(k) - est <= stream.size.toLong / (s + 1) + 1)
        }
      }
    }
  }

  test("single-chunk reduce equals exact counts when keys fit in state") {
    val agg = new MisraGriesAggregator(10)
    val stream = Seq("a", "b", "a", "c", "a", "b")
    val m = stream.foldLeft(agg.zero)(agg.reduce)
    assert(m === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    assert(agg.finish(m) === Seq("a", "b", "c"))
  }
}
