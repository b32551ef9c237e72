package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query on
  * `SPARK_GRAFT_SF_DIR`, prints one JSON line.
  *
  * Each query is materialized through the `noop` sink — unlike `count()`,
  * which lets Catalyst prune away every computed column, noop forces the full
  * result to be produced, so the numbers measure real operator throughput.
  *
  * The harness that invokes this keeps only the final ~2000 characters of
  * output, so the printed line must stay small: it carries the total plus a
  * fixed headline subset, with the full per-query map written to
  * `BENCH_DETAIL.json` alongside the build.
  */
object Bench {

  /** One representative per operator family (kept short so the summary JSON
    * line — the only thing the harness retains — fits its 2000-char window).
    */
  private val headline = Seq(
    "rentals_pipeline", "zori_csv_pipeline", "partitioned_write_readback",
    "scan_filter_project", "join_region_revenue", "tpch_q3_style",
    "asof_join_purchase", "agg_pricing_summary", "agg_percentiles",
    "topk_suppliers_per_nation", "window_frames", "sessionize_events",
    "streaming_hourly_complete", "dedup_exact_text", "dedup_minhash_lsh",
    "dedup_simhash", "knn_brute_cosine", "ann_ivf_probe", "text_stats",
    "json_extract_agg", "multimodal_join", "asof_join_native", "zorder_hist")

  private def fmt(v: Double): String = f"$v%.3f"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.core.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    // A crashed query must NOT contaminate the totals: its time-to-throw
    // (often milliseconds) would silently stand in for its real cost
    // (round-6 lesson: three crashed queries hid at ~0.06 s each inside a
    // 171 s total). Failures are recorded per query and excluded from
    // total/n_queries; BENCH_DETAIL carries the error message.
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Pinned-family annotation: which shared pinned derivations each query
    // reads, and whether one of ITS timed runs paid the one-time derivation
    // (the first consumer's median embeds the cold cost; family siblings
    // measure incremental cost only — BENCH_DETAIL makes that visible
    // instead of letting cold and warm medians masquerade as comparable).
    val pinnedFamilies = scala.collection.mutable.LinkedHashMap.empty[String, Set[String]]
    val paysDerivation = scala.collection.mutable.LinkedHashSet.empty[String]
    def timeOne(name: String): Double = {
      graft.core.Pinned.drainTouched() // discard accesses from outside timed runs
      val t0 = System.nanoTime()
      try run(name)
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(300)}"
        failed.getOrElseUpdate(name, msg)
        System.err.println(s"[bench] $name failed: $msg")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val touches = graft.core.Pinned.drainTouched()
      if (touches.nonEmpty) {
        pinnedFamilies(name) = pinnedFamilies.getOrElse(name, Set.empty) ++ touches.map(_._1)
        if (touches.exists(_._2)) paysDerivation += name
      }
      dt
    }

    // Three INTERLEAVED passes (A,B,C,...,A,B,C,...), median per query: a
    // host-contention window minutes long lands on different queries in
    // different passes, so the median rejects it — consecutive same-query
    // runs would all sit inside the window and the median would keep the
    // inflated value (observed: one query's three back-to-back runs read
    // 5s/27s/32s under a contention burst that isolation can't reproduce).
    // Pass 1 doubles as JIT/codegen warmup; the recorded per-query spread
    // makes any residual interference visible instead of silent.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val passes = (1 to 3).map(_ => names.map(n => n -> timeOne(n)).toMap)
    def medOf(rs: Seq[Double]): Double = rs.sorted.apply(rs.size / 2)
    var runsByName = names.map(n => n -> passes.map(_(n))).toMap
    // The heaviest queries dominate the total AND show the widest contention
    // spread (up to ~4x min-to-max observed), so the 10 largest 3-pass
    // medians get two MORE interleaved passes — median-of-5 rejects up to
    // two contaminated runs instead of one.
    val heavy = names.sortBy(n => -medOf(runsByName(n))).take(10)
    for (_ <- 1 to 2)
      heavy.foreach(n => runsByName = runsByName.updated(n, runsByName(n) :+ timeOne(n)))
    // Spread control: a query whose observed min-to-max spread still exceeds
    // 3x after the passes above was hit by host contention (or pays a
    // one-time derivation in run 1) — two more interleaved passes let the
    // median reject up to three contaminated runs. Bounded to the widest 15
    // non-trivial queries so ambient noise on millisecond queries can't
    // trigger a full re-run of the suite.
    def spreadOf(rs: Seq[Double]): Double = rs.max / math.max(rs.min, 1e-9)
    val wide = names
      .filter(n => medOf(runsByName(n)) > 0.5 && spreadOf(runsByName(n)) > 3.0)
      .sortBy(n => -medOf(runsByName(n))).take(15)
    for (_ <- 1 to 2)
      wide.foreach(n => runsByName = runsByName.updated(n, runsByName(n) :+ timeOne(n)))
    val allResults = names.map(n => n -> medOf(runsByName(n)))
    val results = allResults.filterNot { case (n, _) => failed.contains(n) }
    val total = results.map(_._2).sum
    val byName = results.toMap

    def jsonStr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val detail = allResults.map { case (k, _) =>
      val rs = runsByName(k)
      val sortedRs = rs.sorted
      val err = failed.get(k).map(m => ",\"err\":" + jsonStr(m)).getOrElse("")
      val pinned = pinnedFamilies.get(k).filter(_.nonEmpty).map(fams =>
        ",\"pinned_family\":[" + fams.toSeq.sorted.map(jsonStr).mkString(",") + "]" +
          ",\"pays_derivation\":" + paysDerivation.contains(k)).getOrElse("")
      "\"" + k + "\":{\"med\":" + fmt(medOf(rs)) + ",\"min\":" + fmt(sortedRs.head) +
        ",\"max\":" + fmt(sortedRs.last) +
        ",\"runs\":[" + rs.map(fmt).mkString(",") + "]" + err + pinned + "}"
    }.mkString("{", ",", "}")
    val detailJson =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","agg":"median_of_3_to_7","n_queries":${results.size},"n_failed":${failed.size},"queries":$detail,"sf":"$sfDir"}"""
    try {
      val w = new java.io.PrintWriter("BENCH_DETAIL.json")
      try w.println(detailJson) finally w.close()
    } catch { case e: Throwable => System.err.println(s"[bench] detail write failed: $e") }

    val qs = headline.filter(byName.contains)
      .map(k => "\"" + k + "\":" + fmt(byName(k)))
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
