package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-4 text/corpus operators: PII redaction, overlapping chunking,
  * unigram commonality, keep-best dedup consolidation.
  */
class TextOpsSpec extends SparkSpec {

  private def docsDir(docs: Seq[(Long, String)])(f: String => Unit): Unit =
    withTempDir { dir =>
      import spark.implicits._
      docs.toDF("doc_id", "text")
        .withColumn("lang", lit("en"))
        .withColumn("source", lit("test"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      f(dir.getAbsolutePath)
    }

  test("pii_redact masks every planted span and counts them per kind") {
    // doc_id 30 divides 2, 3 and 5 -> email + phone + ip all planted;
    // doc_id 7 divides none -> nothing planted, counts must be zero
    docsDir(Seq(30L -> "plain words here", 7L -> "nothing sensitive")) { dir =>
      val out = TextAnalysis.piiRedact.fn(spark, dir)
        .collect().map(r => r.getLong(0) -> r).toMap
      val r30 = out(30L)
      assert(r30.getInt(1) === 1, "one email")
      assert(r30.getInt(2) === 1, "one phone")
      assert(r30.getInt(3) === 1, "one ip")
      val red30 = r30.getString(4)
      assert(red30.contains("<EMAIL>") && red30.contains("<PHONE>") && red30.contains("<IP>"))
      assert(!red30.contains("@example.com") && !red30.contains("555-") && !red30.contains("10.0."))
      val r7 = out(7L)
      assert(r7.getInt(1) === 0 && r7.getInt(2) === 0 && r7.getInt(3) === 0)
      assert(r7.getString(4) === "nothing sensitive")
    }
  }

  test("doc_chunks: 64-token windows at stride 48 cover the doc with 16-token overlap") {
    val tokens = (1 to 100).map(i => s"t$i")
    docsDir(Seq(1L -> tokens.mkString(" "))) { dir =>
      val rows = TextAnalysis.docChunks.fn(spark, dir)
        .orderBy(col("chunk_idx")).collect()
      assert(rows.length === 3) // starts 0, 48, 96
      val starts = rows.map(_.getInt(3)).toSeq
      val lens = rows.map(_.getInt(4)).toSeq
      assert(starts === Seq(0, 48, 96))
      assert(lens === Seq(64, 52, 4))
      val texts = rows.map(_.getString(5))
      assert(texts(0) === tokens.slice(0, 64).mkString(" "))
      assert(texts(1) === tokens.slice(48, 100).mkString(" "))
      assert(texts(2) === tokens.slice(96, 100).mkString(" "))
      // consecutive chunks overlap by exactly window - stride = 16 tokens
      assert(texts(0).split(" ").takeRight(16).toSeq === texts(1).split(" ").take(16).toSeq)
    }
  }

  test("token_commonality matches the hand computation on a tiny corpus") {
    // corpus: d1 = "a a b", d2 = "b c"; ctf a=2 b=2 c=1, total=5
    // d1: n=3, w = 2*2 + 1*2 = 6, commonality 6/15 = 0.4
    // d2: n=2, w = 1*2 + 1*1 = 3, commonality 3/10 = 0.3
    docsDir(Seq(1L -> "a a b", 2L -> "b c")) { dir =>
      val out = Corpus.tokenCommonality.fn(spark, dir)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      assert(out(1L) === ((3L, 6L, 0.4)))
      assert(out(2L) === ((2L, 3L, 0.3)))
    }
  }

  test("dedup_keep_best keeps exactly the highest-quality member of each cluster") {
    val base = "the quick brown fox jumps over the lazy dog while the cat sleeps near " +
      "the warm fire and the birds sing in the tall green trees above the quiet garden"
    val nearDup = base.replace("quiet garden", "silent yard")
    val disjoint = "completely different words about spark shuffle partitions and " +
      "broadcast joins in distributed query engines running on large clusters"
    docsDir(Seq(1L -> base, 2L -> nearDup, 3L -> disjoint)) { dir =>
      val rows = Corpus.dedupKeepBest.fn(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      assert(rows.length === 3)
      val byCluster = rows.groupBy(_._2)
      assert(byCluster.keySet === Set(1L, 3L), "near-dups cluster under min id; singleton self-labels")
      byCluster.foreach { case (_, members) =>
        assert(members.count(_._4) === 1, s"exactly one survivor per cluster: $members")
        val kept = members.find(_._4).get
        assert(members.forall(m => m._3 < kept._3 || (m._3 == kept._3 && m._1 >= kept._1)),
          s"survivor has max quality (ties -> min doc_id): $members")
      }
    }
  }

  test("levenshtein_consecutive: known edit distances on normalized prefixes") {
    // after lower+strip: "kitten" vs "sitting" = 3; "abc def!" vs "abc def?"
    // normalize to the same string = 0; non-letters never count
    docsDir(Seq(1L -> "Kitten", 2L -> "Sitting", 3L -> "abc def!", 4L -> "abc def?")) { dir =>
      val out = TextAnalysis.levenshteinConsecutive.fn(spark, dir)
        .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getDouble(3)))).toMap
      assert(out(1L)._1 === 3)
      assert(out(3L)._1 === 0)
      assert(out(3L)._2 === 1.0)
      out.values.foreach { case (lev, sim) =>
        assert(lev >= 0 && sim >= 0.0 && sim <= 1.0)
      }
    }
  }
}
