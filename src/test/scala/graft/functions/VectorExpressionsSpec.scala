package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {

  test("longDot equals the HOF aggregate(zip_with) formulation") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-7L, 0L, 9L), Seq(2L, 100L, -3L)),
      (Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
    val out = df.select(
      VectorFunctions.longDot(col("a"), col("b")).as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("hof"))
      .collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(out.map(_.getLong(0)).toSeq === Seq(32L, -41L, 0L)) // -14 + 0 - 27
  }

  test("longDot is null-safe") {
    import spark.implicits._
    val df = Seq((Some(Seq(1L)), None: Option[Seq[Long]])).toDF("a", "b")
    val out = df.select(VectorFunctions.longDot(col("a"), col("b"))).collect()
    assert(out.head.isNullAt(0))
  }

  test("hamming64 equals bit_count(xor)") {
    import spark.implicits._
    val df = Seq((0xF0F0L, 0x0F0FL), (123456789L, 123456789L), (-1L, 0L)).toDF("a", "b")
    val out = df.select(
      VectorFunctions.hamming64(col("a"), col("b")).as("native"),
      bit_count(col("a").bitwiseXOR(col("b"))).cast("long").as("builtin"))
      .collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(out.map(_.getLong(0)).toSeq === Seq(16L, 0L, 64L))
  }

  test("polyHash equals the HOF fold and handles unicode code points") {
    import spark.implicits._
    val df = Seq("abc", "", "hello world", "café", "a😀b").toDF("text")
    val out = df.select(
      graft.functions.PolyHash.polyHash(col("text")).as("native"),
      expr(
        """aggregate(
          |  transform(sequence(1, length(text)), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
          |  CAST(0 AS BIGINT),
          |  (h, c) -> (h * 31 + c) % 1000000007) AS hof""".stripMargin))
      .collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
    // golden: "abc" -> ((97*31)+98)*31+99 = 96354
    assert(out.head.getLong(0) === ((97L * 31 + 98) * 31 + 99))
  }

  test("longDot participates in whole-stage codegen (no fallback)") {
    // a non-constant source (so nothing constant-folds) and codegen-friendly
    // array construction (a HOF like transform would fall back and take the
    // whole projection out of codegen with it)
    val df = spark.range(100)
      .selectExpr("array(id, id + 1L, id + 2L) AS a", "array(2L, 3L, 4L) AS b")
      .select(VectorFunctions.longDot(col("a"), col("b")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // whole-stage-codegen'd operators print with a "*(stage)" prefix
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")), plan)
    // force execution through the codegen path; id=0 -> 0*2 + 1*3 + 2*4 = 11
    assert(df.orderBy("d").head().getLong(0) === 11L)
  }

  test("sortedIntersectCount equals array_intersect size on sorted distinct arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = Seq.fill(200) {
      val a = Seq.fill(1 + rnd.nextInt(60))(rnd.nextInt(100)).distinct.sorted
      val b = Seq.fill(1 + rnd.nextInt(60))(rnd.nextInt(100)).distinct.sorted
      (a, b)
    } :+ ((Seq.empty[Int], Seq(1, 2, 3))) :+ ((Seq(5), Seq(5)))
    val df = rows.toDF("a", "b").select(
      VectorFunctions.sortedIntersectCount(col("a"), col("b")).as("got"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("want"))
    assert(df.filter(col("got") =!= col("want")).count() === 0L)
    // codegen'd: on a non-foldable source the projection compiles into a
    // whole-stage span (the literal rows above constant-fold away)
    val ranged = spark.range(3).select(
      VectorFunctions.sortedIntersectCount(
        sequence(col("id").cast("int"), lit(5)),
        sequence(lit(2), lit(9))).as("d"))
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")), plan)
    // [id..5] ∩ [2..9] = {2,3,4,5} for id in 0..2
    assert(ranged.collect().map(_.getLong(0)).toSeq === Seq(4L, 4L, 4L))
  }

  test("SQL-surface types coerce like builtins; misuse fails analysis, not CCE") {
    import org.apache.spark.sql.AnalysisException
    // declared input types COERCE compatible arguments (like any builtin)
    // instead of CCE-ing at eval: ints widen to long in BOTH the codegen
    // and interpreted paths, numerics stringify for poly_hash
    assert(spark.sql("SELECT hamming64(5, 6)").head().getLong(0) === 2L)
    assert(spark.sql("SELECT long_dot(array(1, 2), array(3, 4))")
      .head().getLong(0) === 11L)
    assert(spark.sql("SELECT poly_hash(123)").head().getLong(0) ===
      PolyHash.compute(org.apache.spark.unsafe.types.UTF8String.fromString("123")))
    // a genuinely incompatible type is an ANALYSIS error, never a runtime
    // ClassCastException out of constant folding
    intercept[AnalysisException](
      spark.sql("SELECT poly_hash(map('a', 'b'))").collect())
    intercept[AnalysisException](
      spark.sql("SELECT hamming64(map('a', 'b'), 1)").collect())
    // minhash_sigs width: an Int-overflowing Long literal is rejected, not
    // silently truncated to its low 32 bits
    val e = intercept[AnalysisException](
      spark.sql("SELECT minhash_sigs(array('a'), 4294967304)").collect())
    assert(e.getMessage.contains("overflows Int"), e.getMessage)
  }

  test("constant folding (interpreted eval) agrees with codegen") {
    import org.apache.spark.sql.functions.lit
    // foldable children force interpreted eval in the optimizer — the path
    // that used to CCE for int-typed children before inputTypes coercion
    val z = spark.range(1).select(
      graft.functions.ZOrder2.zorder2(lit(3), lit(5)).as("z")).head().getLong(0)
    assert(z === graft.functions.ZOrder2.compute(3L, 5L))
  }
}
