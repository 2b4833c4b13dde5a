package graft

import graft.functions.GraftFunctions
import graft.text.JaroWinkler
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native Catalyst JaroWinklerExpr: value parity with the kernel, SQL
  * registration, null semantics, and codegen (no ScalaUDF node in the plan).
  */
class GraftFunctionsSpec extends AnyFunSuite with SparkTestBase {

  private val samples = Seq(
    ("martha", "marhta"), ("dixon", "dicksonx"), ("jellyfish", "smellyfish"),
    ("", ""), ("abc", ""), ("same", "same"),
    ("the quick brown fox", "the quick brown fax"))

  test("column API matches the Scala kernel on sample pairs") {
    import spark.implicits._
    val got = samples.toDF("a", "b")
      .select(GraftFunctions.jw(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0)).toSeq
    val want = samples.map { case (a, b) => JaroWinkler.jaroWinkler(a, b) }
    assert(got == want)
  }

  test("SQL registration: graft_jw callable from spark.sql") {
    GraftFunctions.register(spark)
    val v = spark.sql("SELECT graft_jw('martha', 'marhta') AS jw")
      .collect()(0).getDouble(0)
    assert(math.abs(v - JaroWinkler.jaroWinkler("martha", "marhta")) == 0.0)
    val err = intercept[Exception](spark.sql("SELECT graft_jw('only-one')").collect())
    assert(err.getMessage.contains("2 arguments"))
  }

  test("SQL registration: graft_minhash_agree and graft_media_dist") {
    GraftFunctions.register(spark)
    val agree = spark.sql(
      "SELECT graft_minhash_agree(array(1L,2L,3L,4L), array(1L,9L,3L,8L)) AS v")
      .collect()(0).getDouble(0)
    assert(agree == 0.5)
    val dist = spark.sql(
      "SELECT graft_media_dist(array(0L), array(3L), 1) AS d")
      .collect()(0).getInt(0)
    assert(dist == 2) // popcount(0 xor 3)
    val none = spark.sql(
      "SELECT graft_media_dist(CAST(array() AS ARRAY<BIGINT>), array(3L), 1) AS d")
      .collect()(0).getInt(0)
    assert(none == 9999) // sentinel: no media on one side
  }

  test("graft_media_dist guards: slots <= 0 and short arrays return the sentinel") {
    GraftFunctions.register(spark)
    // slots <= 0 is user-reachable via SQL and must not hang the slot loop
    Seq(0, -1).foreach { s =>
      val d = spark.sql(s"SELECT graft_media_dist(array(1L), array(2L), $s) AS d")
        .collect()(0).getInt(0)
      assert(d == 9999, s"slots=$s")
    }
    // non-empty array shorter than one slot group: no slot pair fits
    val short = spark.sql(
      "SELECT graft_media_dist(array(1L), array(2L,3L), 2) AS d")
      .collect()(0).getInt(0)
    assert(short == 9999)
  }

  test("null semantics: null input yields null, not an exception") {
    import spark.implicits._
    val got = Seq(("x", Option("y")), ("x", None)).toDF("a", "b")
      .select(GraftFunctions.jw(col("a"), col("b")).as("jw")).collect()
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0))
  }

  test("sorted_intersect: equals array_intersect size on random sorted sets, codegen'd") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(100)).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(100)).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
      .select(GraftFunctions.sortedIntersect(col("a"), col("b")).as("m"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
    // exactness vs the engine's own set intersect, including empty arrays
    assert(df.filter(col("m") =!= col("ref")).count() == 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    // null input yields null (nullIntolerant), not an exception
    val got = Seq((Option(Seq(1, 2)), Option(Seq(2, 3))), (Option(Seq(1)), None))
      .toDF("a", "b")
      .select(GraftFunctions.sortedIntersect(col("a"), col("b")).as("m")).collect()
    assert(got(0).getInt(0) == 1 && got(1).isNullAt(0))
  }

  test("codegen: the expression stays inside WholeStageCodegen (no ScalaUDF)") {
    // range-backed input: literals would be constant-folded at plan time
    val df = spark.range(100).select(
      concat(lit("martha"), col("id").cast("string")).as("a"),
      concat(lit("marhta"), col("id").cast("string")).as("b"))
      .select(GraftFunctions.jw(col("a"), col("b")).as("jw"))
      .filter(col("jw") > 0.5)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    // "*(n)" is the WholeStageCodegen marker; the expression must sit inside
    assert(plan.contains("*(1) Project [graft_jw") &&
      plan.contains("*(1) Filter (graft_jw"), plan)
    assert(df.count() == 100) // executes the generated code path
  }
}
