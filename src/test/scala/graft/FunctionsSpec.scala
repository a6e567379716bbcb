package graft

import graft.flags.FlagEval
import graft.functions.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Native Catalyst expression: SQL registration, Column API, codegen
  * path, and agreement with the scalar serving function.
  */
class FunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("flag_bucket SQL function matches serving-path scalar + vectors") {
    val rows = spark.sql(
      """SELECT flag_bucket('flag-key', 'user-1') AS b1,
        |       flag_bucket('flag-key', 'user-2') AS b2,
        |       flag_bucket('beta', 'alice') AS b3""".stripMargin).collect().head
    assert(rows.getDouble(0) == 96.0) // python-hashlib vector
    assert(rows.getDouble(1) == 60.0)
    assert(rows.getDouble(2) == 98.0)
  }

  test("Column API + codegen over a column of ids agrees with scalar") {
    import spark.implicits._
    val ids = (1 to 200).map(i => s"user-$i").toDF("id")
    val out = ids.select(col("id"),
        GraftExtensions.flagBucket(lit("salt-x"), col("id")).as("b"))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(1) == FlagEval.bucketFor("salt-x", r.getString(0)))
    }
  }

  test("null inputs yield null (nullIntolerant)") {
    val r = spark.sql("SELECT flag_bucket(NULL, 'x') AS b").collect().head
    assert(r.isNullAt(0))
  }

  test("constant folding: literal args are foldable at plan time") {
    val plan = spark.sql("SELECT flag_bucket('k', 'v') AS b").queryExecution.optimizedPlan
    // after constant folding no FlagBucket remains in the plan
    assert(!plan.expressions.exists(_.exists(_.isInstanceOf[graft.functions.FlagBucket])))
  }

  test("whole-stage codegen survives with the expression in the plan") {
    import spark.implicits._
    val df = spark.range(10).select(col("id").cast("string").as("id"))
      .select(GraftExtensions.flagBucket(lit("s"), col("id")).as("b"))
    // '*(1)' marks operators fused into a WholeStageCodegen stage
    val exec = df.queryExecution.executedPlan.toString
    assert(exec.contains("*(1) Project [flag_bucket"), exec)
  }
}
