package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Direct edge coverage for the custom DotProduct expression — the query
  * registry only exercises it on clean 64-dim float data; these probe the
  * contract edges through the registered SQL function (codegen path) and
  * a cache-materialized frame (interpreted eval path). */
class DotProductSpec extends AnyFunSuite with SparkSpec {

  private def dotSql(a: String, b: String): java.lang.Double = {
    val r = spark.sql(s"SELECT graft_dot($a, $b) AS d").head()
    if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0))
  }

  test("mixed element types, null arrays, length mismatch") {
    // float × double literals
    assert(dotSql("array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT))",
      "array(2.0D, 3.0D)") === 9.0)
    // null array propagates null
    assert(dotSql("CAST(NULL AS ARRAY<FLOAT>)", "array(CAST(1.0 AS FLOAT))") === null)
    // length mismatch: min-length contract
    assert(dotSql("array(1.0D, 2.0D, 100.0D)", "array(3.0D, 4.0D)") === 11.0)
    // empty (typed) arrays; untyped array() is ArrayType(NullType) and is
    // correctly rejected by checkInputDataTypes
    assert(dotSql("CAST(array() AS ARRAY<DOUBLE>)", "CAST(array() AS ARRAY<DOUBLE>)") === 0.0)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_dot(array('x'), array('y'))").head()
    }
  }

  test("codegen and interpreted paths agree with the HOF fallback") {
    import spark.implicits._
    val df = Seq(
      (Array(0.5f, -1.25f, 3.0f), Array(2.0f, 4.0f, -0.5f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)))
      .toDF("a", "b")
    val viaExpr = df.selectExpr("graft_dot(a, b) AS d").collect().map(_.getDouble(0)).toSeq
    val viaHof = df.select(
      VectorFunctions.dot(org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    assert(viaExpr === viaHof) // bitwise: same fold order, same casts
  }
}
