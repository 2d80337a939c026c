package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Z-order key semantics: bit interleave matches a reference Scala
  * implementation (including the 16-bit mask on oversized inputs), and
  * codegen and interpreted paths agree. */
class ZOrderKeySpec extends AnyFunSuite with SparkSpec {

  private def refZ(x: Long, y: Long): Long = {
    def spread(v: Long): Long =
      (0 until 16).map(i => ((v >> i) & 1L) << (2 * i)).sum
    spread(x & 0xFFFF) | (spread(y & 0xFFFF) << 1)
  }

  test("interleave matches the bit-by-bit reference, incl. masking") {
    import spark.implicits._
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (65536L, 2L), (12345L, 54321L), (3L, 70000L))
    val got = cases.toDF("x", "y")
      .select(expr("graft_zorder(x, y)").as("z")).as[Long].collect()
    assert(got.toSeq === cases.map { case (x, y) => refZ(x, y) })
    // z-order locality sanity: interleaving preserves the quadrant order
    assert(refZ(0, 0) < refZ(1, 1) && refZ(1, 1) < refZ(2, 2))
  }

  test("codegen and interpreted evaluation agree") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i * 37 % 70000, i * 91 % 70000)).toDF("x", "y")
    val codegen = df.select(expr("graft_zorder(x, y)").as[Long]).collect()
    val interp = df.collect().map(r => {
      val e = ZOrderKey(
        org.apache.spark.sql.catalyst.expressions.Literal(r.getLong(0)),
        org.apache.spark.sql.catalyst.expressions.Literal(r.getLong(1)))
      e.eval(null).asInstanceOf[Long]
    })
    assert(codegen.toSeq === interp.toSeq)
  }
}
