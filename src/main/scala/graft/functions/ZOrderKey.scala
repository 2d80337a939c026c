package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Codegen'd Z-order (Morton) key: interleaves the low 16 bits of two
  * integral columns — x on even bit positions, y on odd — producing the
  * space-filling-curve key used to CLUSTER data layout so that range
  * predicates on either (or both) dimensions touch few files. At 100 TB
  * this is the write-side move that makes multi-dimensional scans cheap:
  * sort/partition by z-key, and min/max file statistics prune on both
  * dimensions at once (the trick behind Delta/Iceberg Z-ORDER table
  * maintenance — here as a first-class engine function).
  *
  * The bit spread uses the standard mask-shift cascade (5 steps per
  * side, no loop, no branch) — a handful of long ops inside
  * WholeStageCodegen. The interpreted eval and the DuckDB oracle mirror
  * run the exact same integer arithmetic, so results are engine-exact.
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType match {
      case IntegerType | LongType | ShortType | ByteType => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder expects integral inputs, got ${left.dataType} / ${right.dataType}")

  /** Spread the low 16 bits of v across even bit positions of a long. */
  @inline private def spread(v: Long): Long = {
    var s = v & 0xFFFFL
    s = (s | (s << 8)) & 0x00FF00FFL
    s = (s | (s << 4)) & 0x0F0F0F0FL
    s = (s | (s << 2)) & 0x33333333L
    s = (s | (s << 1)) & 0x55555555L
    s
  }

  private def toLong(v: Any): Long = v match {
    case i: Int   => i.toLong
    case l: Long  => l
    case s: Short => s.toLong
    case b: Byte  => b.toLong
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    spread(toLong(l)) | (spread(toLong(r)) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      s"""
         |long $sx = ((long) $x) & 0xFFFFL;
         |$sx = ($sx | ($sx << 8)) & 0x00FF00FFL;
         |$sx = ($sx | ($sx << 4)) & 0x0F0F0F0FL;
         |$sx = ($sx | ($sx << 2)) & 0x33333333L;
         |$sx = ($sx | ($sx << 1)) & 0x55555555L;
         |long $sy = ((long) $y) & 0xFFFFL;
         |$sy = ($sy | ($sy << 8)) & 0x00FF00FFL;
         |$sy = ($sy | ($sy << 4)) & 0x0F0F0F0FL;
         |$sy = ($sy | ($sy << 2)) & 0x33333333L;
         |$sy = ($sy | ($sy << 1)) & 0x55555555L;
         |${ev.value} = $sx | ($sy << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}
