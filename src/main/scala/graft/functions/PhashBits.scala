package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native fused 8×8 integer DCT-II pHash bit vector (r15 optimization
  * round) — the one-expression replacement for mm_near_dup_phash's
  * four-stage interpreted HOF chain (row pass md, column pass dct, AC
  * sum, threshold bits), each stage of which needed its own
  * localCheckpoint purely to stop CollapseProject re-inlining the
  * previous stage's array into every element_at site (the r6c/r12
  * interpreted-HOF lessons).
  *
  *   phash_bits(bt, tl) == the HOF chain's `bits` array, exactly:
  *     md[i]  = Σ_x tl[(i/8)*8+x] · bt[x*8+(i%8)]      (0-based)
  *     dct[j] = Σ_y md[(j/8)*8+y] · tl[(j%8)*8+y]
  *     sac    = Σ_{k=1..63} dct[k]
  *     bits[j] = if (63·dct[j] > sac) 1 else 0
  *
  * Every operation is 64-bit INTEGER arithmetic (the dctT table is
  * scaled-integer millionths; |dct| ≤ 4e15, 63·|dct| ≤ 2.6e17 — far
  * inside Long), so native == HOF is exact equality by construction,
  * with no IEEE-order reasoning needed; ExpressionSpec still pins it
  * against an inline HOF replay on fixture-derived grids. `bt` is
  * array<int> (64 pixels), `tl` array<bigint> (the 64-entry dctT
  * literal); output array<int> of 64 threshold bits. */
case class PhashBits(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "phash_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<int>, array<bigint>), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  /** Shared scalar kernel — called by both the interpreted eval and (via
    * static dispatch) the generated code, so the two paths cannot drift. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val bt = a.asInstanceOf[ArrayData].toIntArray()
    val tl = b.asInstanceOf[ArrayData].toLongArray()
    new GenericArrayData(PhashBits.kernel(bt, tl))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = PhashBits.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.kernel($a.toIntArray(), $b.toLongArray()));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PhashBits =
    copy(left = newLeft, right = newRight)
}

object PhashBits {
  /** The integer DCT kernel (see class doc for the exact recurrence). */
  def kernel(bt: Array[Int], tl: Array[Long]): Array[Int] = {
    val md = new Array[Long](64)
    var i = 0
    while (i < 64) {
      var acc = 0L
      var x = 0
      while (x < 8) {
        acc += tl((i / 8) * 8 + x) * bt(x * 8 + (i % 8))
        x += 1
      }
      md(i) = acc
      i += 1
    }
    val dct = new Array[Long](64)
    var j = 0
    while (j < 64) {
      var acc = 0L
      var y = 0
      while (y < 8) {
        acc += md((j / 8) * 8 + y) * tl((j % 8) * 8 + y)
        y += 1
      }
      dct(j) = acc
      j += 1
    }
    var sac = 0L
    var k = 1
    while (k < 64) { sac += dct(k); k += 1 }
    val bits = new Array[Int](64)
    var m = 0
    while (m < 64) { bits(m) = if (63L * dct(m) > sac) 1 else 0; m += 1 }
    bits
  }
}
