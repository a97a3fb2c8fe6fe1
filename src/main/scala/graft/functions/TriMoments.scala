package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native in-row moment-tuple generator for the exact-integer covariance
  * family (r15 optimization round) — replaces KmeansQueries.microAll's
  * nested interpreted transforms, which built 64 linear + 2080
  * upper-triangle product structs per row through per-element
  * CodegenFallback evaluation (~13M interpreted expression evals over
  * the fixture corpus).
  *
  *   tri_moments(qs) == concat(
  *     transform(1..n, i -> struct(i, 0, qs[i])),
  *     flatten(transform(1..n, i -> transform(i..n, j ->
  *       struct(i, j, qs[i]*qs[j])))))
  *
  * for qs array<bigint> of length n — same (i, j, p) values (1-based i,
  * j; j = 0 marks the linear moment), same order, all integer, so the
  * downstream explode + groupBy((i, j)) sums are identical by
  * construction. ExpressionSpec pins it against the inline HOF
  * spelling. */
case class TriMoments(child: Expression) extends UnaryExpression {

  private val structType = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("p", LongType, nullable = false)))

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "tri_moments"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<bigint>, got ${t.catalogString}")
    }

  override def nullSafeEval(a: Any): Any =
    TriMoments.kernel(a.asInstanceOf[ArrayData].toLongArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = TriMoments.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.kernel($a.toLongArray());"
    })

  override protected def withNewChildInternal(newChild: Expression): TriMoments =
    copy(child = newChild)
}

object TriMoments {
  def kernel(qs: Array[Long]): GenericArrayData = {
    val n = qs.length
    val out = new Array[Any](n + n * (n + 1) / 2)
    var k = 0
    var i = 1
    while (i <= n) {
      out(k) = InternalRow(i, 0, qs(i - 1)); k += 1; i += 1
    }
    i = 1
    while (i <= n) {
      var j = i
      while (j <= n) {
        out(k) = InternalRow(i, j, qs(i - 1) * qs(j - 1)); k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
