package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `vec_dot(a, b)`: dot product of two numeric array columns
  * (tinyint/smallint/float/double, mixable), accumulated in double — a
  * native Catalyst expression with whole-stage-codegen support. Byte
  * arrays make the int8-quantized ANN coarse stage a primitive loop
  * over packed bytes (see `llm.Quantize`).
  *
  * Rationale (builder brief: custom Expression beats UDF beats HOF in
  * the hot path): the equivalent
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` builds an intermediate
  * array and evaluates interpreted lambdas per element; this expression
  * compiles to a primitive loop — the difference is large on 64-1024-dim
  * embeddings scanned billions of times in ANN/dedup jobs.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(ByteType | ShortType | FloatType | DoubleType, _) =>
        true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<tinyint|smallint|float|double>, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  /** ArrayData accessor name for the element type (codegen + eval). */
  private def getter(e: Expression): String = e.dataType match {
    case ArrayType(ByteType, _) => "getByte"
    case ArrayType(ShortType, _) => "getShort"
    case ArrayType(FloatType, _) => "getFloat"
    case _ => "getDouble"
  }

  // dispatch hoisted OUT of the element loop: interpreted eval calls
  // nullSafeEval per row, and a per-element type test would dominate
  // the loop for 64-1024-dim vectors
  @transient private lazy val leftGet: (ArrayData, Int) => Double =
    accessor(left)
  @transient private lazy val rightGet: (ArrayData, Int) => Double =
    accessor(right)

  private def accessor(e: Expression): (ArrayData, Int) => Double =
    e.dataType match {
      case ArrayType(ByteType, _) => (d, i) => d.getByte(i).toDouble
      case ArrayType(ShortType, _) => (d, i) => d.getShort(i).toDouble
      case ArrayType(FloatType, _) => (d, i) => d.getFloat(i).toDouble
      case _ => (d, i) => d.getDouble(i)
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += leftGet(x, i) * rightGet(y, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val lGet = getter(left)
    val rGet = getter(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  val info: (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    (children: Seq[Expression]) => VecDot(children(0), children(1)))

  /** Runtime registration (no extensions config needed). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      info._1, info._2, info._3)
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` injection
  * point for cluster deployments. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(VecDot.info)
    ext.injectFunction(PqCodes.info)
    ext.injectFunction(Bloom.aggInfo)
    ext.injectFunction(Bloom.mightContainInfo)
    ext.injectFunction(KmvAgg.info)
  }
}
