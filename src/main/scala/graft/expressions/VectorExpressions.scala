package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the float-embedding dot product —
  * the engine's documented extension seam one level below UDFs
  * (SURVEY.md §4.2: custom Expression with codegen, only where perf
  * demands). Semantically identical to graft.ops.Similarity.dot
  * (zip_with + aggregate accumulated in Double) but fused: one tight
  * primitive loop over both ArrayData, no intermediate zipped array,
  * no per-element lambda dispatch — and `doGenCode` keeps it inside
  * WholeStageCodegen.
  *
  * Null semantics — exactly the HOF form's, so the rewrite is
  * semantics-preserving on EVERY input, not just clean embeddings:
  * null input array ⇒ null (nullIntolerant); length mismatch ⇒ null
  * (zip_with null-pads the shorter side and `acc + null` poisons the
  * fold); any null element in either array ⇒ null (null * y ⇒ null
  * element, same poisoning). Equal-length null-free arrays ⇒ the sum
  * of products accumulated in Double, in index order (same fold order
  * as aggregate's left fold, so float rounding is bit-identical).
  */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression {

  // checkInputDataTypes instead of ExpectsInputTypes: AbstractDataType
  // is private[sql], unnameable from a third-party package.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // Nullable even for non-nullable inputs: length mismatch / null
  // elements produce null (and ev.isNull must be assignable in codegen).
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF32 =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  val dotInfo = new ExpressionInfo(classOf[DotProductF32].getName, "graft_dot")

  val dotBuilder: Seq[Expression] => Expression = {
    case Seq(l, r) => DotProductF32(l, r)
    case other => throw new IllegalArgumentException(
      s"graft_dot expects 2 arguments, got ${other.length}")
  }

  /** Runtime registration on a live session (the config-time path is
    * GraftExtensions via spark.sql.extensions). After this,
    * `call_function("graft_dot", a, b)` / SQL `graft_dot(a, b)` work. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_dot"), dotInfo, dotBuilder)
}
