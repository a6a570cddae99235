package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused polynomial rolling hash over a string's code points:
  * acc ← (acc·31 + codepoint) mod 1e9+7, left to right.
  *
  * Semantically identical to the declarative form
  * `aggregate(split(text, ""), 0L, (acc, c) → pmod(acc·31 + ascii(c),
  * 1e9+7))` — split("") yields one element per code point (Java's
  * zero-width regex split does not break surrogate pairs) and ascii()
  * is the first code point — but fused: the HOF form materializes one
  * single-char UTF8String PER CHARACTER of every document (a 2 KB doc
  * → ~2000 short-lived objects) and runs an interpreted lambda per
  * element; this is one loop over the raw UTF-8 bytes, no per-char
  * allocation, inside WholeStageCodegen via a reference-object call
  * (same pattern as MinHashSig/SimHash64).
  *
  * Modulo at every step keeps the accumulator < 2³⁵, so the arithmetic
  * is portable (DuckDB list_reduce oracle, q58) — never Long wrap.
  * Empty string ⇒ 0 (the HOF form hashes split("…") = [""] with
  * ascii("") = 0, which also yields 0). Null ⇒ null. */
case class RollingHashMod(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hash expects string, got $t")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_rolling_hash"

  def compute(s: UTF8String): Long = {
    // Decode UTF-8 in place — input is Spark-produced, hence valid.
    val bytes = s.getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xff
      var cp = 0
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if (b0 < 0xe0) { // 2-byte
        cp = ((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f); i += 2
      } else if (b0 < 0xf0) { // 3-byte
        cp = ((b0 & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) |
          (bytes(i + 2) & 0x3f); i += 3
      } else { // 4-byte
        cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
          ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f); i += 4
      }
      acc = (acc * 31L + cp) % 1000000007L
    }
    acc
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val inst = ctx.addReferenceObj("roller", this, classOf[RollingHashMod].getName)
    defineCodeGen(ctx, ev, v => s"$inst.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashMod =
    copy(child = newChild)
}

/** Optimizer rule (second instance of the Rule seam, alongside
  * RewriteDotProduct): rewrites the declarative rolling-hash fold that
  * TextAnalysis.rollingHashHof emits —
  *
  *   aggregate(split(text, ""), 0L,
  *             (acc, c) -> pmod(acc * 31 + bigint(ascii(c)), 1000000007))
  *
  * — into the fused RollingHashMod. Unlike the dot-product rewrite
  * (where zip_with's null-padding made equivalence subtle), this one
  * is total: both forms are null ⇔ input null and agree on every
  * string, including "" (spec-pinned). The match is still
  * deliberately conservative — split on the empty pattern, zero 0L,
  * exactly acc·31 + cast(ascii(elem)) under pmod by exactly 1e9+7,
  * identity finish — so any other fold is left untouched. */
object RewriteRollingHash
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            StringSplit(str, Literal(sep, StringType), Literal(-1, IntegerType)),
            Literal(0L, LongType),
            LambdaFunction(
              Pmod(
                Add(
                  Multiply(acc: NamedLambdaVariable, Literal(31L, LongType), _),
                  Cast(Ascii(elem: NamedLambdaVariable), LongType, _, _), _),
                Literal(1000000007L, LongType), _),
              mergeVars, _),
            LambdaFunction(finishBody, finishVars, _))
          if sep != null && sep.toString.isEmpty &&
            mergeVars.map(_.exprId) == Seq(acc.exprId, elem.exprId) &&
            (finishBody match {
              case v: NamedLambdaVariable =>
                finishVars.map(_.exprId).contains(v.exprId)
              case _ => false
            }) =>
        RollingHashMod(str)
    }
}

object TextExpressions {
  val rollingHashInfo =
    new ExpressionInfo(classOf[RollingHashMod].getName, "graft_rolling_hash")

  val rollingHashBuilder: Seq[Expression] => Expression = {
    case Seq(s) => RollingHashMod(s)
    case other => throw new IllegalArgumentException(
      s"graft_rolling_hash expects 1 argument, got ${other.length}")
  }

  /** Runtime registration (config-time path: GraftExtensions). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_rolling_hash"), rollingHashInfo, rollingHashBuilder)
}
