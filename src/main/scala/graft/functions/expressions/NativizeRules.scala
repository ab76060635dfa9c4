// Hosted under org.apache.spark.sql so the rule can pattern-match the
// private[sql] higher-order-function expression nodes.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite idiomatic higher-order-function shapes into the
  * equivalent native expressions (registered via GraftExtensions'
  * injectOptimizerRule). Users write the canonical Spark form —
  *
  *   size(filter(toks, t => t.isInCollection(words)))
  *   aggregate(zip_with(a, b, (x, y) => double(x) * double(y)), 0.0, _+_)
  *
  * — and the optimized plan runs [[CountInSetExpr]] / [[DotF32]], which
  * compute identical values (NativeExprsSpec) ~10-80× faster. The rewrite
  * fires only on exactly-matching shapes; anything else is left alone.
  */
object NativizeHofRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // size(filter(arr, x -> x IN (lit, lit, …)))  →  count_in_set(arr)
      // legacySizeOfNull=true makes size(null)=-1 while CountInSetExpr
      // returns NULL — rewrite only under the (default) false flag (ADVICE r1)
      case Size(ArrayFilter(arr,
            LambdaFunction(In(v: NamedLambdaVariable, list), Seq(arg), _)), false)
          if v.exprId == arg.exprId && isStringArray(arr) &&
             list.nonEmpty && list.forall(isStringLit) =>
        CountInSetExpr(arr, list.map(litString))

      // size(filter(arr, x -> x INSET set))  →  count_in_set(arr)
      case Size(ArrayFilter(arr,
            LambdaFunction(InSet(v: NamedLambdaVariable, hset), Seq(arg), _)), false)
          if v.exprId == arg.exprId && isStringArray(arr) =>
        // a null IN-list entry can never satisfy the filter — drop it
        // (mapping it would NPE during optimization)
        CountInSetExpr(arr,
          hset.toSeq.filter(_ != null)
            .map(_.asInstanceOf[UTF8String].toString).sorted)

      // regexp_extract(s, '\b(19[5-9]\d|20\d{2})\b', 1)  →  year_extract(s)
      // (the reference's S12 year pattern — byte scan with java-\b-parity
      // fallback, NativeExprsSpec)
      case RegExpExtract(subject, Literal(p: UTF8String, StringType),
            Literal(1, IntegerType))
          if p.toString == "\\b(19[5-9]\\d|20\\d{2})\\b" =>
        YearExtractExpr(subject)

      // size(regexp_extract_all(s, '[a-z0-9]+', 0))  →  run count byte scan
      // (same legacySizeOfNull guard as the count_in_set rewrite above)
      case Size(RegExpExtractAll(subject, Literal(p: UTF8String, StringType),
            Literal(0, IntegerType)), false)
          if p.toString == "[a-z0-9]+" =>
        CharClassRunCountExpr(subject)

      // The q42 redaction chain: each of the three composed regex forms
      // rewrites to a field of the one-pass redact struct. When a
      // projection computes several of them over the same text, Spark's
      // subexpression elimination unifies the (deterministic, equal)
      // RedactExpr instances into a single scan.
      //   regexp_replace(regexp_replace(s, EMAIL, '<EMAIL>'), NUM, '<NUM>')
      case RegExpReplace(RegExpReplace(s,
            StrLit(EmailRe), StrLit("<EMAIL>"), Literal(1, IntegerType)),
            StrLit(NumRe), StrLit("<NUM>"), Literal(1, IntegerType)) =>
        GetStructField(RedactExpr(s), 0, Some("redacted"))
      //   regexp_count(s, EMAIL) / regexp_count(s, NUM) — regexp_count is
      //   RuntimeReplaceable, so by optimization time it is already
      //   size(regexp_extract_all(s, re, 0)); match that form (same
      //   legacySizeOfNull guard as the other Size rewrites). Targets the
      //   COUNT-ONLY kernel: a count query must not pay for building the
      //   redacted string (r3 review finding).
      case Size(RegExpExtractAll(s, StrLit(EmailRe), Literal(0, IntegerType)), false) =>
        PiiCountExpr(s, 0)
      case Size(RegExpExtractAll(s, StrLit(NumRe), Literal(0, IntegerType)), false) =>
        PiiCountExpr(s, 1)

      // aggregate(zip_with(a, b, (x,y) -> dbl(x)*dbl(y)), 0.0, (acc,v) -> acc+v)
      //   →  dot_f32(a, b)
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(mul: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            DoubleLit(0.0),
            LambdaFunction(add: Add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(finArg), _))
          if isFloatArray(a) && isFloatArray(b) &&
             isDoubleProductOf(mul, x, y) &&
             isSumOf(add, acc, v) &&
             fin.exprId == finArg.exprId =>
        DotF32(a, b)
    }

  private object DoubleLit {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(d: Double, DoubleType) => Some(d)
      case _ => None
    }
  }

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
  private val NumRe = "[0-9]{6,}"
  private object StrLit {
    def unapply(e: Expression): Option[String] = e match {
      case Literal(s: UTF8String, StringType) => Some(s.toString)
      case _ => None
    }
  }

  private def isStringLit(e: Expression): Boolean = e match {
    case Literal(_: UTF8String, StringType) => true
    case _ => false
  }
  private def litString(e: Expression): String =
    e.asInstanceOf[Literal].value.asInstanceOf[UTF8String].toString

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case Cast(n: NamedLambdaVariable, DoubleType, _, _) => n.exprId == v.exprId
    case _ => false
  }

  /** The variable widened to double by an EXPLICIT cast. A bare float
    * variable must NOT match here: a float*float Multiply rounds each
    * product to float precision, while DotF32 computes double(x)*double(y)
    * — rewriting the bare form would silently change the optimized plan's
    * values (ADVICE r1). The bare arm stays in [[sameVar]] for the Add/acc
    * check, where both operands are already double.
    */
  private def castedVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case Cast(n: NamedLambdaVariable, DoubleType, _, _) => n.exprId == v.exprId
    case _ => false
  }

  /** mul == cast(x as double) * cast(y as double), in either order. */
  private def isDoubleProductOf(mul: Multiply, x: NamedLambdaVariable,
                                y: NamedLambdaVariable): Boolean =
    (castedVar(mul.left, x) && castedVar(mul.right, y)) ||
    (castedVar(mul.left, y) && castedVar(mul.right, x))

  private def isSumOf(add: Add, acc: NamedLambdaVariable,
                      v: NamedLambdaVariable): Boolean =
    (sameVar(add.left, acc) && sameVar(add.right, v)) ||
    (sameVar(add.left, v) && sameVar(add.right, acc))
}
