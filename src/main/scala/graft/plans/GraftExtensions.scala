package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst optimizer extension (SURVEY §4.3): rewrite CURIE-prefix
  * equality predicates into `StartsWith`.
  *
  * `Curies.curiePrefix(c)` compiles to
  * `CASE WHEN regexp_extract(c, '^([^:]*):(.*)$', 1) = '' THEN NULL
  *       ELSE regexp_extract(c, '^([^:]*):(.*)$', 1) END`,
  * so a filter `curie_prefix(c) = 'uniprotkb'` runs a regexp per row and —
  * crucially — cannot reach the parquet scan. The rewrite to
  * `StartsWith(c, 'uniprotkb:')` is semantically exact for non-empty,
  * colon-free literals (the capture group `[^:]*` can never contain or
  * equal them otherwise) including null/ no-colon rows (both sides are
  * falsy in a Filter), and Spark's parquet source pushes `StartsWith`
  * down as `StringStartsWith`, enabling row-group skipping on min/max
  * stats. */
object CuriePrefixPushdown extends Rule[LogicalPlan] {

  // Must be the exact pattern Curies.curiePrefix emits — DOTALL so the
  // extract agrees with StartsWith on values with embedded newlines
  // (without (?s), 'uniprotkb:a\nb' fails the match → prefix null/false
  // while StartsWith is true, and the rewrite would change results).
  private val CuriePattern = graft.functions.Curies.CuriePattern

  /** Matches `regexp_extract(c, CuriePattern, 1)`. */
  private object PrefixExtract {
    def unapply(e: Expression): Option[Expression] = e match {
      case RegExpExtract(subject,
          Literal(p: UTF8String, StringType), Literal(1, _))
          if p.toString == CuriePattern => Some(subject)
      case _ => None
    }
  }

  /** Matches the full null-guarded curiePrefix CASE, or the bare extract. */
  private object CuriePrefixOf {
    def unapply(e: Expression): Option[Expression] = e match {
      case CaseWhen(
          Seq((EqualTo(PrefixExtract(c), Literal(s: UTF8String, StringType)),
            Literal(null, _))),
          Some(PrefixExtract(c2)))
          if s.toString.isEmpty && c.semanticEquals(c2) => Some(c)
      case PrefixExtract(c) => Some(c)
      case _ => None
    }
  }

  private def literalPrefix(e: Expression): Option[String] = e match {
    case Literal(s: UTF8String, StringType) =>
      val v = s.toString
      if (v.nonEmpty && !v.contains(':')) Some(v) else None
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f: Filter =>
      f.transformExpressionsUp {
        case EqualTo(CuriePrefixOf(c), l) if literalPrefix(l).isDefined =>
          StartsWith(c, Literal(literalPrefix(l).get + ":"))
        case EqualTo(l, CuriePrefixOf(c)) if literalPrefix(l).isDefined =>
          StartsWith(c, Literal(literalPrefix(l).get + ":"))
        // SimplifyConditionalsInPredicate turns the null-guard CASE into
        // `CASE WHEN prefix = '' THEN false ELSE <rewritten>`; once the
        // ELSE is StartsWith(c, 'p:') with p non-empty the guard is
        // unreachable (a 'p:'-prefixed string has prefix 'p', never '') —
        // drop it so the predicate becomes a bare pushable StartsWith.
        case CaseWhen(
            Seq((EqualTo(PrefixExtract(c), Literal(s: UTF8String, StringType)),
              Literal(false, _))),
            Some(sw @ StartsWith(c2, Literal(p: UTF8String, StringType))))
            if s.toString.isEmpty && p.toString.length > 1
              && c.semanticEquals(c2) => sw
      }
  }
}

/** Session extension entry point: enable with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (GraftSession wires
  * this by default). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => CuriePrefixPushdown)
    // SQL surface for the native cosine kernel: graft_cosine(a, b)
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(
        classOf[graft.functions.CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) =>
        graft.functions.CosineSimilarity(children(0), children(1))))
  }
}
