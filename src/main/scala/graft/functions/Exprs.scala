package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression utilities shared by the operator library. */
object Exprs {

  /** Let-bind an expression as a lambda variable so bodies that reference
    * it many times evaluate it ONCE: higher-order functions have no
    * cross-lambda subexpression elimination, so e.g. a `split(...)` or
    * `transform(...)` referenced inside a per-element lambda would be
    * recomputed once per reference otherwise (measured 3× slowdown in the
    * shingling path). Implemented as `transform` over a one-element array:
    * the array element is evaluated once, the body sees the variable. */
  def bound(e: Column)(body: Column => Column): Column =
    element_at(transform(array(e), body), 1)
}
