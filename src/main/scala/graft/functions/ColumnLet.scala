package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `let`-binding for column expressions. */
object ColumnLet {

  /** Bind `expr` as a HOF lambda variable and evaluate `body` over it —
    * `let x = expr in body(x)` for column expressions. A lambda variable
    * is MATERIALIZED once per row; referencing a raw expression from
    * several places in a larger expression re-evaluates it per
    * reference (and per array ELEMENT inside a lambda body) — for a
    * self-referencing chain like iterated low-bit extraction the tree
    * otherwise DOUBLES per step, and a fat tree can knock the enclosing
    * stage out of efficient evaluation entirely (measured: a 2-step
    * unbound chain over a 12-term bitmap evaluated 28M times cost ~19 s;
    * bound, 0.7 s). The price is one single-element array allocation
    * per binding per row — negligible next to re-evaluation. */
  def bind(expr: Column, body: Column => Column): Column =
    element_at(transform(array(expr), body), 1)
}
