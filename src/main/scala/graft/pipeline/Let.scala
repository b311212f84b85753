package graft.pipeline

import org.apache.spark.sql.{Column, functions => F}

/**
 * Let-binding for Column expression trees.
 *
 * Higher-order functions (transform/filter/aggregate/zip_with)
 * evaluate interpreted — outside whole-stage codegen and its common
 * subexpression elimination — so a subtree referenced n times in one
 * expression is computed n times per row. `bind` evaluates it ONCE
 * and hands the value to the body as a lambda variable: the
 * single-element `transform` gives the subtree a name, and
 * `element_at(..., 1)` unwraps it (always exactly one element, so
 * ANSI element_at cannot throw).
 *
 * Measured: Sft.maskStats 2.3s → 0.85s and GopherRules.qualityStats
 * carried ~10 redundant token-splits per row before binding.
 */
object Let {
  def bind(c: Column)(f: Column => Column): Column =
    F.element_at(F.transform(F.array(c), f), 1)
}
