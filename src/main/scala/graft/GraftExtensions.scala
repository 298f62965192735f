package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSim, Vec}

/**
 * SparkSessionExtensions entry point — the spark-submit integration path:
 *
 * {{{
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 * }}}
 *
 * (or `.withExtensions(new GraftExtensions)` on a builder). Injects the
 * native codegen expressions into every session built with the extension,
 * so SQL users get `graft_cosine(a, b)` without touching the programmatic
 * `Vec.register` path the query library uses internally. Keeping both
 * faces is deliberate: the library registers lazily per session (works in
 * any session, e.g. a notebook the user already has), the extension wires
 * the functions at session build (works for pure-SQL deployments).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(Vec.CosineName),
      new ExpressionInfo(classOf[CosineSim].getName, Vec.CosineName),
      Vec.cosineBuilder))
  }
}
