package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions hook: activates the gm_ / st_ SQL surface in
  * any session via
  * `--conf spark.sql.extensions=graft.GraftExtensions` — the sanctioned
  * deployment path for the function registry (no code changes in user
  * jobs). The injection is a check rule that registers once per session:
  * SparkSessionExtensions has no direct function-registry hook with the
  * builder signature we need (our builders are Seq[Expression] =>
  * Expression with typed Casts), so the rule plants them on first
  * analysis.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectCheckRule { session =>
      graft.expr.GraftFunctions.register(session)
      _ => ()
    }
  }
}
