package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/**
 * Session-extensions entry point:
 * `--conf spark.sql.extensions=graft.plans.GraftExtensions` installs the
 * graft optimizer rules at session build time. (`Graft.register` installs
 * the same rules on an already-built session via
 * `spark.experimental.extraOptimizations`.)
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => MultiQuantileFusion)
  }
}
