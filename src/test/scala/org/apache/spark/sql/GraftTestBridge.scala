package org.apache.spark.sql

import org.apache.spark.SparkContext

/**
 * Test-only bridge: build a fresh session over an EXISTING SparkContext
 * with a SparkSessionExtensions applied — exactly what
 * `spark.sql.extensions` does at cold start. Needed because that is a
 * static conf: it cannot be changed on the suite's live context, so an
 * in-suite e2e of the extensions path must construct the session
 * directly.
 */
object GraftTestBridge {
  def sessionWithExtensions(
      sc: SparkContext,
      f: SparkSessionExtensions => Unit): SparkSession = {
    val ext = new SparkSessionExtensions
    f(ext)
    // the 6-arg primary constructor is Scala-private; bytecode-public
    val ctor = classOf[classic.SparkSession].getDeclaredConstructors
      .find(_.getParameterCount == 6)
      .getOrElse(sys.error("classic.SparkSession 6-arg constructor not found"))
    ctor.setAccessible(true)
    ctor.newInstance(sc, None, None, ext,
        Map.empty[String, String], Map.empty[String, String])
      .asInstanceOf[SparkSession]
  }
}
