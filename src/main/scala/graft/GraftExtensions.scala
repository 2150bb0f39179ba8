package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session extension entry point: registers the engine's native Catalyst
  * functions. Usable from any Spark deployment via
  * `spark.sql.extensions=graft.GraftExtensions` — the standard way to ship
  * custom expressions to a 1000-executor cluster without touching user code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.VectorFunctions.descriptors.foreach(ext.injectFunction)
}
