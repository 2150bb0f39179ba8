package graft

import org.apache.spark.sql.SparkSessionExtensions

/** `spark.sql.extensions` entry point: native function kernels plus the
  * engine's custom optimizer rules. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.VectorFunctions.descriptors.foreach(ext.injectFunction)
    graft.functions.SketchFunctions.descriptors.foreach(ext.injectFunction)
    graft.functions.ZorderFunctions.descriptors.foreach(ext.injectFunction)
    graft.multimodal.MediaFunctions.descriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.CollapseRedundantRound)
  }
}
