package graft.plans

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point: build the session with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` and
  * every graft native function is available in SQL and via
  * `call_function` — the idiomatic way to ship engine extensions to a
  * cluster without touching application code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction(GraftFunctions.dotProductDescriptor)
    extensions.injectFunction(GraftFunctions.bloomContainsDescriptor)
    extensions.injectFunction(graft.functions.TopKAgg.descriptor)
    extensions.injectFunction(graft.functions.SimhashAgg.descriptor)
  }
}
