package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The engine's `SparkSessionExtensions` hook — activate with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)` on the builder). Injects
  * the engine's optimizer rules; sessions that can't be rebuilt install
  * the same rules at runtime via
  * [[graft.functions.DotProductRewrite.install]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.functions.DotProductRewrite)
    ext.injectOptimizerRule(_ => graft.functions.Md5ChainRewrite)
    ext.injectOptimizerRule(_ => graft.functions.PqFoldRewrite)
  }
}
