package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point — the deployment face of the
  * extension surface (SURVEY §2.k). A cluster user adds
  *
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * to spark-submit and every session gets the engine's custom codegen
  * expressions in its function registry — the same wiring
  * `bridge.registerFunctions` performs programmatically, but applied by
  * Spark itself at session build time (so SQL-only clients, thrift
  * servers, and notebooks see the functions without touching Scala).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: String, name: String) =
    new ExpressionInfo(clazz, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("poly_hash"),
      info("graft.functions.PolyHash", "poly_hash"),
      (exprs: Seq[Expression]) =>
        graft.functions.PolyHash(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("graft.functions.SimHash64", "simhash64"),
      (exprs: Seq[Expression]) =>
        graft.functions.SimHash64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("graft.functions.MinHashSig", "minhash_sig"),
      (exprs: Seq[Expression]) =>
        graft.functions.MinHashSig(exprs.head).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("winnow_fps"),
      info("graft.functions.WinnowFps", "winnow_fps"),
      (exprs: Seq[Expression]) =>
        graft.functions.WinnowFps(exprs.head)))
  }
}
