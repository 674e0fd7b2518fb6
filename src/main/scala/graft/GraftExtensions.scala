package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}

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
  *
  * It also injects an analysis CHECK rule that enforces the engine's
  * no-unpartitioned-window discipline (the classic 100×-scale killer —
  * every global ranking here runs on the two-pass GlobalOrder primitive
  * instead) as a session-level policy: with
  * `spark.graft.strictWindows=true`, a `Window.orderBy` without a
  * `partitionBy` is rejected at analysis time, before a single task
  * funnels the dataset into one partition. Off by default — a lint a
  * pipeline team turns on cluster-wide.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: String, name: String) =
    new ExpressionInfo(clazz, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectCheckRule { session => (plan: LogicalPlan) =>
      if (session.conf.get("spark.graft.strictWindows", "false") == "true") {
        def check(p: LogicalPlan): Unit = p.foreach {
          case w: Window if w.partitionSpec.isEmpty =>
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "USER_RAISED_EXCEPTION",
              messageParameters = Map("errorMessage" ->
                ("graft strict mode: unpartitioned window (empty PARTITION BY) " +
                 "moves every row to one task and cannot scale; partition the " +
                 "window or use the distributed GlobalOrder two-pass primitive " +
                 "(set spark.graft.strictWindows=false to allow)")))
          case node =>
            // subquery expressions carry their own plans (a global window
            // inside `WHERE x > (SELECT ...)` must not slip past the lint)
            node.expressions.foreach(_.foreach {
              case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
                check(s.plan)
              case _ => ()
            })
        }
        check(plan)
      }
    }
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
