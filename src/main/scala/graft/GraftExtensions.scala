package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{FloatVecCosine, FloatVecL2, Md5Long, ZOrderKey}

/** Session extension registering the engine's native functions, so any
  * session — including spark-sql / JDBC entry points — gets them via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (Programmatic sessions can instead call
  * `functions.VectorExpressions.register(spark)`.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[FloatVecCosine].getName, "vec_cosine"),
      exprs => FloatVecCosine(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("vec_l2"),
      new ExpressionInfo(classOf[FloatVecL2].getName, "vec_l2"),
      exprs => FloatVecL2(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("md5_long"),
      new ExpressionInfo(classOf[Md5Long].getName, "md5_long"),
      exprs => Md5Long(exprs(0))))
    e.injectFunction((
      new FunctionIdentifier("zorder_key"),
      new ExpressionInfo(classOf[ZOrderKey].getName, "zorder_key"),
      exprs => ZOrderKey(exprs(0), exprs(1))))
    // algebraic prefilter for fuzzy-match predicates; runs inside the
    // operator-optimization fixpoint so the injected guard participates
    // in normal predicate pushdown
    e.injectOptimizerRule(_ => graft.plans.LevenshteinPrefilter)
    e.injectOptimizerRule(_ => graft.plans.JaroWinklerPrefilter)
    e.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[graft.functions.JaroWinkler].getName,
        "jaro_winkler"),
      exprs => graft.functions.JaroWinkler(exprs(0), exprs(1))))
    // whole-operator extension: plans TopKPerGroupPlan into the
    // partial/final bounded-heap execs (plans/TopKPerGroup.scala)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
