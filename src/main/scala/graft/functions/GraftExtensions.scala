package graft.functions

import org.apache.spark.sql.{GraftShims, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The library's SQL function surface: graft's native Catalyst expressions
  * exposed by name to `spark.sql(...)` users.
  *
  * Two installation paths, same function list:
  *  - at session build time: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the standard extension-library mechanism, [[GraftExtensions]]);
  *  - on a live session: [[GraftFunctions.register]].
  */
object GraftFunctions {

  private def one(name: String)(f: Expression => Expression)
  : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name),
      args => {
        require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
        f(args.head)
      })

  private def two(name: String)(f: (Expression, Expression) => Expression)
  : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name),
      args => {
        require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
        f(args(0), args(1))
      })

  /** (name, info, builder) triples in `injectFunction` shape. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    one("fnv1a64")(Fnv1a64),
    one("fnv1a_ihash")(Fnv1aIHash),
    one("md5_prefix60")(Md5Prefix60),
    one("poly31_hash")(Poly31Hash),
    two("vec_dot")(DotProduct),
  )

  /** Register every graft SQL function on a live session. */
  def register(spark: SparkSession): Unit = {
    val reg = GraftShims.functionRegistry(spark)
    all.foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
  }
}

/** `spark.sql.extensions` entry point: injects the [[GraftFunctions]] SQL
  * surface plus the library's optimizer rules into every session built
  * with this class configured.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.QuantizationPushdown)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
