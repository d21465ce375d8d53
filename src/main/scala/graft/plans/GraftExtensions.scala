package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (`SparkSessionExtensions`): registers the native
  * expressions the built-in function library can't express efficiently.
  * Installed by [[graft.Engine]] on every session (and usable standalone via
  * `spark.sql.extensions=graft.plans.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("hamming_distance"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming_distance"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"hamming_distance expects 2 arguments, got ${children.length}")
        HammingDistance(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"simhash64 expects 1 argument, got ${children.length}")
        SimHash64(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("md5x4"),
      new ExpressionInfo(classOf[Md5x4].getName, "md5x4"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"md5x4 expects 1 argument, got ${children.length}")
        Md5x4(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("hex32"),
      new ExpressionInfo(classOf[Hex32].getName, "hex32"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"hex32 expects 2 arguments, got ${children.length}")
        Hex32(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("canonical_json"),
      new ExpressionInfo(classOf[CanonicalJson].getName, "canonical_json"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"canonical_json expects 1 argument, got ${children.length}")
        CanonicalJson(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("canonical_json_str"),
      new ExpressionInfo(classOf[CanonicalJsonString].getName,
        "canonical_json_str"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"canonical_json_str expects 1 argument, got ${children.length}")
        CanonicalJsonString(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"vec_dot expects 2 arguments, got ${children.length}")
        VecDot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("grid_dot"),
      new ExpressionInfo(classOf[GridDot].getName, "grid_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"grid_dot expects 2 arguments, got ${children.length}")
        GridDot(children.head, children(1))
      }))
  }
}
