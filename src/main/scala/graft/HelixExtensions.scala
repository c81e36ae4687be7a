package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.DotProductD

/**
 * SparkSessionExtensions entry point: registers graft's native functions
 * for SQL users. Enable with
 * `spark.sql.extensions=graft.HelixExtensions`.
 */
class HelixExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductD].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"graft_dot expects exactly 2 arguments, got ${children.length}")
        DotProductD(children(0), children(1))
      }))
  }
}
