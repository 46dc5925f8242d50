package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL-facing registration of the engine's custom functions, so SQL
  * users get the same surface as the Column API:
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT vec_dot(a.embedding, b.embedding) ...")
  * }}}
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    ColumnBridge.registerFunction(
      spark,
      "vec_dot",
      exprs => {
        require(exprs.length == 2, "vec_dot(arrayA, arrayB)")
        VectorDot(exprs(0), exprs(1))
      }
    )
  }
}
