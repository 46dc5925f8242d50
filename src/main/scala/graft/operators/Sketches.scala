package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.{hash60, tokens}

/** Count-min sketch over the corpus token stream — approximate heavy-
  * hitter counting in fixed memory (Cormode & Muthukrishnan, "An
  * improved data stream summary: the count-min sketch and its
  * applications", J. Algorithms 55(1), 2005).
  *
  * Scale design: the sketch is d·w counter cells regardless of corpus
  * size — the groupBy shuffles at most d·w partially-aggregated rows
  * per partition, while an exact term count must shuffle the full
  * vocabulary. At 100 TB the sketch pass is the only affordable way
  * to screen for heavy hitters before an exact pass over the few
  * candidates. Point estimates are biased up (collisions only add),
  * so `cms_n >= exact_n` always, with error ≤ 2N/w at probability
  * 1−(1/2)^d.
  *
  * Determinism: the d row-hashes are the portable md5-prefix
  * [[hash60]] seeded by row index (`"r:token"`), and cell updates are
  * commutative sums — the sketch is bit-identical on any partitioning
  * and exactly SQL-replayable (unlike Spark's built-in
  * `count_min_sketch`, whose murmur hashing DuckDB cannot mirror).
  */
object Sketches {

  /** Build the (row, bucket, cell_n) sketch cells for a (term, n)
    * frequency frame. Cells with zero hits are absent (they never
    * affect a min over present terms' cells... every queried term has
    * d present cells by construction).
    */
  def cmsCells(termCounts: DataFrame, depth: Int, width: Int): DataFrame =
    termCounts
      .select(
        col("w"),
        col("n"),
        explode(
          array((0 until depth).map { i =>
            struct(
              lit(i).as("r"),
              pmod(hash60(concat_ws(":", lit(i), col("w"))), lit(width)).as("b")
            )
          }: _*)
        ).as("rb")
      )
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(sum(col("n")).as("cell_n"))

  /** q92: exact top-k corpus terms with their count-min estimates
    * side by side — the accuracy audit a pipeline runs before
    * trusting the sketch at scale. Output: (term, exact_n, cms_n),
    * cms_n >= exact_n.
    */
  def cmsTopTerms(
      spark: SparkSession,
      dir: String,
      depth: Int = 4,
      width: Int = 64,
      k: Int = 20
  ): DataFrame = {
    val exact = Tables
      .documents(spark, dir)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
    val cells = cmsCells(exact, depth, width)
    val top = exact.orderBy(col("n").desc, col("w").asc).limit(k)
    top
      .select(
        col("w"),
        col("n"),
        explode(
          array((0 until depth).map { i =>
            struct(
              lit(i).as("r"),
              pmod(hash60(concat_ws(":", lit(i), col("w"))), lit(width)).as("b")
            )
          }: _*)
        ).as("rb")
      )
      .join(
        broadcast(cells),
        col("rb.r") === cells("r") && col("rb.b") === cells("b")
      )
      .groupBy(col("w"))
      .agg(any_value(col("n")).as("exact_n"), min(col("cell_n")).as("cms_n"))
      .select(col("w").as("term"), col("exact_n"), col("cms_n"))
  }
}
