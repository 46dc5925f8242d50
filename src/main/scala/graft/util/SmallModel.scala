package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import scala.jdk.CollectionConverters._

/** Re-enter a BOUNDED trained-model frame (k-means centroids, PQ
  * codebooks — k rows by construction, never corpus-sized) as a
  * literal LocalRelation.
  *
  * Why: these models are trained by short driver loops whose rounds
  * are lineage-truncated with `localCheckpoint`, so every consumer
  * plan embedded a fresh LogicalRDD — non-deterministic, never
  * cache-reusable, and each re-plan re-broadcast the checkpoint scan.
  * Collecting the k rows (the same bounded-driver contract as the BPE
  * merge table and the greedy-cover argmax) and rebuilding a literal
  * frame makes every downstream plan deterministic: operator caches
  * built over the model are reusable, and model joins broadcast a
  * literal. At 100 TB this is exactly the "persist the model
  * artifact, read it back" seam collapsed to its in-session form.
  *
  * The sort keys must uniquely order the frame — LocalRelation
  * equality (and thus cache reuse) is by row sequence.
  */
object SmallModel {

  def toLocal(df: DataFrame, sortCols: String*): DataFrame = {
    val rows = df.orderBy(sortCols.map(col): _*).collect().toSeq
    df.sparkSession.createDataFrame(rows.asJava, df.schema)
  }
}
