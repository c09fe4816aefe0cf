package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: `fact.value ∈ [band.lo, band.hi)` as an equi-join.
  *
  * A naive range join plans as a nested-loop (broadcast-NLJ when one side
  * is small, quadratic otherwise). Bucketizing makes it shuffle-friendly:
  * each band is exploded to the fixed-width buckets it covers, the fact
  * row computes its bucket, and the join is an equi-join on bucket id with
  * the exact range predicate kept as a residual. Bucket count per band is
  * ceil(width/bucketWidth), so the expansion is bounded and the join
  * partitions on bucket — the 100 TB shape for interval classification
  * (value bands, time buckets, IP ranges, …).
  */
object Bands {

  def rangeJoin(
      fact: DataFrame, bands: DataFrame,
      valueCol: String, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0)
    val bucketed = fact.withColumn("__bucket",
      floor(col(valueCol) / bucketWidth).cast("long"))
    val expanded = bands.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor((col(hiCol) - lit(1e-9)) / bucketWidth).cast("long"))))
    bucketed
      .join(expanded, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }
}
