package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for hot keys.
  *
  * AQE's skew-join split (enabled in GraftSession) handles most skew at
  * runtime; this utility is the explicit form for planned-hot keys — e.g.
  * one entity producing a large share of the audit feed, or a dedup block
  * key with a pathological block. The probe side gets a deterministic
  * per-row salt (hash of the whole row — reproducible, no RNG state), the
  * build side is replicated once per salt value, and the join key becomes
  * (key, salt): the hot key's rows spread across `factor` partitions
  * instead of one straggler.
  */
object Skew {

  def saltedJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, factor: Int): DataFrame = {
    require(factor > 0)
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(struct(probe.columns.map(col).toIndexedSeq: _*)), lit(factor))
        .cast("int"))
    val replicated = build.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted
      .join(replicated,
        col(probeKey) === col(buildKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
