package graft

import org.apache.spark.sql.SparkSession

/** Central session construction: one place for the engine's scale tunables.
  *
  * local[N] here; on a cluster the same settings apply per-executor. AQE
  * handles runtime re-planning (partition coalescing, skew-join splitting),
  * which is the scale path for the audit feed's hot entities and for
  * dedup blocks of uneven size.
  */
object GraftSession {
  def build(appName: String, cpus: String): SparkSession = {
    // shuffle partitions default to the core count (local mode: one
    // healthy partition per core; AQE coalesces below that). The env
    // override exists for scale-leg experiments — e.g. probing whether a
    // 10x-data one-box run is partition-count-bound — without forking
    // the session recipe.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
