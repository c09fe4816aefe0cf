package graft

import graft.audit.AuditQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reconciles the stateful streaming sessionizer with the batch
  * `audit_sessionize` operator: over a finite replay, the stream emits
  * exactly the batch sessions minus each entity's final (still-open)
  * session. */
class StreamingSessionSpec extends AnyFunSuite {
  import TestSession._

  test("streaming sessions reconcile with the batch operator") {
    val streamed = SparkEntry.queries("audit_sessionize_stream")(spark, sfDir)
      .select(col("entity_id"), col("session_start"), col("n_events"),
        round(col("session_value"), 2).as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val batch = AuditQueries.auditSessionize.fn(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("entity_id").orderBy(col("session_id").desc)
    def asTuples(df: org.apache.spark.sql.DataFrame) = df
      .select(col("entity_id"), col("session_start"), col("n_events").cast("long"),
        round(col("session_value"), 2).as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val allBatch = asTuples(batch)
    val nonFinal = asTuples(batch.withColumn("rn", row_number().over(w)).filter(col("rn") > 1))
    val nEntities = batch.select("entity_id").distinct().count()

    // every streamed session is a real batch session, field-for-field
    assert(streamed.subsetOf(allBatch))
    // every non-final session closed in-stream (finals close only if their
    // event-time timeout fired before the watermark stopped advancing)
    assert(nonFinal.subsetOf(streamed))
    assert(streamed.size >= nonFinal.size &&
      streamed.size <= nonFinal.size + nEntities)
  }
}
