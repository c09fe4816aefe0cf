package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.build("graft-bench", cpus)
    // uncounted warmup: JIT + IO cache, so the alphabetically-first timed
    // query doesn't absorb cold-start cost
    try SparkEntry.queries("q1_pricing")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }
    var failed = List.empty[String]
    // noop sink: forces full materialization of every column (count()
    // would let scan-only plans skip column decode entirely)
    def run(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      spark.catalog.clearCache() // operator-internal caches must not leak
      if (ok) Some((System.nanoTime() - t0) / 1e9) else None
    }
    // cold + warm per query: the second run amortizes JIT/codegen compile
    // and OS page cache, isolating the plan's true cost — regressions are
    // attributable (plan change moves warm; environment noise moves cold).
    // warm = best-of-both: this host stalls for multi-second stretches at
    // random (observed 55s on a query that runs in 0.8s isolated), and
    // min() keeps a stall on either run from masquerading as plan cost.
    var warmFailed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      run(name, fn) match {
        case None => failed ::= name; None
        case Some(cold) =>
          // a warm-run crash is a real failure (flaky plan / non-idempotent
          // sink), not a clean cold-time result — record it, don't mask it
          val warm = run(name, fn) match {
            case Some(w) => math.min(cold, w)
            case None => warmFailed ::= name; cold
          }
          Some((name, cold, warm))
      }
    }
    def jmap(f: ((String, Double, Double)) => Double): String =
      results.map { r => s"\"" + r._1 + "\":" + f(r) }.mkString("{", ",", "}")
    def jlist(xs: List[String]): String =
      xs.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fj = jlist(failed)
    val total = results.map(_._2).sum
    val totalWarm = results.map(_._3).sum
    // Structured Streaming ops pay a fixed per-micro-batch machinery cost
    // (~16 s across the four at sf0.1) that is independent of data volume;
    // split them out so batch-plan regressions aren't masked by it.
    val streamingNames = SparkEntry.queries.keySet.filter(_.contains("stream"))
    val totalWarmStreaming = results.filter(r => streamingNames(r._1)).map(_._3).sum
    val totalWarmBatch = totalWarm - totalWarmStreaming
    // failed queries are EXCLUDED from the timings and listed explicitly —
    // a broken query must not make the total look faster
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(_._2)},"queries_warm":${jmap(_._3)},"total_warm":$totalWarm,"total_warm_batch":$totalWarmBatch,"total_warm_streaming":$totalWarmStreaming,"failed":$fj,"warm_failed":${jlist(warmFailed)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
