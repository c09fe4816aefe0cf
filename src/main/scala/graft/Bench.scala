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
    def r3(x: Double): String = f"$x%.3f"
    def jmap(rs: Seq[(String, Double, Double)], f: ((String, Double, Double)) => Double): String =
      rs.map { r => "\"" + r._1 + "\":" + r3(f(r)) }.mkString("{", ",", "}")
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
    val detail = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${jmap(results, _._2)},"queries_warm":${jmap(results, _._3)},"total_warm":${r3(totalWarm)},"total_warm_batch":${r3(totalWarmBatch)},"total_warm_streaming":${r3(totalWarmStreaming)},"failed":$fj,"warm_failed":${jlist(warmFailed)},"sf":"$sfDir"}"""
    // The driver keeps only the LAST ~2000 chars of sbt output, so the
    // final printed line must fit entirely inside that window or its JSON
    // is unparseable (rounds 4-6 all hit this). Full per-query detail goes
    // to a file (committed with the round snapshot) and an early log line;
    // the last line is a compact summary: totals + failures + slowest-25.
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_detail.json"),
      detail.getBytes("UTF-8"))
    println("[bench-detail] " + detail)
    val slowest = results.sortBy(-_._3).take(25)
    val summary = s"""{"metric":"total_warm","value":${r3(totalWarm)},"unit":"sec","queries":${jmap(slowest, _._3)},"n_queries":${results.size},"total_cold":${r3(total)},"total_warm_batch":${r3(totalWarmBatch)},"total_warm_streaming":${r3(totalWarmStreaming)},"failed":$fj,"warm_failed":${jlist(warmFailed)},"detail":"bench_detail.json","sf":"$sfDir"}"""
    // Driver contract: the summary must be findable. Belt and braces —
    // a bare final stdout line (build.sbt's StdoutOutput strategy keeps
    // it free of sbt's "[info] " decoration, which hid it from the
    // driver's parser in rounds 10-13) AND a summary file.
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_summary.json"),
      summary.getBytes("UTF-8"))
    println(summary)
    spark.stop()
  }
}
