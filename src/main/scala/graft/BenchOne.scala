package graft

/** Dev harness: time one named query N times (cold + warm) at a given SF.
  * Usage: runMain graft.BenchOne <query> [repeats]; env SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS as in [[Bench]]. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build("graft-bench-one", cpus)
    val fn = SparkEntry.queries(name)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    println(s"""{"query":"$name","sf":"$sfDir","times":[${times.map(t => f"$t%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
