package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print the formatted physical plan and timing for
  * one registered query (dev tool; not part of the driver contract).
  * Usage: runMain graft.Explain <queryName> [sfDir] [repeat]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val repeat = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.widenReads",
        sys.env.getOrElse("SPARK_GRAFT_WIDEN", "true"))
      .config("spark.graft.cacheTables", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    (1 to repeat).foreach { i =>
      val t0 = System.nanoTime()
      // rebuild the DataFrame each run (like Bench): a reused df would
      // skip whole stages via shuffle-output reuse and time ~nothing
      val n = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.toRdd.count()
      println(f"[explain] run $i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
