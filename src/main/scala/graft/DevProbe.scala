package graft

import org.apache.spark.sql.SparkSession

/** Scratch main: time one query twice (cold vs warm) to separate plan/
  * codegen warmup from steady-state cost. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    if (sys.env.contains("SPARK_GRAFT_PLAN")) {
      val df = SparkEntry.queries(name)(spark, dir)
      // executes df's OWN QueryExecution (count() would build a separate
      // aggregated one, leaving this AQE plan unfinalized) while keeping
      // rows executor-side
      df.foreach(_ => ())
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => Seq("Exchange", "Join", "Window", "HashAggregate", "Scan", "Sort ", "Generate")
          .exists(l.contains)).mkString("\n"))
    }
    spark.stop()
  }
}
