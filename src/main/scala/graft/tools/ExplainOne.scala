package graft.tools
import org.apache.spark.sql.SparkSession
/** Prints the executed physical plan of one SparkEntry query. The action
  * runs the query's OWN QueryExecution (foreach on its RDD, no driver
  * materialisation), so the printed AdaptiveSparkPlan is the AQE FINAL
  * plan — a fresh `.count()` would plan (and show) a different,
  * un-executed tree. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val t0 = System.nanoTime()
    df.foreach(_ => ())
    println(s"EXECUTED in ${(System.nanoTime() - t0) / 1e9}s")
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
