package graft.bench

import org.apache.spark.sql.SparkSession

/**
 * Per-query bench isolation (guide §1.4): times a SUBSET of
 * SparkEntry.queries with the SAME session config and the SAME action as
 * the frozen graft.Bench (queryExecution.toRdd.count() — every output
 * column of every row evaluated), but one query at a time with
 * configurable repetitions, so a change to one operator can be measured
 * without the cross-query noise of the full sweep. Jobs are labeled
 * (guide §1.5) so a UI/eventlog profile attributes stages per query.
 *
 * Usage: runMain graft.bench.BenchExtra [reps] [query ...]
 *   (no query args = all queries; env contract identical to Bench).
 */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(3)
    val names = (if (args.nonEmpty && scala.util.Try(args(0).toInt).isSuccess) args.drop(1)
      else args).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Logs.quietBenignAccumulatorNoise()
    val qs = if (names.nonEmpty) names else graft.SparkEntry.queries.keys.toSeq.sorted
    qs.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { i =>
        spark.sparkContext.setJobDescription(s"$name rep$i")
        val t0 = System.nanoTime()
        val n = try fn(spark, sfDir).queryExecution.toRdd.count()
          catch { case e: Throwable => System.err.println(s"$name FAILED: $e"); -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"EXTRA|$name|rep$i|$dt%.3f|rows=$n")
        dt
      }
      println(f"EXTRA|$name|min|${times.min}%.3f|median=${times.sorted.apply(times.size / 2)}%.3f")
    }
    spark.stop()
  }
}
