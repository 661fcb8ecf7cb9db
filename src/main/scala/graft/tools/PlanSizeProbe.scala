package graft.tools
import graft.fixtures.MicroCorpus
import graft.kb.KbIngest
import graft.pipeline.T2KPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Prints per-checkpoint-stage logical-plan node counts + expression node
  * counts + definition wall for the micro pipeline — identifies which
  * stage's Catalyst work dominates the q_t2k_triples planning floor. */
object PlanSizeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val jobMs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val serMs = new java.util.concurrent.atomic.AtomicLong
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStarts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        jobs.incrementAndGet()
        Option(jobStarts.get(j.jobId)).foreach(t0 =>
          jobMs.addAndGet((System.nanoTime() - t0) / 1000000))
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          serMs.addAndGet(t.taskMetrics.executorDeserializeTime)
        }
      }
    })
    val counting = new graft.checkpoint.Checkpointer {
      def apply(name: String, df: => DataFrame): DataFrame = {
        val t0 = System.nanoTime()
        val d = df
        val tBuild = (System.nanoTime() - t0) / 1e9
        val plan = d.queryExecution.analyzed
        var nodes = 0
        var exprs = 0
        plan.foreach { p =>
          nodes += 1
          p.expressions.foreach(e => e.foreach(_ => exprs += 1))
        }
        val t1 = System.nanoTime()
        d.queryExecution.executedPlan // Catalyst only (analyze/optimize/plan)
        val tCat = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        val (j0, jm0, tk0, tm0, sm0) = (jobs.get, jobMs.get, tasks.get, taskMs.get, serMs.get)
        val out = d.localCheckpoint(false) // + AQE loop job execution
        val tCkpt = (System.nanoTime() - t2) / 1e9
        Thread.sleep(120) // let the listener bus drain
        println(f"PLAN|$name%-24s|nodes=$nodes%5d|exprs=$exprs%7d|build=$tBuild%6.2f|cat=$tCat%6.2f|ckpt=$tCkpt%6.2f" +
          f"|jobs=${jobs.get - j0}%3d|jobMs=${jobMs.get - jm0}%5d|tasks=${tasks.get - tk0}%4d" +
          f"|taskRunMs=${taskMs.get - tm0}%5d|deserMs=${serMs.get - sm0}%5d")
        out
      }
    }
    val kb = KbIngest.fromLodTables(spark, MicroCorpus.lodTables, MicroCorpus.classHierarchy)
    val res = T2KPipeline.run(MicroCorpus.docs(spark), kb,
      MicroCorpus.surfaceFormsDf(spark), MicroCorpus.classHierarchy.toMap,
      ckpt = counting)
    val t0 = System.nanoTime()
    res.triples.count()
    println(f"PLAN|final_count|${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
