package graft.tools
import graft.fixtures.MicroCorpus
import graft.kb.KbIngest
import graft.pipeline.T2KPipeline
import org.apache.spark.sql.SparkSession
object ProbeMicro {
  def main(args: Array[String]): Unit = {
    val aqe = if (args.contains("noaqe")) "false" else "true"
    val codegen = if (args.contains("nocodegen")) "false" else "true"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.codegen.wholeStage", codegen)
      .config("spark.sql.ansi.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE|$l|${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    // arg(0): checkpointer to probe — local (default) | cache | noop | eager
    val ckpt: graft.checkpoint.Checkpointer = args.lift(0) match {
      case Some("cache") => graft.checkpoint.CacheCheckpointer
      case Some("noop") => graft.checkpoint.NoopCheckpointer
      case Some("eager") => new graft.checkpoint.Checkpointer {
        def apply(name: String, df: => org.apache.spark.sql.DataFrame) =
          df.localCheckpoint(eager = true)
      }
      case _ => graft.checkpoint.LocalCheckpointer
    }
    for (i <- 1 to 2) {
      val kb = time(s"kb_ingest_$i") {
        KbIngest.fromLodTables(spark, MicroCorpus.lodTables, MicroCorpus.classHierarchy) }
      val res = time(s"pipeline_def_$i") {
        T2KPipeline.run(MicroCorpus.docs(spark), kb,
          MicroCorpus.surfaceFormsDf(spark), MicroCorpus.classHierarchy.toMap,
          ckpt = ckpt) }
      time(s"triples_count_$i") { res.triples.count() }
    }
    spark.stop()
  }
}
