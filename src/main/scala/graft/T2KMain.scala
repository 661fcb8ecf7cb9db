package graft

import graft.checkpoint.ParquetCheckpointer
import graft.eval.Evaluator
import graft.kb.Loaders
import graft.pipeline.{T2KConfig, T2KPipeline}
import graft.triples.GraphSink
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * CLI equivalent of the reference's T2KMatch.main (T2KMatch.java:99-167):
 * a user of the reference points this at the same inputs and gets the
 * same outputs — instance/schema/class correspondence tables, extracted
 * triples (partitioned graph table), and P/R evaluation when gold
 * standards are provided.
 *
 * Usage:
 *   runMain graft.T2KMain --web <dirOfCsvs | docsParquet> --kb <lodCsvDir>
 *     --ontology <tsv> [--sf <file>] [--redirect <file>] [--out <dir>]
 *     [--checkpoint <dir>] [--gs-instance <csv>] [--gs-property <csv>]
 *     [--iterations N] [--mapped-ratio X]
 */
object T2KMain {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("graft-t2k")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val webPath = opts("web")
    val docs =
      if (new java.io.File(webPath).isDirectory &&
        new java.io.File(webPath).listFiles().exists(_.getName.endsWith(".csv")))
        Loaders.loadWebTablesDir(spark, webPath)
      else spark.read.parquet(webPath)
    val hierarchy = opts.get("ontology")
      .map(Loaders.loadClassHierarchy(spark, _)).getOrElse(Nil)
    val kb = Loaders.loadLodCsvDir(spark, opts("kb"), hierarchy)
    val sf = Loaders.loadSurfaceForms(spark, opts.get("sf"), opts.get("redirect"))

    val cfg = T2KConfig(
      numIterations = opts.get("iterations").map(_.toInt).getOrElse(1),
      mappedRatio = opts.get("mapped-ratio").map(_.toDouble).getOrElse(0.0))
    val result = opts.get("checkpoint") match {
      case Some(dir) => T2KPipeline.run(docs, kb, sf, hierarchy.toMap, cfg,
        new ParquetCheckpointer(spark, dir))
      case None => T2KPipeline.run(docs, kb, sf, hierarchy.toMap, cfg)
    }

    val out = opts.getOrElse("out", "t2k_out")
    result.instanceCorrs.write.mode("overwrite").parquet(s"$out/instance_correspondences")
    result.schemaCorrs.join(kb.props.select("propId", "propUri"), "propId")
      .write.mode("overwrite").parquet(s"$out/schema_correspondences")
    result.classCorrs.write.mode("overwrite").parquet(s"$out/class_decision")
    GraphSink.write(result.triples, s"$out/triples")

    opts.get("gs-instance").foreach { p =>
      val gs = Loaders.loadGoldStandard(spark, p).filter(col("isPositive"))
      val pred = result.instanceCorrs.select(
        concat(col("tableName"), lit("~Row"), col("rowNum")).as("leftId"),
        col("uri").as("rightId"))
      val prf = Evaluator.evaluate(pred, gs, Seq("leftId", "rightId"))
      println(f"instance P=${prf.precision}%.4f R=${prf.recall}%.4f F1=${prf.f1}%.4f")
    }
    opts.get("gs-property").foreach { p =>
      val gs = Loaders.loadGoldStandard(spark, p).filter(col("isPositive"))
      val pred = result.schemaCorrs
        .join(kb.props.select("propId", "propUri"), "propId")
        .select(concat(col("tableName"), lit("~Col"), col("colIdx")).as("leftId"),
          col("propUri").as("rightId"))
      val prf = Evaluator.evaluate(pred, gs, Seq("leftId", "rightId"))
      println(f"property P=${prf.precision}%.4f R=${prf.recall}%.4f F1=${prf.f1}%.4f")
    }
    println(s"wrote correspondences + triples to $out")
    spark.stop()
  }
}
