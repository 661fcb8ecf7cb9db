package graft.streaming

import graft.ops.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/**
 * Structured-Streaming surface of the engine. The reference pipeline is
 * pure batch (SURVEY.md §2.12); these operators are the incremental
 * counterparts a continuously-fed training-data pipeline needs:
 *
 *  - annotateDocs: streaming per-document enrichment (quality, language,
 *    fingerprint) — stateless, scales linearly with input rate;
 *  - windowedEventCounts: watermarked sliding-window aggregation over an
 *    event stream (late data bounded by the watermark);
 *  - sessionize: custom state via mapGroupsWithState — gap-based session
 *    assembly per user, the canonical stateful-op shape;
 *  - linkDocs / dedupDocs / annQueries: stream × static-index joins
 *    (entity linking, near-dup detection, ANN top-k) via foreachBatch
 *    over the verified batch kernels — each micro-batch is an
 *    independent bounded join.
 */
object Streams {

  /** Stateless streaming enrichment of a documents stream. */
  def annotateDocs(docs: DataFrame): DataFrame =
    TextAnalysis.fingerprint(
      TextAnalysis.langId(
        TextAnalysis.quality(docs)))
      .select(col("doc_id"), col("n_tokens"), col("quality_score"),
        col("pred_lang"), col("fingerprint"))

  /** Watermarked sliding-window counts per event type. */
  def windowedEventCounts(events: DataFrame,
                          watermark: String = "10 minutes",
                          windowLen: String = "5 minutes",
                          slide: String = "5 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /**
   * Incremental entity linking: a STREAM of interleaved documents linked
   * against the STATIC candidate-token index, per micro-batch. The
   * candidate kernel needs chained aggregations + a window (per-name
   * score -> per-uri max -> top-N), which streaming cannot express
   * statefully — and does not need to: each document links independently
   * of every other, so foreachBatch runs the full BATCH kernel
   * (Candidates.generate + top-1) on each micro-batch and appends to the
   * sink. foreachBatch is AT-LEAST-ONCE on retry: exactly-once semantics
   * hold only when the sink is idempotent per batchId (e.g. overwrite a
   * batchId-partitioned path, or MERGE keyed on batchId); at
   * 10^12-doc scale the static index side is the same bucketed
   * candidate_tokens table the batch pipeline checkpoints, and each
   * micro-batch is an independent bounded join (no stream state at all).
   *
   * `sink(linked, batchId)` receives (tableName, rowNum, uri, classId,
   * score) rows — the per-row top-1 instance links of that batch.
   */
  def linkDocs(docsStream: DataFrame, candidateTokens: DataFrame,
               keyCols: DataFrame, numCandidates: Int = 1,
               simThreshold: Double = 0.2)
              (sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val cells = graft.model.SpanCodec.cells(batch)
        val linked = graft.pipeline.Candidates.generate(
          cells, keyCols, candidateTokens, numCandidates, simThreshold)
        sink(linked, batchId)
      }
      .start()

  /**
   * Incremental near-duplicate detection: a STREAM of new documents
   * probed against the LSH index of the existing corpus
   * (Dedup.minhashBuckets — at 100 TB a table bucketed by (band,
   * bucket), so each micro-batch probe is a bounded join, never a
   * full-corpus rescan). Same architecture as [[linkDocs]]: new docs
   * near-dup-check independently of each other, so foreachBatch runs
   * the bounded batch kernel per micro-batch — no stream state. The
   * probe side MUST use the numHashes/bands/gramSize the index was
   * built with (band hashes are parameter-dependent). Candidate pairs
   * from bucket collisions are verified with exact Jaccard over the
   * hashed sets, so precision vs the index corpus is 1.0.
   *
   * Three legs close the three dup windows a continuous crawl has:
   *  - vs the SEED index (`staticBuckets`): dups of the pre-existing
   *    corpus;
   *  - WITHIN the batch (`withinBatch`, default on): a burst delivering
   *    N copies of one new page in a single batch (the lower id is kept
   *    as `dup_of`);
   *  - CROSS-BATCH (`cumulativeIndexDir`): each batch's banded rows are
   *    appended to a parquet dir under `batch_id=<id>` (overwritten on
   *    retry — idempotent per batchId) and every later batch probes
   *    seed ∪ appended, so a novel doc in batch 1 and its near-copy in
   *    batch 2 IS reported. Without the dir (None), only the first two
   *    legs run and that pair is silently missed — fine for a frozen
   *    reference corpus, wrong for a continuous crawl. At scale the
   *    appended dir is the same (band, bucket)-bucketed table the seed
   *    index lives in; per-batch file listing stays bounded because the
   *    append is one partition directory per batch (compact periodically,
   *    as any streaming-table sink does).
   *
   * `bucketCap` applies to BOTH the probe join and the within-batch leg
   * (one recall semantics for the whole operator); the default is
   * uncapped — set it when degenerate buckets (boilerplate shingles) are
   * expected. `sink(dups, batchId)` receives (doc_id, dup_of, jaccard)
   * rows, deduplicated across legs (a pair found both within-batch and
   * via a replayed index row is emitted once). foreachBatch is
   * at-least-once on retry — the sink must be idempotent per batchId for
   * exactly-once; the index append already is.
   */
  def dedupDocs(docsStream: DataFrame, staticBuckets: DataFrame,
                threshold: Double, numHashes: Int = 64, bands: Int = 16,
                gramSize: Int = 0, withinBatch: Boolean = true,
                idCol: String = "doc_id", textCol: String = "text",
                bucketCap: Int = Int.MaxValue,
                cumulativeIndexDir: Option[String] = None)
               (sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import graft.ops.Dedup
        val spark = batch.sparkSession
        val docs = batch.toDF()
        // banded rows of THIS batch: probe side now, index rows afterwards
        // (one shared kernel — index and probe cannot drift)
        val batchBuckets = Dedup.minhashBuckets(docs, idCol, textCol,
          numHashes, bands, bucketCap = Int.MaxValue, gramSize = gramSize)
        // cumulative index = seed ∪ previously appended batches. The file
        // listing snapshots at read time, so this batch's own append
        // (below) never feeds its own probe; a RETRYED batch does see its
        // failed attempt's rows — the self-match filter, the replay
        // orientation canonicalisation and the pair-level dedup below
        // make that replay-safe.
        val index = cumulativeIndexDir match {
          case Some(d) if hasParquet(spark, d) =>
            // schema given EXPLICITLY (same kernel -> same schema as the
            // batch's own banded rows): a batch_id dir holding no data
            // files (empty batch, or a crash mid-first-append) must read
            // as empty, not wedge every restart on schema inference
            staticBuckets.unionByName(
              spark.read.option("basePath", d)
                .schema(batchBuckets.schema).parquet(d)
                .select("docId", "nTok", "hs", "band", "bucket"))
          case _ => staticBuckets
        }
        val probe = Dedup.capBuckets(batchBuckets, Seq("band", "bucket"), bucketCap)
          .select(col("docId").as("newId"), col("nTok").as("newN"),
            col("hs").as("newHs"), col("band"), col("bucket"))
        // Cap the INDEX side of the probe join too: the seed index is
        // capped at build time, but appended batches accumulate UNcapped
        // (each batch's own append is deliberately uncapped so a later
        // cap choice still sees every row) — without this, a degenerate
        // (band, bucket) (boilerplate shingles) grows without bound
        // across batches and every later probe row in it joins against
        // all of it: the exact quadratic blow-up capBuckets exists to
        // prevent, reintroduced cross-batch. One recall semantics for
        // the whole operator (StreamsSpec pins the bounded-bucket
        // fixture).
        val vsIndex = probe.join(
            Dedup.capBuckets(index, Seq("band", "bucket"), bucketCap),
            Seq("band", "bucket"))
          // a replayed/backfilled doc already present in the index would
          // otherwise report ITSELF as its own duplicate (id, id, 1.0) —
          // and a downstream "drop doc_id, keep dup_of" dedup would then
          // delete the only copy
          .filter(col("newId") =!= col("docId"))
          .dropDuplicates("newId", "docId")
          // both sides are sorted hashed sets (minhashBuckets): the merge
          // walk is exactly size(array_intersect(...)), allocation-free
          .withColumn("shared", Dedup.sortedSharedUdf(col("newHs"), col("hs")))
          .withColumn("jaccard", col("shared").cast("double") /
            (col("newN") + col("nTok") - col("shared")).cast("double"))
          .filter(col("jaccard") >= threshold)
          .select(col("newId").as("doc_id"), col("docId").as("dup_of"),
            col("jaccard"))
          // REPLAY canonicalisation: on a retried batch the failed
          // attempt's append is visible, so an intra-batch pair (A, B)
          // comes back from the index in BOTH orientations — and a
          // downstream "drop doc_id, keep dup_of" dedup would then
          // delete both copies. When dup_of is a member of THIS batch:
          // withinBatch=true keeps only the doc_id > dup_of orientation
          // (the within-batch leg's convention, so the cross-leg dedup
          // collapses them); withinBatch=false drops the pair entirely
          // (the first attempt reported no intra-batch pairs — replay
          // must not either).
          .join(batchBuckets.select(col("docId").as("dup_of"))
              .distinct().withColumn("dupInBatch", lit(true)),
            Seq("dup_of"), "left")
          .filter(col("dupInBatch").isNull ||
            (if (withinBatch) col("doc_id") > col("dup_of") else lit(false)))
          .drop("dupInBatch")
        val dups =
          if (!withinBatch) vsIndex
          else vsIndex.unionByName(
            // minhashLsh emits id1 < id2; the later doc is the duplicate
            Dedup.minhashLsh(docs, idCol, textCol, threshold,
                numHashes, bands, bucketCap = bucketCap, gramSize = gramSize)
              .select(col("id2").as("doc_id"), col("id1").as("dup_of"),
                col("jaccard")))
            // one pair can surface on two legs (within-batch AND via a
            // replayed/appended index row); a batchId-idempotent sink
            // would still double-count it without this
            .dropDuplicates("doc_id", "dup_of")
        sink(dups, batchId)
        // append AFTER the sink's actions: the probe above holds the old
        // file listing either way, but this keeps failure atomicity —
        // a batch that dies in the sink leaves no index rows behind
        cumulativeIndexDir.foreach { d =>
          batchBuckets.write.mode("overwrite").parquet(s"$d/batch_id=$batchId")
        }
      }
      .start()

  /**
   * Compact a [[dedupDocs]] cumulative-index dir: fold all existing
   * `batch_id=<k>` partition dirs (including previous compactions) into
   * ONE, so the per-batch file listing and the union read stay bounded —
   * after 10⁵ micro-batches the listing itself becomes the probe's
   * bottleneck (one dir + one footer per batch). Call it between batches
   * (or from a maintenance schedule), exactly like any streaming-table
   * sink's compaction.
   *
   * Layout/safety contract:
   *  - compacted rows land in `batch_id=<negative>` (streaming batchIds
   *    are non-negative, successive compactions count downwards), written
   *    clustered by (band, bucket) — the seed index's layout — BEFORE the
   *    source dirs are deleted. A reader (or a crash) in the window
   *    between write and delete sees duplicate index rows only, which
   *    [[dedupDocs]] already collapses (`dropDuplicates(newId, docId)`),
   *    so dup output is identical before, during and after compaction
   *    (StreamsSpec pins before/after equality).
   *  - a batch dir appended CONCURRENTLY by the running query is not in
   *    the source list and is left untouched.
   *  - data-less dirs (crashed first append) are swept too.
   *
   * Returns the number of batch_id dirs folded (0 = nothing to do).
   */
  def compactDedupIndex(spark: SparkSession, dir: String): Int = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return 0
    val parts = fs.listStatus(base).filter(s => s.isDirectory &&
      s.getPath.getName.startsWith("batch_id=")).map(_.getPath)
    if (parts.length <= 1) return 0
    def batchOf(p: org.apache.hadoop.fs.Path): Long =
      try p.getName.stripPrefix("batch_id=").toLong
      catch { case _: NumberFormatException => 0L }
    val nextTag = math.min(parts.map(batchOf).min, 0L) - 1L
    val withData = parts.filter(p => fs.listStatus(p).exists(f =>
      f.getPath.getName.endsWith(".parquet")))
    if (withData.nonEmpty)
      // read the SOURCE dirs by explicit path (parquet is self-describing;
      // no partition discovery, so mixed/empty dirs can't wedge inference)
      spark.read.parquet(withData.map(_.toString): _*)
        .repartition(col("band"), col("bucket"))
        .write.mode("errorifexists").parquet(s"$dir/batch_id=$nextTag")
    parts.foreach(p => fs.delete(p, true))
    parts.length
  }

  /** True iff `dir` exists and holds at least one non-hidden entry —
    * guards the first batch's read of an empty cumulative-index dir. */
  private def hasParquet(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(s =>
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
  }

  /**
   * Incremental ANN: a STREAM of embedding queries probed against the
   * STATIC IVF inverted file (SimSearch.ivfInvertedFile — at scale a
   * table partitioned by cell, built once with the SAME centroids).
   * Same foreachBatch-over-the-batch-kernel architecture as
   * [[linkDocs]]/[[dedupDocs]]: each query's top-k is independent, so no
   * stream state; the probe join touches only each query's nProbe cells,
   * never the full corpus. `sink(topk, batchId)` receives
   * (qid, cid, cosine, rk) rows; at-least-once on retry — the sink must
   * be idempotent per batchId for exactly-once.
   */
  def annQueries(queryStream: DataFrame, invFile: DataFrame, k: Int,
                 cents: Array[Array[Double]], nProbe: Int = 4,
                 idCol: String = "vec_id", vecCol: String = "embedding")
                (sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    queryStream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        sink(graft.ops.SimSearch.ivfTopKFromIndex(
          batch.toDF(), invFile, idCol, vecCol, k, cents, nProbe), batchId)
      }
      .start()

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(startMs: Long, lastMs: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
                        n_events: Long, sum_value: Double)

  /** Gap-based sessionization with explicit state + processing-time
    * timeout; emits a session when the gap exceeds `gapMs`.
    *
    * Memory note: `it.toSeq.sortBy` buffers ONE user's events of ONE
    * micro-batch in executor memory (not the user's full history — state
    * carries only the compact SessionState across batches). A single user
    * producing more events per micro-batch than a task can hold is a
    * trigger-interval problem, not a state-size problem; keep triggers
    * short or pre-bucket pathological users upstream. */
  def sessionize(events: DataFrame, gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("ts"), col("value").cast("double"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) => {
          val out = collection.mutable.ArrayBuffer[SessionOut]()
          var cur = state.getOption
          it.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastMs <= gapMs =>
                cur = Some(s.copy(lastMs = t, n = s.n + 1, sum = s.sum + e.value))
              case Some(s) =>
                out += SessionOut(uid, s.startMs, s.lastMs, s.n, s.sum)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach(state.update)
          out.iterator
        })
      .toDF()
  }
}
