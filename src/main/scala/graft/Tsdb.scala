package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.LabelFunctions._
import graft.model.{LabelMatcher, TsdbConf}

/** Spark-native TSDB with the reference's query surface (SURVEY §2):
  * `insertRows` / `queryRange` / `querySeries` / `queryLabelValues` plus
  * retention expiry — re-expressed as declarative DataFrame plans so
  * Catalyst provides partition pruning (the reference's segment pruning,
  * segment.go:48-85), parquet predicate pushdown (the per-series iterator
  * early-break, series.go:42-58), and partial/final aggregation (the
  * cross-segment merge, tsdb.go:295-321) for free.
  *
  * Storage layout: `dataPath/samples/seg=<bucket>/…parquet` — the `seg`
  * partition column is `floor(ts / segmentDuration)`, replacing the
  * reference's `seg-<minTs>-<maxTs>` directories (tsdb.go:154-156).
  * A small `dataPath/series_meta` dimension table replaces the inverted
  * index (index.go): matcher evaluation against it yields candidate sids
  * that semi-join the fact table — the Spark form of the reference's
  * union/intersect of sid sets (index.go:111-143).
  *
  * Scale design: at 100 TB the fact table is only ever touched through
  * (a) `seg` partition pruning, (b) pushed-down `ts`/`sid` predicates, and
  * (c) one hash aggregation keyed by `sid` when point-array shaping is
  * requested. No collect-to-driver anywhere; `series_meta` is small (one
  * row per series) and broadcastable.
  */
class Tsdb(val spark: SparkSession, val conf: TsdbConf) {
  import Tsdb._

  // the plain-column label-lookup simplification (see
  // graft.plans.SimplifyFoldedLabelLookup) rides the session's
  // experimental optimizer hook so it is active in ANY session that
  // touches a Tsdb — no session-builder cooperation (extensions config)
  // required; idempotent across instances
  locally {
    val rule = graft.plans.SimplifyFoldedLabelLookup
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(rule))
      spark.experimental.extraOptimizations = cur :+ rule
  }

  spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")

  private val samplesPath = s"${conf.dataPath}/samples"
  private val metaPath = s"${conf.dataPath}/series_meta"

  /** Consolidated series-meta tier: one row per sid, produced by
    * [[compactSeriesMeta]] (or by the very first durable batch, whose
    * per-sid aggregation is already merged). `series_meta` itself is the
    * fresh-append level (L0); the inline cadence fold ([[foldMetaDelta]])
    * merges L0 — and ONLY L0, O(rows appended since the last fold) —
    * into the append-only folded level (L1, `series_meta_folded`),
    * never re-merging earlier folded generations or the base. Reads
    * merge base ∪ L1 ∪ L0; [[compactSeriesMeta]] is the explicit full
    * consolidation collapsing everything back into the base.
    */
  private val metaBasePath = s"${conf.dataPath}/series_meta_base"

  /** Folded delta level (L1): one merged generation appended per inline
    * fold. Bounded by churn volume since the last full compaction. */
  private val metaFoldedPath = s"${conf.dataPath}/series_meta_folded"

  /** Label→value-set dimension tier (the reference's `labelValueSet`,
    * label.go:40-77, maintained on every insert,
    * memory_segment.go:93-96): distinct `(seg, name, value)` label pairs,
    * seg-partitioned. [[queryLabelValues]] reads O(distinct pairs in the
    * queried segments) from it instead of aggregating the O(series)
    * dimension — at 10M series a low-cardinality label's domain is tens
    * of rows instead of a 15M-row map aggregation.
    */
  private val labelValuesPath = s"${conf.dataPath}/label_values"

  /** onlyMemoryMode head: accumulated in-memory batches (the reference's
    * memory segment, memory_segment.go). Batch appends only; the streaming
    * path writes through `insertRows` via foreachBatch. The union lineage
    * is truncated with a localCheckpoint every few batches so a
    * long-running memory head doesn't grow an unbounded plan.
    */
  private var memHead: Option[DataFrame] = None
  private var memBatches: Int = 0
  private val memCheckpointEvery = 8

  /** Partial write generations accumulated in `series_meta`: every durable
    * append (ingest batch, head flush, rollup-dim append) adds one, and a
    * read pays a merge aggregation whenever more than one is present.
    * `1` = the on-disk dim is known one-row-per-sid (single batch, or
    * freshly compacted) and reads skip the merge. A store opened from a
    * pre-existing path has unknown provenance, so it starts at the
    * compaction threshold: correctness-safe (merge-on-read) and the next
    * append folds it back to one generation.
    */
  private var metaGenerations: Int =
    if (conf.onlyMemoryMode) 0
    else if (pathExists(s"${conf.dataPath}/series_meta"))
      math.max(conf.metaCompactEvery, 2)
    else 0

  /** Cached [[seriesDimSmall]] verdict; invalidated by every meta write. */
  private var seriesDimSmallCache: Option[Boolean] = None

  /** Cached "delta level fits under the broadcast threshold" verdict for
    * the [[seriesMeta]] merge-on-read split; invalidated like
    * [[seriesDimSmallCache]].
    */
  private var metaDeltaSmallCache: Option[Boolean] = None

  /** Rows currently buffered in the head (tracked incrementally — one count
    * per [[insertHeadRows]] batch, never a scan of the accumulated head).
    */
  private var headRows: Long = 0L

  /** Highest segment frozen to disk — the `enableOutdated=false` rejection
    * boundary. Initialized lazily from the partition listing so a Tsdb
    * attached to an existing store starts with the right boundary.
    */
  private var frozenMaxSeg: Long = Long.MinValue
  private var frozenInit: Boolean = false
  private def frozenBoundary(): Long = {
    if (!frozenInit) {
      frozenInit = true
      val segs = listSegDirs().map(_._1)
      if (segs.nonEmpty) frozenMaxSeg = math.max(frozenMaxSeg, segs.max)
    }
    frozenMaxSeg
  }

  private def fs: org.apache.hadoop.fs.FileSystem =
    org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)

  private def pathExists(p: String): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(p))

  private def listSegDirs(): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val base = new org.apache.hadoop.fs.Path(samplesPath)
    if (!fs.exists(base)) return Seq.empty
    fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val name = st.getPath.getName
        if (name.startsWith("seg="))
          Some((name.stripPrefix("seg=").toLong, st.getPath))
        else None
      }
  }

  // ---------------------------------------------------------------- ingest

  /** Normalize `(metric, labels, ts, value)` rows into the internal sample
    * shape: labels filtered (label.go:190-203), metric folded as `__name__`
    * (label.go:221-228), `sid` and `seg` derived.
    */
  def normalize(df: DataFrame): DataFrame = {
    // fused forms of foldMetric(normalizeLabels(coalesce(labels, map())))
    // and sidOf's sort+render — the interpreted higher-order map chain
    // (map_concat/map_filter/transform are CodegenFallback) otherwise
    // re-evaluates in every query's scan-stage Project for memory-attached
    // stores (the head union is lazy); entry-for-entry identical under
    // LAST_WIN, spec-pinned in LabelMapSpec
    // (no coalesce needed: the fused expression folds a NULL labels map
    // exactly like the empty map)
    val folded = graft.plans.FoldNormalizeLabels.fold(
      col("metric"), col("labels"))
    df.withColumn("labels", folded)
      .withColumn("sid",
        xxhash64(graft.plans.CanonicalLabelsRender.render(col("labels"))))
      .withColumn("seg", segOf(col("ts"), conf.segmentDuration))
      .select("sid", "metric", "labels", "seg", "ts", "value")
  }

  /** Batch insert (reference InsertRows, tsdb.go:205-216). Expects columns
    * `metric: string, labels: map<string,string>, ts: long (s), value:
    * double`. Appends time-partitioned parquet + upserts series metadata.
    * Out-of-order and late points are a non-issue in batch storage — Parquet
    * partitions are unordered collections and reads sort as needed (the
    * reference's outdated-list machinery, memory_segment.go:104-111, exists
    * only because its Gorilla blocks are append-only).
    */
  /** Spread a badly-partitioned ingest batch across the cluster before
    * the per-row work: a single-partition feed (one kafka partition, one
    * un-split file — exactly how the sf0.1 events parquet reads) would
    * otherwise serialize normalize + checkpoint + write onto one core.
    * Only engages when the input has less than half the default
    * parallelism — well-partitioned callers pay nothing.
    */
  private def spread(df: DataFrame): DataFrame = {
    val want = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < want) df.repartition(want) else df
  }

  def insertRows(df: DataFrame): Unit = {
    // spread only on the durable path: it materializes (persist + write),
    // so parallelizing the per-row work pays. The memory-mode head is a
    // LAZY union serving reads — an exchange here would sit in every
    // downstream query plan (attach() feeds this path; round-7 measured
    // a uniform 1.3-2.2x slowdown across the tsdb family before this
    // guard), and the source's natural partitioning is what queries want.
    val norm0 = normalize(if (conf.onlyMemoryMode) df else spread(df))
    if (conf.onlyMemoryMode) {
      val u = memHead.map(_.unionByName(norm0)).getOrElse(norm0)
      memBatches += 1
      memHead = Some(
        if (memBatches % memCheckpointEvery == 0) u.localCheckpoint()
        else u)
    } else {
      // one normalize pass feeds both the fact write and the series-meta
      // upsert; persisted (spillable) for the duration of the two actions —
      // batch size bounds the footprint (micro-batches in the streaming
      // path, caller-chosen batches otherwise)
      val norm = norm0.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try writeNormalized(norm)
      finally norm.unpersist()
    }
  }

  /** Durable write of already-normalized rows: partitioned fact append +
    * series-meta upsert. Caller persists `norm` for the two actions.
    */
  private def writeNormalized(norm: DataFrame): Unit = {
    // shuffle by the partition column before the partitioned write: files
    // per time bucket stay bounded by `filesPerSegment` instead of
    // (tasks × buckets) — at fleet scale this is the difference between
    // 1e3 and 1e6 files per ingest batch. Sub-bucketing by sid (knob > 1)
    // parallelizes the write of a single live bucket without breaking
    // series locality: a sid lands whole inside one file either way.
    val fact =
      if (conf.storeLabelsInFact) norm
      else norm.select("sid", "seg", "ts", "value")
    // sort by (sid, ts) inside each bucket: per-series point locality —
    // parquet delta-encodes the ts run per series (the role of the
    // reference's per-series Gorilla blocks) and sid row-group stats
    // let the semi-join path skip row groups
    (if (conf.filesPerSegment > 1)
       fact.repartition(col("seg"),
         pmod(col("sid"), lit(conf.filesPerSegment.toLong)))
     else fact.repartition(col("seg")))
      .sortWithinPartitions("sid", "ts")
      .write
      .mode("append")
      .option("compression", conf.compression)
      .partitionBy("seg")
      .parquet(samplesPath)
    appendSeriesMeta(norm)
    appendLabelValues(norm)
    // advance the outdated-rejection boundary here — this serves BOTH
    // durable paths (insertRows and flushHead), so segments frozen via
    // direct insertRows are visible to insertHeadRows' gate. The max
    // frozen segment is read off the store's partition directories
    // (driver-side listing, O(segments) names) instead of a Spark job
    // over the batch: the boundary is a monotone max, so the global
    // listing equals max(old, thisBatch) exactly — and it shaves one
    // job launch per streaming commit (~0.2-0.4 s at micro-batch
    // cadence, measured in IngestBench's file-stream path).
    listSegDirs().map(_._1).maxOption.foreach { s =>
      frozenInit = true // this listing IS the lazy init's listing
      frozenMaxSeg = math.max(frozenMaxSeg, s)
    }
  }

  /** Per-sid meta aggregation of one normalized batch. */
  private def metaAggOf(norm: DataFrame): DataFrame =
    norm
      .groupBy("sid")
      .agg(
        first("metric").as("metric"),
        first("labels").as("labels"),
        min("ts").as("minTs"),
        max("ts").as("maxTs"))

  /** Durable series-meta upsert for one batch. The very first batch of a
    * fresh store IS one-row-per-sid after its aggregation, so it becomes
    * the consolidated base level directly; every later batch appends a
    * delta generation (merged on read, folded on the
    * `metaCompactEvery` cadence — delta-only, O(touched rows)).
    */
  private def appendSeriesMeta(norm: DataFrame): Unit = {
    val freshStore = metaGenerations == 0 &&
      !pathExists(metaBasePath) && !pathExists(metaPath) &&
      !pathExists(metaFoldedPath)
    val target = if (freshStore) metaBasePath else metaPath
    metaAggOf(norm)
      .coalesce(4)
      .write
      .mode("append")
      .option("compression", conf.compression)
      .parquet(target)
    if (freshStore) {
      seriesDimSmallCache = None
      metaDeltaSmallCache = None
    } else metaAppended()
  }

  /** Append one batch's distinct `(seg, name, value)` label pairs to the
    * label→value-set tier. Duplicate pairs across batches are harmless
    * ([[queryLabelValues]] ends in a distinct); [[compactLabelValues]]
    * consolidates. Within each file rows are (name, value)-sorted so
    * single-label reads skip foreign row groups via column stats; the
    * `filesPerSegment` sub-bucketing parallelizes the single-live-bucket
    * streaming write exactly like the fact path.
    */
  private def appendLabelValues(norm: DataFrame): Unit = {
    val pairs = norm
      .select(col("seg"), explode(col("labels")).as(Seq("name", "value")))
      .distinct()
    val sub = math.max(1, conf.filesPerSegment).toLong
    pairs
      .repartition(col("seg"),
        pmod(xxhash64(col("name"), col("value")), lit(sub)))
      .sortWithinPartitions("name", "value")
      .write
      .mode("append")
      .option("compression", conf.compression)
      .partitionBy("seg")
      .parquet(labelValuesPath)
  }

  /** Bookkeeping after every durable `series_meta` DELTA append: one more
    * partial generation on disk, size caches stale; fold the delta
    * partials back to one generation inline once the configured cadence
    * is reached, so metadata read cost stays O(1) in ingest-batch count.
    * The fold never touches the consolidated base — its cost is bounded
    * by the rows touched since the last [[compactSeriesMeta]], not by
    * total series count (the reference's insert-time `labelValueSet`
    * update is likewise O(batch), memory_segment.go:93-96).
    */
  private def metaAppended(): Unit = {
    metaGenerations += 1
    seriesDimSmallCache = None
    metaDeltaSmallCache = None
    if (conf.metaCompactEvery > 0 && metaGenerations >= conf.metaCompactEvery)
      foldMetaDelta()
  }

  /** Head-buffered ingest — the reference's live memory segment
    * (memory_segment.go): rows accumulate in the in-memory head, reads see
    * disk ∪ head (head scanned last, segment.go:62-65) until [[flushHead]]
    * — or the `maxRowsPerSegment` secondary trigger — freezes the head to
    * parquet. With `enableOutdated=false`, rows whose segment is already
    * frozen are rejected (returned count) instead of silently merged.
    *
    * @return number of rows rejected by the outdated gate (0 when
    *         `enableOutdated=true`)
    */
  def insertHeadRows(df: DataFrame): Long = {
    val norm0 = normalize(spread(df))
    // localCheckpoint materializes the batch once: the count below and the
    // head union both read the materialized partitions, and the incoming
    // lineage (often a fresh source read) is truncated
    val all = norm0.localCheckpoint()
    val (accepted, rejected) =
      if (conf.enableOutdated) (all, 0L)
      else {
        val boundary = frozenBoundary()
        if (boundary == Long.MinValue) (all, 0L)
        else {
          val ok = all.where(col("seg") > boundary).localCheckpoint()
          (ok, all.count() - ok.count())
        }
      }
    headRows += accepted.count()
    memBatches += 1
    memHead = Some(memHead.map(_.unionByName(accepted)).getOrElse(accepted))
    if (memBatches % memCheckpointEvery == 0)
      memHead = memHead.map(_.localCheckpoint())
    if (conf.maxRowsPerSegment > 0 && headRows >= conf.maxRowsPerSegment)
      flushHead()
    rejected
  }

  /** Freeze the head: durable-write the buffered rows and clear the buffer
    * (the reference's segment flush, tsdb.go:242-265). No-op in
    * `onlyMemoryMode` (nowhere to flush) or with an empty head.
    */
  def flushHead(): Unit = {
    if (conf.onlyMemoryMode) return
    memHead.foreach { h =>
      if (headRows > 0) {
        val norm = h.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try writeNormalized(norm) // advances frozenMaxSeg
        finally norm.unpersist()
      }
    }
    memHead = None
    headRows = 0L
    memBatches = 0
  }

  // ---------------------------------------------------------------- tables

  /** The long-format sample table. Unified view: when both a disk store and
    * a live head exist (head-buffered or streaming ingest in flight), the
    * union of the two — disk segments first, head last — so queries always
    * see all data, matching the reference's segment list + head iteration
    * order (segment.go:62-65). In `onlyMemoryMode` the head is the store;
    * disk-only mode reads parquet directly. Filters push through the Union
    * into each branch, so `seg` partition pruning on the disk side is
    * unaffected by the head.
    */
  def samples: DataFrame = {
    if (conf.onlyMemoryMode) memHead.getOrElse(spark.read.parquet(samplesPath))
    else {
      val factCols =
        if (conf.storeLabelsInFact)
          Seq("sid", "metric", "labels", "seg", "ts", "value")
        else Seq("sid", "seg", "ts", "value")
      val disk =
        if (pathExists(samplesPath))
          Some(spark.read.parquet(samplesPath).select(factCols.map(col): _*))
        else None
      val head = memHead.map(_.select(factCols.map(col): _*))
      (disk, head) match {
        case (Some(d), Some(h)) => d.unionByName(h)
        case (Some(d), None) => d
        case (None, Some(h)) => h
        // neither: preserve the read-of-missing-path error surface
        case (None, None) => spark.read.parquet(samplesPath)
      }
    }
  }

  /** Session broadcast threshold in bytes (negative = user disabled
    * broadcast joins entirely; honored).
    */
  private def broadcastThresholdBytes: Long = {
    val s = spark.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
    if (s.startsWith("-")) -1L
    else
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s)
      catch { case _: NumberFormatException => 10L * 1024 * 1024 }
  }

  /** True when the series dimension provably fits under the session's
    * broadcast threshold. A disk-backed dimension is measured (meta file
    * bytes × a conservative 4× decompression factor — one FS listing,
    * cached until the next meta write); a pure memory head is treated as
    * small, since its series count is bounded by the flush cadence
    * (`maxRowsPerSegment`), not by total data volume. High-cardinality
    * stores — the TSDB cardinality bomb, series count ∝ data — therefore
    * get NO hint, and the planner (or AQE at runtime) picks a shuffle
    * join instead of an executor-OOM broadcast.
    */
  private def seriesDimSmall: Boolean = seriesDimSmallCache.getOrElse {
    val thr = broadcastThresholdBytes
    val dirs = Seq(metaBasePath, metaFoldedPath, metaPath).filter(p =>
      !conf.onlyMemoryMode && pathExists(p))
    val small =
      if (thr < 0) false
      else if (dirs.nonEmpty)
        dirs.map(p => fs.getContentSummary(
          new org.apache.hadoop.fs.Path(p)).getLength).sum * 4 < thr
      else true
    seriesDimSmallCache = Some(small)
    small
  }

  /** Broadcast-hint the series dimension only when it is provably small
    * ([[seriesDimSmall]]) — the semi-join shape is kept either way.
    */
  private def dimHint(dim: DataFrame): DataFrame =
    if (seriesDimSmall) broadcast(dim) else dim

  /** Fact rows with metric + labels attached — identity for the
    * denormalized layout, broadcast dimension join for the normalized one.
    */
  def samplesWithLabels: DataFrame =
    if (samples.columns.contains("labels")) samples
    else samples
      .join(dimHint(seriesMeta.select("sid", "metric", "labels")), "sid")
      .select("sid", "metric", "labels", "seg", "ts", "value")

  /** Typed view of the sample table for compile-time-checked pipelines. */
  def typedSamples: org.apache.spark.sql.Dataset[graft.model.Sample] = {
    import spark.implicits._
    samplesWithLabels.select("sid", "metric", "labels", "seg", "ts", "value")
      .as[graft.model.Sample]
  }

  /** Series dimension: one row per sid with label set + time bounds.
    * Persisted appends are compacted at read (min/max re-merge) — the same
    * partial/final merge the reference does across segments — but the
    * merge is skipped when the store is provably one-row-per-sid already:
    * a head-only dimension (its aggregation IS the merge) or a disk
    * dimension at a single write generation (one batch, or freshly
    * [[compactSeriesMeta]]-folded). With the auto-compaction cadence
    * (`TsdbConf.metaCompactEvery`), metadata reads therefore cost one
    * aggregation at most every few appends instead of one per read.
    */
  def seriesMeta: DataFrame = {
    val headAgg = memHead.map(
      _.groupBy("sid").agg(
        first("metric").as("metric"), first("labels").as("labels"),
        min("ts").as("minTs"), max("ts").as("maxTs")))
    val base =
      if (!conf.onlyMemoryMode && pathExists(metaBasePath))
        Some(spark.read.parquet(metaBasePath))
      else None
    val diskL0 =
      if (!conf.onlyMemoryMode && pathExists(metaPath))
        Some(spark.read.parquet(metaPath))
      else None
    val diskL1 =
      if (!conf.onlyMemoryMode && pathExists(metaFoldedPath))
        Some(spark.read.parquet(metaFoldedPath))
      else None
    // the head aggregation is just another (already-merged) delta level
    val delta = Seq(diskL1, diskL0, headAgg).flatten
      .reduceOption(_ unionByName _)
    (base, delta) match {
      case (Some(b), None) => b // base is one-row-per-sid by construction
      case (Some(b), Some(d)) =>
        if (metaDeltaSmall) {
          // merge-on-read split: the base NEVER shuffles — untouched sids
          // pass through a broadcast anti-join, touched sids re-merge
          // through a broadcast semi-join + one aggregation bounded by
          // delta size. At 15M series with a small delta this replaces a
          // 15M-row shuffle aggregation per metadata read with two
          // broadcast probes over the same scan.
          val dm = mergedMeta(d)
          val keys = dm.select("sid")
          b.join(broadcast(keys), Seq("sid"), "left_anti")
            .unionByName(mergedMeta(
              b.join(broadcast(keys), Seq("sid"), "left_semi")
                .unionByName(dm)))
        } else mergedMeta(b.unionByName(d))
      case (None, Some(d)) =>
        if (diskL0.isEmpty && diskL1.isEmpty) d // head-only: pre-merged
        else if (headAgg.isEmpty && diskL1.isEmpty && metaGenerations <= 1)
          d
        else mergedMeta(d)
      case (None, None) => mergedMeta(spark.read.parquet(metaPath))
    }
  }

  /** Partial/final merge of stacked per-sid meta rows (the reference's
    * cross-segment merge of series bounds, tsdb.go:295-321).
    */
  private def mergedMeta(raw: DataFrame): DataFrame = raw
    .groupBy("sid")
    .agg(
      first("metric").as("metric"),
      first("labels").as("labels"),
      min("minTs").as("minTs"),
      max("maxTs").as("maxTs"))

  /** True when the accumulated series-meta delta level provably fits
    * under the session broadcast threshold — the gate for the
    * [[seriesMeta]] split read. Falls back to the full merge when the
    * delta has grown past it (correct either way).
    */
  private def metaDeltaSmall: Boolean = metaDeltaSmallCache.getOrElse {
    val thr = broadcastThresholdBytes
    val dirs = Seq(metaFoldedPath, metaPath).filter(pathExists)
    val small =
      if (thr < 0) false
      else if (dirs.nonEmpty)
        dirs.map(p => fs.getContentSummary(
          new org.apache.hadoop.fs.Path(p)).getLength).sum * 4 < thr
      else true
    metaDeltaSmallCache = Some(small)
    small
  }

  // ---------------------------------------------------------------- queries

  /** QueryRange (reference tsdb.go:278-293): long-format result
    * `(sid, labels, ts, value)` filtered to the metric, matchers and
    * inclusive `[start, end]` range. The `seg` predicate prunes partitions;
    * `ts` pushes into parquet row-group stats.
    */
  def queryRange(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long): DataFrame =
    // path choice by storage layout: when the fact rows already carry the
    // label maps (denormalized store, or the in-memory attached head), the
    // direct predicate path is one scan with zero joins — evaluating
    // matchers via the series dimension would scan the same relation TWICE
    // (fact + dimension aggregation). The index path pays off exactly when
    // the fact is normalized (no labels) and the dimension is the only way
    // to evaluate matchers without a per-row reconstruction join.
    queryRange(metric, matchers, start, end,
      useSeriesIndex = !samples.columns.contains("labels"))

  /** @param useSeriesIndex when true (default), matcher evaluation runs on
    * the small series_meta dimension and the matching sids semi-join the
    * fact table (broadcast at any realistic series cardinality) — the Spark
    * form of the reference's inverted-index sid-set union/intersect
    * (index.go:111-143). The fact scan then only evaluates pushed-down
    * `seg`/`ts` predicates and an 8-byte join key, never the map lookups.
    * `false` applies the label predicates directly to the fact rows —
    * identical results, used as the cross-check path in tests.
    */
  def queryRange(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      useSeriesIndex: Boolean): DataFrame = {
    val all = LabelMatcher.eq(MetricLabel, metric) +: matchers
    val pruned = samples
      .where(segPredicate(start, end))
      .where(col("ts").between(start, end))
    if (useSeriesIndex) {
      // matchers run on the series dimension; matching sids (with their
      // label sets) broadcast-join the pruned fact scan — this also
      // reconstructs labels for the normalized fact layout
      val matching = seriesMeta
        .where(matcherPredicate(col("labels"), all))
        .select("sid", "labels")
      pruned
        .select("sid", "ts", "value")
        .join(dimHint(matching), "sid")
        .select("sid", "labels", "ts", "value")
    } else {
      val withLabels =
        if (pruned.columns.contains("labels")) pruned
        else pruned.select("sid", "ts", "value")
          .join(dimHint(seriesMeta.select("sid", "labels")), "sid")
      withLabels
        .where(factMatcherPredicate(withLabels, all))
        .select("sid", "labels", "ts", "value")
    }
  }

  /** PromQL-style selector range query: `{__name__=~"...", ...}` — the
    * metric itself is just a matcher, so one query spans metrics (the
    * reference's QueryRange is single-metric by signature, tsdb.go:268).
    * Same two paths as [[queryRange]]: matchers evaluate on the series
    * dimension (index path) or directly on labeled fact rows; the fact
    * scan still only sees pruned `seg`/`ts` predicates plus the sid key.
    */
  def queryRangeSelector(
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long): DataFrame = {
    require(matchers.nonEmpty, "selector needs at least one matcher")
    val pruned = samples
      .where(segPredicate(start, end))
      .where(col("ts").between(start, end))
    if (!samples.columns.contains("labels")) {
      val matching = seriesMeta
        .where(matcherPredicate(col("labels"), matchers))
        .select("sid", "labels")
      pruned
        .select("sid", "ts", "value")
        .join(dimHint(matching), "sid")
        .select("sid", "labels", "ts", "value")
    } else
      pruned
        .where(factMatcherPredicate(pruned, matchers))
        .select("sid", "labels", "ts", "value")
  }

  /** Per-series sampling-gap detection: count and max of the gaps between
    * consecutive samples that exceed `thresholdSec` — the staleness /
    * lost-scrape signal an operator dashboards first. One window on sid +
    * one aggregation, both on the pruned range scan.
    */
  def gapsBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      thresholdSec: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("sid").orderBy(col("ts"), col("value"))
    val keys = byLabels.map(l => col("labels").getItem(l).as(l))
    queryRange(metric, matchers, start, end)
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .where(col("prev_ts").isNotNull)
      .withColumn("gap", col("ts") - col("prev_ts"))
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(when(col("gap") > thresholdSec, 1L).otherwise(0L)).as("n_gaps"),
        max("gap").as("max_gap"))
  }

  /** QueryRange shaped like the reference's `MetricRet` (tsdb.go:273-276):
    * one row per series with a ts-sorted points array. The sort_array of
    * collected structs is the reference's concat+sort merge
    * (tsdb.go:295-321) expressed as one hash aggregation. Optional terminal
    * step — at 100 TB keep the long format (SURVEY §7.4).
    */
  def queryRangeShaped(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long): DataFrame =
    queryRange(metric, matchers, start, end)
      .groupBy("sid")
      .agg(
        first("labels").as("labels"),
        sort_array(collect_list(struct(col("ts"), col("value")))).as("points"))

  /** Bounded-row variant of [[queryRangeShaped]]: splits each series into
    * chunks of at most `maxPointsPerRow` ts-ordered points, so no single
    * output row (or aggregation buffer) grows with the range length — the
    * scale-safe shaping for wide time ranges (SURVEY §7.4). Output adds a
    * `chunk` ordinal per series.
    */
  def queryRangeShapedChunked(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      maxPointsPerRow: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("sid").orderBy("ts")
    queryRange(metric, matchers, start, end)
      .withColumn("chunk",
        floor((row_number().over(w) - 1) / maxPointsPerRow).cast("long"))
      .groupBy("sid", "chunk")
      .agg(
        first("labels").as("labels"),
        sort_array(collect_list(struct(col("ts"), col("value")))).as("points"))
  }

  /** PromQL-style label-dimension aggregation — `sum by (labels)
    * (metric[step])`: aggregate [[queryRange]] output ACROSS series,
    * grouped by a label subset and a tumbling step bucket. The operator the
    * reference lacks entirely (no aggregations, README.md:36-40) but every
    * Prometheus user's first query needs.
    *
    * Plan: one hash aggregation keyed by (labels…, bucket) over the pruned
    * range scan — label extraction and bucketing are map-side, sums
    * accumulate in DECIMAL for oracle-exact reassociation, so the whole
    * query is scan → project → ONE shuffle at any scale.
    *
    * @param offsetSec PromQL `offset` modifier: evaluate over data
    *   `offsetSec` earlier — the selection window shifts back by the
    *   offset (segment pruning follows it) and result buckets are
    *   reported at the REQUESTED timestamps, exactly like
    *   `sum by (l) (metric[step] offset o)` aligns last week's data to
    *   this week's eval grid.
    */
  def aggregateBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      offsetSec: Long = 0L,
      relabel: Column => Column = c => c): DataFrame = {
    require(offsetSec >= 0, s"offset must be >= 0: $offsetSec")
    val keys = byLabels.map(l => col("labels").getItem(l).as(l)) :+
      ((col("ts") - pmod(col("ts"), lit(stepSec))) + offsetSec)
        .as("bucket_start")
    // `relabel` rewrites the label map BEFORE grouping (PromQL's
    // label_replace / label_join feeding an aggregation) — selector
    // matchers still apply to the ORIGINAL labels, like Prometheus,
    // and the default identity keeps the plan unchanged
    queryRange(metric, matchers, start - offsetSec, end - offsetSec)
      .withColumn("labels", relabel(col("labels")))
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_v"),
        (sum(col("value").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_v"),
        min("value").as("min_v"),
        max("value").as("max_v"))
  }

  /** PromQL `quantile_over_time(q, metric[step]) by (labels)`: exact
    * continuous quantile of the raw samples per (label subset, step
    * bucket). One hash aggregation — `percentile` is a partial-merge
    * aggregate, so map-side combine applies like any sum; no window, no
    * per-series sort job.
    */
  def quantileBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      q: Double,
      offsetSec: Long = 0L): DataFrame = {
    require(q >= 0 && q <= 1, s"quantile must be in [0,1]: $q")
    require(offsetSec >= 0, s"offset must be >= 0: $offsetSec")
    val keys = byLabels.map(l => col("labels").getItem(l).as(l)) :+
      ((col("ts") - pmod(col("ts"), lit(stepSec))) + offsetSec)
        .as("bucket_start")
    queryRange(metric, matchers, start - offsetSec, end - offsetSec)
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n"),
        round(percentile(col("value"), lit(q)), 6).as("q_v"))
  }

  /** PromQL 3.x `mad_over_time(metric[step]) by (labels)`: exact median
    * absolute deviation — `median(|v − median(v)|)` — of the raw samples
    * per (label subset, step bucket), the robust spread statistic
    * Prometheus 3 added for outlier-tolerant alerting. Two passes over
    * the SAME hash partitioning: a window `percentile(0.5)` attaches the
    * per-group median, then one hash aggregation takes the median of the
    * absolute deviations — the groupBy reuses the window's exchange, so
    * the whole thing is one shuffle at sample grain (group keys, never a
    * global sort). NULL group labels survive (window/groupBy both treat
    * NULL as a value). The final value rounds through the tie-free
    * `floor(x·1e6 + 0.5)/1e6` (the engine's cross-engine rounding form),
    * so the DuckDB `quantile_cont` mirror is byte-exact.
    */
  def madBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      offsetSec: Long = 0L): DataFrame = {
    require(offsetSec >= 0, s"offset must be >= 0: $offsetSec")
    val base = queryRange(metric, matchers, start - offsetSec, end - offsetSec)
      .withColumn("bucket_start",
        (col("ts") - pmod(col("ts"), lit(stepSec))) + offsetSec)
      .select(byLabels.map(l => col("labels").getItem(l).as(l)) ++
        Seq(col("bucket_start"), col("value")): _*)
    val keys = (byLabels :+ "bucket_start").map(col)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys: _*)
    base
      .withColumn("med", percentile(col("value"), lit(0.5)).over(w))
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n"),
        (floor(percentile(abs(col("value") - col("med")), lit(0.5)) * 1e6 +
          lit(0.5)) / 1e6).as("mad_v"))
  }

  /** `sum by (labels) (increase(metric[step]))` — the composed PromQL
    * counter form: per-SERIES reset-robust increase (positive deltas; a
    * drop contributes the new value, as a restarted counter does), then
    * summed across series per (label subset, step bucket).
    *
    * Two stages by nature — a per-series window (shuffle on sid) feeding
    * the cross-series hash aggregation — mirroring exactly how a
    * distributed PromQL engine evaluates this. Delta arithmetic stays in
    * DECIMAL until the final cast; the lag order (ts, value) is fully
    * deterministic: rows tying on both carry equal values, so any
    * interleaving yields the same per-bucket delta sums.
    */
  def aggregateIncreaseBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      offsetSec: Long = 0L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("sid").orderBy(col("ts"), col("value"))
    val keys = byLabels.map(l => col("labels").getItem(l).as(l)) :+
      ((col("ts") - pmod(col("ts"), lit(stepSec))) + offsetSec)
        .as("bucket_start")
    queryRange(metric, matchers, start - offsetSec, end - offsetSec)
      .withColumn("v", col("value").cast("decimal(18,2)"))
      .withColumn("prev", lag("v", 1).over(w))
      .withColumn("delta",
        when(col("prev").isNull, lit(null))
          .when(col("v") >= col("prev"), col("v") - col("prev"))
          .otherwise(col("v")))
      .where(col("delta").isNotNull)
      .groupBy(keys: _*)
      .agg(
        sum(col("delta")).cast("double").as("increase"),
        round(sum(col("delta")).cast("double") / stepSec, 6)
          .as("rate_per_sec"))
  }

  /** Sliding-window counter increase/rate on the subquery eval grid:
    * `rate(metric[rangeSec])` evaluated every `stepSec` — the inner leg
    * of a nested subquery `max_over_time(rate(x[5m])[1h:1m])`.
    * Per-sample reset-robust deltas are computed ONCE per series (the
    * [[aggregateIncreaseBy]] decimal lag), then each delta row explodes
    * to the eval points whose lookback window `[T-rangeSec+1, T]` covers
    * it, and ONE hash aggregation sums per (label group, eval point).
    * The scan (and the lag's visibility) covers
    * `[start - rangeSec + 1, end]`, so an oracle computing the lag over
    * the same scanned set mirrors it exactly.
    */
  def slidingIncreaseBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      rangeSec: Long,
      offsetSec: Long = 0L): DataFrame = {
    require(rangeSec > 0 && stepSec > 0, "rangeSec and stepSec must be > 0")
    require(offsetSec >= 0, s"offset must be >= 0: $offsetSec")
    val start0 = start - offsetSec
    val end0 = end - offsetSec
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("sid").orderBy(col("ts"), col("value"))
    val firstEval =
      floor((col("ts") + (stepSec - 1)) / lit(stepSec)).cast("long") * stepSec
    val lastEval =
      floor((col("ts") + (rangeSec - 1)) / lit(stepSec)).cast("long") * stepSec
    val gridStart = Math.floorDiv(start0 + stepSec - 1, stepSec) * stepSec
    val gridEnd = Math.floorDiv(end0, stepSec) * stepSec
    val keys = byLabels.map(l => col("labels").getItem(l).as(l)) :+
      col("eval_ts")
    queryRange(metric, matchers, start0 - rangeSec + 1, end0)
      .withColumn("v", col("value").cast("decimal(18,2)"))
      .withColumn("prev", lag("v", 1).over(w))
      .withColumn("delta",
        when(col("prev").isNull, lit(null))
          .when(col("v") >= col("prev"), col("v") - col("prev"))
          .otherwise(col("v")))
      .where(col("delta").isNotNull)
      .withColumn("e0", greatest(firstEval, lit(gridStart)))
      .withColumn("e1", least(lastEval, lit(gridEnd)))
      .where(col("e0") <= col("e1"))
      .withColumn("eval_ts",
        explode(sequence(col("e0"), col("e1"), lit(stepSec))))
      .withColumn("eval_ts", col("eval_ts") + offsetSec)
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("delta")).cast("double").as("increase"),
        // tie-free 6-decimal quantization (floor(x*1e6+0.5)/1e6): the
        // same IEEE op sequence in Spark, DuckDB, and the streaming
        // twin — Spark round() is BigDecimal HALF_UP while DuckDB
        // round() is float half-away, and they diverge on exact-.5
        // products (one real sf0.01 row at the 6h window width)
        (floor(sum(col("delta")).cast("double") / rangeSec * 1e6 + 0.5)
          / 1e6).as("rate_per_sec"))
  }

  /** Sliding cross-series MOMENTS of the per-series counter rate on the
    * subquery eval grid — `avg/min/max/count by (l)(rate(x[rangeSec]))`
    * evaluated every `stepSec`, the moment-aggregated inner of a nested
    * subquery ([[slidingIncreaseBy]] is the `sum` member; avg/min/max of
    * per-series rates are NOT delta sums, so they need the per-series
    * leg materialized). Three stages by nature: the per-sample decimal
    * lag (shuffle on sid), the per-(sid, eval point) increase sum after
    * the grid explode, then the cross-series moment aggregation at the
    * `byLabels` grain. The per-series value is the [[slidingIncreaseBy]]
    * quantity exactly — `round(sum(delta)/rangeSec, 6)` for rate, the
    * raw delta sum for increase — and the avg divides the exact
    * decimal(28,10) sum by the exact series count, the engine's shared
    * op order, so DuckDB mirrors are hash-exact. A series contributes to
    * an eval point only when it has ≥ 1 delta in the lookback window,
    * the same membership rule as the sum form. */
  def slidingMomentIncreaseBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      rangeSec: Long,
      offsetSec: Long = 0L,
      rate: Boolean = true,
      quantile: Option[Double] = None): DataFrame = {
    require(rangeSec > 0 && stepSec > 0, "rangeSec and stepSec must be > 0")
    require(offsetSec >= 0, s"offset must be >= 0: $offsetSec")
    val start0 = start - offsetSec
    val end0 = end - offsetSec
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("sid").orderBy(col("ts"), col("value"))
    val firstEval =
      floor((col("ts") + (stepSec - 1)) / lit(stepSec)).cast("long") * stepSec
    val lastEval =
      floor((col("ts") + (rangeSec - 1)) / lit(stepSec)).cast("long") * stepSec
    val gridStart = Math.floorDiv(start0 + stepSec - 1, stepSec) * stepSec
    val gridEnd = Math.floorDiv(end0, stepSec) * stepSec
    val keys = byLabels.map(l => col("labels").getItem(l).as(l)) :+
      col("eval_ts")
    val perSeriesVal =
      // the slidingIncreaseBy tie-free floor quantization — one
      // cross-engine rounding contract for the whole sliding family
      if (rate)
        floor(sum(col("delta")).cast("double") / rangeSec * 1e6 + 0.5) / 1e6
      else sum(col("delta")).cast("double")
    val perSeries = queryRange(metric, matchers, start0 - rangeSec + 1, end0)
      .withColumn("v", col("value").cast("decimal(18,2)"))
      .withColumn("prev", lag("v", 1).over(w))
      .withColumn("delta",
        when(col("prev").isNull, lit(null))
          .when(col("v") >= col("prev"), col("v") - col("prev"))
          .otherwise(col("v")))
      .where(col("delta").isNotNull)
      .withColumn("e0", greatest(firstEval, lit(gridStart)))
      .withColumn("e1", least(lastEval, lit(gridEnd)))
      .where(col("e0") <= col("e1"))
      .withColumn("eval_ts",
        explode(sequence(col("e0"), col("e1"), lit(stepSec))))
      .withColumn("eval_ts", col("eval_ts") + offsetSec)
      .groupBy((col("sid") +: keys): _*)
      .agg(perSeriesVal.as("v_s"))
      // cross-series spread via the integer-micro exactness scheme: the
      // per-series value is quantized (round(…,6) rate / 2-decimal
      // increase), so micro sums are lossless; the tie-free
      // floor(x*1e6+0.5)/1e6 rounding below is the same IEEE op
      // sequence the DuckDB mirror runs (see overTimeOnFrame's spread)
      .withColumn("__m", round(col("v_s") * 1e6).cast("long"))
    val aggs = Seq(
      count(lit(1)).as("n_series"),
      sum(col("v_s").cast("decimal(28,10)")).cast("double").as("sum_v"),
      // 6-decimal quantized (tie-free floor) like the gauge twin — the
      // mean of per-series rates re-enters the integer-micro family, so
      // spread/counter outers over `avg by (l)(rate(...))` inners stay
      // lossless; min/max/quantile of the round(…,6) rates already are
      (floor(sum(col("v_s").cast("decimal(28,10)")).cast("double") /
        count(lit(1)) * 1e6 + 0.5) / 1e6).as("avg_v"),
      min(col("v_s")).as("min_v"),
      max(col("v_s")).as("max_v"),
      sum(col("__m")).as("__sum_m"),
      sum((col("__m").cast("decimal(19,0)") *
        col("__m").cast("decimal(19,0)"))).as("__sum2_m")) ++
      // cross-series quantile of the per-series rate — the SLO family
      // as a subquery inner (exact linear-interpolation Percentile,
      // the quantileIncreaseBy scheme)
      quantile.map(qv =>
        round(percentile(col("v_s"), lit(qv)), 6).as("q_v"))
    val nD = col("n_series").cast("double")
    val meanM = col("__sum_m").cast("double") / nD
    val stdvar =
      (col("__sum2_m").cast("double") / nD - meanM * meanM) / 1e12
    def r6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5) / 1e6
    perSeries
      .groupBy((byLabels.map(col) :+ col("eval_ts")): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("stdvar_v", r6(stdvar))
      .withColumn("stddev_v", r6(sqrt(stdvar)))
      .drop("__sum_m", "__sum2_m")
  }

  /** Sliding least-squares trend on the subquery eval grid —
    * `deriv(metric[rangeSec:stepSec])` and
    * `predict_linear(metric[rangeSec:stepSec], horizonSec)`: at each
    * eval point E (every `stepSec`) the raw samples in the lookback
    * window `(E−rangeSec, E]` get one exact simple linear regression.
    * The [[predictLinear]] integer-cents scheme made sliding: x is
    * re-origined to the WINDOW start (`ts − (E − rangeSec)` ∈ [1,
    * rangeSec], so the decimal sums stay small), y is integer cents,
    * and every Σ accumulates in decimal(20,0)/decimal(38,0) — the
    * final slope/predicted values are ONE double division of two
    * exactly-computed integers, the same IEEE op on both engines.
    * `predicted` extrapolates `horizonSec` past each eval point
    * (xp = rangeSec + horizonSec, constant). One sample explode + ONE
    * hash aggregation — the [[slidingIncreaseBy]] plan shape; windows
    * with < 2 distinct timestamps (den = 0) emit nothing, the
    * [[predictLinear]] guard.
    */
  def slidingPredictLinear(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      rangeSec: Long,
      horizonSec: Long,
      offsetSec: Long = 0L): DataFrame = {
    require(rangeSec > 0 && stepSec > 0, "rangeSec and stepSec must be > 0")
    require(offsetSec >= 0, s"offset must be >= 0: $offsetSec")
    val dec = "decimal(20,0)"
    val (windowed, keys) = overTimeWindowed(metric, matchers, start, end,
      byLabels, stepSec, rangeSec, offsetSec)
    val xp = lit(rangeSec + horizonSec).cast(dec)
    windowed
      // eval_ts already carries +offset; the window's pre-offset start
      // is (eval_ts − offset) − rangeSec, so x ∈ [1, rangeSec]
      .withColumn("x",
        (col("ts") - (col("eval_ts") - lit(offsetSec) - lit(rangeSec)))
          .cast(dec))
      .withColumn("yc",
        (col("value").cast("decimal(18,2)") * 100).cast(dec))
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).cast(dec).as("n"),
        sum(col("x")).as("sx"),
        sum(col("yc")).as("syc"),
        sum(col("x") * col("yc")).as("sxyc"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("numc", col("n") * col("sxyc") - col("sx") * col("syc"))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      .where(col("n") >= 2 && col("den") =!= 0)
      .withColumn("slope_per_sec",
        col("numc").cast("double") / col("den").cast("double") / 100.0)
      .withColumn("predicted",
        (col("syc") * col("den") +
          col("numc") * (col("n") * xp - col("sx"))).cast("double") /
          (col("n") * col("den")).cast("double") / 100.0)
      .select(byLabels.map(col) ++ Seq(col("eval_ts"),
        col("n").cast("long").as("n"),
        col("slope_per_sec"), col("predicted")): _*)
  }

  /** Sliding `resets` / `changes` on the subquery eval grid —
    * `resets(metric[rangeSec:stepSec])` counts per-series counter drops
    * (and `changes` any consecutive-sample value change), summed across
    * series per (label group, eval point), a value every `stepSec` over
    * the trailing `rangeSec`. Per-sample lag pairs are computed ONCE per
    * series (the [[aggregateIncreaseBy]] decimal lag), then each pair
    * explodes to the eval points whose lookback window covers its ts —
    * the [[slidingIncreaseBy]] delta-attribution rule, so the whole
    * sliding counter family shares one windowing convention and one
    * oracle scheme. Returns both counts; callers project.
    */
  def slidingResetsChangesBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      rangeSec: Long,
      offsetSec: Long = 0L): DataFrame = {
    require(rangeSec > 0 && stepSec > 0, "rangeSec and stepSec must be > 0")
    require(offsetSec >= 0, s"offset must be >= 0: $offsetSec")
    val start0 = start - offsetSec
    val end0 = end - offsetSec
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("sid").orderBy(col("ts"), col("value"))
    val firstEval =
      floor((col("ts") + (stepSec - 1)) / lit(stepSec)).cast("long") * stepSec
    val lastEval =
      floor((col("ts") + (rangeSec - 1)) / lit(stepSec)).cast("long") * stepSec
    val gridStart = Math.floorDiv(start0 + stepSec - 1, stepSec) * stepSec
    val gridEnd = Math.floorDiv(end0, stepSec) * stepSec
    val keys = byLabels.map(l => col("labels").getItem(l).as(l)) :+
      col("eval_ts")
    queryRange(metric, matchers, start0 - rangeSec + 1, end0)
      .withColumn("v", col("value").cast("decimal(18,2)"))
      .withColumn("prev", lag("v", 1).over(w))
      .where(col("prev").isNotNull)
      .withColumn("e0", greatest(firstEval, lit(gridStart)))
      .withColumn("e1", least(lastEval, lit(gridEnd)))
      .where(col("e0") <= col("e1"))
      .withColumn("eval_ts",
        explode(sequence(col("e0"), col("e1"), lit(stepSec))))
      .withColumn("eval_ts", col("eval_ts") + offsetSec)
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_deltas"),
        sum(when(col("v") < col("prev"), 1L).otherwise(0L)).as("resets"),
        sum(when(col("v") =!= col("prev"), 1L).otherwise(0L)).as("changes"))
  }

  /** Sliding gauge `delta` on the subquery eval grid —
    * `delta(metric[rangeSec:stepSec])`: last − first sample value in
    * each trailing window, per label group every `stepSec` (the
    * [[deltaBy]] struct-ordered endpoints over the [[overTimeWindowed]]
    * explode; decimal until the final cast).
    */
  def slidingDeltaBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      rangeSec: Long,
      offsetSec: Long = 0L): DataFrame = {
    require(rangeSec > 0 && stepSec > 0, "rangeSec and stepSec must be > 0")
    require(offsetSec >= 0, s"offset must be >= 0: $offsetSec")
    val (windowed, keys) = overTimeWindowed(metric, matchers, start, end,
      byLabels, stepSec, rangeSec, offsetSec)
    windowed
      .withColumn("v", col("value").cast("decimal(18,2)"))
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n"),
        (max(struct(col("ts"), col("v"))).getField("v") -
          min(struct(col("ts"), col("v"))).getField("v"))
          .cast("double").as("delta"))
  }

  /** Sliding `idelta` / `irate` on the subquery eval grid — the
    * [[instantDeltaBy]] last-two-samples pair evaluated over the
    * trailing `rangeSec` window every `stepSec`: per series per eval
    * point, the difference between the two newest samples in the window
    * (idelta), and the reset-aware rate over their timestamp gap
    * (irate). Rank window at (sid, eval point) grain over the
    * [[overTimeWindowed]] explode — state bounded by one window's
    * sample count; windows holding < 2 samples emit nothing.
    */
  def slidingInstantDeltaBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      rangeSec: Long,
      offsetSec: Long = 0L): DataFrame = {
    require(rangeSec > 0 && stepSec > 0, "rangeSec and stepSec must be > 0")
    require(offsetSec >= 0, s"offset must be >= 0: $offsetSec")
    val (windowed, _) = overTimeWindowed(metric, matchers, start, end,
      byLabels, stepSec, rangeSec, offsetSec)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("sid"), col("eval_ts"))
      .orderBy(col("ts").desc, col("v").desc)
    windowed
      .withColumn("v", col("value").cast("decimal(18,2)"))
      .withColumn("rk", row_number().over(w))
      .withColumn("prev_ts", lead("ts", 1).over(w))
      .withColumn("prev_v", lead("v", 1).over(w))
      .where(col("rk") === 1 && col("prev_ts").isNotNull)
      .withColumn("dt", col("ts") - col("prev_ts"))
      .withColumn("idelta", (col("v") - col("prev_v")).cast("double"))
      .withColumn("irate",
        when(col("dt") > 0, round(
          when(col("v") >= col("prev_v"), col("v") - col("prev_v"))
            .otherwise(col("v")).cast("double") /
            col("dt").cast("double"), 6)))
      .select((byLabels.map(l => col("labels").getItem(l).as(l)) ++
        Seq(col("sid"), col("eval_ts"), col("dt"), col("idelta"),
          col("irate"))): _*)
  }

  /** `avg/min/max/count by (labels) (increase(metric[step]))` — the
    * cross-series MOMENTS of the per-series reset-robust increase
    * ([[aggregateIncreaseBy]] is the `sum by` member of this family;
    * its `increase` equals this output's `sum_increase`, cross-checked
    * in tests). Prometheus's `avg(rate(...))` dashboard family.
    *
    * Three stages by nature: the per-series lag window (shuffle on
    * sid), a per-(series, bucket) increase aggregation, then the
    * cross-series moment aggregation — each increase stays DECIMAL
    * until the final cast, and the avg divides the exact double sum by
    * the exact series count in the engines' shared op order. Series
    * contribute to a bucket only when they have ≥ 1 delta in it, same
    * membership rule as the sum form.
    */
  def momentIncreaseBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      offsetSec: Long = 0L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("sid").orderBy(col("ts"), col("value"))
    val keys = byLabels.map(l => col("labels").getItem(l).as(l)) :+
      ((col("ts") - pmod(col("ts"), lit(stepSec))) + offsetSec)
        .as("bucket_start")
    val perSeries = queryRange(metric, matchers, start - offsetSec,
        end - offsetSec)
      .withColumn("v", col("value").cast("decimal(18,2)"))
      .withColumn("prev", lag("v", 1).over(w))
      .withColumn("delta",
        when(col("prev").isNull, lit(null))
          .when(col("v") >= col("prev"), col("v") - col("prev"))
          .otherwise(col("v")))
      .where(col("delta").isNotNull)
      .groupBy((col("sid") +: keys): _*)
      .agg(sum(col("delta")).as("inc_dec"))
    perSeries
      .groupBy((byLabels.map(col) :+ col("bucket_start")): _*)
      .agg(
        count(lit(1)).as("n_series"),
        sum(col("inc_dec")).cast("double").as("sum_increase"),
        (sum(col("inc_dec")).cast("double") / count(lit(1)))
          .as("avg_increase"),
        min(col("inc_dec")).cast("double").as("min_increase"),
        max(col("inc_dec")).cast("double").as("max_increase"))
  }

  /** `quantile by (labels) (q, rate(metric[step]))` — the SLO family:
    * the cross-series q-QUANTILE of the per-series reset-robust
    * increase/rate ([[momentIncreaseBy]]'s percentile sibling). Same
    * two-stage shape: per-series lag window + per-(series, bucket)
    * increase, then ONE percentile aggregation across series —
    * `percentile` is a partial-merge aggregate like any sum, so
    * map-side combine applies and no per-bucket sort job runs. The
    * quantile is continuous-interpolation on the double-cast increase,
    * rounded to 6 decimals (the engines' shared `q_v` contract); the
    * rate column divides the SAME percentile by the step — quantile is
    * monotone, so quantile(rate) == quantile(increase)/step exactly.
    */
  def quantileIncreaseBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      q: Double,
      offsetSec: Long = 0L): DataFrame = {
    require(q >= 0 && q <= 1, s"quantile must be in [0,1]: $q")
    require(offsetSec >= 0, s"offset must be >= 0: $offsetSec")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("sid").orderBy(col("ts"), col("value"))
    val keys = byLabels.map(l => col("labels").getItem(l).as(l)) :+
      ((col("ts") - pmod(col("ts"), lit(stepSec))) + offsetSec)
        .as("bucket_start")
    queryRange(metric, matchers, start - offsetSec, end - offsetSec)
      .withColumn("v", col("value").cast("decimal(18,2)"))
      .withColumn("prev", lag("v", 1).over(w))
      .withColumn("delta",
        when(col("prev").isNull, lit(null))
          .when(col("v") >= col("prev"), col("v") - col("prev"))
          .otherwise(col("v")))
      .where(col("delta").isNotNull)
      .groupBy((col("sid") +: keys): _*)
      .agg(sum(col("delta")).cast("double").as("inc"))
      .groupBy((byLabels.map(col) :+ col("bucket_start")): _*)
      .agg(
        count(lit(1)).as("n_series"),
        round(percentile(col("inc"), lit(q)), 6).as("q_increase"),
        round(percentile(col("inc"), lit(q)) / stepSec, 6).as("q_rate"))
  }

  /** Materialize a per-(sid, step-bucket) rollup store — the continuous
    * downsampling tier (Thanos/M3-style) that serves coarse-range queries
    * without touching raw samples. Partial aggregates (count, exact
    * DECIMAL sum, min, max) are associative, so any label-dimension
    * aggregation over the rollup merges to EXACTLY the raw-data answer
    * for bucket-aligned windows. One hash aggregation over the full store,
    * written seg-partitioned and (sid, bucket)-sorted like the fact table;
    * at 100 TB this runs once per step tier as a maintenance job and cuts
    * served-query input by the points-per-bucket factor.
    */
  def materializeRollup(stepSec: Long): String = {
    require(stepSec > 0 && conf.segmentDuration % stepSec == 0,
      s"stepSec must divide segmentDuration: $stepSec vs ${conf.segmentDuration}")
    val path = s"${conf.dataPath}/rollup_$stepSec"
    samples
      .withColumn("bucket_start", col("ts") - pmod(col("ts"), lit(stepSec)))
      .groupBy("sid", "bucket_start")
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sum_dec"),
        min("value").as("min_v"),
        max("value").as("max_v"))
      .withColumn("seg", segOf(col("bucket_start"), conf.segmentDuration))
      .repartition(col("seg"))
      .sortWithinPartitions("sid", "bucket_start")
      .write.mode("overwrite")
      .option("compression", conf.compression)
      .partitionBy("seg")
      .parquet(path)
    // the overwrite dropped any _batch_committed markers with the old
    // files; record the rebuild so a later incremental append (whose
    // batches this rebuild may already cover) can warn about the
    // double-count it would cause
    writeModeMarker(path, "rebuild")
    path
  }

  /** Append one batch's per-(sid, bucket) partials to the rollup store —
    * the incremental maintenance form of [[materializeRollup]] (what a
    * streaming pipeline runs per micro-batch instead of periodic full
    * rebuilds). Correct by associativity: [[aggregateByFromRollup]] merges
    * ALL partial rows per (labels, bucket), so duplicate (sid, bucket)
    * entries from different batches combine to exactly the full-rebuild
    * totals. Also upserts the series dimension (append + merge-on-read,
    * same as the raw write path) so rollup-only stores still resolve
    * labels.
    *
    * Pick ONE maintenance mode per (store, step) tier: incremental
    * appends of every batch, OR periodic [[materializeRollup]] rebuilds.
    * Appending batches that a later full rebuild also covers would
    * double-count (a rebuild does reset the tier — `mode(overwrite)` —
    * so rebuild-after-appends is safe; appends-after-rebuild of the same
    * data are not). The tier records its last maintenance mode in a
    * `_maintenance_mode` marker; appending to a tier last written by a
    * full rebuild logs a loud warning, since nothing at read time can
    * detect the resulting double-count.
    *
    * @param batchId when set (the streaming path passes its micro-batch
    *   id), the append is EXACTLY-ONCE: partials are staged to a temp
    *   dir, promoted into the tier under batchId-prefixed file names
    *   (re-promotion after a mid-copy crash first clears that prefix),
    *   and a `_batch_committed/<id>` marker makes any replayed batch a
    *   no-op — `foreachBatch` is at-least-once, and a non-idempotent
    *   append would over-count every sum served from the rollup.
    */
  def appendRollupPartials(
      batch: DataFrame,
      stepSec: Long,
      batchId: Option[Long] = None): Unit = {
    require(stepSec > 0 && conf.segmentDuration % stepSec == 0,
      s"stepSec must divide segmentDuration: $stepSec vs ${conf.segmentDuration}")
    val path = s"${conf.dataPath}/rollup_$stepSec"
    val committed = batchId.map(id =>
      new org.apache.hadoop.fs.Path(s"$path/_batch_committed/$id"))
    if (committed.exists(fs.exists)) return // replayed micro-batch: no-op
    if (readModeMarker(path).contains("rebuild"))
      logWarning(
        s"appendRollupPartials on $path last written by a full rebuild: " +
          "appending batches the rebuild already covered double-counts")
    val norm = normalize(batch).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val partials = norm
        .withColumn("bucket_start", col("ts") - pmod(col("ts"), lit(stepSec)))
        .groupBy("sid", "bucket_start")
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("sum_dec"),
          min("value").as("min_v"),
          max("value").as("max_v"))
        .withColumn("seg", segOf(col("bucket_start"), conf.segmentDuration))
        .repartition(col("seg"))
      batchId match {
        case None =>
          partials
            .write.mode("append")
            .option("compression", conf.compression)
            .partitionBy("seg")
            .parquet(path)
        case Some(id) =>
          val tmp = s"${conf.dataPath}/.rollup_stage_${stepSec}_$id"
          partials
            .write.mode("overwrite")
            .option("compression", conf.compression)
            .partitionBy("seg")
            .parquet(tmp)
          promoteStagedFiles(tmp, path, s"b$id-")
      }
      writeModeMarker(path, "incremental")
      appendSeriesMeta(norm)
      appendLabelValues(norm)
      // the commit marker is written LAST — after the series-meta append —
      // so a crash in between replays the whole batch: re-promotion clears
      // the batch-prefixed files first and meta duplicates are idempotent
      // under the min/max merge, whereas a marker written before the meta
      // append would make the replay a no-op and leave the batch's sids
      // invisible to aggregateByFromRollup's sid semi-join forever
      committed.foreach { m =>
        fs.mkdirs(m.getParent)
        fs.create(m, true).close()
      }
    } finally norm.unpersist()
  }

  /** Move every staged data file under `tmp/seg=*` into the live tier as
    * `<prefix><name>` — single-file renames, no directory swaps, so
    * concurrent readers never see a vanishing partition. A half-promoted
    * previous attempt is made safe by first deleting live files carrying
    * the same batch prefix (deterministic names make the cleanup exact).
    */
  private def promoteStagedFiles(
      tmp: String, live: String, prefix: String): Unit = {
    val tmpBase = new org.apache.hadoop.fs.Path(tmp)
    fs.listStatus(tmpBase)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("seg="))
      .foreach { segDir =>
        val liveSeg = new org.apache.hadoop.fs.Path(live, segDir.getPath.getName)
        fs.mkdirs(liveSeg)
        fs.listStatus(liveSeg)
          .filter(_.getPath.getName.startsWith(prefix))
          .foreach(st => fs.delete(st.getPath, false))
        fs.listStatus(segDir.getPath)
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
          .foreach { st =>
            val dst = new org.apache.hadoop.fs.Path(
              liveSeg, prefix + st.getPath.getName)
            if (!fs.rename(st.getPath, dst))
              sys.error(s"promote: rename ${st.getPath} -> $dst failed")
          }
      }
    fs.delete(tmpBase, true)
  }

  /** Last maintenance mode recorded for a rollup tier
    * (`incremental` | `rebuild`), if any.
    */
  private def readModeMarker(path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_maintenance_mode")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        if (n <= 0) None else Some(new String(buf, 0, n, "UTF-8").trim)
      } finally in.close()
    }
  }

  private def writeModeMarker(path: String, mode: String): Unit = {
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$path/_maintenance_mode"), true)
    try out.write(mode.getBytes("UTF-8"))
    finally out.close()
  }

  /** [[aggregateBy]] served from a materialized rollup instead of raw
    * samples: merge the per-series partials per (label subset, bucket).
    * Requires a bucket-aligned window (`start` on a bucket boundary,
    * `end` the last second of a bucket) — then the result is
    * value-identical to [[aggregateBy]] on raw data, because DECIMAL sums
    * and count/min/max merge associatively. The rollup scan is pruned by
    * `seg` and `bucket_start`; labels come from the broadcast series
    * dimension exactly like the raw path.
    */
  def aggregateByFromRollup(
      stepSec: Long,
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      offsetSec: Long = 0L): DataFrame = {
    require(start % stepSec == 0 && (end + 1) % stepSec == 0,
      s"window [$start, $end] must be aligned to $stepSec-second buckets")
    // the rollup tier is bucket-aligned, so only a bucket-MULTIPLE
    // offset can be served exactly (day-over-day on an hourly tier);
    // anything else must go to the raw path — loud, never approximate
    require(offsetSec >= 0 && offsetSec % stepSec == 0,
      s"a rollup-served offset must be a multiple of the $stepSec-second " +
      s"bucket to be exact: $offsetSec")
    val start0 = start - offsetSec
    val end0 = end - offsetSec
    val roll = spark.read.parquet(s"${conf.dataPath}/rollup_$stepSec")
      .where(segPredicate(start0, end0))
      .where(col("bucket_start").between(start0, end0))
    val matching = seriesMeta
      .where(matcherPredicate(col("labels"),
        LabelMatcher.eq(MetricLabel, metric) +: matchers))
      .select("sid", "labels")
    val keys = byLabels.map(l => col("labels").getItem(l).as(l)) :+
      (col("bucket_start") + offsetSec).as("bucket_start")
    roll
      .join(dimHint(matching), "sid")
      .groupBy(keys: _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_dec")).cast("double").as("sum_v"),
        (sum(col("sum_dec")).cast("double") / sum(col("n"))).as("avg_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }

  /** PromQL binary operation between two aggregated vectors with label
    * matching: `op(sum by (labels)(metricA[step]), sum by (labels)
    * (metricB[step]))` joined `on (labels, bucket)` — the
    * `errors / requests` family. Both sides are one-shuffle label
    * aggregations; the vector match is an equi-join on the (small)
    * aggregated tables. `op` receives the two decimal-accumulated sums
    * (cast to double) so ratio/difference arithmetic is reproducible.
    * Inner-join semantics: buckets present on only one side are dropped,
    * like PromQL's default vector matching.
    *
    * Each side carries ITS OWN matcher list (`errors{code="500"} /
    * requests` filters only the numerator — applying the union of both
    * sides' matchers to both metrics would silently produce wrong
    * ratios). `momentA`/`momentB` pick which aggregated moment each side
    * contributes (`sum_v` by default; any of `sum_v avg_v min_v max_v
    * n`), enabling non-sum vector matches like `max / avg`; the matched
    * values still surface as `sum_a`/`sum_b` for schema stability.
    */
  def binaryOpBy(
      metricA: String,
      metricB: String,
      matchersA: Seq[LabelMatcher],
      matchersB: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      momentA: String = "sum_v",
      momentB: String = "sum_v",
      offsetA: Long = 0L,
      offsetB: Long = 0L)(
      op: (Column, Column) => Column): DataFrame = {
    val a = aggregateBy(metricA, matchersA, start, end, byLabels, stepSec,
        offsetA)
      .select(byLabels.map(col) ++ Seq(col("bucket_start"),
        col("n").as("n_a"), col(momentA).as("sum_a")): _*)
    val b = aggregateBy(metricB, matchersB, start, end, byLabels, stepSec,
        offsetB)
      .select(byLabels.map(col) ++ Seq(col("bucket_start"),
        col("n").as("n_b"), col(momentB).as("sum_b")): _*)
    Tsdb.nullSafeEquiJoin(a, b, byLabels :+ "bucket_start")
      .withColumn("result", op(col("sum_a"), col("sum_b")))
  }

  /** [[binaryOpBy]] served from a materialized rollup tier instead of
    * raw samples — the dashboard ratio family (`errors / requests`) at
    * downsampled cost. Both sides are [[aggregateByFromRollup]] merges
    * (DECIMAL-exact by associativity), so for bucket-aligned windows the
    * result is value-identical to the raw-data [[binaryOpBy]] — it
    * shares the same oracle. The vector match joins two already-merged
    * bucket tables, input sized groups × buckets, never the raw store.
    */
  def binaryOpByFromRollup(
      stepSec: Long,
      metricA: String,
      metricB: String,
      matchersA: Seq[LabelMatcher],
      matchersB: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      offsetA: Long = 0L,
      offsetB: Long = 0L)(
      op: (Column, Column) => Column): DataFrame = {
    val a = aggregateByFromRollup(stepSec, metricA, matchersA, start, end,
        byLabels, offsetA)
      .select(byLabels.map(col) ++ Seq(col("bucket_start"),
        col("n").as("n_a"), col("sum_v").as("sum_a")): _*)
    val b = aggregateByFromRollup(stepSec, metricB, matchersB, start, end,
        byLabels, offsetB)
      .select(byLabels.map(col) ++ Seq(col("bucket_start"),
        col("n").as("n_b"), col("sum_v").as("sum_b")): _*)
    Tsdb.nullSafeEquiJoin(a, b, byLabels :+ "bucket_start")
      .withColumn("result", op(col("sum_a"), col("sum_b")))
  }

  /** PromQL one-to-many vector matching —
    * `A / on (matchLabels) group_left B`: the left side aggregates at a
    * FINER label grain than the right (`byB` ⊆ `byA`), each left group
    * joins the one right group sharing its match labels, and the result
    * keeps the left side's full label set. The share-of-total /
    * per-user-vs-cohort family every capacity dashboard needs.
    *
    * Plan: two one-shuffle aggregations joined on (matchLabels, bucket) —
    * the join inputs are group-sized, never corpus-sized, and the coarser
    * side broadcasts under AQE when small. Same vector-match shape as
    * [[binaryOpBy]], different grain.
    */
  def binaryOpByGroupLeft(
      metricA: String,
      metricB: String,
      matchersA: Seq[LabelMatcher],
      matchersB: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byA: Seq[String],
      byB: Seq[String],
      stepSec: Long,
      offsetA: Long = 0L,
      offsetB: Long = 0L,
      momentA: String = "sum_v",
      momentB: String = "sum_v",
      onLabels: Seq[String] = Seq.empty)(
      op: (Column, Column) => Column): DataFrame = {
    // default (no explicit on-labels): the right side's full grouping is
    // the match key — the pre-carry behavior. With `onLabels`, the right
    // side's EXTRA grouping labels (byB minus on) are CARRIED onto the
    // result — PromQL's `group_left(extra)` — and a per-(on, bucket)
    // uniqueness guard raises at execution if the "one" side is not one
    // (Prometheus's many-to-many matching error, surfaced instead of a
    // silent row multiplication).
    val on = if (onLabels.isEmpty) byB else onLabels
    val carry = byB.filterNot(on.contains)
    require(on.forall(byA.contains),
      s"group_left needs the match labels ($on) to be a subset " +
      s"of the left side's ($byA)")
    require(on.forall(byB.contains),
      s"group_left match labels ($on) must be part of the right side's " +
      s"grouping ($byB)")
    require(carry.forall(c => !byA.contains(c)),
      s"group_left carried labels (${carry.filter(byA.contains)}) " +
      "already appear in the left side's grouping — drop them from one " +
      "side (the join would produce ambiguous columns)")
    val a = aggregateBy(metricA, matchersA, start, end, byA, stepSec,
        offsetA)
      .select(byA.map(col) ++ Seq(col("bucket_start"),
        col("n").as("n_a"), col(momentA).as("sum_a")): _*)
    val b0 = aggregateBy(metricB, matchersB, start, end, byB, stepSec,
        offsetB)
      .select(byB.map(col) ++ Seq(col("bucket_start"),
        col("n").as("n_b"), col(momentB).as("sum_b")): _*)
    val b =
      if (carry.isEmpty) b0
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy((on :+ "bucket_start").map(col): _*)
        b0.withColumn("sum_b",
          when(count(lit(1)).over(w) > 1,
            raise_error(concat(
              lit("group_left: more than one right-side row for match " +
                "group ("),
              concat_ws(",", on.map(col): _*), lit(")"))))
            .otherwise(col("sum_b")))
      }
    Tsdb.nullSafeEquiJoin(a, b, on :+ "bucket_start")
      .withColumn("result", op(col("sum_a"), col("sum_b")))
      .select(byA.map(col) ++ carry.map(col) ++
        Seq(col("bucket_start"), col("n_a"),
          col("n_b"), col("sum_a"), col("sum_b"), col("result")): _*)
  }

  /** PromQL many-to-one vector matching — `A / on (matchLabels)
    * group_right B`: the mirror of [[binaryOpByGroupLeft]]. Here the
    * RIGHT side carries the finer label grain (`byA` ⊆ `byB`); each
    * right group joins the one left group sharing its match labels, and
    * the result keeps the right side's full label set. Same group-sized
    * join-input shape; `op` still receives (left value, right value) in
    * query order, so `coarse / fine` means what the query string says.
    */
  def binaryOpByGroupRight(
      metricA: String,
      metricB: String,
      matchersA: Seq[LabelMatcher],
      matchersB: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byA: Seq[String],
      byB: Seq[String],
      stepSec: Long,
      offsetA: Long = 0L,
      offsetB: Long = 0L,
      momentA: String = "sum_v",
      momentB: String = "sum_v",
      onLabels: Seq[String] = Seq.empty)(
      op: (Column, Column) => Column): DataFrame = {
    // mirror of [[binaryOpByGroupLeft]]'s carry: with `onLabels`, the
    // LEFT side's extra grouping labels ride onto the result
    // (`group_right(extra)`), with the same one-row-per-match guard
    val on = if (onLabels.isEmpty) byA else onLabels
    val carry = byA.filterNot(on.contains)
    require(on.forall(byB.contains),
      s"group_right needs the match labels ($on) to be a subset " +
      s"of the right side's ($byB)")
    require(on.forall(byA.contains),
      s"group_right match labels ($on) must be part of the left side's " +
      s"grouping ($byA)")
    require(carry.forall(c => !byB.contains(c)),
      s"group_right carried labels (${carry.filter(byB.contains)}) " +
      "already appear in the right side's grouping — drop them from one " +
      "side (the join would produce ambiguous columns)")
    val a0 = aggregateBy(metricA, matchersA, start, end, byA, stepSec,
        offsetA)
      .select(byA.map(col) ++ Seq(col("bucket_start"),
        col("n").as("n_a"), col(momentA).as("sum_a")): _*)
    val a =
      if (carry.isEmpty) a0
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy((on :+ "bucket_start").map(col): _*)
        a0.withColumn("sum_a",
          when(count(lit(1)).over(w) > 1,
            raise_error(concat(
              lit("group_right: more than one left-side row for match " +
                "group ("),
              concat_ws(",", on.map(col): _*), lit(")"))))
            .otherwise(col("sum_a")))
      }
    val b = aggregateBy(metricB, matchersB, start, end, byB, stepSec,
        offsetB)
      .select(byB.map(col) ++ Seq(col("bucket_start"),
        col("n").as("n_b"), col(momentB).as("sum_b")): _*)
    Tsdb.nullSafeEquiJoin(b, a, on :+ "bucket_start")
      .withColumn("result", op(col("sum_a"), col("sum_b")))
      .select(byB.map(col) ++ carry.map(col) ++
        Seq(col("bucket_start"), col("n_a"),
          col("n_b"), col("sum_a"), col("sum_b"), col("result")): _*)
  }

  /** PromQL vector set operations — `A and B` / `A or B` / `A unless B`
    * between two aggregated vectors on the same label grain. The match
    * key is (byLabels, bucket_start), PromQL's label-set identity on the
    * engine's bucket grid:
    *
    *  - `and`:    rows of A whose key exists in B       (left-semi join)
    *  - `unless`: rows of A whose key does NOT exist     (left-anti join)
    *  - `or`:     all of A, plus rows of B whose key is absent from A
    *
    * Everything stays group-sized: two one-shuffle aggregations and one
    * equi-join on the aggregated tables (the `or` union adds B's anti
    * rows by name, no extra shuffle). A-side values win on overlap,
    * exactly Prometheus's `or` preference for the left operand.
    */
  def vectorSetOpBy(
      setOp: String,
      metricA: String,
      metricB: String,
      matchersA: Seq[LabelMatcher],
      matchersB: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      offsetA: Long = 0L,
      offsetB: Long = 0L): DataFrame = {
    val keys = byLabels :+ "bucket_start"
    val a = aggregateBy(metricA, matchersA, start, end, byLabels, stepSec,
      offsetA)
    val b = aggregateBy(metricB, matchersB, start, end, byLabels, stepSec,
      offsetB)
    setOp match {
      case "and" => Tsdb.nullSafeEquiJoin(
        a, b.select(keys.map(col): _*), keys, "left_semi")
      case "unless" => Tsdb.nullSafeEquiJoin(
        a, b.select(keys.map(col): _*), keys, "left_anti")
      case "or" =>
        a.unionByName(Tsdb.nullSafeEquiJoin(
          b, a.select(keys.map(col): _*), keys, "left_anti"))
      case other => throw new IllegalArgumentException(
        s"unknown vector set op: $other (expected and | or | unless)")
    }
  }

  /** PromQL `delta(gauge[step])` on the engine's bucket grid: LAST minus
    * FIRST sample value per (label subset, step bucket) — with the full
    * label-key set this is exactly per-series. First/last are selected
    * by struct-ordered min/max over (ts, value): one hash aggregation,
    * no window, no per-series sort job; the (ts, value) ordering makes
    * ties exact duplicates, so the endpoints are well-defined. Delta
    * arithmetic stays DECIMAL until the final cast. Buckets with a
    * single sample report delta 0 (the Prometheus one-point window).
    */
  def deltaBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      offsetSec: Long = 0L): DataFrame = {
    val keys = byLabels.map(l => col("labels").getItem(l).as(l)) :+
      ((col("ts") - pmod(col("ts"), lit(stepSec))) + offsetSec)
        .as("bucket_start")
    queryRange(metric, matchers, start - offsetSec, end - offsetSec)
      .withColumn("v", col("value").cast("decimal(18,2)"))
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n"),
        (max(struct(col("ts"), col("v"))).getField("v") -
          min(struct(col("ts"), col("v"))).getField("v"))
          .cast("double").as("delta"))
  }

  /** PromQL `sum by (labels) (resets(metric[step]))`: per-series counter
    * resets (a value drop between consecutive samples), summed across
    * series per (label subset, step bucket). Same two-stage shape as
    * [[aggregateIncreaseBy]]: the per-series lag window (shuffle on sid)
    * feeding one cross-series hash aggregation; the deterministic
    * (ts, value) lag order makes the reset count well-defined under ties.
    */
  def resetsBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      offsetSec: Long = 0L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("sid").orderBy(col("ts"), col("value"))
    val keys = byLabels.map(l => col("labels").getItem(l).as(l)) :+
      ((col("ts") - pmod(col("ts"), lit(stepSec))) + offsetSec)
        .as("bucket_start")
    queryRange(metric, matchers, start - offsetSec, end - offsetSec)
      .withColumn("v", col("value").cast("decimal(18,2)"))
      .withColumn("prev", lag("v", 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_deltas"),
        sum(when(col("v") < col("prev"), 1L).otherwise(0L)).as("resets"))
  }

  /** PromQL `sum by (labels) (changes(metric[step]))`: per-series count of
    * consecutive-sample VALUE CHANGES (any direction — [[resetsBy]] counts
    * only drops), summed across series per (label subset, step bucket).
    * Identical two-stage shape: per-series lag window on sid feeding one
    * cross-series hash aggregation; DECIMAL compare + the deterministic
    * (ts, value) lag order make the change count exact and tie-stable.
    */
  def changesBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      offsetSec: Long = 0L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("sid").orderBy(col("ts"), col("value"))
    val keys = byLabels.map(l => col("labels").getItem(l).as(l)) :+
      ((col("ts") - pmod(col("ts"), lit(stepSec))) + offsetSec)
        .as("bucket_start")
    queryRange(metric, matchers, start - offsetSec, end - offsetSec)
      .withColumn("v", col("value").cast("decimal(18,2)"))
      .withColumn("prev", lag("v", 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_deltas"),
        sum(when(col("v") =!= col("prev"), 1L).otherwise(0L)).as("changes"))
  }

  /** PromQL `idelta(metric[step])` / `irate(metric[step])` per series per
    * step bucket: the difference between the LAST TWO samples inside each
    * bucket (idelta), and irate — reset-aware like Prometheus (a drop
    * yields the new value) — divided by their timestamp gap. Buckets
    * holding fewer than two samples emit nothing; a zero timestamp gap
    * (duplicate scrape) yields a null irate rather than a division blowup.
    *
    * Scale shape: one rank window partitioned by (series, bucket) — state
    * per task bounded by a single bucket's sample count — then a
    * two-row-per-group self-pairing via lead(); the [[topKBy]] idiom.
    * The (ts, value) DESC order is deterministic: rows tying on both are
    * interchangeable duplicates, so the selected pair is well-defined,
    * and the identical ORDER BY mirrors 1:1 in the DuckDB oracle.
    */
  def instantDeltaBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      offsetSec: Long = 0L): DataFrame = {
    val byCols = byLabels.map(l => col("labels").getItem(l).as(l))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("sid"), col("bucket_start"))
      .orderBy(col("ts").desc, col("v").desc)
    queryRange(metric, matchers, start - offsetSec, end - offsetSec)
      .select((byCols ++ Seq(col("sid"), col("ts"),
        ((col("ts") - pmod(col("ts"), lit(stepSec))) + offsetSec)
        .as("bucket_start"),
        col("value").cast("decimal(18,2)").as("v"))): _*)
      .withColumn("rk", row_number().over(w))
      .withColumn("prev_ts", lead("ts", 1).over(w))
      .withColumn("prev_v", lead("v", 1).over(w))
      .where(col("rk") === 1 && col("prev_ts").isNotNull)
      .withColumn("dt", col("ts") - col("prev_ts"))
      .withColumn("idelta", (col("v") - col("prev_v")).cast("double"))
      .withColumn("irate",
        when(col("dt") > 0, round(
          when(col("v") >= col("prev_v"), col("v") - col("prev_v"))
            .otherwise(col("v")).cast("double") /
            col("dt").cast("double"), 6)))
      .select((byLabels.map(col) ++ Seq(col("sid"), col("bucket_start"),
        col("dt"), col("idelta"), col("irate"))): _*)
  }

  /** PromQL `topk(k, sum by (labels) (metric[step]))`: the k label groups
    * with the largest per-bucket sums, per step bucket. Composes
    * [[aggregateBy]] with a rank window PARTITIONED by bucket — state per
    * task is bounded by the label-group cardinality of one bucket, and ties
    * break deterministically on the label values.
    */
  def topKBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      k: Int,
      offsetSec: Long = 0L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket_start")
      .orderBy(col("sum_v").desc +: byLabels.map(col): _*)
    aggregateBy(metric, matchers, start, end, byLabels, stepSec, offsetSec)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(byLabels.map(col) ++ Seq(col("bucket_start"), col("rk"),
        col("n"), col("sum_v")): _*)
  }

  /** The deterministic group hash both 3.x sampling aggregators key on:
    * md5-u32 of the salted, `|`-joined group label values (absent labels
    * hash as the empty string). Bit-identical in every engine — the
    * DuckDB oracles reproduce the exact sample. */
  private def groupU32(byLabels: Seq[String], salt: String): Column =
    conv(substring(md5(concat(lit(salt), concat_ws("|",
      byLabels.map(l => coalesce(col(l), lit(""))): _*))), 1, 8), 16, 10)
      .cast("long")

  /** Prometheus 3.x experimental `limitk(k, sum by (labels)
    * (metric[step]))`: a k-SAMPLE of label groups per step bucket —
    * topk's value-blind sibling for "show me any k example series"
    * dashboards. Prometheus deliberately leaves WHICH k unspecified
    * (hash-based); this engine pins the sample to the md5-u32 of the
    * group's label values, so membership is stable across runs,
    * partitionings, and engines. Same bounded-state shape as
    * [[topKBy]]: the rank window rides the already-aggregated output,
    * never sample-grain rows.
    */
  def limitKBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      k: Int,
      offsetSec: Long = 0L,
      salt: String = "lk"): DataFrame = {
    require(k > 0, s"limitk k must be > 0: $k")
    val u = groupU32(byLabels, salt)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket_start")
      .orderBy(u.asc +: byLabels.map(col): _*)
    aggregateBy(metric, matchers, start, end, byLabels, stepSec, offsetSec)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(byLabels.map(col) ++ Seq(col("bucket_start"), col("rk"),
        col("n"), col("sum_v")): _*)
  }

  /** Prometheus 3.x experimental `limit_ratio(r, sum by (labels)
    * (metric[step]))`: keep a deterministic ~r fraction of label groups.
    * A NEGATIVE r keeps exactly the complement of `limit_ratio(1+r)` —
    * Prometheus's split-traffic idiom (`limit_ratio(0.1, …)` to one
    * pipeline, `limit_ratio(-0.9, …)` to the other, no group in both).
    * Pure map-side hash filter over the aggregated groups — zero extra
    * shuffle, zero rank state, the 100 TB form of group sampling.
    */
  def limitRatioBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      ratio: Double,
      offsetSec: Long = 0L,
      salt: String = "lk"): DataFrame = {
    require(ratio >= -1.0 && ratio <= 1.0,
      s"limit_ratio r must be in [-1, 1]: $ratio")
    val u = groupU32(byLabels, salt)
    val space = 4294967296L // 2^32
    val keep =
      if (ratio >= 0) u < lit(math.floor(ratio * space).toLong)
      else u >= lit(math.floor((1.0 + ratio) * space).toLong)
    aggregateBy(metric, matchers, start, end, byLabels, stepSec, offsetSec)
      .where(keep)
      .select(byLabels.map(col) ++ Seq(col("bucket_start"),
        col("n"), col("sum_v")): _*)
  }

  /** PromQL `topk(k, sum by (labels) (rate(metric[step])))` — the
    * canonical dashboard ranking ("top k by request rate"): the k label
    * groups with the LARGEST per-bucket reset-robust increase. The rank
    * window rides the already-aggregated [[aggregateIncreaseBy]] output,
    * so its state is bounded by one bucket's label-group cardinality
    * (never sample-level); ties break deterministically on the labels.
    * `asc = true` is the `bottomk` mirror.
    */
  def topKIncreaseBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      k: Int,
      offsetSec: Long = 0L,
      asc: Boolean = false): DataFrame = {
    val rank = if (asc) col("increase").asc else col("increase").desc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket_start")
      .orderBy(rank +: byLabels.map(col): _*)
    aggregateIncreaseBy(metric, matchers, start, end, byLabels, stepSec,
        offsetSec)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(byLabels.map(col) ++ Seq(col("bucket_start"), col("rk"),
        col("increase"), col("rate_per_sec")): _*)
  }

  /** PromQL `bottomk(k, sum by (labels) (metric[step]))` — [[topKBy]]
    * with the rank order inverted: the k label groups with the SMALLEST
    * per-bucket sums. Same bounded-state bucket-partitioned rank window.
    */
  def bottomKBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      k: Int,
      offsetSec: Long = 0L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket_start")
      .orderBy(col("sum_v").asc +: byLabels.map(col): _*)
    aggregateBy(metric, matchers, start, end, byLabels, stepSec, offsetSec)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(byLabels.map(col) ++ Seq(col("bucket_start"), col("rk"),
        col("n"), col("sum_v")): _*)
  }

  /** PromQL `stddev by (labels)` / `stdvar by (labels)` per step bucket
    * (population variance, like Prometheus). Exactness scheme: values
    * carry 2 decimals, so they lift losslessly to integer cents
    * (`round(v*100)` — identical IEEE op in the oracle), the two moment
    * sums are exact BIGINTs, and the variance assembles from them in a
    * fixed double op order mirrored 1:1 in SQL (round(…,6) absorbing
    * final-op ULP, the `q_percentiles` contract). One hash aggregation.
    */
  def stddevBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      offsetSec: Long = 0L): DataFrame = {
    val keys = byLabels.map(l => col("labels").getItem(l).as(l)) :+
      ((col("ts") - pmod(col("ts"), lit(stepSec))) + offsetSec)
        .as("bucket_start")
    val n = col("n").cast("double")
    val meanC = col("sum_c").cast("double") / n
    val stdvar = (col("sum2_c").cast("double") / n - meanC * meanC) / 1e4
    queryRange(metric, matchers, start - offsetSec, end - offsetSec)
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("cents")).as("sum_c"),
        sum(col("cents") * col("cents")).as("sum2_c"))
      .select(byLabels.map(col) ++ Seq(
        col("bucket_start"),
        col("n"),
        round(meanC / 100.0, 6).as("avg_v"),
        round(stdvar, 6).as("stdvar"),
        round(sqrt(stdvar), 6).as("stddev")): _*)
  }

  /** PromQL `count_values("value_label", metric)` per step bucket: the
    * number of samples carrying each distinct value, grouped by a label
    * subset — the value itself becomes a grouping dimension. One hash
    * aggregation keyed by (labels…, bucket, value); cardinality is
    * data-bounded exactly like Prometheus' own warning for this function.
    */
  def countValuesBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      offsetSec: Long = 0L): DataFrame = {
    val keys = byLabels.map(l => col("labels").getItem(l).as(l)) ++ Seq(
      ((col("ts") - pmod(col("ts"), lit(stepSec))) + offsetSec)
        .as("bucket_start"),
      col("value"))
    queryRange(metric, matchers, start - offsetSec, end - offsetSec)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"))
  }

  /** The PromQL `*_over_time(metric[rangeSec])` family evaluated on a
    * step grid: for every eval timestamp `e` (multiples of `stepSec`
    * within `[start, end]`), the avg/min/max/sum/count/last of each
    * series' raw samples in the PromQL lookback window `(e - rangeSec,
    * e]`. Returns all six moments in one pass — callers project the one
    * they asked for. `spread = true` adds `stdvar_v`/`stddev_v`
    * (population, like Prometheus's `stddev_over_time`) to the SAME
    * hash aggregation via the [[stddevBy]] integer-cents scheme.
    *
    * Scale shape: each sample map-side `explode`s into the at most
    * `rangeSec/stepSec + 1` eval points whose windows contain it
    * (`sequence` of the aligned grid — no per-eval-point self-join, no
    * driver loop), then ONE hash aggregation keyed by (sid, eval_ts)
    * computes every moment; `last_v` rides the same aggregation as
    * `max_by` over (ts, value). Overlapping windows cost the fixed
    * explode factor, never a shuffle per window — the same trade
    * Structured Streaming's sliding `window()` makes.
    */
  /** Shared eval-grid explode of the `*_over_time` family.
    * Eval grid: e = k·stepSec with start ≤ e ≤ end; a sample at ts
    * contributes to e iff ts ≤ e < ts + rangeSec (PromQL's
    * `(e − range, e]` lookback). All integer arithmetic; a sample whose
    * window set falls outside the grid is dropped BEFORE the explode
    * (sequence() rejects inverted bounds). An offset evaluates on the
    * shifted window [start−o, end−o] and reports eval points shifted
    * back (+o), the aggregateBy convention. The scan reaches back a full
    * lookback window before `start` so the first eval points still see
    * their whole window. Returns (exploded frame, grouping keys);
    * consumed by [[overTimeBy]] and [[holtWintersBy]]
    * ([[absentOverTime]] mirrors the grid with a spark.range
    * complement). */
  private def overTimeWindowed(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      rangeSec: Long,
      offsetSec: Long): (DataFrame, Seq[org.apache.spark.sql.Column]) = {
    val start0 = start - offsetSec
    val end0 = end - offsetSec
    val firstEval =
      floor((col("ts") + (stepSec - 1)) / lit(stepSec)).cast("long") * stepSec
    val lastEval =
      floor((col("ts") + (rangeSec - 1)) / lit(stepSec)).cast("long") * stepSec
    val gridStart = // first grid point >= start0
      Math.floorDiv(start0 + stepSec - 1, stepSec) * stepSec
    val gridEnd = Math.floorDiv(end0, stepSec) * stepSec
    val keys = byLabels.map(l => col("labels").getItem(l).as(l)) :+
      col("eval_ts")
    val windowed = queryRange(metric, matchers, start0 - rangeSec + 1, end0)
      .withColumn("e0", greatest(firstEval, lit(gridStart)))
      .withColumn("e1", least(lastEval, lit(gridEnd)))
      .where(col("e0") <= col("e1"))
      .withColumn("eval_ts", explode(sequence(col("e0"), col("e1"),
        lit(stepSec))))
      .withColumn("eval_ts", col("eval_ts") + offsetSec)
    (windowed, keys)
  }

  /** Sliding gauge moments on the subquery eval grid — the gauge twin of
    * [[slidingIncreaseBy]]: `avg/min/max/sum/count/last_over_time(
    * metric[rangeSec])` evaluated every `stepSec`, aggregated straight to
    * the `byLabels` grain (the full label-key universe for the per-series
    * form). One sample explode + ONE hash aggregation, the exact
    * [[overTimeBy]] moment set (decimal sums, struct-ordered last), so
    * oracles mirror 1:1.
    */
  def slidingOverTimeBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      rangeSec: Long,
      offsetSec: Long = 0L): DataFrame = {
    require(rangeSec > 0 && stepSec > 0, "rangeSec and stepSec must be > 0")
    require(offsetSec >= 0, s"offset must be >= 0: $offsetSec")
    val (windowed, keys) = overTimeWindowed(metric, matchers, start, end,
      byLabels, stepSec, rangeSec, offsetSec)
    windowed.groupBy(keys: _*).agg(
      count(lit(1)).as("n"),
      sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_v"),
      // 6-decimal quantized (tie-free floor form) so the subquery value
      // joins the integer-micro exactness family: spread/counter OUTERS
      // over an avg_over_time inner are lossless at micro grain, like
      // the round(…,6) counter rate. The other moments are already
      // micro-exact (2-decimal sample values / their decimal sums).
      (floor(sum(col("value").cast("decimal(18,2)")).cast("double") /
        count(lit(1)) * 1e6 + 0.5) / 1e6).as("avg_v"),
      min("value").as("min_v"),
      max("value").as("max_v"),
      max(struct(col("ts"), col("value"))).getField("value").as("last_v"))
  }

  def overTimeBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      rangeSec: Long,
      offsetSec: Long = 0L,
      spread: Boolean = false,
      tsOf: Boolean = false): DataFrame = {
    require(rangeSec > 0 && stepSec > 0, "rangeSec and stepSec must be > 0")
    require(offsetSec >= 0, s"offset must be >= 0: $offsetSec")
    val (windowed, keys) = overTimeWindowed(metric, matchers, start, end,
      byLabels, stepSec, rangeSec, offsetSec)
    val baseAggs = Seq(
      count(lit(1)).as("n"),
      sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_v"),
      (sum(col("value").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("avg_v"),
      min("value").as("min_v"),
      max("value").as("max_v"),
      // last sample in the window; ties on ts break to the larger value.
      // max over an orderable struct — the same lexicographic compare
      // DuckDB's max(struct_pack(...)) performs, so oracles mirror 1:1
      max(struct(col("ts"), col("value"))).getField("value").as("last_v")) ++
      // Prometheus 3.x experimental ts_of_* family: the epoch-seconds
      // timestamp (double, like Prometheus) of the window's max / min /
      // last sample. Value ties break to the LATEST sample (Prometheus
      // scans chronologically keeping >= / <=) — exactly max over a
      // value-first struct; min-with-latest-tie is max over the NEGATED
      // value (exact for doubles). Opt-in so the moment-only plans keep
      // their aggregation buffers unchanged.
      (if (!tsOf) Seq.empty else Seq(
        max(struct(col("value").as("v"), col("ts").as("t")))
          .getField("t").cast("double").as("ts_of_max_v"),
        max(struct((-col("value")).as("v"), col("ts").as("t")))
          .getField("t").cast("double").as("ts_of_min_v"),
        max(col("ts")).cast("double").as("ts_of_last_v")))
    if (!spread)
      windowed.groupBy((col("sid") +: keys): _*)
        .agg(baseAggs.head, baseAggs.tail: _*)
        .drop("sid")
    else {
      // stddev/stdvar over the window, the stddevBy exactness scheme:
      // lossless integer-cents moment sums, fixed double op order
      // mirrored 1:1 in the oracle SQL, round(…,6) absorbing ULP
      val spreadAggs = Seq(
        sum(col("cents")).as("sum_c"),
        sum(col("cents") * col("cents")).as("sum2_c"))
      val aggs = baseAggs ++ spreadAggs
      val n = col("n").cast("double")
      val meanC = col("sum_c").cast("double") / n
      val stdvar = (col("sum2_c").cast("double") / n - meanC * meanC) / 1e4
      windowed
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .groupBy((col("sid") +: keys): _*)
        .agg(aggs.head, aggs.tail: _*)
        .withColumn("stdvar_v", round(stdvar, 6))
        .withColumn("stddev_v", round(sqrt(stdvar), 6))
        .drop("sid", "sum_c", "sum2_c")
    }
  }

  /** PromQL `holt_winters(v[range], sf, tf)` (double exponential
    * smoothing) on the sliding eval grid: per (series-group, eval point)
    * the windowed samples fold IN TIMESTAMP ORDER through Prometheus's
    * recurrence (functions.go funcHoltWinters):
    * {{{
    *   s = x0; b = x1 - x0
    *   for i in 1..n-1:
    *     s' = sf·xᵢ + (1−sf)·(s + b)
    *     b  = tf·(s' − s) + (1−tf)·b;  s = s'
    *   result = s        (windows with < 2 samples emit nothing)
    * }}}
    * Implemented as ONE hash aggregation (the [[overTimeBy]] grid
    * explode) collecting the bounded window into a sorted array, then a
    * codegen'd `aggregate` fold — no window function, no shuffle beyond
    * the grouping, per-group state bounded by the lookback window. The
    * identical double op order is mirrored in the oracle's recursive
    * CTE; round(…,6) absorbs ULP.
    */
  def holtWintersBy(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      rangeSec: Long,
      sf: Double,
      tf: Double,
      offsetSec: Long = 0L): DataFrame = {
    require(rangeSec > 0 && stepSec > 0, "rangeSec and stepSec must be > 0")
    require(offsetSec >= 0, s"offset must be >= 0: $offsetSec")
    require(sf > 0 && sf < 1 && tf > 0 && tf < 1,
      s"holt_winters smoothing factors must be in (0, 1): sf=$sf tf=$tf")
    val (windowed, keys) = overTimeWindowed(metric, matchers, start, end,
      byLabels, stepSec, rangeSec, offsetSec)
    // ts-sorted window values (ties break on value, mirrored in the
    // oracle's ORDER BY ts, value)
    val pts = sort_array(collect_list(struct(col("ts"),
      col("value").cast("double").as("v"))))
    val xs = col("xs")
    val s0 = element_at(xs, 1)
    val fold = aggregate(
      expr("slice(xs, 2, size(xs) - 1)"),
      struct(s0.as("s"), (element_at(xs, 2) - s0).as("b")),
      (acc, x) => {
        val sNew = lit(sf) * x + lit(1 - sf) *
          (acc.getField("s") + acc.getField("b"))
        struct(sNew.as("s"),
          (lit(tf) * (sNew - acc.getField("s")) +
            lit(1 - tf) * acc.getField("b")).as("b"))
      },
      acc => acc.getField("s"))
    windowed
      .groupBy((col("sid") +: keys): _*)
      .agg(pts.as("pts"), count(lit(1)).as("n"))
      .where(col("n") >= 2)
      .withColumn("xs", transform(col("pts"), p => p.getField("v")))
      .withColumn("hw_v", round(fold, 6))
      .drop("sid", "pts", "xs")
  }

  /** PromQL `absent_over_time(metric{matchers}[rangeSec])` on a step
    * grid: one `(eval_ts, 1.0)` row for every eval timestamp whose
    * PromQL lookback window `(e - rangeSec, e]` contains NO matching
    * sample — the "stopped reporting, and since when" alerting signal
    * ([[absentRange]] collapses the whole range to one bit).
    *
    * Scale shape: the eval grid is `spark.range` (length bounded by the
    * query window, never the data), present eval points come from the
    * SAME bounded map-side explode [[overTimeBy]] uses followed by one
    * distinct aggregation, and absence is a single anti-join on an
    * 8-byte key. No per-eval-point scan, no driver loop.
    */
  def absentOverTime(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      stepSec: Long,
      rangeSec: Long,
      offsetSec: Long = 0L): DataFrame = {
    require(rangeSec > 0 && stepSec > 0, "rangeSec and stepSec must be > 0")
    require(offsetSec >= 0, s"offset must be >= 0: $offsetSec")
    val start0 = start - offsetSec
    val end0 = end - offsetSec
    val firstEval =
      floor((col("ts") + (stepSec - 1)) / lit(stepSec)).cast("long") * stepSec
    val lastEval =
      floor((col("ts") + (rangeSec - 1)) / lit(stepSec)).cast("long") * stepSec
    val gridStart = Math.floorDiv(start0 + stepSec - 1, stepSec) * stepSec
    val gridEnd = Math.floorDiv(end0, stepSec) * stepSec
    val grid = spark.range(gridStart, gridEnd + 1, stepSec)
      .select(col("id").as("eval_ts"))
    // full-lookback scan, mirroring overTimeBy — absence stays the exact
    // complement of the present eval grid
    val present = queryRange(metric, matchers, start0 - rangeSec + 1, end0)
      .withColumn("e0", greatest(firstEval, lit(gridStart)))
      .withColumn("e1", least(lastEval, lit(gridEnd)))
      .where(col("e0") <= col("e1"))
      .withColumn("eval_ts", explode(sequence(col("e0"), col("e1"),
        lit(stepSec))))
      .select("eval_ts").distinct()
    grid.join(present, Seq("eval_ts"), "left_anti")
      .select((col("eval_ts") + offsetSec).as("eval_ts"),
        lit(1.0).as("value"))
  }

  /** PromQL `absent(metric{matchers}[start..end])`: a single row with
    * `value = 1.0` when NO sample matches the selector in the range,
    * empty otherwise — the alerting primitive for "this metric stopped
    * reporting". One pruned scan feeding a global count; the count
    * compares on the driver side of the plan (a 1-row aggregate), never
    * collects data.
    */
  def absentRange(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long): DataFrame =
    queryRange(metric, matchers, start, end)
      .agg(count(lit(1)).as("n_present"))
      .where(col("n_present") === 0L)
      .select(lit(1.0).as("value"))

  /** PromQL `histogram_quantile(phi, sum by (labels, le) (metric[step]))`
    * over raw observations bucketed at query time: each sample lands in its
    * smallest `le >= value` cumulative bucket (map-side `when` chain), per
    * (label subset, step bucket, le) counts are ONE hash aggregation, and
    * the Prometheus interpolation runs as a window over the tiny aggregated
    * bucket table ordered by `le`. Semantics match Prometheus
    * `bucketQuantile`: linear interpolation inside the crossing bucket, a
    * lower bound of 0 for the first finite bucket, and the highest finite
    * `le` when the rank falls in the `+Inf` bucket.
    *
    * Exchanges: the corpus-sized one keys the full group (labels, bucket,
    * le); the window shuffles only `groups × |buckets|` aggregated rows.
    * All interpolation arithmetic is (long, literal-double) IEEE ops in a
    * fixed order, so results are bit-reproducible across engines.
    */
  def histogramQuantile(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      stepSec: Long,
      phi: Double,
      buckets: Seq[Double],
      offsetSec: Long = 0L): DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0,1): $phi")
    require(offsetSec >= 0, s"offset must be >= 0: $offsetSec")
    require(buckets.nonEmpty && buckets == buckets.sorted,
      "bucket bounds must be ascending")
    val le = buckets.foldRight(lit(Double.PositiveInfinity): Column) {
      (b, rest) => when(col("value") <= b, lit(b)).otherwise(rest)
    }
    // offset shifts the scanned window back and reports buckets at the
    // REQUESTED grid, same convention as [[aggregateBy]]
    val keys = byLabels.map(l => col("labels").getItem(l).as(l)) ++ Seq(
      ((col("ts") - pmod(col("ts"), lit(stepSec))) + offsetSec)
        .as("bucket_start"))
    val grouped = queryRange(metric, matchers, start - offsetSec,
        end - offsetSec)
      .withColumn("le", le)
      .groupBy(keys :+ col("le"): _*)
      .agg(count(lit(1)).as("cnt"))
    val part = byLabels.map(col) :+ col("bucket_start")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(part: _*).orderBy("le")
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(part: _*)
    val lo = coalesce(col("prev_le"), lit(0.0))
    grouped
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("total", sum("cnt").over(wAll))
      .withColumn("prev_cum", coalesce(lag("cum", 1).over(w), lit(0L)))
      .withColumn("prev_le", lag("le", 1).over(w))
      .withColumn("target", lit(phi) * col("total"))
      // exactly one crossing row per group: cum is strictly increasing
      // (every present le has cnt > 0) and 0 < target <= total
      .where(col("cum") >= col("target") && col("prev_cum") < col("target"))
      .withColumn("q",
        when(col("le") === lit(Double.PositiveInfinity), lit(buckets.last))
          .otherwise(lo +
            (col("le") - lo) * (col("target") - col("prev_cum")) / col("cnt")))
      .select(part ++ Seq(col("total").as("n"), col("q")): _*)
  }

  /** PromQL `deriv()` / `predict_linear()`: per-group least-squares fit of
    * value over time, returning the per-second slope and the extrapolated
    * value at `atSec`. One hash aggregation computes the five regression
    * moments; with `ts` re-origined to `start` and values scaled to integer
    * cents, every moment, the closed-form numerators and denominators stay
    * EXACT in decimal(38,0) (mirrored by HUGEINT on the oracle side), and
    * the only floating-point steps are the two final divisions — identical
    * IEEE operations in both engines, hence bit-reproducible.
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *   ŷ(xp) = (Σy·den + num·(n·xp − Σx)) / (n·den)
    *
    * Magnitude audit (sf0.1 × 10, per group): x ≤ 6.1e5, y_cents ≤ 4.9e4,
    * n ≤ 2e4 → |Σy·den| ≤ ~3e29 and |num·(n·xp − Σx)| ≤ ~6e29, both well
    * inside decimal(38,0) / HUGEINT range.
    */
  def predictLinear(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long,
      byLabels: Seq[String],
      atSec: Long,
      offsetSec: Long = 0L): DataFrame = {
    require(offsetSec >= 0, s"offset must be >= 0: $offsetSec")
    val dec = "decimal(20,0)"
    val byCols = byLabels.map(l => col("labels").getItem(l).as(l))
    // offset shifts the fitted window back by `offsetSec` and
    // extrapolates the same horizon from the shifted origin — `x` is
    // re-origined to the SHIFTED start, so `xp = atSec - start` holds
    // unchanged (the day-over-day "what would yesterday have predicted")
    val start0 = start - offsetSec
    val end0 = end - offsetSec
    val xp = lit(atSec - start).cast(dec)
    queryRange(metric, matchers, start0, end0)
      .select(byCols ++ Seq(
        (col("ts") - lit(start0)).cast(dec).as("x"),
        (col("value").cast("decimal(18,2)") * 100).cast(dec).as("yc")): _*)
      .groupBy(byLabels.map(col): _*)
      .agg(
        count(lit(1)).cast(dec).as("n"),
        sum(col("x")).as("sx"),
        sum(col("yc")).as("syc"),
        sum(col("x") * col("yc")).as("sxyc"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("numc", col("n") * col("sxyc") - col("sx") * col("syc"))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      // a fit needs >= 2 distinct timestamps (den = 0 otherwise)
      .where(col("n") >= 2 && col("den") =!= 0)
      .withColumn("slope_per_sec",
        col("numc").cast("double") / col("den").cast("double") / 100.0)
      .withColumn("predicted",
        (col("syc") * col("den") +
          col("numc") * (col("n") * xp - col("sx"))).cast("double") /
          (col("n") * col("den")).cast("double") / 100.0)
      .select(byLabels.map(col) ++ Seq(col("n").cast("long").as("n"),
        col("slope_per_sec"), col("predicted")): _*)
  }

  /** QuerySeries (reference tsdb.go:323-350): distinct matching label sets
    * whose series overlap `[start, end]`. Runs on the small series_meta
    * dimension only — never touches the fact table.
    */
  def querySeries(
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long): DataFrame =
    seriesMeta
      .where(col("minTs") <= end && col("maxTs") >= start)
      .where(matcherPredicate(col("labels"), matchers))
      .select("sid", "metric", "labels")

  /** QueryLabelValues (reference tsdb.go:352-370): sorted distinct values of
    * one label within the time range.
    *
    * Default matches the reference's semantics EXACTLY: the range is
    * honored at segment grain (tsdb.go:352-360 / label.go:62-77 — a value
    * is returned iff some sample carries it in a segment overlapping the
    * window), served from the label→value-set tier the write path
    * maintains per batch (the reference's `labelValueSet`, label.go:40-77,
    * updated on every insert, memory_segment.go:93-96). Cost is O(distinct
    * (seg, value) pairs of THIS label in the pruned segments): the scan is
    * seg-partition-pruned and `name`-pushed-down, never touches the fact
    * table or the O(series) dimension — flat in series count for
    * low-cardinality labels. Stores written before the tier existed fall
    * back to an equivalent fact-table plan until [[compactSeriesMeta]]
    * backfills the tier.
    *
    * `exact = true` opts into exact `ts`-range semantics — strictly
    * tighter than segment grain (a value whose samples sit in the queried
    * segments but outside [start, end] contributes under segment grain
    * but not under exact) — by scanning the pruned fact table; at wide
    * ranges that scan dominates (~12s vs ~1s at x100), which is why it is
    * the opt-in.
    *
    * NOTE (migration): before round 11 the DEFAULT was the exact path;
    * rounds 11-12 served series-span overlap (a superset of the
    * reference); round 13 tightened the default to the reference's
    * segment grain.
    */
  def queryLabelValues(
      label: String,
      start: Long,
      end: Long,
      exact: Boolean = false): DataFrame =
    if (exact)
      samples
        .where(segPredicate(start, end))
        .where(col("ts").between(start, end))
        .select("sid")
        .distinct() // a sid has one label set: dedupe before the lookup
        .join(dimHint(seriesMeta.select("sid", "labels")), "sid")
        .select(col("labels").getItem(label).as("value"))
        .where(col("value").isNotNull)
        .distinct()
        .orderBy("value")
    else {
      val headVals = memHead.map(
        _.where(segPredicate(start, end))
          .select(col("labels").getItem(label).as("value"))
          .where(col("value").isNotNull))
      val diskVals =
        if (conf.onlyMemoryMode) None
        else if (pathExists(labelValuesPath))
          Some(spark.read.parquet(labelValuesPath)
            .where(segPredicate(start, end) && col("name") === label)
            .select("value"))
        else if (pathExists(samplesPath))
          // pre-tier store: same segment-grain semantics off the fact
          // table (one-off migration cost; compactSeriesMeta backfills)
          Some(samplesWithLabels
            .where(segPredicate(start, end))
            .select(col("labels").getItem(label).as("value"))
            .where(col("value").isNotNull))
        else None
      (diskVals, headVals) match {
        case (Some(d), Some(h)) =>
          d.unionByName(h).distinct().orderBy("value")
        case (Some(d), None) => d.distinct().orderBy("value")
        case (None, Some(h)) => h.distinct().orderBy("value")
        case (None, None) => // preserve the read-of-missing-path error
          spark.read.parquet(labelValuesPath).select("value")
      }
    }

  /** Label NAMES present in the range (Prometheus `/api/v1/labels`;
    * beyond the reference's API, which only exposes per-label values,
    * tsdb.go:352-370) — the same segment-grain range semantics as the
    * [[queryLabelValues]] default, served from the label→value-set tier:
    * a pruned, column-pruned scan over (seg, name) distinct — O(distinct
    * pairs in the window), no fact or dimension IO. Same fallbacks as
    * the values path (head, pre-tier fact scan).
    */
  def queryLabelNames(start: Long, end: Long): DataFrame = {
    val headNames = memHead.map(
      _.where(segPredicate(start, end))
        .select(explode(map_keys(col("labels"))).as("name")))
    val diskNames =
      if (conf.onlyMemoryMode) None
      else if (pathExists(labelValuesPath))
        Some(spark.read.parquet(labelValuesPath)
          .where(segPredicate(start, end))
          .select("name"))
      else if (pathExists(samplesPath))
        Some(samplesWithLabels
          .where(segPredicate(start, end))
          .select(explode(map_keys(col("labels"))).as("name")))
      else None
    (diskNames, headNames) match {
      case (Some(d), Some(h)) => d.unionByName(h).distinct().orderBy("name")
      case (Some(d), None) => d.distinct().orderBy("name")
      case (None, Some(h)) => h.distinct().orderBy("name")
      case (None, None) =>
        spark.read.parquet(labelValuesPath).select("name")
    }
  }

  /** Per-segment stats — the reference's `Desc` metadata written at flush
    * time (segment.go:31-36: seriesCount, dataPointsCount, minTs, maxTs) as
    * one aggregation over the fact table. `countDistinct(sid)` is exact
    * (not a sketch), mirroring the reference's per-segment series count.
    */
  def segmentStats: DataFrame =
    samples
      .groupBy("seg")
      .agg(
        count(lit(1)).as("n_points"),
        countDistinct(col("sid")).as("n_series"),
        min("ts").as("min_ts"),
        max("ts").as("max_ts"))

  /** Fold the fresh series_meta generations (L0) into the append-only
    * folded level (L1) — the inline `metaCompactEvery` cadence job. The
    * fold reads and merges ONLY the rows appended since the last fold:
    * O(cadence × batch), independent of total series count AND of how
    * long the store has been appending (earlier folded generations are
    * never re-merged — the 10M-series churn failure mode was exactly
    * this job re-merging all 15M meta rows, 20-30 s spikes). Crash
    * between the L1 append and the L0 clear leaves duplicated rows,
    * which the read-side merge collapses idempotently.
    */
  def foldMetaDelta(): Unit = {
    if (conf.onlyMemoryMode || !pathExists(metaPath)) return
    mergedMeta(spark.read.parquet(metaPath))
      .coalesce(4)
      .write.mode("append")
      .option("compression", conf.compression)
      .parquet(metaFoldedPath)
    if (!fs.delete(new org.apache.hadoop.fs.Path(metaPath), true))
      logWarning(s"meta fold: could not clear L0 $metaPath " +
        "(reads stay correct; next fold retries)")
    metaGenerations = 0
    seriesDimSmallCache = None
    metaDeltaSmallCache = None
  }

  /** Full series-meta consolidation: merge base ∪ delta into a fresh
    * one-row-per-sid base level and clear the delta — the scheduled
    * maintenance job (like [[compactSegments]]) bounding metadata growth
    * that the reference explicitly lacks (no compaction, README.md:36-40).
    * Cost is O(total series); the ingest path never runs this — inline
    * cadence folds are delta-only ([[foldMetaDelta]]). Crash-safe: the
    * delta is deleted only after the new base is live, and a leftover
    * delta re-merges idempotently (min/max/first are stable under
    * duplicated rows). Also consolidates (or, for stores created before
    * the tier existed, backfills) the label→value-set tier.
    */
  def compactSeriesMeta(): Unit = {
    if (conf.onlyMemoryMode) return
    val levels = Seq(metaBasePath, metaFoldedPath, metaPath)
      .filter(pathExists)
    if (levels.nonEmpty && levels != Seq(metaBasePath)) {
      val all = levels.map(spark.read.parquet(_)).reduce(_ unionByName _)
      val tmp = metaBasePath + ".compact"
      mergedMeta(all)
        .coalesce(4)
        .write.mode("overwrite")
        .option("compression", conf.compression)
        .parquet(tmp)
      swapInPlace(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(metaBasePath))
      Seq(metaFoldedPath, metaPath).filter(pathExists).foreach { d =>
        if (!fs.delete(new org.apache.hadoop.fs.Path(d), true))
          logWarning(s"compaction: could not clear delta $d " +
            "(reads stay correct; next compaction retries)")
      }
      metaGenerations = 0
      seriesDimSmallCache = None
      metaDeltaSmallCache = None
    }
    compactLabelValues()
  }

  /** Consolidate the label→value-set tier: distinct pairs, few files per
    * segment. For stores written before the tier existed (no
    * `label_values` directory but durable samples), BACKFILLS it from the
    * fact table — one O(fact) scan, after which [[queryLabelValues]]
    * serves from the tier.
    */
  def compactLabelValues(): Unit = {
    if (conf.onlyMemoryMode) return
    if (pathExists(labelValuesPath)) {
      val tmp = labelValuesPath + ".compact"
      spark.read.parquet(labelValuesPath)
        .distinct()
        .repartition(col("seg"))
        .sortWithinPartitions("name", "value")
        .write.mode("overwrite")
        .option("compression", conf.compression)
        .partitionBy("seg")
        .parquet(tmp)
      swapInPlace(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(labelValuesPath))
    } else if (pathExists(samplesPath)) {
      val disk = spark.read.parquet(samplesPath)
      val labeled =
        if (disk.columns.contains("labels")) disk.select("seg", "labels")
        else disk.select("seg", "sid").distinct()
          .join(seriesMeta.select("sid", "labels"), "sid")
          .select("seg", "labels")
      labeled
        .select(col("seg"), explode(col("labels")).as(Seq("name", "value")))
        .distinct()
        .repartition(col("seg"))
        .sortWithinPartitions("name", "value")
        .write.mode("overwrite")
        .option("compression", conf.compression)
        .partitionBy("seg")
        .parquet(labelValuesPath)
    }
  }

  /** Crash-safe directory swap: rename the live dir aside, rename the
    * rewritten dir in, then drop the old copy — every intermediate state
    * leaves either the old or the new data under a recoverable name
    * (`.trash_*` keeps the old generation until the swap has succeeded),
    * unlike a delete-then-rename whose mid-crash state has the live path
    * gone entirely. Both renames are single metadata ops on HDFS-like
    * stores; their return values are checked and a failure aborts loudly
    * with the data intact.
    */
  private def swapInPlace(
      tmp: org.apache.hadoop.fs.Path,
      live: org.apache.hadoop.fs.Path): Unit = {
    val trash = new org.apache.hadoop.fs.Path(
      live.getParent, s".trash_${live.getName}")
    if (fs.exists(trash) && !fs.delete(trash, true))
      sys.error(s"compaction: cannot clear stale $trash")
    if (!fs.exists(live)) { // first materialization: nothing to swap aside
      if (!fs.rename(tmp, live))
        sys.error(s"compaction: rename $tmp -> $live failed")
      return
    }
    if (!fs.rename(live, trash))
      sys.error(s"compaction: rename $live -> $trash failed; store untouched")
    if (!fs.rename(tmp, live)) {
      // roll back so readers keep the old generation
      fs.rename(trash, live)
      sys.error(s"compaction: rename $tmp -> $live failed; rolled back")
    }
    if (!fs.delete(trash, true))
      logWarning(s"compaction: could not remove $trash (data already live)")
  }

  private def logWarning(msg: String): Unit =
    org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)

  /** Segment compaction: rewrite the append-accumulated files inside each
    * frozen segment partition into at most `filesPerSeg` files, re-sorted
    * by (sid, ts). Every durable append (insertRows batch, streaming
    * micro-batch, head flush) adds files to its seg directories; at fleet
    * scale that is the small-files failure mode — a month of 30 s
    * micro-batches is ~90k files per segment, and scan parallelism drowns
    * in open/seek overhead. Compaction restores the write-once layout the
    * reference gets by construction (its segments are sealed at freeze,
    * tsdb.go:242-265, and never appended) while keeping our append
    * availability. The rewrite also restores per-series (sid, ts) point
    * locality across what were separate appends — parquet delta-encoding
    * and sid row-group stats work best on the merged run.
    *
    * Each segment is rewritten independently (read seg dir → sort →
    * write sibling tmp → crash-safe [[swapInPlace]]), so a compaction pass
    * is trivially parallelizable across segments and never blocks reads
    * for longer than one rename. Returns the seg ids compacted.
    *
    * Writer safety: compaction and ingest must not interleave on the same
    * segment — an append landing between the compaction read and the swap
    * would be dropped with the old directory. A `Tsdb` instance is
    * single-writer (calls on one driver thread), which rules the race out
    * in-process; multi-writer deployments must quiesce ingest for the
    * segments being compacted (e.g. compact only segments older than the
    * active ingest window), exactly as any rewrite-based table maintenance
    * (OPTIMIZE/vacuum) requires.
    */
  def compactSegments(filesPerSeg: Int = 1, parallelism: Int = 8): Seq[Long] = {
    if (conf.onlyMemoryMode) return Seq.empty
    require(filesPerSeg >= 1, s"filesPerSeg must be >= 1: $filesPerSeg")
    val candidates = listSegDirs().filter { case (_, p) =>
      fs.listStatus(p).count(st =>
        st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith(".")) > filesPerSeg
    }
    if (candidates.isEmpty) return Seq.empty
    // segment rewrites are independent single-partition-dir jobs; run them
    // concurrently on a bounded driver pool so a many-segment pass is
    // limited by executor throughput, not by job-scheduling latency
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, candidates.size))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val done = candidates.map { case (seg, p) =>
        scala.concurrent.Future {
          // tmp lives OUTSIDE the partition tree (dot-prefixed sibling of
          // samples/): concurrent partition discovery never sees a
          // non-`seg=<n>` directory mid-rewrite
          val tmp = new org.apache.hadoop.fs.Path(
            s"${conf.dataPath}/.compact_seg_$seg")
          spark.read.parquet(p.toString)
            .repartition(filesPerSeg)
            .sortWithinPartitions("sid", "ts")
            .write.mode("overwrite")
            .option("compression", conf.compression)
            .parquet(tmp.toString)
          swapInPlace(tmp, p)
          seg
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(done),
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
  }

  /** Materialize a Gorilla chunk tier: every (sid, seg) group's points
    * packed into one dod+XOR block (the VLDB'15 codec in
    * [[graft.functions.Gorilla]]), stored as a binary column in
    * seg-partitioned parquet — the reference's ACTUAL storage design
    * (per-series Gorilla blocks inside segments, memory_segment.go)
    * re-expressed as a columnar table of compressed chunks. At ~1.37
    * bytes/point (the paper's average) this is the long-retention cold
    * tier: seg partition pruning still applies, and
    * [[queryRangeFromChunks]] decodes only the pruned chunks.
    */
  def materializeGorillaChunks(): String = {
    val path = s"${conf.dataPath}/gorilla_chunks"
    val pack = org.apache.spark.sql.functions.udaf(
      new graft.operators.GorillaAggregator)
    samples
      .select("sid", "seg", "ts", "value")
      .groupBy("sid", "seg")
      .agg(
        count(lit(1)).as("n_points"),
        pack(col("ts"), col("value")).as("block"))
      .repartition(col("seg"))
      .write.mode("overwrite")
      .option("compression", conf.compression)
      .partitionBy("seg")
      .parquet(path)
    path
  }

  /** [[queryRange]] served from the Gorilla chunk tier: prune chunk
    * partitions by `seg`, decode only the surviving blocks (distributed
    * flatMap — the one genuinely imperative step, a custom bitstream),
    * then the usual ts filter + matcher semi-join. Row-identical to
    * [[queryRange]] on the raw store (shared oracle): the codec is
    * lossless and the tier covers every sample AS OF its
    * [[materializeGorillaChunks]] — like any materialized tier it is a
    * snapshot; appends after the materialize serve from the raw/head
    * path until the next pack run (same freshness contract as the
    * rollup tier's rebuild mode).
    */
  def queryRangeFromChunks(
      metric: String,
      matchers: Seq[LabelMatcher],
      start: Long,
      end: Long): DataFrame = {
    val all = LabelMatcher.eq(MetricLabel, metric) +: matchers
    val chunks = spark.read.parquet(s"${conf.dataPath}/gorilla_chunks")
      .where(segPredicate(start, end))
    val pts = graft.operators.GorillaPack
      .unpackToPoints(chunks, "sid", "block")
      .where(col("ts").between(start, end))
    val matching = seriesMeta
      .where(matcherPredicate(col("labels"), all))
      .select("sid", "labels")
    pts
      .join(dimHint(matching), "sid")
      .select("sid", "labels", "ts", "value")
  }

  /** Retention expiry (reference tsdb.go:384-406): whole-partition drop of
    * buckets older than `retention` — the "all-in" delete the reference
    * performs per segment, here a partition-directory removal.
    */
  def removeExpires(nowSeconds: Long): Seq[Long] = {
    val cutoffSeg = (nowSeconds - conf.retention) / conf.segmentDuration
    // the live head (either mode) expires by filter; headRows must track
    // the eviction or the maxRowsPerSegment trigger fires on ghost rows
    // (and flushHead would write an empty append for a fully-expired head)
    memHead = memHead.map(_.where(col("seg") >= cutoffSeg))
    if (headRows > 0) headRows = memHead.map(_.count()).getOrElse(0L)
    if (conf.onlyMemoryMode) return Seq.empty
    // derived tiers are seg-partitioned on the SAME bucket ids as the
    // fact store (rollup bucket_start and chunk blocks both derive seg
    // via segOf), so the one sweep expires them too — otherwise the
    // "cheap" tiers grow forever while the raw data they downsample is
    // long gone, the classic unbounded-cold-tier leak
    val base = new org.apache.hadoop.fs.Path(conf.dataPath)
    if (fs.exists(base)) fs.listStatus(base)
      .filter(st => st.isDirectory && {
        val n = st.getPath.getName
        n.startsWith("rollup_") || n == "gorilla_chunks" ||
          n == "label_values"
      })
      .foreach { tier =>
        fs.listStatus(tier.getPath)
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("seg="))
          .foreach { segDir =>
            val seg = segDir.getPath.getName.stripPrefix("seg=").toLong
            if ((seg + 1) * conf.segmentDuration <= nowSeconds - conf.retention)
              fs.delete(segDir.getPath, true)
          }
      }
    listSegDirs().flatMap { case (seg, path) =>
      // expire when the bucket's max possible ts is older than cutoff,
      // i.e. the whole segment is out of retention (tsdb.go:393-396)
      if ((seg + 1) * conf.segmentDuration <= nowSeconds - conf.retention) {
        fs.delete(path, true)
        Some(seg)
      } else None
    }
  }

  /** Background retention sweeper — the reference's 5-minute expiry ticker
    * (tsdb.go:383-406, started at tsdb.go:483) as a daemon scheduled
    * executor wrapping [[removeExpires]]. Runs on the Spark driver like any
    * maintenance job; at cluster scale the same sweep is typically an
    * external cron, which this replaces for long-lived driver processes.
    *
    * @param clock injectable now-epoch-seconds source (tests tick it)
    */
  def startRetentionLoop(
      periodSec: Long = 300L,
      clock: () => Long = () => System.currentTimeMillis() / 1000L): Unit =
    synchronized {
      if (retentionExec.isEmpty) {
        val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
          (r: Runnable) => {
            val t = new Thread(r, "graft-retention-sweep")
            t.setDaemon(true)
            t
          })
        ex.scheduleAtFixedRate(
          () => try removeExpires(clock())
          catch { case _: Throwable => () }, // sweep failures must not kill the ticker
          periodSec, periodSec, java.util.concurrent.TimeUnit.SECONDS)
        retentionExec = Some(ex)
      }
    }

  /** Stop the [[startRetentionLoop]] ticker (idempotent). */
  def stopRetentionLoop(): Unit = synchronized {
    retentionExec.foreach(_.shutdownNow())
    retentionExec = None
  }

  private var retentionExec:
    Option[java.util.concurrent.ScheduledExecutorService] = None

  /** Streaming queries writing into this store, registered by
    * [[graft.streaming.Ingest]] starters so [[close]] can drain them.
    */
  private val activeQueries = scala.collection.mutable.ArrayBuffer
    .empty[org.apache.spark.sql.streaming.StreamingQuery]

  private[graft] def registerQuery(
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    synchronized { activeQueries += q }

  /** Graceful shutdown — the reference's `Close()` (tsdb.go:372-382:
    * drain the write queue, flush the head, seal segments) in one call:
    * drain and stop every registered streaming ingest query, stop the
    * retention ticker, and freeze the in-memory head to parquet. After
    * `close()` returns, every acknowledged row is durable; a Tsdb
    * reopened on the same path serves all of it. Idempotent — a second
    * call finds nothing to drain.
    */
  def close(): Unit = {
    val qs = synchronized {
      val snap = activeQueries.toList
      activeQueries.clear()
      snap
    }
    qs.foreach { q =>
      try {
        if (q.isActive) { q.processAllAvailable(); q.stop() }
      } catch {
        case scala.util.control.NonFatal(e) =>
          logWarning(s"close: streaming query ${q.id} failed to drain: $e")
      }
    }
    stopRetentionLoop()
    flushHead()
  }

  // ------------------------------------------------------------- predicates

  private def segPredicate(start: Long, end: Long): Column = {
    val s = Math.floorDiv(start, conf.segmentDuration)
    val e = Math.floorDiv(end, conf.segmentDuration)
    // inclusive bounds on both sides — the reference's strict-comparison
    // overlap test misses exactly-aligned boundaries (segment.go:71-85);
    // we deliberately do not replicate that off-by-one (SURVEY §7.4).
    col("seg").between(s, e)
  }

  /** Instance alias of [[Tsdb.matcherPredicate]] — the predicate is pure
    * (a Column function of plan-time constants), hoisted to the companion
    * so streaming consumers can build it without a Tsdb instance. */
  def matcherPredicate(labels: Column, matchers: Seq[LabelMatcher]): Column =
    Tsdb.matcherPredicate(labels, matchers)

  /** Matcher predicate for a fact frame that carries the normalized
    * `metric` column: `labels[__name__] == metric` by construction
    * ([[graft.functions.LabelFunctions.foldMetric]] under LAST_WIN —
    * the last-folded entry always wins, NULL included), so `__name__`
    * matchers evaluate against the plain string column. On the attached
    * in-memory head the label map is a chain of higher-order functions
    * (map_filter/map_concat — CodegenFallback, interpreted, and excluded
    * from codegen subexpression elimination), which a scan-stage Filter
    * re-evaluated once per conjunct per row; the plain column form also
    * pushes the metric equality into the parquet scan
    * (PushedFilters: EqualTo(event_type, …) via the alias chain), so
    * non-matching rows never build a label map at all. Value-identical.
    */
  private def factMatcherPredicate(
      df: DataFrame, matchers: Seq[LabelMatcher]): Column =
    if (df.columns.contains("metric"))
      Tsdb.matcherPredicateWith(
        n => if (n == Tsdb.MetricLabel) col("metric")
             else col("labels").getItem(n),
        matchers)
    else Tsdb.matcherPredicate(col("labels"), matchers)
}

object Tsdb {
  val MetricLabel: String = graft.functions.LabelFunctions.MetricLabel

  /** Prometheus `bucketQuantile` over an ALREADY-AGGREGATED cumulative
    * bucket frame `(keyCols…, leCol (string bounds, "+Inf" overflow),
    * tsCol, valCol)` — the interpolation half of the CANONICAL
    * classic-histogram query `histogram_quantile(phi, sum by (le, l…)
    * (rate(bucket[d])))`. Semantics match promql/quantile.go: a running
    * max along the le axis repairs non-monotone cumulative values (the
    * ensureMonotonic fix), `total` is the largest (the +Inf bucket's)
    * value, the rank `phi·total` interpolates linearly inside the first
    * crossing bucket (lower bound 0 for the first finite bucket), and a
    * rank landing in +Inf returns the highest finite bound. All
    * arithmetic is fixed-order IEEE doubles over the engine's quantized
    * rates, so DuckDB mirrors are bit-exact. The windows ride one
    * partitioning (keyCols, tsCol) over groups × |buckets| aggregated
    * rows — never sample grain.
    */
  private[graft] def histQuantileOnFrame(
      frame: org.apache.spark.sql.DataFrame,
      keyCols: Seq[String],
      leCol: String,
      tsCol: String,
      valCol: String,
      phi: Double): org.apache.spark.sql.DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0,1): $phi")
    val part = keyCols.map(col) :+ col(tsCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(part: _*).orderBy("le_d")
    val wRun = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(part: _*)
    val lo = coalesce(col("prev_le"), lit(0.0))
    frame
      .withColumn("le_d",
        when(col(leCol) === "+Inf", lit(Double.PositiveInfinity))
          .otherwise(col(leCol).cast("double")))
      .withColumn("vm", max(col(valCol).cast("double")).over(wRun))
      .withColumn("prev_v", coalesce(lag("vm", 1).over(w), lit(0.0)))
      .withColumn("prev_le", lag("le_d", 1).over(w))
      .withColumn("total", max(col("vm")).over(wAll))
      .withColumn("target", lit(phi) * col("total"))
      .where(col("vm") >= col("target") && col("prev_v") < col("target"))
      .withColumn("q",
        when(col("le_d") === lit(Double.PositiveInfinity), col("prev_le"))
          .otherwise(lo + (col("le_d") - lo) *
            (col("target") - col("prev_v")) / (col("vm") - col("prev_v"))))
      .select(part ++ Seq(col("total"), col("q")): _*)
  }

  /** Sliding-window moment aggregation over an ALREADY-COMPUTED grid
    * frame `(keyCols…, tsCol, valCol)` — the OUTER leg of a nested
    * subquery: the same eval-grid explode [[graft.Tsdb.overTimeBy]]
    * performs over raw samples, applied to an inner expression's points.
    * The sum/avg moments accumulate in DECIMAL so they are
    * order-insensitive (oracle-mirrorable); min/max/count/last are
    * order-free by nature.
    */
  private[graft] def overTimeOnFrame(
      frame: org.apache.spark.sql.DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valCol: String,
      start: Long,
      end: Long,
      stepSec: Long,
      rangeSec: Long,
      quantile: Option[Double] = None,
      spread: Boolean = false,
      mad: Boolean = false): org.apache.spark.sql.DataFrame = {
    require(rangeSec > 0 && stepSec > 0, "rangeSec and stepSec must be > 0")
    val firstEval =
      floor((col(tsCol) + (stepSec - 1)) / lit(stepSec)).cast("long") * stepSec
    val lastEval =
      floor((col(tsCol) + (rangeSec - 1)) / lit(stepSec)).cast("long") * stepSec
    val gridStart = Math.floorDiv(start + stepSec - 1, stepSec) * stepSec
    val gridEnd = Math.floorDiv(end, stepSec) * stepSec
    val dec = sum(col(valCol).cast("decimal(28,10)")).cast("double")
    val moments = Seq(
      count(lit(1)).as("n"),
      dec.as("sum_v"),
      (dec / count(lit(1))).as("avg_v"),
      min(col(valCol)).as("min_v"),
      max(col(valCol)).as("max_v"),
      max(struct(col(tsCol), col(valCol))).getField(valCol).as("last_v"),
      // present_over_time: the group exists only when ≥ 1 inner point
      // lands in the window, so presence is the constant 1.0
      max(lit(1.0)).as("present_v")) ++
      // quantile_over_time: exact linear-interpolation percentile (the
      // same Percentile the quantile rule family oracles against
      // DuckDB's quantile_cont) — computed only when asked, so the
      // moment-only plans stay sort-free
      quantile.map(qv =>
        round(percentile(col(valCol), lit(qv)), 6).as("q_v")) ++
      // stddev/stdvar over the window: the overTimeBy integer-spread
      // exactness scheme, at MICRO grain because the inner value is
      // 6-decimal quantized (the counter family's round(…,6)) — lossless
      // integer micro sums, fixed double op order mirrored 1:1 in the
      // oracle SQL, round(…,6) absorbing ULP. Callers must only enable
      // this for quantized inner value columns.
      (if (!spread) Seq.empty else {
        val m = round(col(valCol) * 1e6).cast("long")
        Seq(sum(m).as("__sum_m"),
          sum((m.cast("decimal(19,0)") * m.cast("decimal(19,0)")))
            .as("__sum2_m"))
      }) ++
      // mad_over_time: exact median absolute deviation of the window's
      // inner values — the per-(group, eval) median rides a window
      // percentile on the SAME partitioning as the groupBy (exchange
      // reused, the madBy scheme), the deviation median is one more
      // exact percentile, tie-free floor-rounded
      (if (!mad) Seq.empty
      else Seq((floor(percentile(abs(col(valCol) - col("__med")),
        lit(0.5)) * 1e6 + lit(0.5)) / 1e6).as("mad_v")))
    val exploded0 = frame
      .withColumn("e0", greatest(firstEval, lit(gridStart)))
      .withColumn("e1", least(lastEval, lit(gridEnd)))
      .where(col("e0") <= col("e1"))
      .withColumn("__out_ts",
        explode(sequence(col("e0"), col("e1"), lit(stepSec))))
    val exploded = if (!mad) exploded0 else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col) :+ col("__out_ts"): _*)
      exploded0.withColumn("__med",
        percentile(col(valCol), lit(0.5)).over(w))
    }
    val out = exploded
      .groupBy(keyCols.map(col) :+ col("__out_ts"): _*)
      .agg(moments.head, moments.tail: _*)
      .withColumnRenamed("__out_ts", "eval_ts")
    if (!spread) out
    else {
      val n = col("n").cast("double")
      val meanM = col("__sum_m").cast("double") / n
      val stdvar =
        (col("__sum2_m").cast("double") / n - meanM * meanM) / 1e12
      // tie-free 6-decimal rounding: floor(x*1e6 + 0.5)/1e6 in pure
      // double ops — Spark's round() (BigDecimal HALF_UP on the shortest
      // decimal repr) and DuckDB's round() (float multiply + half-away)
      // disagree on values whose *1e6 product lands exactly on .5; this
      // formulation is the same IEEE op sequence on both engines, so it
      // cannot diverge (and it clamps the -epsilon variance fp artifact
      // to exactly 0 on both sides)
      def r6(c: org.apache.spark.sql.Column) =
        floor(c * 1e6 + 0.5) / 1e6
      out
        .withColumn("stdvar_v", r6(stdvar))
        .withColumn("stddev_v", r6(sqrt(stdvar)))
        .drop("__sum_m", "__sum2_m")
    }
  }

  /** Counter/trend functions OVER a computed subquery frame — the outer
    * half of `rate/increase/delta/idelta/irate/resets/changes/deriv/
    * predict_linear( <computed-vector>[range:step] )`, consuming the
    * same (keys, eval_ts, value) frames the `*_over_time` outers do
    * (slidingIncreaseBy / slidingMomentIncreaseBy / slidingOverTimeBy
    * output). Semantics: the inner eval points in each outer window
    * `(T − rangeSec, T]` form the range vector; pairwise functions
    * (rate/increase/resets/changes/idelta/irate) use consecutive inner
    * points whose BOTH ends lie in the window (the range-vector rule —
    * unlike the raw-sample sliding family, whose delta attribution
    * follows the newer sample only); regression/endpoint functions
    * (deriv/predict_linear/delta) use all points in the window.
    *
    * Exactness: inner values are 6-decimal quantized by construction
    * (every frame column this accepts — the spread gate's set), so the
    * decimal(28,10) cast is lossless, deltas/sums are exact decimals,
    * the regression runs on exact integer micros (the
    * [[slidingPredictLinear]] scheme at micro grain), and every final
    * rate-like value rounds through the tie-free floor(x·1e6+0.5)/1e6.
    * Plan: one lag window at label grain over the inner frame, one
    * explode to covering outer evals, ONE hash aggregation — label-
    * grain everywhere, never sample-cardinality.
    */
  private[graft] def counterOverFrame(
      frame: org.apache.spark.sql.DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valCol: String,
      start: Long,
      end: Long,
      stepSec: Long,
      rangeSec: Long,
      fn: String,
      horizonSec: Long = 0L): org.apache.spark.sql.DataFrame = {
    require(rangeSec > 0 && stepSec > 0, "rangeSec and stepSec must be > 0")
    val firstEval =
      floor((col(tsCol) + (stepSec - 1)) / lit(stepSec)).cast("long") * stepSec
    val lastEval =
      floor((col(tsCol) + (rangeSec - 1)) / lit(stepSec)).cast("long") * stepSec
    val gridStart = Math.floorDiv(start + stepSec - 1, stepSec) * stepSec
    val gridEnd = Math.floorDiv(end, stepSec) * stepSec
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol))
    def r6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5) / 1e6
    val lagged = frame
      .withColumn("__v", col(valCol).cast("decimal(28,10)"))
      .withColumn("__pv", lag("__v", 1).over(w))
      .withColumn("__pt", lag(tsCol, 1).over(w))
      .withColumn("e0", greatest(firstEval, lit(gridStart)))
      .withColumn("e1", least(lastEval, lit(gridEnd)))
      .where(col("e0") <= col("e1"))
      .withColumn("__T",
        explode(sequence(col("e0"), col("e1"), lit(stepSec))))
    // a pair is live in window T only when its OLDER end is inside too
    val pin = col("__pt").isNotNull && col("__pt") > col("__T") - rangeSec
    val groupCols = keyCols.map(col) :+ col("__T")
    val out = fn match {
      case "rate" | "increase" =>
        val d = when(col("__v") >= col("__pv"), col("__v") - col("__pv"))
          .otherwise(col("__v"))
        lagged
          .groupBy(groupCols: _*)
          .agg(
            sum(when(pin, lit(1L)).otherwise(lit(0L))).as("n_deltas"),
            sum(when(pin, d)).as("__inc"))
          .where(col("n_deltas") >= 1)
          .withColumn("increase", col("__inc").cast("double"))
          .withColumn("rate_per_sec",
            r6(col("__inc").cast("double") / rangeSec))
          .drop("__inc")
      case "resets" | "changes" =>
        lagged
          .groupBy(groupCols: _*)
          .agg(
            sum(when(pin, lit(1L)).otherwise(lit(0L))).as("n_deltas"),
            sum(when(pin && col("__v") < col("__pv"), 1L).otherwise(0L))
              .as("resets"),
            sum(when(pin && col("__v") =!= col("__pv"), 1L).otherwise(0L))
              .as("changes"))
          .where(col("n_deltas") >= 1)
          .drop(if (fn == "resets") "changes" else "resets")
      case "delta" =>
        lagged
          .groupBy(groupCols: _*)
          .agg(
            count(lit(1)).as("n"),
            (max(struct(col(tsCol), col("__v"))).getField("__v") -
              min(struct(col(tsCol), col("__v"))).getField("__v"))
              .cast("double").as("delta"))
          .where(col("n") >= 2)
      case "idelta" | "irate" =>
        // newest in-window pair: max over (ts, dv, dt) structs of live
        // pairs — null for non-pin rows, max() skips them
        val pair = when(pin, struct(col(tsCol).as("t"),
          (col("__v") - col("__pv")).as("dv"),
          when(col("__v") >= col("__pv"), col("__v") - col("__pv"))
            .otherwise(col("__v")).as("dc"),
          (col(tsCol) - col("__pt")).as("dt")))
        lagged
          .groupBy(groupCols: _*)
          .agg(max(pair).as("__p"))
          .where(col("__p").isNotNull)
          .withColumn("idelta",
            col("__p").getField("dv").cast("double"))
          .withColumn("irate",
            when(col("__p").getField("dt") > 0,
              r6(col("__p").getField("dc").cast("double") /
                col("__p").getField("dt").cast("double"))))
          .drop("__p")
      case "deriv" | "predict_linear" =>
        // exact integer regression at micro grain: the inner values are
        // 6-decimal quantized, so v·1e6 is an exact integer
        val dec = "decimal(20,0)"
        val xp = lit(rangeSec + horizonSec).cast(dec)
        lagged
          .withColumn("x",
            (col(tsCol) - (col("__T") - lit(rangeSec))).cast(dec))
          // decimal × integral literal stays exact decimal arithmetic —
          // a double 1e6 literal would silently promote __v to double
          .withColumn("ym", (col("__v") * lit(1000000L)).cast(dec))
          .groupBy(groupCols: _*)
          .agg(
            count(lit(1)).cast(dec).as("n"),
            sum(col("x")).as("sx"),
            sum(col("ym")).as("sym"),
            sum(col("x") * col("ym")).as("sxym"),
            sum(col("x") * col("x")).as("sxx"))
          .withColumn("numc",
            col("n") * col("sxym") - col("sx") * col("sym"))
          .withColumn("den",
            col("n") * col("sxx") - col("sx") * col("sx"))
          .where(col("n") >= 2 && col("den") =!= 0)
          .withColumn("slope_per_sec",
            col("numc").cast("double") / col("den").cast("double") / 1e6)
          .withColumn("predicted",
            (col("sym") * col("den") +
              col("numc") * (col("n") * xp - col("sx"))).cast("double") /
              (col("n") * col("den")).cast("double") / 1e6)
          .select((keyCols.map(col) :+ col("__T") :+
            col("n").cast("long").as("n") :+ col("slope_per_sec") :+
            col("predicted")): _*)
      case other => throw new IllegalArgumentException(
        s"counterOverFrame does not serve '$other'")
    }
    out.withColumnRenamed("__T", "eval_ts")
  }

  /** Equi-join on `keys` where NULL matches NULL — PromQL's labelset
    * identity for vector matching and set ops. A grouping label can be
    * NULL for series that lack it (a `without`-resolved by-list over a
    * heterogeneous label universe, or an explicit `by` naming a label
    * only some series carry); Prometheus matches such labelsets (absent
    * matches absent), but Spark's USING join compiles to EqualTo and
    * silently drops those groups. `<=>` keys still extract as hash-join
    * keys (ExtractEquiJoinKeys handles EqualNullSafe), so the plan shape
    * is unchanged. The right side's key copies are renamed away before
    * the join; inner joins keep the LEFT side's key columns. */
  private[graft] def nullSafeEquiJoin(
      a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame,
      keys: Seq[String],
      joinType: String = "inner"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    // derive a rename prefix absent from the right frame's columns: a
    // pre-existing __r_<key> column would otherwise produce duplicate
    // names and an ambiguous join condition
    val prefix = Iterator.iterate("__r_")(_ + "_")
      .dropWhile(p => keys.exists(k => b.columns.contains(p + k)))
      .next()
    val renamed = keys.foldLeft(b)((df, k) =>
      df.withColumnRenamed(k, s"$prefix$k"))
    val cond = keys.map(k => col(k) <=> col(s"$prefix$k")).reduce(_ && _)
    val joined = a.join(renamed, cond, joinType)
    if (joinType == "left_semi" || joinType == "left_anti") joined
    else keys.foldLeft(joined)((df, k) => df.drop(s"$prefix$k"))
  }

  /** Conjunctive matcher predicate over a label map column — the Spark form
    * of the reference's per-matcher UNION + cross-matcher INTERSECT over sid
    * sets (index.go:111-143). Regex patterns are anchored `^(?:v)$` like the
    * reference (label.go:88). Negative matchers (not in the reference)
    * match series where the label is absent, Prometheus-style.
    *
    * Regex fast path (the reference's Prometheus fastRegexMatcher,
    * label.go:111-148, applied at plan-build time since the pattern is a
    * plan-time constant): metacharacter-free patterns become equality;
    * `lit.*` / `.*lit` / `.*lit.*` become StartsWith/EndsWith/Contains —
    * codegen'd string predicates instead of regex evaluation per row.
    * Semantics identical for newline-free label values (anchored regex).
    */
  def matcherPredicate(labels: Column, matchers: Seq[LabelMatcher]): Column =
    matcherPredicateWith(labels.getItem(_), matchers)

  /** [[matcherPredicate]] with a caller-chosen label-value resolver, so
    * layouts that carry a label's value as a PLAIN COLUMN can evaluate
    * its matchers against that column instead of a map lookup — see
    * [[Tsdb.factMatcherPredicate]] for the `metric`/`__name__` case.
    */
  private[graft] def matcherPredicateWith(
      resolve: String => Column,
      matchers: Seq[LabelMatcher]): Column =
    matchers.foldLeft(lit(true)) { (acc, m) =>
      val v = resolve(m.name)
      val pos =
        if (m.isRegex) v.isNotNull && regexFastPath(v, m.value)
        else v.isNotNull && v === m.value
      acc && (if (m.negate) !coalesce(pos, lit(false)) else pos)
    }

  private def isLiteral(s: String): Boolean =
    s.forall(c => !"\\.+*?()|[]{}^$".contains(c))

  /** `lit1.*lit2` split: Some((prefix, suffix)) when the pattern is exactly
    * two non-empty literals joined by one `.*` — the reference's
    * optimizeConcatRegex shape (label.go:111-148).
    */
  private def concatParts(p: String): Option[(String, String)] = {
    val i = p.indexOf(".*")
    if (i <= 0) None
    else {
      val (pre, suf) = (p.substring(0, i), p.substring(i + 2))
      if (suf.nonEmpty && isLiteral(pre) && isLiteral(suf)) Some((pre, suf))
      else None
    }
  }

  private def regexFastPath(v: Column, pattern: String): Column = pattern match {
    case p if isLiteral(p) => v === p
    case p if p.endsWith(".*") && isLiteral(p.dropRight(2)) =>
      v.startsWith(p.dropRight(2))
    case p if p.startsWith(".*") && isLiteral(p.drop(2)) =>
      v.endsWith(p.drop(2))
    case p if p.startsWith(".*") && p.endsWith(".*") &&
        p.length >= 4 && isLiteral(p.substring(2, p.length - 2)) =>
      v.contains(p.substring(2, p.length - 2))
    case p if concatParts(p).isDefined =>
      // `lit1.*lit2` (the reference's optimizeConcatRegex): exact iff the
      // value starts with lit1, ends with lit2, AND is long enough that the
      // two literals don't overlap — all codegen'd string ops, no regex
      val (pre, suf) = concatParts(p).get
      v.startsWith(pre) && v.endsWith(suf) &&
        length(v) >= pre.length + suf.length
    case p => v.rlike("^(?:" + p + ")$")
  }

  /** Attach an existing long-format DataFrame as an in-memory TSDB — used to
    * run the TSDB query surface over external tables (e.g. the shared
    * `events` table) without copying storage.
    */
  def attach(
      spark: SparkSession,
      rows: DataFrame,
      conf: TsdbConf = TsdbConf(dataPath = "", onlyMemoryMode = true)): Tsdb = {
    val t = new Tsdb(spark, conf.copy(onlyMemoryMode = true))
    t.insertRows(rows)
    t
  }
}
