package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Label-set handling for the TSDB core.
  *
  * Mirrors the reference semantics (capability, not code):
  *  - drop empty label names/values (reference label.go:190-203)
  *  - fold the metric name into the label set as `__name__`
  *    (reference segment.go:126, label.go:221-228)
  *  - stable series identity from metric + sorted labels
  *    (reference tsdb.go:166-168, label.go:235-251)
  *
  * A Spark `MapType(String, String)` column already guarantees unique label
  * names, so only empty-entry filtering is needed for normalization; sorting
  * happens in [[canonicalLabels]] at hash time.
  */
object LabelFunctions {

  /** Reserved label carrying the metric name (reference label.go:12). */
  val MetricLabel = "__name__"

  /** Drop entries with empty/null name or value (reference label.go:190-203). */
  def normalizeLabels(labels: Column): Column =
    map_filter(labels, (k, v) =>
      k.isNotNull && v.isNotNull && k =!= "" && v =!= "")

  /** Fold the metric name into the label map as `__name__`.
    * Callers must run under `spark.sql.mapKeyDedupPolicy=LAST_WIN` so a
    * user-supplied `__name__` label is overwritten, like the reference
    * (label.go:221-228 replaces rather than duplicates).
    */
  def foldMetric(metric: Column, labels: Column): Column =
    map_concat(labels, map(lit(MetricLabel), metric))

  /** Canonical `k=v,k=v` rendering, sorted by label name. Sorting an
    * `array<struct<key,value>>` sorts by key first, which is exactly the
    * name-ordering the reference maintains (label.go:230-232).
    */
  def canonicalLabels(labels: Column): Column =
    concat_ws(",", transform(sort_array(map_entries(labels)),
      e => concat_ws("=", e.getField("key"), e.getField("value"))))

  /** Stable 64-bit series id over the folded, sorted label set.
    * The reference uses xxhash(metric) + "/-/" + xxhash(sorted labels)
    * (tsdb.go:166-168); a single xxhash64 over the canonical rendering is
    * an equivalent stable identity.
    */
  def sidOf(labels: Column): Column = xxhash64(canonicalLabels(labels))

  /** Prometheus-style rendering `{k="v", k2="v2"}`, sorted by name —
    * the reference's LabelSet.String() (label.go:265-280), with `__name__`
    * excluded like the reference's Map() omits nothing but render drops
    * none; we keep all entries for fidelity.
    */
  def renderLabels(labels: Column): Column =
    concat(lit("{"),
      concat_ws(", ", transform(sort_array(map_entries(labels)),
        e => concat(e.getField("key"), lit("=\""), e.getField("value"), lit("\"")))),
      lit("}"))

  /** PromQL `label_replace(v, dst, replacement, src, regex)`: if `regex`
    * matches the ENTIRE value of label `src` (an absent label matches as
    * the empty string, like Prometheus), set label `dst` to `replacement`
    * with `$1`-style capture expansion — and when the expansion is empty,
    * REMOVE `dst` instead of storing an empty-string label, exactly as
    * Prometheus does; otherwise the label set passes through unchanged.
    * Pure map-side column work: no shuffle, no UDF — the anchored `rlike`
    * guard and `regexp_replace` expansion are both codegen'd, and
    * `map_filter` + `map_concat` performs the dst upsert/delete without
    * depending on a session dedup policy.
    */
  /** PromQL `label_join(v, dst, sep, src...)`: set `dst` to the
    * sep-joined values of the source labels (missing sources contribute
    * empty strings, exactly like Prometheus). Pure map-side column math;
    * an all-empty join result removes `dst`, mirroring [[labelReplace]]'s
    * empty-expansion delete semantics.
    */
  def labelJoin(
      labels: Column,
      dst: String,
      sep: String,
      srcs: Seq[String]): Column = {
    require(srcs.nonEmpty, "label_join needs at least one source label")
    val joined = concat_ws(sep,
      srcs.map(s => coalesce(labels.getItem(s), lit(""))): _*)
    val withoutDst = map_filter(labels, (k, _) => k =!= dst)
    when(joined === lit(""), withoutDst)
      .otherwise(map_concat(withoutDst, map(lit(dst), joined)))
  }

  def labelReplace(
      labels: Column,
      dst: String,
      replacement: String,
      src: String,
      regex: String): Column = {
    val anchored = "^(?:" + regex + ")$"
    val v = coalesce(labels.getItem(src), lit(""))
    val expanded = regexp_replace(v, anchored, replacement)
    val withoutDst = map_filter(labels, (k, _) => k =!= dst)
    when(v.rlike(anchored),
      when(expanded === lit(""), withoutDst)
        .otherwise(map_concat(withoutDst, map(lit(dst), expanded))))
      .otherwise(labels)
  }

  /** Time-bucket (segment) id: `floor(tsSeconds / segmentDuration)`.
    * Replaces the reference's `seg-<minTs>-<maxTs>` directories
    * (tsdb.go:154-156) with a partition column Catalyst can prune on.
    */
  def segOf(tsSeconds: Column, segmentDuration: Long): Column =
    floor(tsSeconds / lit(segmentDuration)).cast("long")
}
