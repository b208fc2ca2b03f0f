package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The label grouping a streaming rule shards its state by — shared by
  * [[AlertStream]], [[RecordStream]] and [[CounterState]] so every rule
  * family keys and labels its output identically.
  *
  * [[Grouping.By]] is the classic `by (l1, l2)` form: the state key
  * concatenates the listed label values in a self-delimiting
  * length-prefixed encoding with a distinct marker for ABSENT labels (so
  * `{a:null,b:x}` and `{a:x,b:null}` never collide, whatever bytes the
  * values contain), and the output labels map carries exactly the listed
  * keys.
  *
  * [[Grouping.Without]] is the `without (l1, l2)` form, resolved PER ROW:
  * the grouping labelset is the row's own label map minus the excluded
  * keys (and minus `__name__`, which the batch resolver also excludes
  * from the label-key universe — PromQL.labelKeys). This is Prometheus's
  * actual `without` semantics — each series grouped by its remaining
  * labels — and it needs no label-key universe, which a raw stream does
  * not have. The batch twin resolves `without` against the STORE's key
  * universe into an explicit by-list (PromQL.resolveWithout), grouping
  * each series by universe-minus-excluded with NULL for keys it lacks;
  * the two partition rows identically (two label maps agree on
  * universe-minus-excluded with nulls iff their present-key restrictions
  * agree), so batch and stream emit the same groups — the batch output
  * carries null-valued entries for keys a series lacks where the stream
  * omits them, and the engine's label normalization (insert-time
  * normalizeLabels, label.go:190-203 semantics) collapses that
  * representation difference.
  */
private[streaming] sealed trait Grouping {
  /** Deterministic state-key string for a row's `labels` map column. */
  def keyCol(labels: Column): Column

  /** The output labels map for a row's `labels` map column. */
  def labelsCol(labels: Column): Column
}

private[streaming] object Grouping {

  /** Self-delimiting component encoding: `v<charLen>:<string>` for a
    * present string, the bare literal `x` for an absent label. A decoder
    * reads digits up to the first `:` then exactly that many chars, so
    * concatenated components parse back uniquely — NO byte is reserved,
    * and a label name or value containing NUL/U+0001 (or equal to any
    * former sentinel) cannot collide with absence or shift a component
    * boundary.
    */
  private def enc(v: Column): Column =
    concat(lit("v"), length(v).cast("string"), lit(":"), v)

  private val Absent = "x"

  final case class By(labels: Seq[String]) extends Grouping {
    override def keyCol(m: Column): Column =
      if (labels.isEmpty) lit("")
      else concat_ws("", labels.map(l =>
        coalesce(enc(m.getItem(l)), lit(Absent))): _*)

    override def labelsCol(m: Column): Column =
      if (labels.isEmpty) map().cast("map<string,string>")
      else map(labels.flatMap(l => Seq(lit(l), m.getItem(l))): _*)
  }

  final case class Without(excluded: Seq[String]) extends Grouping {
    private val dropped =
      (excluded :+ graft.functions.LabelFunctions.MetricLabel).distinct

    private def filtered(m: Column): Column =
      // the excluded list is small and static: an OR-chain of literal
      // equality tests keeps the lambda codegen-friendly. Explicit
      // null-VALUED entries are dropped too: insert-time normalization
      // (LabelFunctions.normalizeLabels, label.go:190-203 semantics)
      // collapses null-valued and absent labels, and the batch
      // without-resolution groups them identically — an unnormalized
      // stream must not give {k:null} a different state key than {}
      // (or emit the null entry in its output labels).
      map_filter(m, (k, v) =>
        v.isNotNull && !dropped.map(d => k === lit(d)).reduce(_ || _))

    override def keyCol(m: Column): Column =
      // canonical rendering of the SORTED remaining entries: each entry
      // is enc(name) ++ enc(value), so the whole key is self-delimiting
      // — distinct filtered maps get distinct keys for ANY name/value
      // content (map keys are unique, so entry sort order is stable)
      concat_ws("",
        transform(sort_array(map_entries(filtered(m))),
          e => concat(enc(e.getField("key")), enc(e.getField("value")))))

    override def labelsCol(m: Column): Column = filtered(m)
  }

  /** The grouping a parsed aggregation clause compiles to: exactly one
    * of `by`/`without` is non-empty (the parser enforces it); both empty
    * means the global group. */
  def of(by: Seq[String], without: Seq[String]): Grouping =
    if (without.nonEmpty) Without(without) else By(by)
}
