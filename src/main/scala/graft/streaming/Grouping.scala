package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The label grouping a streaming rule shards its state by — shared by
  * [[AlertStream]], [[RecordStream]] and [[CounterState]] so every rule
  * family keys and labels its output identically.
  *
  * [[Grouping.By]] is the classic `by (l1, l2)` form: the state key joins
  * the listed label values on NUL with a distinct sentinel for ABSENT
  * labels (so `{a:null,b:x}` and `{a:x,b:null}` never collide), and the
  * output labels map carries exactly the listed keys.
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

  final case class By(labels: Seq[String]) extends Grouping {
    // NUL joins, U+0001 marks an absent label — label values cannot
    // contain NUL, so distinct by-tuples get distinct keys
    override def keyCol(m: Column): Column =
      if (labels.isEmpty) lit("")
      else concat_ws("\u0000", labels.map(l =>
        coalesce(m.getItem(l), lit("\u0001"))): _*)

    override def labelsCol(m: Column): Column =
      if (labels.isEmpty) map().cast("map<string,string>")
      else map(labels.flatMap(l => Seq(lit(l), m.getItem(l))): _*)
  }

  final case class Without(excluded: Seq[String]) extends Grouping {
    private val dropped =
      (excluded :+ graft.functions.LabelFunctions.MetricLabel).distinct

    private def filtered(m: Column): Column =
      // the excluded list is small and static: an OR-chain of literal
      // equality tests keeps the lambda codegen-friendly
      map_filter(m, (k, _) =>
        !dropped.map(d => k === lit(d)).reduce(_ || _))

    override def keyCol(m: Column): Column =
      // canonical rendering of the SORTED remaining entries: NUL joins
      // entries, U+0001 separates name from value inside one — names
      // and values cannot contain NUL (the by-form key relies on the
      // same invariant), so distinct filtered maps get distinct keys
      concat_ws("\u0000",
        transform(sort_array(map_entries(filtered(m))),
          e => concat_ws("\u0001",
            e.getField("key"), e.getField("value"))))

    override def labelsCol(m: Column): Column = filtered(m)
  }

  /** The grouping a parsed aggregation clause compiles to: exactly one
    * of `by`/`without` is non-empty (the parser enforces it); both empty
    * means the global group. */
  def of(by: Seq[String], without: Seq[String]): Grouping =
    if (without.nonEmpty) Without(without) else By(by)
}
