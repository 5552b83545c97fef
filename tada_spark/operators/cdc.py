"""Change-data-capture apply: MERGE a keyed change stream into a base
table — the lakehouse upsert/delete primitive (Delta/Iceberg MERGE INTO
re-expressed as plain DataFrame algebra, so it runs on bare parquet).

Change rows carry (key, seq, op, payload...): op ∈ {'I','U','D'}, seq
orders multiple changes to the same key within the batch (a CDC reader's
log offset). Apply = keep the LATEST change per key (row_number over seq
desc), then: base rows without changes pass through; keys whose latest
op is I/U take the change payload; keys whose latest op is D disappear.

100 TB shape: one window + anti-join + union, ALL keyed on the merge
key — with base and changes bucketed by key this is the zero-extra-
shuffle daily merge; the change batch is delta-sized, never base-sized.
Ties on (key, seq) break deterministically by op desc — 'U' > 'I' > 'D'
lexicographically, so an equal-seq update beats a delete — and replayed
logs converge to the same table either way (a well-formed CDC reader
never emits two ops at one (key, seq); the tie-break just pins the
degenerate case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    *,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change batch to ``base``. ``changes`` must have the
    base's columns plus ``seq_col`` and ``op_col``; returns the merged
    table with the base's schema."""
    payload = [c for c in base.columns]
    w = Window.partitionBy(key).orderBy(F.col(seq_col).desc(), F.col(op_col).desc())
    latest = (
        changes.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )
    untouched = base.join(latest.select(key), key, "left_anti")
    # An op outside {I, U, D} (NULL, lowercase, corrupt) must fail
    # LOUDLY: the anti-join above already removed the key from base,
    # so silently excluding the row here — what a plain op != 'D'
    # filter does to NULL — would DELETE the key as a side effect of
    # bad data. raise_error fires per offending row at runtime.
    keep = F.when(
        F.col(op_col).isin("I", "U", "D"), F.col(op_col) != "D"
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("apply_changes: unknown op '"),
                F.coalesce(F.col(op_col), F.lit("NULL")),
                F.lit("' (expected I/U/D) for key "),
                F.col(key).cast("string"),
            )
        ).cast("boolean")
    )
    applied = latest.filter(keep).select(*payload)
    return untouched.unionByName(applied)


def scd2_history(
    changes: DataFrame,
    key: str,
    *,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Build the SCD-type-2 HISTORY table from a CDC change stream: one
    row per version with its validity interval in sequence space —
    valid_from = the change's seq, valid_to = the NEXT change's seq
    (null = still open), is_current = open AND not superseded by a
    delete. Delete rows close their predecessor (via the successor
    lookup) and emit no version themselves.

    One keyed window (LEAD over seq) — delta-sized work, the same
    merge-key partitioning as apply_changes, so the daily history
    append co-locates with the merge."""
    w = Window.partitionBy(key).orderBy(F.col(seq_col).asc(), F.col(op_col).asc())
    with_next = changes.withColumn("__next_seq__", F.lead(seq_col).over(w))
    return (
        with_next.filter(F.col(op_col) != "D")
        .select(
            *[c for c in changes.columns if c not in (op_col,)],
            F.col("__next_seq__").alias("valid_to"),
            F.col("__next_seq__").isNull().alias("is_current"),
        )
        .withColumnRenamed(seq_col, "valid_from")
    )


def column_churn(
    old: DataFrame,
    new: DataFrame,
    key: str,
    cols: list[str],
) -> DataFrame:
    """Column-level churn between two snapshots: for every tracked
    column, how many matched keys changed value (null-safe: null→value
    and value→null both count; null→null does not). The drill-down
    companion of snapshot_diff's row-level added/removed/changed.

    ONE inner equi-join on the key + ONE aggregate computing every
    column's change count as a conditional sum; the per-column report
    rows inline from a single aggregate row (the validate() device) —
    one scan of each side no matter how many columns are tracked."""
    o = old.select(key, *[F.col(c).alias(f"__o_{c}__") for c in cols])
    n = new.select(key, *[F.col(c).alias(f"__n_{c}__") for c in cols])
    joined = o.join(n, key)
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for c in cols:
        changed = ~F.col(f"__o_{c}__").eqNullSafe(F.col(f"__n_{c}__"))
        aggs.append(F.count(F.when(changed, F.lit(1))).alias(f"__c_{c}__"))
    row = joined.agg(*aggs)
    reports = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"__c_{c}__").cast("long").alias("n_changed"),
                F.col("__n__").cast("long").alias("n_compared"),
            )
            for c in cols
        ]
    )
    return row.select(F.inline(reports))


def pit_join(
    facts: DataFrame,
    history: DataFrame,
    key: str,
    pos_col: str,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time (feature-store) join: each fact row picks the
    SCD2 version whose validity interval covers its position —
    valid_from ≤ pos < valid_to, valid_to NULL = still open — and
    carries NULLs when no version covers it (before the first insert,
    or after a delete closed the last interval). The training-data
    primitive that prevents feature leakage: a fact may only see
    attribute values that were current when it happened.

    Implemented as the asof union-stream carry, not an interval join:
    versions and facts union into one per-key stream ordered by
    (pos, kind) with versions first on ties (a fact AT valid_from sees
    the new version, matching the closed-open interval), a single
    last(ignorenulls) window carries the latest version struct onto
    each fact, and the valid_to check voids carried versions a delete
    closed. ONE shuffle on the key, no row multiplication — the naive
    range join the oracle runs is |F|×|versions-per-key|.

    Output: every fact column, then the history's value columns
    (everything except key/interval bookkeeping) plus valid_from —
    NULL when uncovered.

    Degenerate histories: if two versions share (key, valid_from), the
    greatest version struct (field-wise: valid_to NULLs-first, then the
    value columns) wins, deterministically — unless a value column is
    map-typed (unorderable), in which case the pick is arbitrary and
    callers must keep (key, valid_from) unique. A SQL range-join oracle
    would instead emit BOTH rows for such a tie; well-formed SCD2 never
    has one."""
    val_cols = [
        c
        for c in history.columns
        if c not in (key, valid_from, valid_to, "is_current")
    ]
    clash = [c for c in val_cols if c in facts.columns]
    if valid_from in facts.columns:
        clash.append(valid_from)  # the output re-emits history's valid_from
    if clash:
        raise ValueError(
            f"pit_join: history value column(s) {clash} collide with fact "
            f"columns — rename one side before joining"
        )
    # history rows with a NULL key or NULL valid_from can never cover a
    # fact in the oracle's NULL-false range join — and unfiltered they
    # WOULD here (the window groups NULL keys together and sorts a NULL
    # __pos__ first, so last(ignorenulls) carries them onto every
    # fact). NULL-key/pos FACTS stay: they form their own partition /
    # sort ahead of every version, carry nothing, and emit with NULL
    # features — exactly the oracle's LEFT JOIN miss.
    # filter on the TRY_CAST position: a valid_from that does not cast
    # to long (e.g. an unparseable string) must drop exactly like a
    # NULL — with plain cast it would either throw under ANSI or sort
    # its NULL __pos__ first and cover every fact with ANSI off
    history = history.filter(
        F.col(key).isNotNull() & F.col(valid_from).try_cast("long").isNotNull()
    )
    ver = history.select(
        F.col(key),
        F.col(valid_from).try_cast("long").alias("__pos__"),
        F.lit(0).alias("__kind__"),
        F.struct(
            F.col(valid_from).try_cast("long").alias("__vf__"),
            F.col(valid_to).try_cast("long").alias("__vt__"),
            *[F.col(c) for c in val_cols],
        ).alias("__ver__"),
    )
    fact_cols = [c for c in facts.columns if c not in (key, pos_col)]
    ver_type = ver.schema["__ver__"].dataType
    # __pos__ is the long-cast ORDERING key; the original pos column
    # rides along untouched so the output keeps its type and value
    # (a timestamp pos must come back a timestamp, and an uncastable
    # pos value must not silently null the passthrough column)
    fct = facts.select(
        F.col(key),
        F.col(pos_col).try_cast("long").alias("__pos__"),
        F.col(pos_col).alias("__pos_orig__"),
        F.lit(1).alias("__kind__"),
        F.lit(None).cast(ver_type).alias("__ver__"),
        *[F.col(c) for c in fact_cols],
    )
    ver_padded = ver.select(
        key, "__pos__", "__kind__", "__ver__",
        F.lit(None).cast(facts.schema[pos_col].dataType).alias("__pos_orig__"),
        *[F.lit(None).cast(facts.schema[c].dataType).alias(c) for c in fact_cols],
    )
    u = ver_padded.unionByName(fct)
    # Tiebreak for degenerate histories with two versions at one
    # (key, valid_from): order by the version struct itself (field-wise
    # — valid_to first, then value columns), so the greatest struct is
    # the one last(ignorenulls) carries, deterministically on every
    # run/partitioning. Facts have a NULL __ver__ and sort before the
    # versions at their (pos, kind) slot, which changes nothing — kind
    # already separates them. Struct ordering requires every field to
    # be orderable; a value column of a non-orderable type (map,
    # calendar interval, variant, ...) falls back to the bare
    # (pos, kind) order, where such ties pick an arbitrary version —
    # keep (key, valid_from) unique per key in that case. Orderability
    # is a WHITELIST of known-sortable leaves, not a map blacklist: an
    # unknown type must degrade to the old behavior, never crash the
    # window at analysis.
    from pyspark.sql import types as T

    _ORDERABLE_LEAVES = (
        T.NumericType, T.StringType, T.BinaryType, T.BooleanType,
        T.DateType, T.TimestampType, T.TimestampNTZType,
        T.DayTimeIntervalType, T.YearMonthIntervalType, T.NullType,
    )

    def _orderable(dt) -> bool:
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        return isinstance(dt, _ORDERABLE_LEAVES)

    order = ["__pos__", "__kind__"]
    if _orderable(ver_type):
        order.append("__ver__")
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("__c__", F.last("__ver__", ignorenulls=True).over(w))
    covered = F.col("__c__").isNotNull() & (
        F.col("__c__.__vt__").isNull() | (F.col("__c__.__vt__") > F.col("__pos__"))
    )
    return carried.filter(F.col("__kind__") == 1).select(
        F.col(key),
        F.col("__pos_orig__").alias(pos_col),
        *[F.col(c) for c in fact_cols],
        *[F.when(covered, F.col(f"__c__.{c}")).alias(c) for c in val_cols],
        F.when(covered, F.col("__c__.__vf__")).alias(valid_from),
    )
