"""Slowly-changing-dimension (type 2) history and CDC merge.

The reference engine mutates rows in place (src/Anonymizer.php:274-288 —
keyed UPDATEs); an analytics warehouse instead keeps versioned history.
These operators build and incrementally maintain SCD2 history from an
append-only change/event stream:

- ``scd2_history``: full rebuild — collapse consecutive duplicate attribute
  values per key into [valid_from, valid_to) intervals, latest row flagged
  ``is_current``. One keyed window shuffle; no joins.
- ``scd2_merge``: incremental maintenance — fold a new change batch into an
  existing history WITHOUT rescanning the full corpus. Only keys present in
  the batch are touched (semi-join prune), so at 100 TB the cost scales with
  the delta, not the dimension: untouched keys stream through unchanged,
  touched keys (batch keys are typically a tiny fraction) get a per-key
  window re-segmentation.

Determinism: ordering is (ts, tiebreak) with an explicit tiebreak column so
equal timestamps segment identically across engines/runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_history", "scd2_merge"]


def _segments(
    changes: DataFrame,
    key_cols: list[str],
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse consecutive duplicate ``attr_col`` values per key into SCD2
    interval rows. Pure window algebra (gaps-and-islands): flag rows whose
    value differs from the previous one, keep those as segment starts, and
    take ``valid_to`` from the next start via lead()."""
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = (
        F.lag(F.col(attr_col)).over(w).isNull()
        | (F.lag(F.col(attr_col)).over(w) != F.col(attr_col))
    )
    starts = changes.withColumn("__chg", changed).where(F.col("__chg")).drop("__chg")
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    nxt = F.lead(F.col(ts_col)).over(w2)
    return starts.select(
        *key_cols,
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def scd2_history(
    changes: DataFrame,
    key_cols: list[str] | str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Build type-2 history from an append-only change log.

    Output: key cols + (attr, valid_from, valid_to, is_current); one row per
    maximal run of equal ``attr_col`` values per key, ordered by
    (ts, tiebreak). ``valid_to`` is NULL (and ``is_current`` true) for the
    open interval. Exactly one keyed shuffle (the window partition); at
    100 TB this is a single pass over the change log partitioned by key.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    return _segments(changes, keys, attr_col, ts_col, tiebreak_col)


def scd2_merge(
    history: DataFrame,
    batch: DataFrame,
    key_cols: list[str] | str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Fold a change batch into an existing SCD2 history incrementally.

    Semantics: ``scd2_merge(scd2_history(log), delta, ...)`` is row-identical
    to ``scd2_history(log UNION delta)`` (property-tested), but only the keys
    appearing in ``delta`` are re-segmented:

    1. split history on membership of the batch's key set (broadcast
       semi/anti join — the batch key list is small by assumption);
    2. untouched keys pass through verbatim (no shuffle, no window);
    3. touched keys: re-expand their history rows back to change events
       (valid_from carries the original ts; the stored tiebreak ordering is
       preserved via valid_from ordering), union with the batch, and
       re-segment with the same window.

    Contract (standard CDC append discipline): the batch is append-only per
    key — every batch timestamp is >= that key's open-interval
    ``valid_from``. History rows only retain segment STARTS (interior
    duplicate events are collapsed away), so a batch event landing strictly
    inside a closed run cannot re-split it the way a full rebuild from the
    raw log would; backfilling late data that old requires rebuilding the
    affected keys from the log. Within the batch itself, out-of-order rows
    are fine — touched keys are re-segmented by (ts, tiebreak) from scratch.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    batch_keys = batch.select(*keys).distinct()
    untouched = history.join(F.broadcast(batch_keys), keys, "left_anti")
    touched = history.join(F.broadcast(batch_keys), keys, "left_semi")
    # re-expand touched history to (key, attr, ts, tiebreak) change events;
    # segment starts are themselves a valid change log for re-segmentation.
    replay = touched.select(
        *keys,
        F.col(attr_col),
        F.col("valid_from").alias(ts_col),
        F.lit(0).cast("long").alias(tiebreak_col),
    )
    delta = batch.select(
        *keys,
        F.col(attr_col),
        F.col(ts_col),
        F.col(tiebreak_col).cast("long"),
    )
    rebuilt = _segments(replay.unionByName(delta), keys, attr_col, ts_col, tiebreak_col)
    return untouched.unionByName(rebuilt)
