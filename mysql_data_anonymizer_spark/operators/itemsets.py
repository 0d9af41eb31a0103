"""Frequent-itemset mining (pairwise association rules) at shuffle scale.

Co-occurrence counting is the classic quadratic trap: generating every
item pair inside every basket is Sum(basket_size^2) rows, and one
pathological mega-basket (a crawler account touching 10^5 items) emits
10^10 pairs from a single group. ``frequent_pairs`` applies the two
standard bounds BEFORE the pair join:

- **A-priori pruning** (Agrawal & Srikant, VLDB 1994): a pair can only
  reach min_support if BOTH items do — one hash aggregate computes item
  frequencies and the infrequent tail (the vast majority under any Zipfian
  reality) never enters the join.
- **Basket cap**: baskets keep their ``max_basket`` smallest item ids
  (deterministic, so both engines agree); anything larger is a bot/outlier
  whose pair set is noise. The cap is REQUIRED at 100 TB — it turns the
  worst case from Sum(n_b^2) unbounded into <= max_basket * Sum(n_b).

The pair generation itself is a basket-keyed self-equi-join (one shuffle on
the basket id, never a cartesian), and the support count is an ordinary
map-side-combinable aggregate on the (item, item) key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int,
    max_basket: int = 50,
) -> DataFrame:
    """Item pairs co-occurring in at least ``min_support`` baskets.

    Returns ``(item_1, item_2, support)`` with ``item_1 < item_2``. NULL
    items/baskets drop out naturally (NULL never equi-joins or orders)."""
    items = df.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("it")
    ).distinct()
    freq = (
        items.groupBy("it")
        .agg(F.count(F.lit(1)).alias("item_n"))
        .where(F.col("item_n") >= min_support)
        .select("it")
    )
    pruned = items.join(freq, "it", "left_semi")
    # posting-list pair generation: one per-basket aggregate collects the
    # sorted item set, the cap is a slice of its smallest ids (identical
    # to the previous row_number <= cap over orderBy it — items is
    # distinct, so set == list), and ordered pairs explode MAP-SIDE from
    # each list. Replaces the basket-keyed self-equi-join, whose two
    # identical capped subtrees (distinct + freq + semi-join + window)
    # were each evaluated once per join side. Memory honesty: the
    # collect_set buffer is O(pruned basket items) per group BEFORE the
    # cap slices it (a 10^6-item bot basket holds a ~16 MB heap buffer;
    # ObjectHashAggregate falls back to sort-based aggregation under
    # pressure) — same asymptotic class as the sort the old window paid,
    # and the a-priori semi-join has already dropped the infrequent tail
    # before anything is collected.
    lists = pruned.groupBy("bk").agg(
        F.slice(F.sort_array(F.collect_set("it")), 1, max_basket).alias("its")
    )
    pair_expr = F.expr(
        "flatten(transform(its, (x, i) ->"
        " transform(slice(its, i + 2, size(its)),"
        " y -> struct(x AS item_1, y AS item_2))))"
    )
    pairs = lists.where(F.size("its") >= 2).select(F.explode(pair_expr).alias("p"))
    return (
        pairs.groupBy(
            F.col("p.item_1").alias("item_1"), F.col("p.item_2").alias("item_2")
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_support)
    )
