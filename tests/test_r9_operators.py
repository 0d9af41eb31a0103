"""Round-9 tests: pins for the four r8 ADVICE fixes, then the round-9
operator cohort."""

from pyspark.sql import functions as F

from mysql_data_anonymizer_spark.operators import privacy


# ---------------------------------------------------------------------------
# enforce_k_anonymity — degenerate merged-'*'-group cases (r8 ADVICE)
# ---------------------------------------------------------------------------
def test_enforce_k_single_subk_group_withholds_total(spark):
    # exactly ONE sub-k group: the merged total IS that group's exact size,
    # the precise leak suppression exists to prevent -> group_n must be NULL
    rows = [(1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "B")]
    df = spark.createDataFrame(rows, "id long, qi string")
    out = {r["id"]: r for r in privacy.enforce_k_anonymity(df, ["qi"], k=3).collect()}
    assert out[4]["suppressed"] and out[5]["suppressed"]
    assert out[4]["group_n"] is None and out[5]["group_n"] is None
    assert out[1]["group_n"] == 3  # kept groups still release exact size


def test_enforce_k_merged_total_below_k_withholds_total(spark):
    # two sub-k groups whose merged total is still < k: the '*' group is not
    # a k-crowd, so its size is below the release bar -> NULL
    rows = [(1, "A")] * 0 + [(i, "A") for i in range(1, 7)] + [(7, "B"), (8, "C")]
    df = spark.createDataFrame(rows, "id long, qi string")
    out = {r["id"]: r for r in privacy.enforce_k_anonymity(df, ["qi"], k=5).collect()}
    # B(1) + C(1) merged = 2 < k=5 -> withheld
    assert out[7]["suppressed"] and out[8]["suppressed"]
    assert out[7]["group_n"] is None and out[8]["group_n"] is None


def test_enforce_k_releasable_total_still_released(spark):
    # >= 2 sub-k groups AND merged total >= k: the r7 contract stands
    rows = (
        [(i, "A") for i in range(10)]
        + [(10, "B"), (11, "B")]
        + [(12, "C"), (13, "C")]
    )
    df = spark.createDataFrame(rows, "id long, qi string")
    out = {r["id"]: r for r in privacy.enforce_k_anonymity(df, ["qi"], k=3).collect()}
    for i in (10, 11, 12, 13):
        assert out[i]["suppressed"] and out[i]["group_n"] == 4


# ---------------------------------------------------------------------------
# fuzzy_match_blocked_suppliers — deletion-1 key-union recall (r8 ADVICE)
# ---------------------------------------------------------------------------
def _fuzzy_on(spark, tmp_path, names):
    from mysql_data_anonymizer_spark import queries as Q

    df = spark.createDataFrame(
        [(i + 1, nm) for i, nm in enumerate(names)], "s_suppkey long, s_name string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))
    out = Q.QUERIES["fuzzy_match_blocked_suppliers"](spark, str(tmp_path))
    return {(r["suppkey_a"], r["suppkey_b"]): r["edit_distance"] for r in out.collect()}


def test_fuzzy_blocking_recalls_early_position_edits(spark, tmp_path):
    # the r8 regression: a single drop-last-char key misses every edit that
    # is NOT in the final character; the deletion-1 union must catch all of
    # these distance-1 pairs by construction
    got = _fuzzy_on(
        spark,
        tmp_path,
        [
            "supplier alpha",   # 1
            "Xupplier alpha",   # 2: substitution at position 1
            "suplier alpha",    # 3: deletion mid-word
            "supplier alphaX",  # 4: insertion at the end
            "totally different",  # 5: no pair
        ],
    )
    assert got[(1, 2)] == 1, "substitution at an EARLY position must be blocked together"
    assert got[(1, 3)] == 1, "mid-word deletion must be blocked together"
    assert got[(1, 4)] == 1, "insertion must match via the identity key"
    assert not any(5 in p for p in got), "unrelated names must not pair"


def test_fuzzy_blocking_occupancy_cap_drops_hot_block(spark, tmp_path):
    # 70 identical names: every deletion variant's block exceeds cap=64,
    # so the mass-duplicate cluster yields NO pairs (documented recall loss)
    got = _fuzzy_on(spark, tmp_path, ["same name"] * 70)
    assert got == {}
