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


# ---------------------------------------------------------------------------
# hilbert_key_expr — bit-for-bit vs an independent Python reference
# ---------------------------------------------------------------------------
def _hilbert_ref(n, x, y):
    # classic xy2d quadrant walk (public algorithm, e.g. Wikipedia
    # "Hilbert curve"), written independently of the SQL fold
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_full_grid(spark):
    from mysql_data_anonymizer_spark.sources import layout

    bits = 5
    n = 1 << bits
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    rows = grid.select(
        "x", "y", layout.hilbert_key_expr("x", "y", bits=bits).alias("d")
    ).collect()
    assert len(rows) == n * n
    ds = set()
    for r in rows:
        assert r["d"] == _hilbert_ref(n, r["x"], r["y"])
        ds.add(r["d"])
    # bijection onto [0, n^2): every cell gets a unique curve position
    assert ds == set(range(n * n))


def test_hilbert_consecutive_keys_are_grid_adjacent(spark):
    # THE Hilbert property (and the one Morton lacks): walking the curve
    # moves exactly one grid step at a time
    from mysql_data_anonymizer_spark.sources import layout

    bits = 4
    n = 1 << bits
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    rows = grid.select(
        "x", "y", layout.hilbert_key_expr("x", "y", bits=bits).alias("d")
    ).collect()
    by_d = {r["d"]: (r["x"], r["y"]) for r in rows}
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


# ---------------------------------------------------------------------------
# kcenter_select — greedy farthest-point invariants
# ---------------------------------------------------------------------------
def test_kcenter_selects_farthest_and_assigns_nearest(spark):
    from mysql_data_anonymizer_spark.operators import similarity as S

    # four 2-d points: two tight clusters far apart + an outlier
    rows = [
        (0, [0.0, 0.0]),
        (1, [0.1, 0.0]),
        (2, [10.0, 0.0]),
        (3, [10.1, 0.0]),
        (4, [0.0, 100.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centers, assign = S.kcenter_select(df, k=3, start_id=0, dim=None)
    order = [cid for _, cid in centers]
    # farthest from 0 is the outlier 4; the next pick must come from the
    # far cluster {2, 3} (either member — they differ by 0.1 in min-dist)
    assert order[0] == 0 and order[1] == 4 and order[2] in (2, 3)
    got = {r["vec_id"]: r for r in assign.collect()}
    assert got[1]["center_id"] == 0, "near point joins the 0-cluster"
    assert got[2]["center_rank"] == got[3]["center_rank"], (
        "far-cluster points share the far center"
    )
    for _, cid in centers:
        assert got[cid]["dist2"] == 0.0 and got[cid]["center_id"] == cid


def test_kcenter_missing_start_raises(spark):
    from mysql_data_anonymizer_spark.operators import similarity as S

    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    try:
        S.kcenter_select(df, k=2, start_id=99, dim=None)
        assert False, "expected ValueError"
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# triangle counting — hand-checked graph through the registered query
# ---------------------------------------------------------------------------
def test_triangle_count_hand_graph(spark, tmp_path):
    from mysql_data_anonymizer_spark import queries as Q

    # orders as cliques: order 1 = {10,20,30} (one triangle), order 2 =
    # {10,20,40,50} (C(4,3)=4 triangles), order 3 = {60,70} (none).
    # partkeys are all %10==0 so the query's node sample keeps them.
    rows = []
    for ok, parts in [(1, [10, 20, 30]), (2, [10, 20, 40, 50]), (3, [60, 70])]:
        rows += [(ok, p) for p in parts]
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r["p_partkey"]: r["n_triangles"]
        for r in Q.QUERIES["triangle_count_copurchase"](spark, str(tmp_path)).collect()
    }
    # triangles: {10,20,30} + the 4 inside order 2; node 10 is in
    # {10,20,30},{10,20,40},{10,20,50},{10,40,50} -> 4
    assert got[10] == 4 and got[20] == 4
    assert got[30] == 1
    assert got[40] == 3 and got[50] == 3  # {10,20,40},{10,40,50},{20,40,50}
    assert 60 not in got and 70 not in got


# ---------------------------------------------------------------------------
# ewma_user_events — exact integer semantics on a tiny fixture
# ---------------------------------------------------------------------------
def test_ewma_exact_weights(spark, tmp_path):
    from datetime import datetime

    from mysql_data_anonymizer_spark import queries as Q

    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 7, "a", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 0, 1, 0), 7, "a", 2.0, "{}"),
        (3, datetime(2024, 1, 1, 0, 2, 0), 7, "a", 4.0, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r["event_id"]: r
        for r in Q.QUERIES["ewma_user_events"](spark, str(tmp_path)).collect()
    }
    assert got[1]["n_window"] == 1 and got[1]["ewma_millionths"] == 1_000_000
    # window [1,2]: (1e6*1 + 2e6*2) // 3
    assert got[2]["n_window"] == 2 and got[2]["ewma_millionths"] == 5_000_000 // 3
    # window [1,2,4]: (1e6*1 + 2e6*2 + 4e6*4) // 7 = 3e6
    assert got[3]["n_window"] == 3 and got[3]["ewma_millionths"] == 3_000_000


# ---------------------------------------------------------------------------
# skip-gram pairs — window and direction semantics
# ---------------------------------------------------------------------------
def test_skipgram_window_and_symmetry(spark, tmp_path):
    from mysql_data_anonymizer_spark import queries as Q

    # 'a b c a b' repeated so pairs clear the min_count=5 bar:
    text = " ".join(["a b c"] * 5)
    spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in Q.QUERIES["skipgram_pairs_docs"](spark, str(tmp_path)).collect()
    }
    # adjacent (a,b): 5 occurrences + (b,a) direction listed separately
    assert got[("a", "b")] == got[("b", "a")]
    # distance-2 (a,c) present; distance-3 (e.g. a..a across one period)
    # between consecutive 'a's is distance 3 -> absent
    assert ("a", "c") in got
    assert ("a", "a") not in got


# ---------------------------------------------------------------------------
# bootstrap_ci_events — Poisson-weight construction invariants
# ---------------------------------------------------------------------------
def test_poisson_thresholds_match_analytic_cdf():
    import math

    from mysql_data_anonymizer_spark.queries import _POISSON1_CUM_M

    e = math.exp(-1)
    c = 0.0
    for k, t in enumerate(_POISSON1_CUM_M):
        c += e / math.factorial(k)
        assert t == int(c * 1000000), f"threshold k={k}"


def test_bootstrap_ci_brackets_point_and_is_deterministic(spark):
    from mysql_data_anonymizer_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    a = {r["event_type"]: r for r in Q.QUERIES["bootstrap_ci_events"](spark, sf).collect()}
    b = {r["event_type"]: r for r in Q.QUERIES["bootstrap_ci_events"](spark, sf).collect()}
    assert a.keys() == b.keys() and len(a) > 0
    for k in a:
        assert tuple(a[k]) == tuple(b[k]), "hash-derived bootstrap must replay"
        assert a[k]["boot_reps"] == 20
        assert a[k]["boot_lo_millionths"] <= a[k]["boot_hi_millionths"]
        # the point mean should fall inside (or at worst on) the replica
        # envelope for any non-degenerate group
        assert a[k]["boot_lo_millionths"] <= a[k]["point_mean_millionths"] * 1.02
        assert a[k]["boot_hi_millionths"] >= a[k]["point_mean_millionths"] * 0.98


# ---------------------------------------------------------------------------
# soundex_expr — classic vectors + H/W transparency
# ---------------------------------------------------------------------------
def test_soundex_classic_vectors(spark):
    from mysql_data_anonymizer_spark.operators import text

    cases = {
        "Robert": "R163",
        "Rupert": "R163",
        "Ashcraft": "A261",   # H-transparency: same-code across H merges
        "Ashcroft": "A261",
        "Tymczak": "T522",    # vowel separates same codes -> both kept
        "Honeyman": "H555",
        "Washington": "W252",
        "Pfister": "P236",    # first-letter code merges with same-code run
        "White": "W300",
        "Lee": "L000",
        "": None,
    }
    df = spark.createDataFrame([(k,) for k in cases], "w string")
    got = {
        r["w"]: r["sx"]
        for r in df.select("w", text.soundex_expr(F.col("w")).alias("sx")).collect()
    }
    for w, want in cases.items():
        assert got[w] == want, (w, got[w], want)


# ---------------------------------------------------------------------------
# doc_novelty_bigrams — first-occurrence semantics
# ---------------------------------------------------------------------------
def test_doc_novelty_first_occurrence(spark, tmp_path):
    from mysql_data_anonymizer_spark import queries as Q

    docs = [
        (1, "a b c", "en", "s", 5),      # bigrams {a b, b c}: both novel
        (2, "a b d", "en", "s", 5),      # {a b (seen), b d (novel)} -> 1/2
        (3, "a b c", "en", "s", 5),      # all seen -> 0
        (4, "x", "en", "s", 1),          # no bigrams -> 0/0
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in Q.QUERIES["doc_novelty_bigrams"](spark, str(tmp_path)).collect()
    }
    assert got[1]["n_novel"] == 2 and got[1]["novelty_millionths"] == 1_000_000
    assert got[2]["n_novel"] == 1 and got[2]["novelty_millionths"] == 500_000
    assert got[3]["n_novel"] == 0 and got[3]["novelty_millionths"] == 0
    assert got[4]["n_distinct_bigrams"] == 0 and got[4]["novelty_millionths"] == 0


# ---------------------------------------------------------------------------
# prefix filtering — losslessness + actual pruning on a hand corpus
# ---------------------------------------------------------------------------
def test_prefix_filter_lossless_and_prunes(spark, tmp_path):
    from mysql_data_anonymizer_spark import queries as Q

    # partkeys %10==0 to pass the query's sample predicate; names built so
    # (10,20) is a qualifying near-pair and 30 is unrelated
    rows = [
        (10, "goldenrod lavender spring", "B", "T", 1, 1.0),
        (20, "goldenrod lavender sprint", "B", "T", 1, 1.0),
        (30, "completely different name", "B", "T", 1, 1.0),
    ]
    spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    out = Q.QUERIES["prefix_filter_jaccard_parts"](spark, str(tmp_path)).collect()
    got = {(r["key_a"], r["key_b"]) for r in out}
    assert (10, 20) in got, "prefix filtering must not lose a qualifying pair"
    assert all(30 not in pair for pair in got)
    assert all(r["prefix_pruned_ok"] for r in out), (
        "the prefix index must be strictly smaller than the full index"
    )


# ---------------------------------------------------------------------------
# incremental CC — merge == rebuild on a crafted cross-crawl bridge
# ---------------------------------------------------------------------------
def test_cc_incremental_bridges_old_clusters(spark, tmp_path):
    from mysql_data_anonymizer_spark import queries as Q

    # old crawl (even ids): 0,2 near-dup; 4,6 near-dup. New crawl doc 1 is
    # a near-dup of doc 0 — the odd-id increment must join the OLD cluster
    # through the star edges without recomputing old pairs.
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    docs = [
        (0, base, "en", "s", 1),
        (2, base + " x", "en", "s", 1),
        (4, other, "en", "s", 1),
        (6, other + " y", "en", "s", 1),
        (1, base + " z", "en", "s", 1),  # new crawl, near-dup of 0/2
        (8, "totally unrelated words here nothing shared at all ok", "en", "s", 1),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in Q.QUERIES["cc_incremental_merge"](spark, str(tmp_path)).collect()
    }
    for d in (0, 1, 2):
        assert got[d] == 0, (d, got)
    assert got[4] == got[6] == 4
    assert 8 not in got  # no qualifying pair -> not in the pair graph
    # merge == rebuild, exactly
    from mysql_data_anonymizer_spark.operators import dedup

    pairs = dedup.ngram_jaccard_pairs(
        spark.read.parquet(str(tmp_path / "documents.parquet")),
        "doc_id", "text", n=3, threshold=0.6, max_shingle_df=64,
    ).select("id_a", "id_b")
    rebuild = {
        r["node"]: r["component"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == rebuild, "incremental merge must equal the full rebuild"


# ---------------------------------------------------------------------------
# observed_dq_gate_orders — Observation metrics + gate semantics
# ---------------------------------------------------------------------------
def test_observed_dq_gate_flags_bad_rows(spark, tmp_path):
    from mysql_data_anonymizer_spark import queries as Q

    rows = [
        (1, 10, "O", 100.0, "1996-01-01", "1-URGENT"),
        (2, 11, "F", -5.0, "1996-01-02", "2-HIGH"),   # bad: non-positive
        (3, 12, "O", 50.0, "1996-01-03", "3-MEDIUM"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = Q.QUERIES["observed_dq_gate_orders"](spark, str(tmp_path)).collect()
    assert all(r["dq_rows"] == 3 and r["dq_bad_rows"] == 1 for r in out)
    assert all(r["dq_pass"] is False for r in out)
    by_status = {r["o_orderstatus"]: r for r in out}
    assert by_status["O"]["n_orders"] == 2 and by_status["F"]["n_orders"] == 1
