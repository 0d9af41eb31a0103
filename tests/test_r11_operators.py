"""Round-11 tests: pins for the r10 ADVICE fixes (mixture overflow regime,
null-safe incremental splits, exact KN tercile cuts), then the round-11
operator cohort."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from mysql_data_anonymizer_spark import queries as Q


# ---------------------------------------------------------------------------
# mixture_alpha_weights — the overflow regime the old BIGINT product wrapped
# in (budget * w_alpha >> 2^63): Spark DECIMAL(38,0), DuckDB HUGEINT, and
# plain Python bigints must all agree exactly.
# ---------------------------------------------------------------------------
def test_mixture_overflow_regime_three_way_exact(spark):
    totals = [
        ("head", 4_600_000_000_000),  # the per-domain radicand ceiling
        ("mid", 3_000_000_000_000),
        ("tail", 100_000_000_000),
    ]
    budget = sum(t for _, t in totals)
    w = {lang: math.isqrt(t * 1_000_000) for lang, t in totals}
    assert budget * max(w.values()) > 2**63, "fixture must exceed int64"
    sum_w = sum(w.values())

    def expect(lang, tot):
        target = (budget * w[lang]) // sum_w
        return (
            tot,
            w[lang],
            (1_000_000 * w[lang]) // sum_w,
            target,
            min(4, max(1, (target + tot - 1) // tot)),
        )

    df = spark.createDataFrame(totals, "lang string, total_tokens long")
    got = {
        r["lang"]: (
            r["total_tokens"],
            r["w_alpha"],
            r["p_millionths"],
            r["target_tokens"],
            r["n_epochs"],
        )
        for r in Q._mixture_from_totals(df).collect()
    }
    for lang, tot in totals:
        assert got[lang] == expect(lang, tot), lang

    vals = ", ".join(f"('{lang}', CAST({t} AS BIGINT))" for lang, t in totals)
    sql = Q._gen_mixture_alpha_sql(
        f"SELECT * FROM (VALUES {vals}) t(lang, total_tokens)"
    )
    for row in duckdb.connect().execute(sql).fetchall():
        assert got[row[0]] == tuple(row[1:]), row[0]


# ---------------------------------------------------------------------------
# _inc_pred / _base_pred — the halves provably partition the corpus even
# with negative and NULL ids (the old `% 2 == 1` left negative-odd and NULL
# rows in NEITHER half)
# ---------------------------------------------------------------------------
def test_inc_split_partitions_corpus_with_negative_and_null_ids(spark):
    ids = [-4, -3, -2, -1, 0, 1, 2, 3, None]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    inc = {r["doc_id"] for r in df.where(Q._inc_pred()).collect()}
    base = {r["doc_id"] for r in df.where(Q._base_pred()).collect()}
    assert inc == {-3, -1, 1, 3}, "pmod folds negative odds into the increment"
    assert base == {-4, -2, 0, 2, None}, "NULL ids land in the base half"
    assert inc | base == set(ids) and not (inc & base)
    # oracle twin: identical membership from the SQL fragment
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in ids])
    sql_inc = {
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM t WHERE COALESCE((doc_id % 2 + 2) % 2, 0) = 1"
        ).fetchall()
    }
    assert sql_inc == inc


def test_drift_merge_equals_rebuild_with_hostile_ids(spark, tmp_path):
    # negative odd + NULL doc_ids: under the old split these rows were in
    # NEITHER half, so the merge silently dropped their tokens while the
    # full-rebuild oracle counted them
    rows = [
        (-3, "alpha beta beta", "en", "src0", 15),
        (-2, "alpha gamma", "en", "src0", 11),
        (None, "beta beta beta", "en", "src1", 14),
        (0, "alpha alpha", "en", "src1", 11),
        (1, "gamma delta", "en", "src2", 11),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    full = {
        tuple(r)
        for r in Q.QUERIES["corpus_drift_tvd"](spark, str(tmp_path)).collect()
    }
    merged = {
        tuple(r)
        for r in Q.QUERIES["drift_incremental_merge"](spark, str(tmp_path))
        .drop("base_not_rescanned_ok")
        .collect()
    }
    assert merged == full, "merge must equal full rebuild on hostile ids"


# ---------------------------------------------------------------------------
# kn_perplexity_docs — rank-based tercile cuts are exact integers and
# deterministic at the boundaries (the float-lerp flip risk is gone)
# ---------------------------------------------------------------------------
def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_kn_tercile_buckets_rank_based(spark, tmp_path):
    # reference trains on doc 0; probes score three distinct levels:
    # seen bigram > unseen-context backoff > unseen-bigram continuation
    _write_docs(
        spark,
        tmp_path,
        [
            ("a b a b a c", "src0"),
            ("a b", "other"),  # highest contrib
            ("z b", "other"),  # middle (pure continuation)
            ("a z", "other"),  # lowest seen-context contrib
        ],
    )
    out = {
        r["doc_id"]: r
        for r in Q.QUERIES["kn_perplexity_docs"](spark, str(tmp_path)).collect()
    }
    scores = sorted(
        (r["kn_score"], d) for d, r in out.items() if r["kn_score"] is not None
    )
    n = len(scores)
    # discrete cuts: c1 at rank ceil(n/3), c2 at rank ceil(2n/3); bucket by
    # strict > comparison — every boundary decision is integer-exact
    c1 = scores[(n + 2) // 3 - 1][0]
    c2 = scores[(2 * n + 2) // 3 - 1][0]
    for d, r in out.items():
        s = r["kn_score"]
        want = (
            "tail"
            if s is None or s <= c1
            else ("middle" if s <= c2 else "head")
        )
        assert r["bucket"] == want, (d, s, c1, c2, r["bucket"])
    # all-scores-equal corpus: ties share one bucket (no lerp wobble)
    _write_docs(
        spark,
        tmp_path,
        [("a b a b a c", "src0")] + [("a b", "other")] * 5,
    )
    out2 = Q.QUERIES["kn_perplexity_docs"](spark, str(tmp_path)).collect()
    nonnull = {r["bucket"] for r in out2 if r["kn_score"] is not None}
    assert len(nonnull) == 1, "equal scores must land in one bucket"
