"""Hypothesis property tests for the pure-Python engine logic.

These run WITHOUT a SparkSession (the Python generator twin and the JDBC
partition arithmetic are plain functions), so hypothesis can hammer them
with hundreds of examples at unit-test cost. The Column twins are proven
equal to these by the oracle-gated masking queries, so properties
established here transfer to the distributed path.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from mysql_data_anonymizer_spark.functions.generator import LOCALES, PyRowGenerator

KEYS = st.one_of(st.integers(min_value=0, max_value=10**12), st.uuids().map(str))
LOCALE = st.sampled_from(sorted(LOCALES))


@given(seed=st.integers(0, 2**31 - 1), key=KEYS, locale=LOCALE)
@settings(max_examples=200, deadline=None)
def test_generator_is_deterministic(seed, key, locale):
    a = PyRowGenerator(seed, key, "c", locale=locale)
    b = PyRowGenerator(seed, key, "c", locale=locale)
    for attr in ("email", "name", "city", "company", "ipv4", "uuid", "credit_card_number"):
        assert getattr(a, attr) == getattr(b, attr)


@given(seed=st.integers(0, 2**31 - 1), k1=KEYS, k2=KEYS)
@settings(max_examples=100, deadline=None)
def test_unique_email_injective_on_keys(seed, k1, k2):
    """unique() embeds the pk: distinct keys can never collide (uniqueness
    by construction, replacing the reference's retry loop)."""
    if str(k1) == str(k2):
        return
    a = PyRowGenerator(seed, k1, "c").unique().email
    b = PyRowGenerator(seed, k2, "c").unique().email
    assert a != b


@given(seed=st.integers(0, 2**31 - 1), key=KEYS)
@settings(max_examples=200, deadline=None)
def test_credit_card_passes_luhn(seed, key):
    num = PyRowGenerator(seed, key, "c").credit_card_number
    digits = [int(c) for c in num]
    total = 0
    for i, d in enumerate(reversed(digits), start=1):
        if i % 2 == 0:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    assert total % 10 == 0, num
    assert len(num) == 16 and num.startswith("4")


@given(seed=st.integers(0, 2**31 - 1), key=KEYS, locale=LOCALE)
@settings(max_examples=100, deadline=None)
def test_generator_output_shapes(seed, key, locale):
    g = PyRowGenerator(seed, key, "col", locale=locale)
    assert "@" in g.email and g.email == g.email.lower()
    octets = g.ipv4.split(".")
    assert len(octets) == 4 and all(0 <= int(o) <= 255 for o in octets)
    u = g.uuid
    assert [len(p) for p in u.split("-")] == [8, 4, 4, 4, 12]
    # DOB_BASE 2008-01-01 minus [18y, 18y+72y) days
    assert 1917 <= g.date_of_birth.year <= 1990


@given(
    lower=st.integers(-(10**9), 10**9),
    span=st.integers(0, 10**9),
    n=st.integers(1, 64),
)
@settings(max_examples=200, deadline=None)
def test_jdbc_partition_options_cover_range(lower, span, n):
    """Partitioned-scan options: bounds round-trip as strings and the
    requested partition count survives (Spark slices [lower, upper] into
    numPartitions ranges covering every row)."""
    from mysql_data_anonymizer_spark.sources.jdbc import JdbcConfig, partition_options

    upper = lower + span
    cfg = JdbcConfig(url="jdbc:mysql://127.0.0.1:3306/db", num_partitions=n)
    opts = partition_options(cfg, "id", lower, upper)
    assert int(opts["lowerBound"]) == lower
    assert int(opts["upperBound"]) == upper
    assert int(opts["numPartitions"]) == n
    assert opts["partitionColumn"] == "id"


IDENT = st.from_regex(r"[a-z][a-z0-9_]{0,20}", fullmatch=True)


@given(table=IDENT, staging=IDENT)
@settings(max_examples=200, deadline=None)
def test_swap_ddl_roundtrips_through_parser(table, staging):
    """staging_swap_sql output must always satisfy the parsed swap CONTRACT
    (parse_swap_ddl/assert_swap_contract), for any identifiers and both
    dialects — the property the runtime relies on instead of string
    equality."""
    from mysql_data_anonymizer_spark.sources import sinks

    if staging == table or staging == f"{table}__mda_old":
        return
    for dialect in ("mysql", "ansi"):
        stmts = sinks.staging_swap_sql(table, staging=staging, dialect=dialect)
        sinks.assert_swap_contract(stmts, table, staging)
        sem = sinks.parse_swap_ddl(stmts)
        assert sem["atomic_rename"] == (dialect == "mysql")


@given(
    table=IDENT,
    set_cols=st.lists(IDENT, min_size=1, max_size=5, unique=True),
    pk_cols=st.lists(IDENT, min_size=1, max_size=3, unique=True),
)
@settings(max_examples=200, deadline=None)
def test_update_sql_placeholder_arity(table, set_cols, pk_cols):
    """build_update_sql's placeholder count must equal len(set)+len(pk) in
    order — the contract executemany batches depend on — for any quote."""
    from mysql_data_anonymizer_spark.sources import sinks

    for quote in (None, '"', "`"):
        sql = sinks.build_update_sql(table, set_cols, pk_cols, quote=quote)
        assert sql.count("%s") == len(set_cols) + len(pk_cols)
        assert sql.startswith(f"UPDATE {table} SET ")
        if quote:
            for c in set_cols + pk_cols:
                assert f"{quote}{c}{quote}" in sql


@given(
    target=IDENT,
    staging=IDENT,
    key_cols=st.lists(IDENT, min_size=1, max_size=3, unique=True),
    set_cols=st.lists(IDENT, min_size=1, max_size=5, unique=True),
)
@settings(max_examples=200, deadline=None)
def test_upsert_merge_sql_structure(target, staging, key_cols, set_cols):
    """jdbc_upsert_merge_sql invariants for both dialects: key columns are
    matched and never updated; every set column is updated; the insert
    branch carries every column exactly once."""
    from mysql_data_anonymizer_spark.sources import sinks

    if set(key_cols) & set(set_cols):
        return
    ansi = sinks.jdbc_upsert_merge_sql(target, staging, key_cols, set_cols)
    upd = ansi.split("UPDATE SET", 1)[1].split("WHEN NOT MATCHED", 1)[0]
    for k in key_cols:
        assert f't."{k}" = s."{k}"' in ansi
        assert f'"{k}" =' not in upd
    for c in set_cols:
        assert f'"{c}" = s."{c}"' in upd
    my = sinks.jdbc_upsert_merge_sql(target, staging, key_cols, set_cols, dialect="mysql")
    assert my.count("ON DUPLICATE KEY UPDATE") == 1
    for k in key_cols:
        assert f"`{k}` = VALUES" not in my
    for c in set_cols:
        assert f"`{c}` = VALUES(`{c}`)" in my


# ---------------------------------------------------------------------------
# round 9: prefix-filter losslessness lemma (the math prefix_filter_jaccard
# relies on), EWMA integer bounds + streaming FIFO closure, Poisson table
# ---------------------------------------------------------------------------
def _prefix_len(sz: int, t_pct: int = 45) -> int:
    return sz - ((t_pct * sz + 99) // 100) + 1


@given(
    a=st.sets(st.integers(0, 40), min_size=1, max_size=20),
    b=st.sets(st.integers(0, 40), min_size=1, max_size=20),
    order_seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=300, deadline=None)
def test_prefix_filter_lossless_lemma(a, b, order_seed):
    """Any pair with Jaccard >= t MUST collide within the df-ordered
    prefixes of length |s| - ceil(t|s|) + 1 — the pigeonhole
    prefix_filter_jaccard_parts' recall stands on, under ANY total token
    order (global df ordering is just one)."""
    import random

    inter = len(a & b)
    union = len(a | b)
    if inter * 100 < 45 * union:
        return
    rng = random.Random(order_seed)
    universe = sorted(a | b)
    rng.shuffle(universe)
    pos = {tok: i for i, tok in enumerate(universe)}
    pa = sorted(a, key=pos.get)[: _prefix_len(len(a))]
    pb = sorted(b, key=pos.get)[: _prefix_len(len(b))]
    assert set(pa) & set(pb), (
        f"qualifying pair escaped the prefixes: a={sorted(a)} b={sorted(b)}"
    )


@given(vals=st.lists(st.integers(-(4 * 10**12), 4 * 10**12), min_size=1, max_size=20))
@settings(max_examples=300, deadline=None)
def test_ewma_shift_fold_bounded_by_window(vals):
    """The alpha=1/2 shift-fold EWMA (num = sum v<<i, den = 2^L - 1, DIV)
    both engines compute stays within [min, max] of the window for any
    clamped values — a weighted mean with truncation cannot escape its
    inputs."""
    num = sum(v << i for i, v in enumerate(vals))
    den = (1 << len(vals)) - 1
    # Spark DIV / DuckDB // both truncate toward zero (verified r9)
    q = abs(num) // den * (1 if num >= 0 else -1)
    lo, hi = min(vals), max(vals)
    assert lo - 1 <= q <= hi + 1, (vals, q)


def test_poisson_weight_table_mean_is_one():
    """Summing w(u) = #thresholds <= u over the whole u32%1e6 grid gives
    the exact expected weight; Poisson(1) bootstrap needs mean ~1 or the
    resamples are biased."""
    from mysql_data_anonymizer_spark.queries import _POISSON1_CUM_M

    total = sum(1_000_000 - t for t in _POISSON1_CUM_M)
    mean = total / 1_000_000
    assert 0.999 <= mean <= 1.001, mean


def test_streaming_ewma_update_closure_fifo():
    """The stateful-EWMA state transition (_ewma_fifo_step — the exact
    function the applyInPandasWithState closure calls) maintains a bounded
    FIFO that is batch-split invariant — no Spark needed to pin the state
    machine."""
    import pandas as pd

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)
            self.exists = True

    from mysql_data_anonymizer_spark.streaming.stream_ops import _ewma_fifo_step

    rows = [(i, i * 10, (i * 7919) % 1000) for i in range(50)]  # (id, ts, vm)

    def run(batches):
        state = FakeState()
        out = None
        for batch in batches:
            pdf = pd.DataFrame(batch, columns=["event_id", "ts", "vm"])
            prev = list(state.get[1]) if state.exists else []
            n_seen = state.get[0] if state.exists else 0
            pdf = pdf.sort_values(["ts", "event_id"])
            new = [int(v) for v in pdf["vm"].tolist()]
            n_seen, vals, ewma = _ewma_fifo_step(n_seen, prev, new, 20)
            state.update((n_seen, vals))
            out = (n_seen, len(vals), ewma)
        return out

    whole = run([rows])
    split = run([rows[:17], rows[17:33], rows[33:]])
    assert whole == split, "FIFO state must be batch-split invariant"
    assert whole[0] == 50 and whole[1] == 20

    # Negative values: the transition must truncate toward zero (Spark DIV
    # / DuckDB //), not floor (Python //) — r9 ADVICE caught the mismatch.
    neg_rows = [(i, i * 10, -((i * 7919) % 1000) - 1) for i in range(50)]
    whole_n = run([neg_rows])
    split_n = run([neg_rows[:13], neg_rows[13:37], neg_rows[37:]])
    assert whole_n == split_n
    vals = [r[2] for r in sorted(neg_rows, key=lambda r: (r[1], r[0]))][-20:]
    num = sum(v << i for i, v in enumerate(vals))
    den = (1 << 20) - 1
    expect = -(abs(num) // den) if num < 0 else abs(num) // den
    assert whole_n[2] == expect
    assert num < 0 and num % den != 0, "fixture must exercise the floor-vs-trunc gap"
    assert whole_n[2] == num // den + 1, "trunc-toward-zero differs from Python floor here"


def test_ewma_fifo_step_negative_truncates_toward_zero():
    """-1 DIV 3 = 0 in Spark and DuckDB; _ewma_fifo_step must agree."""
    from mysql_data_anonymizer_spark.streaming.stream_ops import _ewma_fifo_step

    # single value -1 over window 2: num = -1, den = 1 -> -1 (exact)
    _, _, e1 = _ewma_fifo_step(0, [], [-1], 20)
    assert e1 == -1
    # vals [-1, 0]: num = -1<<0 + 0<<1 = -1, den = 3 -> DIV gives 0, floor gives -1
    _, _, e2 = _ewma_fifo_step(0, [], [-1, 0], 20)
    assert e2 == 0, f"expected trunc-toward-zero 0, got {e2}"
    # empty window -> None
    _, _, e3 = _ewma_fifo_step(0, [], [], 20)
    assert e3 is None
