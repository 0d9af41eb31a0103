"""Join extensions, provider/helper registries, integrity verification,
stateful streaming."""

import pytest
from pyspark.sql import functions as F

from mysql_data_anonymizer_spark import Anonymizer
from mysql_data_anonymizer_spark.anonymizer import verify_referential_integrity
from mysql_data_anonymizer_spark.blueprint import Blueprint
from mysql_data_anonymizer_spark.functions import registry
from mysql_data_anonymizer_spark.operators import joins
from mysql_data_anonymizer_spark.plans.compiler import compile_plan


# ------------------------------------------------------------------ joins
def test_as_of_join_basic(spark):
    trades = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 20, 150)], "trade_id long, sym long, ts long"
    )
    quotes = spark.createDataFrame(
        [(10, 90, 1.0), (10, 100, 2.0), (10, 200, 3.0), (20, 400, 9.9)],
        "sym long, qts long, px double",
    )
    out = {
        r.trade_id: r.px
        for r in joins.as_of_join(trades, quotes, "sym", "ts", "qts", ["px"]).collect()
    }
    # trade 1 at ts=100 sees the quote AT 100 (>= semantics); trade 3 has no
    # quote at or before 150 -> NULL (left join)
    assert out == {1: 2.0, 2: 3.0, 3: None}


def test_range_join_banded_matches_naive(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    a = part.select(F.col("p_partkey").alias("id_a"), F.col("p_retailprice").alias("pa"))
    b = part.select(F.col("p_partkey").alias("id_b"), F.col("p_retailprice").alias("pb"))
    banded = {
        (r.id_a, r.id_b)
        for r in joins.range_join_banded(a, b, "pa", "pb", 0.5).where("id_a < id_b").collect()
    }
    naive = {
        (r.id_a, r.id_b)
        for r in a.join(b, (F.col("id_a") < F.col("id_b")) & (F.abs(F.col("pa") - F.col("pb")) <= 0.5)).collect()
    }
    assert banded == naive and banded


# ------------------------------------------------------- provider registry
def test_custom_provider_both_paths(spark, customer):
    registry.register_provider(
        "employee_code",
        lambda g: F.concat(F.lit("EMP-"), F.upper(g.hex_token(6))),
        lambda g: "EMP-" + g.hex_token(6).upper(),
    )
    try:
        bp = Blueprint(
            "customer",
            lambda t: t.primary("c_custkey").column("c_name").replaceWith(
                lambda g: g.employee_code
            ),
        )
        out = compile_plan(customer, bp.plan, seed=9).df.collect()
        assert all(r.c_name.startswith("EMP-") and len(r.c_name) == 10 for r in out)
        # python twin produces identical values
        from mysql_data_anonymizer_spark.functions.generator import PyRowGenerator

        for r in out[:10]:
            assert r.c_name == PyRowGenerator(9, str(r.c_custkey), "c_name").employee_code
    finally:
        registry.unregister_provider("employee_code")


def test_unknown_formatter_raises(spark, customer):
    bp = Blueprint(
        "customer",
        lambda t: t.primary("c_custkey").column("c_name").replaceWith(lambda g: g.nope_fmt),
    )
    with pytest.raises(Exception, match="nope_fmt"):
        compile_plan(customer, bp.plan).df.collect()


def test_register_helpers_sql_callable(spark, customer):
    registry.register_helpers(spark, {"mda_is_vip": lambda bal: bal is not None and bal > 9000}, "boolean")
    bp = Blueprint(
        "customer",
        lambda t: t.primary("c_custkey")
        .column("c_name")
        .where("mda_is_vip(c_acctbal)")
        .replaceWith("VIP"),
    )
    out = compile_plan(customer, bp.plan).df.collect()
    for r in out:
        assert (r.c_name == "VIP") == (r.c_acctbal > 9000)


# ------------------------------------------------- referential integrity
def test_verify_referential_integrity_after_remap(spark, customer, orders):
    anon = Anonymizer(spark)
    anon.register("customer", customer).register("orders", orders)
    anon.table(
        "customer",
        lambda t: t.primary("c_custkey")
        .column("c_custkey")
        .replaceWith(F.col("c_custkey") * 7 + 13)
        .synchronizeColumn(["o_custkey", "orders"]),
    )
    state = anon.run()
    report = verify_referential_integrity(
        state, [("orders", "o_custkey", "customer", "c_custkey")]
    )
    assert report == {"orders.o_custkey": 0}
    # negative control: without remap, integrity breaks
    broken = dict(state)
    broken["orders"] = orders  # original fks vs remapped pks
    report2 = verify_referential_integrity(
        broken, [("orders", "o_custkey", "customer", "c_custkey")]
    )
    assert report2["orders.o_custkey"] > 0


# ------------------------------------------------------ stateful streaming
def test_stateful_user_totals(spark, events, tmp_path):
    import mysql_data_anonymizer_spark.streaming.stream_ops as ms

    path = str(tmp_path / "ev")
    events.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(events.schema).parquet(path)
    q = (
        ms.stateful_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.user_id: (r.n_events, round(r.total_value, 2))
        for r in spark.sql(
            "SELECT user_id, n_events, total_value FROM user_totals"
        ).collect()
    }
    expected = {
        r.user_id: (r.n, round(r.tv, 2))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert got == expected


# ------------------------------------------------------ skew-resistant join
def test_salted_join_matches_plain_join(spark, customer, orders):
    from mysql_data_anonymizer_spark.operators.joins import salted_join

    plain = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "o_orderkey", "c_custkey", "c_name"
    )
    salted = salted_join(orders, customer, "o_custkey", "c_custkey", salt_buckets=8).select(
        "o_orderkey", "c_custkey", "c_name"
    )
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_left_keeps_unmatched(spark, customer, orders):
    from mysql_data_anonymizer_spark.operators.joins import salted_join
    from pyspark.sql import functions as F

    no_dim = customer.filter(F.col("c_custkey") < 0)  # empty dim
    out = salted_join(orders, no_dim, "o_custkey", "c_custkey", salt_buckets=4, how="left")
    assert out.count() == orders.count()


def test_autoload_providers_and_helpers(spark, tmp_path):
    """Directory autoload parity with the reference's provider/helper
    autoloaders (reference src/Anonymizer.php:103-121)."""
    from pyspark.sql import functions as F

    from mysql_data_anonymizer_spark.functions.registry import (
        autoload_helpers,
        autoload_providers,
        unregister_provider,
    )

    (tmp_path / "enum_provider.py").write_text(
        "from pyspark.sql import functions as F\n"
        "PROVIDERS = {'coin': (lambda g: F.lit('heads'), lambda g: 'heads')}\n"
    )
    (tmp_path / "upper_helper.py").write_text("HELPERS = {'mda_upper': lambda s: s.upper()}\n")
    try:
        assert autoload_providers(str(tmp_path)) == ["coin"]
        assert autoload_helpers(spark, str(tmp_path)) == ["mda_upper"]
        from mysql_data_anonymizer_spark.functions.generator import DeterministicGenerator

        gen = DeterministicGenerator(42, F.lit("1"), "c")
        df = spark.range(1).select(gen.coin.alias("v"))
        assert df.collect()[0].v == "heads"
        assert spark.sql("SELECT mda_upper('ab') AS v").collect()[0].v == "AB"
    finally:
        unregister_provider("coin")


# ------------------------------------------------------- faker adapter
def test_faker_adapter_masking_deterministic(spark, customer):
    """The faker provider (real library or FallbackFaker) runs on the
    pandas-UDF path on executors, seeded per pk: two runs must agree."""
    from mysql_data_anonymizer_spark.functions import faker_adapter
    from mysql_data_anonymizer_spark.functions.registry import unregister_provider

    faker_adapter.register_faker_provider()
    try:
        def build(t):
            t.primary("c_custkey").column("c_name").replaceWith(
                lambda g: g.faker.name()
            )

        bp = Blueprint("customer", build)
        a = {(r.c_custkey, r.c_name) for r in compile_plan(customer, bp.plan, seed=7).df.collect()}
        b = {(r.c_custkey, r.c_name) for r in compile_plan(customer, bp.plan, seed=7).df.collect()}
        assert a == b and len(a) == customer.count()
        assert all(" " in name for _, name in a), "faker name() shape"
        # different seed -> (almost surely) different values
        c = {(r.c_custkey, r.c_name) for r in compile_plan(customer, bp.plan, seed=8).df.collect()}
        assert a != c
    finally:
        unregister_provider("faker")


def test_fallback_faker_matches_python_twin(spark, customer):
    """In environments without the faker library, values must equal the
    documented md5 construction (the DuckDB-oracle contract)."""
    from mysql_data_anonymizer_spark.functions import faker_adapter
    from mysql_data_anonymizer_spark.functions.generator import PyRowGenerator
    from mysql_data_anonymizer_spark.functions.registry import unregister_provider

    if faker_adapter.HAS_FAKER:
        pytest.skip("real faker installed; fallback construction not active")
    faker_adapter.register_faker_provider()
    try:
        bp = Blueprint(
            "customer",
            lambda t: t.primary("c_custkey").column("c_name").replaceWith(
                lambda g: g.faker.name()
            ),
        )
        out = compile_plan(customer, bp.plan, seed=42).df.collect()
        fb = faker_adapter.FallbackFaker("en_US")
        for r in out[:10]:
            fb.seed_with(PyRowGenerator(42, str(r.c_custkey), "c_name").digest(":faker"))
            assert r.c_name == fb.name()
    finally:
        unregister_provider("faker")


def test_fallback_faker_consecutive_calls_advance():
    from mysql_data_anonymizer_spark.functions.faker_adapter import FallbackFaker

    fb = FallbackFaker()
    fb.seed_with("abc")
    n1, n2 = fb.name(), fb.name()
    assert n1 != n2, "consecutive calls advance state (Faker parity)"
    fb.seed_with("abc")
    assert fb.name() == n1, "re-seeding resets the stream"


# ------------------------------------------------- bloom-prefiltered join
def test_bloom_prefiltered_join_matches_plain_join(spark, customer, orders):
    from mysql_data_anonymizer_spark.operators.joins import bloom_prefiltered_join
    from pyspark.sql import functions as F

    dim = customer.filter(F.col("c_custkey") % 7 == 0).select("c_custkey", "c_name")
    plain = orders.join(dim, orders.o_custkey == dim.c_custkey).select(
        "o_orderkey", "c_custkey", "c_name"
    )
    pruned = bloom_prefiltered_join(orders, dim, "o_custkey", "c_custkey").select(
        "o_orderkey", "c_custkey", "c_name"
    )
    # bloom has no false negatives and the exact join removes false
    # positives -> result identity with the plain join
    assert pruned.count() == plain.count()
    assert pruned.exceptAll(plain).count() == 0
    assert plain.exceptAll(pruned).count() == 0


def test_bloom_prefilter_actually_prunes(spark, customer, orders):
    from mysql_data_anonymizer_spark.operators import bloom
    from pyspark.sql import functions as F

    dim = customer.filter(F.col("c_custkey") % 7 == 0)
    bits = bloom.build_over(dim, "c_custkey", 1 << 20, 4)
    bc = spark.sparkContext.broadcast(bits)
    hit = bloom.hit_udf(bc, 1 << 20, 4)
    survivors = (
        orders.select(*[c.alias(n) for c, n in zip(bloom.hash_pair(F.col("o_custkey")), ["h1", "h2"])])
        .withColumn("__hit", hit("h1", "h2"))
        .where("__hit")
        .count()
    )
    matching = orders.join(
        dim.select("c_custkey").distinct(), orders.o_custkey == dim.c_custkey, "left_semi"
    ).count()
    total = orders.count()
    assert survivors >= matching  # no false negatives
    # with m=2^20 bits over a tiny key set the FP rate is ~0: the filter
    # must prune the non-matching bulk, not pass everything through
    assert survivors < total
    assert (survivors - matching) <= max(5, 0.01 * total)
