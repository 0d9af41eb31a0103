"""Round-13 (optimization round 2) tests: guards for the operator internals
the r13 optimizations changed — the Observation-fused connected-components
convergence probe and the thread-pooled knn_recall_report."""

import logging

from pyspark.sql import functions as F

from mysql_data_anonymizer_spark import queries as Q
from mysql_data_anonymizer_spark.operators import dedup


# ---------------------------------------------------------------------------
# connected_components — r13 fuses the per-round convergence probe into the
# checkpoint materialization as an Observation (one Spark job per round
# instead of checkpoint + a separate limit(1) probe job). The regression
# risks are (a) the Observation never firing / firing with the wrong count,
# which would exhaust max_iter and log the partial-labels warning on every
# call, and (b) the fused predicate diverging from the old probe's
# (component < __old). Guard both: a multi-round graph must converge with
# NO exhaustion warning and produce exact min-labels.
# ---------------------------------------------------------------------------
def test_cc_observation_convergence_detection(spark, caplog):
    # 12-node path (needs several propagation rounds) + island pair
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)] + [(100, 101)], "id_a long, id_b long"
    )
    with caplog.at_level(logging.WARNING):
        out = {
            r.node: r.component
            for r in dedup.connected_components(edges, max_iter=20).collect()
        }
    expect = {i: 0 for i in range(13)}
    expect.update({100: 100, 101: 100})
    assert out == expect
    assert not [
        r for r in caplog.records if "max_iter" in r.getMessage()
    ], "convergence Observation failed to stop the loop before max_iter"


def test_cc_star_observation_signature_fixpoint(spark, caplog):
    # two triangles bridged — star rounds must reach the signature fixpoint
    # (the Observation-collected (count, xor) pair) well before max_iter
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3)],
        "id_a long, id_b long",
    )
    with caplog.at_level(logging.WARNING):
        out = {
            r.node: r.component
            for r in dedup.connected_components_star(edges, max_iter=30).collect()
        }
    assert out == {i: 0 for i in range(6)}
    assert not [r for r in caplog.records if "max_iter" in r.getMessage()]


# ---------------------------------------------------------------------------
# knn_recall_report — r13 computes the seven per-method hit counts as
# overlapped driver jobs (guide §2.6) and embeds recall_ok as literals (the
# merge_equals_rebuild_ok precedent). The hash-locked contract must not
# drift: same 7 methods, same floors, recall_ok TRUE at fixture scale.
# ---------------------------------------------------------------------------
def test_knn_recall_report_rows_and_floors(spark):
    rows = {
        r["method"]: r
        for r in Q.QUERIES["knn_recall_report"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == set(Q._KNN_RECALL_FLOORS)
    for m, floor in Q._KNN_RECALL_FLOORS.items():
        r = rows[m]
        assert r["certified_floor_hits"] == floor
        assert r["true_pairs"] == 25 and r["k"] == 5
        assert r["floor_recall_millionths"] == 1_000_000 * floor // 25
        assert r["recall_ok"] is True, (m, r)
