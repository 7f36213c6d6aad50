"""Property-based CDC invariants (SURVEY.md §5.5): random change
histories, split at a random point into (bootstrap snapshot, delta) —
the merge of the parts must equal a pure-Python replay of the whole
history. Catches coalesce, tie-break, and empty-side bugs that a fixed
fixture never exercises."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from flink_etl_spark.operators.merge import cdc_merge, dedup_latest

SCHEMA = "id long, es long, ts long, type string, city string, province string"


@st.composite
def histories(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    ops = []
    for i in range(n):
        key = draw(st.integers(min_value=0, max_value=5))
        op = draw(st.sampled_from(["INSERT", "UPDATE", "DELETE"]))
        city = draw(st.sampled_from(["ham", "muc", "ber", "cgn"]))
        # es monotonic in op order (CDC stream order: the delta is newer
        # than the snapshot); ts = unique log sequence for tie-breaks
        ops.append((key, (i // 3) * 1000, i, op, city, f"p{key % 3}"))
    split = draw(st.integers(min_value=0, max_value=n))
    return ops, split


def _replay(ops):
    """Pure-Python model: latest op per key by (es, ts)."""
    best = {}
    for row in ops:
        k = row[0]
        if k not in best or (row[1], row[2]) > (best[k][1], best[k][2]):
            best[k] = row
    return best


def _merged_rows(spark, ops, split, drop_deletes):
    prefix, suffix = ops[:split], ops[split:]
    empty = spark.createDataFrame([], SCHEMA)
    snapshot = (
        dedup_latest(spark.createDataFrame(prefix, SCHEMA), ["id"],
                     order_by=["es", "ts"])
        if prefix else empty
    )
    delta = (
        dedup_latest(spark.createDataFrame(suffix, SCHEMA), ["id"],
                     order_by=["es", "ts"])
        if suffix else empty
    )
    merged = cdc_merge(snapshot, delta, ["id"], drop_deletes=drop_deletes)
    return {tuple(r) for r in merged.collect()}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(h=histories())
def test_merge_equals_full_replay(spark, h):
    ops, split = h
    got = _merged_rows(spark, ops, split, drop_deletes=False)
    expected = set(map(tuple, _replay(ops).values()))
    assert got == expected


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(h=histories())
def test_merge_drop_deletes_extension(spark, h):
    """With drop_deletes=True, a key whose LATEST DELTA op is DELETE
    disappears; a key deleted only in the snapshot half keeps its
    DELETE row (the reference's faithful keep-deletes behavior applies
    to the bootstrap)."""
    ops, split = h
    got = _merged_rows(spark, ops, split, drop_deletes=True)
    prefix_model = _replay(ops[:split])
    suffix_model = _replay(ops[split:])
    expected = {}
    for k, row in prefix_model.items():
        expected[k] = row
    for k, row in suffix_model.items():
        if row[3] == "DELETE":
            expected.pop(k, None)
        else:
            expected[k] = row
    assert got == set(map(tuple, expected.values()))
