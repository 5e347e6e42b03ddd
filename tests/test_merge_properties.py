"""Property-based check of the merge/delete row-level machinery: any
random interleaving of keyed merges and range deletes must leave the
table equal to a trivial dict model replay."""

from __future__ import annotations

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_data_lake_spark.sources.merge import merge_into
from etl_data_lake_spark.sources.txn import TxnTable

_KEYS = st.integers(min_value=0, max_value=9)
_VALS = st.integers(min_value=0, max_value=99)

_op = st.one_of(
    st.tuples(
        st.just("merge"),
        st.dictionaries(_KEYS, _VALS, min_size=1, max_size=4),
    ),
    st.tuples(st.just("delete"), _KEYS, _KEYS),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=5))
def test_merge_delete_sequence_equals_dict_model(spark, ops):
    path = tempfile.mkdtemp() + "/t"
    t = TxnTable(spark, path)
    model: dict[int, int] = {}
    for op in ops:
        if op[0] == "merge":
            updates = op[1]
            df = spark.createDataFrame(
                sorted(updates.items()), "k long, v long"
            )
            merge_into(t, df, "k", stats_cols=("k",))
            model.update(updates)
        else:
            _, a, b = op
            lo, hi = min(a, b), max(a, b)
            t.delete_where("k", lo, hi, stats_cols=("k",))
            model = {k: v for k, v in model.items() if not lo <= k <= hi}
    if t.latest_version() == 0:
        assert model == {}
        return
    got = {r.k: r.v for r in t.snapshot().collect()}
    assert got == model


# Round 5: the expr DML forms join the model — random interleavings of
# merges, expr deletes (v-predicates, exercising the no-hint probe
# path), expr updates, and MOR expr deletes must replay identically.

_op5 = st.one_of(
    st.tuples(
        st.just("merge"),
        st.dictionaries(_KEYS, _VALS, min_size=1, max_size=4),
    ),
    st.tuples(st.just("delete_expr"), _KEYS, _KEYS),
    st.tuples(st.just("delete_expr_mor"), _VALS),
    st.tuples(st.just("update_expr"), _KEYS, _VALS),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op5, min_size=1, max_size=5))
def test_expr_dml_sequence_equals_dict_model(spark, ops):
    path = tempfile.mkdtemp() + "/t"
    t = TxnTable(spark, path)
    model: dict[int, int] = {}
    for op in ops:
        if op[0] == "merge":
            updates = op[1]
            df = spark.createDataFrame(
                sorted(updates.items()), "k long, v long"
            )
            merge_into(t, df, "k", stats_cols=("k",))
            model.update(updates)
        elif op[0] == "delete_expr":
            _, a, b = op
            lo, hi = min(a, b), max(a, b)
            t.delete_where_expr(
                f"k BETWEEN {lo} AND {hi}",
                prune_hints={"k": [(lo, hi)]},
                stats_cols=("k",),
            )
            model = {k: v for k, v in model.items() if not lo <= k <= hi}
        elif op[0] == "delete_expr_mor":
            _, vv = op
            t.delete_where_expr_mor(f"v = {vv}")
            model = {k: v for k, v in model.items() if v != vv}
        else:
            _, kk, vv = op
            t.update_where_expr(
                f"k = {kk}", {"v": str(vv)}, stats_cols=("k",)
            )
            if kk in model:
                model[kk] = vv
    if t.latest_version() == 0:
        assert model == {}
        return
    got = {r.k: r.v for r in t.snapshot().collect()}
    assert got == model


# Round 5b: layout maintenance (compact / optimize_zorder /
# analyze_stats) interleaved with data-changing ops must be invisible
# to the final state — and the data ops still replay the dict model.

_op6 = st.one_of(
    st.tuples(
        st.just("merge"),
        st.dictionaries(_KEYS, _VALS, min_size=1, max_size=3),
    ),
    st.tuples(st.just("delete_expr_mor"), _VALS),
    st.tuples(st.just("update_expr"), _KEYS, _VALS),
    st.tuples(st.just("compact")),
    st.tuples(st.just("zorder")),
    st.tuples(st.just("analyze")),
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op6, min_size=2, max_size=5))
def test_maintenance_ops_invisible_to_dict_model(spark, ops):
    path = tempfile.mkdtemp() + "/t"
    t = TxnTable(spark, path)
    model: dict[int, int] = {}
    for op in ops:
        if op[0] == "merge":
            updates = op[1]
            df = spark.createDataFrame(
                sorted(updates.items()), "k long, v long"
            )
            merge_into(t, df, "k", stats_cols=("k",))
            model.update(updates)
        elif op[0] == "delete_expr_mor":
            _, vv = op
            if t.latest_version() > 0:
                t.delete_where_expr_mor(f"v = {vv}")
            model = {k: v for k, v in model.items() if v != vv}
        elif op[0] == "update_expr":
            _, kk, vv = op
            if t.latest_version() > 0:
                t.update_where_expr(
                    f"k = {kk}", {"v": str(vv)}, stats_cols=("k",)
                )
            if kk in model:
                model[kk] = vv
        elif op[0] == "compact":
            if t.latest_version() > 0:
                t.compact(stats_cols=("k",))
        elif op[0] == "zorder":
            if t.latest_version() > 0:
                t.optimize_zorder(("k", "v"), bits=4)
        elif op[0] == "analyze":
            if t.latest_version() > 0:
                t.analyze_stats(("k", "v"))
    if t.latest_version() == 0:
        assert model == {}
        return
    got = {r.k: r.v for r in t.snapshot().collect()}
    assert got == model
