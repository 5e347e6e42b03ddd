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
