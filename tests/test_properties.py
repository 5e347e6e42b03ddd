"""Property-based tests (hypothesis): the cross-engine determinism
claims hold for ARBITRARY inputs, not just the fixture corpus.

Each example builds one small DataFrame job, so example counts are
kept low; the properties are exact equalities, not statistical."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# printable ASCII minus quotes/backslash keeps the DuckDB literal
# side of the differential trivial to construct safely
_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                           exclude_characters="'\\\""),
    max_size=40,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_poly_hash(s: str) -> int | None:
    if s == "":
        return None  # split('', '') -> [] and the fold over [] is NULL-ish
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % 1_000_000_007
    return acc


@given(strings=st.lists(_TEXT.filter(lambda s: s != ""), min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_poly_hash_matches_python_and_duckdb(spark, strings):
    import duckdb
    from pyspark.sql import functions as F

    from etl_data_lake_spark.functions.text import poly_hash, sql_poly_hash

    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    got = {r.s: r.h for r in df.select("s", poly_hash("s").alias("h")).collect()}
    for s in strings:
        assert got[s] == _py_poly_hash(s), repr(s)
    con = duckdb.connect()
    values = ", ".join(f"('{s}')" for s in set(strings))
    duck = {
        r[0]: r[1]
        for r in con.sql(
            f"SELECT s, {sql_poly_hash('s')} FROM (VALUES {values}) t(s)"
        ).fetchall()
    }
    for s in set(strings):
        assert duck[s] == got[s], repr(s)


@given(
    gaps_min=st.lists(st.integers(min_value=1, max_value=120), min_size=1,
                      max_size=20)
)
@settings(**_SETTINGS)
def test_sessionize_invariants(spark, gaps_min):
    """For a single user with known inter-event gaps: the number of
    sessions is 1 + (#gaps > threshold) and per-session counts sum to
    the event count."""
    from pyspark.sql import functions as F

    from etl_data_lake_spark.operators.windows import sessionize

    base = 1_700_000_000
    ts = [base]
    for g in gaps_min:
        ts.append(ts[-1] + g * 60)
    rows = [(1, t) for t in ts]
    df = spark.createDataFrame(rows, ["user_id", "epoch"]).select(
        "user_id", F.timestamp_seconds(F.col("epoch")).alias("ts")
    )
    sess = sessionize(df, "user_id", "ts", gap_minutes=30).collect()
    expected_sessions = 1 + sum(1 for g in gaps_min if g > 30)
    got_sessions = {r.session_id for r in sess}
    assert len(got_sessions) == expected_sessions
    assert len(sess) == len(ts)  # every event lands in exactly one session


@given(
    texts=st.lists(
        st.text(
            # full unicode incl. multi-byte + every ASCII whitespace class,
            # excluding surrogates (invalid in UTF-8 parquet/arrow transfer)
            alphabet=st.characters(
                max_codepoint=0x2FFF, exclude_categories=("Cs",)
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_shingle_pandas_udf_property(spark, texts):
    """The Arrow-batched shingle hasher equals the JVM expression twin
    for ARBITRARY unicode text, not just the corpus + curated edge docs
    (tokenization whitespace classes, sub-n-token docs, repeats)."""
    from pyspark.sql import functions as F

    from etl_data_lake_spark.functions.text import (
        compose_shingle_hashes,
        poly_hash,
        shingle_hashes_pandas_udf,
        tokens,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    jvm = {
        r.doc_id: list(r.sh)
        for r in df.select(
            "doc_id",
            F.array_distinct(
                compose_shingle_hashes(
                    F.transform(tokens("text"), lambda t: poly_hash(t)), 3
                )
            ).alias("sh"),
        ).collect()
    }
    pnd = {
        r.doc_id: list(r.sh)
        for r in df.select(
            "doc_id", shingle_hashes_pandas_udf(3)(F.col("text")).alias("sh")
        ).collect()
    }
    assert jvm == pnd


@given(
    cents=st.lists(
        st.integers(min_value=-10_000_000, max_value=10_000_000),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_sum_money_exactness(spark, cents):
    """sum_money over any list of 2-decimal values equals the exact
    integer-cent sum — no float accumulation error regardless of
    magnitude mix or sign."""
    from pyspark.sql import functions as F

    from etl_data_lake_spark.functions.money import sum_money

    df = spark.createDataFrame([(c / 100.0,) for c in cents], "x double")
    got = df.agg(sum_money(F.col("x")).alias("s")).collect()[0].s
    assert got == sum(cents) / 100.0


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=0, max_value=15),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_connected_components_matches_union_find(spark, edges):
    """Distributed label propagation equals a sequential union-find on
    arbitrary small graphs (chains, stars, cliques, disjoint unions —
    whatever hypothesis shrinks to)."""
    from etl_data_lake_spark.dedup.cluster import connected_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    # both execution paths must agree with the reference: the default
    # driver-side union-find (small graphs) and the distributed
    # label-propagation loop (local_max_edges=0 forces it)
    got_local = {
        r.doc_id: r.cluster_id
        for r in connected_components(df, max_rounds=40).collect()
    }
    assert got_local == expected
    got_dist = {
        r.doc_id: r.cluster_id
        for r in connected_components(
            df, max_rounds=40, local_max_edges=0
        ).collect()
    }
    assert got_dist == expected
