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
