"""URL/domain curation (functions/urls.py, round 12): host extraction
via the JVM parse_url, eTLD+1 reduction as array expressions, per-
domain stats, and broadcast block/allow filters — the first stage of
every public web-corpus pipeline, with the corpus side never
shuffling. The DuckDB twin (DOMAIN_STATS_SQL) is parity-checked in
test_parity::test_library_twin_parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.urls import (
    domain_stats,
    filter_domains,
    registered_domain,
    url_host,
    with_domain,
)


def _hosts(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.h for r in df.select(url_host("url").alias("h")).collect()]


def test_url_host_strips_userinfo_port_and_lowercases(spark):
    got = _hosts(
        spark,
        [
            "https://www.Example.COM/path?q=1",
            "http://u:pw@api.example.org:8080/x",
            "HTTPS://CDN.Example.co.uk:443/",
            "ftp://files.example.io/a/b",
            "not a url",
            None,
        ],
    )
    assert got == [
        "www.example.com",
        "api.example.org",
        "cdn.example.co.uk",
        "files.example.io",
        None,
        None,
    ]


def test_registered_domain_etld1(spark):
    cases = {
        "www.example.com": "example.com",
        "a.b.c.example.com": "example.com",
        "news.bbc.co.uk": "bbc.co.uk",
        "bbc.co.uk": "bbc.co.uk",
        "shop.foo.com.au": "foo.com.au",
        "example.io": "example.io",
        "localhost": "localhost",
        None: None,
    }
    df = spark.createDataFrame(
        [(h,) for h in cases], "host string"
    ).select(
        "host", registered_domain("host").alias("dom")
    )
    got = {r.host: r.dom for r in df.collect()}
    assert got == cases


def test_registered_domain_extra_suffixes(spark):
    df = spark.createDataFrame(
        [("docs.foo.dev.internal",)], "host string"
    )
    default = df.select(registered_domain("host").alias("d")).collect()[0].d
    extended = df.select(
        registered_domain("host", extra_suffixes=("dev.internal",)).alias("d")
    ).collect()[0].d
    assert default == "dev.internal"      # naive 2-label tail
    assert extended == "foo.dev.internal"  # suffix-aware eTLD+1


def _corpus(spark):
    rows = [
        (1, "https://www.good.com/a", "x" * 10),
        (2, "https://cdn.good.com/b", "y" * 20),
        (3, "https://spam.biz/z", "z" * 5),
        (4, "https://news.bbc.co.uk/t", "w" * 8),
        (5, "not a url", "q" * 3),
        (6, "https://good.com/c", "r" * 4),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


def test_domain_stats_groups_by_etld1(spark):
    got = {r.domain: r for r in domain_stats(_corpus(spark)).collect()}
    assert got["good.com"].n_docs == 3
    assert got["good.com"].n_hosts == 3  # www./cdn./apex
    assert got["good.com"].total_chars == 34
    assert got["spam.biz"].n_docs == 1
    assert got["bbc.co.uk"].n_docs == 1
    assert got[None].n_docs == 1  # malformed URLs group under null
    assert abs(got["good.com"].doc_share - 0.5) < 1e-9


def test_filter_domains_blocklist_allowlist(spark):
    corpus = _corpus(spark)
    blocked = filter_domains(corpus, blocklist=["spam.biz"])
    assert {r.doc_id for r in blocked.collect()} == {1, 2, 4, 6}  # 5: null dom
    allowed = filter_domains(corpus, allowlist=["good.com"])
    assert {r.doc_id for r in allowed.collect()} == {1, 2, 6}
    both = filter_domains(
        corpus, blocklist=["good.com"], allowlist=["good.com", "bbc.co.uk"]
    )
    assert {r.doc_id for r in both.collect()} == {4}  # block wins
    # DataFrame-typed list, subdomain matching via eTLD+1
    bl = spark.createDataFrame([("GOOD.com",)], "domain string")
    df_blocked = filter_domains(corpus, blocklist=bl)
    assert {r.doc_id for r in df_blocked.collect()} == {3, 4}
    with pytest.raises(ValueError, match="blocklist and/or an allowlist"):
        filter_domains(corpus)
    with pytest.raises(ValueError, match="exactly one column"):
        filter_domains(corpus, blocklist=corpus.select("doc_id", "url"))


def test_filter_plan_is_broadcast_and_corpus_unshuffled(spark):
    corpus = _corpus(spark)
    plan = filter_domains(
        corpus, blocklist=["spam.biz"], allowlist=["good.com"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert plan.count("Exchange hashpartitioning") == 0, plan


def test_with_domain_keeps_columns(spark):
    out = with_domain(_corpus(spark))
    assert out.columns == ["doc_id", "url", "text", "domain"]
    assert out.where(F.col("doc_id") == 4).collect()[0].domain == "bbc.co.uk"


def test_filter_domains_by_quality(spark):
    """Domain-level quality: a consistently-bad domain (>= min_docs,
    mean below floor) loses ALL its documents — including its one good
    page; a small bad domain passes on insufficient evidence; null
    domains pass through."""
    from etl_data_lake_spark.functions.urls import (
        filter_domains_by_quality,
    )

    rows = (
        [(i, f"https://farm.biz/{i}", 0.1) for i in range(10)]
        + [(100, "https://farm.biz/good", 0.9)]   # drowned by the mean
        + [(i, f"https://good.com/{i}", 0.9) for i in range(200, 210)]
        + [(300, "https://tiny.org/1", 0.0), (301, "https://tiny.org/2", 0.0)]
        + [(400, "not a url", 0.0)]
    )
    df = spark.createDataFrame(rows, "doc_id long, url string, score double")
    kept = {
        r.doc_id
        for r in filter_domains_by_quality(
            df, "score", min_mean_score=0.5, min_docs=5
        ).collect()
    }
    assert all(i not in kept for i in list(range(10)) + [100])
    assert all(i in kept for i in range(200, 210))
    assert {300, 301, 400} <= kept
    assert "score" in df.columns  # input untouched
    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_docs"):
        filter_domains_by_quality(df, "score", min_docs=0)


def test_multilabel_extra_suffixes_respected(spark):
    """Round-12 review fix: the real PSL has 3- and 4-label suffixes;
    a caller-passed suffix of any depth must win over its own shorter
    tails (longest match first)."""
    df = spark.createDataFrame(
        [
            ("myschool.pvt.k12.ma.us",),
            ("pvt.k12.ma.us",),      # a bare suffix has no registrant
            ("deep.a.b.example.com",),
        ],
        "host string",
    )
    extra = ("pvt.k12.ma.us", "k12.ma.us")
    got = {
        r.host: r.d
        for r in df.select(
            "host", registered_domain("host", extra_suffixes=extra).alias("d")
        ).collect()
    }
    assert got["myschool.pvt.k12.ma.us"] == "myschool.pvt.k12.ma.us"
    # the bare 4-label suffix matches its own 3-label tail and takes
    # one more label — the full host, i.e. bare suffixes pass through
    assert got["pvt.k12.ma.us"] == "pvt.k12.ma.us"
    assert got["deep.a.b.example.com"] == "example.com"
    # and the DuckDB twin implements the same longest-first ladder
    import duckdb

    from etl_data_lake_spark.functions.urls import sql_registered_domain

    sql = sql_registered_domain("host", extra_suffixes=extra)
    want = {
        h: duckdb.sql(
            f"SELECT {sql} AS d FROM (SELECT '{h}' AS host)"
        ).fetchone()[0]
        for h in got
    }
    assert {k: v for k, v in got.items()} == want


# ---------------------------------------------------------------------------
# Round 13: full public-suffix-list snapshot support (r12-verdict #5)
# ---------------------------------------------------------------------------

_PSL_SNAPSHOT = """\
// ===BEGIN ICANN DOMAINS===
com
org
uk
co.uk
// country with wildcard registrations
ck
*.ck
!www.ck
jp
// 3-label suffix from the real list
pvt.k12.ma.us
us
k12.ma.us
// ===END ICANN DOMAINS===
// ===BEGIN PRIVATE DOMAINS===
github.io
"""


def _psl():
    from etl_data_lake_spark.functions.urls import parse_psl

    return parse_psl(_PSL_SNAPSHOT.splitlines())


def _domains(spark, hosts, psl):
    from etl_data_lake_spark.functions.urls import registered_domain_psl

    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    return {
        r.host: r.d
        for r in df.select(
            "host", registered_domain_psl("host", psl).alias("d")
        ).collect()
    }


def test_psl_parse_and_load(tmp_path):
    from etl_data_lake_spark.functions.urls import load_psl, parse_psl

    psl = _psl()
    assert "github.io" in psl.exact and "ck" in psl.wildcards
    assert psl.exceptions == ("www.ck",)
    p = tmp_path / "psl.dat"
    p.write_text(_PSL_SNAPSHOT)
    assert load_psl(str(p)) == psl
    # malformed rules raise loudly
    import pytest as _pt

    with _pt.raises(ValueError, match="leftmost"):
        parse_psl(["foo.*.bar"])
    with _pt.raises(ValueError, match="exception"):
        parse_psl(["!tld"])


def test_psl_wildcard_and_exception_rules(spark):
    psl = _psl()
    got = _domains(
        spark,
        [
            "foo.bar.ck",      # *.ck → suffix bar.ck → foo.bar.ck
            "bar.ck",          # IS a wildcard suffix → pass through
            "www.ck",          # exception → registrable www.ck
            "deep.www.ck",     # exception tail → www.ck
            "user.github.io",  # private-section exact rule
            "www.user.github.io",
            "github.io",       # bare suffix → pass through
            "school.pvt.k12.ma.us",        # 3-label suffix +1
            "deep.school.pvt.k12.ma.us",   # longest rule wins over k12.ma.us
            "example.zz",      # unknown TLD → implicit * default
            "a.example.zz",
            "localhost",       # single label passes through
        ],
        psl,
    )
    assert got["foo.bar.ck"] == "foo.bar.ck"
    assert got["bar.ck"] == "bar.ck"
    assert got["www.ck"] == "www.ck"
    assert got["deep.www.ck"] == "www.ck"
    assert got["user.github.io"] == "user.github.io"
    assert got["www.user.github.io"] == "user.github.io"
    assert got["github.io"] == "github.io"
    assert got["school.pvt.k12.ma.us"] == "school.pvt.k12.ma.us"
    assert got["deep.school.pvt.k12.ma.us"] == "school.pvt.k12.ma.us"
    assert got["example.zz"] == "example.zz"
    assert got["a.example.zz"] == "example.zz"
    assert got["localhost"] == "localhost"


def test_psl_parity_with_expression_form_on_builtin_subset(spark):
    """Feeding the code-shipped MULTI_PART_SUFFIXES through the PSL
    path must reproduce registered_domain bit-for-bit (same defaults,
    same bare-suffix pass-through) over the corpus's synthetic hosts
    plus crafted edge hosts."""
    from etl_data_lake_spark.functions.urls import (
        MULTI_PART_SUFFIXES,
        parse_psl,
        registered_domain,
        registered_domain_psl,
        url_host,
    )
    from etl_data_lake_spark.queries.curation_ops import doc_urls
    from etl_data_lake_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    psl = parse_psl(list(MULTI_PART_SUFFIXES))
    hosts = doc_urls(load_table(spark, SF_DIR, "documents")).select(
        url_host("url").alias("host")
    )
    edge = spark.createDataFrame(
        [("co.uk",), ("x.co.uk",), ("deep.x.co.uk",), ("com",),
         ("a.b",), ("single",), (None,)],
        "host string",
    )
    both = hosts.union(edge).select(
        "host",
        registered_domain("host").alias("expr_d"),
        registered_domain_psl("host", psl).alias("psl_d"),
    )
    diff = both.where(
        ~(F.col("expr_d").eqNullSafe(F.col("psl_d")))
    ).collect()
    assert diff == []


def test_psl_plan_is_expression_only(spark):
    psl = _psl()
    from etl_data_lake_spark.functions.urls import with_domain_psl

    df = spark.createDataFrame(
        [(1, "https://a.example.com/x")], "doc_id long, url string"
    )
    plan = (
        with_domain_psl(df, psl)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_cap_per_domain(spark):
    """Round 13: per-domain quota — keeps the top max_docs by the
    given order, drops null-domain rows, single-window plan."""
    from etl_data_lake_spark.functions.urls import cap_per_domain

    rows = [
        (i, f"https://www.farm.com/{i}", float(i)) for i in range(10)
    ] + [
        (100, "https://a.example.org/x", 5.0),
        (101, "https://b.example.org/y", 7.0),
        (102, "not a url", 9.0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, quality double"
    )
    out = cap_per_domain(
        df, [F.desc("quality"), F.asc("doc_id")], max_docs=3
    )
    got = sorted(r.doc_id for r in out.collect())
    # farm.com: top-3 by quality = ids 7,8,9; example.org both fit;
    # the malformed URL drops
    assert got == [7, 8, 9, 100, 101]
    # columns pass through, reserved names raise, validation raises
    assert set(out.columns) == {"doc_id", "url", "quality"}
    import pytest as _pt

    with _pt.raises(ValueError, match="max_docs"):
        cap_per_domain(df, F.desc("quality"), max_docs=0)
    with _pt.raises(ValueError, match="order_by"):
        cap_per_domain(df, None)
    with _pt.raises(ValueError, match="reserved"):
        cap_per_domain(df.withColumn("__dom", F.lit("x")), F.asc("doc_id"))
    # scale pin: Spark prunes hot domains MAP-SIDE via a partial
    # WindowGroupLimit before the one domain shuffle — the hottest
    # partition ships at most max_docs rows per input partition, so
    # the cap is also the skew bound; and no Python anywhere
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert "EvalPython" not in plan and "Join" not in plan, plan


def test_cap_per_domain_with_psl(spark):
    """The psl= grouping treats user.github.io as its own domain."""
    from etl_data_lake_spark.functions.urls import cap_per_domain, parse_psl

    psl = parse_psl(["com", "io", "github.io"])
    rows = [
        (1, "https://alice.github.io/a", 1.0),
        (2, "https://alice.github.io/b", 2.0),
        (3, "https://bob.github.io/c", 3.0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, quality double"
    )
    out = cap_per_domain(
        df, [F.desc("quality"), F.asc("doc_id")], max_docs=1, psl=psl
    )
    # per-USER-site cap: alice keeps her best, bob keeps his —
    # the subset-form would fold both under github.io and keep one
    assert sorted(r.doc_id for r in out.collect()) == [2, 3]


def test_deep_bare_suffix_passes_through(spark):
    """Round-13 fix: a host that IS a known public suffix passes
    through on every path — it must not fall to a SHALLOWER rule and
    mint a bogus registrable. 'pvt.k12.ma.us' with only that suffix
    configured used to come back as 'ma.us'."""
    from etl_data_lake_spark.functions.urls import (
        parse_psl,
        registered_domain,
        registered_domain_psl,
        sql_registered_domain,
    )

    hosts = ["pvt.k12.ma.us", "k12.ma.us", "x.pvt.k12.ma.us"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    extra = ("pvt.k12.ma.us",)
    got = {
        r.host: r.d
        for r in df.select(
            "host", registered_domain("host", extra).alias("d")
        ).collect()
    }
    assert got["pvt.k12.ma.us"] == "pvt.k12.ma.us"  # bare suffix
    assert got["x.pvt.k12.ma.us"] == "x.pvt.k12.ma.us"  # suffix + 1
    # PSL path with BOTH rules (the real list nests suffixes): deep
    # bare suffix must not resolve via the shallower k12.ma.us rule
    psl = parse_psl(["us", "k12.ma.us", "pvt.k12.ma.us"])
    got_psl = {
        r.host: r.d
        for r in df.select(
            "host", registered_domain_psl("host", psl).alias("d")
        ).collect()
    }
    assert got_psl["pvt.k12.ma.us"] == "pvt.k12.ma.us"
    assert got_psl["k12.ma.us"] == "k12.ma.us"
    assert got_psl["x.pvt.k12.ma.us"] == "x.pvt.k12.ma.us"
    # and the DuckDB twin stays in lockstep with the Spark expression
    import duckdb

    sql = sql_registered_domain("host", extra)
    for h in hosts:
        want = duckdb.sql(
            f"SELECT {sql} AS d FROM (SELECT '{h}' AS host)"
        ).fetchone()[0]
        assert got[h] == want, h


def test_psl_wildcard_bare_suffix_passthrough(spark):
    """A host that IS a wildcard-matched suffix ('anything.ck' at
    depth base+1) passes through even when deeper defaults would
    otherwise rewrite it."""
    from etl_data_lake_spark.functions.urls import parse_psl

    psl = parse_psl(["ck", "*.ck", "*.k12.ma.us", "us", "ma.us"])
    got = _domains(
        spark,
        ["foo.ck", "school.k12.ma.us", "a.school.k12.ma.us"],
        psl,
    )
    assert got["foo.ck"] == "foo.ck"  # wildcard suffix itself
    # *.k12.ma.us: 'school.k12.ma.us' IS the matched suffix (4 labels)
    assert got["school.k12.ma.us"] == "school.k12.ma.us"
    assert got["a.school.k12.ma.us"] == "a.school.k12.ma.us"


def test_canonical_url(spark):
    """Round 13 late: canonicalization — case, userinfo, default
    ports, fragments, tracking params, param order."""
    from etl_data_lake_spark.functions.urls import canonical_url

    cases = {
        # case + default port + fragment
        "HTTPS://WWW.Example.COM:443/Path#frag":
            "https://www.example.com/Path",
        # userinfo stripped, non-default port kept
        "http://u:pw@api.example.org:8080/x":
            "http://api.example.org:8080/x",
        # tracking params dropped (utm_* prefix + named), rest sorted
        "https://a.com/p?utm_source=x&b=2&a=1&fbclid=zzz":
            "https://a.com/p?a=1&b=2",
        # all params tracking → no dangling '?'
        "https://a.com/p?utm_campaign=c&gclid=g": "https://a.com/p",
        # http default port dropped
        "http://a.com:80/": "http://a.com/",
        # malformed → null
        "not a url": None,
    }
    df = spark.createDataFrame(
        [(u,) for u in cases], "url string"
    ).select("url", canonical_url("url").alias("c"))
    got = {r.url: r.c for r in df.collect()}
    assert got == cases


def test_dedup_by_canonical_url(spark):
    from etl_data_lake_spark.functions.urls import dedup_by_canonical_url

    rows = [
        (1, "https://a.com/p?utm_source=x", 0.9),
        (2, "https://A.com:443/p", 0.5),        # http≠https: distinct
        (3, "HTTPS://a.com/p#top", 0.7),        # same as 1 canonically
        (4, "https://a.com/q", 0.1),
        (5, "garbage", 0.0),
        (6, "also garbage", 0.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, score double")
    out = dedup_by_canonical_url(
        df, [F.desc("score"), F.asc("doc_id")]
    )
    kept = sorted(r.doc_id for r in out.collect())
    # 1 wins its canonical group over 3; 2 is https://a.com/p too!
    # (443 is https default) → group {1,2,3} keeps 1 (score 0.9);
    # 4 unique; 5,6 null-canonical both kept
    assert kept == [1, 4, 5, 6]
    assert set(out.columns) == {"doc_id", "url", "score"}
    import pytest as _pt

    with _pt.raises(ValueError, match="order_by"):
        dedup_by_canonical_url(df, None)
    with _pt.raises(ValueError, match="reserved"):
        dedup_by_canonical_url(
            df.withColumn("__curl", F.lit("x")), F.asc("doc_id")
        )
