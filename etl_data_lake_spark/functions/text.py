"""Text-analysis building blocks (training-data-pipeline extensions).

All JVM-side expressions — tokenization, shingling, hashing, quality
metrics are built from ``split``/higher-order functions so they stay
inside whole-stage codegen; no Python touches the hot path.

Cross-engine hashing: Spark's ``hash``/``xxhash64`` and DuckDB's
``hash`` disagree, so anything oracle-checked uses an explicit
polynomial rolling hash (base 31, mod 1e9+7) written as a left fold —
bit-identical in any engine that evaluates the same fold.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(col: str | Column, pattern: str = r"\s+") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), pattern)


def nonempty_tokens(col: str | Column, pattern: str = r"\s+") -> Column:
    """:func:`tokens` minus the empty string a blank/empty input
    splits to — THE word list every counting operator means (one
    definition, shared by gopher/c4/dsir-class consumers, so a
    tokenization tweak lands everywhere at once)."""
    return F.filter(tokens(col, pattern), lambda t: t != "")


def poly_hash(col: str | Column) -> Column:
    """Char-level polynomial rolling hash: fold(a*31 + ascii(ch)) % MOD."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(31) + F.ascii(ch)) % F.lit(MOD),
    )


def sql_poly_hash(expr: str) -> str:
    """DuckDB twin of :func:`poly_hash`."""
    return (
        f"list_reduce(list_transform(split({expr}, ''), x -> CAST(ascii(x) AS BIGINT)),"
        f" (a, b) -> (a * 31 + b) % {MOD})"
    )


def word_shingles(tokens_col: Column, n: int = 3) -> Column:
    """n-word shingles as strings; empty array when the doc is shorter
    than n tokens (guards Spark's descending ``sequence``)."""
    idx = F.sequence(F.lit(1), F.size(tokens_col) - F.lit(n - 1))
    make = lambda i: F.concat_ws(
        " ", *[F.element_at(tokens_col, i + F.lit(j)) for j in range(n)]
    )
    return F.when(
        F.size(tokens_col) >= n, F.transform(idx, make)
    ).otherwise(F.array().cast("array<string>"))


def sql_word_shingles(tokens_expr: str, n: int = 3) -> str:
    """DuckDB twin of :func:`word_shingles` (range() is exclusive-stop,
    so short docs yield an empty list without a guard)."""
    parts = " || ' ' || ".join(f"({tokens_expr})[i+{j}]" for j in range(n))
    return f"list_transform(range(1, len({tokens_expr}) - {n - 2}), i -> {parts})"


def stopword_count(tokens_col: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    return F.size(F.filter(tokens_col, lambda t: t.isin(*stopwords)))


def sql_stopword_count(tokens_expr: str, stopwords: tuple[str, ...] = STOPWORDS) -> str:
    inlist = ", ".join(f"'{s}'" for s in stopwords)
    return f"len(list_filter({tokens_expr}, t -> t IN ({inlist})))"


def compose_shingle_hashes(th_col: Column, n: int = 3) -> Column:
    """n-window base-31 fold over a PRE-COMPUTED token-hash array
    column. Take a bound column (not an inline expression): expression
    trees are duplicated per reference, so inlining the token-hash
    transform here would recompute it n+1 times per row."""
    idx = F.sequence(F.lit(1), F.size(th_col) - F.lit(n - 1))

    def combine(i):
        acc = F.element_at(th_col, i)
        for j in range(1, n):
            acc = (acc * 31 + F.element_at(th_col, i + F.lit(j))) % F.lit(MOD)
        return acc

    return F.when(
        F.size(th_col) >= n, F.transform(idx, combine)
    ).otherwise(F.array().cast("array<long>"))


def hashed_word_shingles(tokens_col: Column, n: int = 3) -> Column:
    """n-word shingle HASHES composed from per-token hashes: each token
    is char-folded ONCE and windows combine token hashes with the same
    base-31 fold — ~3x less char work than hashing each shingle string,
    and no intermediate shingle strings are materialized at all.
    The composition is the hash DEFINITION (shared with the SQL twin),
    not an approximation of the string hash."""
    th = F.transform(tokens_col, lambda t: poly_hash(t))
    return compose_shingle_hashes(th, n)


def shingle_hashes_pandas_udf(n: int = 3):
    """Arrow-batched twin of :func:`hashed_word_shingles` ∘ tokenize ∘
    array_distinct: text → distinct composed shingle hashes.

    Same integer DEFINITION bit-for-bit (char fold base 31 mod 1e9+7,
    n-window composition, first-occurrence dedup) — the JVM expression
    version runs as INTERPRETED higher-order-function lambdas (split to
    per-char arrays, a closure call per character), which is the
    measured bottleneck of the whole LSH family; the same loops in a
    pandas batch run ~3× faster end-to-end. Tokenization replicates
    Spark's ``split(trim(text), '\\s+')`` exactly: trim strips SPACES
    only (Spark semantics), and the split class is Java's ASCII ``\\s``
    = [ \\t\\n\\x0b\\f\\r]. Equality with the JVM path over the corpus
    and edge docs is pinned by tests, not assumed."""
    import re

    from pyspark.sql.functions import pandas_udf

    splitter = re.compile(r"[ \t\n\x0b\f\r]+")

    def one(text):
        if text is None:
            return None
        th = []
        for t in splitter.split(text.strip(" ")):
            h = 0
            for ch in t:
                h = (h * 31 + ord(ch)) % MOD
            th.append(h)
        if len(th) < n:
            return []
        out: list[int] = []
        seen: set[int] = set()
        for i in range(len(th) - n + 1):
            acc = th[i]
            for j in range(1, n):
                acc = (acc * 31 + th[i + j]) % MOD
            if acc not in seen:
                seen.add(acc)
                out.append(acc)
        return out

    def f(s: pd.Series) -> pd.Series:
        return s.map(one)

    return pandas_udf(f, "array<long>")


def window_hashes_pandas_udf(w: int):
    """Arrow-batched POSITIONAL window hashes: text → the composed
    hash of every w-token window in order (no dedup — position IS the
    payload; contrast :func:`shingle_hashes_pandas_udf`, which
    first-occurrence-dedups for set semantics). Same tokenization
    (trim spaces, ASCII ``\\s`` split, empty tokens dropped) and the
    same base-31 char-fold + window composition, so the DuckDB twin in
    queries/dedup_queries reproduces it bit-for-bit.

    Exists because the pure-expression version of this math (a
    ``transform`` whose lambda re-references the token-hash array) is
    re-inlined by the optimizer into every element_at — measured
    O(windows·w·tokens·chars) interpreted closure calls per document,
    139 s for the sf0.1 corpus vs <1 s here."""
    import re

    from pyspark.sql.functions import pandas_udf

    splitter = re.compile(r"[ \t\n\x0b\f\r]+")

    def one(text):
        if text is None:
            return None
        th = []
        for t in splitter.split(text.strip(" ")):
            if not t:
                continue
            h = 0
            for ch in t:
                h = (h * 31 + ord(ch)) % MOD
            th.append(h)
        n = len(th)
        if n < w:
            return []
        out: list[int] = []
        for i in range(n - w + 1):
            acc = th[i]
            for j in range(1, w):
                acc = (acc * 31 + th[i + j]) % MOD
            out.append(acc)
        return out

    def f(s: pd.Series) -> pd.Series:
        return s.map(one)

    return pandas_udf(f, "array<long>")


def sql_hashed_word_shingles(tokens_expr: str, n: int = 3) -> str:
    """DuckDB twin of :func:`hashed_word_shingles` (the token-hash
    list is inlined everywhere it appears; the engine CSEs it)."""
    th = f"list_transform({tokens_expr}, t -> {sql_poly_hash('t')})"
    acc = f"({th})[i]"
    for j in range(1, n):
        acc = f"(({acc}) * 31 + ({th})[i+{j}]) % {MOD}"
    return f"list_transform(range(1, len({tokens_expr}) - {n - 2}), i -> {acc})"
