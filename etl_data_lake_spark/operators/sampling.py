"""Deterministic sampling & dataset mixing for training-data curation.

``df.sample()`` draws from a per-partition RNG: the selected rows
change whenever partitioning, task retries, or Spark versions change —
useless for reproducible corpus construction. Everything here samples
by HASHING ROW CONTENT (``xxhash64`` of the id/key columns), so

* the same row makes the same in/out decision on any cluster layout,
  any retry, any engine run — the sample is a pure function of the
  data and the seed;
* samples at different rates NEST: keep(p=0.1) ⊂ keep(p=0.2) for the
  same seed (both are prefix intervals of the same hash ring), which
  gives consistent train/eval scaling curves;
* disjoint splits are complementary hash intervals — no coordination,
  no shuffle, a codegen-side filter that parquet scans evaluate after
  pushdown of everything cheaper.

No shuffle is introduced by any operator in this module: each is a
filter (sampling/splitting) or a filter per stratum (mixture), so at
100 TB they run at scan speed. (The reference has no sampling surface
at all; this is north-star extension material.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# resolution of the hash ring: keep-fractions are quantized to 1/2^20
_RING_BITS = 20
_RING = 1 << _RING_BITS


def _bucket(key_cols: tuple[str, ...], seed: int) -> Column:
    """Uniform bucket in [0, _RING) from row content + seed."""
    h = F.xxhash64(F.lit(seed), *[F.col(c) for c in key_cols])
    return F.pmod(h, F.lit(_RING))


def portable_bucket(key_cols: tuple[str, ...], seed: int) -> Column:
    """Cross-engine twin of :func:`_bucket`: the repo's polynomial
    rolling hash (functions.text.poly_hash) over ``seed:key1:key2:…``,
    reduced mod the ring. Spark's ``xxhash64`` has no DuckDB
    equivalent, so oracle-checked sampling entries pass this as the
    ``bucket`` override; production callers keep the xxhash64 default
    (JVM-codegen, better-mixed low bits). Same nesting/disjointness
    properties — both are pure functions of (content, seed)."""
    from etl_data_lake_spark.functions.text import poly_hash

    key = F.concat_ws(
        ":", F.lit(str(seed)), *[F.col(c).cast("string") for c in key_cols]
    )
    # poly_hash is already in [0, MOD) — plain % is non-negative
    return F.pmod(poly_hash(key), F.lit(_RING))


def sql_portable_bucket(key_exprs: tuple[str, ...], seed: int) -> str:
    """DuckDB twin of :func:`portable_bucket` (bit-identical)."""
    from etl_data_lake_spark.functions.text import sql_poly_hash

    key = "concat_ws(':', '%s', %s)" % (
        seed,
        ", ".join(f"CAST({e} AS VARCHAR)" for e in key_exprs),
    )
    return f"(({sql_poly_hash(key)}) % {_RING})"


def ring_threshold(fraction: float) -> int:
    """The ring cutoff for a keep-fraction — exposed so SQL twins
    quantize identically to the Spark side."""
    return int(round(fraction * _RING))


def sample_deterministic(
    df: DataFrame,
    fraction: float,
    key_cols: tuple[str, ...],
    seed: int = 42,
    bucket: Column | None = None,
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided by content hash — stable
    under repartitioning, retries, and re-runs; nested across
    fractions at the same seed."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    if bucket is None:
        bucket = _bucket(key_cols, seed)
    return df.where(bucket < ring_threshold(fraction))


def split_deterministic(
    df: DataFrame,
    weights: dict[str, float],
    key_cols: tuple[str, ...],
    seed: int = 42,
    bucket: Column | None = None,
) -> dict[str, DataFrame]:
    """Partition into disjoint, exhaustive named splits (e.g.
    train/val/test) by complementary hash intervals. Every row lands in
    exactly one split, decided by its content."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights sum to {total}, expected 1.0")
    if bucket is None:
        bucket = _bucket(key_cols, seed)
    out: dict[str, DataFrame] = {}
    lo = 0.0
    names = list(weights)
    for i, name in enumerate(names):
        hi = lo + weights[name]
        lo_t = int(round(lo * _RING))
        # last interval absorbs rounding so the union is exhaustive
        hi_t = _RING if i == len(names) - 1 else int(round(hi * _RING))
        out[name] = df.where((bucket >= lo_t) & (bucket < hi_t))
        lo = hi
    return out


def stratified_sample_deterministic(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str,
    key_cols: tuple[str, ...],
    seed: int = 42,
) -> DataFrame:
    """Per-stratum keep-fractions (e.g. downsample boilerplate-heavy
    sources, keep all rare-language docs). Strata absent from
    ``fractions`` are DROPPED — an explicit mixing recipe, not a
    passthrough. Single filter expression; no shuffle, no per-stratum
    jobs (contrast ``df.sampleBy``, which is also nondeterministic
    under repartitioning)."""
    bucket = _bucket(key_cols, seed)
    thresh = F.element_at(
        F.create_map(
            *[
                x
                for k, v in fractions.items()
                for x in (F.lit(k), F.lit(int(round(v * _RING))))
            ]
        ),
        F.col(stratum_col),
    )
    return df.where(bucket < F.coalesce(thresh, F.lit(0)))


def normalize_weights(targets: dict[str, float]) -> dict[str, float]:
    """Normalize target weights to sum exactly to the proportions both
    engines will see: done ONCE in Python so the Spark plan and any SQL
    oracle inline bit-identical double literals."""
    if not targets:
        raise ValueError("empty mixture targets")
    bad = {k: v for k, v in targets.items() if not v > 0.0}
    if bad:
        raise ValueError(f"non-positive mixture weights: {bad}")
    s = sum(targets.values())
    return {k: v / s for k, v in targets.items()}


def temperature_mixture_weights(
    sizes: dict[str, float], alpha: float = 0.3
) -> dict[str, float]:
    """The multilingual temperature-sampling recipe (exponential
    smoothing of the empirical distribution — XLM-R / mT5 use
    α ≈ 0.3, T5/C4 α = 1 is proportional, α → 0 is uniform): target
    weight ∝ size^α, normalized. ``sizes`` is per-stratum corpus mass
    in any consistent unit (rows, tokens, bytes — typically the
    ``n_total`` column of :func:`mixture_rates` or an exact-BPE token
    sum). Feed the result straight into :func:`resample_to_mixture`
    (round 12): the two compose into the standard low-resource-
    upweighting mix without hand-written targets.

    Driver-side pure function like :func:`normalize_weights`, for the
    same reason — both engines (and any SQL twin) must inline
    bit-identical double literals."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not sizes:
        raise ValueError("empty mixture sizes")
    bad = {k: v for k, v in sizes.items() if not v > 0.0}
    if bad:
        raise ValueError(f"non-positive stratum sizes: {bad}")
    return normalize_weights(
        {k: float(v) ** alpha for k, v in sizes.items()}
    )


def resample_to_mixture(
    df: DataFrame,
    targets: dict[str, float],
    stratum_col: str,
    key_cols: tuple[str, ...],
    seed: int = 42,
    bucket: Column | None = None,
    rates: DataFrame | None = None,
    size_col: str | None = None,
) -> DataFrame:
    """Downsample a multi-domain corpus to TARGET MIXTURE PROPORTIONS
    at the maximum achievable size — the static data-mixing step of a
    training pipeline (the fixed-weights half of DoReMi-style recipes).
    With ``size_col`` (e.g. an exact-BPE token count from
    functions/bpe), proportions are of TOKEN MASS rather than rows —
    see :func:`mixture_rates`.

    Solves for the largest total T such that every target stratum d can
    supply its share without replacement (``T = min_d n_d / p_d``),
    then keeps ``p_d * T / n_d`` of each stratum by content hash. The
    binding stratum keeps (almost) everything; oversupplied strata are
    thinned. Upsampling (rates > 1) is a training-loop epoch concern,
    not a corpus operator — this never replicates rows.

    Fully in-plan: one tiny per-stratum count aggregate, a one-row
    global min broadcast back over the counts, and a broadcast join of
    #strata threshold rows onto the corpus scan — the 100 TB side is
    ONE pass and never shuffles. Strata absent from ``targets`` are
    dropped; target strata absent from the DATA contribute no rows and
    do not constrain T (the mixture is solved over present strata —
    callers wanting strictness can assert on the summary). Keep
    decisions are content-hashed (same ring as the other operators):
    deterministic under repartitioning, retries, and engines, and
    nested across runs at the same seed.

    Rates quantize to ``ceil(keep * 2^20)`` ring units so the binding
    stratum's ``keep == 1.0`` (up to float rounding) always maps to the
    full ring; both the multiply and the ceil are IEEE-double
    expressions a SQL twin reproduces bit-identically.

    ``rates`` short-circuits the solver with a precomputed
    :func:`mixture_rates` frame — callers that also REPORT the rates
    (e.g. the catalog's mixture summary) pass it so the thresholds
    applied are the exact frame reported (``normalize_weights`` is not
    idempotent in floats: re-normalizing an already-normalized dict
    can move a threshold by one ring unit) and the per-stratum counts
    aggregate runs once, not once per consumer."""
    weights = normalize_weights(targets)
    if bucket is None:
        bucket = _bucket(key_cols, seed)
    d = df.where(F.col(stratum_col).isin(sorted(weights)))
    if rates is None:
        rates = mixture_rates(d, weights, stratum_col, size_col)
    return (
        d.join(F.broadcast(rates), stratum_col)
        .where(bucket < F.col("ring_threshold"))
        .drop("n_total", "ring_threshold")
    )


def mixture_rates(
    d: DataFrame,
    weights: dict[str, float],
    stratum_col: str,
    size_col: str | None = None,
) -> DataFrame:
    """The solver half of :func:`resample_to_mixture`: per-stratum
    ``(stratum, n_total, ring_threshold)`` over an already
    target-filtered frame. ``weights`` must be pre-normalized
    (:func:`normalize_weights`) so SQL twins inline the same
    literals.

    With ``size_col`` the mixture is solved over SIZE MASS instead of
    row counts — the token-budget form real pretraining recipes use
    ("20% of the TOKENS from web, 10% from code"): ``n_total`` becomes
    ``SUM(size_col)`` per stratum and the solver is otherwise
    unchanged. Row selection stays content-hash uniform, so the kept
    mass matches the target IN EXPECTATION (exactly, when sizes are
    equal within a stratum); callers guarantee positive sizes."""
    names = sorted(weights)
    target_map = F.create_map(
        *[x for k in names for x in (F.lit(k), F.lit(weights[k]))]
    )
    mass = (
        F.count("*")
        if size_col is None
        else F.sum(F.col(size_col).cast("double"))
    )
    counts = (
        d.groupBy(stratum_col)
        .agg(mass.alias("n_total"))
        .withColumn("__p", target_map[F.col(stratum_col)])
    )
    # global min as a window over the POST-AGG frame (#strata rows —
    # the single-partition window is free) so the corpus scan feeding
    # `counts` runs once, not once per agg+join branch
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        counts.withColumn(
            "__T", F.min(F.col("n_total") / F.col("__p")).over(w)
        )
        .withColumn(
            "__keep",
            F.least(
                F.lit(1.0), F.col("__p") * F.col("__T") / F.col("n_total")
            ),
        )
        .withColumn(
            "ring_threshold",
            F.ceil(F.col("__keep") * F.lit(float(_RING))),
        )
        .select(stratum_col, "n_total", "ring_threshold")
    )


def cap_per_stratum(
    df: DataFrame,
    max_rows: int,
    stratum_col: str,
    key_cols: tuple[str, ...],
    seed: int = 42,
    bucket: Column | None = None,
) -> DataFrame:
    """Keep at most ``max_rows`` rows per stratum — the "no more than
    N documents per domain" guard against a single crawl host (or
    boilerplate mill) dominating a mixture. Which rows survive is
    decided by CONTENT-HASH RANK (ascending hash, key tiebreak), not
    arrival order: the kept set is a uniform sample of the stratum,
    stable under repartitioning/retries, and NESTED across caps (the
    cap-100 survivors contain the cap-50 survivors at the same seed).

    Shape: one shuffle on the stratum (the window's partitioning) and
    a rank filter. A web-scale hot domain makes that partition large;
    the window still evaluates streaming-fashion (rank needs no
    buffering beyond sort spill), and callers with pathological skew
    can pre-thin with :func:`sample_deterministic` at fraction ≈
    k·max_rows/n_domain first — both decisions are hash-of-content,
    so pre-thinning composes without changing survivorship
    semantics (the nested-sample property)."""
    if max_rows < 1:
        raise ValueError(f"max_rows must be >= 1, got {max_rows}")
    if "__rank" in df.columns:
        raise ValueError("input already has a '__rank' column")
    if bucket is None:
        bucket = _bucket(key_cols, seed)
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(bucket, *[F.col(c) for c in key_cols])
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= max_rows)
        .drop("__rank")
    )


def mix_sources(
    sources: dict[str, DataFrame],
    fractions: dict[str, float],
    key_cols: tuple[str, ...],
    seed: int = 42,
    source_col: str = "source",
) -> DataFrame:
    """Weighted mixture of corpora: sample each source at its fraction
    and union tagged with its name — the 'data mixing' step of a
    training pipeline, with every per-source decision content-hashed
    so the mixture is exactly reproducible."""
    parts = []
    for name, df in sources.items():
        frac = fractions.get(name, 0.0)
        if frac <= 0.0:
            continue
        parts.append(
            sample_deterministic(df, frac, key_cols, seed).withColumn(
                source_col, F.lit(name)
            )
        )
    if not parts:
        raise ValueError("no source has a positive fraction")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_cols: tuple[str, ...],
    seed: int = 42,
    stratum_col: str | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic: keep the
    ``n`` rows (per stratum when ``stratum_col`` is set) chosen with
    probability proportional to ``weight_col`` — quality-weighted
    corpus selection ("keep 1M documents, preferring high quality
    scores") without a bias-prone threshold cliff.

    Algorithm: Efraimidis–Spirakis A-ES order sampling. Each row draws
    a uniform ``u`` from the content hash (same portable construction
    as every sampler here — layout/retry/engine invariant) and ranks
    by the exponential jitter ``-ln(u) / w``; the ``n`` SMALLEST ranks
    are exactly a weight-proportional sample without replacement. The
    rank is a pure function of (content, seed, weight), so re-runs
    reproduce the identical sample and changing only ``n`` NESTS the
    results (top-50 ⊂ top-100) — same contract as the uniform
    samplers. ``u`` draws from a dedicated 2^40 ring (not the
    samplers' 2^20 keep-fraction ring): rank collisions start at the
    birthday bound of the ring size, and 2^20 ties from ~1.2k rows
    per stratum — 2^40 pushes that past a million rows per stratum,
    keeping the sample weight-proportional at corpus scale.

    Rows with NULL, zero or negative weight never qualify (they have
    no selection mass; A-ES is undefined there) — they are filtered,
    not errors, so a quality score of 0 composes naturally.

    Shape: global form = sort+limit (TakeOrderedAndProject — no full
    sort materializes); stratified form = one shuffle on the stratum
    and a streaming rank filter, identical to :func:`cap_per_stratum`.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if "__wrank" in df.columns:
        raise ValueError("input already has a '__wrank' column")
    # u in (0, 1] over a 2^40 ring (see docstring); never 0, so ln(u)
    # is finite. xxhash64's low 40 bits are well-mixed; pmod keeps the
    # draw non-negative and content-deterministic like _bucket.
    wide_ring = 1 << 40
    h = F.xxhash64(F.lit(seed), *[F.col(c) for c in key_cols])
    u = (F.pmod(h, F.lit(wide_ring)) + F.lit(1.0)) / F.lit(
        float(wide_ring)
    )
    w = F.col(weight_col).cast("double")
    rank_key = -F.log(u) / w
    # NaN explicitly: Spark orders NaN above every double, so NaN > 0
    # is TRUE and a NaN weight would slip through with a NaN rank
    positive = df.where(
        w.isNotNull() & ~F.isnan(w) & (w > 0)
    ).withColumn("__wrank", rank_key)
    if stratum_col is None:
        out = positive.orderBy(
            "__wrank", *[F.col(c) for c in key_cols]
        ).limit(n)
    else:
        win = Window.partitionBy(stratum_col).orderBy(
            "__wrank", *[F.col(c) for c in key_cols]
        )
        out = (
            positive.withColumn("__rn", F.row_number().over(win))
            .where(F.col("__rn") <= n)
            .drop("__rn")
        )
    return out.drop("__wrank")


def split_leakage_safe(
    df: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
) -> dict[str, DataFrame]:
    """Train/val/test split that cannot leak near-duplicates across
    the boundary: a per-document content-hash split (round 3's
    ``split_deterministic``) puts ~p_train·p_test of every near-dup
    PAIR on opposite sides — eval contamination by construction. Here
    the split decision hashes the document's DUP-CLUSTER id (its
    component's minimum member id, from the same candidate ``pairs``
    the dedup family produces), so a whole near-dup cluster co-assigns
    to one split; documents in no cluster split by their own id
    exactly as before — on a dedup-clean corpus this IS
    split_deterministic.

    Scale: one connected-components pass over the candidate graph
    (graph-sized, never corpus-sized) + one left join of the corpus
    against the component labels (cluster members only — broadcast-
    sized in practice); the split itself stays a shuffle-free filter.

    Determinism caveat: membership is stable under layout/retries at
    FIXED ``pairs``; growing the corpus can merge clusters and move a
    whole cluster to a different split (inherent — the cluster id is
    the min member). Pin ``pairs`` alongside the seed when exact
    reproducibility across corpus versions matters."""
    from etl_data_lake_spark.dedup.cluster import connected_components

    grp = "__split_grp"
    if grp in df.columns or "cluster_id" in df.columns:
        raise ValueError(
            "input already has '__split_grp' or 'cluster_id'"
        )
    comp = connected_components(pairs)
    tagged = (
        df.join(
            comp.withColumnRenamed("doc_id", id_col), id_col, "left"
        )
        .withColumn(grp, F.coalesce(F.col("cluster_id"), F.col(id_col)))
        .drop("cluster_id")
    )
    splits = split_deterministic(tagged, weights, (grp,), seed)
    return {name: frame.drop(grp) for name, frame in splits.items()}
