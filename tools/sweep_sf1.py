"""The sf0.1 → sf1 decade sweep (round 12, r11-verdict #5): run the
most data-bound driver entries at both scales and print per-entry
growth exponents (log10 of the time ratio across a 10x data decade —
1.0 = perfectly linear, < 1 = sublinear, > 1 = super-linear). sf1
comes from tools/make_sf1.py (.sf1/, linear-by-construction
replication). Best-of-2 per point to shave scheduler jitter."""

from __future__ import annotations

import json
import math
import time

ENTRIES = [
    "q01_top_parts_by_lineitems",
    "events_session_window_agg",
    "time_dimension",
    "dedup_substring_spans",
    "dsir_weights_docs",
    # round 13 (r12-verdict #7): the dedup/ANN families' 100 TB claims
    # get empirical exponents too — minhash banding/clustering over
    # the replicated documents, and two ANN method plans over the
    # replicated+rotated embeddings (tools/make_sf1.py)
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_clusters",
    "ann_method_ivf",
    "ann_method_hnsw",
    # round 13 late: the round's new corpus operators — rotated-in
    # driver entries + the paragraph/URL dedup library twins
    "gopher_signals_docs",
    "domain_stats_docs",
    "paragraph_dedup_docs",
    "url_dedup_docs",
]


def main() -> None:
    from etl_data_lake_spark.queries.registry import queries
    from etl_data_lake_spark.queries.vector_queries import ann_bench_queries
    from etl_data_lake_spark.session import get_spark

    spark = get_spark(app_name="sf1-sweep")
    qs = dict(queries())
    qs.update(ann_bench_queries())
    from etl_data_lake_spark.queries.curation_ops import url_dedup_docs
    from etl_data_lake_spark.queries.dedup_queries import (
        paragraph_dedup_docs,
    )

    qs["paragraph_dedup_docs"] = paragraph_dedup_docs
    qs["url_dedup_docs"] = url_dedup_docs
    out = {}
    for sf_dir, label in (("/root/testdata/sf0.1", "sf0.1"),
                          ("/root/repo/.sf1", "sf1")):
        for name in ENTRIES:
            best = math.inf
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                best = min(best, time.perf_counter() - t0)
            out.setdefault(name, {})[label] = round(best, 3)
            print(label, name, round(best, 3), flush=True)
    for name, d in out.items():
        ratio = d["sf1"] / d["sf0.1"]
        d["ratio"] = round(ratio, 2)
        d["exponent"] = round(math.log10(ratio), 3)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
