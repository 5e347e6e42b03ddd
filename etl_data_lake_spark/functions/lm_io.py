"""Language-model persistence — the LM counterpart of tokenizer_io.

A perplexity gate trains on one trusted snapshot and filters for
months; like the tokenizers, the model must outlive the session and
round-trip EXACTLY (a filter whose probabilities drift re-classifies
boundary documents silently). Same artifact discipline as
tokenizer_io: one JSON document, byte-deterministic (sorted keys and
rows, fixed separators), repr-exact doubles, self-describing
format/type/version validated on load, atomic rename.

The payload is the trainers' own bounded model pieces (vocab and
pair tables are kilobytes-to-megabytes driver objects by
construction — file IO, not a Spark job); ``load_lm`` rebuilds the
exact frames the matching trainer would return, so scorers cannot
tell a loaded model from a trained one (test-pinned per document).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from etl_data_lake_spark.functions.lm import KnBigramModel
from etl_data_lake_spark.functions.tokenizer_io import _atomic_write

_FORMAT = "etl-data-lake-lm"
_VERSION = 1


def _uni_rows(uni_model) -> list:
    return sorted(
        [r["term"], float(r["logp"])] for r in uni_model.collect()
    )


def save_unigram_lm(path: str, uni_model, oov_logp: float) -> None:
    """Persist a :func:`train_unigram_lm` result."""
    _atomic_write(
        str(path),
        {
            "format": _FORMAT,
            "version": _VERSION,
            "type": "unigram",
            "uni": _uni_rows(uni_model),
            "oov_logp": float(oov_logp),
        },
    )


def save_bigram_lm(path: str, uni_model, oov_logp: float, bigram_model) -> None:
    """Persist a :func:`train_bigram_lm` result (Jelinek-Mercer —
    the mixture weight is the scorer's parameter, not the model's)."""
    _atomic_write(
        str(path),
        {
            "format": _FORMAT,
            "version": _VERSION,
            "type": "bigram_jm",
            "uni": _uni_rows(uni_model),
            "oov_logp": float(oov_logp),
            "pairs": sorted(
                [r["w1"], r["w2"], float(r["p_ml"])]
                for r in bigram_model.collect()
            ),
        },
    )


def save_kn_lm(path: str, model: KnBigramModel) -> None:
    """Persist a :func:`train_kn_bigram_lm` result."""
    _atomic_write(
        str(path),
        {
            "format": _FORMAT,
            "version": _VERSION,
            "type": "bigram_kn",
            "uni": _uni_rows(model.uni_model),
            "oov_logp": float(model.oov_logp),
            "pairs": sorted(
                [r["w1"], r["w2"], float(r["p_disc"])]
                for r in model.pair_model.collect()
            ),
            "ctx": sorted(
                [r["w1"], int(r["c1"]), float(r["backoff"])]
                for r in model.ctx_model.collect()
            ),
            "cont": sorted(
                [r["w2"], float(r["p_cont"])]
                for r in model.cont_model.collect()
            ),
            "cont_floor": float(model.cont_floor),
            "discount": float(model.discount),
        },
    )


def load_lm(spark: SparkSession, path: str):
    """→ ``("unigram", (uni_model, oov_logp))``,
    ``("bigram_jm", (uni_model, oov_logp, bigram_model))``, or
    ``("bigram_kn", KnBigramModel)`` — exactly the matching trainer's
    return shape. Foreign files, unknown versions, and unknown types
    fail loudly."""
    import json

    with open(str(path), encoding="utf-8") as f:
        doc = json.load(f)
    if doc.get("format") != _FORMAT:
        raise ValueError(
            f"{path} is not an {_FORMAT} artifact "
            f"(format={doc.get('format')!r})"
        )
    if doc.get("version") != _VERSION:
        raise ValueError(
            f"unsupported {_FORMAT} version {doc.get('version')!r}"
        )
    kind = doc.get("type")
    uni = spark.createDataFrame(
        [(t, lp) for t, lp in doc["uni"]], "term string, logp double"
    )
    oov = float(doc["oov_logp"])
    if kind == "unigram":
        return kind, (uni, oov)
    if kind == "bigram_jm":
        pairs = spark.createDataFrame(
            [(a, b, p) for a, b, p in doc["pairs"]],
            "w1 string, w2 string, p_ml double",
        )
        return kind, (uni, oov, pairs)
    if kind == "bigram_kn":
        pairs = spark.createDataFrame(
            [(a, b, p) for a, b, p in doc["pairs"]],
            "w1 string, w2 string, p_disc double",
        )
        ctx = spark.createDataFrame(
            [(w, c, l) for w, c, l in doc["ctx"]],
            "w1 string, c1 long, backoff double",
        )
        cont = spark.createDataFrame(
            [(w, p) for w, p in doc["cont"]],
            "w2 string, p_cont double",
        )
        return kind, KnBigramModel(
            uni_model=uni,
            oov_logp=oov,
            pair_model=pairs,
            ctx_model=ctx,
            cont_model=cont,
            cont_floor=float(doc["cont_floor"]),
            discount=float(doc["discount"]),
        )
    raise ValueError(f"unknown {_FORMAT} type {kind!r}")
