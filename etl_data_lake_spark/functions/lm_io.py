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

from etl_data_lake_spark.functions.lm import KnBigramModel, KnTrigramModel
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


def save_kn_trigram_lm(path: str, model: KnTrigramModel) -> None:
    """Persist a :func:`train_kn_trigram_lm` result."""
    _atomic_write(
        str(path),
        {
            "format": _FORMAT,
            "version": _VERSION,
            "type": "trigram_kn",
            "uni": _uni_rows(model.uni_model),
            "oov_logp": float(model.oov_logp),
            "tri": sorted(
                [r["w1"], r["w2"], r["w3"], float(r["p_disc3"])]
                for r in model.tri_model.collect()
            ),
            "ctx2": sorted(
                [r["w1"], r["w2"], float(r["backoff3"])]
                for r in model.ctx2_model.collect()
            ),
            "mid": sorted(
                [r["w2"], r["w3"], float(r["p_disc2"])]
                for r in model.mid_model.collect()
            ),
            "ctx1": sorted(
                [r["w2"], float(r["backoff2"])]
                for r in model.ctx1_model.collect()
            ),
            "cont": sorted(
                [r["w3"], float(r["p_cont"])]
                for r in model.cont_model.collect()
            ),
            "cont_floor": float(model.cont_floor),
            "discount3": float(model.discount3),
            "discount2": float(model.discount2),
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
    if kind == "trigram_kn":
        tri = spark.createDataFrame(
            [(a, b, c, p) for a, b, c, p in doc["tri"]],
            "w1 string, w2 string, w3 string, p_disc3 double",
        )
        ctx2 = spark.createDataFrame(
            [(a, b, l) for a, b, l in doc["ctx2"]],
            "w1 string, w2 string, backoff3 double",
        )
        mid = spark.createDataFrame(
            [(a, b, p) for a, b, p in doc["mid"]],
            "w2 string, w3 string, p_disc2 double",
        )
        ctx1 = spark.createDataFrame(
            [(a, l) for a, l in doc["ctx1"]],
            "w2 string, backoff2 double",
        )
        cont = spark.createDataFrame(
            [(w, p) for w, p in doc["cont"]],
            "w3 string, p_cont double",
        )
        return kind, KnTrigramModel(
            uni_model=uni,
            oov_logp=oov,
            tri_model=tri,
            ctx2_model=ctx2,
            mid_model=mid,
            ctx1_model=ctx1,
            cont_model=cont,
            cont_floor=float(doc["cont_floor"]),
            discount3=float(doc["discount3"]),
            discount2=float(doc["discount2"]),
        )
    raise ValueError(f"unknown {_FORMAT} type {kind!r}")


# ---------------------------------------------------------------------------
# ARPA export (round 11) — the interchange format SRILM/KenLM and
# every public n-gram tool read. The interpolated KN tower converts to
# ARPA's backoff form exactly: each stored n-gram's probability column
# is the FULL interpolated value, and a context's backoff weight is
# its λ (the standard conversion — querying the ARPA file with the
# usual "if present use logp, else bow(context)·P(lower)" rule
# reproduces the tower bit-for-bit, which the tests pin with an
# independent ARPA evaluator). The tower has no BOS/EOS convention
# (first tokens score under a separate unigram model), so the export
# contains no <s>/</s> entries — documented, not hidden; UNK maps to
# the standard "<unk>" symbol.
# ---------------------------------------------------------------------------

_ARPA_UNK = "<unk>"


def _arpa_sym(w: str) -> str:
    from etl_data_lake_spark.functions.lm import _UNK

    return _ARPA_UNK if w == _UNK else w


def save_arpa(path: str, model: KnTrigramModel) -> None:
    """Write a :class:`KnTrigramModel` as an ARPA file.

    Sections: \\1-grams = the continuation distribution (p_cont /
    cont_floor) with bow = log10 λ2 for words that are seen middle
    contexts; \\2-grams = every pair that is a stored middle entry OR
    a stored trigram context (ARPA requires each trigram's prefix to
    be listed), probability = the interpolated middle order, bow =
    log10 λ3 where the pair is a seen trigram context; \\3-grams =
    the stored trigrams at their full cascade probability. Bounded
    driver-side model pieces → plain local file IO, atomic rename."""
    import math
    import os
    import tempfile

    cont = {
        r["w3"]: float(r["p_cont"]) for r in model.cont_model.collect()
    }
    lam2 = {
        r["w2"]: float(r["backoff2"]) for r in model.ctx1_model.collect()
    }
    mid = {
        (r["w2"], r["w3"]): float(r["p_disc2"])
        for r in model.mid_model.collect()
    }
    lam3 = {
        (r["w1"], r["w2"]): float(r["backoff3"])
        for r in model.ctx2_model.collect()
    }
    tri = {
        (r["w1"], r["w2"], r["w3"]): float(r["p_disc3"])
        for r in model.tri_model.collect()
    }
    from etl_data_lake_spark.functions.lm import _UNK

    literal_unk = {
        w
        for r in model.uni_model.collect()
        for w in [r["term"]]
        if w == _ARPA_UNK
    }
    if literal_unk:
        raise ValueError(
            "reference vocabulary contains the literal token '<unk>' — "
            "ARPA reserves that symbol for the OOV outcome, and exporting "
            "both would emit duplicate rows every consumer (including "
            "load_arpa) rejects; normalize or drop the literal token "
            "before training"
        )
    vocab = sorted(
        {r["term"] for r in model.uni_model.collect()}
        | set(cont)
        | set(lam2)
        | {w for pair in mid for w in pair}
        | {_UNK}  # <unk> always present: its prob IS the unseen-word
        # floor, which is what lets a standard ARPA consumer (and
        # load_arpa's scorer) handle OOV tokens the way the tower does
    )

    def p_cont(w):  # unigram level
        return cont.get(w, model.cont_floor)

    def p_mid(w2, w3):  # bigram level, full interpolation
        return mid.get((w2, w3), 0.0) + lam2.get(w2, 1.0) * p_cont(w3)

    def p_tri(w1, w2, w3):
        return tri.get((w1, w2, w3), 0.0) + lam3.get((w1, w2), 1.0) * p_mid(
            w2, w3
        )

    def lg(p):
        return f"{math.log10(p):.7f}"

    bigram_keys = sorted(set(mid) | set(lam3))
    lines = ["\\data\\"]
    lines.append(f"ngram 1={len(vocab)}")
    lines.append(f"ngram 2={len(bigram_keys)}")
    lines.append(f"ngram 3={len(tri)}")
    lines.append("")
    lines.append("\\1-grams:")
    for w in vocab:
        bow = f"\t{lg(lam2[w])}" if w in lam2 else ""
        lines.append(f"{lg(p_cont(w))}\t{_arpa_sym(w)}{bow}")
    lines.append("")
    lines.append("\\2-grams:")
    for w2, w3 in bigram_keys:
        bow = f"\t{lg(lam3[(w2, w3)])}" if (w2, w3) in lam3 else ""
        lines.append(
            f"{lg(p_mid(w2, w3))}\t{_arpa_sym(w2)} {_arpa_sym(w3)}{bow}"
        )
    lines.append("")
    lines.append("\\3-grams:")
    for w1, w2, w3 in sorted(tri):
        lines.append(
            f"{lg(p_tri(w1, w2, w3))}\t"
            f"{_arpa_sym(w1)} {_arpa_sym(w2)} {_arpa_sym(w3)}"
        )
    lines.append("")
    lines.append("\\end\\")
    body = "\n".join(lines) + "\n"

    path = str(path)
    d = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".arpa-tmp-")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(body)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise


# ---------------------------------------------------------------------------
# ARPA IMPORT (round 11) — the other interop direction: score a corpus
# under a model built by PUBLIC tooling (KenLM / SRILM / NLTK all emit
# ARPA). The parser is deliberately liberal in what it accepts
# (blank lines, missing trailing bows = 0.0, any section order, \data\
# counts used only as a sanity cross-check) and the scorer implements
# the STANDARD backoff evaluation — "if the n-gram is stored use its
# logprob, else back off with the context's bow" — entirely in-plan:
# the gram tables broadcast (an ARPA file is a bounded driver
# artifact) and every probability is a JVM expression, no UDFs.
# ---------------------------------------------------------------------------

from dataclasses import dataclass


@dataclass(frozen=True)
class ArpaModel:
    """Parsed ARPA n-gram model (orders 1-3). ``unigrams`` maps word →
    (log10 p, log10 bow); ``bigrams`` maps (w1, w2) likewise;
    ``trigrams`` maps (w1, w2, w3) → log10 p. ``order`` is the highest
    section present."""

    unigrams: dict
    bigrams: dict
    trigrams: dict
    order: int


def load_arpa(path: str) -> ArpaModel:
    """Parse an ARPA file (max order 3). Raises on files without a
    ``\\data\\`` header, on orders above 3, and on a declared count
    that disagrees with the rows actually present (a truncated
    download should fail here, not as mysterious perplexities)."""
    declared: dict[int, int] = {}
    grams: dict[int, dict] = {1: {}, 2: {}, 3: {}}
    section = None
    saw_data = False
    with open(str(path), encoding="utf-8") as f:
        for raw in f:
            line = raw.rstrip("\n").strip("\r")
            if line == "\\data\\":
                saw_data = True
                continue
            if line.startswith("ngram "):
                n, cnt = line[6:].split("=")
                n = int(n)
                if n > 3:
                    raise ValueError(
                        f"load_arpa supports orders 1-3; file declares "
                        f"ngram {n}"
                    )
                declared[n] = int(cnt)
                continue
            if line.startswith("\\") and line.endswith("-grams:"):
                section = int(line[1])
                if section > 3:
                    raise ValueError(
                        f"load_arpa supports orders 1-3; found a "
                        f"\\{section}-grams: section"
                    )
                continue
            if line == "\\end\\" or not line.strip() or section is None:
                continue
            parts = line.split("\t")
            if len(parts) == 1:  # some writers use spaces throughout
                parts = line.split()
                parts = [parts[0], " ".join(parts[1 : 1 + section])] + (
                    parts[1 + section :] or []
                )
            lp = float(parts[0])
            words = tuple(parts[1].split(" "))
            if len(words) != section:
                raise ValueError(
                    f"malformed ARPA row in \\{section}-grams: {line!r}"
                )
            bow = float(parts[2]) if len(parts) > 2 and parts[2] else 0.0
            key = words[0] if section == 1 else words
            grams[section][key] = (lp, bow)
    if not saw_data:
        raise ValueError(f"{path} is not an ARPA file (no \\data\\ header)")
    for n, cnt in declared.items():
        if len(grams[n]) != cnt:
            raise ValueError(
                f"ARPA declares ngram {n}={cnt} but file holds "
                f"{len(grams[n])} rows — truncated or corrupt"
            )
    order = max((n for n in (1, 2, 3) if grams[n]), default=0)
    if order == 0:
        raise ValueError(f"{path} holds no n-gram rows")
    return ArpaModel(
        unigrams=grams[1],
        bigrams={k: v for k, v in grams[2].items()},
        trigrams={k: v[0] for k, v in grams[3].items()},
        order=order,
    )


def arpa_perplexity_score(
    docs,
    model: ArpaModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    unk: str = "<unk>",
):
    """→ ``(doc_id, n_tokens, avg_neg_logp, perplexity)`` under the
    standard ARPA backoff evaluation (the same numbers ``query`` in
    KenLM or SRILM's ``ngram -ppl`` compute, minus their <s>/</s>
    convention — this scorer, like every scorer here, has no BOS/EOS):
    first tokens by the 1-gram section, second by the bigram rule,
    later by the trigram rule, each falling back through the context
    bows. Words absent from the 1-grams map to ``unk`` (must be
    present — standard ARPA OOV handling; raises up front otherwise).
    All gram tables broadcast; probabilities are JVM expressions."""
    import math

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_data_lake_spark.functions.text import tokens

    if unk not in model.unigrams:
        raise ValueError(
            f"ARPA model has no {unk!r} entry — cannot score "
            "out-of-vocabulary tokens"
        )
    spark = docs.sparkSession
    ln10 = math.log(10.0)
    uni = F.broadcast(
        spark.createDataFrame(
            [(w, lp, bow) for w, (lp, bow) in model.unigrams.items()],
            "w string, lp1 double, bow1 double",
        )
    )
    bi = F.broadcast(
        spark.createDataFrame(
            [
                (a, b, lp, bow)
                for (a, b), (lp, bow) in model.bigrams.items()
            ]
            or [(None, None, None, None)],
            "a string, b string, lp2 double, bow2 double",
        )
    )
    tri = F.broadcast(
        spark.createDataFrame(
            [(a, b, c, lp) for (a, b, c), lp in model.trigrams.items()]
            or [(None, None, None, None)],
            "ta string, tb string, tc string, lp3 double",
        )
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode_outer(
            F.filter(tokens(text_col), lambda t: t != "")
        ).alias("_pos", "_term"),
    )
    # vocab-map: unknown words → the unk symbol (one broadcast join)
    mapped = toks.join(
        uni.select(F.col("w").alias("_vw")),
        toks["_term"] == F.col("_vw"),
        "left",
    ).select(
        "doc_id",
        "_pos",
        F.when(F.col("_term").isNull(), F.lit(None))
        .otherwise(F.coalesce(F.col("_vw"), F.lit(unk)))
        .alias("_w3"),
    )
    w = Window.partitionBy("doc_id").orderBy("_pos")
    seq = mapped.withColumn("_w2", F.lag("_w3", 1).over(w)).withColumn(
        "_w1", F.lag("_w3", 2).over(w)
    )
    j = (
        seq.join(uni, seq["_w3"] == uni["w"], "left")  # lp1(w3), bow1(w3)
        .join(
            bi.select(
                F.col("a").alias("_pa"),
                F.col("b").alias("_pb"),
                F.col("lp2").alias("_plp2"),
            ),
            (seq["_w2"] == F.col("_pa")) & (seq["_w3"] == F.col("_pb")),
            "left",
        )  # stored bigram (w2, w3)
        .join(
            bi.select(
                F.col("a").alias("_ca"),
                F.col("b").alias("_cb"),
                F.col("bow2").alias("_cbow"),
            ),
            (seq["_w1"] == F.col("_ca")) & (seq["_w2"] == F.col("_cb")),
            "left",
        )  # context bigram (w1, w2) → bow
        .join(
            uni.select(
                F.col("w").alias("_xw"), F.col("bow1").alias("_xbow")
            ),
            seq["_w2"] == F.col("_xw"),
            "left",
        )  # context unigram (w2) → bow
        .join(
            tri,
            (seq["_w1"] == F.col("ta"))
            & (seq["_w2"] == F.col("tb"))
            & (seq["_w3"] == F.col("tc")),
            "left",
        )
    )
    # log10 P(w3 | w2) by the bigram backoff rule
    p_bi = F.when(F.col("_plp2").isNotNull(), F.col("_plp2")).otherwise(
        F.coalesce(F.col("_xbow"), F.lit(0.0)) + F.col("lp1")
    )
    # log10 P(w3 | w1 w2) by the trigram backoff rule
    p_tri = F.when(F.col("lp3").isNotNull(), F.col("lp3")).otherwise(
        F.coalesce(F.col("_cbow"), F.lit(0.0)) + p_bi
    )
    lp = (
        F.when(F.col("_w3").isNull(), F.lit(None))
        .when(F.col("_w2").isNull(), F.col("lp1"))
        .when(F.col("_w1").isNull(), p_bi)
        .otherwise(p_tri)
        * F.lit(ln10)  # ARPA is log10; perplexity wants nats
    )
    return (
        j.select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count("lp").cast("long").alias("n_tokens"),
            (-F.avg("lp")).alias("avg_neg_logp"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "avg_neg_logp",
            F.exp("avg_neg_logp").alias("perplexity"),
        )
    )
