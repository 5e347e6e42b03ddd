"""HuggingFace ``tokenizer.json`` interop — the tokenizer counterpart
of lm_io's ARPA work (round 12): score/encode a corpus under a model
built by PUBLIC tooling, and export this repo's byte-BPE so public
tooling can load it. ``tokenizers``' JSON artifact is the de-facto
interchange format (GPT-2, RoBERTa, Llama-2, every `tokenizers`-
trained model ships one).

Scope — stated loudly, enforced loudly: ``model.type == "BPE"`` with
a ByteLevel or whitespace pre-tokenizer. That covers the GPT-2 class
this repo's byte alphabet already implements (functions/bpe.py's
byte↔unicode bijection IS ByteLevel's); WordPiece/Unigram artifacts
raise with a pointer at the repo's own trainers, and normalizers or
exotic pre-tokenizers raise rather than silently mis-tokenizing —
a tokenizer that "almost" matches re-tokenizes the corpus wrong in
ways no test downstream will catch.

Execution split (the repo's standard shape):

* PRE-TOKENIZATION runs JVM-side — ``regexp_extract_all`` with the
  GPT-2 pattern (Java regex handles ``\\p{L}`` and the lookahead;
  Python's ``re`` does not, which is exactly why the split stays in
  the JVM) — so the Python stage never sees raw text, only the
  pretoken array;
* MERGES + ID LOOKUP run in an Arrow-batched pandas UDF with a
  per-batch pretoken cache (Zipf: the merge loop runs once per
  DISTINCT pretoken per batch), reusing bpe.py's ``_encode_symbols``
  verbatim — the loaded artifact and the repo-trained model go
  through ONE encoder.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.bpe import (
    _BYTE_ENC,
    _encode_symbols,
    _ranks,
    byte_symbols,
)

# The published GPT-2 pre-tokenizer regex (Radford et al. 2019, the
# public gpt-2 repo's encoder.py), Java-regex compatible as written.
GPT2_PRE_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
    r"|\s+(?!\S)|\s+"
)
_WS_PATTERN = r"\S+"


@dataclass(frozen=True)
class HfBpeTokenizer:
    """A loaded (or exported) BPE tokenizer: ``vocab`` token → id,
    ``merges`` in rank order, ``byte_level`` picks the alphabet,
    ``add_prefix_space`` mirrors ByteLevel's option, ``unk_token``
    is the char-level OOV outcome (byte-level never needs one)."""

    vocab: dict
    merges: tuple
    byte_level: bool = True
    add_prefix_space: bool = False
    unk_token: str | None = None

    @property
    def pre_pattern(self) -> str:
        return GPT2_PRE_PATTERN if self.byte_level else _WS_PATTERN


def _pre_tokenizers(node) -> list:
    """Flatten a pre_tokenizer node (Sequence unwraps one level)."""
    if node is None:
        return []
    if node.get("type") == "Sequence":
        return list(node.get("pretokenizers", []))
    return [node]


def load_hf_tokenizer_json(
    path: str, ignore_added_tokens: bool = False
) -> HfBpeTokenizer:
    """Parse a ``tokenizer.json``. Raises on non-BPE models, on
    normalizers, on pre-tokenizers outside {ByteLevel, Whitespace,
    WhitespaceSplit}, on ``ByteLevel.use_regex=false`` (a materially
    different split), on a declared ``unk_token`` missing from the
    vocab, on ``added_tokens`` (unless ``ignore_added_tokens=True`` —
    an added token's string in the corpus would BPE-split into pieces
    instead of its reserved id, so the caller must assert the corpus
    cannot contain them; GPT-2's ``<|endoftext|>`` is the classic safe
    case), and on merges naming symbols whose concatenation is missing
    from the vocab (a truncated artifact should fail here, not as
    garbage ids). Accepts both merge spellings in the wild: ``"a b"``
    strings (classic) and ``["a", "b"]`` pairs (newer ``tokenizers``
    releases)."""
    with open(str(path), encoding="utf-8") as f:
        doc = json.load(f)
    model = doc.get("model") or {}
    if model.get("type") != "BPE":
        raise ValueError(
            f"load_hf_tokenizer_json supports model.type='BPE'; got "
            f"{model.get('type')!r} — for WordPiece/Unigram use the "
            "repo's own trainers (functions/wordpiece.py, unigram.py)"
        )
    if doc.get("normalizer"):
        raise ValueError(
            "normalizers are not supported — a silently skipped "
            f"normalizer ({doc['normalizer'].get('type')!r}) would "
            "re-tokenize the corpus wrong; strip it or normalize "
            "upstream (functions/normalize.py)"
        )
    added = doc.get("added_tokens") or []
    if added and not ignore_added_tokens:
        raise ValueError(
            f"artifact declares {len(added)} added_tokens (e.g. "
            f"{added[0].get('content')!r}) which this loader does not "
            "reserve — their strings in the corpus would BPE-split "
            "instead of mapping to the reserved id; pass "
            "ignore_added_tokens=True only if the corpus cannot "
            "contain them"
        )
    pres = _pre_tokenizers(doc.get("pre_tokenizer"))
    byte_level = False
    add_prefix_space = False
    for p in pres:
        t = p.get("type")
        if t == "ByteLevel":
            byte_level = True
            add_prefix_space = bool(p.get("add_prefix_space", False))
            if p.get("use_regex", True) is False:
                raise ValueError(
                    "ByteLevel use_regex=false is a materially "
                    "different split — unsupported"
                )
        elif t in ("Whitespace", "WhitespaceSplit"):
            pass
        else:
            raise ValueError(
                f"unsupported pre_tokenizer {t!r} (ByteLevel, "
                "Whitespace, WhitespaceSplit)"
            )
    vocab = dict(model["vocab"])
    raw_merges = model.get("merges", [])
    merges = []
    for m in raw_merges:
        if isinstance(m, str):
            a, sep, b = m.partition(" ")
            if not sep:
                raise ValueError(f"malformed merge entry {m!r}")
            merges.append((a, b))
        else:
            a, b = m
            merges.append((str(a), str(b)))
    for a, b in merges:
        if a + b not in vocab:
            raise ValueError(
                f"merge ({a!r}, {b!r}) produces {a + b!r} which is "
                "not in the vocab — truncated or corrupt artifact"
            )
    unk = model.get("unk_token")
    if unk is not None and unk not in vocab:
        raise ValueError(
            f"declared unk_token {unk!r} is not in the vocab — the "
            "first OOV piece would fail deep inside an executor "
            "instead of here"
        )
    if byte_level:
        missing = [c for c in _BYTE_ENC.values() if c not in vocab]
        if missing:
            raise ValueError(
                f"byte-level vocab is missing {len(missing)} base "
                f"byte symbols (e.g. {missing[0]!r}) — every byte "
                "must be encodable"
            )
    return HfBpeTokenizer(
        vocab=vocab,
        merges=tuple(merges),
        byte_level=byte_level,
        add_prefix_space=add_prefix_space,
        unk_token=unk,
    )


def save_hf_tokenizer_json(path: str, merges, byte_level: bool = True) -> None:
    """Export a repo-trained merges table as a ``tokenizer.json`` any
    ``tokenizers`` build loads: base alphabet first (the 256 byte
    symbols in bijection order for byte level), then one vocab entry
    per merge in rank order — the GPT-2 vocab construction. Atomic
    rename like every artifact writer here."""
    from etl_data_lake_spark.functions.tokenizer_io import _atomic_write

    if not byte_level:
        raise ValueError(
            "only the byte-level alphabet exports losslessly (the "
            "char alphabet is corpus-open); train with learn_byte_bpe"
        )
    vocab: dict[str, int] = {}
    for b in range(256):
        vocab[_BYTE_ENC[b]] = len(vocab)
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    _atomic_write(
        str(path),
        {
            "version": "1.0",
            "model": {
                "type": "BPE",
                "vocab": vocab,
                "merges": [f"{a} {b}" for a, b in merges],
            },
            "pre_tokenizer": {
                "type": "ByteLevel",
                "add_prefix_space": False,
            },
            "normalizer": None,
            "added_tokens": [],
        },
    )


def hf_encode_word(pretoken: str, tok: HfBpeTokenizer) -> list:
    """Pure-Python reference: one pretoken → token ids (the Spark path
    runs this same function inside the Arrow batches)."""
    if tok.byte_level:
        symbols = byte_symbols(pretoken)
    else:
        symbols = list(pretoken)
    pieces = _encode_symbols(symbols, _ranks(list(tok.merges)))
    ids = []
    for p in pieces:
        if p in tok.vocab:
            ids.append(int(tok.vocab[p]))
        elif tok.unk_token is not None:
            ids.append(int(tok.vocab[tok.unk_token]))
        else:
            raise ValueError(
                f"piece {p!r} not in vocab and the model declares no "
                "unk_token"
            )
    return ids


def hf_token_ids(
    docs: DataFrame,
    tok: HfBpeTokenizer,
    text_col: str = "text",
    out_col: str = "token_ids",
) -> DataFrame:
    """→ input columns plus ``out_col`` (array<int>): each document's
    token ids under the loaded tokenizer. Pre-tokenization is one JVM
    ``regexp_extract_all``; the pandas UDF sees only the pretoken
    array and encodes with a per-batch cache."""
    from pyspark.sql.functions import pandas_udf

    ranks = _ranks(list(tok.merges))
    vocab = dict(tok.vocab)
    byte_level = tok.byte_level
    unk = tok.unk_token

    @pandas_udf("array<int>")
    def enc(pretoks: pd.Series) -> pd.Series:
        cache: dict[str, list] = {}

        def one(word: str) -> list:
            hit = cache.get(word)
            if hit is None:
                symbols = (
                    byte_symbols(word) if byte_level else list(word)
                )
                hit = []
                for p in _encode_symbols(symbols, ranks):
                    if p in vocab:
                        hit.append(int(vocab[p]))
                    elif unk is not None:
                        hit.append(int(vocab[unk]))
                    else:
                        raise ValueError(
                            f"piece {p!r} not in vocab and no unk_token"
                        )
                cache[word] = hit
            return hit

        return pd.Series(
            [
                [i for w in (arr if arr is not None else [])
                 for i in one(w)]
                for arr in pretoks
            ]
        )

    text = F.col(text_col)
    if tok.byte_level and tok.add_prefix_space:
        # mirror ByteLevel exactly (round-12 review fix): the space is
        # prepended ONLY when the text is non-empty and does not
        # already start with one — unconditional prepending on
        # ' hello' would mint an extra bare-space token no public
        # consumer of the same artifact produces
        text = F.when(
            text.isNull() | (text == "") | text.startswith(" "), text
        ).otherwise(F.concat(F.lit(" "), text))
    pretoks = F.regexp_extract_all(text, F.lit(tok.pre_pattern), F.lit(0))
    return docs.withColumn(out_col, enc(pretoks))


def hf_token_counts(
    docs: DataFrame,
    tok: HfBpeTokenizer,
    text_col: str = "text",
    out_col: str = "n_hf_tokens",
) -> DataFrame:
    """→ input columns plus the EXACT token count under the loaded
    tokenizer — the drop-in budget column for packing/chunking when
    the deployment tokenizer is a public artifact."""
    with_ids = hf_token_ids(docs, tok, text_col, "__ids")
    return with_ids.withColumn(
        out_col, F.size("__ids").cast("long")
    ).drop("__ids")
