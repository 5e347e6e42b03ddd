"""Tokenizer model persistence — train once, encode everywhere.

A real pipeline trains its tokenizer (functions/bpe merges or a
functions/unigram model) on one corpus snapshot and then encodes for
months: the artifact must outlive the session, ship to other
clusters, and round-trip EXACTLY (a tokenizer that drifts by one
merge rule silently changes every token budget downstream).

The artifact is one small JSON document (merge lists and piece
vocabularies are driver-side objects, kilobytes to a few megabytes —
file IO, not a Spark job):

* byte-deterministic: sorted keys, fixed separators — re-saving an
  unchanged model is byte-identical (artifact diffing works);
* exact: floats round-trip via JSON's shortest-repr doubles (Python
  emits repr-exact doubles), so a loaded unigram model Viterbi-
  segments bit-identically to the trained one (test-pinned);
* self-describing: ``format``/``type``/``version`` fields are
  validated on load, and unknown versions fail loudly instead of
  misparsing;
* crash-safe: written to a temp file and atomically renamed.
"""

from __future__ import annotations

import json
import os

from etl_data_lake_spark.functions.bpe import ByteBpeModel, Merges
from etl_data_lake_spark.functions.unigram import UnigramModel
from etl_data_lake_spark.functions.wordpiece import WordPieceModel

_FORMAT = "etl-data-lake-tokenizer"
_VERSION = 1


def _atomic_write(path: str, payload: dict) -> None:
    doc = json.dumps(payload, sort_keys=True, separators=(",", ":"))
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(doc)
    os.replace(tmp, path)


def save_bpe(
    path: str, merges: Merges, byte_level: bool = False
) -> None:
    """Persist a BPE merge list (rank = list order). ``byte_level``
    records which alphabet the merges were learned over — the loader
    hands a byte-level artifact back as :class:`ByteBpeModel` so the
    two can never be silently confused (their merges are both plain
    string pairs, so nothing else distinguishes them)."""
    payload = {
        "format": _FORMAT,
        "version": _VERSION,
        "type": "bpe",
        "merges": [[a, b] for a, b in merges],
    }
    if byte_level:
        payload["byte_level"] = True
    _atomic_write(str(path), payload)


def save_unigram(path: str, model: UnigramModel) -> None:
    """Persist a unigram-LM model (pieces keep insertion order; the
    log-prob map is keyed by piece, JSON-exact doubles)."""
    _atomic_write(
        str(path),
        {
            "format": _FORMAT,
            "version": _VERSION,
            "type": "unigram",
            "max_piece_len": model.max_piece_len,
            "unk_logp": model.unk_logp,
            "pieces": list(model.pieces),
            "logp": {p: model.logp[p] for p in model.pieces},
        },
    )


def save_wordpiece(path: str, model: WordPieceModel) -> None:
    """Persist a WordPiece model (vocab keeps learn order — the
    alphabet-then-merges transcript; the encoder only needs the SET,
    but the order makes re-saves byte-identical and audits legible).
    The vocab is stored as the ordered tuple, never the frozenset the
    Spark encode paths swap in."""
    if not isinstance(model.vocab, tuple):
        raise ValueError(
            "save_wordpiece needs the ordered model from the trainer; "
            f"got vocab of type {type(model.vocab).__name__} (the "
            "frozenset form is encode-only and has no stable order)"
        )
    _atomic_write(
        str(path),
        {
            "format": _FORMAT,
            "version": _VERSION,
            "type": "wordpiece",
            "vocab": list(model.vocab),
            "unk_token": model.unk_token,
            "max_input_chars": model.max_input_chars,
        },
    )


def load_tokenizer(
    path: str,
) -> Merges | ByteBpeModel | UnigramModel | WordPieceModel:
    """Load a saved tokenizer: a character-level BPE artifact comes
    back as the merge list, a byte-level one as :class:`ByteBpeModel`
    (pass ``.merges`` plus ``byte_level=True`` to the encode fns), a
    unigram artifact as the :class:`UnigramModel` — each bit-equal to
    what was saved (encodes are pinned identical in
    tests/test_tokenizer_io.py)."""
    with open(str(path), encoding="utf-8") as f:
        doc = json.load(f)
    if not isinstance(doc, dict) or doc.get("format") != _FORMAT:
        raise ValueError(
            f"{path}: not a {_FORMAT} artifact "
            f"(format={doc.get('format') if isinstance(doc, dict) else None!r})"
        )
    if doc.get("version") != _VERSION:
        raise ValueError(
            f"{path}: unsupported artifact version {doc.get('version')!r} "
            f"(this reader understands {_VERSION})"
        )
    kind = doc.get("type")
    if kind == "bpe":
        merges = doc["merges"]
        if not all(
            isinstance(m, list) and len(m) == 2 for m in merges
        ):
            raise ValueError(f"{path}: malformed BPE merge list")
        pairs = [(a, b) for a, b in merges]
        if doc.get("byte_level"):
            return ByteBpeModel(pairs)
        return pairs
    if kind == "unigram":
        pieces = tuple(doc["pieces"])
        logp = doc["logp"]
        if set(pieces) != set(logp):
            raise ValueError(
                f"{path}: unigram pieces and logp keys disagree"
            )
        return UnigramModel(
            logp={p: float(logp[p]) for p in pieces},
            max_piece_len=int(doc["max_piece_len"]),
            unk_logp=float(doc["unk_logp"]),
            pieces=pieces,
        )
    if kind == "wordpiece":
        vocab = doc["vocab"]
        if not all(isinstance(p, str) for p in vocab) or len(
            set(vocab)
        ) != len(vocab):
            raise ValueError(
                f"{path}: malformed WordPiece vocab (non-string or "
                "duplicate pieces)"
            )
        unk = doc["unk_token"]
        if unk not in vocab:
            raise ValueError(
                f"{path}: unk_token {unk!r} missing from vocab"
            )
        return WordPieceModel(
            vocab=tuple(vocab),
            unk_token=unk,
            max_input_chars=int(doc["max_input_chars"]),
        )
    raise ValueError(f"{path}: unknown tokenizer type {kind!r}")
