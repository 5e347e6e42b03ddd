"""HuggingFace ``tokenizer.json`` interop — the tokenizer counterpart
of lm_io's ARPA work (round 12): score/encode a corpus under a model
built by PUBLIC tooling, and export this repo's tokenizers so public
tooling can load them. ``tokenizers``' JSON artifact is the de-facto
interchange format (GPT-2, RoBERTa, BERT, Llama-2, every
`tokenizers`-trained model ships one).

Scope — stated loudly, enforced loudly. Round 13 (r12-verdict #2)
widened the loader from BPE-only to all three model families the repo
has encoders for:

* ``model.type == "BPE"`` with a ByteLevel or whitespace
  pre-tokenizer — the GPT-2 class; functions/bpe.py's byte↔unicode
  bijection IS ByteLevel's, and the loaded artifact shares ONE
  encoder with the repo-trained model.
* ``model.type == "WordPiece"`` — the BERT class; encodes through
  functions/wordpiece.py's greedy longest-match-first encoder
  (bit-equal by construction: the loaded vocab becomes a
  WordPieceModel and the SAME ``wordpiece_encode`` runs in-plan).
  ``continuing_subword_prefix`` must be ``##`` (anything else would
  silently re-segment) and BERT's usual normalizer/BertPreTokenizer
  raise — see below.
* ``model.type == "Unigram"`` — the SentencePiece class; encodes
  through functions/unigram.py's Viterbi (same determinism rules).
  Characters outside the piece vocabulary map to ``unk_id`` with
  consecutive unknowns FUSED (the ``tokenizers`` default
  ``fuse_unk=True`` for Unigram); an OOV with ``unk_id: null``
  raises rather than fabricating ids.

Normalizers and exotic pre-tokenizers raise rather than silently
mis-tokenizing — a tokenizer that "almost" matches re-tokenizes the
corpus wrong in ways no test downstream will catch. In particular
``BertPreTokenizer`` is REJECTED, not approximated: it isolates
Unicode-category-P punctuation plus the ASCII symbol block, which no
Java regex class expresses exactly (``[^\\w\\s]`` would also split
currency/math symbols BERT keeps attached).

Pre-tokenizer fidelity (round-13 advice fixes):

* HF's ``Whitespace`` is the regex ``\\w+|[^\\w\\s]+`` — ``'ab,'``
  splits into ``['ab', ',']``. A round-12 draft mapped it to
  ``\\S+``, silently diverging from the public tooling; only
  ``WhitespaceSplit`` is actually split-on-whitespace.
* All JVM-side patterns carry ``(?U)`` (UNICODE_CHARACTER_CLASS):
  java.util.regex's ``\\s``/``\\w`` are ASCII by default, while HF
  (Rust ``regex``) and the original GPT-2 encoder are Unicode-aware —
  NBSP/U+3000-bearing web documents would otherwise pre-tokenize
  differently from the artifact's own tooling. (The repo's OWN
  byte-BPE trainer keeps ASCII ``\\s`` on both its learn and encode
  sides deliberately — see functions/bpe.split_words — that is a
  different, internally-consistent contract.)

Execution split (the repo's standard shape):

* PRE-TOKENIZATION runs JVM-side — ``regexp_extract_all`` with the
  artifact's declared split (Java regex handles ``\\p{L}`` and the
  GPT-2 lookahead; Python's ``re`` does not, which is exactly why the
  split stays in the JVM) — so the Python stage never sees raw text,
  only the pretoken array;
* PER-WORD ENCODING runs in an Arrow-batched pandas UDF with a
  per-batch pretoken cache (Zipf: the inner loop runs once per
  DISTINCT pretoken per batch), reusing the repo's own encoders
  verbatim — one encoder per family, shared between loaded artifacts
  and repo-trained models.
"""

from __future__ import annotations

import json
from collections.abc import Callable
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
# public gpt-2 repo's encoder.py). (?U) = UNICODE_CHARACTER_CLASS so
# \s matches NBSP etc., as the original (Unicode-aware) regex does.
GPT2_PRE_PATTERN = (
    r"(?U)'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
    r"|\s+(?!\S)|\s+"
)
# HF 'Whitespace': word runs OR punctuation runs (the tokenizers
# crate's r"\w+|[^\w\s]+"), Unicode classes.
HF_WHITESPACE_PATTERN = r"(?U)\w+|[^\w\s]+"
# HF 'WhitespaceSplit': split on (Unicode) whitespace, keep the rest.
WHITESPACE_SPLIT_PATTERN = r"(?U)\S+"

_SPLIT_PATTERNS = {
    "byte_level": GPT2_PRE_PATTERN,
    "whitespace": HF_WHITESPACE_PATTERN,
    "whitespace_split": WHITESPACE_SPLIT_PATTERN,
}


@dataclass(frozen=True)
class HfBpeTokenizer:
    """A loaded (or exported) BPE tokenizer: ``vocab`` token → id,
    ``merges`` in rank order, ``byte_level`` picks the alphabet,
    ``add_prefix_space`` mirrors ByteLevel's option, ``unk_token``
    is the char-level OOV outcome (byte-level never needs one),
    ``word_split`` records which pre-tokenizer the artifact declared
    (round-13 advice fix: 'Whitespace' and 'WhitespaceSplit' are
    different splits and must stay distinguishable)."""

    vocab: dict
    merges: tuple
    byte_level: bool = True
    add_prefix_space: bool = False
    unk_token: str | None = None
    word_split: str = "byte_level"

    @property
    def pre_pattern(self) -> str:
        return _SPLIT_PATTERNS[self.word_split]

    def encoder(self) -> Callable[[str], list]:
        """word → token ids, a pure function closing over plain
        dicts/tuples (broadcast-friendly; no self reference)."""
        ranks = _ranks(list(self.merges))
        vocab = dict(self.vocab)
        byte_level = self.byte_level
        unk = self.unk_token

        def enc(word: str) -> list:
            symbols = byte_symbols(word) if byte_level else list(word)
            ids = []
            for p in _encode_symbols(symbols, ranks):
                if p in vocab:
                    ids.append(int(vocab[p]))
                elif unk is not None:
                    ids.append(int(vocab[unk]))
                else:
                    raise ValueError(
                        f"piece {p!r} not in vocab and the model "
                        "declares no unk_token"
                    )
            return ids

        return enc


@dataclass(frozen=True)
class HfWordPieceTokenizer:
    """A loaded (or exported) WordPiece tokenizer — encodes through
    functions/wordpiece.wordpiece_encode (the BERT greedy
    longest-match-first rule), then maps pieces to the artifact's
    ids."""

    vocab: dict
    unk_token: str
    max_input_chars: int = 100
    word_split: str = "whitespace"

    @property
    def pre_pattern(self) -> str:
        return _SPLIT_PATTERNS[self.word_split]

    def encoder(self) -> Callable[[str], list]:
        from etl_data_lake_spark.functions.wordpiece import (
            WordPieceModel,
            wordpiece_encode,
        )

        model = WordPieceModel(
            vocab=frozenset(self.vocab),  # type: ignore[arg-type]
            unk_token=self.unk_token,
            max_input_chars=self.max_input_chars,
        )
        vocab = dict(self.vocab)

        def enc(word: str) -> list:
            return [int(vocab[p]) for p in wordpiece_encode(word, model)]

        return enc


@dataclass(frozen=True)
class HfUnigramTokenizer:
    """A loaded (or exported) Unigram tokenizer — encodes through
    functions/unigram.unigram_encode (Viterbi, same tie rules), then
    maps pieces to ids; OOV single-char fallbacks map to ``unk_id``
    with consecutive unknowns fused (the ``tokenizers`` Unigram
    default ``fuse_unk=True``), or raise when ``unk_id`` is null."""

    entries: tuple  # ((piece, logp), ...) in artifact order = id order
    unk_id: int | None = None
    word_split: str = "whitespace_split"

    @property
    def pre_pattern(self) -> str:
        return _SPLIT_PATTERNS[self.word_split]

    def encoder(self) -> Callable[[str], list]:
        from etl_data_lake_spark.functions.unigram import (
            UnigramModel,
            unigram_encode,
        )

        logp = {p: float(lp) for p, lp in self.entries}
        ids = {p: i for i, (p, _) in enumerate(self.entries)}
        # OOV chars score below every real piece so Viterbi only uses
        # the fallback when forced (SentencePiece's unk-penalty shape)
        unk_logp = min(logp.values()) - 10.0 if logp else -20.0
        model = UnigramModel(
            logp=logp,
            max_piece_len=max((len(p) for p in logp), default=1),
            unk_logp=unk_logp,
        )
        unk_id = self.unk_id

        def enc(word: str) -> list:
            out: list = []
            # fuse RUNS OF OOV PIECES only (round-13 review fix): the
            # HF fuse_unk rule is keyed on the piece being unknown,
            # not on the last emitted id — a genuine in-vocab
            # occurrence of the unk piece string followed by an OOV
            # char must still emit both tokens
            prev_oov = False
            for p in unigram_encode(word, model):
                i = ids.get(p)
                if i is not None:
                    out.append(int(i))
                    prev_oov = False
                elif unk_id is None:
                    raise ValueError(
                        f"piece {p!r} not in the Unigram vocab and the "
                        "artifact declares unk_id: null"
                    )
                elif not prev_oov:
                    out.append(int(unk_id))
                    prev_oov = True
            return out

        return enc


HfTokenizer = HfBpeTokenizer | HfWordPieceTokenizer | HfUnigramTokenizer


def _pre_tokenizers(node) -> list:
    """Flatten a pre_tokenizer node (Sequence unwraps one level)."""
    if node is None:
        return []
    if node.get("type") == "Sequence":
        return list(node.get("pretokenizers", []))
    return [node]


def _analyze_pre(doc: dict) -> tuple[bool, bool, str]:
    """→ (byte_level, add_prefix_space, word_split). Raises on
    pre-tokenizers outside {ByteLevel, Whitespace, WhitespaceSplit}
    and on ``ByteLevel.use_regex=false`` (a materially different
    split). BertPreTokenizer is rejected deliberately: its
    category-P + ASCII-symbol punctuation isolation has no exact Java
    regex twin (``[^\\w\\s]`` also splits currency/math symbols BERT
    keeps attached) — an approximation would silently re-tokenize."""
    byte_level = False
    add_prefix_space = False
    word_split = "whitespace_split"
    saw_ws = False
    for p in _pre_tokenizers(doc.get("pre_tokenizer")):
        t = p.get("type")
        if t == "ByteLevel":
            byte_level = True
            word_split = "byte_level"
            add_prefix_space = bool(p.get("add_prefix_space", False))
            if p.get("use_regex", True) is False:
                raise ValueError(
                    "ByteLevel use_regex=false is a materially "
                    "different split — unsupported"
                )
        elif t == "Whitespace":
            saw_ws = True
            word_split = "whitespace"
        elif t == "WhitespaceSplit":
            saw_ws = True
            word_split = "whitespace_split"
        else:
            raise ValueError(
                f"unsupported pre_tokenizer {t!r} (ByteLevel, "
                "Whitespace, WhitespaceSplit; BertPreTokenizer has no "
                "exact regex twin and is rejected, not approximated)"
            )
    if byte_level and saw_ws:
        # round-13 review fix: a Sequence composing ByteLevel with a
        # whitespace splitter has COMPOSED semantics this loader does
        # not implement — last-wins would silently mis-tokenize (and
        # order-dependently), the exact failure the module promises
        # to raise on
        raise ValueError(
            "pre_tokenizer Sequence mixes ByteLevel with a whitespace "
            "splitter — the composed split is not implemented; "
            "refusing to guess"
        )
    return byte_level, add_prefix_space, word_split


def load_hf_tokenizer_json(
    path: str, ignore_added_tokens: bool = False
) -> HfTokenizer:
    """Parse a ``tokenizer.json`` into the matching tokenizer class
    (BPE / WordPiece / Unigram). Raises on normalizers, on
    pre-tokenizers outside {ByteLevel, Whitespace, WhitespaceSplit},
    on a declared ``unk_token`` missing from the vocab, on
    ``added_tokens`` (unless ``ignore_added_tokens=True`` — an added
    token's string in the corpus would sub-tokenize into pieces
    instead of its reserved id, so the caller must assert the corpus
    cannot contain them; GPT-2's ``<|endoftext|>`` is the classic safe
    case), and on structurally corrupt models (BPE merges naming
    symbols whose concatenation is missing from the vocab; WordPiece
    with a non-``##`` continuation prefix; Unigram ``unk_id`` out of
    range). Accepts both BPE merge spellings in the wild: ``"a b"``
    strings (classic) and ``["a", "b"]`` pairs (newer ``tokenizers``
    releases)."""
    with open(str(path), encoding="utf-8") as f:
        doc = json.load(f)
    model = doc.get("model") or {}
    mtype = model.get("type")
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
            "reserve — their strings in the corpus would sub-tokenize "
            "instead of mapping to the reserved id; pass "
            "ignore_added_tokens=True only if the corpus cannot "
            "contain them"
        )
    byte_level, add_prefix_space, word_split = _analyze_pre(doc)
    if mtype == "BPE":
        return _load_bpe(model, byte_level, add_prefix_space, word_split)
    if mtype == "WordPiece":
        if byte_level:
            raise ValueError(
                "WordPiece with a ByteLevel pre-tokenizer is not a "
                "published artifact shape — refusing to guess"
            )
        return _load_wordpiece(model, word_split)
    if mtype == "Unigram":
        if byte_level:
            raise ValueError(
                "Unigram with a ByteLevel pre-tokenizer is not a "
                "published artifact shape — refusing to guess"
            )
        return _load_unigram(model, word_split)
    raise ValueError(
        f"load_hf_tokenizer_json supports model.type in "
        f"{{'BPE', 'WordPiece', 'Unigram'}}; got {mtype!r}"
    )


def _load_bpe(
    model: dict, byte_level: bool, add_prefix_space: bool, word_split: str
) -> HfBpeTokenizer:
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
        word_split=word_split,
    )


def _load_wordpiece(model: dict, word_split: str) -> HfWordPieceTokenizer:
    from etl_data_lake_spark.functions.wordpiece import _CONT

    vocab = dict(model["vocab"])
    cont = model.get("continuing_subword_prefix", _CONT)
    if cont != _CONT:
        raise ValueError(
            f"continuing_subword_prefix {cont!r} != {_CONT!r} — the "
            "repo's WordPiece encoder is position-aware on '##' and "
            "a different marker would silently re-segment"
        )
    unk = model.get("unk_token")
    if unk is None or unk not in vocab:
        raise ValueError(
            f"WordPiece requires an unk_token present in the vocab "
            f"(got {unk!r}) — unmatchable words encode as it"
        )
    return HfWordPieceTokenizer(
        vocab=vocab,
        unk_token=str(unk),
        max_input_chars=int(model.get("max_input_chars_per_word", 100)),
        word_split=word_split,
    )


def _load_unigram(model: dict, word_split: str) -> HfUnigramTokenizer:
    raw = model.get("vocab") or []
    entries = tuple((str(p), float(lp)) for p, lp in raw)
    if not entries:
        raise ValueError("Unigram artifact has an empty vocab")
    unk_id = model.get("unk_id")
    if unk_id is not None and not (0 <= int(unk_id) < len(entries)):
        raise ValueError(
            f"unk_id {unk_id} is out of range for a vocab of "
            f"{len(entries)} pieces — corrupt artifact"
        )
    if model.get("byte_fallback"):
        raise ValueError(
            "Unigram byte_fallback=true is unsupported — OOV bytes "
            "would need the <0xNN> piece convention; re-export "
            "without byte fallback"
        )
    return HfUnigramTokenizer(
        entries=entries,
        unk_id=None if unk_id is None else int(unk_id),
        word_split=word_split,
    )


# ---------------------------------------------------------------------------
# Export — repo-trained models as tokenizer.json any `tokenizers`
# build loads. Atomic rename like every artifact writer here.
# ---------------------------------------------------------------------------


def save_hf_tokenizer_json(path: str, merges, byte_level: bool = True) -> None:
    """Export a repo-trained byte-BPE merges table: base alphabet
    first (the 256 byte symbols in bijection order), then one vocab
    entry per merge in rank order — the GPT-2 vocab construction."""
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


def save_hf_wordpiece_json(path: str, model) -> None:
    """Export a repo-trained :class:`~.wordpiece.WordPieceModel`:
    ids follow the model's ORDERED vocab (the trainer's transcript:
    unk + alphabet first, merges in learn order), the unk token
    appended only if the trainer somehow omitted it. The
    encode-optimized form (``vocab`` swapped to a frozenset) is
    REJECTED — set iteration order varies with hash randomization,
    which would make two exports of the identical model disagree on
    ids (round-13 review fix)."""
    from etl_data_lake_spark.functions.tokenizer_io import _atomic_write
    from etl_data_lake_spark.functions.wordpiece import _CONT

    if isinstance(model.vocab, (set, frozenset)):
        raise ValueError(
            "save_hf_wordpiece_json needs the trainer's ORDERED vocab; "
            "got a set (the broadcastable encode form) — export the "
            "model returned by learn_wordpiece/train_wordpiece_from_hist"
        )
    vocab: dict[str, int] = {}
    for piece in model.vocab:
        vocab.setdefault(piece, len(vocab))
    vocab.setdefault(model.unk_token, len(vocab))
    _atomic_write(
        str(path),
        {
            "version": "1.0",
            "model": {
                "type": "WordPiece",
                "vocab": vocab,
                "unk_token": model.unk_token,
                "continuing_subword_prefix": _CONT,
                "max_input_chars_per_word": model.max_input_chars,
            },
            "pre_tokenizer": {"type": "WhitespaceSplit"},
            "normalizer": None,
            "added_tokens": [],
        },
    )


def save_hf_unigram_json(path: str, model) -> None:
    """Export a repo-trained :class:`~.unigram.UnigramModel`: the
    ordered piece list with log-probs (id = position). ``unk_id`` is
    null — the trainer's coverage guarantee (every seen single char
    stays in the vocab) means OOV only occurs on chars the training
    corpus never contained, and the loader raises there rather than
    guessing (the trainer-side ``unk_logp`` char fallback does not
    round-trip through the HF schema)."""
    from etl_data_lake_spark.functions.tokenizer_io import _atomic_write

    _atomic_write(
        str(path),
        {
            "version": "1.0",
            "model": {
                "type": "Unigram",
                "vocab": [[p, model.logp[p]] for p in model.pieces],
                "unk_id": None,
            },
            "pre_tokenizer": {"type": "WhitespaceSplit"},
            "normalizer": None,
            "added_tokens": [],
        },
    )


# ---------------------------------------------------------------------------
# Encoding — pure-Python reference + the in-plan Spark path, one per
# family via the shared encoder() seam.
# ---------------------------------------------------------------------------


def hf_encode_word(pretoken: str, tok: HfTokenizer) -> list:
    """Pure-Python reference: one pretoken → token ids (the Spark path
    runs this same per-word function inside the Arrow batches)."""
    return tok.encoder()(pretoken)


def hf_token_ids(
    docs: DataFrame,
    tok: HfTokenizer,
    text_col: str = "text",
    out_col: str = "token_ids",
) -> DataFrame:
    """→ input columns plus ``out_col`` (array<int>): each document's
    token ids under the loaded tokenizer. Pre-tokenization is one JVM
    ``regexp_extract_all`` with the artifact's declared split; the
    pandas UDF sees only the pretoken array and encodes with a
    per-batch cache."""
    from pyspark.sql.functions import pandas_udf

    encode_word = tok.encoder()

    @pandas_udf("array<int>")
    def enc(pretoks: pd.Series) -> pd.Series:
        cache: dict[str, list] = {}

        def one(word: str) -> list:
            hit = cache.get(word)
            if hit is None:
                hit = encode_word(word)
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
    if (
        isinstance(tok, HfBpeTokenizer)
        and tok.byte_level
        and tok.add_prefix_space
    ):
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
    tok: HfTokenizer,
    text_col: str = "text",
    out_col: str = "n_hf_tokens",
) -> DataFrame:
    """→ input columns plus the EXACT token count under the loaded
    tokenizer — the drop-in budget column for packing/chunking when
    the deployment tokenizer is a public artifact."""
    if "__ids" in docs.columns:
        # reserved-column convention (round-13 advice fix): silently
        # overwriting-then-dropping a caller's '__ids' would corrupt it
        raise ValueError("'__ids' is reserved by hf_token_counts — rename")
    with_ids = hf_token_ids(docs, tok, text_col, "__ids")
    return with_ids.withColumn(
        out_col, F.size("__ids").cast("long")
    ).drop("__ids")


def hf_tokenizer_stats(
    docs: DataFrame,
    tok: HfTokenizer,
    text_col: str = "text",
    group_col: str | None = "lang",
) -> DataFrame:
    """Tokenizer FERTILITY audit (round 13): per group (language,
    source, …) under the loaded tokenizer —

    * ``n_docs``, ``n_tokens``, ``n_words`` (whitespace words),
      ``n_bytes`` (UTF-8);
    * ``tokens_per_word`` — fertility, the MT-literature metric: how
      many subwords an average word shatters into (≈1 on the
      tokenizer's home language, inflating on scripts the vocab
      under-serves);
    * ``bytes_per_token`` — compression: how much raw text one token
      carries (the direct driver of context-window cost per
      document).

    The standard audit before committing a corpus to a public
    tokenizer: fertility imbalance across languages is a known
    multilingual-cost trap, and this makes it ONE scan + one
    ≤|groups|-row aggregation. ``group_col=None`` returns a single
    corpus-wide row (grouped under a literal 'all')."""
    if "__n_tok" in docs.columns:
        raise ValueError(
            "'__n_tok' is reserved by hf_tokenizer_stats — rename"
        )
    counted = hf_token_counts(docs, tok, text_col, "__n_tok")
    group = (
        F.coalesce(F.col(group_col).cast("string"), F.lit("<null>"))
        if group_col is not None
        else F.lit("all")
    )
    text = F.col(text_col)
    per_doc = counted.select(
        group.alias("group"),
        F.col("__n_tok").alias("n_tok"),
        F.size(
            F.filter(F.split(text, r"\s+"), lambda w: w != "")
        ).cast("long").alias("n_words"),
        F.coalesce(
            F.octet_length(text).cast("long"), F.lit(0)
        ).alias("n_bytes"),
    )
    agg = per_doc.groupBy("group").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_bytes").cast("long").alias("n_bytes"),
    )
    return agg.select(
        "group",
        "n_docs",
        "n_tokens",
        "n_words",
        "n_bytes",
        F.when(
            F.col("n_words") > 0,
            F.round(F.col("n_tokens") / F.col("n_words"), 6),
        ).alias("tokens_per_word"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("n_bytes") / F.col("n_tokens"), 6),
        ).alias("bytes_per_token"),
    )
