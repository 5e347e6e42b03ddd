from etl_data_lake_spark.functions.redact import (
    PII_PATTERNS,
    pii_stats,
    redact_pii,
    redact_text,
)
from etl_data_lake_spark.functions.lm import (
    bigram_perplexity_score,
    train_bigram_lm,
)
from etl_data_lake_spark.functions.bpe import (
    bpe_encode,
    bpe_token_counts,
    bpe_tokens_df,
    learn_bpe,
)
from etl_data_lake_spark.functions.classifier import (
    LogRegModel,
    classifier_eval,
    hashed_features,
    nb_quality_filter,
    nb_quality_scores,
    quality_filter,
    score_logreg,
    train_logreg,
    weak_quality_label,
)
from etl_data_lake_spark.functions.calibration import (
    IsotonicModel,
    PlattModel,
    calibrate_scores,
    calibration_bins,
    calibration_summary,
    fit_isotonic,
    fit_isotonic_by,
    fit_platt,
    fit_temperature,
    isotonic_calibrate,
    isotonic_calibrate_by,
)
from etl_data_lake_spark.functions.hybrid import hybrid_search, rrf_fuse
from etl_data_lake_spark.functions.normalize import (
    normalize_docs,
    normalize_text,
)
from etl_data_lake_spark.functions.tokenizer_io import (
    load_tokenizer,
    save_bpe,
    save_unigram,
)
from etl_data_lake_spark.functions.unigram import (
    UnigramModel,
    learn_unigram,
    unigram_encode,
    unigram_token_counts,
    unigram_tokens_df,
)
from etl_data_lake_spark.functions.repetition import (
    repetition_filter,
    repetition_signals,
)

__all__ = [
    "PII_PATTERNS",
    "redact_text",
    "redact_pii",
    "pii_stats",
    "repetition_signals",
    "repetition_filter",
    "normalize_text",
    "normalize_docs",
    "train_bigram_lm",
    "bigram_perplexity_score",
    "learn_bpe",
    "bpe_encode",
    "bpe_token_counts",
    "bpe_tokens_df",
    "LogRegModel",
    "classifier_eval",
    "hashed_features",
    "train_logreg",
    "score_logreg",
    "quality_filter",
    "nb_quality_scores",
    "nb_quality_filter",
    "weak_quality_label",
    "PlattModel",
    "IsotonicModel",
    "fit_temperature",
    "fit_platt",
    "fit_isotonic",
    "fit_isotonic_by",
    "calibrate_scores",
    "isotonic_calibrate",
    "isotonic_calibrate_by",
    "calibration_bins",
    "calibration_summary",
    "hybrid_search",
    "rrf_fuse",
    "UnigramModel",
    "learn_unigram",
    "unigram_encode",
    "unigram_token_counts",
    "unigram_tokens_df",
    "save_bpe",
    "save_unigram",
    "load_tokenizer",
]
