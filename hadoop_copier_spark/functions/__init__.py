"""Column-level function library (text analysis, fingerprinting)."""

from .text import (  # noqa: F401
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id_guess,
    quality_score,
    whitespace_token_count,
)
