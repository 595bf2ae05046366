"""Text-analysis operators for training-data pipelines (SURVEY.md §2-E5/E6).

All pure JVM column expressions (split/regexp/aggregate) — no Python UDFs
in any hot path, so every operator stays inside whole-stage codegen and
scales linearly with input bytes.

- tokenization + word counts
- language ID: character-frequency n-gram heuristic (stopword-profile score)
- quality scoring: length / punctuation / stopword / repetition ratios
- token counting: whitespace and BPE-ish subword estimates
- document fingerprint: rolling (polynomial) hash over normalized text
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Whitespace spelled out, never `\s`: Java regex \s = [ \t\n\x0B\f\r]
# but DuckDB's RE2 \s omits \x0B (vertical tab), so a shared `\s` would
# tokenize '\x0b'-bearing text differently per engine (hypothesis-found).
# Both engines accept these escapes inside a bracket class verbatim.
WS = r" \t\n\x0B\f\r"
TOKEN_SPLIT_RE = rf"[{WS}]+"
# BPE-ish pre-tokenizer: words, numbers, or single non-space symbols
BPE_ISH_RE = rf"[A-Za-z]+|[0-9]+|[^A-Za-z0-9{WS}]"

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "que"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "que"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不"),
}


def tokens(text: Column) -> Column:
    return F.array_remove(F.split(F.lower(text), TOKEN_SPLIT_RE), "")


def space_tokens(text: Column | str, lower: bool = True) -> Column:
    """Non-empty tokens of ``split(text, ' ')`` — the llm/retrieval
    family's tokenizer — as ``array_remove(split(...), '')`` instead of
    the higher-order ``filter(..., t -> t != '')`` lambda. Value-
    identical by definition (remove every '' element, order preserved,
    NULL propagates), but the lambda evaluates per-element through an
    interpreted closure while array_remove is a plain JVM collection
    expression: A/B inside the real checkpoint/explode plans at the
    5 M-doc sf100 corpus measured the HOF at 6-22 s per pass vs 1.6 s
    for this form — and a btrim+regex-split rewrite tried first LOST to
    the HOF (Java's single-char literal split fast path beats a ``' +'``
    Pattern; keep the literal split).

    ``lower=False`` skips the per-char lowercasing for consumers that
    only take ``size()`` — token COUNT is case-invariant, so dropping
    ``lower`` keeps value-identity while saving a full string rewrite
    per document. INVARIANT: the token VALUES returned under
    ``lower=False`` differ from every lowercasing oracle's tokens —
    never compare them by value against an oracle that spells
    ``lower()``; size-only consumption is the only sanctioned use."""
    col = F.col(text) if isinstance(text, str) else text
    base = F.lower(col) if lower else col
    return F.array_remove(F.split(base, " "), "")


def whitespace_token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Subword-ish token estimate: regexp pre-tokenize, then charge one
    token per 4 characters of each word (ceiling) — a deterministic,
    vectorized stand-in for a real BPE vocabulary. NULL text counts as
    0 tokens — the oracle twin spells this COALESCE(list_sum(...), 0),
    and the round-8 adversarial-values sweep caught the Spark side
    returning NULL instead."""
    pieces = F.regexp_extract_all(F.lower(text), F.lit(BPE_ISH_RE), 0)
    return F.coalesce(
        F.aggregate(
            pieces,
            F.lit(0).cast("long"),
            lambda acc, p: acc + F.ceil(F.length(p) / 4.0).cast("long"),
        ),
        F.lit(0).cast("long"),
    )


def quality_score_raw(text: Column) -> Column:
    """[0,1] heuristic: penalize very short docs, high punctuation density,
    and low word diversity (repetition). Unrounded: the expression tree is
    pure IEEE-754 arithmetic evaluated in the same order as its SQL twin,
    so the double is bit-identical across engines. Quantize with FLOOR
    (engine-stable) — never ROUND, whose half-way tie-breaking differs
    between engines on boundary values."""
    n_chars = F.length(text).cast("double")
    toks = tokens(text)
    n_tok = F.size(toks).cast("double")
    n_uniq = F.size(F.array_distinct(toks)).cast("double")
    punct = F.length(F.regexp_replace(text, rf"[A-Za-z0-9{WS}]", "")).cast("double")
    len_score = F.least(n_chars / 200.0, F.lit(1.0))
    punct_score = 1.0 - F.least(punct / F.greatest(n_chars, F.lit(1.0)) * 5.0, F.lit(1.0))
    diversity = F.when(n_tok > 0, n_uniq / n_tok).otherwise(0.0)
    return (len_score + punct_score + diversity) / 3.0


def quality_score(text: Column) -> Column:
    return F.round(quality_score_raw(text), 4)


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    """Per-language stopword-hit ratio."""
    toks = tokens(text)
    out = []
    for lang, words in LANG_PROFILES.items():
        hits = F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in words])))
        out.append((lang, hits.cast("double") / float(len(words))))
    return out


def detect_language(text: Column) -> Column:
    """argmax over the language profiles; 'und' (undetermined) when no
    profile scores above zero."""
    scores = lang_scores(text)
    arr = F.array(
        *[
            F.struct(s.alias("score"), F.lit(lang).alias("lang"))
            for lang, s in scores
        ]
    )
    best = F.array_max(arr)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def doc_fingerprint(text: Column) -> Column:
    """Deterministic rolling polynomial hash of the normalized token stream
    (E: document fingerprinting): h = (h*31 + hash31(tok)) mod 2^56.
    The moduli keep every intermediate < 2^61 — no ANSI long overflow.
    hash31 is the md5-derived portable hash (functions/hashing.py), so the
    fingerprint is reproducible on ANY engine — the DuckDB twin is
    list_reduce over the same token hashes (workload/llm.py text_profile
    oracle)."""
    from delta_unity_duckdb_spark.functions.hashing import hash31

    mod = F.lit(1 << 56)
    return F.coalesce(
        F.aggregate(
            tokens(text),
            F.lit(0).cast("long"),
            lambda acc, t: F.pmod(acc * F.lit(31).cast("long") + hash31(t), mod),
        ),
        # NULL text -> the empty stream's fingerprint (0), matching the
        # oracle's list_prepend(0, …) seed (adversarial-values sweep)
        F.lit(0).cast("long"),
    )


def text_profile(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-pass per-document feature extraction. Quality is exported
    FLOOR-quantized (quality_e4) per the repo's cross-engine rule — ROUND
    on a double tie-breaks differently per engine; FLOOR of the
    bit-identical raw double cannot."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        whitespace_token_count(t).alias("n_tokens_ws"),
        bpe_ish_token_count(t).alias("n_tokens_bpe"),
        F.floor(quality_score_raw(t) * 10000).cast("long").alias("quality_e4"),
        detect_language(t).alias("lang_pred"),
        doc_fingerprint(t).alias("fingerprint"),
    )
