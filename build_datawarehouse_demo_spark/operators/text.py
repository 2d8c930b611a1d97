"""Text-analysis operators for training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): language ID,
quality scoring, token counting, fingerprinting — all pure
`pyspark.sql.functions` expressions (JVM-side, whole-stage codegen), no
Python UDFs, so a 100 TB document scan stays one codegen'd stage.

Determinism: every score is an integer-count ratio (exact division of
exact longs), every hash is md5 — reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker stopwords per language for the n-gram/stopword-hit heuristic.
# English-heavy by design: the heuristic's job is to rank, not to be a
# real langid model (those need external corpora this container lacks).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "et", "est", "les", "des"),
    "es": ("el", "la", "y", "es", "los", "que"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3"),
}

_WORD_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization (empty tokens removed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish regex token count
    (letter runs / digit runs / single punctuation)."""
    return df.withColumns(
        {
            "n_ws_tokens": F.size(tokens(text_col)).cast("bigint"),
            "n_re_tokens": F.regexp_count(F.lower(F.col(text_col)), F.lit(_WORD_RE)).cast(
                "bigint"
            ),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword heuristics -> quality in [0,1].

    All components are exact ratios of long counts, combined with fixed
    weights; deterministic across engines.
    """
    toks = tokens(text_col)
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(F.col(text_col)).cast("double")
    stop = F.array([F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t)))).cast("double")
    n_punct = F.regexp_count(F.col(text_col), F.lit(r"[^a-zA-Z0-9\s]")).cast("double")
    avg_tok_len = F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    # weights: reward stopword presence (fluency proxy) and 3-8 char
    # average tokens; punish punctuation soup.
    len_ok = F.when((avg_tok_len >= 3) & (avg_tok_len <= 8), F.lit(1.0)).otherwise(F.lit(0.0))
    score = F.least(
        F.lit(1.0),
        F.greatest(F.lit(0.0), F.lit(0.4) * len_ok + F.lit(0.4) * stop_ratio * 4 + F.lit(0.2) * (1 - punct_ratio)),
    )
    return df.withColumns(
        {
            "n_tokens": n_tok.cast("bigint"),
            "avg_token_len": avg_tok_len,
            "stopword_ratio": stop_ratio,
            "punct_ratio": punct_ratio,
            "quality": score,
        }
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: count marker hits per language,
    pick the argmax (ties broken by language code order — deterministic).
    """
    toks = tokens(text_col)
    hit_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array([F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))
        # sort key (-hits, lang): ascending sort = highest hits first,
        # ties broken by lexicographically FIRST language code.
        hit_cols.append(
            F.struct((-hits).cast("bigint").alias("neg_hits"), F.lit(lang).alias("lang"))
        )
    best = F.sort_array(F.array(*hit_cols)).getItem(0)
    return df.withColumns(
        {
            "pred_lang": best.getField("lang"),
            "marker_hits": (-best.getField("neg_hits")).cast("bigint"),
        }
    )


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token multiset — catches re-ordered near-identical docs
    (the token-set analogue of a rolling hash)."""
    canon = F.concat_ws("\x01", F.sort_array(F.array_distinct(tokens(text_col))))
    return df.withColumn(out_col, F.md5(canon))
