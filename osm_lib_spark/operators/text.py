"""Text-analysis operators for the training-data pipeline: token
counting, quality scoring, language ID, document fingerprinting.

Engine additions (no reference analog) — first-class operators a 100 TB
corpus engine needs. All are pure Column expressions (JVM, codegen):
token math stays out of Python entirely, and every output column is an
integer or string so the DuckDB oracle comparison is float-free.

Shared vocabulary between the Spark queries and the SQL oracles lives
in module constants; the oracle SQL is generated from the same lists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_lib_spark.functions.hashing import FP_BASE, MOD_FP, md5_int_col

# function-word profiles for the language-ID heuristic (fixed, public
# knowledge); scored by count of exact token matches
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "den", "ein", "ist"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "du", "est", "dans"),
}
LANG_ORDER = ("en", "es", "de", "fr")  # deterministic argmax tie-break
MIN_LANG_SCORE = 1  # below this → 'und'

STOPWORDS_EN = LANG_PROFILES["en"]
PUNCT_CLASS = r"[.!?,;:]"

# Scrub patterns: deliberately restricted to the Java-regex ∩ RE2 common
# subset (character classes, +/{m,} quantifiers — no backrefs or
# lookaround) so Spark's regexp_replace and DuckDB's produce identical
# redactions for the oracle hash-compare.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
URL_RE = r"https?://[^ \t\n]+"


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization: split on runs of whitespace, trimmed."""
    return F.split(F.trim(text), r"\s+")


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens) — BPE-ish subword count approximated as
    whitespace tokens + a chars/4 cap term is deliberately NOT included
    (keep the oracle exact); n_chars is returned alongside."""
    return df.select(
        id_col,
        F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Integer quality signals per doc + a 0/1 quality gate.

    Gate: 5 ≤ words ≤ 10000 AND mean word length in [2, 12] (×10 as an
    integer to stay float-free) AND ≥1 stopword.
    """
    toks = tokens_col(F.col(text_col))
    n_words = F.size(toks).cast("long")
    n_chars = F.length(text_col).cast("long")
    n_stop = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS_EN))
    ).cast("long")
    n_punct = (
        F.length(text_col) - F.length(F.regexp_replace(F.col(text_col), PUNCT_CLASS, ""))
    ).cast("long")
    mean_wlen_x10 = F.when(n_words > 0, (n_chars * 10) / n_words).otherwise(0).cast("long")
    # repetition signals (Gopher-style filters, ×1000 integers so both
    # engines stay float-free): fraction of repeated words, fraction of
    # repeated word 2-grams. Both are O(tokens) set operations — the
    # map-only shape survives any corpus size. is_quality deliberately
    # EXCLUDES them (corpus_curate's oracle composes on the original
    # gate); downstream filters threshold the columns directly.
    n_distinct_words = F.size(F.array_distinct(toks)).cast("long")
    dup_word_x1000 = (
        F.when(n_words > 0, ((n_words - n_distinct_words) * 1000) / n_words)
        .otherwise(0)
        .cast("long")
    )
    from osm_lib_spark.operators.dedup import shingles_col

    n_distinct_2grams = F.size(shingles_col(F.col(text_col), 2)).cast("long")
    dup_2gram_x1000 = (
        F.when(
            n_words >= 2,
            (((n_words - 1) - n_distinct_2grams) * 1000) / (n_words - 1),
        )
        .otherwise(0)
        .cast("long")
    )
    is_quality = (
        (n_words >= 5)
        & (n_words <= 10000)
        & (mean_wlen_x10 >= 20)
        & (mean_wlen_x10 <= 120)
        & (n_stop >= 1)
    ).cast("long")
    return df.select(
        id_col,
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        n_stop.alias("n_stop"),
        n_punct.alias("n_punct"),
        mean_wlen_x10.alias("mean_wlen_x10"),
        dup_word_x1000.alias("dup_word_x1000"),
        dup_2gram_x1000.alias("dup_2gram_x1000"),
        is_quality.alias("is_quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pred_lang, score) — function-word vote, deterministic
    tie-break by LANG_ORDER; 'und' when the best score < MIN_LANG_SCORE."""
    toks = tokens_col(F.lower(F.col(text_col)))

    def _match(words):
        # single-arg lambda: PySpark passes (value, index) to 2-ary lambdas
        return lambda t: t.isin(*words)

    scores = {
        lang: F.size(F.filter(toks, _match(words))).cast("long")
        for lang, words in LANG_PROFILES.items()
    }
    best = scores[LANG_ORDER[0]]
    pred = F.lit(LANG_ORDER[0])
    for lang in LANG_ORDER[1:]:
        is_better = scores[lang] > best
        pred = F.when(is_better, F.lit(lang)).otherwise(pred)
        best = F.when(is_better, scores[lang]).otherwise(best)
    pred = F.when(best >= MIN_LANG_SCORE, pred).otherwise(F.lit("und"))
    return df.select(
        id_col, pred.alias("pred_lang"), best.alias("score")
    )


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fingerprint) — rolling polynomial hash over token hashes:

        fp = foldl(tokens, 0, (acc, t) → (acc·31 + h32(t)) mod 1e9+7)

    Order-sensitive (a permuted document fingerprints differently),
    cross-engine exact (int64 arithmetic only).
    """
    toks = tokens_col(F.col(text_col))
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * FP_BASE + md5_int_col(t)) % MOD_FP,
    )
    return df.select(id_col, fp.alias("fingerprint"))


# ---------------------------------------------------------------------------
# DuckDB oracle SQL generators (same constants, same semantics)
# ---------------------------------------------------------------------------


def _sql_in_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


def token_counts_sql(table: str = "documents") -> str:
    return (
        "SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens, "
        f"CAST(length(text) AS BIGINT) AS n_chars FROM {table}"
    )


def quality_scores_sql(table: str = "documents") -> str:
    return f"""
    WITH t AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               regexp_split_to_array(trim(text), '\\s+') AS tk,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_words,
               CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                    x -> lower(x) IN ({_sql_in_list(STOPWORDS_EN)}))) AS BIGINT) AS n_stop,
               CAST(length(text) - length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')) AS BIGINT) AS n_punct
        FROM {table}
    )
    SELECT doc_id, n_chars, n_words, n_stop, n_punct,
           CAST(CASE WHEN n_words > 0 THEN (n_chars * 10) // n_words ELSE 0 END AS BIGINT) AS mean_wlen_x10,
           CAST(CASE WHEN n_words > 0
                 THEN ((n_words - len(list_distinct(tk))) * 1000) // n_words
                 ELSE 0 END AS BIGINT) AS dup_word_x1000,
           CAST(CASE WHEN n_words >= 2
                 THEN (((n_words - 1) - len(list_distinct(list_transform(
                        generate_series(0, greatest(len(tk) - 2, 0)),
                        i -> array_to_string(tk[i+1:i+2], ' '))))) * 1000) // (n_words - 1)
                 ELSE 0 END AS BIGINT) AS dup_2gram_x1000,
           CAST(CASE WHEN n_words >= 5 AND n_words <= 10000
                 AND (n_chars * 10) // n_words BETWEEN 20 AND 120
                 AND n_stop >= 1 THEN 1 ELSE 0 END AS BIGINT) AS is_quality
    FROM t
    """


def lang_id_sql(table: str = "documents") -> str:
    score_exprs = {
        lang: (
            "CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), "
            f"x -> x IN ({_sql_in_list(words)}))) AS BIGINT)"
        )
        for lang, words in LANG_PROFILES.items()
    }
    # deterministic argmax with LANG_ORDER tie-break, then 'und' floor
    best = score_exprs[LANG_ORDER[0]]
    pred = f"'{LANG_ORDER[0]}'"
    for lang in LANG_ORDER[1:]:
        s = score_exprs[lang]
        pred = f"CASE WHEN {s} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"CASE WHEN {s} > {best} THEN {s} ELSE {best} END"
    return f"""
    SELECT doc_id,
           CASE WHEN {best} >= {MIN_LANG_SCORE} THEN {pred} ELSE 'und' END AS pred_lang,
           {best} AS score
    FROM {table}
    """


def fingerprints_sql(table: str = "documents") -> str:
    h = "CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)"
    return f"""
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(regexp_split_to_array(trim(text), '\\s+'), x -> {h})),
               (acc, v) -> (acc * {FP_BASE} + v) % {MOD_FP}
           ) AS fingerprint
    FROM {table}
    """


def scrub_text(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, clean_text, n_urls, n_emails): PII/URL scrubbing —
    redact URLs then emails with sentinel tokens and collapse runs of
    spaces/tabs. Pure Column regexps (codegen), order fixed (URLs
    first: an email inside a URL query string is already gone).

    At corpus scale this is the map-only cleaning pass that runs fused
    with the scan — no shuffle, prunes to (id, text).
    """
    t = F.col(text_col)
    n_urls = F.size(F.regexp_extract_all(t, F.lit(URL_RE), 0)).cast("long")
    n_emails_pre = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).cast("long")
    no_urls = F.regexp_replace(t, URL_RE, "<URL>")
    # emails counted AFTER URL removal (emails inside URLs don't double-count)
    n_emails = F.size(F.regexp_extract_all(no_urls, F.lit(EMAIL_RE), 0)).cast("long")
    cleaned = F.trim(
        F.regexp_replace(F.regexp_replace(no_urls, EMAIL_RE, "<EMAIL>"), r"[ \t]+", " ")
    )
    return df.select(
        id_col,
        cleaned.alias("clean_text"),
        n_urls.alias("n_urls"),
        n_emails.alias("n_emails"),
    )


def scrub_text_sql(table: str = "documents") -> str:
    """DuckDB twin of ``scrub_text`` (same restricted patterns, same
    order of operations)."""
    email = EMAIL_RE.replace("\\", "\\")
    url = URL_RE
    return f"""
        WITH no_urls AS (
            SELECT doc_id,
                   regexp_replace(text, '{url}', '<URL>', 'g') AS nu,
                   len(regexp_extract_all(text, '{url}')) AS n_urls
            FROM {table}
        )
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(nu, '{email}', '<EMAIL>', 'g'),
                                   '[ \t]+', ' ', 'g')) AS clean_text,
               CAST(n_urls AS BIGINT) AS n_urls,
               CAST(len(regexp_extract_all(nu, '{email}')) AS BIGINT) AS n_emails
        FROM no_urls
    """
