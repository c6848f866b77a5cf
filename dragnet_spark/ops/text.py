"""Text analysis operators: tokenize, quality, language ID, fingerprints.

Everything here is a pure Spark column expression — no UDFs — so the
operators vectorize, push down, and scale linearly with input
partitions. Each has an exact ANSI-SQL twin used by the DuckDB oracle
(kept adjacent so they evolve together).

Determinism contract: any hash used for signatures is md5 of an
explicit string (same bytes → same hex on any engine); min/argmax over
hex strings is total because the strings are fixed-length.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small built-in stopword sets for the language-ID heuristic; a real
# deployment would swap in fastText or CLD3 via a pandas_udf — the
# heuristic keeps the operator dependency-free and oracle-checkable
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "is", "in", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "los", "las", "y", "es", "un", "una", "que"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不"],
}
_LANG_ORDER = ["en", "de", "fr", "es", "zh"]  # deterministic tie-break


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), r"\s+")


def tokens_sql(expr: str) -> str:
    return f"regexp_split_to_array(trim(lower({expr})), '\\s+')"


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def token_count_sql(expr: str) -> str:
    return f"CAST(len({tokens_sql(expr)}) AS BIGINT)"


def quality_columns(col: Column | str) -> dict[str, Column]:
    """Quality-scoring features: length, token stats, punct/digit/space
    ratios. Returned as named columns so callers pick what they keep."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("long")
    toks = tokens(c)
    n_tokens = F.size(toks).cast("long")
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))
    n_space = n_chars - F.length(F.regexp_replace(c, r"\s", ""))
    stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast("long")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": F.round(
            (n_chars - n_space).cast("double") / F.greatest(n_tokens, F.lit(1)), 6
        ),
        "punct_ratio": F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6),
        "digit_ratio": F.round(n_digit.cast("double") / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(
            n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)), 6
        ),
    }


def quality_sql(expr: str) -> dict[str, str]:
    toks = tokens_sql(expr)
    n_chars = f"CAST(length({expr}) AS BIGINT)"
    n_tokens = f"CAST(len({toks}) AS BIGINT)"
    n_punct = f"(length({expr}) - length(regexp_replace({expr}, '[^\\w\\s]', '', 'g')))"
    n_digit = f"(length({expr}) - length(regexp_replace({expr}, '[0-9]', '', 'g')))"
    n_space = f"(length({expr}) - length(regexp_replace({expr}, '\\s', '', 'g')))"
    stop = "[" + ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"]) + "]"
    n_stop = f"len(list_filter({toks}, t -> list_contains({stop}, t)))"
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": (
            f"round(CAST(length({expr}) - {n_space} AS DOUBLE)"
            f" / greatest(len({toks}), 1), 6)"
        ),
        "punct_ratio": f"round(CAST({n_punct} AS DOUBLE) / greatest(length({expr}), 1), 6)",
        "digit_ratio": f"round(CAST({n_digit} AS DOUBLE) / greatest(length({expr}), 1), 6)",
        "stopword_ratio": f"round(CAST({n_stop} AS DOUBLE) / greatest(len({toks}), 1), 6)",
    }


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Stopword-hit count per language (the n-gram-heuristic family)."""
    toks = tokens(col)
    out = {}
    for lang in _LANG_ORDER:
        hits = [
            F.array_contains(toks, w).cast("int") for w in LANG_STOPWORDS[lang]
        ]
        score = hits[0]
        for h in hits[1:]:
            score = score + h
        out[lang] = score
    return out


def lang_id(col: Column | str) -> Column:
    """argmax language with deterministic tie-break (_LANG_ORDER);
    'unknown' when no stopword hits at all."""
    scores = lang_scores(col)
    all_zero = F.lit(True)
    for s in scores.values():
        all_zero = all_zero & (s == 0)
    # CASE chain: the first language (in _LANG_ORDER) whose score is >=
    # every later language's score wins — built back-to-front
    result = F.lit(_LANG_ORDER[-1])
    for i in range(len(_LANG_ORDER) - 2, -1, -1):
        lang = _LANG_ORDER[i]
        cond = F.lit(True)
        for other in _LANG_ORDER[i + 1 :]:
            cond = cond & (scores[lang] >= scores[other])
        result = F.when(cond, F.lit(lang)).otherwise(result)
    return F.when(all_zero, F.lit("unknown")).otherwise(result)


def lang_id_sql(expr: str) -> str:
    toks = tokens_sql(expr)

    def score(lang: str) -> str:
        return " + ".join(
            f"CAST(list_contains({toks}, '{w}') AS INT)" for w in LANG_STOPWORDS[lang]
        )

    scores = {lang: f"({score(lang)})" for lang in _LANG_ORDER}
    all_zero = " AND ".join(f"{s} = 0" for s in scores.values())
    cases = []
    for i, lang in enumerate(_LANG_ORDER):
        conds = [
            f"{scores[lang]} >= {scores[other]}" for other in _LANG_ORDER[i + 1 :]
        ]
        cases.append(
            f"WHEN {' AND '.join(conds)} THEN '{lang}'" if conds else f"ELSE '{lang}'"
        )
    chain = " ".join(cases[:-1])
    last = _LANG_ORDER[-1]
    return (
        f"CASE WHEN {all_zero} THEN 'unknown' "
        f"ELSE (CASE {chain} ELSE '{last}' END) END"
    )


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (exact-dedup key robust to spacing/case)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.trim(F.lower(c)), r"\s+", " "))


def fingerprint_sql(expr: str) -> str:
    return f"md5(regexp_replace(trim(lower({expr})), '\\s+', ' ', 'g'))"


def minhash_signature(col: Column | str, num_hashes: int = 16) -> Column:
    """MinHash over the distinct token set: element i is
    min(md5(i || 0x1f || token)). Fixed-length hex strings make
    lexicographic min == numeric min, so the same signature is
    computable in any engine.
    """
    toks = F.array_distinct(tokens(col))
    sig = [
        F.array_min(
            F.transform(toks, lambda t, i=i: F.md5(F.concat(F.lit(f"{i}\x1f"), t)))
        )
        for i in range(num_hashes)
    ]
    return F.array(*sig)


def minhash_signature_sql(expr: str, num_hashes: int = 16) -> str:
    toks = f"list_distinct({tokens_sql(expr)})"
    parts = ", ".join(
        f"list_aggregate(list_transform({toks}, t -> md5('{i}' || chr(31) || t)), 'min')"
        for i in range(num_hashes)
    )
    return f"[{parts}]"
