"""Column-level text functions — all JVM-side Catalyst expressions
(whole-stage codegen; no Python in the row loop).

Cross-engine notes: patterns are kept to ASCII classes so Java regex
(Spark) and RE2 (DuckDB) agree; md5 hex output is identical in both.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def tokens(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_tokens(text: Column) -> Column:
    """BPE-ish sub-word segmentation: a GPT-2-style pre-tokenizer
    approximation — contractions, letter runs, digit runs, punct runs,
    each with optional leading space. Pure regexp_extract_all (codegen,
    no Python); ASCII classes so Spark (Java regex) and DuckDB (RE2)
    agree."""
    return F.regexp_extract_all(
        text, F.lit(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"), 0
    )


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text)).cast("long")


def rolling_fingerprint(text: Column) -> Column:
    """Polynomial rolling hash (Rabin–Karp) of the normalized text:
    acc = (acc*131 + byte) mod 2^31-1 over ASCII codes. Stays inside
    whole-stage codegen via aggregate() over the char array; the
    modulus keeps acc*131+255 < 2^63 so ANSI-mode bigint never
    overflows. DuckDB twin: list_reduce over the same codes."""
    codes = F.transform(F.split(normalize_text(text), ""), lambda c: F.ascii(c).cast("bigint"))
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, c: F.pmod(acc * F.lit(131) + c, F.lit(2147483647)),
    )


def normalize_text(text: Column) -> Column:
    """Whitespace-collapsed, lowercased content (dedup canonical form)."""
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def fingerprint_md5(text: Column) -> Column:
    """Portable 128-bit content fingerprint of the normalized text."""
    return F.md5(normalize_text(text))


def stopword_count(text: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    return F.size(F.filter(tokens(text), lambda t: t.isin(*stopwords))).cast("long")


def punct_count(text: Column) -> Column:
    """Number of ASCII punctuation characters."""
    stripped = F.regexp_replace(text, r"[!-/:-@\[-`{-~]", "")
    return (F.length(text) - F.length(stripped)).cast("long")


def word_shingles(tok: Column, n: int = 3) -> Column:
    """Distinct n-word shingles from a token array.

    Built with higher-order functions (transform over an index
    sequence) — stays inside codegen, no UDF. Empty array when the
    document has fewer than ``n`` tokens.

    IMPORTANT: pass a *materialized attribute* (a column you selected
    in a previous projection), not a raw ``tokens(text)`` expression —
    element_at inside the lambda re-evaluates its child per access, so
    an inline split() would re-tokenize the document ~3×|shingles|
    times (measured 10× slowdown at sf0.1).
    """
    idx = F.when(F.size(tok) >= n, F.sequence(F.lit(0), F.size(tok) - n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(tok, i + j + 1) for j in range(n)]
            ),
        )
    )
