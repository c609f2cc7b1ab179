"""Text-analysis operators for large-scale training-data pipelines.

All pure Catalyst expressions over a ``text`` column — language ID,
quality scoring, token counting, document fingerprinting — designed to
run inside the parquet-scan stage with no shuffle and no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from datamatcher_spark.functions.minhash import tokens_expr

# Small high-frequency stopword sets per language (public common-word
# lists); enough signal for a coarse n-gram-free language heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was",
           "on", "are", "this", "have", "not"],
    "pl": ["jest", "nie", "się", "na", "do", "oraz", "przez", "która", "który",
           "z", "w", "i", "o", "od", "po"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "für", "von",
           "ein", "eine", "auf", "zu", "den", "im"],
}


def token_count_expr(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens_expr(text)).cast("long")


def bpe_ish_token_count_expr(text: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND transitions
    between letters/digits/punctuation (a cheap BPE proxy: 'abc123,def' →
    abc|123|,|def)."""
    pieces = F.split(
        F.regexp_replace(
            F.lower(text.cast("string")),
            r"(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])|(?=[^a-z0-9\s])|(?<=[^a-z0-9\s])",
            " ",
        ),
        r"\s+",
    )
    return F.size(F.filter(pieces, lambda p: p != "")).cast("long")


def quality_score_expr(text: Column) -> Column:
    """Heuristic quality in [0,1] from length / punctuation / word-shape
    ratios (the usual web-text quality-filter signals):
      * length score: saturates at 200 chars
      * alpha ratio: letters / non-space chars
      * mean word length in a sane band (2..12)
    """
    s = text.cast("string")
    n_chars = F.length(s)
    non_space = F.length(F.regexp_replace(s, r"\s", ""))
    n_alpha = F.length(F.regexp_replace(s, r"[^a-zA-Z]", ""))
    toks = tokens_expr(s)
    n_tok = F.size(toks)
    mean_wl = F.when(n_tok > 0, non_space.cast("double") / n_tok).otherwise(F.lit(0.0))

    len_score = F.least(n_chars.cast("double") / 200.0, F.lit(1.0))
    alpha_ratio = F.when(non_space > 0, n_alpha.cast("double") / non_space).otherwise(
        F.lit(0.0)
    )
    wl_score = F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.3)
    )
    return F.round((len_score + alpha_ratio + wl_score) / 3.0, 4)


def lang_id_expr(text: Column) -> Column:
    """Coarse language ID by stopword votes: the language whose stopword
    set intersects the token set most wins; ties and zero hits → 'und'."""
    toks = F.array_distinct(tokens_expr(text))
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*hits.values())
    out = F.lit("und")
    # deterministic priority order on ties: de < pl < en applied last wins
    for lang in ("de", "pl", "en"):
        out = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(out)
    return out


def fingerprint_expr(text: Column) -> Column:
    """Key-collision fingerprint (the classic data-cleaning 'fingerprint
    method'): lowercase → strip punctuation → sort unique tokens → md5.
    Whitespace/word-order/punctuation variants collide to one key."""
    cleaned = F.regexp_replace(F.lower(text.cast("string")), r"[^a-z0-9\s]", " ")
    toks = F.array_sort(F.array_distinct(F.filter(F.split(cleaned, r"\s+"),
                                                  lambda t: t != "")))
    return F.md5(F.array_join(toks, " "))
