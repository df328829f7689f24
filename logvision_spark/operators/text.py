"""Text analysis operators for the training-data pipeline (north-star
extension): language ID, quality scoring, token counting, fingerprinting.
All JVM-side built-ins — regex + array higher-order functions; no Python
in the hot path, so every operator whole-stage-codegens and scales with
the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logvision_spark.operators.dedup import poly_hash

# Small distinctive-stopword lists per language for the n-gram/stopword
# language-ID heuristic. Deliberately tiny: the heuristic's job is cheap
# bulk routing, not NLP-grade identification.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "para"),
    "fr": ("le", "la", "les", "de", "et", "est", "un", "une", "dans", "pour"),
}

# BPE-ish pre-tokenization: word pieces OR single non-space symbols —
# the standard GPT-2-style pre-split shape, as a pure regex.
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def tokens(text: Column, sep: str = " ") -> Column:
    r"""TOKEN CONTRACT: split on the literal single-space separator,
    mirrored bit-for-bit by every DuckDB oracle (string_split(text, ' ')).
    Consequences both engines share: consecutive/leading/trailing
    whitespace yields empty-string tokens and tokens('') == ['']
    (size 1). Corpora with irregular whitespace should be normalized
    UPSTREAM (regexp_replace(text, r'\s+', ' ') + trim) — changing the
    split itself would silently shift every token-derived number
    (counts, ratios, shingles, TF-IDF, packing budgets) on both sides
    of the oracle contract at once."""
    return F.split(text, sep)


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_like_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs, single digits, single
    punctuation) — a cheap proxy for LLM token cost."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_PATTERN), 0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Case-insensitive: 'The' counts like 'the' (the oracle lowercases
    identically); tokens(…) never yields an empty array so the divisor
    is >= 1."""
    toks = tokens(text)
    stop = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*LANG_STOPWORDS[lang]))
    )
    return stop.cast("double") / F.size(toks)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation/symbols. try_divide:
    an empty document is a routine raw-corpus input, and a plain
    division is a hard ANSI DIVIDE_BY_ZERO job failure there; NULL
    matches DuckDB's x/0 semantics exactly."""
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return F.try_divide(punct.cast("double"), F.length(text))


def _sql_str_list(ws: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in ws)


def _stop_hits_sql(t: str, ws: tuple[str, ...]) -> str:
    return (
        f"size(filter(split({t}, ' '), "
        f"t -> lower(t) IN ({_sql_str_list(ws)})))"
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Standard quality-scoring features: lengths, token stats, ratios.
    One projection pass; composes with any filter threshold downstream.

    Expressions are built as F.expr STRINGS — one JVM parse each — not
    nested Column calls (r18): the higher-order filter alone cost ~25
    py4j round trips of driver-side construction per call, pure builder
    latency the bench (and every job submission) pays. The parsed trees
    are the SAME expressions as the previous Column forms (same split,
    same lower/IN membership, same double casts and divides) — only
    where they are assembled changes."""
    t = f"`{text_col}`"
    toks = f"split({t}, ' ')"
    return df.withColumns(
        {
            "n_chars_calc": F.expr(f"length({t})"),
            "token_cnt": F.expr(f"size({toks})"),
            "chars_per_token": F.expr(
                f"CAST(length({t}) AS DOUBLE) / size({toks})"
            ),
            "stopword_ratio": F.expr(
                f"CAST({_stop_hits_sql(t, LANG_STOPWORDS['en'])} AS DOUBLE)"
                f" / size({toks})"
            ),
            "punct_ratio": F.expr(
                f"try_divide(CAST(length(regexp_replace({t}, "
                r"'[A-Za-z0-9\\s]', '')) AS DOUBLE), "
                f"length({t}))"
            ),
            "uniq_token_ratio": F.expr(
                f"CAST(size(array_distinct({toks})) AS DOUBLE) / "
                f"size({toks})"
            ),
        }
    )


def lang_scores(text: Column) -> list[Column]:
    """Per-language stopword-hit counts (the n-gram heuristic's evidence)."""
    toks = tokens(text)

    def hits(ws: tuple[str, ...]):
        return lambda t: F.lower(t).isin(*ws)

    return [
        F.size(F.filter(toks, hits(ws))).alias(f"score_{lang}")
        for lang, ws in LANG_STOPWORDS.items()
    ]


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: argmax over per-language stopword scores,
    'und' (undetermined) when no stopword hits at all. Deterministic
    tie-break by language order.

    The four score columns are built as F.expr strings (one parse each;
    same filter/lower/IN trees as `lang_scores`, which stays the
    Column-API form for composition) — see quality_features' r18 note
    on builder-side py4j latency."""
    scored = df.select(
        "*",
        *[
            F.expr(
                f"{_stop_hits_sql(f'`{text_col}`', ws)} AS score_{lang}"
            )
            for lang, ws in LANG_STOPWORDS.items()
        ],
    )
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.lit("und")
    for l in reversed(langs):  # earlier langs win ties
        pred = F.when(F.col(f"score_{l}") == best, F.lit(l)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    return scored.withColumn("pred_lang", pred)


def fingerprint(text: Column, fast: bool = False) -> Column:
    """Deterministic document fingerprint for change detection.
    The portable rolling hash folds mod 1e9+7, a ~30-BIT space — by the
    birthday bound a 50% collision chance arrives at only ~38k documents,
    so it is an ORACLE-CHECKABLE change-detection key, NOT a content-
    identity key for dedup at corpus scale (the earlier "63-bit" claim
    was off by ~33 bits — review finding). ``fast=True`` returns full
    64-bit xxhash64 — the production identity key exact_dedup itself
    uses; engine-specific, so no DuckDB oracle."""
    if fast:
        return F.xxhash64(text)
    return poly_hash(text)


# PII-ish patterns for corpus redaction. Deliberately conservative,
# cross-engine-portable regex (no lookaround, no \b-dialect surprises):
# the redaction *op* is the deliverable; pattern packs are pluggable.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    (r"\+?[0-9][0-9() -]{7,}[0-9]", "<PHONE>"),
)


def redact_pii(
    text: Column, patterns: tuple[tuple[str, str], ...] = PII_PATTERNS
) -> Column:
    """Sequential regexp_replace of PII-ish spans (emails, IPs, phone-like
    digit runs) with typed placeholders — the standard pre-training
    scrubbing pass. Pure JVM regex, whole-stage-codegens; order matters
    (emails first so their digits don't half-match as phones)."""
    out = text
    for pat, repl in patterns:
        out = F.regexp_replace(out, pat, repl)
    return out


def corpus_split(
    id_col: Column, train_pct: int = 80, val_pct: int = 10, modulus: int = 100
) -> Column:
    """Deterministic train/val/test assignment from the document id:
    id mod 100 → train (<80) / val (<90) / test. Pure arithmetic, so the
    split is stable across engines, runs, and partitionings — the
    property a reproducible corpus snapshot needs (sampleBy is
    seed+partitioning dependent). For ids with structure (e.g.
    monotonically increasing), pre-hash with xxhash64 when uniformity
    matters more than cross-engine portability."""
    bucket = F.pmod(id_col.cast("long"), F.lit(modulus))
    return (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def pack_token_bins(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    num_shards: int = 8,
) -> DataFrame:
    """Training-batch sequence packing: assign documents to fixed
    token-budget bins (the "pack documents into 2k-token training rows"
    step of an LLM data pipeline). Deterministic contiguous packing:
    within a shard, docs are taken in id order and
    ``bin = floor(exclusive_prefix_sum(tokens) / budget)`` — bins are
    budget-aligned, with the straddling doc joining the bin its prefix
    sum starts in (bounded overflow of one doc; a real pipeline
    pre-splits oversized docs).

    Scale: the window partitions by ``pmod(id, num_shards)`` — packing is
    per-shard, never a single global ordered window (a global cumulative
    sum serializes onto one task at 100 TB). Shards are independent, so
    bins are reproducible regardless of cluster layout; `pmod` (not
    xxhash) keeps the shard function portable across engines for the
    oracle. Output bin ids are (shard, bin_in_shard) pairs."""
    from pyspark.sql import Window

    shard = F.pmod(F.col(id_col), F.lit(num_shards))
    staged = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).cast("long").alias("n_tok"),
        shard.alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    return staged.select(
        id_col,
        "shard",
        "n_tok",
        F.floor(prior / F.lit(budget)).cast("long").alias("bin_in_shard"),
    )


def chunk_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Overlapping token-window chunking — the embed/RAG pipeline step
    that turns documents into model-sized pieces. A chunk starts every
    `stride` tokens (so consecutive chunks overlap by size-stride);
    tail chunks are shorter. Pure explode of a start-position sequence +
    array slice: JVM-side, one shuffle-free projection then explode, and
    chunk counts per doc are ceil(n/stride) so output size is predictable
    from token stats. Emits (id, chunk_id, n_tokens, chunk_text)."""
    staged = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_toks")
    ).select(
        id_col, "_toks", F.size("_toks").alias("_n")
    )
    exploded = staged.select(
        id_col,
        "_toks",
        "_n",
        F.explode(
            F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
        ).alias("_s"),
    )
    chunk = F.slice(F.col("_toks"), F.col("_s") + 1, F.lit(size))
    return exploded.select(
        id_col,
        (F.col("_s") / stride).cast("long").alias("chunk_id"),
        F.least(F.lit(size), F.col("_n") - F.col("_s")).alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )
