"""Text analysis for large-scale training-data pipelines.

All JVM-side Column expressions (regex/aggregation built-ins) — at 100 TB of
documents none of these leave whole-stage codegen. Oracle-portable: each has
an ANSI-SQL twin in ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# languages × their most frequent marker words (lowercase, space-delimited)
_LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "la", "les"),
    "es": ("el", "los", "que"),
}


def tokens(text: Column) -> Column:
    """THE canonical whitespace tokenizer (empty-safe). Every op that
    must mirror a DuckDB oracle's ``string_split_regex(text, '\\s+')``
    twin routes through this one definition so the tokenization contract
    cannot silently fork between call sites."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    """Whitespace tokens, empty-safe. (BPE-ish subword counting lives in
    ``doc_fingerprint``'s shingling; this is the canonical token count.)"""
    return F.size(tokens(text)).alias("n_tokens")


def _count_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of a literal substring — portable length-difference
    trick (identical semantics in any SQL engine)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def quality_stats(text: Column) -> list[Column]:
    """Quality-scoring signals as integer columns (ratios are left to the
    consumer so results stay hash-stable across engines)."""
    return [
        F.length(text).cast("long").alias("n_chars"),
        token_count(text).cast("long").alias("n_tokens"),
        (F.length(text) - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))).cast(
            "long"
        ).alias("n_punct"),
        (F.length(text) - F.length(F.regexp_replace(text, r"[0-9]", ""))).cast(
            "long"
        ).alias("n_digits"),
        (F.length(text) - F.length(F.regexp_replace(text, r"[A-Z]", ""))).cast(
            "long"
        ).alias("n_upper"),
    ]


def language_id(text: Column) -> Column:
    """N-gram-heuristic language ID: count per-language marker words in the
    lowercased text, pick the argmax (deterministic tie order en>de>fr>es).
    """
    lowered = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = {
        lang: sum(
            (_count_occurrences(lowered, f" {m} ") for m in markers),
            start=F.lit(0).cast("long"),
        )
        for lang, markers in _LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    expr = F.lit("unknown")
    for lang in reversed(list(_LANG_MARKERS)):  # earlier langs win ties
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr.alias("lang_pred")


def doc_fingerprint(text: Column, width: int = 16) -> Column:
    """Rolling-hash document fingerprint: first ``width`` hex chars of the
    md5 of the whitespace-normalized text — a cheap content-defined id for
    exact-dup grouping at scale (md5 is engine-portable)."""
    norm = F.regexp_replace(F.trim(text), r"\s+", " ")
    return F.substring(F.md5(norm.cast("binary")), 1, width).alias("fingerprint")


def chunk_tokens(
    docs: "DataFrame",
    max_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text: str = "text",
) -> "DataFrame":
    """Token-window document CHUNKING (r5) — the pack-into-context step of
    a training-data pipeline: split each document on whitespace and emit
    sliding windows of ``max_tokens`` tokens with ``overlap`` tokens of
    left context, as ``(id, chunk_id, n_tokens, chunk_text)``.

    100 TB shape: pure Column end-to-end — split → sequence over window
    starts → transform/slice/concat — all whole-stage codegen, one
    narrow explode (no shuffle at all); a 4096-token window over a
    trillion-token corpus is a map-only job."""
    from pyspark.sql import DataFrame as _DF  # noqa: F401 (typing only)

    step = max_tokens - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than max_tokens")
    toks = tokens(F.col(text))
    n = F.size(toks)
    # window starts: 0, step, 2·step, … while start < n (≥1 even if empty)
    starts = F.sequence(
        F.lit(0),
        F.floor(F.greatest(n - F.lit(1), F.lit(0)) / F.lit(step)).cast("int"),
    )
    out = docs.select(
        F.col(id_col).alias("id"),
        toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_id", "_s"),
    ).filter((F.col("_s") * step < F.size("_toks")) | (F.col("chunk_id") == 0))
    sl = F.slice(
        F.col("_toks"),
        F.col("_s").cast("int") * step + 1,
        max_tokens,
    )
    return out.select(
        "id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(sl).cast("long").alias("n_tokens"),
        F.array_join(sl, " ").alias("chunk_text"),
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals per document (public
    heuristics from the Gopher/MassiveText filtering recipe): fraction of
    words taken by the most frequent word (top-1-gram), fraction of word
    pairs taken by the most frequent adjacent bigram (top-2-gram),
    distinct-word ratio, and mean word length. High top-k-gram fractions
    flag boilerplate/repetitive documents that hurt training.

    Shape: two explode -> groupBy passes (word grain, bigram grain), both
    shuffling on (doc, token) — partial aggregation map-side, no
    collect-to-driver, linear in corpus size (the form that holds at
    100 TB; a per-doc Python loop would not)."""
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    base = docs.select(id_col, words.alias("_ws"))
    uni = (
        base.select(id_col, F.explode("_ws").alias("_w"))
        .groupBy(id_col, "_w").count()
        .groupBy(id_col)
        .agg(
            F.max("count").alias("_top1"),
            F.sum("count").alias("n_words"),
            F.count("*").alias("n_distinct"),
            F.sum(F.length("_w") * F.col("count")).alias("_chars"),
        )
    )
    big = (
        base.select(
            id_col,
            F.explode(
                F.zip_with(
                    F.slice("_ws", 1, F.greatest(F.size("_ws") - 1,
                                                 F.lit(0))),
                    F.slice("_ws", 2, F.greatest(F.size("_ws") - 1,
                                                 F.lit(0))),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("_b"),
        )
        .groupBy(id_col, "_b").count()
        .groupBy(id_col)
        .agg(F.max("count").alias("_top2"),
             F.sum("count").alias("n_bigrams"))
    )
    # left-join back onto the input so empty/whitespace-only documents
    # surface with zero counts instead of vanishing (explode of an empty
    # array eliminates the row)
    agg = uni.join(big, id_col, "left")
    has_words = F.col("n_words").isNotNull() & (F.col("n_words") > 0)
    return (
        docs.select(id_col).join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_distinct", F.lit(0)).cast("long")
                .alias("n_distinct"),
            F.when(has_words, F.round(F.col("_top1") / F.col("n_words"), 6))
                .otherwise(F.lit(0.0)).alias("top1_frac"),
            F.round(
                F.coalesce(F.col("_top2") / F.col("n_bigrams"),
                           F.lit(0.0)), 6,
            ).alias("top2_frac"),
            F.when(has_words,
                   F.round(F.col("n_distinct") / F.col("n_words"), 6))
                .otherwise(F.lit(0.0)).alias("distinct_ratio"),
            F.when(has_words,
                   F.round(F.col("_chars") / F.col("n_words"), 6))
                .otherwise(F.lit(0.0)).alias("mean_word_len"),
        )
    )


# public PII patterns (same regex class both engines: no lookarounds)
_PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Training-pipeline PII masking: count + replace emails, NANP
    phone numbers and IPv4 literals with typed placeholder tokens
    (<EMAIL>/<PHONE>/<IP>). Pure Column regexps — JVM-side, codegen, no
    Python; the patterns avoid lookarounds so any engine (and the DuckDB
    oracle) runs the same class."""
    out = docs.withColumn("scrubbed", F.col(text_col))
    counts = []
    for name, pat in _PII_PATTERNS.items():
        counts.append(
            F.regexp_count(F.col(text_col), F.lit(pat))
            .cast("long").alias(f"n_{name}")
        )
    for name, pat in _PII_PATTERNS.items():
        out = out.withColumn(
            "scrubbed",
            F.regexp_replace("scrubbed", pat, f"<{name.upper()}>"),
        )
    return out.select(id_col, *counts, "scrubbed")


def crossdoc_ngram_stats(
    docs: DataFrame,
    n: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document repeated-n-gram signal (the dedupe-repeated-
    substrings stage of web-corpus pipelines, cf. the MassiveText /
    C4 boilerplate filters): for each doc, the fraction of its word
    n-grams that also occur in >= ``min_docs`` OTHER documents.

    Shape: explode n-grams once; one groupBy on the n-gram hash for
    document frequency (map-side combine); broadcast-free re-join on the
    same key. Both shuffles are on the n-gram hash — linear in corpus
    size, no driver-side state (the 100 TB form)."""
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    grams = (
        docs.select(id_col, words.alias("_ws"))
        .select(
            id_col,
            # guard: sequence(1, 0) DESCENDS in Spark — short docs get an
            # explicit empty gram list, not a bogus slice at index 0
            F.explode(
                F.when(F.size("_ws") < n, F.array().cast("array<string>"))
                .otherwise(
                    F.transform(
                        F.sequence(
                            F.lit(1), F.size("_ws") - (n - 1)
                        ),
                        lambda i: F.array_join(
                            F.slice("_ws", i, n), " "
                        ),
                    )
                )
            ).alias("gram"),
        )
    )
    per_doc = grams.groupBy(id_col, "gram").count()
    df_freq = (
        per_doc.groupBy("gram")
        .agg(F.count("*").alias("df"))
    )
    joined = per_doc.join(df_freq, "gram")
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum("count").alias("n_grams"),
            F.sum(
                F.when(F.col("df") >= min_docs + 1, F.col("count"))
                .otherwise(F.lit(0))
            ).alias("n_shared"),
        )
        .select(
            id_col,
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(F.col("n_shared") / F.col("n_grams"), 6)
                .alias("shared_frac"),
        )
    )


def tfidf_top_terms(
    docs,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Top-k terms per document by smoothed TF-IDF (r6 — corpus-level
    relevance signals for curation/retrieval labeling).

    score(d, t) = (tf(d,t) / len(d)) · (ln((N+1)/(df(t)+1)) + 1)

    100 TB shape: tokenize + explode stay in codegen; ONE shuffle builds
    the (doc, term) counts with map-side combine; the document-frequency
    aggregate is a second map-side-combined shuffle on term (vocabulary-
    sized, not corpus-sized); the final per-doc top-k is a window over
    the doc partitioning the counts already have. No driver state — N is
    a scalar subquery folded as a literal-free cross join of a 1-row
    aggregate (broadcast). Deterministic: ties break on the term string,
    so the k-cut is total-order stable across engines and reruns.
    """
    from pyspark.sql import Window

    terms = docs.select(
        id_col,
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                     lambda t: t != F.lit(""))
        ).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.select(F.count("*").alias("n_docs"))
    # dlen rides the SAME doc partitioning the rank window needs: an
    # unordered window-sum replaces the dlen groupBy + re-join (two
    # exchanges dropped; guide §2.4 — operations keyed the same way
    # share one exchange). Values are identical integer sums.
    wd = Window.partitionBy(id_col)
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("dlen", F.sum("tf").over(wd))
        .withColumn(
            "score",
            (F.col("tf") / F.col("dlen"))
            * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
        )
    )
    w = wd.orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            id_col,
            F.col("rank").cast("int").alias("rank"),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            (F.floor(F.col("score") * 1e6 + 0.5) / 1e6).alias("score6"),
        )
    )


def ngram_decontaminate(
    docs: "DataFrame",
    benchmark: "DataFrame",
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> "DataFrame":
    """Benchmark decontamination: flag corpus documents sharing any
    exact n-token gram with a benchmark/eval set (the GPT-3/Pile
    13-gram rule — a training doc that can leak an eval answer must be
    dropped before training).

    Returns one row per CONTAMINATED document: (id, n_hits = distinct
    benchmark grams it contains, first_gram = lexicographically first
    matching gram, for audit).

    100 TB shape: the benchmark side is tiny (eval sets are kilobytes
    to megabytes) — its distinct gram set broadcasts, so the corpus
    side is scan → explode → broadcast-hash semi-join → one groupBy on
    the doc id; the corpus never shuffles its text, only (id, gram)
    hits. Grams are joined as exact strings (no hashing) so a match is
    never a false positive.
    """
    def grams(toks: Column) -> Column:
        # operates on a MATERIALIZED token array column — embedding the
        # split inside the transform lambda would re-tokenize the whole
        # doc once per gram (Catalyst does not hoist loop invariants
        # out of higher-order-function lambdas)
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    bench_grams = (
        benchmark.select(tokens(F.col(bench_text_col)).alias("_toks"))
        .select(F.explode(grams(F.col("_toks"))).alias("gram"))
        .distinct()
    )
    hits = (
        docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(id_col, F.explode(grams(F.col("_toks"))).alias("gram"))
        .join(F.broadcast(bench_grams), "gram")
    )
    return hits.groupBy(id_col).agg(
        F.count_distinct("gram").alias("n_hits"),
        F.min("gram").alias("first_gram"),
    )
