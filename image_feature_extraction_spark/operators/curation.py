"""Corpus-curation operators for training-data pipelines: repetition
signals, eval-set decontamination, deterministic splits, source
temperature sampling, and PII scrubbing.

These are the filter/label stages a web-scale pretraining pipeline runs
between raw ingestion and tokenization (the repetition and quality
heuristics follow the published Gopher/C4 rule families; the
decontamination op is the standard n-gram-overlap check against held-out
eval sets; temperature sampling is the multinomial source-reweighting
used by multilingual/multi-source corpus mixers). The reference's
analogue is its mask/membership filter stage (cited for parity:
/root/reference/tools/ExtractMaskedRegion.cxx:50-72 — keep/drop rows by
a computed membership label); these operators generalize "computed
membership" to content-derived signals.

Cross-engine determinism contract (same as operators/dedup.py): every
hash is md5-derived via ``dedup.md5_long``, reproducible bit-for-bit in
DuckDB; every float is either an exact division of integers or built
from an expression tree with identical IEEE operations on both engines
(sqrt, divide, subtract are all exactly rounded); booleans compare
UNROUNDED doubles that are bit-identical by construction.

Scale notes (10^12 docs):
- repetition_stats / scrub_text: narrow per-row projections plus (for
  repetition) one groupBy(doc_id[, gram]) family — partial aggregation
  applies, shuffle is keyed, never all-pairs.
- decontaminate: the eval-set gram table is SMALL (benchmarks are
  thousands of docs, not billions) -> broadcast; the train side is never
  shuffled except the per-doc count aggregation.
- hash_split / temperature_sample: pure projections; the source-count
  table feeding temperature weights is |sources| rows -> broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import grams_expr, md5_long, shingles, words_of


def repetition_stats(df: DataFrame, text_col: str = "text", n: int = 2) -> DataFrame:
    """Per-doc repetition signals over word n-grams (Gopher-style "rep"
    family, adapted to single-line corpora where line/paragraph signals
    degenerate):

    - n_grams_total / n_grams_distinct and the duplicate-gram fraction
      ``1 - distinct/total`` (0 for a text with no repeated n-gram);
    - the most frequent n-gram (ties -> lexicographically smallest) and
      the fraction of document characters covered by its occurrences
      (``count * length(gram) / n_chars``), the "top n-gram character
      fraction" filter signal.

    One explode + two doc-keyed aggregations; the row_number window and
    both groupBys share the doc_id-prefixed key, so this is a single
    logical repartition by doc at scale. Docs with fewer than n words
    yield zero-gram rows (counts 0, top_gram NULL) via the left join.
    """
    from ..session import widen_small_scan

    df = widen_small_scan(df)
    base = df.select(
        "doc_id", F.length(F.col(text_col)).alias("_nc"), words_of(F.col(text_col)).alias("_w")
    )
    grams = base.select(
        "doc_id", "_nc", F.explode(grams_expr(F.col("_w"), n)).alias("g")
    )
    cnt = grams.groupBy("doc_id", "_nc", "g").agg(F.count(F.lit(1)).alias("c"))
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("g"))
    )
    agg = (
        cnt.withColumn("_rn", rn)
        .groupBy("doc_id", "_nc")
        .agg(
            F.sum("c").alias("n_grams_total"),
            F.count(F.lit(1)).alias("n_grams_distinct"),
            F.max(F.when(F.col("_rn") == 1, F.col("g"))).alias("top_gram"),
            F.max(F.when(F.col("_rn") == 1, F.col("c"))).alias("top_gram_count"),
        )
    )
    # join on doc_id alone (unique) and take _nc from the agg side —
    # the keys branch then prunes to the doc_id column only
    keys = df.select("doc_id")
    out = keys.join(agg, "doc_id", "left")
    dup_frac = F.round(
        F.lit(1.0)
        - F.col("n_grams_distinct").cast("double")
        / F.col("n_grams_total").cast("double"),
        6,
    )
    top_frac = F.round(
        (F.col("top_gram_count") * F.length("top_gram")).cast("double")
        / F.col("_nc").cast("double"),
        6,
    )
    return out.select(
        "doc_id",
        F.coalesce(F.col("n_grams_total"), F.lit(0)).cast("long").alias("n_grams_total"),
        F.coalesce(F.col("n_grams_distinct"), F.lit(0)).cast("long").alias("n_grams_distinct"),
        dup_frac.alias("dup_gram_frac"),
        "top_gram",
        F.coalesce(F.col("top_gram_count"), F.lit(0)).cast("long").alias("top_gram_count"),
        top_frac.alias("top_gram_char_frac"),
    )


def eval_membership(key_col, mod: int = 20, salt: str = ":eval"):
    """Deterministic eval-set membership: md5(key || salt) % mod == 0.
    The salt keeps this hash stream independent of every other md5 use
    (split buckets, sampling) on the same key."""
    return md5_long(F.concat(key_col, F.lit(salt))) % mod == 0


def eval_gram_set(
    docs: DataFrame, text_col: str = "text", n: int = 5, eval_mod: int = 20
) -> DataFrame:
    """Distinct n-grams of the deterministic eval subset — the SMALL,
    static side of decontamination, computed once and broadcast against a
    batch or a stream of incoming training docs."""
    ev = eval_membership(F.col("doc_id"), eval_mod)
    return (
        shingles(docs.filter(ev), text_col, n)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )


def decontaminate(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 5,
    eval_mod: int = 20,
    eval_grams: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    n-gram with the (deterministically chosen) eval subset.

    The eval subset is docs with ``eval_membership(doc_id)`` true
    (~1/eval_mod of the corpus — standing in for an external benchmark
    suite, which at web scale is ALWAYS tiny relative to the corpus).
    Output: one row per NON-eval doc with its distinct n-gram count, the
    count appearing anywhere in the eval set, the contaminated fraction,
    and the boolean flag (any overlap -> contaminated, the conservative
    standard rule).

    Plan shape: eval grams -> distinct -> broadcast; train grams join the
    broadcast (no shuffle of the big side beyond the per-doc count
    aggregation, which partial-aggregates map-side).

    Streaming: pass a precomputed STATIC ``eval_grams`` (from
    ``eval_gram_set``) and a streaming ``docs`` — the stream is then
    treated wholly as the train side (no membership filter), the join is
    a supported stream-static broadcast join, and the per-doc
    aggregation runs in update/complete output mode (tested in
    tests/test_streaming.py).
    """
    if eval_grams is None:
        eval_grams = eval_gram_set(docs, text_col, n, eval_mod)
        train = docs.filter(~eval_membership(F.col("doc_id"), eval_mod))
    else:
        train = docs
    tg = shingles(train, text_col, n)
    per_doc = (
        tg.join(F.broadcast(eval_grams), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
        )
    )
    if train.isStreaming:
        # Re-joining the doc keys against the aggregated stream would be a
        # stream-stream join (unsupported with aggregation output modes).
        # Only docs with fewer than n words are affected: they produce no
        # grams and are absent from the streaming output, vs a zero-count
        # row in batch.
        out = per_doc
    else:
        out = train.select("doc_id").join(per_doc, "doc_id", "left")
    contam_frac = F.round(
        F.col("n_contaminated").cast("double") / F.col("n_grams").cast("double"), 6
    )
    return out.select(
        "doc_id",
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long").alias("n_contaminated"),
        contam_frac.alias("contam_frac"),
        (F.coalesce(F.col("n_contaminated"), F.lit(0)) > 0).alias("is_contaminated"),
    )


# (label, cumulative-bucket-threshold) pairs over HASH_SPLIT_BUCKETS.
HASH_SPLIT_BUCKETS = 10000
DEFAULT_SPLITS = (("train", 9000), ("val", 9500), ("test", HASH_SPLIT_BUCKETS))


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    splits=DEFAULT_SPLITS,
    salt: str = ":split",
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = md5(key||salt)
    % HASH_SPLIT_BUCKETS, then the first split whose cumulative threshold
    exceeds the bucket. Pure projection — reproducible across runs,
    partitionings, and engines; docs never migrate between splits when
    the corpus grows (the property random sampling lacks)."""
    if not splits:
        raise ValueError("hash_split: splits must be non-empty")
    cums = [cum for _, cum in splits]
    if cums != sorted(cums) or cums[-1] != HASH_SPLIT_BUCKETS:
        raise ValueError(
            "hash_split: cumulative thresholds must ascend and end at "
            f"HASH_SPLIT_BUCKETS={HASH_SPLIT_BUCKETS}, got {cums}"
        )
    b = md5_long(F.concat(F.col(key_col), F.lit(salt))) % HASH_SPLIT_BUCKETS
    expr = None
    for label, cum in splits:
        cond = b < cum
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn("split_bucket", b.cast("long")).withColumn("split", expr)


def source_temperature_sample(
    df: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = ":tsample",
) -> DataFrame:
    """Temperature-style source rebalancing at alpha = 0.5: keep each row
    of source s with probability ``sqrt(c_min / c_s)`` where c_s is the
    source's row count and c_min the smallest source's — i.e. sampled
    source mass ∝ sqrt(c_s), the classic T=2 flattening that keeps the
    rarest source intact while downsampling the head. The keep decision
    is a deterministic hash coin: md5(key||salt) % 1e6 / 1e6 < keep_prob.

    IEEE parity note: keep_prob is ``sqrt(c_min/c_s)`` with division and
    sqrt both exactly rounded, and the comparison uses the UNROUNDED
    double on both engines, so kept flags are bit-reproducible; the
    keep_prob column itself is rounded only for wire stability.

    Plan shape: one |sources|-row count aggregate (partial-agg'd
    map-side), its min taken over that tiny frame, broadcast back — the
    big table is never shuffled.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_c"))
    cmin = counts.agg(F.min("_c").alias("_cmin"))
    weights = counts.crossJoin(F.broadcast(cmin)).select(
        source_col,
        "_c",
        F.sqrt(F.col("_cmin").cast("double") / F.col("_c").cast("double")).alias(
            "_keep_prob"
        ),
    )
    frac = (md5_long(F.concat(F.col(key_col), F.lit(salt))) % 1000000).cast(
        "double"
    ) / F.lit(1000000.0)
    return (
        df.join(F.broadcast(weights), source_col)
        .withColumn("_frac", frac)
        .select(
            key_col,
            source_col,
            F.col("_c").cast("long").alias("n_source_docs"),
            F.round(F.col("_keep_prob"), 6).alias("keep_prob"),
            (F.col("_frac") < F.col("_keep_prob")).alias("kept"),
        )
    )


# Patterns chosen to parse identically under Java regex (Spark) and RE2
# (DuckDB): no lookaround, no backreferences, ASCII classes only.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{4}\b"


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails, IPv4 addresses, and phone-shaped digit runs to
    typed placeholder tokens, counting each. Order matters and is fixed:
    emails first (their local parts may contain digits), then IPs, then
    phones (an IP octet pair could otherwise shadow a phone match).
    Pure per-row projection — codegen'd, no shuffle, no Python."""
    t = F.col(text_col)
    n_email = F.regexp_count(t, F.lit(PII_EMAIL))
    t1 = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    n_ip = F.regexp_count(t1, F.lit(PII_IPV4))
    t2 = F.regexp_replace(t1, PII_IPV4, "<IP>")
    n_phone = F.regexp_count(t2, F.lit(PII_PHONE))
    t3 = F.regexp_replace(t2, PII_PHONE, "<PHONE>")
    return df.select(
        "doc_id",
        n_email.cast("long").alias("n_emails"),
        n_ip.cast("long").alias("n_ipv4"),
        n_phone.cast("long").alias("n_phones"),
        t3.alias("clean_text"),
    )


def token_ngram_novelty(tokens_df: DataFrame, n: int = 4) -> DataFrame:
    """Token-level n-gram novelty (the signal behind suffix-array-style
    training-data dedup, Lee et al. 2022, computed at n-gram granularity):
    for each doc, the fraction of its DISTINCT token n-grams whose
    first owner (minimum doc_id over all docs containing the gram) is
    this doc. A doc full of already-seen n-grams scores near 0 and is a
    near-dup / boilerplate candidate; novel content scores near 1.

    Input: the pre-tokenized sequence table (doc_id, tokens array<int>).
    Grams shuffle keyed on the comma-joined token-id STRING itself (for
    4 x 5-digit ids that is ~23 bytes — no wider than a hex hash, and
    collision-free where a 32-bit hash key would miscount ~0.8% of 8k-gram
    docs), with map-side partial aggregation for both the per-gram
    min-owner and the per-doc counts. No all-pairs stage at any scale.
    """
    grams = tokens_df.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                grams_expr(F.col("tokens"), n, sep=",", cast_elements=True)
            )
        ).alias("g"),
    )
    owner = grams.groupBy("g").agg(F.min("doc_id").alias("owner"))
    per_doc = (
        grams.join(owner, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("owner") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    out = tokens_df.select("doc_id").join(per_doc, "doc_id", "left")
    frac = F.round(
        F.col("n_novel").cast("double") / F.col("n_grams").cast("double"), 6
    )
    return out.select(
        "doc_id",
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias("n_novel"),
        frac.alias("novelty_frac"),
    )


# Composite quality-filter rule thresholds (C4/Gopher-flavored, tuned to
# the synthetic corpus's word-count range). Bit set in fail_mask = rule
# VIOLATED; kept = no rule violated. Bitmask (not array) keeps the output
# scalar for the driver's value hash and the SQL mirror trivial.
FILTER_MIN_WORDS = 10
FILTER_MAX_WORDS = 1000
FILTER_MIN_MEAN_WLEN = 2.0
FILTER_MAX_MEAN_WLEN = 12.0
FILTER_MIN_STOP_RATIO = 0.01
FILTER_MAX_DUP_FRAC = 0.5
FILTER_MAX_TOP_FRAC = 0.3


def quality_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """End-to-end corpus filter verdict combining the per-doc signal
    families into one keep/drop decision with an auditable reason
    bitmask:

      bit 1  word count outside [FILTER_MIN_WORDS, FILTER_MAX_WORDS]
      bit 2  mean word length outside [2, 12]
      bit 4  stopword ratio below FILTER_MIN_STOP_RATIO (fluency proxy)
      bit 8  duplicate-bigram fraction above FILTER_MAX_DUP_FRAC
      bit 16 top-bigram character fraction above FILTER_MAX_TOP_FRAC

    Word-stat and dup-fraction bits compare UNROUNDED doubles (identical
    IEEE expression trees in the SQL mirror); the top-fraction bit
    compares the 6-dp-rounded ``top_gram_char_frac`` column — rounded
    identically on both engines, so the comparison still cannot drift.
    Plan shape: the word-stat bits are narrow projections on the same
    scan that feeds repetition_stats; the only shuffles are repetition's
    doc-keyed aggregations.
    """
    from ..session import widen_small_scan
    from .text import QUALITY_STOPWORDS

    df = widen_small_scan(df)
    rep = repetition_stats(df, text_col, n=2)
    w = F.col("_w")
    n_words = F.size(w)
    mean_wlen = F.aggregate(
        w, F.lit(0), lambda acc, x: acc + F.length(x)
    ).cast("double") / n_words.cast("double")
    stop_arr = F.array(*[F.lit(s) for s in QUALITY_STOPWORDS])
    stop_ratio = (
        F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x))).cast("double")
        / n_words.cast("double")
    )
    stats = df.withColumn("_w", words_of(F.col(text_col))).select(
        "doc_id",
        n_words.alias("_nw"),
        mean_wlen.alias("_mwl"),
        stop_ratio.alias("_sr"),
    )
    j = stats.join(rep, "doc_id")
    dup_frac = F.lit(1.0) - F.col("n_grams_distinct").cast("double") / F.col(
        "n_grams_total"
    ).cast("double")
    bits = (
        F.when(
            (F.col("_nw") < FILTER_MIN_WORDS) | (F.col("_nw") > FILTER_MAX_WORDS),
            1,
        ).otherwise(0)
        + F.when(
            (F.col("_mwl") < FILTER_MIN_MEAN_WLEN)
            | (F.col("_mwl") > FILTER_MAX_MEAN_WLEN),
            2,
        ).otherwise(0)
        + F.when(F.col("_sr") < FILTER_MIN_STOP_RATIO, 4).otherwise(0)
        + F.when(
            (F.col("n_grams_total") > 0) & (dup_frac > FILTER_MAX_DUP_FRAC), 8
        ).otherwise(0)
        + F.when(
            F.col("top_gram_char_frac") > FILTER_MAX_TOP_FRAC, 16
        ).otherwise(0)
    )
    return j.select(
        "doc_id",
        bits.cast("long").alias("fail_mask"),
        (bits == 0).alias("kept"),
    )


def corpus_mix_report(docs: DataFrame) -> DataFrame:
    """The training-mix manifest: per (split, source), total docs, docs
    surviving BOTH temperature sampling and the quality filter, and the
    character mass of the survivors — the table a corpus mixer hands to
    the tokenizer run.

    Composes hash_split x source_temperature_sample x quality_filter on
    doc_id. Plan shape: three derivations of the same scan joined on
    doc_id, then one small (|splits| x |sources|) aggregation; at scale
    the split/sample columns are pure projections a production run would
    fuse into the quality pass — the composition is kept explicit here
    so each decision stays independently testable/oracle-checked.
    """
    hs = hash_split(docs).select("doc_id", "source", "split", "n_chars")
    ts = source_temperature_sample(docs).select(
        "doc_id", F.col("kept").alias("_ts_kept")
    )
    qf = quality_filter(docs).select("doc_id", F.col("kept").alias("_qf_kept"))
    j = hs.join(ts, "doc_id").join(qf, "doc_id")
    kept = F.col("_ts_kept") & F.col("_qf_kept")
    return j.groupBy("split", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(kept.cast("long")).cast("long").alias("n_kept"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(F.lit(0)))
        .cast("long")
        .alias("kept_chars"),
    )


def token_vocab_stats(tokens_df: DataFrame, vocab_size: int) -> DataFrame:
    """Per-source token-distribution report over the pre-tokenized table:
    doc count, token mass, distinct token ids, vocabulary coverage, and
    the most frequent token id (ties -> smallest id) with its count.
    The standard sanity table before a tokenizer/corpus change ships —
    a source whose coverage collapses or whose top token dominates is
    mis-extracted or mis-encoded.

    Plan shape: posexplode-free — per-doc distinct/top aggregation would
    still need the global merge, so tokens explode once and aggregate on
    (source, token): partial map-side combine collapses each partition's
    occurrences, reducers see at most |sources| x |vocab| rows
    (bounded by construction, NOT by corpus size), and the final
    per-source rollup is |vocab|-row work per source.
    """
    toks = tokens_df.select(
        "source", F.explode("tokens").alias("tok")
    )
    per_tok = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("c"), F.asc("tok"))
    )
    per_src = (
        per_tok.withColumn("_rn", rn)
        .groupBy("source")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.max(F.when(F.col("_rn") == 1, F.col("tok"))).alias("top_token"),
            F.max(F.when(F.col("_rn") == 1, F.col("c"))).alias("top_token_count"),
        )
    )
    docs = tokens_df.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    cov = F.coalesce(F.col("n_distinct_tokens"), F.lit(0)).cast("double") / F.lit(
        float(vocab_size)
    )
    # left join: a source whose docs are all empty token arrays still
    # reports (n_tokens=0, top_token NULL) instead of vanishing
    return docs.join(per_src, "source", "left").select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_distinct_tokens"), F.lit(0))
        .cast("long")
        .alias("n_distinct_tokens"),
        F.round(cov, 6).alias("vocab_coverage"),
        F.col("top_token").cast("long").alias("top_token"),
        F.coalesce(F.col("top_token_count"), F.lit(0))
        .cast("long")
        .alias("top_token_count"),
    )


def temporal_holdout(
    df: DataFrame,
    by,
    ts: str,
    id_col: str,
    valid_frac: float = 0.2,
) -> DataFrame:
    """Per-entity temporal train/valid split: each entity's LAST
    floor(valid_frac * n) events (by timestamp, id tie-break) become
    'valid', the rest 'train' — the leakage-safe evaluation split for
    time-ordered feature pipelines (hash_split covers document-level
    assignment; this covers the within-entity time axis, so a model is
    always validated on events strictly later than everything it
    trained on for that entity).

    Adds ``holdout_rn`` (1-based time order within entity),
    ``holdout_n`` (entity row count) and ``split``. Deterministic and
    engine-exact: rank arithmetic is integer, and the single
    floor(valid_frac * n) double op is correctly rounded on both sides.
    One exchange + one sort (both window functions share the spec);
    rows with a null timestamp still rank (nulls first — they can never
    be 'valid' unless the entity is all-null-ts)."""
    from .windows import _as_list

    by_l = _as_list(by)
    by_sql = ", ".join(by_l)
    spec = f"PARTITION BY {by_sql}"
    order = f"ORDER BY {ts} ASC NULLS FIRST, {id_col}"
    # COUNT carries the same ordering with a full-partition ROWS frame so
    # both functions share ONE Window operator (an unordered COUNT spec
    # forces a second Window pass; value identical).
    d = df.select(
        "*",
        F.expr(f"ROW_NUMBER() OVER ({spec} {order})").alias("holdout_rn"),
        F.expr(
            f"COUNT(*) OVER ({spec} {order} ROWS BETWEEN UNBOUNDED PRECEDING"
            f" AND UNBOUNDED FOLLOWING)"
        ).alias("holdout_n"),
    )
    n_valid = F.floor(F.lit(float(valid_frac)) * F.col("holdout_n").cast("double"))
    return d.withColumn(
        "split",
        F.when(
            F.col("holdout_rn") > F.col("holdout_n") - n_valid, F.lit("valid")
        ).otherwise(F.lit("train")),
    )
