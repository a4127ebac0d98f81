"""Text analysis operators for training-data pipelines.

Everything here is pure `pyspark.sql.functions` column algebra (whole-stage
codegen, no Python in the hot path): tokenization, token counting, quality
scoring, n-gram language ID, rolling-hash document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

#: token definition shared with the DuckDB oracles:
#: lowercase, split on runs of non-alphanumerics, drop empties
TOKEN_SPLIT_RE = "[^a-z0-9]+"

# tiny per-language stopword lists for the n-gram/stopword language heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf",
           "für"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "dans", "pour"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "en", "por", "para"),
}


def tokens(col) -> Column:
    """Lower-cased alphanumeric tokens (empty strings removed)."""
    return F.filter(
        F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != ""
    )


def token_count(col) -> Column:
    return F.size(tokens(col))


#: GPT-2-style pre-tokenizer pattern, restricted to constructs Java regex
#: and RE2 (DuckDB) interpret identically (no lookahead): contraction
#: suffixes, space-prefixed letter runs, digit runs, punctuation runs
BPE_SPLIT_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_tokens(col) -> Column:
    """BPE-ish pre-token pieces (the merge-free approximation of a byte-pair
    tokenizer's pre-split)."""
    return F.regexp_extract_all(col, F.lit(BPE_SPLIT_RE), 0)


def bpe_token_count(col) -> Column:
    """Estimated subword count: each pre-token piece contributes
    ceil(len/4) subwords (min 1) — the ~4-chars-per-token rule of thumb
    applied per piece, deterministic and column-algebra only."""
    return F.aggregate(
        bpe_tokens(col), F.lit(0).cast("long"),
        lambda acc, x: acc + F.greatest(
            F.lit(1).cast("long"),
            F.floor((F.length(F.ltrim(x)) + 3) / 4).cast("long")),
    )


def whitespace_token_count(col) -> Column:
    """Plain whitespace-split token count (no lowercasing/punct strip)."""
    return F.size(F.filter(F.split(col, r"\s+"), lambda t: t != ""))


def punct_ratio(col) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(col, "[a-zA-Z0-9 ]", "")
    return F.when(F.length(col) > 0,
                  F.length(stripped) / F.length(col)).otherwise(F.lit(0.0))


def stopword_ratio(col, lang: str = "en") -> Column:
    stops = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
    toks = tokens(col)
    return F.when(
        F.size(toks) > 0,
        F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
        / F.size(toks),
    ).otherwise(F.lit(0.0))


def mean_token_len(col) -> Column:
    toks = tokens(col)
    return F.when(
        F.size(toks) > 0,
        F.aggregate(toks, F.lit(0).cast("double"),
                    lambda acc, t: acc + F.length(t)) / F.size(toks),
    ).otherwise(F.lit(0.0))


def quality_score(col) -> Column:
    """Deterministic [0,1] quality heuristic: long enough, mostly words,
    reasonable punctuation, reasonable stopword density."""
    n_tok = token_count(col)
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 4)
    stop = stopword_ratio(col)
    stop_score = F.least(stop * 5, F.lit(1.0))
    return F.round(
        0.4 * len_score + 0.3 * punct_pen + 0.3 * stop_score, 4
    )


def lang_scores(col) -> Column:
    """Array of (score, lang) structs, one per candidate language."""
    toks = tokens(col)
    entries = []
    for lang, stops in sorted(LANG_STOPWORDS.items()):
        arr = F.array(*[F.lit(s) for s in stops])
        score = F.when(
            F.size(toks) > 0,
            F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
            / F.size(toks),
        ).otherwise(F.lit(0.0))
        entries.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    return F.array(*entries)


def lang_id(col, min_score: float = 0.02) -> Column:
    """Best-scoring language, or 'unknown' below min_score.  Ties break by
    language code descending (array_max on (score, lang) structs)."""
    best = F.array_max(lang_scores(col))
    return F.when(best["score"] >= min_score, best["lang"]).otherwise(
        F.lit("unknown")
    )


def shingles(col, n: int = 5) -> Column:
    """Distinct word n-gram shingles (arrays of joined tokens).

    Single-Column form: the tokenization is inlined in the per-shingle
    lambda and re-evaluated per element (HOF lambdas get no CSE).  Hot
    paths bind the token array as a column and use
    `shingles_from_tokens`."""
    return shingles_from_tokens(tokens(col), n)


def shingles_from_tokens(toks: Column, n: int = 5) -> Column:
    """`shingles` over an already-bound token-array column."""
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        ),
    ).otherwise(
        F.when(F.size(toks) > 0, F.array(F.array_join(toks, " ")))
        .otherwise(F.array().cast("array<string>"))
    )


def with_shingles(df: DataFrame, text_col: str = "text",
                  out_col: str = "sh", n: int = 5) -> DataFrame:
    """Bind tokenization and shingling as separate columns (each consumed
    multiple times, so CollapseProject keeps them materialized) — the
    fast path for every shingle-based operator."""
    tmp = f"__{out_col}_toks"
    return (
        df.withColumn(tmp, tokens(F.col(text_col)))
        .withColumn(out_col, shingles_from_tokens(F.col(tmp), n))
        .drop(tmp)
    )


def fingerprint(col, n: int = 5) -> Column:
    """Rolling-hash document fingerprint: min xxhash64 over word n-gram
    shingles (a 1-permutation MinHash — robust to local edits).
    Single-Column form for tiny inputs; pipelines bind shingles first
    (`with_shingles` + `fingerprint_from_shingles`)."""
    return fingerprint_from_shingles(shingles(col, n))


def fingerprint_from_shingles(sh: Column) -> Column:
    """`fingerprint` over an already-bound shingle-array column."""
    return F.when(
        F.size(sh) > 0,
        F.array_min(F.transform(sh, lambda s: F.xxhash64(s))),
    ).otherwise(F.lit(None).cast("long"))


def _kgram_hashes(col, k: int) -> Column:
    """Positional word k-gram xxhash64 values (duplicates kept, unlike the
    deduped `shingles`).  Degenerate docs (< k tokens) hash their whole
    token string, mirroring `shingles`.

    Prefer `_kgram_hashes_from_tokens` over a bound token column: `col`'s
    tokenization is referenced inside the per-gram lambda and HOF lambdas
    re-evaluate unbound expression trees per element."""
    return _kgram_hashes_from_tokens(tokens(col), k)


def _kgram_hashes_from_tokens(toks: Column, k: int) -> Column:
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, k), " ")),
        ),
    ).otherwise(
        F.when(n > 0, F.array(F.xxhash64(F.array_join(toks, " "))))
        .otherwise(F.array().cast("array<bigint>"))
    )


def _window_min_select(grams: Column, w: int) -> Column:
    """Winnowing selection over an ALREADY-BOUND gram-array column:
    minimum per sliding window of w, distinct, sorted.

    `grams` must be a plain column reference, not an expression tree:
    Spark evaluates higher-order-function lambda bodies interpreted, with
    NO common-subexpression elimination, so an expression passed here is
    re-evaluated once per window — O(n^2) per document (measured 12.0 s
    vs 0.55 s at sf0.1 for the full winnow).  `winnow_fingerprints_df`
    does the binding; use it instead of composing this by hand."""
    m = F.size(grams)
    return F.when(
        m >= w,
        F.array_sort(F.array_distinct(F.transform(
            F.sequence(F.lit(0), m - w),
            lambda i: F.array_min(F.slice(grams, i + 1, w)),
        ))),
    ).otherwise(
        F.when(m > 0, F.array(F.array_min(grams)))
        .otherwise(F.array().cast("array<bigint>"))
    )


def winnow_fingerprints_df(df, text_col: str = "text",
                           out_col: str = "fps",
                           k: int = 4, w: int = 4):
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    MOSS local-match algorithm): positional word k-gram hashes, minimum
    per sliding window of w, distinct selected values sorted, as a new
    array column `out_col`.

    Guarantee: any shared token run of >= w + k - 1 tokens between two
    documents yields a shared fingerprint, while only ~2/(w+1) of the
    hashes are kept — local plagiarism/quotation detection that MinHash
    (global-similarity) misses.  Pure JVM column algebra.

    DataFrame-level on purpose: the gram array must be BOUND as a column
    between the two phases (see `_window_min_select`) or the window-min
    lambda re-computes the gram hashing once per window — 22x slower,
    measured."""
    tmp_t = f"__{out_col}_toks"
    tmp_g = f"__{out_col}_grams"
    return (
        df.withColumn(tmp_t, tokens(F.col(text_col)))
        .withColumn(tmp_g, _kgram_hashes_from_tokens(F.col(tmp_t), k))
        .withColumn(out_col, _window_min_select(F.col(tmp_g), w))
        .drop(tmp_t, tmp_g)
    )


def winnow_fingerprints(col, k: int = 4, w: int = 4) -> Column:
    """Single-Column winnowing (see `winnow_fingerprints_df`).  Only for
    tiny inputs/tests: with the grams inlined in one expression the
    window-min re-evaluates them per window (quadratic per document) —
    any real pipeline must use `winnow_fingerprints_df`."""
    return _window_min_select(_kgram_hashes(col, k), w)


def _grams2(toks) -> Column:
    """All word 2-grams in order (duplicates kept — repetition signal)."""
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.array_join(F.slice(toks, i + 1, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_ratios(col) -> tuple[Column, Column]:
    """Gopher-style within-document repetition signals: the fraction of
    tokens (resp. word 2-grams) that are repeats of an earlier occurrence.
    High values flag boilerplate/spam documents that poison training data.

    Returns (dup_token_ratio, dup_2gram_ratio), each in [0, 1].

    Single-Column form for tiny inputs/tests: the token array is inlined
    in the 2-gram lambda and re-tokenized per gram (see
    `_window_min_select`) — pipelines use `repetition_ratios_df`."""
    toks = tokens(col)
    g2 = _grams2(toks)
    dup1 = F.when(
        F.size(toks) > 0,
        F.lit(1.0) - F.size(F.array_distinct(toks)) / F.size(toks),
    ).otherwise(F.lit(0.0))
    dup2 = F.when(
        F.size(g2) > 0,
        F.lit(1.0) - F.size(F.array_distinct(g2)) / F.size(g2),
    ).otherwise(F.lit(0.0))
    return dup1, dup2


def repetition_ratios_df(
    df: DataFrame,
    text_col: str = "text",
    tok_out: str = "dup_token_ratio",
    gram_out: str = "dup_2gram_ratio",
) -> DataFrame:
    """`repetition_ratios` with the token and 2-gram arrays BOUND as
    columns between phases, so the 2-gram lambda slices a materialized
    array instead of re-running tokenization per gram (HOF lambdas get no
    common-subexpression elimination — the winnowing lesson)."""
    tt, tg = "__rr_toks", "__rr_g2"
    out = (
        df.withColumn(tt, tokens(F.col(text_col)))
        .withColumn(tg, _grams2(F.col(tt)))
    )
    toks, g2 = F.col(tt), F.col(tg)
    dup1 = F.when(
        F.size(toks) > 0,
        F.lit(1.0) - F.size(F.array_distinct(toks)) / F.size(toks),
    ).otherwise(F.lit(0.0))
    dup2 = F.when(
        F.size(g2) > 0,
        F.lit(1.0) - F.size(F.array_distinct(g2)) / F.size(g2),
    ).otherwise(F.lit(0.0))
    return (out.withColumn(tok_out, dup1)
            .withColumn(gram_out, dup2).drop(tt, tg))


#: PII patterns restricted to constructs Java regex and RE2 share
#: (no lookaround, no backreferences) so the DuckDB oracles match exactly
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}-\d{4}\b"


def pii_scrub(col) -> tuple[Column, Column, Column, Column]:
    """Scrub emails / IPv4 addresses / short phone numbers, in that fixed
    order (email bodies can contain dots; IPs must go before the phone
    pass so dotted quads never half-match).

    Returns (scrubbed_text, n_emails, n_ips, n_phones).  Pure JVM regex —
    at 100 TB this is the map-side transform it should be."""
    n_em = F.regexp_count(col, F.lit(PII_EMAIL_RE))
    no_em = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    n_ip = F.regexp_count(no_em, F.lit(PII_IP_RE))
    no_ip = F.regexp_replace(no_em, PII_IP_RE, "<IP>")
    n_ph = F.regexp_count(no_ip, F.lit(PII_PHONE_RE))
    scrubbed = F.regexp_replace(no_ip, PII_PHONE_RE, "<PHONE>")
    return scrubbed, n_em, n_ip, n_ph


def chunk_texts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 200,
) -> DataFrame:
    """Split each document into fixed-token training chunks (map-side
    explode, no shuffle): chunk i holds tokens [i*C, (i+1)*C).

    Emits (id, chunk_idx, n_tokens, chunk_sha) — the sha256 of the
    space-joined chunk identifies content without carrying it.

    The token array is bound as a column before the chunk lambda slices
    it (HOF lambdas re-evaluate inlined expressions per element — here
    that would re-tokenize the document once per chunk).  posexplode_outer
    + isNotNull keeps InferFiltersFromGenerate from pushing a filter with
    the chunk expression re-inlined below the scan (see session.py)."""
    c = chunk_tokens
    bound = df.withColumn("__ct_toks", tokens(F.col(text_col)))
    toks = F.col("__ct_toks")
    chunks = F.transform(
        F.sequence(F.lit(0),
                   F.ceil(F.size(toks) / F.lit(c)).cast("int") - 1),
        lambda i: F.array_join(F.slice(toks, i * c + 1, c), " "),
    )
    ex = bound.select(
        F.col(id_col),
        F.size(toks).alias("_n"),
        F.posexplode_outer(F.when(F.size(toks) > 0, chunks))
        .alias("chunk_idx", "chunk"),
    ).filter(F.col("chunk").isNotNull())
    return ex.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.least(F.lit(c).cast("long"),
                F.col("_n") - F.col("chunk_idx") * c).alias("n_tokens"),
        F.sha2(F.col("chunk"), 256).alias("chunk_sha"),
    )


def contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    min_overlap: float = 0.5,
) -> DataFrame:
    """Benchmark decontamination: fraction of each training document's
    distinct word n-gram shingles that also occur anywhere in the eval
    set; rows with overlap >= min_overlap are flagged for removal.

    The eval shingle set is dimension-sized (benchmarks are small), so the
    membership join broadcasts; the training side is a map-side explode +
    partial-count aggregation — no all-pairs comparison anywhere."""
    from pyspark.sql.functions import broadcast

    eval_sh = (
        with_shingles(eval_df, text_col, "sh", shingle_n)
        .select(F.explode_outer("sh").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
        .distinct()
    )
    tr = (
        with_shingles(train, text_col, "sh", shingle_n)
        .select(F.col(id_col), "sh")
        .where(F.size("sh") > 0)
    )
    # explode_outer: a plain explode would let InferFiltersFromGenerate
    # re-inline the shingle build into a pushed-down filter (session.py);
    # the inner join on shingle drops any null row it emits
    ex = tr.select(id_col, F.size("sh").alias("n_sh"),
                   F.explode_outer("sh").alias("shingle"))
    hits = (
        ex.join(broadcast(eval_sh), "shingle")
        .groupBy(id_col, "n_sh")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        hits.select(
            id_col,
            F.round(F.col("n_hit") / F.col("n_sh"), 6).alias("overlap"))
        .where(F.col("overlap") >= min_overlap)
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Inverted-index keyword search with BM25 ranking (Robertson/Walker):
    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)).

    Scale shape: ONE tokenization pass — the corpus is tokenized into a
    pinned per-doc frame (id, dl, query-term hits array; O(n_docs) rows,
    arrays capped by |query| occurrences) and every downstream consumer
    (corpus stats, per-term document frequencies, the tf pivot) reads
    that frame instead of re-scanning text (r3 VERDICT #3: the old shape
    ran three separate corpus tokenizations — .first() stats, dfreq
    .collect(), final pivot).  The posting explode is filtered to the
    |query| terms BEFORE the shuffle, so shuffled volume is O(matching
    postings), not O(corpus tokens); per-(doc, term) tf via
    map-side-combined groupBy; the final cut is TakeOrderedAndProject
    (per-partition heaps).

    Determinism for the SQL twin: per-term contributions use idf rounded
    to 6 dp and are added in query-term order (a fixed-order fold, no
    float-summation nondeterminism); the caller rounds the final score.
    """
    clash = set(query_terms) & {id_col, "dl", "score"}
    if clash:
        raise ValueError(f"query terms collide with output columns: {clash}")
    from .dedup import _pin
    qlit = F.array(*[F.lit(t) for t in query_terms])
    docs = _pin(df.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).alias("dl"),
        F.filter(tokens(F.col(text_col)),
                 lambda t: F.array_contains(qlit, t)).alias("_hits"),
    ))
    base = docs.select(F.col(id_col), F.col("dl"),
                       F.explode("_hits").alias("term"))
    tf = base.groupBy(id_col, "dl", "term").agg(
        F.count(F.lit(1)).alias("tf"))
    n_docs, sum_dl = docs.select(
        F.count(F.lit(1)), F.sum("dl").cast("long")).first()
    avgdl = float(sum_dl) / float(n_docs)
    dfreq = {r["term"]: r["df"] for r in
             tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
             .collect()}
    import math
    piv = tf.groupBy(id_col, "dl").pivot("term", list(query_terms)) \
        .agg(F.first("tf"))
    score = F.lit(0.0)
    for t in query_terms:
        dft = dfreq.get(t, 0)
        idf = round(math.log(1.0 + (n_docs - dft + 0.5) / (dft + 0.5)), 6)
        tfc = F.col(t).cast("double")
        wt = (tfc * (k1 + 1.0)
              / (tfc + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))))
        score = score + F.when(F.col(t).isNotNull(),
                               F.lit(idf) * wt).otherwise(F.lit(0.0))
    return (
        piv.withColumn("score", score)
        .orderBy(F.desc("score"), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "dl", F.round("score", 4).alias("score"))
    )


def tfidf_topk(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 5, decimals: int = 4,
) -> DataFrame:
    """Top-k keyword extraction per document by TF-IDF
    (tf * (ln((N+1)/(df+1)) + 1), the smoothed sklearn-style variant).

    Shape at 100 TB: tf is one map-side-combinable shuffle on
    (doc, term); df reuses tf's distinct (doc, term) rows with a second
    partial agg on term; the corpus size N joins in as a broadcast
    1-row aggregate (never a driver-side count round-trip); the tf ⋈ df
    join shuffles on term — vocabulary-sized, AQE-splittable if a hot
    term skews — and the final top-k is one partial-aggregated groupBy
    per doc (collect_list + array_sort + slice: ~2x faster than the
    equivalent window, which must sort-shuffle EVERY scored row;
    per-group state is bounded by the doc's distinct terms).  Rounding
    happens BEFORE ranking on both the Spark and the oracle side so
    near-tie order agrees."""
    from .dedup import _pin
    toks = df.select(F.col(id_col).alias("id"),
                     F.explode(tokens(F.col(text_col))).alias("term"))
    # tf feeds BOTH dfreq and the scored join — pin it so the corpus is
    # tokenized and partially aggregated once, not once per plan branch
    tf = _pin(toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # 1-row broadcast cross join: plans as BroadcastNestedLoopJoin with a
    # single-row build side — the optimal scalar-join shape (whitelisted
    # in the plan audit; a constant-key equi-join gets folded back to a
    # cross join by Catalyst)
    n = df.agg(F.count(F.lit(1)).cast("double").alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n") + F.lit(1.0))
                         / (F.col("df") + F.lit(1.0))) + F.lit(1.0)),
                decimals))
    )
    # (-tfidf, term) struct sort == the window's (tfidf DESC, term ASC)
    return (
        scored.groupBy("id")
        .agg(F.slice(
            F.array_sort(F.collect_list(F.struct(
                (-F.col("tfidf")).alias("neg"),
                F.col("term").alias("term"),
                F.col("tfidf").alias("tfidf")))),
            1, k).alias("top"))
        .select("id", F.posexplode("top").alias("pos", "s"))
        .select(F.col("id").alias(id_col),
                F.col("s.term").alias("term"),
                F.col("s.tfidf").alias("tfidf"),
                (F.col("pos") + 1).alias("rnk"))
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    decimals: int = 4,
) -> DataFrame:
    """Mean per-token negative log-likelihood under the corpus's own
    add-one-smoothed unigram LM — the cheap perplexity-style outlier /
    quality signal (high nll = improbable token mix: boilerplate, other
    languages, binary junk).

    p(t) = (cnt(t) + 1) / (total + |V|).  The per-doc mean folds
    floor(1e9 * -ln p) as EXACT long sums (the IVF-quantizer trick), so
    the score is bit-identical under any partitioning — a plain double
    sum would vary run-to-run with Spark's partial-agg order.  Shape at
    scale: one vocab-sized partial-agg shuffle, a broadcast 1-row total,
    and the token⋈vocab join — broadcast when |V| fits, else AQE handles
    the stopword skew."""
    toks = df.select(F.col(id_col).alias("id"),
                     F.explode(tokens(F.col(text_col))).alias("term"))
    tc = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    # 1-row broadcast scalar join — see tfidf_topk
    tot = tc.agg(F.sum("cnt").alias("total"),
                 F.count(F.lit(1)).alias("vocab"))
    scored = (
        toks.join(tc, "term")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "s",
            F.floor(
                -F.log((F.col("cnt") + F.lit(1.0))
                       / (F.col("total") + F.col("vocab")))
                * F.lit(1000000000.0)).cast("long"))
    )
    return (
        scored.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("s").alias("ssum"))
        .select(F.col("id").alias(id_col), "n_tokens",
                F.round(F.col("ssum") / (F.lit(1000000000.0)
                                         * F.col("n_tokens")),
                        decimals).alias("nll"))
    )


def vocab_topk(
    df: DataFrame, text_col: str = "text", k: int = 256,
) -> DataFrame:
    """Deterministic top-k corpus vocabulary: tokens ranked by
    (count DESC, token ASC) — the total order makes the k-boundary
    tie-break reproducible under any partitioning.  Shape at scale: one
    map-side-combined token count shuffle followed by a global top-k
    (TakeOrderedAndProject — each partition keeps only its k best, the
    driver merges k-sized heaps; no global sort materializes).
    Returns (token, cnt, rank) with rank 1..k."""
    tc = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token")).limit(k)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return tc.withColumn("rank", F.row_number().over(w).cast("long"))


def oov_stats(
    df: DataFrame, vocab: DataFrame, id_col: str = "doc_id",
    text_col: str = "text", decimals: int = 6,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a (typically
    vocab_topk-built) vocabulary — the tokenizer-coverage / junk signal a
    training pipeline gates on before paying for real BPE encoding.
    Counts token OCCURRENCES (not distinct types): explode + broadcast
    hash join against the k-row vocab, one per-doc partial-agg shuffle;
    zero-token docs are restored by the final left join so every input
    row gets a report."""
    toks = df.select(F.col(id_col).alias("id"),
                     F.explode(tokens(F.col(text_col))).alias("token"))
    hits = (
        toks.join(F.broadcast(vocab.select("token")
                              .withColumn("_in", F.lit(1))),
                  "token", "left")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.count("_in").alias("n_in"))
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            (F.coalesce("n_tokens", F.lit(0))
             - F.coalesce("n_in", F.lit(0))).cast("long").alias("n_oov"),
            F.round(
                F.when(F.coalesce("n_tokens", F.lit(0)) > 0,
                       (F.col("n_tokens") - F.col("n_in"))
                       / F.col("n_tokens").cast("double"))
                .otherwise(F.lit(0.0)), decimals).alias("oov_ratio"),
        )
    )


def token_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    decimals: int = 6,
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (nats):
    H = ln N − (1/N)·Σ_t n_t·ln n_t — the diversity / repetition junk
    signal (near-0 for "buy buy buy…" spam, ~ln N for all-distinct
    prose).  Complements `repetition_ratios` (which detects REPEATED
    RUNS) by catching high-frequency scattered repetition.

    The Σ n_t·ln n_t term folds floor(n_t·ln(n_t)·1e9) as EXACT longs
    (the unigram_logprob discipline), so the score is bit-identical
    under any partitioning.  Shape at 100 TB: wordcount — one
    (id, token) partial-agg shuffle bounded by per-doc vocabulary, one
    per-id rollup; no joins, no skew (keys carry the doc id)."""
    tok = df.select(F.col(id_col).alias("id"),
                    F.explode(tokens(F.col(text_col))).alias("t"))
    tc = tok.groupBy("id", "t").agg(F.count(F.lit(1)).alias("n"))
    per = tc.groupBy("id").agg(
        F.sum("n").alias("n_tokens"),
        F.sum(F.floor(F.col("n") * F.log(F.col("n"))
                      * F.lit(1000000000.0))).alias("s"))
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long")
            .alias("n_tokens"),
            F.round(
                F.when(F.col("n_tokens") > 0,
                       F.log(F.col("n_tokens"))
                       - F.col("s") / (F.lit(1000000000.0)
                                       * F.col("n_tokens")))
                .otherwise(F.lit(0.0)), decimals).alias("entropy"),
        )
    )


def hash_feature_quality(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    seed: str = "fq1", decimals: int = 6,
) -> DataFrame:
    """fastText-style hash-feature linear classifier INFERENCE as pure
    relational algebra: features are unigrams + word bigrams (fastText's
    ``wordNgrams=2``), each feature hashes to a deterministic integer
    weight in [-1000, 1000] via md5(seed ':' feat) — standing in for a
    trained weight table without shipping one — and the document score is
    the squashed mean feature weight.  The real-model variant only swaps
    the md5 weight expression for a broadcast join against a (feature,
    weight) table; every other operator stays identical, so this pins the
    exact plan shape a production quality classifier runs at 100 TB.

    Determinism across engines: weights are exact integers summed as
    longs (partial-agg order can't change the result), and the squash is
    the Elliott sigmoid x/(1+|x|) — division/abs/add are correctly-rounded
    IEEE ops, identical in Spark and DuckDB, unlike exp()-based logistic
    whose libm last-ulp may differ.  score in (0,1); empty docs get the
    neutral 0.5.

    Shape at 100 TB: wordcount — explode + map-side-combined per-doc sum;
    md5/conv/mod all whole-stage-codegen JVM expressions; one shuffle of
    (id, count, sum) rows.  No vocabulary state, no skew (features fan
    out per doc, the groupBy key is the doc id).
    """
    tmp_t = "__hfq_toks"
    base = df.select(F.col(id_col).alias("id"),
                     tokens(F.col(text_col)).alias(tmp_t))
    ts = F.col(tmp_t)  # bound column: HOF lambdas re-evaluate their
    n = F.size(ts)     # argument per element, never CSE an expression in
    bigr = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(F.element_at(ts, i), F.lit(" "),
                               F.element_at(ts, i + 1))),
    ).otherwise(F.array().cast("array<string>"))
    feats = base.select("id", F.explode(F.concat(ts, bigr)).alias("feat"))
    weighted = feats.withColumn(
        "w",
        F.conv(F.substring(F.md5(F.concat(F.lit(seed + ":"),
                                          F.col("feat"))), 1, 15),
               16, 10).cast("long") % 2001 - 1000)
    agg = weighted.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_features"), F.sum("w").alias("wsum"))
    x = F.col("wsum") / (F.col("n_features") * F.lit(1000.0))
    return (
        df.select(F.col(id_col).alias("id"))
        .join(agg, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_features", F.lit(0)).cast("long")
            .alias("n_features"),
            F.round(
                F.when(F.col("n_features") > 0,
                       (x / (F.lit(1.0) + F.abs(x)) + F.lit(1.0)) / 2)
                .otherwise(F.lit(0.5)), decimals).alias("quality"),
        )
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One call adding all text-analysis columns."""
    c = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(c))
        .withColumn("punct_ratio", F.round(punct_ratio(c), 4))
        .withColumn("stopword_ratio", F.round(stopword_ratio(c), 4))
        .withColumn("mean_token_len", F.round(mean_token_len(c), 4))
        .withColumn("quality", quality_score(c))
        .withColumn("lang_pred", lang_id(c))
        .withColumn("fingerprint", fingerprint(c))
    )


def dsir_importance(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    target: Column | None = None, n_buckets: int = 256,
    alpha: float = 1.0, decimals: int = 6,
) -> DataFrame:
    """DSIR hashed-ngram importance weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score every
    document by how much more likely its token mix is under a TARGET
    domain's unigram bucket distribution than under the RAW corpus's —
    log w(d) = sum over token occurrences of
    ln p_target(bucket) - ln p_raw(bucket), buckets = pmod(xxhash64(token),
    n_buckets), add-alpha smoothing on both distributions.  Sampling
    proportionally to exp(log_weight) reshapes the raw corpus toward the
    target domain; here the weight column itself is the deliverable.

    `target` is any boolean Column over df's columns marking the target-
    domain exemplars (e.g. F.col("lang") == "en"); both distributions are
    estimated from the same corpus in one pass.

    Exactness: per-bucket log-ratios are scaled-long folds (floor(1e9*x),
    the unigram_logprob trick), so the per-doc sum is bit-identical under
    any partitioning.  Shape at scale: ONE heavy pass — the token explode
    reduces immediately to per-(doc, bucket) counts (map-side combined,
    ≤ n_buckets rows per doc), persisted so the distribution estimates,
    the scalar totals and the final per-doc fold all reuse it instead of
    re-tokenizing the corpus per branch; then a broadcast n_buckets-row
    distribution join and one per-doc partial agg — no all-pairs, no
    global sort.  Hot-token skew lands on the bounded bucket aggregation,
    which partial aggregation absorbs.
    """
    if target is None:
        target = F.lit(True)
    from .dedup import _pin
    bc = _pin(
        df.select(
            F.col(id_col).alias("id"), target.alias("is_target"),
            F.explode(tokens(F.col(text_col))).alias("term"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
        .groupBy("id", "is_target", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    raw = bc.groupBy("bucket").agg(F.sum("c").alias("craw"))
    tgt = (bc.filter("is_target")
           .groupBy("bucket").agg(F.sum("c").alias("ctgt")))
    tot = bc.agg(
        F.sum("c").alias("traw"),
        F.sum(F.when(F.col("is_target"), F.col("c")).otherwise(F.lit(0)))
        .alias("ttgt"))
    b = float(n_buckets)
    dist = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "s",
            F.floor(
                (F.log((F.coalesce(F.col("ctgt"), F.lit(0)) + F.lit(alpha))
                       / (F.col("ttgt") + F.lit(alpha * b)))
                 - F.log((F.col("craw") + F.lit(alpha))
                         / (F.col("traw") + F.lit(alpha * b))))
                * F.lit(1000000000.0)).cast("long"))
        .select("bucket", "s")
    )
    return (
        bc.join(F.broadcast(dist), "bucket")
        .groupBy("id")
        .agg(F.sum("c").alias("n_tokens"),
             F.sum(F.col("c") * F.col("s")).alias("ssum"))
        .select(F.col("id").alias(id_col),
                F.col("n_tokens").cast("long").alias("n_tokens"),
                F.round(F.col("ssum") / F.lit(1000000000.0), decimals)
                .alias("log_weight"))
    )


#: stop words whose presence Gopher rule 8 requires (Rae et al. 2021 §A1.1)
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_words: int = 50, max_words: int = 100000,
    min_mean_word_len: float = 3.0, max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1, max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3, min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2, decimals: int = 6,
) -> DataFrame:
    """The Gopher quality-rule bundle (Rae et al. 2021 §A1.1; reused by
    RedPajama/Dolma/FineWeb): per-document repetition-free heuristics —
    word-count bounds, mean-word-length bounds, symbol-to-word ratio
    (# and ellipsis), bullet-line and ellipsis-line fractions, fraction
    of words containing an alphabetic character, and the required
    stop-word hits — plus the conjunctive `keep` verdict.

    Pure column algebra over one row (no shuffle at all — a map-only
    stage that fuses into whatever scan feeds it; the cheapest filter in
    the pipeline, which is why it runs FIRST at 100 TB, before any
    hash/dedup pass).  `keep` is computed from the UNROUNDED doubles on
    both engine sides (the reported ratios are rounded for display)."""
    c = F.col(text_col)
    words = F.filter(F.split(c, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    sum_len = F.aggregate(words, F.lit(0).cast("long"),
                          lambda acc, w: acc + F.length(w))
    # empty/whitespace-only docs: n_words == 0 — guard every /n_words
    # ratio (Spark 4 runs ANSI mode where x/0 raises; DuckDB's twin uses
    # the same explicit CASE so both sides agree on NULL), and the keep
    # verdict stays deterministically FALSE via the n_words >= min_words
    # conjunct (FALSE AND NULL = FALSE in both engines)
    mean_wl = F.when(n_words > 0, sum_len / n_words)
    # '#' plus BOTH ellipsis forms — the ASCII three-dot counts as one
    # symbol occurrence, mirroring the Unicode char
    n_symbols = (
        F.length(c)
        - F.length(F.replace(F.replace(c, F.lit("#"), F.lit("")),
                             F.lit("…"), F.lit("")))
        + (F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit(""))))
        / F.lit(3))
    symbol_ratio = F.when(n_words > 0, n_symbols / n_words)
    lines = F.filter(F.split(c, r"\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines)
    bullet_frac = (
        F.size(F.filter(lines, lambda l: F.ltrim(l).rlike(r"^[-*•]")))
        / n_lines)
    ellipsis_frac = (
        F.size(F.filter(lines,
                        lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$")))
        / n_lines)
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / n_words)
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(tokens(c)),
        F.array(*[F.lit(s) for s in GOPHER_STOPS])))
    out = df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("_mwl"), symbol_ratio.alias("_sym"),
        F.when(n_lines > 0, bullet_frac).otherwise(F.lit(0.0)).alias("_bul"),
        F.when(n_lines > 0, ellipsis_frac).otherwise(F.lit(0.0))
        .alias("_ell"),
        alpha_frac.alias("_alp"),
        stop_hits.cast("long").alias("stop_hits"),
    )
    keep = (
        (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
        & (F.col("_mwl") >= min_mean_word_len)
        & (F.col("_mwl") <= max_mean_word_len)
        & (F.col("_sym") <= max_symbol_ratio)
        & (F.col("_bul") <= max_bullet_frac)
        & (F.col("_ell") <= max_ellipsis_frac)
        & (F.col("_alp") >= min_alpha_word_frac)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return out.select(
        id_col, "n_words",
        F.round("_mwl", decimals).alias("mean_word_len"),
        F.round("_sym", decimals).alias("symbol_ratio"),
        F.round("_bul", decimals).alias("bullet_frac"),
        F.round("_ell", decimals).alias("ellipsis_frac"),
        F.round("_alp", decimals).alias("alpha_word_frac"),
        "stop_hits", keep.alias("keep"),
    )


def ccnet_buckets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    lang_col: str = "lang", n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style per-language quality bucketing (Wenzek et al. 2020):
    rank every document by its LM negative log-likelihood WITHIN its
    language and cut into `n_buckets` equal tiles — head (most fluent),
    middle, tail.  CCNet uses a KenLM 5-gram; here the LM is the corpus's
    own add-one unigram model (unigram_logprob), which keeps the operator
    self-contained while preserving the pipeline shape: score, per-lang
    ntile, label.

    Ties are pinned by (nll, id) so the tile boundaries are reproducible
    across engines.  Shape at scale: the scoring passes of
    unigram_logprob plus ONE per-language window — partitioned by lang,
    so the sort parallelizes per language rather than globally; languages
    are the natural coarse key of a multilingual corpus, with skew (the
    English pile) handled by the fact that ntile needs only a per-lang
    sort, i.e. a range-partitioned sort-within-lang at extreme sizes."""
    nll = unigram_logprob(df, id_col, text_col, decimals=4)
    j = df.select(F.col(id_col), F.col(lang_col)).join(nll, id_col)
    w = Window.partitionBy(lang_col).orderBy(
        F.col("nll").asc(), F.col(id_col).asc())
    b = F.ntile(n_buckets).over(w)
    # label by POSITION: the first tile is always 'head' and the LAST is
    # always 'tail' whatever n_buckets is (a fixed {3: 'tail'} map would
    # mislabel the third quartile of a 4-way cut as the worst tile)
    expr = (F.when(b == 1, F.lit("head"))
            .when(b == n_buckets, F.lit("tail"))
            .otherwise(F.lit("middle")))
    return j.select(
        F.col(id_col), F.col(lang_col), "n_tokens", "nll",
        b.cast("int").alias("bucket_idx"), expr.alias("bucket"))


def c4_rules(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_line_words: int = 3, min_kept_lines: int = 1,
    decimals: int = 6,
) -> DataFrame:
    """The C4 line/document cleaning heuristics (Raffel et al. 2020,
    §2.2 — the rules behind the C4 corpus, reused by Pile/RedPajama):
    a line is KEPT only if it ends in terminal punctuation (. ! ? ")
    and has >= `min_line_words` words and does not contain the word
    "javascript" (cookie/JS boilerplate); a document is dropped
    entirely if it contains "lorem ipsum" or a curly brace (code), or
    keeps fewer than `min_kept_lines` lines.

    Pure per-row column algebra like gopher_rules — a map-only stage
    with no shuffle that fuses into the scan; the line split and
    per-line predicates are array HOFs, never a Python UDF.  `keep` is
    conjunctive over the document flags; kept_frac is rounded for
    display only.

    Returns (id_col, n_lines, kept_lines, kept_frac, has_lorem,
    has_brace, keep)."""
    c = F.col(text_col)
    lines = F.filter(F.split(c, r"\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines)
    kept = F.filter(
        lines,
        lambda l: (F.rtrim(l).rlike(r'[.!?"]$')
                   & (F.size(F.filter(F.split(F.trim(l), r"\s+"),
                                      lambda w: w != ""))
                      >= F.lit(min_line_words))
                   & ~F.lower(l).contains("javascript")))
    kept_lines = F.size(kept)
    has_lorem = F.lower(c).contains("lorem ipsum")
    has_brace = c.contains("{") | c.contains("}")
    out = df.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        kept_lines.cast("long").alias("kept_lines"),
        F.when(n_lines > 0,
               F.round(kept_lines.cast("double") / n_lines, decimals))
        .otherwise(F.lit(0.0)).alias("kept_frac"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
    )
    return out.withColumn(
        "keep",
        (F.col("kept_lines") >= F.lit(min_kept_lines))
        & ~F.col("has_lorem") & ~F.col("has_brace"))
