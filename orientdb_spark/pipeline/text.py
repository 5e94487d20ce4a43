"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

All pure Column expressions (JVM-side, codegen-friendly, no UDFs) and all
exactly reproducible in ANSI SQL for the duckdb oracle.
"""

from __future__ import annotations

from functools import reduce

import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F

from orientdb_spark.pipeline.common import h60, normalize_text, ws_tokens

# marker-token sets for the n-gram/stopword language heuristic; scoring is
# marker-hit ratio per language, argmax with lexicographic tie-break
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "en": ["the", "a", "and", "of", "to", "is", "in", "that"],
    "es": ["el", "la", "de", "y", "que", "los", "una", "con"],
    "fr": ["le", "la", "les", "et", "des", "une", "est", "dans"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}

# BPE-ish token regex: letter runs, digit runs, or single non-space symbols
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS_EN = ["the", "a", "and", "of", "to", "is", "in", "that", "it", "for"]


def _marker_ratio(toks: Column, markers: list[str]) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.isin(*markers)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1))


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: per-language marker-token hit ratio, argmax
    (ties → lexicographically first language). Returns
    (id, predicted_lang, lang_score).

    Staged projections on purpose: tokenization and the 5 ratio scores are
    each referenced many times downstream, and interpreted higher-order
    functions get no codegen subexpression elimination — inlined, the
    split+filter would re-run ~16× per row (measured 4s → <1s at sf0.01
    from this staging; CollapseProject keeps non-cheap multi-referenced
    stages separate)."""
    langs = sorted(LANG_MARKERS)
    staged = df.select(
        F.col(id_col), ws_tokens(F.lower(F.col(text_col))).alias("__toks")
    )
    scored = staged.select(
        F.col(id_col),
        *[
            _marker_ratio(F.col("__toks"), LANG_MARKERS[lang]).alias(f"__s_{lang}")
            for lang in langs
        ],
    )
    best = F.greatest(*[F.col(f"__s_{lang}") for lang in langs])
    pred = F.lit(None).cast("string")
    # build reverse when-chain so earlier (lexically first) languages win ties
    for lang in sorted(langs, reverse=True):
        pred = F.when(F.col(f"__s_{lang}") == best, F.lit(lang)).otherwise(pred)
    return scored.select(
        F.col(id_col),
        pred.alias("predicted_lang"),
        F.round(best, 6).alias("lang_score"),
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish regex tokens, chars."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(ws_tokens(t)).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_RE), 0)).alias("n_bpe_tokens"),
        F.length(t).alias("n_chars"),
    )


def token_budget(
    df: DataFrame,
    group_cols: list[str] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Corpus token budget: docs / whitespace tokens / BPE-ish tokens /
    chars per group (default per source × lang) — the "how many training
    tokens do we have, and where" aggregation every pipeline runs before
    sizing a training job.

    One scan with the token expressions computed in the projection and
    ONE groupBy (map-side partial aggregation carries only the counters)
    — not token_stats joined back onto the corpus, which would shuffle
    the whole table to re-attach columns it was derived from."""
    group_cols = group_cols or ["source", "lang"]
    t = F.col(text_col)
    per_doc = df.select(
        *group_cols,
        F.size(ws_tokens(t)).alias("__ws"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_RE), 0)).alias("__bpe"),
        F.length(t).alias("__ch"),
    )
    return per_doc.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__ws").cast("long").alias("total_ws_tokens"),
        F.sum("__bpe").cast("long").alias("total_bpe_tokens"),
        F.sum("__ch").cast("long").alias("total_chars"),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k terms by TF-IDF (keyword extraction).

    score = tf * ln(N / df) over lowercased whitespace tokens; returns
    (id, term, tfidf, rank) with rank 1..k per doc, ties broken by term.

    Shape at scale: the explode is linear in corpus tokens, both
    groupBys partial-aggregate map-side, N rides a broadcast 1-row
    crossJoin (never a driver collect), and the tf<->df join shuffles on
    term — the vocabulary key, which Zipf-skews toward stopwords; AQE's
    skew-join split handles that without salting since each tf row
    joins exactly one df row. Ranking compares the ROUNDED score (6 dp)
    so a last-ulp ln() difference between engines cannot flip ranks
    unless two scores agree to 1e-6 — and then the term tiebreak makes
    both engines agree anyway."""
    toks = df.select(
        F.col(id_col), F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("term")
    )
    # tf feeds two branches (the df-counts and the scored join);
    # checkpoint it once or each branch re-runs the corpus scan +
    # explode — the triangle-count lesson (graph.py). N stays a
    # count-star over the source (zero-column parquet scan): it must
    # include token-less docs, which tf no longer holds.
    tf = (
        toks.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            F.round(
                F.col("tf") * F.log(F.col("__n") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Batch BM25 ranked retrieval (Robertson & Zaragoza 2009; the
    Okapi scoring every lexical search engine runs) — per query, the
    top-k docs by

        sum over query terms of
            idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

    with Lucene's always-positive idf ``ln(1 + (N - df + 0.5) /
    (df + 0.5))``. This is the ranked companion to the boolean/phrase
    fulltext surface and the drop-in lexical arm for hybrid retrieval
    (hybrid_rrf_topk's tf-idf side predates it). Query terms are the
    DISTINCT lowercased whitespace tokens of the query string (set
    semantics — repeating a term in the query does not double its
    weight).

    Shape at scale: one corpus scan tokenizes and explodes (linear in
    corpus tokens); per-doc tf partial-aggregates map-side and is
    checkpointed once — it feeds BOTH the doc-length branch (dl =
    sum(tf), so no second tokenize pass) and the postings join.
    Restricting postings to the query vocabulary is a broadcast
    semi-shaped join on term (the query table is the small side by
    assumption — a thousand queries is a few thousand distinct terms),
    AFTER which everything is bounded by docs-containing-a-query-term
    (the posting-list shape). df counts still see every doc holding
    the term because the restriction filters terms, not docs. N and
    total token count ride ONE broadcast 1-row crossJoin; the only
    corpus-keyed shuffles are the tf groupBy and the (query, doc)
    score sum; the final per-query rank is a row_number window with
    the filter directly above it, so WindowGroupLimit prunes to k
    rows map-side. The term join key Zipf-skews toward stopwords —
    AQE's skew split handles it without salting since each tf row
    matches at most the query-vocabulary rows for that term.

    Determinism: tf, dl, df, N are integers; avgdl and each term
    contribution are fixed double expressions of them; the per-(query,
    doc) sum spans few O(1-10)-magnitude terms, so cross-engine
    accumulation noise sits ~1e-15 relative — far under the 6-dp
    nudge-round applied AFTER the sum (the lm_score convention).
    Ranking compares the rounded score with doc-id tiebreaks.

    Returns (query_id, doc_id, bm25, rank) with rank 1..k per query.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if k1 < 0 or not 0.0 <= b <= 1.0:
        raise ValueError(f"need k1 >= 0 and 0 <= b <= 1, got k1={k1}, b={b}")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    # tf feeds three branches (doc lengths, df counts, scoring);
    # checkpoint once or each re-runs the corpus scan + explode — the
    # tfidf_top_terms / triangle-count lesson.
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # N counts ALL docs (token-less ones included — they left tf but
    # belong in N and avgdl); total tokens folds off the tf table.
    stats = (
        docs.agg(F.count(F.lit(1)).alias("__n"))
        .crossJoin(tf.agg(F.coalesce(F.sum("tf"), F.lit(0)).alias("__tok")))
    )
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(
            F.array_distinct(ws_tokens(F.lower(F.col(query_text_col))))
        ).alias("term"),
    )
    return _bm25_rank(tf, dl, stats, qterms, k, k1, b)


def _bm25_rank(tf, dl, stats, qterms, k: int, k1: float, b: float) -> DataFrame:
    """The BM25 scoring/ranking stage over prebuilt corpus tables —
    shared by ``bm25_topk`` and both passes of ``rocchio_prf_topk`` so
    a PRF pipeline tokenizes the corpus ONCE. ``qterms`` is a
    (query_id, term) table; shape notes live on ``bm25_topk``."""
    # postings restricted to the query vocabulary; df per term is
    # counted AFTER the restriction but still over every doc holding
    # the term (the filter is term-keyed, never doc-keyed)
    tfq = tf.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    ).localCheckpoint(eager=False)
    dfreq = tfq.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = F.col("__n").cast("double")
    avgdl = F.col("__tok").cast("double") / n
    idf = F.log(
        F.lit(1.0)
        + (n - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    contrib = idf * (
        F.col("tf") * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
        )
    )
    scored = (
        F.broadcast(qterms)
        .join(tfq, "term")
        .join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(contrib) + F.lit(1e-12), 6).alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def rocchio_prf_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    fb_docs: int = 3,
    fb_terms: int = 2,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Pseudo-relevance-feedback retrieval (Rocchio 1971 as practiced
    in the BM25 era — Robertson's offer-weight term selection): run
    BM25, assume the top ``fb_docs`` hits are relevant, pick the
    ``fb_terms`` strongest NEW terms from them (by summed tf·idf over
    the feedback docs, the offer-weight shape), append those to the
    query's term set, and re-rank with the SAME scoring tables — the
    two-pass query expansion every Lucene/Terrier deployment ships as
    `rm3`-lite. Returns pass-2's (query_id, doc_id, bm25, rank).

    Determinism: expansion weights are 6-dp nudge-rounded sums of
    integer-tf × idf terms and selected with (weight DESC, term ASC)
    tiebreaks; both passes are the deterministic ``bm25_topk`` stage,
    so the whole pipeline replays exactly in SQL.

    Shape at scale: the corpus is tokenized ONCE — tf (checkpointed),
    dl, and the stats scalar feed both passes (the refactor the shared
    ``_bm25_rank`` stage exists for). Pass-1 extras: the feedback list
    is panel-sized (Q × fb_docs) and broadcast against tf on doc_id;
    candidate df restricts tf by the feedback vocabulary (term-keyed,
    same trick as query vocab); the expansion pick is a window over
    panel-sized (query, term) rows. Pass 2 re-enters ``_bm25_rank``
    with at most (original + fb_terms) terms per query."""
    if fb_docs <= 0 or fb_terms <= 0:
        raise ValueError(
            f"need fb_docs >= 1 and fb_terms >= 1, got {fb_docs}, {fb_terms}"
        )
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = (
        docs.agg(F.count(F.lit(1)).alias("__n"))
        .crossJoin(tf.agg(F.coalesce(F.sum("tf"), F.lit(0)).alias("__tok")))
    )
    qt0 = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(
            F.array_distinct(ws_tokens(F.lower(F.col(query_text_col))))
        ).alias("term"),
    )
    fb = _bm25_rank(tf, dl, stats, qt0, fb_docs, k1, b).select(
        "query_id", "doc_id"
    )
    cand = F.broadcast(fb).join(tf, "doc_id")
    dfc = tf.join(
        F.broadcast(cand.select("term").distinct()), "term"
    ).groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = F.col("__n").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (n - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    weighted = (
        cand.join(F.broadcast(dfc), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "term")
        .agg(
            F.round(F.sum(F.col("tf") * idf) + F.lit(1e-12), 6).alias("__w")
        )
    )
    w_pick = Window.partitionBy("query_id").orderBy(
        F.col("__w").desc(), F.col("term").asc()
    )
    expansion = (
        weighted.join(qt0, ["query_id", "term"], "left_anti")
        .withColumn("__r", F.row_number().over(w_pick))
        .filter(F.col("__r") <= fb_terms)
        .select("query_id", "term")
    )
    qt1 = qt0.unionByName(expansion).distinct()
    return _bm25_rank(tf, dl, stats, qt1, k, k1, b)


def lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Corpus-trained bigram-LM quality score (the CCNet-style
    perplexity filter): per doc, the mean negative log-likelihood of its
    word bigrams under an add-k-smoothed bigram model trained on the
    whole corpus. Lower = more typical of the corpus; high-NLL docs are
    the gibberish/outlier candidates. Returns (id, n_bigrams, nll) for
    docs with >= 1 bigram.

    p(w2|w1) = (c(w1,w2) + k) / (c(w1) + k*V), V = unigram vocab size.

    Shape at scale: bigram expansion is a linear in-row transform
    (two-arg lambda uses the element INDEX to pair w[i] with w[i+1] —
    no self-join); both count tables partial-aggregate map-side; the
    unigram count folds into the bigram table with a vocab-keyed join
    before the corpus-sized occurrence join, so the big join happens
    once, on the bigram key; V rides a broadcast 1-row crossJoin. The
    per-doc mean sums ~1-10-magnitude logs, so cross-engine FP
    accumulation noise sits ~1e-15 relative — far under the 6-dp
    rounding."""
    if k <= 0:
        raise ValueError(f"smoothing k must be positive, got {k}")
    scored = _bigram_nll(df, text_col, id_col, k)
    return scored.groupBy(id_col).agg(
        F.sum("nb").alias("n_bigrams"),
        F.round(F.sum(F.col("nb") * F.col("__nll")) / F.sum("nb"), 6).alias("nll"),
    )


def _bigram_nll(
    df: DataFrame, text_col: str, id_col: str, k: float
) -> DataFrame:
    """The shared bigram-LM core of ``lm_score`` and ``min_k_prob``:
    per distinct in-doc bigram, (id, w1, w2, nb, __nll) where nb is the
    in-doc occurrence count and __nll the add-k-smoothed corpus NLL.
    Shape notes live on ``lm_score``."""
    toks = ws_tokens(F.lower(F.col(text_col)))
    staged = df.select(F.col(id_col), toks.alias("__t")).filter(F.size("__t") >= 2)
    pairs = staged.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.slice(F.col("__t"), 1, F.size("__t") - 1),
                lambda w, i: F.struct(
                    w.alias("w1"),
                    F.element_at(F.col("__t"), (i + F.lit(2)).cast("int")).alias("w2"),
                ),
            )
        ).alias("__bg"),
    ).select(F.col(id_col), F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))

    # per-doc bigram counts are the shared intermediate for all four
    # downstream branches (c2, c1, vocab, scoring); checkpoint once or
    # every branch re-scans and re-explodes the corpus (the
    # triangle-count lesson, graph.py). pc is also strictly smaller
    # than the raw pair stream — repeated in-doc bigrams collapse.
    pc = (
        pairs.groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("nb"))
        .localCheckpoint(eager=False)
    )
    # corpus bigram counts, checkpointed: c1 and the vocab are derived
    # from c2 rather than re-aggregating pc — sum-of-sums over longs is
    # exact, the (w1,w2)-distinct frame is strictly smaller than the
    # per-doc-distinct pc wherever bigrams repeat across docs (the whole
    # point of a corpus LM), and pc's cache is read 2x instead of 4x
    # (guide §2.3: aggregate before you shuffle / shuffle fewer bytes)
    c2 = (
        pc.groupBy("w1", "w2")
        .agg(F.sum("nb").alias("c2"))
        .localCheckpoint(eager=False)
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = c2.select(F.col("w1").alias("w")).unionAll(
        c2.select(F.col("w2").alias("w"))
    )
    v = vocab.agg(F.count_distinct(F.col("w")).cast("double").alias("__v"))
    model = c2.join(c1, "w1").crossJoin(F.broadcast(v))
    return pc.join(model, ["w1", "w2"]).select(
        F.col(id_col),
        F.col("w1"),
        F.col("w2"),
        F.col("nb"),
        (
            -F.log((F.col("c2") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.col("__v")))
        ).alias("__nll"),
    )


def min_k_prob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_frac: float = 0.2,
    smoothing_k: float = 0.5,
) -> DataFrame:
    """Min-K%-prob memorization/membership audit (Shi et al. 2023,
    "Detecting Pretraining Data from Large Language Models"): per doc,
    the mean NLL of the ``k_frac`` fraction of its bigram occurrences
    the corpus LM finds LEAST likely. The intuition: a genuinely novel
    document has at least a few surprising token transitions, so its
    worst-k% NLL is high; a document the model (here: the corpus
    bigram LM — the same model ``lm_score`` trains) has effectively
    absorbed scores high probability even on its least-likely spans,
    so a LOW ``mink_nll`` flags memorized/templated/boilerplate
    content that a whole-doc mean would average away. Use it as the
    release-audit companion to ``decontamination_report``: rank docs
    ascending and eyeball the head.

    Selection is occurrence-weighted and grid-deterministic: distinct
    in-doc bigrams order by (round(NLL, 6) DESC, w1, w2); the top
    m = max(1, ceil(round(k_frac · n, 6))) occurrences are averaged
    (the boundary bigram contributes partially), and both the ordering
    key and the averaged values live on the 6-dp grid so the oracle
    replays the pick exactly.

    Shape at scale: the bigram model is ``lm_score``'s (one corpus
    expansion, map-side-combinable count tables, broadcast vocab
    scalar); the min-k pick adds ONE doc-keyed window exchange (both
    windows share the partition key) over the distinct-bigram frame —
    no new corpus scan. Returns (id, n_bigrams, mink_nll) for docs
    with >= 1 bigram.
    """
    if not 0.0 < k_frac <= 1.0:
        raise ValueError(f"k_frac must be in (0, 1], got {k_frac}")
    if smoothing_k <= 0:
        raise ValueError(f"smoothing k must be positive, got {smoothing_k}")
    scored = _bigram_nll(df, text_col, id_col, smoothing_k).withColumn(
        "__nll6", F.round("__nll", 6)
    )
    part = Window.partitionBy(id_col)
    w = Window.partitionBy(id_col).orderBy(
        F.col("__nll6").desc(), F.col("w1"), F.col("w2")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged = (
        scored.withColumn("__n", F.sum("nb").over(part))
        .withColumn(
            "__m",
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.round(F.lit(float(k_frac)) * F.col("__n"), 6)).cast("long"),
            ),
        )
        .withColumn("__cum", F.sum("nb").over(w))
        .withColumn(
            "__take",
            F.least(F.col("nb"), F.col("__m") - (F.col("__cum") - F.col("nb"))),
        )
        .filter(F.col("__take") > 0)
    )
    return staged.groupBy(id_col).agg(
        F.max("__n").alias("n_bigrams"),
        F.round(
            F.sum(F.col("__take") * F.col("__nll6")) / F.max("__m") + F.lit(1e-12),
            6,
        ).alias("mink_nll"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document quality heuristics: length, mean word length, stopword
    ratio, punctuation ratio, and a composite score in [0,1].

    score = 0.4·min(n_tokens/100, 1)            (enough content)
          + 0.3·(1 - |mean_word_len - 5| / 5)   (natural word lengths)
          + 0.2·min(stopword_ratio·5, 1)        (function words present)
          + 0.1·(1 - min(punct_ratio·10, 1))    (not symbol soup)
    """
    # stage tokenization once (see language_id: interpreted HOFs re-run
    # per reference without staging), then derive every ratio from columns
    t = F.col(text_col)
    staged = df.select(
        F.col(id_col),
        t.alias("__t"),
        ws_tokens(F.lower(t)).alias("__toks"),
    )
    tt = F.col("__t")
    toks = F.col("__toks")
    ratios = staged.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        (
            F.length(F.regexp_replace(tt, r"\s+", "")).cast("double")
            / F.greatest(F.size(toks), F.lit(1))
        ).alias("__mean_wl"),
        (
            F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS_EN))).cast("double")
            / F.greatest(F.size(toks), F.lit(1))
        ).alias("__stop_ratio"),
        (
            (F.length(tt) - F.length(F.regexp_replace(tt, r"[^A-Za-z0-9\s]", ""))).cast(
                "double"
            )
            / F.greatest(F.length(tt), F.lit(1))
        ).alias("__punct_ratio"),
    )
    mean_wl, stop_ratio, punct_ratio = (
        F.col("__mean_wl"),
        F.col("__stop_ratio"),
        F.col("__punct_ratio"),
    )
    n_tokens = F.col("n_tokens")
    score = (
        F.least(n_tokens.cast("double") / 100.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(F.abs(mean_wl - 5.0) / 5.0, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.2
        + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.1
    )
    return ratios.select(
        F.col(id_col),
        n_tokens,
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        # +1e-12 before rounding: the weighted composite can land within
        # an ulp of a .5e-6 boundary (observed at sf1: 0.66256249999...),
        # where Spark's BigDecimal HALF_UP and DuckDB's shortest-decimal
        # round disagree by one last digit. The nudge pushes both engines
        # to the same side of the boundary (the oracle applies the same
        # +1e-12); the exact-dyadic ratio columns don't need it.
        F.round(score + F.lit(1e-12), 6).alias("quality"),
    )


def readability(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade level (Flesch 1948;
    Kincaid et al. 1975) — the readability pair quality pipelines bin
    on (e.g. selecting grade-school vs technical prose for curriculum
    mixes), from fully deterministic counting rules so the score is a
    pure function of the bytes:

    - words: whitespace tokens of the lowercased text (``ws_tokens``,
      the corpus-wide convention)
    - sentences: runs of ``[.!?]`` characters, clamped to >= 1 (a
      trailing unterminated sentence rides the last run — a documented
      heuristic, not a parser)
    - syllables: runs of ``[aeiouy]`` per word, minimum 1 per word
      (vowel-group counting — the standard cheap estimator; computed
      as whole-text vowel runs + the count of vowelless words, which
      is identical because runs cannot span whitespace)

    Returns (id, n_words, n_sentences, n_syllables, flesch, fk_grade)
    with ``flesch`` = 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words) and ``fk_grade`` = 0.39·(words/sentences) +
    11.8·(syllables/words) − 15.59, both 6-dp nudge-rounded on the
    identical left-associated IEEE tree in Spark and the SQL oracle;
    NULL for wordless docs. Counts are exact integers.

    Scale shape: a pure per-row Column projection — ZERO exchanges,
    zero UDFs, one corpus scan inside a single WholeStageCodegen span;
    scan-bound and embarrassingly parallel at 100 TB."""
    t = F.lower(F.col(text_col))
    toks = ws_tokens(t)
    n_words = F.size(toks)
    n_sents = F.greatest(
        F.size(F.expr(f"regexp_extract_all(lower({text_col}), '[.!?]+', 0)")),
        F.lit(1),
    )
    vowel_runs = F.size(
        F.expr(f"regexp_extract_all(lower({text_col}), '[aeiouy]+', 0)")
    )
    no_vowel_words = F.size(
        F.filter(toks, lambda w: ~w.rlike("[aeiouy]"))
    )
    n_syll = vowel_runs + no_vowel_words
    wps = n_words.cast("double") / n_sents.cast("double")
    spw = n_syll.cast("double") / n_words.cast("double")
    flesch = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    fk = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    empty = n_words == 0
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        n_sents.cast("long").alias("n_sentences"),
        n_syll.cast("long").alias("n_syllables"),
        F.round(
            F.when(~empty, flesch) + F.lit(1e-12), 6
        ).alias("flesch"),
        F.round(F.when(~empty, fk) + F.lit(1e-12), 6).alias("fk_grade"),
    )


# Gopher's rule 8 stop-word list (Rae et al. 2021, appendix A1.1):
# a doc must contain at least two of these to pass the filter.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# line prefixes the bullet-ratio rule counts as bullet starts
BULLET_PREFIXES = ["- ", "* ", "• "]


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_ratio: float = 0.9,
    max_ellipsis_line_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    stop_words: list[str] | None = None,
    min_stop_words: int = 2,
) -> DataFrame:
    """The Gopher/MassiveText rule-table quality filter (Rae et al.
    2021, appendix A1.1) — the published rule set most large text
    pipelines start from, as an explicit per-rule flag table rather
    than quality_score's blended composite:

    1. word count in [min_words, max_words] (paper: 50..100,000)
    2. mean word length in [min_mean_word_len, max_mean_word_len]
       (paper: 3..10 chars)
    3. symbol-to-word ratio (``#`` or ``...`` occurrences per word)
       <= max_symbol_word_ratio (paper: 0.1)
    4. fraction of lines starting with a bullet <= max_bullet_line_ratio
       (paper rejects >90% bulleted)
    5. fraction of lines ending in ``...`` <= max_ellipsis_line_ratio
       (paper rejects >30%)
    6. fraction of words containing an alphabetic character
       >= min_alpha_word_ratio (paper: 0.8)
    7. at least ``min_stop_words`` DISTINCT words from ``stop_words``
       present (paper: 2 of the/be/to/of/and/that/have/with)

    Returns one row per doc: the measured statistics (ratios
    nudge-rounded to 6 dp), one boolean per rule, and ``keep`` = AND of
    all rules. Keeping the flags separate is what makes the table
    auditable — a pipeline reports per-rule rejection rates, not just
    a pass count (the MassiveText ablation tables are exactly this).

    Scale shape: a pure per-row Column projection — ZERO exchanges,
    zero UDFs, one corpus scan inside a single WholeStageCodegen span.
    At 100 TB this is scan-bound and embarrassingly parallel; filters
    on ``keep`` compose with predicate pushdown on any upstream
    partition columns. Every rule flag is derived from the ALREADY
    6-dp-ROUNDED ratio column, so the booleans are bit-reproducible in
    the DuckDB oracle (no raw-double boundary comparisons).

    Ellipsis/`#` counts use non-overlapping literal replace arithmetic
    (`(len(s) - len(replace(s, m, ''))) / len(m)`), identical in Spark
    and ANSI SQL.
    """
    if min_words < 0 or max_words < min_words:
        raise ValueError(f"need 0 <= min_words <= max_words, got {min_words}, {max_words}")
    if min_stop_words < 0:
        raise ValueError(f"min_stop_words must be >= 0, got {min_stop_words}")
    stops = list(GOPHER_STOPWORDS if stop_words is None else stop_words)
    t = F.col(text_col)
    staged = df.select(
        F.col(id_col),
        t.alias("__t"),
        ws_tokens(t).alias("__toks"),
        F.split(t, "\n", -1).alias("__lines"),
    )
    tt, toks, lines = F.col("__t"), F.col("__toks"), F.col("__lines")
    nw = F.size(toks)
    nw_d = F.greatest(nw, F.lit(1)).cast("double")
    nl_d = F.greatest(F.size(lines), F.lit(1)).cast("double")
    n_hash = F.length(tt) - F.length(F.replace(tt, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(tt) - F.length(F.replace(tt, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    bullet_starts = F.size(
        F.filter(
            lines,
            lambda l: reduce(
                lambda a, b: a | b,
                [l.startswith(p) for p in BULLET_PREFIXES],
            ),
        )
    )
    ellipsis_ends = F.size(F.filter(lines, lambda l: l.endswith("...")))
    alpha_words = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(toks, F.lower)),
            F.array(*[F.lit(s) for s in stops]),
        )
    )
    measured = staged.select(
        F.col(id_col),
        nw.cast("long").alias("n_words"),
        F.round(
            F.length(F.regexp_replace(tt, r"\s+", "")).cast("double") / nw_d
            + F.lit(1e-12),
            6,
        ).alias("mean_word_len"),
        F.round((n_hash + n_ellipsis) / nw_d + F.lit(1e-12), 6).alias(
            "symbol_word_ratio"
        ),
        F.round(bullet_starts / nl_d + F.lit(1e-12), 6).alias("bullet_line_ratio"),
        F.round(ellipsis_ends / nl_d + F.lit(1e-12), 6).alias("ellipsis_line_ratio"),
        F.round(alpha_words / nw_d + F.lit(1e-12), 6).alias("alpha_word_ratio"),
        n_stop.cast("long").alias("n_stop_words"),
    )
    flags = measured.select(
        "*",
        F.col("n_words").between(min_words, max_words).alias("pass_word_count"),
        F.col("mean_word_len")
        .between(min_mean_word_len, max_mean_word_len)
        .alias("pass_mean_word_len"),
        (F.col("symbol_word_ratio") <= max_symbol_word_ratio).alias(
            "pass_symbol_ratio"
        ),
        (F.col("bullet_line_ratio") <= max_bullet_line_ratio).alias(
            "pass_bullet_lines"
        ),
        (F.col("ellipsis_line_ratio") <= max_ellipsis_line_ratio).alias(
            "pass_ellipsis_lines"
        ),
        (F.col("alpha_word_ratio") >= min_alpha_word_ratio).alias("pass_alpha_words"),
        (F.col("n_stop_words") >= min_stop_words).alias("pass_stop_words"),
    )
    rule_cols = [c for c in flags.columns if c.startswith("pass_")]
    keep = reduce(lambda a, b: a & b, [F.col(c) for c in rule_cols])
    return flags.select("*", keep.alias("keep"))


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Intra-document repetition signals (the Gopher/C4 quality filters):
    per doc, the total and distinct word n-gram counts, the duplicate
    n-gram fraction (1 − distinct/total), and the fraction of n-gram
    slots taken by the single most frequent n-gram. Template-generated
    and boilerplate-heavy text scores high on both; a training pipeline
    thresholds them before the corpus reaches a model.

    Scale shape: n-grams are built columnar (no shuffle), then ONE
    explode + two groupBys keyed by doc_id — map-side partial aggregation
    does the heavy lifting and the shuffle carries (doc_id, gram hash)
    pairs. No per-row interpreted quadratic work (an array-level
    mode-count would be O(distinct·total) per row)."""
    toks = ws_tokens(F.lower(F.col(text_col)))
    staged = df.select(F.col(id_col), toks.alias("__toks"))
    grams = F.when(
        F.size("__toks") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("__toks") - n + 1),
            lambda i: F.concat_ws(" ", F.slice("__toks", i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = staged.select(F.col(id_col), F.explode_outer(grams).alias("__g"))
    per_gram = g.groupBy(id_col, "__g").agg(F.count(F.lit(1)).alias("__c"))
    agg = per_gram.groupBy(id_col).agg(
        F.sum(F.when(F.col("__g").isNotNull(), F.col("__c")).otherwise(0)).alias(
            "n_ngrams"
        ),
        F.count(F.when(F.col("__g").isNotNull(), 1)).alias("n_distinct"),
        F.max(F.when(F.col("__g").isNotNull(), F.col("__c")).otherwise(0)).alias(
            "top_count"
        ),
    )
    denom = F.greatest(F.col("n_ngrams"), F.lit(1)).cast("double")
    return agg.select(
        F.col(id_col),
        F.col("n_ngrams").cast("long").alias("n_ngrams"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("top_count").cast("long").alias("top_count"),
        F.round((F.col("n_ngrams") - F.col("n_distinct")) / denom, 6).alias(
            "dup_ngram_frac"
        ),
        F.round(F.col("top_count") / denom, 6).alias("top_ngram_frac"),
    )


def boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    min_doc_frac: float = 0.5,
    min_line_chars: int = 3,
) -> DataFrame:
    """Cross-document boilerplate detection: a line is boilerplate for a
    source when it appears (trimmed, exact) in at least ``min_doc_frac``
    of that source's documents — the header/footer/nav chrome a crawler
    stamps onto every page of a site. Returns
    (source, line, n_docs_with_line, doc_frac).

    Scale shape: per-doc DISTINCT lines are built columnar (array ops, no
    shuffle), then ONE explode + groupBy (source, line) with map-side
    partial counts; per-source totals are a tiny broadcast join. The
    output is bounded by lines that clear the frequency threshold — a
    small table by construction, safe to broadcast into the strip join."""
    lines = df.select(
        F.col(source_col),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
                    lambda l: F.length(l) >= min_line_chars,
                )
            )
        ).alias("line"),
    )
    freq = lines.groupBy(source_col, "line").agg(
        F.count(F.lit(1)).alias("n_docs_with_line")
    )
    totals = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n_docs"))
    return (
        freq.join(F.broadcast(totals), source_col)
        .withColumn(
            "doc_frac", F.round(F.col("n_docs_with_line") / F.col("__n_docs"), 6)
        )
        .filter(F.col("doc_frac") >= min_doc_frac)
        .select(source_col, "line", "n_docs_with_line", "doc_frac")
    )


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    min_doc_frac: float = 0.5,
    min_line_chars: int = 3,
    boiler: DataFrame | None = None,
) -> DataFrame:
    """Remove per-source boilerplate lines (see boilerplate_lines) and
    reassemble each document in original line order. Returns
    (id, n_lines, n_removed, clean_text). Documents whose every line is
    boilerplate drop out of the result (nothing left to keep).

    Scale shape: one posexplode of the corpus, one broadcast ANTI join
    against the (small, threshold-bounded) boilerplate set, one
    groupBy(id) to reassemble — the only corpus-sized shuffle is the
    reassembly, keyed by the id the downstream pipeline partitions on
    anyway. Pass a precomputed ``boiler`` to detect on one corpus slice
    and strip another (e.g. detect on a sample at 100 TB)."""
    if boiler is None:
        boiler = boilerplate_lines(
            df,
            text_col=text_col,
            source_col=source_col,
            min_doc_frac=min_doc_frac,
            min_line_chars=min_line_chars,
        )
    parts = F.split(F.col(text_col), "\n")
    staged = df.select(
        F.col(id_col),
        F.col(source_col),
        F.size(parts).alias("__n_lines"),
        F.posexplode(parts).alias("__pos", "__line"),
    )
    b = boiler.select(
        F.col(source_col).alias("__bsrc"), F.col("line").alias("__bline")
    )
    kept = staged.join(
        F.broadcast(b),
        (F.col(source_col) == F.col("__bsrc"))
        & (F.trim(F.col("__line")) == F.col("__bline")),
        "left_anti",
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.max("__n_lines").alias("__n_lines"),
            F.count(F.lit(1)).cast("int").alias("__n_kept"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                    lambda s: s["__line"],
                ),
            ).alias("clean_text"),
        )
        .select(
            F.col(id_col),
            F.col("__n_lines").cast("int").alias("n_lines"),
            (F.col("__n_lines") - F.col("__n_kept")).cast("int").alias("n_removed"),
            "clean_text",
        )
    )


def line_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 20,
    min_tokens: int = 3,
    max_digit_frac: float = 0.5,
) -> DataFrame:
    """Per-line quality filter (the C4-style line pass): keep a line only
    if, after trimming, it is long enough, has enough whitespace tokens,
    and is not digit soup. Returns (id, n_lines, n_kept, kept_frac,
    clean_text) with the surviving lines rejoined in order.

    Zero-exchange: the line split, per-line predicate, and reassembly are
    all array Column expressions inside one projection — no explode, no
    shuffle, the whole pass rides the parquet scan. The filtered array is
    staged once (interpreted HOFs get no subexpression elimination — see
    language_id)."""

    def _keep(l: Column) -> Column:
        t = F.trim(l)
        n_tok = F.size(F.filter(F.split(t, r"\s+"), lambda w: F.length(w) > 0))
        digits = F.length(t) - F.length(F.regexp_replace(t, "[0-9]", ""))
        return (
            (F.length(t) >= min_chars)
            & (n_tok >= min_tokens)
            & (
                digits.cast("double") / F.greatest(F.length(t), F.lit(1))
                <= max_digit_frac
            )
        )

    staged = df.select(
        F.col(id_col),
        F.split(F.col(text_col), "\n").alias("__parts"),
    ).select(
        F.col(id_col),
        F.size("__parts").alias("__n_lines"),
        F.filter(F.col("__parts"), _keep).alias("__kept"),
    )
    return staged.select(
        F.col(id_col),
        F.col("__n_lines").cast("int").alias("n_lines"),
        F.size("__kept").cast("int").alias("n_kept"),
        F.round(
            F.size("__kept") / F.greatest(F.col("__n_lines"), F.lit(1)), 6
        ).alias("kept_frac"),
        F.concat_ws("\n", F.col("__kept")).alias("clean_text"),
    )


# PII patterns kept to syntax both java.util.regex and RE2 (the duckdb
# oracle) agree on: character classes, bounded repetition, \b anchors.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# redaction order matters: emails first (their local part may contain
# digit runs), then SSN before phone (both are dashed digit groups —
# the groupings are disjoint, but fixed order keeps the output
# deterministic if a pattern ever widens), IPs last
_PII_REDACTIONS: list[tuple[str, str]] = [
    (PII_EMAIL_RE, "<EMAIL>"),
    (PII_SSN_RE, "<SSN>"),
    (PII_PHONE_RE, "<PHONE>"),
    (PII_IP_RE, "<IP>"),
]


def pii_scan(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII pattern scan + redaction: per document, match counts for
    email / SSN-shaped / US-phone-shaped / IPv4-shaped substrings, a
    has_pii flag, and the text with every match replaced by a typed
    placeholder. Returns (id, n_emails, n_ssns, n_phones, n_ips,
    has_pii, redacted_text).

    Pure Column expressions (JVM regex, whole-stage codegen, no UDF,
    no shuffle) — a single-pass scan at any corpus size. These are
    pattern heuristics, not validators: 999-99-9999 counts as an SSN
    shape, 999.999.999.999 as an IPv4 shape; a training pipeline wants
    the conservative over-match before deciding to drop or redact."""
    t = F.col(text_col)

    def _n(pat: str) -> Column:
        return F.size(F.regexp_extract_all(t, F.lit(pat), 0))

    red = t
    for pat, token in _PII_REDACTIONS:
        red = F.regexp_replace(red, pat, token)
    counts = {
        "n_emails": _n(PII_EMAIL_RE),
        "n_ssns": _n(PII_SSN_RE),
        "n_phones": _n(PII_PHONE_RE),
        "n_ips": _n(PII_IP_RE),
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *[c.cast("int").alias(name) for name, c in counts.items()],
        (total > 0).alias("has_pii"),
        red.alias("redacted_text"),
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_para_chars: int = 1,
) -> DataFrame:
    """Cross-corpus paragraph-level deduplication (the C4/RefinedWeb
    pass that whole-document dedup misses): a paragraph occurrence is
    kept only if it is the FIRST occurrence corpus-wide, ordered by
    (id, position) — every later repetition of the same (trimmed)
    paragraph is removed from its document. Returns
    (id, n_paras, n_removed, clean_text) with survivors rejoined in
    original order; documents whose every paragraph was seen before
    drop out.

    Scale shape: one posexplode, then first-occurrence election as a
    row_number over ONE window exchange keyed by the paragraph hash (no
    groupBy+join-back — the same one-exchange discipline as the graph
    loops), then the reassembly groupBy on id. The shuffle carries
    (hash, id, pos) plus the paragraph once; no driver-side state. Skew:
    a pathologically hot paragraph concentrates its occurrences on one
    reducer, but the window computes row_number only — AQE skew
    handling applies and no candidate pairs are materialized."""
    from pyspark.sql import Window

    parts = F.split(F.col(text_col), sep)
    staged = df.select(
        F.col(id_col),
        F.size(parts).alias("__n_paras"),
        F.posexplode(parts).alias("__pos", "__para"),
    ).withColumn("__ph", F.md5(F.trim(F.col("__para"))))
    w = Window.partitionBy("__ph").orderBy(id_col, "__pos")
    ranked = staged.withColumn("__rn", F.row_number().over(w))
    kept = ranked.filter(
        (F.col("__rn") == 1) | (F.length(F.trim("__para")) < min_para_chars)
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.max("__n_paras").alias("__n_paras"),
            F.count(F.lit(1)).cast("int").alias("__n_kept"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__para"))),
                    lambda s: s["__para"],
                ),
            ).alias("clean_text"),
        )
        .select(
            F.col(id_col),
            F.col("__n_paras").cast("int").alias("n_paras"),
            (F.col("__n_paras") - F.col("__n_kept")).cast("int").alias("n_removed"),
            "clean_text",
        )
    )


def unicode_normalize(
    df: DataFrame,
    form: str = "NFC",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unicode normalization (default NFC) — the canonicalization step
    before dedup/hashing so 'e'+COMBINING ACUTE and the precomposed
    e-acute stop being different documents. Returns
    (id, normalized, changed).

    Python is genuinely required (Spark SQL has no normalization
    builtin), so this is an Arrow-batched pandas_udf over
    ``unicodedata.normalize`` — one narrow map stage, no shuffle, the
    same discipline as the multimodal decoders. Normalization semantics
    are Unicode-standard-defined, so an independent engine
    (DuckDB ``nfc_normalize``, utf8proc) reproduces outputs
    byte-exactly — the oracle hook."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form: {form}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(texts: pd.Series) -> pd.Series:
        import unicodedata

        return texts.map(
            lambda t: unicodedata.normalize(form, t) if t is not None else None
        )

    out = df.select(F.col(id_col), F.col(text_col), _norm(F.col(text_col)).alias("normalized"))
    return out.select(
        F.col(id_col),
        "normalized",
        (F.col(text_col) != F.col("normalized")).cast("int").alias("changed"),
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprint: md5 of normalized text (see
    pipeline/common.normalize_text) — stable under case/punct/ws noise."""
    return df.select(
        F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer-Wilkerson-Aiken, SIGMOD'03 — the
    MOSS rolling-hash selection): normalized text → char k-gram hashes →
    minimum of each sliding ``window`` of hashes → distinct set, exploded
    to (doc_id, fingerprint) rows. Guarantee: two documents sharing any
    substring of length ≥ window + k − 1 share at least one fingerprint,
    so a plain equality join on ``fingerprint`` finds partial overlaps
    that whole-document hashing (doc_fingerprint) misses.

    Vectorized relational formulation: the "rolling" is positional — a
    sequence of substring hashes and per-window array minima, all
    JVM-side Column expressions (no UDF); the density bound (≈ 2/(w+1)
    of positions selected) keeps output a small multiple of input. At
    100 TB the fingerprint table is the join key for cross-corpus
    overlap: shuffle carries (doc_id, fingerprint) longs only. Docs
    shorter than k characters produce no k-grams and are dropped; docs
    with fewer than ``window`` k-grams yield one fingerprint (the min)."""
    norm = normalize_text(F.col(text_col))
    # stage 1: normalized text + k-gram hash array (staged so the window
    # minima below reference a materialized column, not a re-inlined
    # expression per window — the same discipline as minhash's stages)
    n_grams = F.length(F.col("__t")) - F.lit(k) + 1
    hashed = (
        df.select(F.col(id_col), norm.alias("__t"))
        .filter(F.length("__t") >= k)
        .select(
            F.col(id_col),
            F.transform(
                F.sequence(F.lit(1), n_grams),
                lambda i: h60(F.substr(F.col("__t"), i, F.lit(k))),
            ).alias("__h"),
        )
    )
    n_h = F.size(F.col("__h"))
    wins = F.transform(
        F.sequence(F.lit(1), F.greatest(n_h - F.lit(window) + 1, F.lit(1))),
        # slice truncates at the array end, so the tail windows of short
        # docs cover what exists
        lambda j: F.array_min(F.slice(F.col("__h"), j, window)),
    )
    return hashed.select(
        F.col(id_col), F.explode(F.array_distinct(wins)).alias("fingerprint")
    )


def feature_hashing(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Feature hashing (the HashingTF / hashing-trick featurizer,
    Weinberger et al. 2009): each lowercased whitespace token maps to
    bucket ``h60(token) % n_buckets`` and per-document bucket counts
    form the sparse term-frequency vector — the fixed-width,
    vocabulary-free text representation classic large-scale ML trains
    on. Colliding tokens legitimately merge counts; that is the trick,
    not a defect.

    Emitted sparse (one row per non-zero bucket), never as a map/array
    column: rows are deterministic, oracle-comparable, and at 100 TB
    the explode + one map-side-combinable groupBy on (id, bucket) is
    the whole plan — no vocabulary broadcast, no global state, width
    fixed regardless of corpus size. Returns
    ``(id, bucket, n_tokens)``."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    return (
        df.select(
            F.col(id_col),
            F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("__tok"),
        )
        .select(
            id_col,
            F.pmod(h60(F.col("__tok")), F.lit(n_buckets)).cast("int").alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
    )


def hash_embedding(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    dim: int = 64,
) -> DataFrame:
    """Cheap deterministic text embeddings: feature hashing composed
    with a ±1 sign random projection (the hashing-trick +
    random-projection pipeline — vocabulary-free, model-free document
    vectors good enough for clustering / blocking / near-dup candidate
    generation at corpus scale). Component d of a document =
    Σ_buckets count(bucket) · sign(h60(d:bucket)), L2-normalized.

    Exactness by construction: the pre-normalization components are
    INTEGER sums (counts × ±1) — order-independent, so the distributed
    aggregation and any sequential oracle agree bit-for-bit; the only
    FP ops are the final norm division and 6 dp round. Emitted exploded
    as ``(id, dim, value)`` rows (deterministic, oracle-comparable;
    pivot to an array column downstream if a dense vector is wanted).

    Scale: one explode to (id, bucket) counts, one ``dim``-way in-row
    fan-out of the nonzero buckets, one map-side-combinable groupBy on
    (id, dim), one window for the norm — rows moved =
    nonzero-buckets × dim, never corpus × vocabulary."""
    from pyspark.sql import Window

    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    counts = feature_hashing(df, text_col, id_col, n_buckets)
    sgn = F.lit(1) - F.lit(2) * F.pmod(
        h60(
            F.concat(
                F.col("dim").cast("string"), F.lit(":"), F.col("bucket").cast("string")
            )
        ),
        F.lit(2),
    )
    comp = (
        counts.withColumn("dim", F.explode(F.sequence(F.lit(0), F.lit(dim - 1))))
        .withColumn("__t", F.col("n_tokens") * sgn)
        .groupBy(id_col, "dim")
        .agg(F.sum("__t").alias("__c"))
    )
    norm = F.sqrt(F.sum(F.col("__c") * F.col("__c")).over(Window.partitionBy(id_col)))
    return comp.select(
        id_col,
        "dim",
        F.round(
            F.when(norm > 0, F.col("__c").cast("double") / norm).otherwise(0.0), 6
        ).alias("value"),
    )


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    k: int = 1000,
) -> DataFrame:
    """Corpus vocabulary construction (the tokenizer-training counting
    pass): lowercased whitespace tokens ranked by global frequency,
    floored at ``min_count``, truncated to the top ``k`` under the TOTAL
    order (count desc, token asc) so the rank-k boundary is
    deterministic. Returns (rank, token, n_occurrences).

    One explode + one map-side-combinable groupBy; the top-k runs as
    TakeOrderedAndProject (per-partition heads merged on the driver),
    never a full global sort — the same pattern at 100 TB yields a
    k-bounded result regardless of vocabulary size.
    """
    from pyspark.sql import Window

    if min_count < 1 or k <= 0:
        raise ValueError(f"need min_count >= 1 and k > 0, got {min_count}, {k}")
    counts = (
        df.select(F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
        .orderBy(F.col("n_occurrences").desc(), F.col("token"))
        .limit(k)
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token"))
    return counts.select(
        F.row_number().over(w).alias("rank"), "token", "n_occurrences"
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """RAG-style document chunking: overlapping token windows of
    ``chunk_tokens`` with stride ``chunk_tokens - overlap``. Start
    positions are 1 + k*stride for k in [0, ceil(max(len - chunk, 0) /
    stride)] — pure integer arithmetic, so both engines enumerate the
    identical chunk set; the final chunk is the (possibly short) tail.
    Returns (id, chunk_idx, start_tok, n_tokens, chunk_text).

    In-row windowing (sequence + slice + posexplode): zero shuffles,
    fan-out ~len/stride rows per doc — the narrow transform you want
    before embedding 100 TB of documents.
    """
    if chunk_tokens <= 0 or not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need chunk_tokens > 0 and 0 <= overlap < chunk_tokens, "
            f"got {chunk_tokens}, {overlap}"
        )
    stride = chunk_tokens - overlap
    toks = ws_tokens(F.col(text_col))
    n = F.size("__t")
    n_extra = F.floor(
        (F.greatest(n - chunk_tokens, F.lit(0)) + stride - 1) / stride
    ).cast("int")
    starts = F.transform(
        F.sequence(F.lit(0), n_extra), lambda k: F.lit(1) + k * stride
    )
    chunk = F.slice("__t", F.col("start_tok"), chunk_tokens)
    return (
        df.select(F.col(id_col), toks.alias("__t"))
        .filter(F.size("__t") > 0)
        .select(id_col, "__t", F.posexplode(starts).alias("chunk_idx", "start_tok"))
        .select(
            id_col,
            "chunk_idx",
            "start_tok",
            F.size(chunk).alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


def cooccurrence(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_terms: int = 50,
    k: int = 100,
) -> DataFrame:
    """Token co-occurrence mining with PMI over the document corpus:
    restrict to the ``top_terms`` highest-document-frequency tokens
    (the blocking step — pair fan-out is bounded by C(top_terms, 2) per
    doc, never vocabulary^2), expand each doc's surviving token set to
    ordered pairs IN-ROW, count pairs corpus-wide, and score
    pmi = ln(n_ab * N / (n_a * n_b)). Returns the top ``k`` pairs under
    the total (count desc, ta, tb) order:
    (ta, tb, n_ab, pmi).

    The oracle deliberately uses the naive (doc,token) self-join
    formulation — agreement checks the in-row expansion against an
    independent shape."""
    from pyspark.sql import Window

    if top_terms <= 0 or k <= 0:
        raise ValueError(f"need top_terms > 0 and k > 0, got {top_terms}, {k}")
    toks = F.array_distinct(ws_tokens(F.lower(F.col(text_col))))
    exploded = df.select(F.col(id_col), F.explode(toks).alias("token"))
    docfreq = exploded.groupBy("token").agg(F.count(F.lit(1)).alias("n_docs"))
    vocab = (
        docfreq.orderBy(F.col("n_docs").desc(), F.col("token")).limit(top_terms)
    )
    kept = exploded.join(F.broadcast(vocab.select("token")), "token")
    per_doc = kept.groupBy(id_col).agg(
        F.array_sort(F.collect_list("token")).alias("__t")
    )
    pairs_arr = F.flatten(
        F.transform(
            F.col("__t"),
            lambda a, i: F.transform(
                F.slice(F.col("__t"), i + 2, F.size("__t")),
                lambda b: F.struct(a.alias("ta"), b.alias("tb")),
            ),
        )
    )
    pair_counts = (
        per_doc.select(F.explode(pairs_arr).alias("__p"))
        .groupBy(F.col("__p.ta").alias("ta"), F.col("__p.tb").alias("tb"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    n_total = df.agg(F.count(F.lit(1)).alias("__N"))
    scored = (
        pair_counts.join(
            F.broadcast(vocab.select(F.col("token").alias("ta"), F.col("n_docs").alias("__na"))),
            "ta",
        )
        .join(
            F.broadcast(vocab.select(F.col("token").alias("tb"), F.col("n_docs").alias("__nb"))),
            "tb",
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            "ta",
            "tb",
            "n_ab",
            F.round(
                F.log(F.col("n_ab") * F.col("__N") / (F.col("__na") * F.col("__nb"))),
                6,
            ).alias("pmi"),
        )
    )
    # global top-k as TakeOrderedAndProject (per-task k-heaps, driver
    # merge) — a partition-less rank window would funnel every scored
    # pair through one partition (no group-limit inference without a
    # real partition key; pinned in tests/test_plan_shape.py)
    return scored.orderBy(F.col("n_ab").desc(), "ta", "tb").limit(k)


def _merge_pair_col(arr: Column, a: str, b: str, ab: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) inside a
    symbol array — the BPE apply step as one aggregate fold (the
    replace-last trick: overlapping runs resolve exactly like the
    sequential scan)."""
    return F.aggregate(
        arr,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == a)
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    end_of_word: str = "</w>",
) -> tuple[list, DataFrame]:
    """Train byte-pair-encoding merges on the corpus (Sennrich et al.
    2016, the LLM tokenizer-training loop) distributed: the corpus
    collapses ONCE to a (word, freq) table — all later work is
    vocabulary-sized, not corpus-sized — then each round counts
    adjacent symbol pairs in-row (weighted by word frequency), picks
    the global argmax under the total (count desc, pair) order, and
    applies the merge with a columnar fold. Driver state is ONE row per
    round (the winning pair) — the legitimate bounded collect, same
    discipline as the IVF centroid pull.

    Returns (merges, vocab_df): ``merges`` is [(left, right)] in rank
    order; ``vocab_df`` is the final (word, freq, symbols) table.
    Deterministic: ties at the argmax break lexicographically, so
    re-runs and the sequential reference agree exactly (tested)."""
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    words = (
        df.select(F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "word",
            "freq",
            F.concat(
                F.split(F.col("word"), ""), F.array(F.lit(end_of_word))
            ).alias("symbols"),
        )
        # r13 optimization: LAZY checkpoints throughout the merge loop —
        # each round's argmax collect materializes (and caches) the
        # pending state inside its own job, fusing the previous round's
        # merge application into this round's pair count. The former
        # eager=True ran a separate materialization job per round: 2
        # full vocab passes per merge instead of 1 (and a final
        # merge-apply pass even when the caller only wants ``merges``).
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_arr = F.transform(
            F.sequence(F.lit(1), F.size("symbols") - 1),
            lambda i: F.struct(
                F.element_at("symbols", i).alias("a"),
                F.element_at("symbols", i + 1).alias("b"),
            ),
        )
        top = (
            words.filter(F.size("symbols") >= 2)
            .select("freq", F.explode(pair_arr).alias("__p"))
            .groupBy(F.col("__p.a").alias("a"), F.col("__p.b").alias("b"))
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        words = words.withColumn(
            "symbols", _merge_pair_col(F.col("symbols"), a, b, a + b)
        ).localCheckpoint(eager=False)
    return merges, words


def bpe_encode(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    end_of_word: str = "</w>",
) -> DataFrame:
    """Apply a learned BPE merge table and count per-doc tokens.
    Returns (id, n_words, n_tokens, tokens_per_word) — the corpus
    token-count under the trained tokenizer.

    BPE segmentation is a function of the WORD alone, so the merge
    fold (every merge applied in rank order — the order is semantics,
    a later merge can only see symbols earlier merges created) runs
    over the DISTINCT words of the input — vocabulary-sized work —
    and per-doc counts come from one word→vocab hash join + groupBy.
    The corpus-sized path carries no merge expressions at all. (The
    first implementation folded len(merges) nested array transforms
    over every word OCCURRENCE: measured 355 s at sf1 vs ~10 s for
    this shape — same outputs, the sf1 bench overrun's root cause.)
    Segmentation provably equals the training vocabulary's (tested by
    joining encoded words back to bpe_train's vocab)."""
    words = df.select(
        F.col(id_col), F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("__w")
    )
    symbols = F.concat(F.split(F.col("__w"), ""), F.array(F.lit(end_of_word)))
    for a, b in merges:
        symbols = _merge_pair_col(symbols, a, b, a + b)
    vocab = (
        words.select("__w").distinct().select("__w", F.size(symbols).alias("__ntok"))
    )
    per = (
        words.join(vocab, "__w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_words"),
            F.sum("__ntok").cast("int").alias("n_tokens"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_words"), F.lit(0)).alias("n_words"),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
        )
        .withColumn(
            "tokens_per_word",
            F.round(F.col("n_tokens") / F.greatest(F.col("n_words"), F.lit(1)), 6),
        )
    )


def vocab_growth_stats(
    df: DataFrame,
    text_col: str = "text",
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Vocabulary-growth corpus diagnostics per group: total token
    occurrences, distinct types, hapax legomena (once-only tokens),
    type-token ratio, and hapax share — the quick lexical-diversity
    screen (template-generated or looping text collapses TTR; OCR noise
    and boilerplate-free natural text push hapax share up). Lowercased
    whitespace tokens, same tokenization as ``vocabulary``. Two
    map-side-combinable groupBys: (group, token) counts, then the
    per-group fold over the counts table (types-sized, not
    corpus-sized). Returns
    ``(*group_cols, n_tokens, n_types, n_hapax, ttr, hapax_ratio)``."""
    gcols = list(group_cols or [])
    counts = (
        df.select(
            *gcols,
            F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("__tok"),
        )
        .groupBy(*gcols, "__tok")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return counts.groupBy(*gcols).agg(
        F.sum("__n").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum((F.col("__n") == 1).cast("long")).alias("n_hapax"),
        (F.count(F.lit(1)) / F.sum("__n")).alias("ttr"),
        (
            F.sum((F.col("__n") == 1).cast("long")) / F.count(F.lit(1))
        ).alias("hapax_ratio"),
    )


def fim_transform(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fim_rate: float = 0.5,
    spm_rate: float = 0.5,
    min_chars: int = 10,
) -> DataFrame:
    """Fill-in-the-middle training-example construction (Bavarian et
    al. 2022, the FIM transform applied to code/LLM pretraining data):
    a deterministic ``fim_rate`` fraction of documents is split at two
    uniform character positions into (prefix, middle, suffix) and
    re-serialized with sentinel markers — PSM order
    ``<PRE>p<SUF>s<MID>m`` or, for a ``spm_rate`` sub-fraction, SPM
    order ``<PRE><SUF>s<MID>pm`` (the joint variant that lets one
    model serve both orders). Untouched docs pass through with
    ``mode='none'`` and the original text, so the output is the full
    training corpus, not just the transformed slice.

    Every decision is h60-keyed on the document id (select / mode /
    both cut points), making the transform a pure deterministic
    function of the input — re-running a failed 100 TB job reproduces
    byte-identical examples, and the DuckDB oracle replays all of it.
    Rates compare integer hash residues (``h % 10^6 < rate*10^6``) —
    no float thresholds. Cuts are character-level: lo/hi = the sorted
    pair of ``h60 % (len+1)`` draws; empty parts (lo=0, lo=hi, hi=len)
    are legitimate and serialize as empty strings, matching the
    paper's uniform split.

    Returns (id, mode['psm'|'spm'|'none'], fim_lo, fim_hi, prefix,
    middle, suffix, formatted). Scale shape: one scan, pure Column
    string/hash arithmetic in-row — zero shuffles, zero UDFs.
    """
    if not 0.0 <= fim_rate <= 1.0 or not 0.0 <= spm_rate <= 1.0:
        raise ValueError(
            f"rates must be in [0, 1], got fim_rate={fim_rate}, "
            f"spm_rate={spm_rate}"
        )
    if min_chars < 1:
        raise ValueError(f"need min_chars >= 1, got {min_chars}")
    sid = F.col(id_col).cast("string")
    text = F.col(text_col)
    ln = F.length(text)

    def draw(tag: str) -> Column:
        return h60(F.concat(sid, F.lit(":" + tag)))

    selected = (ln >= min_chars) & (
        draw("fim") % 1_000_000 < int(fim_rate * 1_000_000)
    )
    spm = draw("spm") % 1_000_000 < int(spm_rate * 1_000_000)
    c1, c2 = draw("c1") % (ln + 1), draw("c2") % (ln + 1)
    lo = F.least(c1, c2).cast("int")
    hi = F.greatest(c1, c2).cast("int")
    prefix = F.substring(text, F.lit(1), lo)
    middle = F.substring(text, lo + 1, hi - lo)
    suffix = F.substring(text, hi + 1, ln - hi)
    psm_fmt = F.concat(
        F.lit("<PRE>"), prefix, F.lit("<SUF>"), suffix, F.lit("<MID>"), middle
    )
    spm_fmt = F.concat(
        F.lit("<PRE><SUF>"), suffix, F.lit("<MID>"), prefix, middle
    )
    null_s = F.lit(None).cast("string")
    null_i = F.lit(None).cast("int")
    return df.select(
        F.col(id_col),
        F.when(~selected, F.lit("none"))
        .when(spm, F.lit("spm"))
        .otherwise(F.lit("psm"))
        .alias("mode"),
        F.when(selected, lo).otherwise(null_i).alias("fim_lo"),
        F.when(selected, hi).otherwise(null_i).alias("fim_hi"),
        F.when(selected, prefix).otherwise(null_s).alias("prefix"),
        F.when(selected, middle).otherwise(null_s).alias("middle"),
        F.when(selected, suffix).otherwise(null_s).alias("suffix"),
        F.when(~selected, text)
        .when(spm, spm_fmt)
        .otherwise(psm_fmt)
        .alias("formatted"),
    )


def span_corruption(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    corruption_rate: float = 0.15,
    mean_span: int = 3,
    min_tokens: int = 20,
) -> DataFrame:
    """T5-style span-corruption example construction (Raffel et al.
    2020 §3.1.4; the UL2 R-denoiser): mask ~``corruption_rate`` of each
    document's tokens in spans of mean length ``mean_span``, emitting
    the sentinel-marked encoder ``inputs`` and the decoder ``targets``
    (``<extra_id_k>`` + the masked tokens, closed by a final
    ``<extra_id_S>``).

    The span layout is deterministic and non-overlapping by
    construction: S = max(1, floor(n·rate/mean)) spans, one per
    equal-width token segment (seg = n div S; the short tail past
    S·seg stays unmasked); within segment k the span length is
    1 + h60(id:len:k) % (2·mean−1) (mean = ``mean_span``, clamped to
    the segment) and the start is segment-uniform via
    h60(id:pos:k). Docs under ``min_tokens`` pass through with
    n_spans = 0, inputs = the original text, empty targets — the
    output is the full corpus.

    Like fim_transform, every decision is an integer hash residue of
    the document id, so a 100 TB re-run is byte-identical and the
    DuckDB oracle replays the whole construction. Scale shape: one
    scan, in-row array arithmetic (transform/filter/slice over the
    token array) — zero shuffles, zero UDFs.

    Returns (id, n_tokens, n_spans, n_masked, inputs, targets)."""
    if not 0.0 < corruption_rate < 1.0:
        raise ValueError(f"corruption_rate must be in (0, 1), got {corruption_rate}")
    if mean_span < 1:
        raise ValueError(f"need mean_span >= 1, got {mean_span}")
    if min_tokens < 1:
        raise ValueError(f"need min_tokens >= 1, got {min_tokens}")
    sid = F.col(id_col).cast("string")

    def draw(tag: str, k: Column) -> Column:
        return h60(F.concat(sid, F.lit(f":sc-{tag}:"), k.cast("string")))

    toks = ws_tokens(F.col(text_col))
    base = df.select(F.col(id_col), F.col(text_col).alias("__text"), toks.alias("__t"))
    n = F.size("__t")
    s_cnt = F.greatest(
        F.lit(1).cast("long"),
        F.floor(n * F.lit(float(corruption_rate)) / F.lit(float(mean_span))),
    )
    eligible = n >= min_tokens
    base = base.select(
        id_col,
        "__text",
        "__t",
        n.alias("__n"),
        F.when(eligible, s_cnt).otherwise(F.lit(0)).alias("__s"),
    )
    seg = (F.col("__n") / F.col("__s")).cast("long")  # floor for positives
    # per-span (start0, len) on the 0-based token axis, one per segment
    ldraw = lambda k: F.lit(1) + draw("len", k) % F.lit(2 * mean_span - 1)
    spanlen = lambda k: F.least(ldraw(k), seg)
    start0 = lambda k: k * seg + draw("pos", k) % (seg - spanlen(k) + F.lit(1))
    spans = F.transform(
        F.sequence(F.lit(0).cast("long"), F.col("__s") - 1),
        lambda k: F.struct(
            start0(k).alias("s"), spanlen(k).alias("l"), k.alias("k")
        ),
    )
    work = base.withColumn(
        "__spans", F.when(F.col("__s") > 0, spans).otherwise(F.array())
    )
    # classify each token index: outside any span -> the token; at a
    # span start -> the sentinel; inside a span -> drop (empty marker)
    idxs = F.sequence(F.lit(0).cast("long"), F.col("__n") - 1)

    def classify(i: Column) -> Column:
        k = (i / seg).cast("long")
        hit = F.when(
            (F.col("__s") > 0) & (k < F.col("__s")),
            F.element_at(F.col("__spans"), (k + 1).cast("int")),
        )
        inside = hit.isNotNull() & (i >= hit["s"]) & (i < hit["s"] + hit["l"])
        return (
            F.when(~inside, F.element_at(F.col("__t"), (i + 1).cast("int")))
            .when(i == hit["s"], F.concat(F.lit("<extra_id_"), k, F.lit(">")))
            .otherwise(F.lit(""))
        )

    inputs = F.array_join(
        F.filter(F.transform(idxs, classify), lambda t: F.length(t) > 0), " "
    )
    tgt_parts = F.transform(
        F.col("__spans"),
        lambda sp: F.concat(
            F.lit("<extra_id_"),
            sp["k"],
            F.lit("> "),
            F.array_join(F.slice(F.col("__t"), (sp["s"] + 1).cast("int"), sp["l"]), " "),
        ),
    )
    targets = F.when(
        F.col("__s") > 0,
        F.concat(
            F.array_join(tgt_parts, " "),
            F.lit(" <extra_id_"),
            F.col("__s"),
            F.lit(">"),
        ),
    ).otherwise(F.lit(""))
    n_masked = F.when(
        F.col("__s") > 0,
        F.aggregate(
            F.col("__spans"), F.lit(0).cast("long"), lambda acc, sp: acc + sp["l"]
        ),
    ).otherwise(F.lit(0).cast("long"))
    return work.select(
        id_col,
        F.col("__n").cast("long").alias("n_tokens"),
        F.col("__s").cast("long").alias("n_spans"),
        n_masked.alias("n_masked"),
        F.when(F.col("__s") > 0, inputs).otherwise(F.col("__text")).alias("inputs"),
        targets.alias("targets"),
    )


def source_quality_rollup(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    low_threshold: float = 0.5,
    max_low_frac: float = 0.5,
) -> DataFrame:
    """Domain-level quality rollup — the per-SOURCE filtering pass that
    runs above doc-level scoring (the C4/RefinedWeb practice: a domain
    whose documents are mostly junk gets blocklisted wholesale, which
    doc-level filters alone never express): per ``group_col``,

        (group, n_docs, quality_sum, mean_quality, n_low,
         low_frac, flag_source)

    where quality is :func:`quality_score`'s 6-dp composite, ``n_low``
    counts docs with quality < ``low_threshold`` (an exact integer
    compare on the grid score), and ``flag_source`` fires when
    ``low_frac`` exceeds ``max_low_frac`` — the blocklist candidate
    list. FP discipline: ``quality_sum`` rounds the per-group sum of
    grid scores to 6 dp (absolute accumulation noise ~1e-10 vs the
    5e-7 boundary — the label_centroids centroid_sum pattern), and
    ``mean_quality``/``low_frac`` divide the ROUNDED sum / exact
    integers, so the flags replay exactly.

    Scale shape: quality_score's zero-exchange scan + ONE map-side-
    combinable groupBy to one row per source."""
    if not 0.0 < low_threshold < 1.0:
        raise ValueError(f"low_threshold must be in (0, 1), got {low_threshold}")
    if not 0.0 <= max_low_frac <= 1.0:
        raise ValueError(f"max_low_frac must be in [0, 1], got {max_low_frac}")
    q = quality_score(df, text_col=text_col, id_col=id_col).select(
        F.col(id_col), F.col("quality")
    )
    staged = df.select(F.col(id_col), F.col(group_col).alias("group")).join(
        q, id_col
    )
    agg = staged.groupBy("group").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.sum("quality") + F.lit(1e-12), 6).alias("quality_sum"),
        F.sum(
            (F.col("quality") < F.lit(float(low_threshold))).cast("long")
        ).alias("n_low"),
    )
    low_frac = F.round(
        F.col("n_low").cast("double") / F.col("n_docs").cast("double")
        + F.lit(1e-12),
        6,
    )
    return agg.select(
        "group",
        "n_docs",
        "quality_sum",
        F.round(
            F.col("quality_sum") / F.col("n_docs").cast("double") + F.lit(1e-12),
            6,
        ).alias("mean_quality"),
        "n_low",
        low_frac.alias("low_frac"),
        (low_frac > F.lit(float(max_low_frac))).alias("flag_source"),
    )


def rake_keyphrases(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: "list[str] | None" = None,
    top_k: int = 3,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010 — Rapid Automatic
    Keyword Extraction, the unsupervised per-document keyphrase
    baseline TextRank is benchmarked against): candidate phrases are
    the maximal runs of non-stopword tokens; each word scores
    ``deg/freq`` over the DOCUMENT's phrases (freq = occurrences,
    deg = sum of the lengths of the phrases it appears in — long
    phrases boost their members, the RAKE signature), and a phrase
    scores the sum of its member word scores. Returns the top
    ``top_k`` distinct phrases per doc: ``(id, phrase, n_words,
    score, rank)``, ranked by (score DESC, phrase ASC).

    Determinism: deg and freq are exact integers; word scores round
    to the 6-dp grid (nudged); the phrase score sums <= phrase-length
    grid doubles and rounds again, so the ranking replays exactly in
    SQL. Repeated identical phrases in one doc collapse (distinct
    candidates — standard RAKE).

    Scale shape: one posexplode (linear), run segmentation as ONE
    doc-keyed window (cumulative stopword count — the paragraph_dedup
    exchange discipline), phrase assembly + word scores + phrase
    scores as doc-keyed groupBys sharing that partitioning, and the
    top-k pick as a row_number window with the filter directly above
    it (WindowGroupLimit prunes map-side). No corpus-wide state —
    RAKE is per-document by construction, so every stage keys on the
    doc."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    stops = list(stopwords) if stopwords is not None else list(STOPWORDS_EN)
    toks = ws_tokens(F.lower(F.col(text_col)))
    ex = df.select(
        F.col(id_col), F.posexplode(toks).alias("__pos", "__w")
    ).withColumn("__stop", F.col("__w").isin(*stops).cast("int"))
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("__pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = (
        ex.withColumn("__run", F.sum("__stop").over(w_run))
        .filter(F.col("__stop") == 0)
    )
    phrases = runs.groupBy(id_col, "__run").agg(
        F.concat_ws(
            " ",
            F.array_sort(
                F.collect_list(F.struct(F.col("__pos"), F.col("__w")))
            ).getField("__w"),
        ).alias("phrase"),
        F.count(F.lit(1)).alias("__len"),
    )
    # per-doc word stats over phrase membership: freq = occurrences,
    # deg = sum of containing-phrase lengths
    members = runs.join(
        phrases.select(id_col, "__run", "__len"), [id_col, "__run"]
    )
    wstats = members.groupBy(id_col, "__w").agg(
        F.count(F.lit(1)).alias("__freq"),
        F.sum("__len").alias("__deg"),
    ).withColumn(
        "__wscore",
        F.round(
            F.col("__deg").cast("double") / F.col("__freq").cast("double")
            + F.lit(1e-12),
            6,
        ),
    )
    pscore = (
        members.join(wstats.select(id_col, "__w", "__wscore"), [id_col, "__w"])
        .groupBy(id_col, "__run")
        .agg(F.round(F.sum("__wscore") + F.lit(1e-12), 6).alias("score"))
        .join(phrases, [id_col, "__run"])
        .select(id_col, "phrase", F.col("__len").alias("n_words"), "score")
        .groupBy(id_col, "phrase", "n_words")
        .agg(F.max("score").alias("score"))  # identical phrases collapse
    )
    w_pick = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("phrase").asc()
    )
    return (
        pscore.withColumn("rank", F.row_number().over(w_pick))
        .filter(F.col("rank") <= top_k)
    )
