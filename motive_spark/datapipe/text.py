"""Text analysis over the ``documents`` table — training-data-pipeline
operators (language-ID heuristic, quality scoring, token counting,
document fingerprinting).

Every function is pure built-in Spark SQL expressions (JVM-side,
whole-stage codegen) and deliberately uses only cross-engine primitives
(split / md5 / replace / length) so the DuckDB oracles replicate the
semantics byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lexicons for the n-gram/stopword heuristic —
# occurrence counting via replace-delta (identical in any SQL engine)
LANG_MARKERS = {
    "en": ["the", "and", "with"],
    "de": ["der", "und", "nicht"],
    "fr": ["le", "et", "pas"],
    "es": ["el", "y", "nada"],
    "zh": ["de5", "le5", "shi4"],
}


def _count_token(col, token: str):
    """# occurrences of ``token`` as a whitespace-delimited word."""
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    needle = f" {token} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def _count_token_exact(col, token: str):
    """Exact whitespace-token frequency via a list filter — unlike the
    replace-delta trick (`_count_token`), this counts ADJACENT repeats
    correctly (replace() consumes the shared delimiter, undercounting
    back-to-back occurrences)."""
    return F.size(
        F.filter(F.split(col, " "), lambda x: x == F.lit(token))
    ).cast("long")


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len, n_distinct_tokens).

    Token = whitespace split; the BPE-ish proxy ``n_subtokens`` counts
    additional splits at punctuation/digit boundaries via regexp.
    """
    toks = F.split(F.col("text"), " ")
    subtok = F.size(
        F.split(F.col("text"), r"[\s\.,;:!\?\(\)\[\]{}]+|(?<=[a-z])(?=[A-Z0-9])")
    )
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.round(F.length("text") / F.size(toks), 6).alias("avg_token_len"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        subtok.alias("n_subtokens"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality score in [0,1]: length band + stopword presence
    + type-token ratio (the standard pretraining-filter features)."""
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n_tok
    stop_hits = _count_token(F.col("text"), "the") + _count_token(F.col("text"), "a")
    stop_ratio = stop_hits / n_tok
    length_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.0)
    score = F.round(
        0.4 * length_ok + 0.3 * F.least(stop_ratio * 10.0, F.lit(1.0)) + 0.3 * ttr, 6
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        score.alias("quality"),
    )


def detect_language(docs: DataFrame) -> DataFrame:
    """Marker-word language ID: argmax of per-language marker counts,
    ties broken by language code order ('de' < 'en' < ...); 'und'
    (undetermined) when nothing matches."""
    counts = {
        lang: sum_expr
        for lang, sum_expr in (
            (
                lang,
                sum(
                    (_count_token(F.col("text"), w) for w in words),
                    F.lit(0).cast("long"),
                ),
            )
            for lang, words in LANG_MARKERS.items()
        )
    }
    best = F.lit("und")
    best_cnt = F.lit(0).cast("long")
    for lang in sorted(LANG_MARKERS):  # later wins only on strict >
        c = counts[lang]
        is_better = c > best_cnt
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_cnt = F.when(is_better, c).otherwise(best_cnt)
    out = docs.select("doc_id", best.alias("pred_lang"))
    return out


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """BM25 document retrieval for a fixed query (Robertson/Sparck
    Jones, public literature) — the search/retrieval primitive a
    training-data pipeline uses for quality-by-query mining:

        score(d) = sum_t idf(t) * tf * (k1+1)
                               / (tf + k1 * (1 - b + b * dl/avgdl))
        idf(t)   = ln((N - df + 0.5) / (df + 0.5) + 1)

    Everything happens in TWO plan nodes: one corpus aggregation
    produces (N, sum_dl, df per term) which broadcast-joins back, and
    the score is a single column expression — term frequencies come
    from the replace-delta trick, and the per-term contributions sum
    LEFT-TO-RIGHT over the literal query order (an expression, not an
    aggregation), so the float result is bit-identical cross-engine
    and the DuckDB oracle replays it exactly.  Top-k is TakeOrdered
    (never a global sort), rank stamped over the k survivors.
    """
    from pyspark.sql import Window

    tf_cols = [
        _count_token_exact(F.col("text"), t).alias(f"tf_{i}")
        for i, t in enumerate(query_terms)
    ]
    base = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("dl"),
        *tf_cols,
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    j = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl") * 1.0 / F.col("n_docs")
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        tf = F.col(f"tf_{i}")
        df = F.col(f"df_{i}")
        idf = F.log((F.col("n_docs") - df + 0.5) / (df + 0.5) + 1.0)
        score = score + idf * (tf * (k1 + 1.0)) / (
            tf + k1 * ((1.0 - b) + b * F.col("dl") / avgdl)
        )
    scored = j.select(
        "doc_id",
        F.col("dl").alias("doc_len"),
        F.round(score, 6).alias("bm25"),
    )
    order = [F.desc("bm25"), F.asc("doc_id")]
    top = scored.orderBy(*order).limit(top_k)
    return top.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    )


def detect_language_ngram(docs: DataFrame) -> DataFrame:
    """Hashed char-trigram language ID (fastText-style linear model,
    public technique — see langid_train.py for the in-repo trainer).

    (doc_id, pred_lang): argmax over languages of the integer NB score
    sum_{grams} W[lang][bucket(gram)], buckets = md5-hashed trigrams of
    the space-padded text.  Everything is pure built-in expressions —
    one transform to grams/buckets, one integer aggregate per language
    (zero shuffle, whole-stage codegen) — and the integer quantization
    makes the score order-independent, so the DuckDB oracle replays it
    exactly.  Ties break to the alphabetically-first language."""
    from motive_spark.datapipe.langid_model import LANGS, N_BUCKETS, WEIGHTS

    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    base = docs.select("doc_id", padded.alias("p"))
    p = F.col("p")
    idx = F.sequence(F.lit(1), F.greatest(F.length(p) - 2, F.lit(1)))
    buckets = F.transform(
        idx,
        lambda i: F.pmod(
            F.conv(
                F.substring(F.md5(F.substr(p, i, F.lit(3))), 1, 4), 16, 10
            ).cast("long"),
            F.lit(N_BUCKETS),
        ),
    )
    scored = base.select("doc_id", buckets.alias("bk"))

    def lang_score(w):  # closure: Spark lambdas must take exactly 2 args
        return F.aggregate(
            F.col("bk"),
            F.lit(0).cast("long"),
            lambda acc, b: acc + F.element_at(w, (b + 1).cast("int")),
        )

    score_cols = [
        lang_score(F.lit(WEIGHTS[lang])).alias(f"s_{lang}") for lang in LANGS
    ]
    scored = scored.select("doc_id", *score_cols)
    best = F.lit(LANGS[0])
    best_s = F.col(f"s_{LANGS[0]}")
    for lang in LANGS[1:]:  # later wins only on strict >
        c = F.col(f"s_{lang}")
        is_better = c > best_s
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_s = F.when(is_better, c).otherwise(best_s)
    return scored.select("doc_id", best.alias("pred_lang"))


def document_fingerprint(docs: DataFrame, gram: int = 5, k: int = 4) -> DataFrame:
    """Min-k rolling fingerprint: md5 of each ``gram``-word window, keep
    the k lexicographically smallest — a winnowing-style content sketch
    robust to local edits.  Returns (doc_id, fingerprint: array<string>).
    """
    # token array projected first — a split() subtree referenced inside
    # the transform lambda re-evaluates per window (no CSE in lambdas)
    toked = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    toks = F.col("toks")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - gram, F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.md5(
            F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(gram)])
        ),
    )
    return toked.select(
        "doc_id",
        F.slice(F.array_sort(F.array_distinct(grams)), 1, k).alias("fingerprint"),
    )


STOPWORD_RULE_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_filter(
    docs: DataFrame,
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_distinct_ratio: float = 0.3,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_stopwords: int = 2,
    max_dup_line_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
) -> DataFrame:
    """The full Gopher document-filter battery (Rae et al. 2021 §A1.1,
    public literature), as pure column expressions over whitespace
    tokens and newline-split lines:

      R1 word count within [min_words, max_words]
      R2 mean word length within [min_mean_word_len, max_mean_word_len]
      R3 symbol-to-word ratio (non-alnum runs) <= max_symbol_ratio
      R4 distinct-word ratio >= min_distinct_ratio (repetition guard)
      R5 bullet-point line ratio <= max_bullet_ratio
      R6 ellipsis-terminated line ratio <= max_ellipsis_ratio
      R7 at least min_stopwords distinct common stop words present
      R8 duplicate-line fraction <= max_dup_line_ratio
      R9 fraction of words with >=1 alphabetic char >= min_alpha_ratio

    Returns per-doc rule values, each rule's boolean, and ``passes`` =
    AND of all rules — the shape a pretraining pipeline filters on.
    Every expression is cross-engine deterministic (the alphabetic-char
    test is ``lower(w) != upper(w)`` — no regex divergence)."""
    toks = F.split(F.col("text"), " ")
    n_words = F.size(toks)
    mean_len = (
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) / n_words
    )
    n_symbols = F.size(F.split(F.col("text"), r"[^A-Za-z0-9\s]+")) - 1
    sym_ratio = n_symbols / n_words
    distinct_ratio = F.size(F.array_distinct(toks)) / n_words

    lines = F.split(F.col("text"), "\n")
    n_lines = F.size(lines)
    bullet_ratio = (
        F.size(
            F.filter(
                lines,
                lambda l: F.substring(l, 1, 2).isin("- ", "* ")
                | (F.substring(l, 1, 1) == "•"),
            )
        )
        / n_lines
    )
    ellipsis_ratio = (
        F.size(
            F.filter(
                lines,
                lambda l: (F.right(l, F.lit(3)) == "...")
                | (F.right(l, F.lit(1)) == "…"),
            )
        )
        / n_lines
    )
    n_stop = sum(
        (
            F.when(_count_token(F.col("text"), w) > 0, 1).otherwise(0)
            for w in STOPWORD_RULE_WORDS
        ),
        F.lit(0),
    )
    dup_line_ratio = 1.0 - F.size(F.array_distinct(lines)) / n_lines
    alpha_ratio = (
        F.size(F.filter(toks, lambda t: F.lower(t) != F.upper(t))) / n_words
    )

    r1 = (n_words >= min_words) & (n_words <= max_words)
    r2 = (mean_len >= min_mean_word_len) & (mean_len <= max_mean_word_len)
    r3 = sym_ratio <= max_symbol_ratio
    r4 = distinct_ratio >= min_distinct_ratio
    r5 = bullet_ratio <= max_bullet_ratio
    r6 = ellipsis_ratio <= max_ellipsis_ratio
    r7 = n_stop >= min_stopwords
    r8 = dup_line_ratio <= max_dup_line_ratio
    r9 = alpha_ratio >= min_alpha_ratio
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(sym_ratio, 6).alias("symbol_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(bullet_ratio, 6).alias("bullet_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_ratio"),
        n_stop.cast("int").alias("n_stopwords"),
        F.round(dup_line_ratio, 6).alias("dup_line_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        r1.alias("rule_word_count"),
        r2.alias("rule_word_len"),
        r3.alias("rule_symbols"),
        r4.alias("rule_repetition"),
        r5.alias("rule_bullets"),
        r6.alias("rule_ellipsis"),
        r7.alias("rule_stopwords"),
        r8.alias("rule_dup_lines"),
        r9.alias("rule_alpha_words"),
        (r1 & r2 & r3 & r4 & r5 & r6 & r7 & r8 & r9).alias("passes"),
    )


def tfidf_similar_docs(
    docs: DataFrame,
    n_queries: int = 5,
    top_k: int = 10,
    max_df_frac: float = 0.25,
) -> DataFrame:
    """TF-IDF cosine document-to-document retrieval: for each query doc
    (doc_id < ``n_queries``), the ``top_k`` most similar corpus docs —
    the "more like this" mining primitive (near-topic expansion of a
    seed set) next to the fixed-query BM25.

    Exactness strategy: idf = ln((N+1)/(df+1)) is QUANTIZED to integer
    thousandths once per term, so every weight (tf * idf_q), norm
    component (wt^2) and dot product is an exact 64-bit integer sum —
    aggregation order cannot change a bit (wt <= tf * 15e3 keeps the
    sums far from 2^63).  Only the final cosine is a float, computed
    per row from exact integers and rounded to 6 dp BEFORE ranking.

    Scale shape: one token explode + (doc, token) count, one df
    aggregation; tokens in more than ``max_df_frac`` of docs are
    dropped (stopword guard — the same df-cap that keeps the n-gram
    dedup's inverted index from quadratic blowup, and deterministic so
    the oracle replays it); the query-side join touches only the
    n_queries docs' postings.  Top-k per query is a per-query window
    over the candidate set, never a global sort."""
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    n = docs.count()
    max_df = max(1, int(n * max_df_frac))
    df = (
        tf.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_df)
    )
    idf_q = F.round(
        F.lit(1000.0) * F.log((n + 1.0) / (F.col("df") + 1.0))
    ).cast("long")
    w = tf.join(df, on="tok").select(
        "doc_id", "tok", (F.col("tf") * idf_q).alias("wt")
    )
    norms = w.groupBy("doc_id").agg(
        F.sum(F.col("wt") * F.col("wt")).alias("norm_sq")
    )
    qw = w.where(F.col("doc_id") < n_queries).select(
        F.col("doc_id").alias("query_id"), "tok", F.col("wt").alias("qwt")
    )
    dots = (
        qw.join(w, on="tok")
        .where(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("qwt") * F.col("wt")).alias("dot"))
    )
    qn = norms.select(
        F.col("doc_id").alias("query_id"), F.col("norm_sq").alias("qn")
    )
    scored = (
        dots.join(qn, on="query_id")
        .join(norms, on="doc_id")
        .select(
            "query_id",
            "doc_id",
            # sqrt each exact-long norm separately: the raw product
            # qn * norm_sq can pass 2^63 (silent long wraparound), and
            # both factors stay below 2^53 so their double conversions
            # are exact
            F.round(
                F.col("dot")
                / (F.sqrt(F.col("qn")) * F.sqrt(F.col("norm_sq"))),
                6,
            ).alias("cos"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= top_k)
        .select("query_id", "doc_id", "rank", "cos")
    )


def collocations_pmi(
    docs: DataFrame,
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Adjacent-bigram collocation mining by pointwise mutual
    information — the standard phrase-discovery pass a tokenizer
    pipeline runs before vocabulary construction (Church & Hanks 1990,
    public literature).

    pmi(w1, w2) = log2( P(w1 w2) / (P(w1) P(w2)) )
                = log2( c12 * N^2 / (B * c1 * c2) )

    with c12 the bigram count, c1/c2 unigram counts, N total tokens,
    B total bigrams — all exact integer aggregates; only the final
    log2 is floating point, computed per row from the exact integers
    and rounded to 6 dp BEFORE ranking (the tfidf/link-prediction
    discipline; c12·N² stays under 2^53 through ~1e6-token corpora —
    beyond that, subsample or lift the expression to decimal).

    Scale shape: one zero-shuffle bigram transform + two counted
    aggregations (bigram, unigram); the unigram table joins back
    twice — both joins are on the word key and the unigram side is
    broadcast-size for any real vocabulary.  Top-k is orderBy+limit
    (TakeOrdered), never a global window.
    """
    toked = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    toks = F.col("toks")
    n_win = F.size(toks) - F.lit(1)
    idx = F.when(n_win >= 1, F.sequence(F.lit(0), n_win - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bi = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(toks, (i + 1).cast("int")).alias("w1"),
            F.element_at(toks, (i + 2).cast("int")).alias("w2"),
        ),
    )
    bigrams = toked.select(F.explode(bi).alias("b")).select("b.w1", "b.w2")
    uni = (
        toked.select(F.explode(toks).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    spark = docs.sparkSession
    n_tok = uni.agg(F.sum("c")).collect()[0][0] or 0
    pair = (
        bigrams.where((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    n_bi = pair.agg(F.sum("c12")).collect()[0][0] or 1
    u1 = F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")))
    u2 = F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")))
    pmi = F.round(
        F.log(
            F.col("c12")
            * F.lit(float(n_tok))
            * F.lit(float(n_tok))
            / (F.lit(float(n_bi)) * F.col("c1") * F.col("c2"))
        )
        / F.lit(float(__import__("math").log(2.0))),
        6,
    )
    return (
        pair.where(F.col("c12") >= min_count)
        .join(u1, on="w1")
        .join(u2, on="w2")
        .select("w1", "w2", "c12", "c1", "c2", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(top_k)
    )


def ngram_contamination(
    docs: DataFrame,
    n: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """Per-document n-gram overlap with the rest of the corpus — the
    decontamination / memorization screen: the fraction of a document's
    distinct word n-grams that also occur in >= ``min_df`` documents
    (including itself).  A held-out eval set is 'contaminated' exactly
    when this rate is high against the training corpus.

    Scale shape: the zero-shuffle windowed-gram transform shared with
    the n-gram dedup (word_ngrams), one document-frequency aggregation
    on the gram key (map-side combinable), one join back on the gram
    key, one per-doc count — no pairwise comparisons anywhere, so cost
    is linear in total grams, and the gram key can be md5-compacted at
    100-TB scale to bound shuffle width.  The rate is an exact integer
    pair (n_shared, n_grams); the ratio is one rounded division.
    """
    from motive_spark.datapipe.dedup import word_ngrams

    grams = word_ngrams(docs, n=n)
    dfreq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    flagged = grams.join(
        dfreq.where(F.col("df") >= min_df).select("gram"),
        on="gram",
        how="leftsemi",
    )
    per_doc = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    shared = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shared")
    )
    return (
        per_doc.join(shared, on="doc_id", how="left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            F.round(
                F.coalesce("n_shared", F.lit(0)) * F.lit(1.0) / F.col("n_grams"),
                6,
            ).alias("contamination_rate"),
        )
    )


# PII patterns restricted to the Java-regex ∩ RE2 common subset (no
# lookarounds, no backrefs) so Spark and any RE2-based engine rewrite
# byte-identically
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("longnum", r"[0-9]{13,19}", "<NUM>"),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
) -> DataFrame:
    """Scrub PII-shaped spans (emails, IPv4 addresses, 13-19-digit
    numbers) from ``text_col`` into typed placeholders, with one count
    column per category — the mandatory hygiene pass before corpus
    release.  Patterns apply in the fixed PII_PATTERNS order (email
    before ipv4/longnum, so an address inside an email is consumed
    once).  Pure regexp_replace/regexp_count column expressions —
    codegen'd, zero-shuffle, pushdown-safe."""
    out = df
    col = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(col, F.lit(pat)).alias(f"n_{name}"))
        col = F.regexp_replace(col, pat, repl)
    return out.select("*", *counts, col.alias(out_col))
