"""Deduplication operators over the ``documents`` table.

Exact (hash groupBy), n-gram Jaccard near-dup, MinHash+LSH, SimHash —
the standard pretraining-corpus dedup ladder.  All of it is built-in
Spark SQL expressions over md5 (cross-engine stable), so every operator
has an exact DuckDB oracle; none of it touches Python row-at-a-time.

Scale notes:
  * gram explosion is linear in corpus token count; the gram→doc join is
    the classic inverted-index shuffle, pruned by ``min_shared`` and by
    dropping ubiquitous grams (document-frequency cap) before the join —
    the df cap is what keeps the self-join from going quadratic at
    100 TB (stopword-grams otherwise pair everything with everything);
  * MinHash signatures aggregate per doc with map-side partial min —
    one narrow shuffle per doc, then candidates come from tiny
    band-bucket groups (LSH guarantee);
  * SimHash is a single groupBy(doc) of +-1 digit votes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical texts: (text_md5, n_docs, min_doc_id)."""
    return (
        docs.groupBy(F.md5("text").alias("text_md5"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .where(F.col("n_docs") >= 2)
    )


def word_ngrams(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, gram) distinct word n-grams, built as a ZERO-SHUFFLE array
    expression: slide an index array over the split token array and
    concat each window (the text.document_fingerprint pattern).  Per-doc
    distinctness comes from array_distinct before the explode, so no
    dropDuplicates shuffle either.  The DuckDB oracle keeps the
    positional-self-join formulation; both produce the same gram set.
    """
    # project the token array FIRST: referencing the split() subtree
    # inside the transform lambda would re-evaluate it per window element
    # (no CSE inside lambda bodies — measured 2x slower)
    toked = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    toks = F.col("toks")
    n_win = F.size(toks) - F.lit(n - 1)
    idx = F.when(n_win >= 1, F.sequence(F.lit(0), n_win - 1)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return toked.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("gram")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard >= threshold.

    Inverted-index self-join on gram; grams appearing in more than
    ``max_doc_freq`` docs are dropped before the join (df cap — the
    quadratic-blowup guard at corpus scale).
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.

    Under the df cap the score is a LOWER BOUND on the true Jaccard:
    the shared-gram numerator counts df-capped grams only, while the
    size denominators count ALL grams — so a pair sharing only
    high-df grams scores 0 (is missed) and every reported score is
    <= the uncapped value.  This is deliberate: frequent grams carry
    no near-duplicate signal (boilerplate), and keeping denominators
    uncapped means a reported jaccard never OVERSTATES similarity.
    Raise ``max_doc_freq`` toward the corpus size to tighten the
    bound at quadratic cost.
    """
    grams = word_ngrams(docs, n).cache()
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    rare = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_doc_freq)
        .select("gram")
    )
    g = grams.join(rare, on="gram")
    a = g.select(F.col("doc_id").alias("doc_a"), "gram")
    b = g.select(F.col("doc_id").alias("doc_b"), "gram")
    shared = (
        a.join(b, on="gram")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    out = (
        shared.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na")),
            on="doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb")),
            on="doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


def minhash_signatures(
    docs: DataFrame, n: int = 3, num_hashes: int = 12
) -> DataFrame:
    """(doc_id, sig: array<string>) — MinHash over word n-grams.

    Hash family i = md5(i || '|' || gram); the signature entry is the
    lexicographic minimum (a uniform random order on grams, so the
    classic MinHash collision bound holds).  Cross-engine exact.
    """
    grams = word_ngrams(docs, n)
    mins = [
        F.min(F.md5(F.concat_ws("|", F.lit(str(i)), "gram"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = grams.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    ``num_hashes`` minhashes split into ``bands`` bands; docs sharing
    any full band collide.  Returns (doc_a, doc_b, n_bands_shared).
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, n, num_hashes)
    band_cols = []
    for b in range(bands):
        parts = [
            F.element_at("sig", b * rows_per_band + r + 1)
            for r in range(rows_per_band)
        ]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *parts)).alias("key"))
        )
    buckets = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    l = buckets.select(F.col("doc_id").alias("doc_a"), "band", "key")
    r = buckets.select(F.col("doc_id").alias("doc_b"), "band", "key")
    return (
        l.join(r, on=["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_bands_shared"))
    )


def simhash_signatures(docs: DataFrame, n: int = 2) -> DataFrame:
    """(doc_id, simhash: string of 32 bits) — hex-digit-parity SimHash.

    Each word n-gram votes ±1 on 32 positions (parity of each hex digit
    of its md5); the signature bit is 1 iff the sum is positive.
    Identical arithmetic in any engine with md5/substr/strpos.
    """
    grams = word_ngrams(docs, n).withColumn("h", F.md5("gram"))
    votes = []
    for j in range(1, 33):
        digit = F.instr(F.lit("0123456789abcdef"), F.substring("h", j, 1)) - 1
        votes.append((2 * (digit % 2) - 1).alias(f"v{j}"))
    per_doc = grams.select("doc_id", *votes).groupBy("doc_id").agg(
        *[F.sum(f"v{j}").alias(f"s{j}") for j in range(1, 33)]
    )
    bits = [F.when(F.col(f"s{j}") > 0, F.lit("1")).otherwise(F.lit("0")) for j in range(1, 33)]
    return per_doc.select("doc_id", F.concat(*bits).alias("simhash"))


def dedup_clusters(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Transitive near-duplicate CLUSTERS — the composed dedup pipeline
    a pretraining corpus actually runs: n-gram Jaccard candidate pairs
    (bounded inverted index, no all-pairs) feed the connected-components
    kernel (hash-min + pointer jumping), closing dup chains
    transitively (a~b, b~c => one cluster even when a~c is below
    threshold).  Returns one row per clustered doc:
    (doc_id, cluster, cluster_size, is_keeper) with cluster = the min
    doc_id of the group and the keeper the canonical survivor;
    singleton docs (no near-dup) are absent — everything absent
    survives trivially."""
    from motive_spark.kernels import connected_components

    pairs = ngram_jaccard_pairs(
        docs, n=n, threshold=threshold, max_doc_freq=max_doc_freq
    )
    cc = connected_components(
        pairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
    )
    sizes = cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return cc.join(sizes, on="component").select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster"),
        "cluster_size",
        (F.col("id") == F.col("component")).alias("is_keeper"),
    )


def multi_signal_dedup(
    docs: DataFrame,
    embeddings: DataFrame,
    n: int = 3,
    jaccard_threshold: float = 0.5,
    cos_threshold: float = 0.4,
    max_doc_freq: int = 1000,
    method: str = "lsh",
    id_map=None,
) -> DataFrame:
    """Multi-signal near-duplicate clusters: the UNION of lexical
    (n-gram Jaccard) and semantic (embedding-cosine) duplicate pairs,
    closed transitively through the connected-components kernel — the
    production dedup pattern where paraphrases (cosine catches, Jaccard
    misses) and boilerplate edits (Jaccard catches, cosine may miss)
    must land in one cluster.

    ``embeddings.vec_id`` is assumed to BE the doc id (pass ``id_map``
    as a (vec_id, doc_id) DataFrame otherwise).  ``method`` forwards to
    :func:`embedding_near_duplicates` — "lsh" is the scale path,
    "exact" the verification baseline.

    Returns the :func:`dedup_clusters` shape (doc_id, cluster,
    cluster_size, is_keeper); singletons absent.

    Scale shape: both pair generators are bounded candidate joins (df-
    capped inverted index / LSH buckets — no all-pairs on the scale
    path), the union is a row-level concat, and the closure is the
    log-round pointer-jumping CC kernel.
    """
    from motive_spark.datapipe.similarity import embedding_near_duplicates
    from motive_spark.kernels import connected_components

    text_pairs = ngram_jaccard_pairs(
        docs, n=n, threshold=jaccard_threshold, max_doc_freq=max_doc_freq
    ).select("doc_a", "doc_b")
    emb_pairs = embedding_near_duplicates(
        embeddings, threshold=cos_threshold, method=method
    ).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    if id_map is not None:
        m = id_map.select(
            F.col("vec_id").alias("doc_a"), F.col("doc_id").alias("_a")
        )
        emb_pairs = (
            emb_pairs.join(m, on="doc_a")
            .select(
                F.col("_a").alias("doc_a"),
                F.col("doc_b").alias("vec_b"),
            )
            .join(
                id_map.select(
                    F.col("vec_id").alias("vec_b"),
                    F.col("doc_id").alias("doc_b"),
                ),
                on="vec_b",
            )
            .select("doc_a", "doc_b")
        )
    pairs = text_pairs.unionByName(emb_pairs).distinct()
    cc = connected_components(
        pairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
    )
    sizes = cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return cc.join(sizes, on="component").select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster"),
        "cluster_size",
        (F.col("id") == F.col("component")).alias("is_keeper"),
    )


def incremental_dedup(
    new_docs: DataFrame,
    corpus: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Dedup a NEW batch against an EXISTING corpus — the steady-state
    shape of a production pipeline (the crawl of the day vs the
    accumulated corpus), where re-pairing the whole corpus against
    itself every day would be quadratic in history.

    Inverted-index join of new-batch grams against corpus grams only
    (never corpus×corpus); the document-frequency cap is computed on
    the CORPUS side (the big, slowly-moving side — a boilerplate gram
    shared by half the corpus would otherwise fan every new doc out to
    half the corpus).  Returns EVERY new doc with its keep/drop
    verdict: (doc_id, is_dup, dup_of, jaccard) where dup_of is the
    best-matching corpus doc (max jaccard, ties to smallest id) and
    is_dup = best jaccard >= threshold; non-matching docs carry NULL
    dup_of/jaccard.
    """
    gn = word_ngrams(new_docs, n)
    gc = word_ngrams(corpus, n).cache()
    sizes_n = gn.groupBy("doc_id").agg(F.count(F.lit(1)).alias("na"))
    sizes_c = gc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nb"))
    rare = (
        gc.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_doc_freq)
        .select("gram")
    )
    shared = (
        gn.withColumnRenamed("doc_id", "new_id")
        .join(gc.join(rare, "gram").withColumnRenamed("doc_id", "corp_id"),
              "gram")
        .groupBy("new_id", "corp_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    scored = (
        shared.join(
            sizes_n.select(F.col("doc_id").alias("new_id"), "na"), "new_id"
        )
        .join(
            sizes_c.select(F.col("doc_id").alias("corp_id"), "nb"), "corp_id"
        )
        .select(
            "new_id",
            "corp_id",
            F.round(
                F.col("shared")
                / (F.col("na") + F.col("nb") - F.col("shared")),
                6,
            ).alias("j"),
        )
    )
    best = (
        scored.groupBy("new_id")
        .agg(
            F.max(
                F.struct(F.col("j"), (-F.col("corp_id")).alias("neg"))
            ).alias("top")
        )
        .select(
            "new_id",
            (-F.col("top.neg")).alias("dup_of"),
            F.col("top.j").alias("jaccard"),
        )
    )
    gc.unpersist()
    return (
        new_docs.select("doc_id")
        .join(best.withColumnRenamed("new_id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.col("jaccard") >= threshold, F.lit(False)
            ).alias("is_dup"),
            F.when(F.col("jaccard") >= threshold, F.col("dup_of")).alias(
                "dup_of"
            ),
            F.when(F.col("jaccard") >= threshold, F.col("jaccard")).alias(
                "jaccard"
            ),
        )
    )
