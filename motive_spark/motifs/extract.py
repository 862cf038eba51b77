"""Motif extractor: sample → canonize → count → overlap-remove.

Spark-first re-expression of D/UPlainMotifExtractor
(DPlainMotifExtractor.java:141-231, UPlainMotifExtractor.java:130-237):

  1. seeded connected-subgraph sampling (sample.py);
  2. induced-subgraph bitmask per occurrence, canonized by the
     vectorized canonical-form UDF — isomorphic samples unify under a
     plain groupBy on ``canon`` (J5: canonical hashing beats iso-tests);
  3. duplicate occurrences (same vertex set, same motif) collapse
     (testNoDuplicates, UPlainMotifExtractorTest.java:84-99);
  4. min-frequency predicate (P4, default 2 — Compare.java:135);
  5. exDegree per occurrence — computed as sum(deg) - 2*m_induced from
     the cached degree table, no per-occurrence neighborhood join (A7);
  6. greedy overlap removal per motif (A6): occurrences sorted by
     (exDegree asc, occ_id) swept, accepting node-disjoint ones — the
     deterministic greedy maximal independent set of
     UPlainMotifExtractor.java:165-227, run in applyInPandas per motif
     (group size bounded by the sample budget).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from motive_spark.motifs.canon import canonical_udf
from motive_spark.motifs.sample import induced_masks, sample_connected_subgraphs


def _remove_overlaps(pdf: pd.DataFrame) -> pd.DataFrame:
    """Greedy MIS sweep within one motif group (deterministic)."""
    pdf = pdf.sort_values(["ex_degree", "occ_id"], kind="mergesort")
    used: set = set()
    keep = []
    for row in pdf.itertuples(index=False):
        vs = row.vertices
        if any(v in used for v in vs):
            continue
        used.update(vs)
        keep.append(row)
    return pd.DataFrame(keep, columns=pdf.columns) if keep else pdf.iloc[0:0]


class MotifExtractor:
    """API mirror of the reference extractor (SURVEY §3.4).

    ``MotifExtractor(edges, samples, min_size, max_size, min_freq,
    seed, directed)`` → ``.motifs()`` (canon, k, freq sorted desc),
    ``.occurrences()`` (selected, node-disjoint), ``.frequency(canon)``.
    """

    def __init__(
        self,
        edges: DataFrame,
        samples: int = 5000,
        min_size: int = 3,
        max_size: int = 6,
        min_freq: int = 2,
        seed: int = 42,
        directed: bool = True,
        vertex_labels: DataFrame | None = None,
    ):
        from motive_spark.motifs.canon import MAX_BRUTE_K, MAX_K

        if max_size > (MAX_BRUTE_K if directed else MAX_K):
            raise ValueError(
                f"max_size={max_size} unsupported: directed motifs cap at "
                f"k={MAX_BRUTE_K} (two bits per pair overflow a 64-bit mask "
                f"above that), undirected at k={MAX_K}"
            )
        self.edges = edges
        self.directed = directed
        self.min_freq = min_freq
        self.labeled = vertex_labels is not None
        spark = edges.sparkSession

        occ = sample_connected_subgraphs(
            edges, samples, min_size, max_size, seed=seed, directed=directed
        )
        occ = induced_masks(occ, edges, directed=directed)
        if vertex_labels is not None:
            # label-sensitive matching (DPlainMotifExtractor.java:54-63):
            # occurrences unify only when structure AND label pattern are
            # isomorphic.  The canonical key is the labeled canonization's
            # composite string; the long ``canon`` group key is its hash
            # (the string rides along as ``canon_key``).
            from motive_spark.motifs.canon import canonical_labeled_udf

            per_v = (
                occ.select("occ_id", F.posexplode("vertices").alias("pos", "id"))
                .join(
                    vertex_labels.select("id", F.col("label").cast("string")),
                    on="id",
                    how="left",
                )
                .groupBy("occ_id")
                .agg(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("pos").alias("p"),
                                    F.coalesce("label", F.lit("")).alias("lab"),
                                )
                            )
                        ),
                        lambda s: s["lab"],
                    ).alias("labels")
                )
            )
            occ = occ.join(per_v, on="occ_id").withColumn(
                "canon_key", canonical_labeled_udf("mask", "k", "labels")
            )
            occ = occ.withColumn("canon", F.xxhash64("canon_key"))
        else:
            occ = occ.withColumn("canon", canonical_udf("mask", "k"))
        # no duplicate occurrences of the same motif (same vertex set)
        occ = occ.dropDuplicates(["canon", "vertices"])

        # degrees once, reused for every motif (CSE hoisting, SURVEY §4.1)
        deg = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        ex = (
            occ.select("occ_id", F.explode("vertices").alias("id"))
            .join(deg, on="id")
            .groupBy("occ_id")
            .agg(F.sum("deg").alias("sum_deg"))
        )
        # every induced edge (directed or not) contributes 2 to sum_deg
        # (one endpoint appearance on each side), so external links =
        # sum(deg) - 2*m_induced (A7, exDegree semantics)
        occ = occ.join(ex, on="occ_id").withColumn(
            "ex_degree", F.col("sum_deg") - F.lit(2) * F.col("m_induced")
        )
        self._sampled = occ.cache()

        freq_aggs = [F.count(F.lit(1)).alias("freq")]
        if self.labeled:
            freq_aggs.append(F.first("canon_key").alias("canon_key"))
        freq = (
            self._sampled.groupBy("canon", "k")
            .agg(*freq_aggs)
            .where(F.col("freq") >= min_freq)
        )
        self._motifs = freq.cache()

        sel_cols = ["canon", "k", "occ_id", "vertices", "ex_degree", "mask"]
        sel_schema = (
            "canon long, k int, occ_id long, vertices array<long>, "
            "ex_degree long, mask long"
        )
        if self.labeled:
            sel_cols += ["canon_key", "labels"]
            sel_schema += ", canon_key string, labels array<string>"
        # group on (canon, k): canonical masks COLLIDE across motif sizes
        # (e.g. mask 14 names both a k=3 and a k=4 class), so canon alone
        # would pool different-size motifs into one disjointness group
        selected = (
            self._sampled.join(
                self._motifs.select("canon", "k"), on=["canon", "k"]
            )
            .select(*sel_cols)
            .groupBy("canon", "k")
            .applyInPandas(_remove_overlaps, schema=sel_schema)
        )
        self._occurrences = selected.cache()

    def motifs(self) -> DataFrame:
        """(canon, k, freq) sorted by sampled frequency desc (O2)."""
        return self._motifs.orderBy(F.desc("freq"), "canon")

    def occurrences(self, canon: int | None = None) -> DataFrame:
        """Selected node-disjoint occurrences; optionally for one motif."""
        out = self._occurrences
        if canon is not None:
            out = out.where(F.col("canon") == canon)
        return out

    def frequency(self, canon: int) -> int:
        row = self._motifs.where(F.col("canon") == canon).collect()
        return int(row[0]["freq"]) if row else 0

    def top_motifs(self, max_motifs: int = 100) -> DataFrame:
        """Top-K pruning before expensive scoring (O3, default 100)."""
        return self.motifs().limit(max_motifs)
