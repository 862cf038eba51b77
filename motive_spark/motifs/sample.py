"""Seeded distributed sampling of connected k-node subgraphs.

Replaces SimpleSubgraphGenerator (UPlainMotifExtractor.java:135-136).
The reference walks a pointer graph in memory; here each sample grows
by ``k-1`` rounds of frontier joins — gather-scatter over the edge
table, fully distributed, no driver loop beyond the k-1 steps:

  round t: explode current members → join symmetric edges → candidate
  neighbors not yet in the sample → pick ONE per sample by min
  xxhash64(sample, round, candidate, seed) (uniform over the candidate
  set, deterministic given the seed).

Correctness contract (SURVEY §7.3-5): occurrences are connected induced
subgraphs, deterministic under a fixed seed; the exact sampling
distribution need not byte-match the reference's RNG — extractor
invariants + motif-injection recovery are the tests, mirroring the
reference's own (UPlainMotifExtractorTest.java:84-150).

Scale: the per-round join touches n_samples * avg_degree rows; hub
vertices fan out but the per-sample min-hash aggregation is a groupBy
with map-side partial min — skew-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from motive_spark.graph.normalize import dense_index


def seed_states(
    verts: DataFrame,
    n: int,
    n_samples: int,
    min_size: int,
    max_size: int,
    seed: int,
) -> DataFrame:
    """Initial sampler state: (occ_id, k, vertices=[seed vertex]).

    Seed vertices are uniform-with-replacement over the vertex set:
    sample i draws index ``xxhash64(i, seed) mod n`` and is mapped to the
    vertex of that dense rank.  The rank comes from the two-phase
    :func:`dense_index` (per-partition offsets — identical values to a
    global ``row_number`` window, but no single-partition sort), and the
    samples→vertex mapping is a plain equi-join on the index so Catalyst/
    AQE picks broadcast vs shuffle from the actual |V| — no forced
    |V|-row broadcast.
    """
    spark = verts.sparkSession
    vidx = dense_index(verts, "v").withColumnRenamed("id", "vix")
    samples = spark.range(n_samples).select(
        F.col("id").alias("occ_id"),
        (
            F.lit(min_size)
            + F.pmod(F.xxhash64("id", F.lit(seed), F.lit("k")), F.lit(max_size - min_size + 1))
        ).cast("int").alias("k"),
        F.pmod(F.xxhash64("id", F.lit(seed), F.lit("seed_v")), F.lit(n)).alias("vix"),
    )
    return samples.join(vidx, on="vix").select(
        "occ_id", "k", F.array("v").alias("vertices")
    )


def sample_connected_subgraphs(
    edges: DataFrame,
    n_samples: int,
    min_size: int = 3,
    max_size: int = 6,
    seed: int = 42,
    directed: bool = True,
) -> DataFrame:
    """Returns (occ_id: long, vertices: array<long> sorted, k: int).

    ``edges`` are the graph's edges (canonical src<dst rows if
    undirected).  Samples that get stuck before reaching their target
    size (isolated pockets) are dropped, like failed samples in the
    reference's rejection loop.
    """
    spark = edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))

    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .repartition(npart, "src")
        .cache()
    )
    verts = sym.select(F.col("src").alias("v")).distinct()
    n = verts.count()
    if n == 0:
        return spark.createDataFrame([], "occ_id long, vertices array<long>, k int")

    state = seed_states(verts, n, n_samples, min_size, max_size, seed)

    for t in range(1, max_size):
        grow = state.where(F.size("vertices") < F.col("k"))
        done = state.where(F.size("vertices") >= F.col("k"))
        if grow.isEmpty():
            break
        frontier = (
            grow.select("occ_id", "k", "vertices", F.explode("vertices").alias("v"))
            .join(sym, on=[F.col("v") == sym.src])
            .where(~F.array_contains("vertices", F.col("dst")))
        )
        picked = (
            frontier.groupBy("occ_id")
            .agg(
                F.min(
                    F.struct(
                        F.xxhash64("occ_id", F.lit(t), F.col("dst"), F.lit(seed)).alias("h"),
                        F.col("dst").alias("pick"),
                    )
                ).alias("sel")
            )
            .select("occ_id", F.col("sel.pick").alias("pick"))
        )
        grown = (
            grow.join(picked, on="occ_id", how="inner")
            .select(
                "occ_id",
                "k",
                F.array_sort(F.concat("vertices", F.array("pick"))).alias("vertices"),
            )
        )
        # stuck samples (no candidates at all) are dropped
        state = done.unionByName(grown).localCheckpoint(eager=True)

    out = (
        state.where(F.size("vertices") == F.col("k"))
        .select("occ_id", F.array_sort("vertices").alias("vertices"), "k")
    )
    return out


def induced_masks(
    occurrences: DataFrame, edges: DataFrame, directed: bool = True
) -> DataFrame:
    """Attach the induced-subgraph adjacency bitmask to each occurrence.

    Returns (occ_id, vertices, k, mask: long, m_induced: long).
    Explodes each occurrence into its ordered vertex pairs and joins the
    edge table — the induced subgraph is exactly the hit set
    (label-blind, Graphs.blank semantics — Synthetic.java:105).
    """
    pos = occurrences.select(
        "occ_id", "k", F.posexplode("vertices").alias("p", "vtx")
    )
    a = pos.select("occ_id", "k", F.col("p").alias("pi"), F.col("vtx").alias("vi"))
    b = pos.select(
        F.col("occ_id").alias("occ_id_b"),
        F.col("p").alias("pj"),
        F.col("vtx").alias("vj"),
    )
    pairs = a.join(b, on=[a.occ_id == b.occ_id_b]).where(F.col("pi") != F.col("pj"))
    if not directed:
        # vertices are sorted, so pi < pj ⟺ vi < vj: join against the
        # canonical (least, greatest) orientation regardless of input order
        pairs = pairs.where(F.col("pi") < F.col("pj"))
        e = edges.select(
            F.least("src", "dst").alias("vi"), F.greatest("src", "dst").alias("vj")
        ).dropDuplicates()
    else:
        # dropDuplicates matches the undirected branch: duplicate input
        # edges would otherwise make the bit-sum carry (2^b + 2^b = 2^(b+1))
        # and silently corrupt the adjacency mask
        e = edges.select(
            F.col("src").alias("vi"), F.col("dst").alias("vj")
        ).dropDuplicates()
    hits = pairs.join(e, on=["vi", "vj"]).select(
        "occ_id",
        "k",
        "pi",
        "pj",
    )
    # 2^(pi*k+pj) — exact in double for exponents <= 62 (max here:
    # i*k+j <= 7*8+6 = 62 at MAX_K=8 since i != j)
    def _bit(pi, pj):
        return F.pow(F.lit(2.0), (F.col(pi) * F.col("k") + F.col(pj)).cast("double")).cast("long")

    if directed:
        bit = _bit("pi", "pj")
    else:
        # k <= 8 rows use the symmetric k*k-bit layout; k in 9..11 rows
        # switch to upper-triangle packing (bit ut(i,j), i<j — max
        # exponent C(11,2)-1 = 54, exact in double), mirroring
        # motifs.canon.edges_to_mask's per-k dispatch
        ut = (
            F.col("pi") * (2 * F.col("k") - F.col("pi") - 1) / 2
            + (F.col("pj") - F.col("pi") - 1)
        ).cast("double")
        bit = F.when(
            F.col("k") <= 8, _bit("pi", "pj") + _bit("pj", "pi")
        ).otherwise(F.pow(F.lit(2.0), ut).cast("long"))
    hits = hits.select("occ_id", bit.alias("bit"), F.lit(1).alias("cnt"))
    agg = hits.groupBy("occ_id").agg(
        F.sum("bit").alias("mask"), F.sum("cnt").alias("m_induced")
    )
    return occurrences.join(agg, on="occ_id", how="inner")
