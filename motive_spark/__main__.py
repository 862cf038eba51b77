"""CLI surface mirroring the reference's Run.java executable
(``java -jar motive.jar [options]``, Run.java:20-130) so a user of the
reference can run the same experiments against Spark:

    python -m motive_spark --type fast --file edges.tsv --samples 100000
    python -m motive_spark --type full --file g.gml --filetype gml
    python -m motive_spark --type synth --synth.instances 0,10,100

Flag names follow the reference (``--type``, ``--file``, ``--filetype``
edgelist|gml|parquet, ``--undirected``, ``--samples``, ``--minsize``,
``--maxsize``, ``--maxmotifs``, ``--fast.max-rw``, ``--full.depth``,
``--synth.*``); ``preload`` is replaced by ``--type convert`` (Parquet
IS the disk-backed format here), and ``class``/KONECT are out of scope
in this environment.
"""

from __future__ import annotations

import argparse
import json
import sys


def _load_edges(spark, path: str, filetype: str, undirected: bool):
    from pyspark.sql import functions as F

    if filetype == "gml":
        from motive_spark.graph.gml import read_gml

        out = read_gml(spark, path)
        return out["edges"], (not undirected and out["directed"])
    if filetype == "parquet":
        return spark.read.parquet(path).select("src", "dst"), not undirected
    # edgelist: two tab- (or whitespace-) separated integers per line
    raw = spark.read.text(path)
    split = F.split(F.trim("value"), r"\s+")
    edges = (
        raw.where(F.trim("value") != "")
        .where(~F.col("value").startswith("#"))
        .select(
            F.element_at(split, 1).cast("long").alias("src"),
            F.element_at(split, 2).cast("long").alias("dst"),
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    return edges, not undirected


def _run_kernel(args, edges):
    """Dispatch --type kernel to the library kernels (results land as
    Parquet under --output)."""
    import motive_spark.kernels as K
    from motive_spark.graph import (
        degree_assortativity,
        local_clustering_coefficients,
        vertices,
    )
    from pyspark.sql import functions as F

    if args.kernel == "pagerank":
        return K.pagerank(edges, max_iter=args.iterations, tol=None)
    if args.kernel == "weighted_pagerank":
        e = edges if "mult" in edges.columns else edges.withColumn(
            "mult", F.lit(1)
        )
        return K.weighted_pagerank(e, max_iter=args.iterations)
    if args.kernel == "personalized_pagerank":
        if args.kernel_seeds:
            seeds = [int(x) for x in args.kernel_seeds.split(",")]
        else:
            seeds = [
                int(r["id"])
                for r in vertices(edges).orderBy("id").limit(5).collect()
            ]
        return K.personalized_pagerank(edges, seeds, max_iter=args.iterations)
    if args.kernel == "hits":
        return K.hits(edges, max_iter=args.iterations)
    if args.kernel == "connected_components":
        return K.connected_components(edges)
    if args.kernel == "scc":
        return K.strongly_connected_components(edges)
    if args.kernel == "label_propagation":
        return K.label_propagation(edges, iters=args.iterations)
    if args.kernel == "triangle_count":
        return K.triangle_count(edges)
    if args.kernel == "k_core":
        return K.k_core(edges, args.k)
    if args.kernel == "clustering":
        return local_clustering_coefficients(edges)
    if args.kernel == "assortativity":
        return degree_assortativity(edges)
    if args.kernel in ("sssp", "harmonic"):
        if args.kernel_seeds:
            seeds = [int(x) for x in args.kernel_seeds.split(",")]
        else:
            seeds = [
                int(r["id"])
                for r in vertices(edges).orderBy("id").limit(5).collect()
            ]
        if args.kernel == "sssp":
            w = "mult" if "mult" in edges.columns else None
            return K.shortest_paths(
                edges, seeds, weight_col=w, max_rounds=args.iterations
            )
        return K.harmonic_centrality(edges, seeds, rounds=args.iterations)
    raise ValueError(args.kernel)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m motive_spark",
        description="PySpark-native motif analysis (reference-parity CLI)",
    )
    p.add_argument("--type", default="fast",
                   choices=["fast", "full", "synth", "convert", "kernel"])
    p.add_argument("--kernel", default="pagerank",
                   choices=["pagerank", "personalized_pagerank",
                            "weighted_pagerank", "hits",
                            "connected_components", "scc",
                            "label_propagation", "triangle_count",
                            "k_core", "clustering", "assortativity",
                            "sssp", "harmonic"],
                   help="--type kernel: which link-graph kernel to run")
    p.add_argument("--iterations", type=int, default=10,
                   help="--type kernel: superstep count for iterative kernels")
    p.add_argument("--k", type=int, default=3,
                   help="--type kernel: k for k_core")
    p.add_argument("--kernel.seeds", dest="kernel_seeds", default="",
                   help="--type kernel: comma-separated seed vertices for "
                        "personalized_pagerank")
    p.add_argument("--file", dest="file")
    p.add_argument("--filetype", default="edgelist",
                   choices=["edgelist", "gml", "parquet"])
    p.add_argument("--undirected", action="store_true")
    p.add_argument("--samples", type=int, default=100_000)
    p.add_argument("--minsize", type=int, default=3)
    p.add_argument("--maxsize", type=int, default=6)
    p.add_argument("--maxmotifs", type=int, default=100)
    p.add_argument("--fast.max-rw", dest="max_rw", type=int, default=500_000)
    p.add_argument("--full.depth", dest="ds_depth", type=int, default=3)
    p.add_argument("--full.iterations", dest="ds_iterations", type=int, default=50)
    p.add_argument("--simplify", dest="simplify", action="store_true", default=True)
    p.add_argument("--no-simplify", dest="simplify", action="store_false",
                   help="raw multigraph codelength path (Compare.java:140)")
    p.add_argument("--synth.instances", dest="synth_instances", default="0,10,100")
    p.add_argument("--synth.n", dest="synth_n", type=int, default=5000)
    p.add_argument("--synth.m", dest="synth_m", type=int, default=10000)
    p.add_argument("--synth.maxdegree", dest="synth_maxdeg", type=int, default=5)
    p.add_argument("--output", default="./output")
    p.add_argument("--master", default="local[*]")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    from motive_spark.session import get_spark

    spark = get_spark("motive_spark_cli", master=args.master)

    if args.type == "synth":
        from motive_spark.motifs.synthetic import synthetic_experiment

        counts = [int(x) for x in args.synth_instances.split(",")]
        tri = [(0, 1), (1, 2), (0, 2)]
        res = synthetic_experiment(
            spark, tri, 3, counts, samples=args.samples, seed=args.seed,
            n_noise=args.synth_n, m_noise=args.synth_m,
            max_degree=args.synth_maxdeg,
        )
        print(json.dumps(res, indent=1))
        return 0

    if not args.file:
        p.error("--file is required for fast/full/convert")
    edges, directed = _load_edges(spark, args.file, args.filetype, args.undirected)
    if args.undirected:
        directed = False

    if args.type == "kernel":
        out_df = _run_kernel(args, edges)
        out_df.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"kernel": args.kernel, "written": args.output,
                          "rows": out_df.count()}))
        return 0

    if args.type == "convert":
        # the preload analogue: materialize to the disk-backed format
        edges.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"written": args.output, "edges": edges.count()}))
        return 0

    from motive_spark.experiment import fast_experiment

    meta = fast_experiment(
        edges,
        args.output,
        samples=args.samples,
        min_size=args.minsize,
        max_size=args.maxsize,
        max_motifs=args.maxmotifs,
        directed=directed,
        seed=args.seed,
        search_depth=args.ds_depth,
        with_beta=(args.type == "full"),
        beta_iterations=args.ds_iterations,
        max_rw=args.max_rw,
        simplify=args.simplify,
    )
    print(json.dumps(meta, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
