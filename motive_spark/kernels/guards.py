"""Input guards for the ``pre_partitioned=True`` fast path.

``pre_partitioned=True`` on pagerank / connected_components /
label_propagation declares the caller already symmetrized, deduped,
de-self-looped, and bucketed the edge table to match
``spark.sql.shuffle.partitions``.  A violated declaration does not
crash — it silently returns wrong ranks/components/labels.  This guard
makes misuse loud:

* always (metadata-only): warn when the input's partition count does
  not match the session's shuffle partitioning — the zero-exchange
  plan the flag promises silently degrades to an extra exchange
  (results stay correct, the speed contract doesn't);
* under ``spark.conf motive_spark.validate.prePartitioned=true`` (or a
  truthy ``MOTIVE_SPARK_VALIDATE`` env var): a SAMPLED data check —
  take a bounded sample of edges and verify each (src, dst) has its
  (dst, src) twin, no self loops, no duplicates.  One broadcast-side
  join of the sample against the edge table; cheap at test scale,
  opt-in at 100-TB scale (it reads the edge table once).
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SAMPLE = 100


def _validation_enabled(spark) -> bool:
    conf = spark.conf.get("motive_spark.validate.prePartitioned", "")
    env = os.environ.get("MOTIVE_SPARK_VALIDATE", "")
    return str(conf).lower() == "true" or env.lower() in ("1", "true")


def check_pre_partitioned(
    sym: DataFrame, npart: int, kernel: str, require_symmetric: bool = True
) -> None:
    """Call with the caller-supplied edge table when
    ``pre_partitioned=True``; warns/raises per the module contract.
    ``require_symmetric=False`` for kernels that consume the directed
    edge table (pagerank) — those only require dedup + no self-loops +
    bucketing."""
    parts = sym.rdd.getNumPartitions()
    if parts != npart:
        warnings.warn(
            f"{kernel}(pre_partitioned=True): input has {parts} "
            f"partitions but spark.sql.shuffle.partitions={npart} — the "
            "zero-exchange superstep plan will re-shuffle; bucket the "
            "table with the session's partition count",
            RuntimeWarning,
            stacklevel=3,
        )
    if not _validation_enabled(sym.sparkSession):
        return
    sample = sym.limit(_SAMPLE)
    bad_loop = sample.where(F.col("src") == F.col("dst")).limit(1).count()
    if bad_loop:
        raise ValueError(
            f"{kernel}(pre_partitioned=True): input contains self-loops"
        )
    if require_symmetric:
        rev = sample.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
        missing = (
            F.broadcast(rev)
            .join(
                sym.select("src", "dst"), on=["src", "dst"], how="left_anti"
            )
            .limit(1)
            .count()
        )
        if missing:
            raise ValueError(
                f"{kernel}(pre_partitioned=True): sampled edge has no "
                "reverse twin — input is not symmetrized"
            )
    dup = (
        F.broadcast(sample.select("src", "dst"))
        .join(sym.select("src", "dst"), on=["src", "dst"], how="inner")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            f"{kernel}(pre_partitioned=True): sampled edge appears more "
            "than once — input is not deduplicated"
        )
