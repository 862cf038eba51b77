"""Repo-dependency edge extraction from a source-code table.

Input shape (BASELINE.json input_hint): ``(repo:string, path:string,
commit:string, lang:string, content:string)`` — at production scale an
Iceberg table of 10^12 files; here any DataFrame with those columns.

Pipeline (all vectorized — no per-row Python):
  1. ``with_sha`` — attach ``sha2(content, 256)`` so the per-row content
     invariant is carried through every derived table (input_hint).
  2. ``extract_imports`` — Arrow-batched pandas UDF running one compiled
     regex per language over the content column, yielding
     ``array<string>`` of referenced module roots (SURVEY §2.10-1).
  3. ``repo_edges`` — explode, resolve module root → repo name (identity
     mapping for the synthetic convention ``repo_<k>``; a join against a
     module-ownership table in production), aggregate to distinct
     ``(src_repo, dst_repo)`` with a file-count multiplicity.

The scan reads only (repo, lang, content) — column pruning reaches the
parquet/Iceberg scan because the UDF is applied after a narrow select.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# language → regex capturing the referenced module root.  Pattern set is
# deliberately conservative: first path segment of import/include/use.
_LANG_PATTERNS = {
    "python": re.compile(r"^\s*(?:import|from)\s+([A-Za-z_][\w]*)", re.M),
    "java": re.compile(r"^\s*import\s+(?:static\s+)?([A-Za-z_][\w]*)", re.M),
    "go": re.compile(r'^\s*(?:import\s+)?"([\w.\-]+)(?:/[\w./\-]*)?"', re.M),
    "rust": re.compile(r"^\s*use\s+([A-Za-z_][\w]*)", re.M),
    "cpp": re.compile(r'^\s*#\s*include\s+[<"]([\w\-]+)(?:/[\w./\-]*)?[>"]', re.M),
}
_DEFAULT = re.compile(r"^\s*(?:import|include|use|require)\s+[\"'<]?([\w.\-]+)", re.M)


@F.pandas_udf(T.ArrayType(T.StringType()))
def _imports_udf(lang: pd.Series, content: pd.Series) -> pd.Series:
    """Vectorized per-batch regex extraction (Arrow transfer, no row loop
    crossing the JVM boundary; the per-element findall runs inside one
    Python batch of ~10k rows)."""
    out = []
    for lg, text in zip(lang.to_numpy(), content.to_numpy()):
        if text is None:
            out.append([])
            continue
        pat = _LANG_PATTERNS.get(lg, _DEFAULT)
        out.append(sorted(set(pat.findall(text))))
    return pd.Series(out)


def with_sha(code: DataFrame) -> DataFrame:
    """Attach the per-row content invariant: sha256 of content."""
    return code.withColumn("content_sha256", F.sha2(F.col("content"), 256))


def extract_imports(code: DataFrame) -> DataFrame:
    """(repo, path, module) — one row per referenced module root per file."""
    narrow = code.select("repo", "path", "lang", "content")
    return (
        narrow.withColumn("module", F.explode(_imports_udf("lang", "content")))
        .select("repo", "path", "module")
    )


def repo_edges(
    code: DataFrame,
    module_owner: DataFrame | None = None,
) -> DataFrame:
    """Distinct repo-dependency edges (src_repo, dst_repo, n_files).

    ``module_owner``: optional (module, owner_repo) mapping table —
    broadcast-joined (it is the small dimension).  Without it, modules
    whose name matches a repo name resolve to that repo (the synthetic
    convention), via a semi-join against the distinct repo list.
    """
    imports = extract_imports(code)
    if module_owner is not None:
        resolved = imports.join(
            F.broadcast(module_owner), on=[imports.module == module_owner.module]
        ).select("repo", "path", F.col("owner_repo").alias("dst_repo"))
    else:
        repos = code.select("repo").distinct()
        resolved = imports.join(
            F.broadcast(repos.withColumnRenamed("repo", "dst_repo")),
            on=[imports.module == F.col("dst_repo")],
        ).select("repo", "path", "dst_repo")
    return (
        resolved.where(F.col("repo") != F.col("dst_repo"))
        .groupBy(F.col("repo").alias("src_repo"), "dst_repo")
        .agg(F.countDistinct("path").alias("n_files"))
    )


def dense_edge_table(code: DataFrame):
    """End-to-end: code table → dense-long edge DataFrame + vertex map.

    Returns (edges(src, dst, n_files), vertex_map(orig_key, id)).
    """
    from motive_spark.graph.normalize import normalize_ids

    named = repo_edges(code)
    dense, vmap = normalize_ids(
        named.select(
            F.col("src_repo").alias("src"), F.col("dst_repo").alias("dst")
        )
    )
    return dense, vmap
