"""Round-6 optimization harness — NOT the graded bench (bench.py is
frozen; the driver times that).  This file exists for guide §1
methodology during the optimization round:

* time any SUBSET of __spark_entry__ queries (same clearCache + count
  methodology as bench.py, so numbers are comparable) without paying
  for the whole 90-entry suite;
* optionally repeat each query N times and report every sample;
* optionally evaluate through the noop sink (computes every column,
  unlike count which lets the optimizer prune — guide §1.4);
* optionally dump .explain("formatted") per query to plans/r06/;
* optionally apply extra session confs (A/B of config changes).

Usage:
  python bench_extra.py q1 q2 ...            # time those queries
  REPEATS=2 python bench_extra.py q1         # best/all samples
  NOOP=1 python bench_extra.py q1            # noop sink instead of count
  PLANS=suffix python bench_extra.py q1      # write plans/r06/q1_<suffix>.txt
  EXTRA_CONF="k=v;k2=v2" python bench_extra.py q1
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("REPEATS", "1"))
NOOP = os.environ.get("NOOP", "") == "1"
PLANS = os.environ.get("PLANS", "")


def main() -> None:
    import __spark_entry__ as em
    from motive_spark.session import get_spark

    extra_conf = {}
    for kv in os.environ.get("EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra_conf[k.strip()] = v.strip()

    spark = get_spark(
        "bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf=extra_conf,
    )
    qs = em.queries()
    names = [a for a in sys.argv[1:] if a in qs]
    unknown = [a for a in sys.argv[1:] if a not in qs]
    if unknown:
        print(f"unknown queries skipped: {unknown}", file=sys.stderr)

    out: dict[str, object] = {"sf_dir": SF_DIR, "cpus": CPUS, "noop": NOOP}
    samples: dict[str, list[float]] = {}
    for name in names:
        samples[name] = []
        for rep in range(REPEATS):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name}#{rep}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            if NOOP:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples[name].append(round(time.time() - t0, 3))
            if PLANS and rep == 0:
                os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
                path = os.path.join(
                    REPO, "plans", "r06", f"{name}_{PLANS}.txt"
                )
                with open(path, "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    ))
        spark.sparkContext.setJobDescription(None)
    out["samples"] = samples
    out["best"] = {k: min(v) for k, v in samples.items()}
    out["total_best"] = round(sum(min(v) for v in samples.values()), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
