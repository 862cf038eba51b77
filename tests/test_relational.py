"""Semantic tests for the relational contract queries (the hash-match
contract vs DuckDB is checked by tools/check_contract.py; these pin the
*business* invariants on the tiny SF so regressions localize fast)."""

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")


def test_tpch_q5_semantics(spark, sf_tiny):
    import __spark_entry__ as em

    out = em.q_tpch_q5(spark, sf_tiny)
    rows = out.collect()
    # every returned nation must be in the ASIA region
    nation = spark.read.parquet(f"{sf_tiny}/nation.parquet")
    region = spark.read.parquet(f"{sf_tiny}/region.parquet")
    asia = {
        r.n_name
        for r in nation.join(
            region,
            (nation.n_regionkey == region.r_regionkey)
            & (region.r_name == em.Q5_REGION),
        ).collect()
    }
    for r in rows:
        assert r.n_name in asia
        assert r.revenue_c4 > 0
    # descending revenue order
    revs = [r.revenue_c4 for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_tpch_q18_semantics(spark, sf_tiny):
    import __spark_entry__ as em

    out = em.q_tpch_q18(spark, sf_tiny).collect()
    for r in out:
        assert r.sum_qty_c > em.Q18_QTY_THRESHOLD * 100
    # re-derive one order's quantity sum independently
    if out:
        ok = out[0].o_orderkey
        li = spark.read.parquet(f"{sf_tiny}/lineitem.parquet")
        truth = (
            li.where(F.col("l_orderkey") == ok)
            .agg(
                F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
            )
            .collect()[0][0]
        )
        assert truth == out[0].sum_qty_c


def test_tpch_q7_q10_semantics(spark, sf_tiny):
    import __spark_entry__ as em

    q7 = em.q_tpch_q7(spark, sf_tiny).collect()
    pairs = {(r.supp_nation, r.cust_nation) for r in q7}
    assert pairs <= {
        (em.Q7_NATION_A, em.Q7_NATION_B),
        (em.Q7_NATION_B, em.Q7_NATION_A),
    }
    assert all(r.revenue_c4 > 0 for r in q7)

    q10 = em.q_tpch_q10(spark, sf_tiny).collect()
    assert len(q10) <= 20
    revs = [r.revenue_c4 for r in q10]
    assert revs == sorted(revs, reverse=True)
