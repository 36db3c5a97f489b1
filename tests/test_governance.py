"""Behavioral tests for the governance operators beyond oracle parity
(tests/test_oracle_parity.py value-checks both vs DuckDB):

- gdpr_forget_audit: the per-table accounting must reconcile against an
  independently computed purge (rows_total = purge + after; the
  transitive lineitem reach must equal the brute-force order-chase);
- k_anonymity_profile: group sizes must partition the dimension
  exactly, shares must sum to 1, and the violation flag must match k.
"""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_gdpr_forget_audit_reconciles(spark):
    from retail_sales_project_bigdata_spark.operators.governance import (
        FORGET_MOD,
        FORGET_REMAINDER,
        gdpr_forget_audit,
    )

    audit = {
        r.table_name: r for r in gdpr_forget_audit(spark, SF_SMALL).collect()
    }
    assert set(audit) == {"events", "customer", "orders", "lineitem"}

    events = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    lineitem = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").collect()
    customer = spark.read.parquet(f"{SF_SMALL}/customer.parquet").collect()

    forget = {
        r.user_id
        for r in events
        if r.user_id % FORGET_MOD == FORGET_REMAINDER
    }
    assert forget, "fixture produced an empty forget-set"

    for r in audit.values():
        assert r.rows_total == r.rows_to_purge + r.rows_after

    ev_hit = [r for r in events if r.user_id in forget]
    assert audit["events"].rows_to_purge == len(ev_hit)
    assert audit["events"].subjects == len({r.user_id for r in ev_hit})

    cu_hit = [r for r in customer if r.c_custkey in forget]
    assert audit["customer"].rows_to_purge == len(cu_hit)

    or_hit = [r for r in orders if r.o_custkey in forget]
    assert audit["orders"].rows_to_purge == len(or_hit)
    assert audit["orders"].subjects == len({r.o_custkey for r in or_hit})

    # transitive reach: lineitem rows whose order belongs to a subject
    hit_orderkeys = {r.o_orderkey for r in or_hit}
    li_hit = [r for r in lineitem if r.l_orderkey in hit_orderkeys]
    assert audit["lineitem"].rows_to_purge == len(li_hit)
    assert audit["lineitem"].rows_total == len(lineitem)


def test_k_anonymity_profile_partitions_dimension(spark):
    from retail_sales_project_bigdata_spark.operators.governance import (
        ACCTBAL_BAND,
        K_ANON,
        k_anonymity_profile,
    )

    rows = k_anonymity_profile(spark, SF_SMALL).collect()
    customer = spark.read.parquet(f"{SF_SMALL}/customer.parquet").collect()

    assert sum(r.group_n for r in rows) == len(customer)
    assert abs(sum(r.group_share for r in rows) - 1.0) < 1e-9
    seen = set()
    for r in rows:
        key = (r.c_nationkey, r.c_mktsegment, r.acctbal_band)
        assert key not in seen, "duplicate QI group"
        seen.add(key)
        assert r.violates_k == int(r.group_n < K_ANON)
        assert r.group_share == r.group_n / len(customer)

    # brute-force group sizes
    import math
    from collections import Counter

    expect = Counter(
        (
            c.c_nationkey,
            c.c_mktsegment,
            int(math.floor(c.c_acctbal / ACCTBAL_BAND)),
        )
        for c in customer
    )
    got = {(r.c_nationkey, r.c_mktsegment, r.acctbal_band): r.group_n for r in rows}
    assert got == dict(expect)
