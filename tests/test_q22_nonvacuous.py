"""Non-vacuous engine-vs-oracle check of tpch_q22 (round 14).

The driver grades at sf0.01, where Q22 — above-average-balance customers
with no orders — returns the EMPTY set (it also returns 0 rows at
sf0.001; the shipped tiers only produce 1-2 rows from sf0.1 upward). So
every graded parity row for tpch_q22 has compared empty sets: true, but
it exercises neither the cross-multiplied decimal threshold, the
positive-balance average filter, nor the anti join. Same vacuity class
the round-13 audit-cap test closed for embedding_dedup_cosine
(VERDICT r13 "What's wrong": a green oracle row is not evidence if the
result set is structurally empty).

This test builds a synthetic customer/orders pair where every clause is
load-bearing, and pins Spark == DuckDB == a hand-computed expectation:

- four above-average customers, one of which HAS orders (anti join must
  drop exactly that one);
- a customer whose balance is EXACTLY the positive-balance mean
  (bal*n == s): the strict ``>`` must exclude it — and because the
  fixture also plants a negative-balance and a zero-balance customer,
  including either in the average would drag the mean below that
  boundary customer and wrongly admit it, so its absence additionally
  proves the ``c_acctbal > 0`` average filter in both engines;
- an orphan order (no matching customer) that must not disturb the
  anti join;
- two output country-code groups, one with two members (aggregation and
  the decimal-rounded total are both checked by value).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_warehouse_flink_spark.registry import all_queries

QUERY = all_queries()["tpch_q22"]

# (c_custkey, c_nationkey, c_acctbal, has_order)
# Positive balances: 700*4 + 500 + 100*2 -> s=3500, n=7, mean=500 exactly.
CUSTOMERS = (
    (1, 3, 700.00, False),   # qualifies, cntrycode 3
    (2, 7, 700.00, False),   # qualifies, cntrycode 2
    (3, 13, 700.00, False),  # qualifies, cntrycode 3
    (4, 4, 700.00, True),    # above average but HAS orders -> anti-joined
    (5, 1, 500.00, False),   # boundary: 500*7 == 3500, strict > excludes
    (6, 2, 100.00, False),   # below average
    (7, 2, 100.00, True),    # below average, order irrelevant
    (8, 0, -50.00, False),   # negative: out of the average, cannot qualify
    (9, 6, 0.00, False),     # zero: the > 0 average filter boundary
)
# cust 4 twice (dup order must not double-drop), cust 7, and an orphan key.
ORDER_CUSTKEYS = (4, 4, 7, 9999)

# Hand-computed: custs 1,3 -> code 3 (1400.00); cust 2 -> code 7%5=2.
EXPECTED = {(3, 2, 1400.00), (2, 1, 700.00)}


@pytest.fixture(scope="module")
def q22_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("q22_fixture")
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([c[0] for c in CUSTOMERS], pa.int64()),
                "c_name": pa.array([f"Customer#{c[0]}" for c in CUSTOMERS]),
                "c_nationkey": pa.array(
                    [c[1] for c in CUSTOMERS], pa.int32()
                ),
                "c_acctbal": pa.array(
                    [c[2] for c in CUSTOMERS], pa.float64()
                ),
                "c_mktsegment": pa.array(["BUILDING"] * len(CUSTOMERS)),
            }
        ),
        d / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(
                    range(1, len(ORDER_CUSTKEYS) + 1), pa.int64()
                ),
                "o_custkey": pa.array(ORDER_CUSTKEYS, pa.int64()),
            }
        ),
        d / "orders.parquet",
    )
    return d


def _rows(result) -> set[tuple[int, int, float]]:
    return {
        (int(code), int(n), float(tot)) for code, n, tot in result
    }


def test_q22_planted_fixture_three_way(spark, q22_dir):
    got = _rows(
        (r.cntrycode, r.numcust, r.totacctbal)
        for r in QUERY.spark_fn(spark, str(q22_dir)).collect()
    )

    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{q22_dir}/{t}.parquet'"
        )
    want = _rows(con.execute(QUERY.oracle).fetchall())

    assert got == EXPECTED  # Spark == hand computation (non-empty!)
    assert want == EXPECTED  # DuckDB oracle == hand computation
    # Specifically: the boundary customer (exact mean) and the ordered
    # above-average customer are absent, so strict-> and anti join are
    # both proven load-bearing, not just agreed-upon.
    qualifying_codes = {c for c, _, _ in got}
    assert 1 % 5 not in qualifying_codes  # cust 5 (nation 1) excluded
    assert 4 % 5 not in qualifying_codes  # cust 4 (nation 4) anti-joined


def test_q22_average_filter_is_load_bearing(spark, q22_dir):
    """Sanity that the fixture's boundary design actually bites: if the
    negative- or zero-balance customers WERE included in the average, the
    mean would drop below the boundary customer's 500 and it would
    qualify — i.e. the previous test's exclusion assertion is not
    vacuous."""
    balances = [c[2] for c in CUSTOMERS]
    n_all, s_all = len(balances), sum(balances)
    assert 500.0 * n_all > s_all  # unfiltered average would admit cust 5
    pos = [b for b in balances if b > 0]
    assert 500.0 * len(pos) == sum(pos)  # filtered average excludes it
