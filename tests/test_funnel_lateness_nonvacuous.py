"""Non-vacuous semantic pins for conversion_funnel and
events_late_arrival_profile (round 14).

The round-14 vacuity audit generalized the r13 lesson one step further:
a query can return NON-empty results that still fail to exercise its
distinguishing logic. At every routine tier the shipped events table
produces a DEGENERATE answer for these two:

- ``conversion_funnel`` reads 150/150/150 at sf0.01 — every viewer
  clicks after viewing and purchases after clicking, so an unordered
  "user has all three event types" implementation would emit the exact
  same numbers; the min-timestamp CHAINING (click strictly after first
  view, purchase strictly after that click) has never been separated
  from set-intersection by the data.
- ``events_late_arrival_profile`` reads a single all-on-time band with
  max_late_us = 0 — the per-user high-water-mark subtraction and all
  three lateness band boundaries are dead code on the shipped tiers.

These tests plant events where ordering and lateness are load-bearing
and pin Spark == DuckDB oracle == a hand-computed expectation,
including the strict/closed boundary at every band edge.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_warehouse_flink_spark.registry import all_queries

FUNNEL = all_queries()["conversion_funnel"]
LATENESS = all_queries()["events_late_arrival_profile"]

EPOCH = dt.datetime(2024, 3, 1, 0, 0, 0)


def _ts(seconds: float) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=seconds)


# (user_id, event_type, t_seconds) in ARRIVAL order (event_id = index).
# Hand-computed funnel:
#   n_view               = {1,2,3,4,5,7,8}            -> 7
#   n_view_click         = {1,2,8}                    -> 3
#   n_view_click_purchase= {1}                        -> 1
FUNNEL_EVENTS = (
    (1, "view", 10), (1, "click", 20), (1, "purchase", 30),  # full chain
    (1, "scroll", 15),                    # non-funnel type is ignored
    (2, "view", 10), (2, "click", 20),    # no purchase
    (3, "view", 10),                      # view only
    (4, "click", 10), (4, "view", 20), (4, "purchase", 30),
    # ^ click BEFORE first view: an unordered impl counts u4 fully; the
    #   chained funnel counts it as view-only (purchase needs a t2).
    (5, "purchase", 10), (5, "click", 20), (5, "view", 30),  # reversed
    (6, "click", 10), (6, "purchase", 20),  # never viewed: in no stage
    (7, "view", 10), (7, "click", 10), (7, "purchase", 20),
    # ^ click ts == first-view ts: strict > excludes it -> view only
    (8, "view", 10), (8, "click", 20), (8, "purchase", 20),
    # ^ purchase ts == click ts: strict > excludes it -> view+click
)
FUNNEL_EXPECTED = (7, 3, 1)

# (user_id, t_seconds) in ARRIVAL order. late = hwm(user, so-far) - ts.
# uA strictly increasing -> 3x on-time (late 0 each).
# uB: hwm 1000, then ts 970 -> late 30 s   -> '<1m'  (max 30_000_000)
#     then ts 940           -> late 60 s   -> '<1h'  (boundary: NOT <1m)
# uC: hwm 5000, then 5000-1800 -> late 30m -> '<1h'
#     then 5000-3600         -> late 1 h   -> '>=1h' (boundary: NOT <1h)
#     then 5000-7200         -> late 2 h   -> '>=1h' (max 7_200_000_000)
# Expected bands:
#   on-time: uA x3 + the two hwm-setters of uB/uC + uC ts 6000? (below)
LATENESS_EVENTS = (
    ("A", 100), ("A", 200), ("A", 300),
    ("B", 1000), ("B", 970), ("B", 940),
    ("C", 5000), ("C", 3200), ("C", 1400), ("C", -2200),
)
# on-time: A100, A200, A300, B1000, C5000 -> 5 events, max_late 0
# '<1m':  B970 (30 s)                     -> 1 event,  max 30_000_000
# '<1h':  B940 (60 s), C3200 (1800 s)     -> 2 events, max 1_800_000_000
# '>=1h': C1400 (3600 s), C-2200 (7200 s) -> 2 events, max 7_200_000_000
LATENESS_EXPECTED = {
    ("on-time", 5, 0),
    ("<1m", 1, 30_000_000),
    ("<1h", 2, 1_800_000_000),
    (">=1h", 2, 7_200_000_000),
}


def _write_events(d, rows):
    """rows: (user_id:int, event_type:str, t_seconds) with event_id =
    arrival index, matching the shipped events schema."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [_ts(t) for _, _, t in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array(
                    [int(u) for u, _, _ in rows], pa.int64()
                ),
                "event_type": pa.array([e for _, e, _ in rows]),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        d / "events.parquet",
    )


def _oracle(d, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    return con.execute(sql).fetchall()


def test_funnel_ordering_is_load_bearing(spark, tmp_path):
    _write_events(tmp_path, FUNNEL_EVENTS)
    row = FUNNEL.spark_fn(spark, str(tmp_path)).collect()[0]
    got = (row.n_view, row.n_view_click, row.n_view_click_purchase)
    assert got == FUNNEL_EXPECTED
    assert tuple(_oracle(tmp_path, FUNNEL.oracle)[0]) == FUNNEL_EXPECTED
    # The design is non-vacuous by construction: a set-intersection
    # funnel ("user has all three types") would count u4, u5, u7, u8 in
    # the purchase stage too.
    unordered = len({u for u, _, _ in FUNNEL_EVENTS
                     if {"view", "click", "purchase"}
                     <= {e for uu, e, _ in FUNNEL_EVENTS if uu == u}})
    assert unordered == 5 and unordered != FUNNEL_EXPECTED[2]


def test_lateness_bands_and_boundaries(spark, tmp_path):
    rows = [(ord(u), "view", t) for u, t in LATENESS_EVENTS]
    _write_events(tmp_path, rows)
    got = {
        (r.lateness_band, r.n_events, r.max_late_us)
        for r in LATENESS.spark_fn(spark, str(tmp_path)).collect()
    }
    assert got == LATENESS_EXPECTED
    want = {tuple(r) for r in _oracle(tmp_path, LATENESS.oracle)}
    assert want == LATENESS_EXPECTED
    # Boundary pins baked into the fixture: late == 60 s lands in '<1h'
    # (strict < 1m), late == 3600 s lands in '>=1h' (strict < 1h), and
    # late == 0 (a repeated hwm would tie) is 'on-time' (<= 0).
