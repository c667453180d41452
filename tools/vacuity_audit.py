"""Standing vacuity audit — the r13/r14 lesson as an enforced invariant.

A green oracle-parity row is NOT evidence if the compared result set is
structurally empty: the r13 rotation found `embedding_dedup_cosine`'s
parity had only ever compared empty sets (its pair math was untested by
any graded run), and the r14 exhaustive sweep found `tpch_q22` in the
same class. Both now carry planted-data non-vacuous pins (three-way
Spark == DuckDB == hand-computed). This tool turns that one-off sweep
into a standing close step: it runs EVERY registered DuckDB oracle —
oracle side only, row COUNTS, so no Spark session and ~35 s per tier —
at the routine evidence tiers (sf0.001 = in-suite, sf0.01 =
driver-graded) and compares the set of queries empty at ALL routine
tiers against the pinned manifest ``tests/vacuity_manifest.json``.

A query that newly becomes vacuous — via a registration, an oracle edit,
or a testdata change — fails the audit until it either stops being
vacuous or gains a planted-data test plus a conscious manifest entry.
A manifest entry whose query is no longer vacuous also fails (stale
pins rot just like stale skips — same philosophy as the skip manifest).

Usage:
    python tools/vacuity_audit.py --round N [--data-root /root/testdata]

Writes ``VACUITY_r{N}.json`` at the repo root (counts per query per
tier + the verdict); exits 1 on any manifest violation. ``--round`` is
required for the same reason as in sf1_spot: inferring it from the
BENCH ledger is ambiguous on both sides of the driver's write.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:  # `python tools/vacuity_audit.py` from anywhere
    sys.path.insert(0, REPO_ROOT)

MANIFEST_PATH = os.path.join(REPO_ROOT, "tests", "vacuity_manifest.json")

# The routine evidence tiers: every oracle-bearing query is compared at
# sf0.001 by the in-suite parity tests and at sf0.01 by the driver's
# per-round grading. "Vacuous" means empty at BOTH — a query non-empty at
# either tier has its logic exercised by at least one routine comparison.
ROUTINE_TIERS = ("sf0.001", "sf0.01")


def oracle_row_counts(data_root: str, tier: str) -> dict:
    """Row count of every registered DuckDB oracle at one tier.

    Counts only — `SELECT count(*) FROM (<oracle>)` — so the sweep needs
    no Spark session and no value materialization; the VALUES are already
    compared by the parity suite and the driver. This sweep answers the
    one question those comparisons cannot: is the comparison non-vacuous?
    """
    import duckdb

    from data_warehouse_flink_spark.registry import all_queries
    from data_warehouse_flink_spark.schemas import TESTDATA_TABLES

    sf_dir = os.path.join(data_root, tier)
    con = duckdb.connect()
    # Same spill cap as the parity harness (round-12 lesson): fail fast
    # instead of filling the disk if an oracle goes pathological.
    con.execute("SET max_temp_directory_size='20GiB'")
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    counts = {}
    try:
        for name, q in all_queries().items():
            if not q.oracle:
                continue
            counts[name] = con.execute(
                f"SELECT count(*) FROM ({q.oracle})"
            ).fetchone()[0]
    finally:
        con.close()
    return counts


def empty_at_all_tiers(counts_by_tier: dict) -> list:
    """Sorted names whose oracle returns 0 rows at EVERY audited tier."""
    tiers = list(counts_by_tier)
    names = set(counts_by_tier[tiers[0]])
    for t in tiers[1:]:
        names &= set(counts_by_tier[t])
    return sorted(
        n for n in names if all(counts_by_tier[t][n] == 0 for t in tiers)
    )


def manifest_violations(
    empty: list, manifest: dict, tiers: tuple, repo_root: str = REPO_ROOT
) -> list:
    """Pure comparator: audit result vs the pinned manifest.

    Violations (each a human-readable string):
    - a query is vacuous but not pinned (needs a planted-data test +
      a conscious manifest entry);
    - a pinned query is no longer vacuous (stale entry — delete it);
    - a pinned entry's cited non-vacuous test file does not exist or
      does not mention the query by name (the pin must point at real,
      findable coverage);
    - the audited tier set differs from the manifest's pinned tiers
      (the definition of "routine" changed without updating the pin).
    """
    out = []
    pinned = manifest.get("empty_at_all_routine_tiers", {})
    if list(tiers) != manifest.get("routine_tiers"):
        out.append(
            f"audited tiers {list(tiers)} != pinned "
            f"{manifest.get('routine_tiers')}"
        )
    for name in empty:
        if name not in pinned:
            out.append(
                f"{name}: oracle empty at all routine tiers but not in the "
                "manifest — its parity rows compare empty sets; add a "
                "planted-data non-vacuous test, then pin it"
            )
    for name, entry in pinned.items():
        if name not in empty:
            out.append(
                f"{name}: pinned as vacuous but its oracle now returns rows "
                "— delete the stale manifest entry"
            )
        test_rel = entry.get("nonvacuous_test", "")
        test_path = os.path.join(repo_root, test_rel)
        if not test_rel or not os.path.isfile(test_path):
            out.append(f"{name}: cited test '{test_rel}' does not exist")
        else:
            with open(test_path, encoding="utf-8") as fh:
                if name not in fh.read():
                    out.append(
                        f"{name}: cited test '{test_rel}' never mentions "
                        "the query by name"
                    )
    return out


def run_audit(data_root: str, tiers: tuple = ROUTINE_TIERS) -> dict:
    counts_by_tier = {t: oracle_row_counts(data_root, t) for t in tiers}
    empty = empty_at_all_tiers(counts_by_tier)
    with open(MANIFEST_PATH, encoding="utf-8") as fh:
        manifest = json.load(fh)
    violations = manifest_violations(empty, manifest, tiers)
    return {
        "tiers": list(tiers),
        "oracle_bearing": len(counts_by_tier[tiers[0]]),
        "empty_at_all_tiers": empty,
        "empty_per_tier": {
            t: sorted(n for n, c in counts_by_tier[t].items() if c == 0)
            for t in tiers
        },
        "violations": violations,
        "ok": not violations,
        "counts": {t: counts_by_tier[t] for t in tiers},
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--data-root", default="/root/testdata")
    args = ap.parse_args()

    result = run_audit(args.data_root)
    result["round"] = args.round
    out_path = os.path.join(REPO_ROOT, f"VACUITY_r{args.round:02d}.json")
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"{out_path}: {result['oracle_bearing']} oracles, "
        f"empty-at-all-tiers {result['empty_at_all_tiers']}, "
        f"{'OK' if result['ok'] else 'VIOLATIONS:'}"
    )
    for v in result["violations"]:
        print(f"  - {v}")
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
