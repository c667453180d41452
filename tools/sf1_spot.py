"""Standing sf1 parity spot sweep (VERDICT r12 #3).

The one-off full 172-oracle sweep at the generated sf1 tier (round 12)
caught a real cross-engine bug that is invisible below sf1 (the A-ES
nano-unit rounding boundary) — but a full sweep costs ~10 h and is not a
per-round cost. This tool pins the directive's compromise as a standing
close step: a ~15-query sf1 spot set, re-run every round, composed of

  (1) the ALWAYS family — the A-ES / weighted-sampling / rounding-boundary
      queries, because that is exactly the class whose failures only
      surface at volume; plus
  (2) a ROTATING slice — the head of this round's registry rotation cohort
      (``_GRADING_PRIORITY[22:]``, the oldest-evidence queries being
      re-proven by the driver this round), so over rounds the spot set
      walks the whole registry in the same cadence as the driver prefix.

Each query runs the suite's own oracle-parity test
(tests/test_oracle_parity.py::test_query_matches_oracle) with
SPARK_GRAFT_TEST_SF pointed at the generated sf1 tier, in small batches so
one runaway DuckDB spill cannot take the rest of the sweep down (the
harness also caps DuckDB temp at 20 GiB). Results land in
SF1_SPOT_r{N}.json and the NOTES.md close receipt cites it.

Usage:
    python tools/testdata_gen.py 1 .localdata/gensf1   # once per box
    python tools/sf1_spot.py --round N [--data DIR] [--size K]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import xml.etree.ElementTree as ET

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:  # `python tools/sf1_spot.py` from anywhere
    sys.path.insert(0, REPO_ROOT)

# The fixed family: every A-ES / weighted-sampling / quantized-rounding
# contract in the registry (the r12 boundary bug lived here), named
# explicitly so a rename breaks this tool loudly.
ALWAYS = (
    "doc_weighted_sample",
    "corpus_mixture_resample",
    "doc_stratified_sample",
    "doc_unigram_logprob",
    "event_value_percentiles",
)
SPOT_SIZE = 15
BATCH = 5
BATCH_TIMEOUT_S = 2400


def spot_set(size: int = SPOT_SIZE) -> list[str]:
    """ALWAYS family + head of this round's rotation cohort, deduped,
    oracle-bearing only — deterministic given the registry state."""
    from data_warehouse_flink_spark.registry import (
        _GRADING_PRIORITY,
        all_queries,
    )

    queries = all_queries()
    missing = [n for n in ALWAYS if n not in queries]
    if missing:
        sys.exit(f"ERROR: ALWAYS spot queries not in registry: {missing}")
    names = [n for n in ALWAYS if queries[n].oracle is not None]
    for n in _GRADING_PRIORITY[22:]:
        if len(names) >= size:
            break
        if n not in names and queries[n].oracle is not None:
            names.append(n)
    return names


def run_batch(names: list[str], data_dir: str, junit_path: str) -> dict:
    ids = [
        f"tests/test_oracle_parity.py::test_query_matches_oracle[{n}]"
        for n in names
    ]
    env = {**os.environ, "SPARK_GRAFT_TEST_SF": data_dir}
    # ADVICE r13 #2: a stale junit file from a prior invocation of the same
    # round/batch must never be parsed as THIS run's results — remove it
    # first so a pytest crash yields "junit_unreadable", not stale passes.
    try:
        os.remove(junit_path)
    except FileNotFoundError:
        pass
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", *ids, "-q", "--no-header",
             f"--junitxml={junit_path}"],
            cwd=REPO_ROOT,
            env=env,
            timeout=BATCH_TIMEOUT_S,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return {n: "timeout" for n in names}
    # rc 0 = all passed, 1 = some test failed (the junit says which);
    # anything else (2 interrupted / 3 internal error / 4 usage error /
    # 5 nothing collected) means the junit cannot be trusted to cover the
    # batch — fail the whole batch loudly (ADVICE r13 #2).
    if proc.returncode not in (0, 1):
        return {n: f"pytest_rc_{proc.returncode}" for n in names}
    results = {n: "missing" for n in names}
    try:
        for case in ET.parse(junit_path).getroot().iter("testcase"):
            m = re.search(r"\[(.+)\]$", case.get("name", ""))
            if not m or m.group(1) not in results:
                continue
            bad = case.find("failure") is not None or case.find("error") is not None
            results[m.group(1)] = "fail" if bad else "pass"
    except (OSError, ET.ParseError) as exc:
        return {n: f"junit_unreadable: {exc}" for n in names}
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    # --round is REQUIRED (ADVICE r13 #1): inferring it from the
    # BENCH_r*.json ledger is ambiguous on both sides of the driver's
    # write — before it, max(rounds) is the PREVIOUS round; after it,
    # max(rounds)+1 is the NEXT one — so a default would mislabel the
    # record depending on when in the round it runs.
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument(
        "--data", default=os.path.join(REPO_ROOT, ".localdata", "gensf1")
    )
    ap.add_argument("--size", type=int, default=SPOT_SIZE)
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.data, "documents.parquet")):
        sys.exit(
            f"ERROR: no generated sf1 data at {args.data} — run:\n"
            f"  python tools/testdata_gen.py 1 {args.data}"
        )
    rnd = args.round
    names = spot_set(args.size)
    print(f"sf1 spot set (round {rnd}, {len(names)} queries): {names}")

    results: dict[str, str] = {}
    for i in range(0, len(names), BATCH):
        batch = names[i : i + BATCH]
        print(f"batch {i // BATCH + 1}: {batch}", flush=True)
        junit = os.path.join(
            REPO_ROOT, ".localdata", f"sf1_spot_r{rnd:02d}_b{i // BATCH}.xml"
        )
        got = run_batch(batch, args.data, junit)
        results.update(got)
        print(f"  -> { {n: got[n] for n in batch} }", flush=True)

    record = {
        "round": rnd,
        "data_dir": args.data,
        "rule": "ALWAYS A-ES/sampling/rounding family + head of this "
        "round's rotation cohort (_GRADING_PRIORITY[22:])",
        "n": len(names),
        "all_pass": all(v == "pass" for v in results.values()),
        "results": results,
    }
    out = os.path.join(REPO_ROOT, f"SF1_SPOT_r{rnd:02d}.json")
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(record))
    if not record["all_pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
