"""The vacuity manifest, enforced live (round-14 post-close lesson).

A green oracle-parity row proves nothing if the compared result set is
structurally empty — `embedding_dedup_cosine` (found r13) and `tpch_q22`
(found r14) shipped rounds of "parity green" that had only ever compared
empty sets. Both now carry planted-data three-way pins. This module makes
the class closed FOREVER, not just audited once: the live test re-runs the
DuckDB-only row-count sweep over all 172 oracles at both routine evidence
tiers and fails if the set of vacuous queries drifts from
tests/vacuity_manifest.json in either direction — a newly-vacuous query
(registration, oracle edit, or testdata change) needs a planted-data test
and a conscious pin; a no-longer-vacuous pin must be deleted.

The comparator is unit-tested separately on synthetic inputs so the live
test's wiring (not just its happy path) is proven.
"""

from __future__ import annotations

import json
import os
import sys

import conftest


def _import_vacuity_audit():
    # Same idiom as the sf1_spot composition test (ADVICE r13 #3): remove
    # the exact entry we inserted, not index 0.
    tools_dir = os.path.join(os.path.dirname(conftest.__file__), "..", "tools")
    sys.path.insert(0, tools_dir)
    try:
        import vacuity_audit
    finally:
        sys.path.remove(tools_dir)
    return vacuity_audit


def test_comparator_flags_both_drift_directions(tmp_path):
    va = _import_vacuity_audit()
    # A fake repo with one real cited test file that mentions its query.
    tests_dir = tmp_path / "tests"
    tests_dir.mkdir()
    (tests_dir / "test_planted_a.py").write_text(
        "def test_query_a_nonvacuous():\n    assert 'query_a'\n"
    )
    manifest = {
        "routine_tiers": ["sf0.001", "sf0.01"],
        "empty_at_all_routine_tiers": {
            "query_a": {"nonvacuous_test": "tests/test_planted_a.py"}
        },
    }
    tiers = ("sf0.001", "sf0.01")
    ok = va.manifest_violations(
        ["query_a"], manifest, tiers, repo_root=str(tmp_path)
    )
    assert ok == []

    # Direction 1: a NEW vacuous query not in the manifest.
    new = va.manifest_violations(
        ["query_a", "query_b"], manifest, tiers, repo_root=str(tmp_path)
    )
    assert len(new) == 1 and "query_b" in new[0] and "planted-data" in new[0]

    # Direction 2: a STALE pin whose query is no longer vacuous.
    stale = va.manifest_violations(
        [], manifest, tiers, repo_root=str(tmp_path)
    )
    assert len(stale) == 1 and "query_a" in stale[0] and "stale" in stale[0]

    # A pin citing a nonexistent test file is a violation even when the
    # vacuous set matches.
    bad_file = {
        "routine_tiers": ["sf0.001", "sf0.01"],
        "empty_at_all_routine_tiers": {
            "query_a": {"nonvacuous_test": "tests/test_missing.py"}
        },
    }
    missing = va.manifest_violations(
        ["query_a"], bad_file, tiers, repo_root=str(tmp_path)
    )
    assert len(missing) == 1 and "does not exist" in missing[0]

    # A cited test that never mentions the query by name is a violation —
    # the pin must point at findable coverage.
    (tests_dir / "test_unrelated.py").write_text("def test_other():\n    pass\n")
    unrelated = {
        "routine_tiers": ["sf0.001", "sf0.01"],
        "empty_at_all_routine_tiers": {
            "query_a": {"nonvacuous_test": "tests/test_unrelated.py"}
        },
    }
    silent = va.manifest_violations(
        ["query_a"], unrelated, tiers, repo_root=str(tmp_path)
    )
    assert len(silent) == 1 and "never mentions" in silent[0]

    # An audit run over a different tier set than the manifest pins is a
    # violation (the definition of "routine" changed without the pin).
    drift = va.manifest_violations(
        ["query_a"], manifest, ("sf0.001",), repo_root=str(tmp_path)
    )
    assert len(drift) == 1 and "tiers" in drift[0]


def test_empty_at_all_tiers_is_an_intersection():
    va = _import_vacuity_audit()
    counts = {
        "sf0.001": {"a": 0, "b": 0, "c": 5},
        "sf0.01": {"a": 0, "b": 3, "c": 0},
    }
    # b is empty only at sf0.001, c only at sf0.01 — neither is vacuous;
    # only a (empty at BOTH) is.
    assert va.empty_at_all_tiers(counts) == ["a"]


def test_live_audit_matches_pinned_manifest():
    """The real sweep: all 172 oracles, both routine tiers, counts only
    (DuckDB-side, no Spark session — ~35 s per tier). This is the live
    firing of the invariant: green means every structurally-empty parity
    comparison in the registry is consciously pinned with a planted-data
    test, and no pin is stale."""
    va = _import_vacuity_audit()
    result = va.run_audit("/root/testdata")
    assert result["oracle_bearing"] == 172
    assert result["violations"] == [], "\n".join(result["violations"])
    # Belt-and-braces: the audit found exactly the documented two.
    assert result["empty_at_all_tiers"] == [
        "embedding_dedup_cosine",
        "tpch_q22",
    ]


def test_manifest_entries_cite_real_planted_tests():
    """Fast path (no sweep): every pinned entry's cited test file exists,
    mentions the query by name, and actually plants data (the word
    'plant' appears — both closers document their fixtures that way)."""
    repo_root = os.path.join(os.path.dirname(conftest.__file__), "..")
    with open(
        os.path.join(repo_root, "tests", "vacuity_manifest.json"),
        encoding="utf-8",
    ) as fh:
        manifest = json.load(fh)
    pinned = manifest["empty_at_all_routine_tiers"]
    assert set(pinned) == {"embedding_dedup_cosine", "tpch_q22"}
    for name, entry in pinned.items():
        path = os.path.join(repo_root, entry["nonvacuous_test"])
        assert os.path.isfile(path), (name, path)
        text = open(path, encoding="utf-8").read()
        assert name in text
        assert "plant" in text.lower(), (
            f"{entry['nonvacuous_test']} should document its planted fixture"
        )
