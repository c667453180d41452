"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE compact JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec", "sf": ...,
   "n_queries": N, "queries": {...}}

The driver's output-tail capture truncates long lines (the 97-query inline
map overflowed it in round 4 and destroyed the perf record), so the printed
line carries only the headline aggregate, and the full per-query timing map
is written to a repo sidecar `BENCH_QUERIES_r{N}.json` (N inferred from the
existing BENCH_r*.json ledger) plus a stable `BENCH_QUERIES_latest.json`.

Each query is executed with a count() action (full plan, no driver collect of
payload rows). Wall time includes plan + execution, not session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
DEFAULT_SF_DIR = "/root/testdata/sf0.1"
sys.path.insert(0, REPO_ROOT)

# Headline set: every family of the engine — windowed agg, top-N, distinct,
# joins, detection, TPC-H analytics, dedup, text, similarity.
HEADLINE = [
    "page_view",
    "hot_items_topn",
    "network_flow_topn",
    "unique_visitors",
    "uv_approx",
    "app_marketing_by_channel",
    "ad_clicks_by_geo",
    "ad_blacklist_warnings",
    "login_fail_consecutive",
    "login_fail_threshold",
    "order_timeout",
    "tx_match",
    "tx_match_window_join",
    "tx_match_interval_join",
    "user_sessions",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "tpch_q14",
    "tpch_q18",
    "tpch_q19",
    "tpch_q7",
    "tpch_q8",
    "tpch_q17",
    "tpch_q13",
    "tpch_q22",
    "tpch_q2",
    "tpch_q9",
    "tpch_q11",
    "tpch_q12",
    "tpch_q15",
    "tpch_q16",
    "tpch_q20",
    "tpch_q21",
    "order_priority_count",
    "events_rollup",
    "events_pivot",
    "event_value_percentiles",
    "user_running_value",
    "ad_clicks_by_geo_fine",
    "conversion_funnel",
    "user_value_outliers",
    "sql_priority_counts",
    "doc_dedup_exact",
    "doc_ngram_jaccard",
    "doc_minhash_lsh",
    "doc_token_stats",
    "knn_bruteforce",
    "embedding_dedup_cosine",
    "corpus_curation",
    "doc_unigram_logprob",
    "doc_chunks",
    "doc_dup_clusters",
    "doc_tfidf",
    "doc_stratified_sample",
    "doc_pack_sequences",
    "embedding_label_centroids",
    "purchase_asof_click",
    "weekly_cohort_retention",
    "hourly_counts_gapfilled",
    "doc_repetition_score",
    "doc_pii_redact",
    "doc_contamination",
    "corpus_mixture_weights",
    "doc_dedup_keep_best",
    "uv_sketch_mergeable",
    "doc_semantic_dedup_scores",
    "doc_simhash",
    "knn_lsh",
    "knn_ivf",
    "knn_pq",
    "doc_rolling_fingerprint",
    "doc_span_dedup",
    "doc_quality_classifier",
    "token_count_min_sketch",
    "events_zorder_layout",
    "events_compaction_plan",
    "user_tier_scd2",
    "multimodal_features",
    "doc_bpe_encode",
    "doc_importance_weights",
    "doc_importance_weights_fast",
    "embedding_sq8",
    "events_column_stats",
    "event_value_histogram_quantiles",
    "events_key_skew_profile",
    "orders_integrity_checks",
    "events_k_anonymity",
    "user_cdc_snapshot",
    "events_props_json",
    "knn_rrf",
    "doc_hash_embedding",
    "doc_text_knn",
    "corpus_curation_v2",
    "events_backfill_plan",
    "events_tier_point_in_time",
    "doc_dedup_sweep",
    "events_sessionize_gap_stats",
    "doc_url_dedup",
    "doc_weighted_sample",
    "doc_perplexity_bucket",
    "knn_ivf_pq",
    "doc_exact_substring_dedup",
    "events_rollup_incremental",
    "events_dq_anomaly",
    "doc_minhash_lsh_fast",
    "doc_tokenizer_fertility",
    "corpus_token_budget_plan",
    "doc_lsh_recall_report",
    "login_fail_triple_cep",
    "streaming_sessionize_gap_stats",
    "streaming_dq_anomaly",
    "streaming_rollup_incremental",
    "corpus_mixture_resample",
    "events_late_arrival_profile",
    "streaming_user_tier_scd2",
    "events_quarantine",
    "multimodal_shard_plan",
    "corpus_ccnet_funnel",
    "user_churn_training_set",
    "embedding_standardize",
    "events_weekday_hour_heatmap",
    "doc_ngram_novelty",
    "orders_customer_mart",
    "doc_length_histogram",
    "doc_exact_substring_dedup_50",
    # r7: swapped IN doc_simhash_recall_report (new recall gate) for
    # doc_exact_substring_dedup_fast, whose 0.3 s cost profile its
    # string-keyed sibling doc_exact_substring_dedup already covers.
    "doc_simhash_recall_report",
    # r8: swapped IN corpus_shuffle_shards (global-shuffle shard planner,
    # 0.80 s at sf0.1 — a range exchange + broadcast offsets, a shape the
    # headline otherwise lacks) for doc_span_dedup_fast (0.39 s; cost
    # profile covered by its string-keyed sibling doc_span_dedup, exactly
    # like the r7 substring swap).
    "corpus_shuffle_shards",
]

# Bench time is round time: the headline set is EXPLICITLY capped at 130
# (tests/test_entry.py enforces it). The registry is larger (166); entries
# the cap excludes are the near-duplicate oracle/production twins and
# demos whose cost profile is already covered by a listed sibling. To add
# a query once the cap is hit, swap out the least-informative sibling
# rather than growing the list.
HEADLINE_CAP = 130

# Frozen canary reference (the round-6 driver record, BENCH_r06.json):
# box-level contention inflates whole runs uniformly (round 6 measured two
# same-day runs at 90.9 vs 112.7 s with identical code), so the headline
# also carries `value_adjusted` = value * sum(CANARY_REF)/sum(canary_now) —
# a self-normalizing total that makes cross-round ratios meaningful without
# forensic recomputation. Update the reference only when the canary trio's
# own plans change (they are rounds-old and frozen precisely so they don't).
CANARY_REF = {"page_view": 0.323, "tpch_q6": 0.271, "hot_items_topn": 0.555}
# PROTOCOL NOTE for cross-round readers of the r6-anchored fields
# (canary_ratio_vs_r06 / value_adjusted): the r6 reference was measured
# min-of-3; since r12 the trio runs min-of-5 (CANARY_REPS below), which is
# biased slightly low vs a min-of-3 read of the same box — so post-r12
# values of the r6-anchored fields conflate that protocol change with box
# drift. The r12-versioned fields (canary_ratio_vs_r12 /
# value_adjusted_r12) are measured AND referenced min-of-5; read those for
# current box speed, keep the r6 fields only for continuity with the
# r6-r11 ledger.
# Versioned re-baseline (VERDICT r11 #3 — the rule's 0.7x/1.4x band was
# effectively crossed: driver boxes read 0.797x then 1.209x across rounds
# 10-11 and builder rows swung 0.91-1.35x within one session; evidence
# packet = the canary trend table in NOTES.md). Measured min-of-5 after the
# bench warmup on the solo round-12 builder box: sum 1.151 s vs the r6
# reference's 1.149 s (ratio 1.0017) — the HARDWARE is unchanged; the old
# min-of-3 single-position reads were inheriting jitter. The r6 constants
# stay BESIDE this (never replaced) so the whole r6-r11 ledger remains
# comparable; the record emits a ratio against each.
CANARY_REF_R12 = {"page_view": 0.354, "tpch_q6": 0.254,
                  "hot_items_topn": 0.543}
CANARY_TRIO = tuple(CANARY_REF)  # measured first, in this order
CANARY_REPS = 5  # min-of-5 since r12: the box-speed estimate must not
# inherit single-rep jitter (3 sub-second queries; ~2 s of extra wall)

# Acceptance rule for a close record (VERDICT r12 #4 — the NOTES.md trend
# table's de-facto rule, now stamped into every record so a sidecar is
# self-describing): a run is ACCEPTED iff no other Spark JVM was alive at
# start, the canary trio completed, the min-of-5 trio read within
# ACCEPT_CANARY_MAX of the r12 reference (external tenant load above that
# swamps code-level signal — r12's driver rerun read 1.61x), and every
# headline query produced a timing. A rejected record still carries all
# its numbers; `reject_reason` says why it should not anchor cross-round
# comparisons. The builder protocol remains: up to 3 attempts, accept the
# first stamped accepted=true, log every attempt in the NOTES trend table.
ACCEPT_CANARY_MAX = 1.1

# Steady-state escape hatch (VERDICT r13 #2): round 13 produced ZERO
# accepted records — the box's steady canary baseline sat at 1.19-1.4x of
# the r12 reference for the whole session (8 builder attempts over ~3 h
# plus the driver rerun, all rejected), so the strict clause alone can
# leave an entire round with no acceptable anchor even when the load is
# perfectly steady and the cross-round per-query comparison is clean. A
# record may therefore ALSO stamp accepted (mode "steady-state") when the
# box is provably steady rather than fast: no concurrent JVM, no query
# errors, the canary trio's min-of-5 sum is TIGHT across >= 3 attempts
# spaced >= 10 min apart within the last 12 h (max/min <= 1.15 — a spike
# like r13's 3.28x outlier blows the spread and still rejects), and the
# judge's lead metric `common_subset_ratio_vs_prev` reads <= 1.05 (a
# uniformly contended run times ~its canary inflation slower on the
# common subset, so steady-but-slow contention cannot sneak through on
# spread alone). The strict <= 1.1 clause remains the PREFERRED stamp;
# a steady-state acceptance is explicitly labeled in `accepted_mode`.
# Attempts are read from/appended to BENCH_ATTEMPTS.jsonl (one JSON object
# per default-SF run with a complete canary: ts, canary_sum, ratio) —
# commit it at close so the driver's own run sees the builder attempts.
STEADY_SPREAD_MAX = 1.15
STEADY_COMMON_RATIO_MAX = 1.05
STEADY_MIN_ATTEMPTS = 3
STEADY_MIN_SPACING_S = 600.0
STEADY_WINDOW_S = 12 * 3600.0
ATTEMPTS_LEDGER = os.path.join(REPO_ROOT, "BENCH_ATTEMPTS.jsonl")


def steady_spread(
    attempts: list[tuple[float, float]], now: float
) -> tuple[int, float | None]:
    """Pure helper for the steady-state clause: given (unix_ts, canary_sum)
    readings INCLUDING the current run's own, keep those within
    STEADY_WINDOW_S of `now`, thin to >= STEADY_MIN_SPACING_S spacing
    (greedy from newest, so the current reading always survives thinning),
    and return (n_kept, max/min spread of the kept canary sums). Three
    back-to-back reruns inside one contention spike therefore count as ONE
    attempt — spacing is what makes the spread a steadiness proof."""
    in_window = sorted(
        (float(ts), float(c))
        for ts, c in attempts
        if c and float(c) > 0 and 0 <= now - float(ts) <= STEADY_WINDOW_S
    )
    kept: list[tuple[float, float]] = []
    for ts, c in reversed(in_window):
        if not kept or kept[-1][0] - ts >= STEADY_MIN_SPACING_S:
            kept.append((ts, c))
    if not kept:
        return 0, None
    sums = [c for _, c in kept]
    return len(kept), round(max(sums) / min(sums), 4)


def record_attempt(
    ledger_path: str,
    now: float,
    canary_sum: float,
    canary_ratio_vs_r12: float | None,
    tag: str,
) -> tuple[int, float | None]:
    """Ledger I/O for the steady-state clause, as one testable unit: read
    prior attempts (malformed lines skipped one at a time — a corrupt
    ledger must degrade, not kill the record), append this run's reading,
    and return steady_spread() over the attempts INCLUDING this one. A
    missing ledger means this is attempt 1; an unwritable ledger still
    returns this run's spread (the record is the source of truth, the
    ledger is the cross-run channel)."""
    attempts: list[tuple[float, float]] = []
    try:
        with open(ledger_path) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                    attempts.append((rec["ts"], rec["canary_sum"]))
                except (ValueError, TypeError, KeyError):
                    continue  # one bad line must not kill the record
    except OSError:
        pass
    attempts.append((now, canary_sum))
    try:
        with open(ledger_path, "a") as fh:
            json.dump(
                {
                    "ts": round(now, 1),
                    "canary_sum": round(canary_sum, 3),
                    "canary_ratio_vs_r12": canary_ratio_vs_r12,
                    "tag": tag,
                },
                fh,
                sort_keys=True,
            )
            fh.write("\n")
    except OSError as exc:
        print(f"NOTE: attempts ledger not written ({exc})", file=sys.stderr)
    return steady_spread(attempts, now)


def canary_drift(pre: dict, post: dict) -> float | None:
    """post/pre canary-trio sum ratio: did the box change speed DURING the
    run? >1 = the body ran on a box slower than the (pre) canary promised;
    <1 = the reverse; ~1 = whatever the canary read, it held. Returns None
    unless both trios are complete over the SAME query set with positive
    sums (a partial or zero trio cannot anchor a ratio). Pure and
    unit-tested; intentionally NOT an acceptance() input — see the
    call-site comment."""
    if not pre or set(pre) != set(post):
        return None
    pre_sum, post_sum = sum(pre.values()), sum(post.values())
    if pre_sum <= 0 or post_sum <= 0:
        return None
    return round(post_sum / pre_sum, 4)


def acceptance(
    concurrent_jvms: int,
    canary_ratio_vs_r12: float | None,
    n_query_errors: int,
    *,
    default_sf: bool,
    common_subset_ratio_vs_prev: float | None = None,
    steady_attempts: int = 0,
    steady_spread_ratio: float | None = None,
) -> tuple[bool, str | None, str | None]:
    """The acceptance rule as a pure function (unit-tested): returns
    (accepted, mode, reject_reason) where mode is "strict" (preferred,
    canary within ACCEPT_CANARY_MAX of the r12 reference),
    "steady-state" (VERDICT r13 #2 escape hatch — see the constants
    above), or None when rejected. The canary clauses only apply on
    default-SF runs — CANARY_REF_R12 was measured at sf0.1, and a
    cross-SF trio ratio is not a box-speed estimate (the trio sees
    different data volume), so judging an sf0.001/sf1 record by it would
    reject clean runs and pass contended ones. `default_sf` is required
    keyword-only (ADVICE r13 #4): a caller that forgets it must not
    silently inherit the sf0.1-anchored clause."""
    reasons = []
    if concurrent_jvms:
        reasons.append(f"concurrent_jvms={concurrent_jvms}")
    canary_ok = True
    if default_sf:
        if canary_ratio_vs_r12 is None:
            canary_ok = False
            reasons.append("canary_incomplete")
        elif canary_ratio_vs_r12 > ACCEPT_CANARY_MAX:
            canary_ok = False
            reasons.append(
                f"canary_ratio_vs_r12={canary_ratio_vs_r12}"
                f">{ACCEPT_CANARY_MAX}"
            )
    if n_query_errors:
        reasons.append(f"query_errors={n_query_errors}")
    if not reasons:
        return True, "strict" if default_sf else "off-default-sf", None
    # Steady-state fallback: ONLY reachable when the sole strict failure is
    # a too-slow (but measured) canary — a concurrent JVM, an errored
    # query, or an incomplete trio can never be laundered by steadiness.
    if (
        default_sf
        and not concurrent_jvms
        and not n_query_errors
        and canary_ratio_vs_r12 is not None
        and not canary_ok
    ):
        steady_fail = []
        if steady_attempts < STEADY_MIN_ATTEMPTS:
            steady_fail.append(
                f"attempts={steady_attempts}<{STEADY_MIN_ATTEMPTS}"
            )
        if steady_spread_ratio is None:
            steady_fail.append("spread_unknown")
        elif steady_spread_ratio > STEADY_SPREAD_MAX:
            steady_fail.append(
                f"spread={steady_spread_ratio}>{STEADY_SPREAD_MAX}"
            )
        if common_subset_ratio_vs_prev is None:
            steady_fail.append("common_subset_ratio_unknown")
        elif common_subset_ratio_vs_prev > STEADY_COMMON_RATIO_MAX:
            steady_fail.append(
                f"common_subset_ratio={common_subset_ratio_vs_prev}"
                f">{STEADY_COMMON_RATIO_MAX}"
            )
        if not steady_fail:
            return True, "steady-state", None
        reasons.append("steady-state: " + "; ".join(steady_fail))
    return False, None, "; ".join(reasons)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)

    # A concurrent Spark JVM on the same box corrupts timings wholesale
    # (measured: 36 s readings for 2.4 s queries; r12 close attempt A read
    # 1.27x slower with one leftover suite JVM alive). Warn loudly on
    # stderr AND stamp the count into the record itself below, so a
    # contended run is self-describing in the ledger instead of needing
    # the stderr capture to survive.
    concurrent_jvms = 0
    try:
        import subprocess

        # NOTE: this check must run BEFORE get_spark() below — any JVM that
        # pgrep finds here belongs to another session (this run's own JVM
        # does not exist yet, and a JVM pid can never equal the Python
        # driver's getpid anyway).
        others = subprocess.run(
            ["pgrep", "-f", "org.apache.spark"],
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.split()
        if others:
            concurrent_jvms = len(others)
            print(
                f"WARNING: {len(others)} other Spark JVM(s) alive "
                f"(pids {others}) — timings below are unreliable",
                file=sys.stderr,
            )
    except Exception:
        pass

    from data_warehouse_flink_spark.registry import all_queries
    from data_warehouse_flink_spark.session import get_spark

    spark = get_spark("dwfs-bench")
    queries = all_queries()

    # Warm the JVM + parquet footers + whole-stage-codegen/Arrow machinery so
    # the first measured queries don't pay one-time startup costs: a trivial
    # scan plus one representative query per major input table (events,
    # lineitem+orders, documents, embeddings), all unrecorded. A single
    # warm-up query left the other tables' first consumers paying cold page
    # cache + codegen (measured: page_view 0.45 s warm vs 1.8 s cold-start).
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    for warm in ("page_view", "tpch_q6", "doc_token_stats", "knn_bruteforce"):
        queries[warm].spark_fn(spark, sf_dir).count()

    # Canary trio: three stable, rounds-old queries measured FIRST, right
    # after warmup, and reported separately. Cross-round per-query
    # comparisons divide by the canary to factor out box-level contention
    # (round 6 saw two same-day runs differ 90.9 vs 112.7 s UNIFORMLY,
    # including plans untouched for rounds — the canary makes that visible
    # inside the record instead of requiring a forensic re-measure).
    def measure_trio() -> dict:
        trio: dict[str, float] = {}
        for name in CANARY_TRIO:
            try:
                best = float("inf")
                for _ in range(CANARY_REPS):
                    t0 = time.perf_counter()
                    queries[name].spark_fn(spark, sf_dir).count()
                    best = min(best, time.perf_counter() - t0)
                trio[name] = round(best, 3)
            except Exception:
                # a broken canary query must not kill the whole record —
                # the main loop below will surface it in the errors dict
                pass
        return trio

    canary = measure_trio()

    # min of 3 runs per query: the steady-state number (first run pays
    # one-time codegen/janino compilation and page-cache misses, which a
    # long-running cluster job would amortize away; the extra rep guards
    # the recorded number against a stray GC pause).
    #
    # r15 (VERDICT r14 #3): rep-1 wall time is ALSO recorded, sidecar-only
    # (`queries_first_rep`). The min-of-3 headline number excludes any
    # session-scoped one-time work — most notably the shared ANN index
    # build (`_lsh_bucketed`: the first of knn_lsh/knn_ivf/knn_rrf to run
    # pays the LSH/IVF/simhash/trigram index localCheckpoint, later reps
    # and queries read it back). first_rep makes that build cost visible
    # in every record instead of vanishing into rep 1: the build shows up
    # as first_rep >> min for the first _cached consumer. Methodology of
    # the headline number is unchanged (cross-round comparability).
    timings: dict[str, float] = {}
    first_rep: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        q = queries[name]
        best = float("inf")
        try:
            for rep in range(3):
                t0 = time.perf_counter()
                q.spark_fn(spark, sf_dir).count()
                elapsed = time.perf_counter() - t0
                if rep == 0:
                    first_rep[name] = round(elapsed, 3)
                best = min(best, elapsed)
            timings[name] = round(best, 3)
        except Exception as exc:  # one broken query must not kill the record
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]

    total = round(sum(timings.values()), 3)

    # Post-run trio re-measure (r14 post-close attempt E lesson): the trio
    # runs FIRST, so a box that loads up mid-run leaves a clean-looking
    # canary on a contended record (E: canary 1.194 with common-subset
    # 1.447x — the 15-min loadavg was 12.5 at launch and the trio caught a
    # lull). Re-measuring after the body makes mid-run drift visible
    # INSIDE the record. Diagnostic only: acceptance() deliberately does
    # not consume it — the common-subset ratio already gates cross-round
    # comparability, and a second gating input would double-count the
    # same contention. Read it one-sided: the post trio runs on a fully
    # warmed JVM (measured 0.32x at sf0.001, where trio times are
    # warmth-dominated), so drift < 1 is partly warmth; drift >> 1 is the
    # unambiguous mid-run-contention signal.
    canary_post = measure_trio()

    # Per-query sidecar round tag: inferred from the driver's BENCH_r*.json
    # ledger (this run feeds BENCH_r{max+1}); also refreshes a stable alias.
    import glob
    import re

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO_ROOT, "BENCH_r*.json"))
        if (m := re.match(r"BENCH_r(\d+)\.json$", os.path.basename(p)))
    ]
    tag = f"r{max(rounds) + 1:02d}" if rounds else "r00"
    # The sidecars are the DRIVER's git-tracked records: only a run at the
    # default SF may write them — a local dev/verify run at another SF was
    # silently overwriting the round's sf0.1 numbers (restored from git),
    # and letting it rewrite the `latest` alias instead just moves the
    # divergence there. Keyed on the RESOLVED sf_dir, not env presence:
    # an explicit SPARK_GRAFT_SF_DIR=<default> is still a default run.
    is_default_sf = os.path.realpath(sf_dir) == os.path.realpath(DEFAULT_SF_DIR)

    payload = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "sf": sf_dir,
        "n_queries": len(timings),
    }
    if concurrent_jvms:
        payload["concurrent_jvms"] = concurrent_jvms

    # Common-subset ratio vs the PREVIOUS round's sidecar (VERDICT r8 #7) —
    # the FIRST cross-round field in the record (VERDICT r9 #5): twice now
    # (r7, r9) the canary-adjusted total pointed the wrong way while this
    # per-query comparison told the truth, so the verdict line leads and
    # value_adjusted is demoted to a secondary field below. Computed as
    # sum(this run) / sum(prev sidecar) over the queries present in both.
    # Only emitted on a default-SF run (the prev sidecar is an sf0.1
    # record; a cross-SF ratio would be meaningless).
    if is_default_sf and rounds:
        prev_path = os.path.join(REPO_ROOT, f"BENCH_QUERIES_r{max(rounds):02d}.json")
        try:
            with open(prev_path) as fh:
                prev = json.load(fh).get("queries", {})
            common = sorted(set(prev) & set(timings))
            prev_sum = sum(prev[n] for n in common)
            if common and prev_sum > 0:
                ratio = round(sum(timings[n] for n in common) / prev_sum, 4)
                payload["common_subset_ratio_vs_prev"] = ratio
                payload["common_subset_n"] = len(common)
                verdict = (
                    "faster" if ratio < 1
                    else "even" if ratio == 1
                    else "slower"
                )
                payload["vs_prev"] = (
                    f"{verdict} vs prev on common subset "
                    f"({ratio:.4f}x, {len(common)} queries)"
                )
        except (OSError, ValueError, TypeError, KeyError) as exc:
            # a missing/corrupt/odd-shaped prior sidecar must not kill the
            # record (json.load succeeding does not bound the shapes:
            # string timings or a list-typed "queries" raise TypeError;
            # json.JSONDecodeError is a ValueError). Narrowed from a bare
            # Exception + silent pass (ADVICE r9 #3): a bug in the ratio
            # code itself now crashes visibly, and a withheld ratio says
            # why instead of silently dropping the judge's lead metric.
            print(
                f"NOTE: common-subset ratio withheld "
                f"({type(exc).__name__}: {exc})",
                file=sys.stderr,
            )

    payload["canary"] = canary
    if canary_post:
        payload["canary_post"] = canary_post
        drift_ratio = canary_drift(canary, canary_post)
        if drift_ratio is not None:
            payload["canary_drift_during_run"] = drift_ratio
    # Canary-normalized total (VERDICT r6 item 5): scale by how much slower
    # or faster the frozen trio ran vs the stored r6 reference. Only
    # meaningful when all three canaries produced a NONZERO timing this run
    # (a zero-sum canary would divide by zero) AND every headline query
    # produced a timing — with errors the normalized `total` covers a
    # shrunken query set and cross-round ratios would silently compare
    # different sets, so the adjusted figure is withheld and the raw record
    # carries the errors dict instead (ADVICE r7 #4). SECONDARY since r10:
    # it inherits the canary trio's own box noise — read vs_prev /
    # common_subset_ratio_vs_prev first.
    if set(canary) == set(CANARY_REF) and sum(canary.values()) > 0:
        payload["canary_ratio_vs_r06"] = round(sum(canary.values())
                                               / sum(CANARY_REF.values()), 4)
        # r12 re-baseline ratio, emitted BESIDE the r6 one (VERDICT r11 #3):
        # same trio, min-of-5 reference measured on the solo r12 builder box.
        payload["canary_ratio_vs_r12"] = round(
            sum(canary.values()) / sum(CANARY_REF_R12.values()), 4)
        if not errors:
            ratio = sum(CANARY_REF.values()) / sum(canary.values())
            payload["value_adjusted"] = round(total * ratio, 3)
            payload["value_adjusted_r12"] = round(
                total * sum(CANARY_REF_R12.values()) / sum(canary.values()),
                3)
    if errors:
        payload["errors"] = errors

    # Attempts ledger for the steady-state clause (VERDICT r13 #2): every
    # default-SF run with a complete canary appends its reading, then the
    # spread is computed over the spaced in-window attempts INCLUDING this
    # one. The ledger is a repo file (committed at close) so the driver's
    # own rerun sees the builder's spaced attempts from the same session.
    steady_attempts, spread = 0, None
    if is_default_sf and set(canary) == set(CANARY_REF):
        steady_attempts, spread = record_attempt(
            ATTEMPTS_LEDGER,
            time.time(),
            sum(canary.values()),
            payload.get("canary_ratio_vs_r12"),
            tag,
        )
        payload["steady_attempts"] = steady_attempts
        if spread is not None:
            payload["steady_spread"] = spread

    # Accept/reject stamp (VERDICT r12 #4 + the r13 #2 steady-state
    # clause): evaluate this run against the acceptance rule declared at
    # ACCEPT_CANARY_MAX / STEADY_*. The stamp travels in BOTH the JSON
    # line and the sidecars, so a reader of a bench record never has to
    # reconstruct from NOTES whether the run was box-clean.
    accepted, mode, reject_reason = acceptance(
        concurrent_jvms,
        payload.get("canary_ratio_vs_r12"),
        len(errors),
        default_sf=is_default_sf,
        common_subset_ratio_vs_prev=payload.get("common_subset_ratio_vs_prev"),
        steady_attempts=steady_attempts,
        steady_spread_ratio=spread,
    )
    payload["accepted"] = accepted
    if mode:
        payload["accepted_mode"] = mode
    if reject_reason:
        payload["reject_reason"] = reject_reason

    # The driver contract's printed line carries the per-query map too
    # ({"metric":..., "queries": {...}, ...}); a past refactor left it
    # sidecar-only (BENCH_r13.json's parsed record has no "queries"),
    # which silently starves any off-default-SF or low-core driver rerun
    # of per-query timings. Strictly additive restore.
    payload["queries"] = timings
    # Sidecar-only columns (kept off the printed line, which the driver's
    # output-tail capture truncates):
    # - queries_first_rep (r15, VERDICT r14 #3): rep-1 wall per query; see
    #   the timing-loop comment. first_rep >> min marks one-time
    #   session-scoped work (ANN index build, codegen) the headline min
    #   excludes.
    # - noop_audit (r15, VERDICT r14 #9): the flagged queries from the
    #   newest NOOP_AUDIT_r*.json receipt — queries whose count() timed
    #   action lets Catalyst prune real compute (guide §1.4). Copied into
    #   each round's record so the pruning deficit stays visible while
    #   count() remains the cross-round timed action.
    sidecar = {**payload, "queries": timings,
               "queries_first_rep": first_rep}
    noop_rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO_ROOT, "NOOP_AUDIT_r*.json"))
        if (m := re.match(r"NOOP_AUDIT_r(\d+)\.json$", os.path.basename(p)))
    ]
    if noop_rounds:
        noop_path = os.path.join(
            REPO_ROOT, f"NOOP_AUDIT_r{max(noop_rounds)}.json"
        )
        try:
            with open(noop_path) as fh:
                audit = json.load(fh)
            sidecar["noop_audit"] = {
                "receipt": os.path.basename(noop_path),
                "flagged": audit.get("flagged_noop_over_2x_count", {}),
            }
        except (OSError, ValueError, TypeError) as exc:
            print(
                f"NOTE: noop audit column withheld "
                f"({type(exc).__name__}: {exc})",
                file=sys.stderr,
            )
    names = (
        [f"BENCH_QUERIES_{tag}.json", "BENCH_QUERIES_latest.json"]
        if is_default_sf
        else []
    )
    # Off-default-SF runs still need their per-query map somewhere (the
    # sf1 scaling-slope runs, VERDICT r11 #4) — an explicit opt-in path
    # keeps them out of the driver's tracked sf0.1 sidecars.
    side_out = os.environ.get("SPARK_GRAFT_BENCH_SIDE_OUT")
    if side_out:
        with open(side_out, "w") as fh:
            json.dump(sidecar, fh, indent=1, sort_keys=True)
            fh.write("\n")
    if not names:
        # Mirror the concurrent-JVM warning style (ADVICE r8): say why no
        # record was persisted instead of silently writing nothing.
        print(
            f"NOTE: off-default SF run ({sf_dir}) — tracked sidecars "
            "(BENCH_QUERIES_*.json) not written; only the JSON line below "
            "records this run",
            file=sys.stderr,
        )
    for name in names:
        with open(os.path.join(REPO_ROOT, name), "w") as fh:
            json.dump(sidecar, fh, indent=1, sort_keys=True)
            fh.write("\n")

    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
