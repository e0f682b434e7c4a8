#!/usr/bin/env python
"""Benchmark harness: run the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Each query is executed to completion with a noop write (sorts and all —
no collect, nothing driver-side). Timing includes full plan execution;
session/JVM startup is excluded (it is amortized noise at cluster scale).

This host intermittently freezes the whole JVM for multi-second quanta
(virtualization stalls — observed via jstack attach timeouts with no
matching GC/safepoint log entries). To keep the recorded numbers about
the ENGINE, any query whose first run is an outlier is re-run once
within a global time budget and the per-query MIN is reported
("runs" notes how many samples each min is over).

Per-query coverage: ALL queries' times + sample counts are written to
BENCH_DETAIL.json every run. The one printed line cannot carry 99 named
entries (the external recorder keeps a 2000-byte stdout tail; the full
map alone serializes to ~2.5 kB), so it lists the slowest queries
individually, folds the rest into fast_n/fast_sec, and — so a
regression in the folded bucket can never hide — compares EVERY query
against its own minimum from the previous run's BENCH_DETAIL.json,
surfacing any ≥1 s query that got ≥2× slower in a "regr" field
(normally absent).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_analysis_of_twitter_emoji_usage_spark.core import get_spark  # noqa: E402
from big_data_analysis_of_twitter_emoji_usage_spark.plans.catalog import QUERIES  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Parse the scale factor ONCE, guarded: a dir not ending in
    # 'sf<number>' must not crash the process AFTER the full sweep ran
    # (the late float(sf) in the detail payload would otherwise raise
    # and lose the whole run before anything was written).
    try:
        sf_num: float | None = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf_num = None
    spark = get_spark(app_name="big_data_analysis_of_twitter_emoji_usage_spark-bench")

    # Warm the JVM/codegen path once with the cheapest query so the first
    # measured query doesn't pay one-time initialization.
    QUERIES["q7_events_early"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Host-noise calibration (r8): min-of-3 of the same trivial scan
    # query at bench START and END. The host stalls the JVM in
    # multi-second quanta and drifts on minute scales (SCALE.md host
    # caveat), so a cross-round total is only interpretable next to a
    # fixed yardstick: if cal rises 1.3x between rounds on an untouched
    # plan, a 1.3x total is the host, not the engine.
    def _calibrate() -> float:
        return round(
            min(run_once(QUERIES["q7_events_early"]) for _ in range(3)), 3
        )

    # r9 calibration GATE: the r8 round recorded a 99.59 s total that
    # had to be adjudicated as host drift after the fact. Instead of
    # adjudicating, the bench now tries to RECORD inside a clean
    # window: when both cal samples sit above CAL_GATE x the pinned
    # clean-window yardstick (min-of-3 measured on an idle host, only
    # meaningful at sf0.1 where the pin was taken), it waits out the
    # degraded window and re-runs the slowest queries, keeping
    # per-query minima, until a cal sample passes or the budget runs
    # out. cal.ok in the output says whether the recorded numbers ever
    # saw a clean window — a cal.ok=false round is explicitly
    # drift-suspect and comparable only to its own cal.
    # pin: best idle-host min-of-3 observed across r8/r9 clean sessions
    # (0.329 twice); idle samples run 0.33-0.52, so the 1.25 gate flags
    # genuinely degraded windows without tripping on normal jitter.
    CAL_PIN = 0.33
    CAL_GATE = 1.25

    cal_start = _calibrate()

    bench_start = time.perf_counter()
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "480"))

    timings: dict[str, float] = {}
    runs: dict[str, int] = {}
    for name, fn in QUERIES.items():
        timings[name] = run_once(fn)
        runs[name] = 1

    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    # Previous run's recorded minima (same sf only): used both to steer
    # re-sampling and, after it, for the regression tripwire.
    prev: dict[str, float] = {}
    try:
        with open(detail_path, encoding="utf-8") as f:
            prev_detail = json.load(f)
        # same expression as the write below: for a non-'sf<number>'
        # dir the stamp is the dir path itself — comparing against the
        # None sf_num would silently disable the regression tripwire
        # and resample steering for exactly those dirs
        if prev_detail.get("sf") == (sf_num if sf_num is not None else sf_dir):
            prev = prev_detail.get("queries", {})
    except (OSError, ValueError):
        pass

    # Re-sample stall-suspect outliers (slowest first, up to 4 samples
    # each), while the budget holds; min-of-samples is the reported
    # figure. A single extra sample is not enough when a host-freeze
    # window spans several queries in the first pass. Threshold 1.5 s
    # (was 3.0): the r6 A/B on three untouched plans showed single
    # samples at ~2 s whose min-of-6 sat at ~1.0-1.3 s — stall windows
    # pollute readings well under the old cutoff (SCALE.md, host
    # variance). A sub-threshold query is ALSO re-sampled when it reads
    # ≥2× its previous-run minimum (r7): a stall window during the
    # first pass once left two ~0.6 s queries recorded at ~1.2 s with
    # no resample, tripping the regr flag on plans nobody touched.
    def _suspect(n: str) -> bool:
        return timings[n] >= 1.5 or (
            n in prev and timings[n] >= 0.5 and timings[n] >= 2 * prev[n]
        )

    for _ in range(3):
        hot = [n for n in sorted(timings, key=timings.get, reverse=True)
               if _suspect(n)]
        if not hot:
            break
        for name in hot:
            if time.perf_counter() - bench_start > budget_s:
                break
            timings[name] = min(timings[name], run_once(QUERIES[name]))
            runs[name] += 1

    # Whole-catalog re-passes with the leftover budget (r9): stall
    # windows pollute arbitrary queries, and the 0.6-1.4 s band sits
    # UNDER the 1.5 s suspect threshold yet carried +0.2-0.6 s of
    # stall in the r9 single-pass-vs-r7 comparison (76/104 queries had
    # exactly one sample). So every query earns extra samples while
    # the budget holds — fewest-samples-first, slowest-first within a
    # tier, so a second sample for all precedes a fifth for the
    # suspects; min-merge as everywhere else. A query's own last
    # reading prices its next sample against the remaining budget.
    while time.perf_counter() - bench_start < budget_s:
        order = sorted(timings, key=lambda n: (runs[n], -timings[n]))
        if runs[order[0]] >= 5:
            break
        progressed = False
        for name in order:
            if runs[name] >= 5:
                continue
            if time.perf_counter() - bench_start + timings[name] > budget_s:
                continue
            timings[name] = min(timings[name], run_once(QUERIES[name]))
            runs[name] += 1
            progressed = True
        if not progressed:
            break

    # The driver captures a 2000-byte stdout tail (r1/r2 both lost the
    # line to truncation — measured: tail == 2000 B exactly). Full
    # per-query timings + sample counts go to BENCH_DETAIL.json; the one
    # machine-parsed line keeps individual entries for the slowest
    # queries and folds the fastest into a fast_n/fast_sec bucket until
    # the serialized line fits a 1900-byte budget.
    #
    # Regression tripwire vs the PREVIOUS run's recorded minima (loaded
    # above, same-sf only): queries folded into the fast bucket still
    # get a named callout if they blow up (≥1 s and ≥2× the prior min —
    # under that is host noise; see the A/B variance study in SCALE.md).
    # Capped at the 8 worst ratios (+ a count of the rest): a
    # host-stall run can trip dozens of queries at once, and an
    # unbounded map would blow the 1900-byte line budget no matter how
    # far the shrink loop folds the per-query timings.
    _regr_all = sorted(
        (
            # max(..., 1e-9): a degenerate stored prior of exactly 0.0
            # (corrupt/hand-edited detail file) must not ZeroDivision-
            # abort the run after the full sweep already ran
            (k, v / max(prev[k], 1e-9))
            for k, v in timings.items()
            if k in prev and v >= 1.0 and v >= 2 * prev[k]
        ),
        key=lambda kv: -kv[1],
    )
    regr = {k: [round(prev[k], 2), round(timings[k], 2)] for k, _ in _regr_all[:8]}
    if len(_regr_all) > 8:
        regr["_more"] = len(_regr_all) - 8

    cal_end = _calibrate()
    retries = 0
    while (
        min(cal_start, cal_end) > CAL_PIN * CAL_GATE
        and time.perf_counter() - bench_start < budget_s
        and retries < 4
    ):
        retries += 1
        time.sleep(15)  # wait out the degraded window
        c = _calibrate()
        cal_end = min(cal_end, c)
        if c <= CAL_PIN * CAL_GATE:
            # clean window: replace stall-polluted samples, slowest
            # first, keeping per-query minima until the budget ends
            for name in sorted(timings, key=timings.get, reverse=True):
                if time.perf_counter() - bench_start > budget_s:
                    break
                timings[name] = min(timings[name], run_once(QUERIES[name]))
                runs[name] += 1
            cal_end = min(cal_end, _calibrate())
            break

    cal = {
        "q": "q7_events_early",
        "start": cal_start,
        "end": cal_end,
        "pin": CAL_PIN,
        "ok": min(cal_start, cal_end) <= CAL_PIN * CAL_GATE,
    }
    if retries:
        cal["retries"] = retries

    detail = {
        "queries": {k: round(v, 4) for k, v in timings.items()},
        "runs": runs,
        "sf": sf_num if sf_num is not None else sf_dir,
        "cal": cal,
    }
    with open(detail_path, "w", encoding="utf-8") as f:
        json.dump(detail, f, indent=1)

    by_time = sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))

    def assemble(n_individual: int) -> str:
        kept = dict(by_time[:n_individual])
        rest = by_time[n_individual:]
        payload = {
            "metric": "catalog_total_runtime",
            "value": round(sum(timings.values()), 2),
            "unit": "sec",
            "queries": {k: round(v, 2) for k, v in kept.items()},
            "sf": sf_num if sf_num is not None else sf_dir,
            "cal": cal,
        }
        if rest:
            payload["fast_n"] = len(rest)
            payload["fast_sec"] = round(sum(v for _, v in rest), 2)
        if regr:
            payload["regr"] = regr
        return json.dumps(payload, separators=(",", ":"))

    line = assemble(len(by_time))
    n = len(by_time)
    while len(line.encode()) > 1900 and n > 0:
        n -= 1
        line = assemble(n)
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
