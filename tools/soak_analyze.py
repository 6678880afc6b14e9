"""Analyze a training-soak run (VERDICT r4 #5): resume continuity + step-time stability.

Reads the metrics.jsonl a soak run wrote (training/logging.MetricsLogger, one
record per step plus perf/epoch records) and checks the Lightning-replacement
claims as deployment-truth:

  * LOSS CONTINUITY across every resume boundary: the mean loss of the W steps
    after a restart must sit inside the [min, max] envelope of the W steps
    before it, widened by --slack (a genuine state reset — fresh optimizer/EMA,
    lost t_min — shows up as a loss jump far outside the envelope).
  * STEP-TIME STABILITY: per-flush perf/step_seconds must not drift — the mean
    of the last quarter vs the first quarter (excluding warmup flushes) must
    stay within --drift (HBM fragmentation / ckpt-write stalls / metric-flush
    regressions all show up here).
  * t_min MONOTONICITY across resumes: AdjustTmin anneals per epoch; a resume
    must pick the annealed value up, never reset it to the config default.
  * NO GUARD TRIPS: skipped_nonfinite must be 0 everywhere.

Resume boundaries are detected as step numbers that appear MORE than once
(the restarted process re-logs from the checkpoint step) plus explicit
--resume-steps. Prints one JSON verdict line; rc!=0 on violation.

Usage: python tools/soak_analyze.py <metrics.jsonl> [--resume-steps 200,400]
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("metrics", help="path to the soak run's metrics.jsonl")
    ap.add_argument("--resume-steps", default="",
                    help="comma-separated step numbers where the run was "
                         "killed+restarted (checkpoint steps)")
    ap.add_argument("--window", type=int, default=30)
    ap.add_argument("--slack", type=float, default=0.25,
                    help="envelope widening (fraction of the pre-window range)")
    ap.add_argument("--drift", type=float, default=0.15,
                    help="max allowed relative step-time drift (last vs first "
                         "quarter)")
    args = ap.parse_args()

    recs = [json.loads(l) for l in open(args.metrics)]
    loss = [(r["step"], r["loss"]) for r in recs if "loss" in r]
    perf = [(r["step"], r["perf/step_seconds"]) for r in recs
            if "perf/step_seconds" in r]
    tmin = [(r["step"], r["t_min"]) for r in recs if "t_min" in r]
    skipped = sum(r.get("skipped_nonfinite", 0.0) for r in recs)

    # resume boundaries: duplicated step numbers (restart re-logs from ckpt)
    seen, resumes = set(), set()
    for s, _ in loss:
        if s in seen:
            resumes.add(s)
        seen.add(s)
    resumes = sorted(resumes | {int(s) for s in args.resume_steps.split(",") if s})

    checks, details = {}, {}

    # ---- loss continuity at each resume -------------------------------------
    steps = np.array([s for s, _ in loss])
    vals = np.array([v for _, v in loss])
    cont = []
    for rs in resumes:
        before = vals[(steps <= rs) & (steps > rs - args.window)]
        after_idx = np.nonzero(steps > rs)[0][: args.window]
        after = vals[after_idx]
        if len(before) < 5 or len(after) < 5:
            continue
        lo, hi = float(before.min()), float(before.max())
        pad = args.slack * max(hi - lo, 1e-6)
        ok = lo - pad <= float(after.mean()) <= hi + pad
        cont.append({"resume_step": rs, "before_mean": round(float(before.mean()), 4),
                     "after_mean": round(float(after.mean()), 4),
                     "envelope": [round(lo - pad, 4), round(hi + pad, 4)],
                     "ok": ok})
    checks["loss_continuity"] = all(c["ok"] for c in cont) and bool(cont)
    details["continuity"] = cont

    # ---- step-time stability --------------------------------------------------
    pt = np.array([v for _, v in perf])
    if len(pt) >= 8:
        pt = pt[1:]  # drop the first flush (compile + warmup amortized into it)
        q = max(2, len(pt) // 4)
        first, last = float(pt[:q].mean()), float(pt[-q:].mean())
        drift = (last - first) / first
        checks["step_time_stable"] = abs(drift) <= args.drift
        details["step_time"] = {"first_quarter_s": round(first, 4),
                                "last_quarter_s": round(last, 4),
                                "drift": round(drift, 4),
                                "max_s": round(float(pt.max()), 4),
                                "flushes": len(pt)}
    else:
        checks["step_time_stable"] = False
        details["step_time"] = {"flushes": len(pt), "error": "too few flushes"}

    # ---- t_min resumes annealed, never resets (AdjustTmin: t_min += Δt per
    # epoch, capped at t_max → must be NON-DECREASING across restarts) --------
    tv = [v for _, v in tmin]
    checks["t_min_monotone"] = all(b >= a for a, b in zip(tv, tv[1:])) and bool(tv)
    details["t_min"] = {"trajectory": tv[:20], "n": len(tv)}

    checks["no_nonfinite_skips"] = skipped == 0
    details["skipped_nonfinite"] = skipped
    details["total_steps"] = int(steps.max()) if len(steps) else 0
    details["resumes_detected"] = resumes

    print(json.dumps({"soak": "ok" if all(checks.values()) else "FAIL",
                      "checks": checks, **details}))
    return 0 if all(checks.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
