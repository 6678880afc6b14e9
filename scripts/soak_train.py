"""Training soak: sustained fit() + mid-run kill + resume, asserted from metrics.

The Lightning-replacement claim (reference trains via pl.Trainer with
ModelCheckpoint(every_n_train_steps=200) and manual resume_path restart,
/root/reference/runs/train.py:50,55,59) exercised as deployment-truth:

  1. run `scripts/train.py --synthetic` for a while (phase 1)
  2. SIGTERM it after the first checkpoint has committed and training has run
     well past it (never SIGKILL — a mid-compile SIGKILL wedges the TPU
     attachment for ~10 min)
  3. relaunch the identical command (phase 2): the driver's automatic
     latest-checkpoint pickup restores step/params/opt_state/t_min and
     continues to the target step count
  4. parse the shared append-mode metrics.jsonl + the phase-2 stdout and assert:
       - resume happened exactly at the last committed checkpoint step
       - t_min was restored (not re-initialised) across the kill
       - loss continuity: the post-resume loss window is in line with the
         pre-kill window (no re-warmup cliff, no divergence)
       - no non-finite-guard skips anywhere in the run
       - step-time stability: late-run step seconds within drift_tol of the
         early post-warmup rate (no fragmentation/creep), and the max
         flush-window step time (which absorbs ckpt writes + image grids)
         reported so checkpoint-write stalls are visible

Writes <out>/soak_summary.json and exits 0 only if every assert holds.

Usage (flagship, on the real chip — ~500 composite steps):
  python scripts/soak_train.py --out artifacts/soak
CI (tiny model, CPU):
  python scripts/soak_train.py --cpu --tiny --steps-per-epoch 5 --epochs1 4 \
      --epochs2 2 --ckpt-every 5 --kill-after 12 --batch 2 --out /tmp/soak
"""
import argparse
import glob
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def read_metrics(log_root):
    paths = glob.glob(os.path.join(log_root, "**", "metrics.jsonl"), recursive=True)
    if not paths:
        return None, []
    assert len(paths) == 1, paths
    recs = []
    with open(paths[0]) as f:
        for line in f:
            try:
                recs.append(json.loads(line))
            except json.JSONDecodeError:
                pass  # torn final line of a killed writer
    return paths[0], recs


def max_step(recs):
    return max((r["step"] for r in recs), default=0)


def spawn(args, epochs, log):
    cmd = [sys.executable, os.path.join(REPO, "scripts", "train.py"),
           "--synthetic", "--log-root", args.log_root,
           "--steps-per-epoch", str(args.steps_per_epoch),
           "--epochs", str(epochs), "--ckpt-every", str(args.ckpt_every),
           "--batch-size", str(args.batch)]
    if args.tiny:
        cmd.append("--tiny")
    if args.cpu:
        cmd.append("--cpu")
    f = open(log, "w")
    return subprocess.Popen(cmd, stdout=f, stderr=subprocess.STDOUT, cwd=REPO), f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU in the children")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--batch", type=int, default=6)  # reference batch, train.py:16
    ap.add_argument("--steps-per-epoch", type=int, default=50)
    ap.add_argument("--epochs1", type=int, default=10,
                    help="phase-1 epoch target (killed before reaching it)")
    ap.add_argument("--epochs2", type=int, default=6,
                    help="phase-2 epochs to run after resume")
    ap.add_argument("--ckpt-every", type=int, default=100)
    ap.add_argument("--kill-after", type=int, default=260,
                    help="SIGTERM phase 1 once metrics show step >= this "
                         "(must be > --ckpt-every so a checkpoint committed)")
    ap.add_argument("--loss-key", default="loss")
    ap.add_argument("--window", type=int, default=30)
    ap.add_argument("--loss-tol", type=float, default=1.5,
                    help="post-resume window mean must be <= pre-kill mean * tol")
    ap.add_argument("--drift-tol", type=float, default=0.20,
                    help="late step-seconds vs early post-warmup, relative")
    ap.add_argument("--timeout", type=float, default=5400.0)
    ap.add_argument("--out", default="artifacts/soak")
    args = ap.parse_args()
    assert args.kill_after > args.ckpt_every

    os.makedirs(args.out, exist_ok=True)
    args.log_root = os.path.join(args.out, "run")
    assert not glob.glob(os.path.join(args.log_root, "**", "metrics.jsonl"),
                         recursive=True), f"{args.log_root} not clean"

    # ---- phase 1: train, then SIGTERM past the kill point --------------------
    t0 = time.time()
    p1, f1 = spawn(args, args.epochs1, os.path.join(args.out, "phase1.log"))
    killed_at = None
    while True:
        time.sleep(2.0)
        if p1.poll() is not None:
            break  # finished early (CI scale) — still fine, resume still tested
        _, recs = read_metrics(args.log_root)
        if max_step(recs) >= args.kill_after:
            killed_at = max_step(recs)
            p1.send_signal(signal.SIGTERM)
            try:
                p1.wait(timeout=120)
            except subprocess.TimeoutExpired:
                p1.kill()  # our own child by pid — last resort, steps are cheap
                p1.wait()
            break
        if time.time() - t0 > args.timeout:
            p1.send_signal(signal.SIGTERM)
            p1.wait(timeout=120)
            f1.close()
            raise SystemExit("phase 1 never reached the kill step in time")
    f1.close()
    _, recs1 = read_metrics(args.log_root)
    pre_kill_step = max_step(recs1)
    print(f"[soak] phase 1 ended at step {pre_kill_step} "
          f"(SIGTERM at {killed_at}) after {time.time()-t0:.0f}s", flush=True)

    # ---- phase 2: relaunch, auto-resume, run to completion --------------------
    t1 = time.time()
    p2, f2 = spawn(args, args.epochs2, os.path.join(args.out, "phase2.log"))
    rc = p2.wait(timeout=args.timeout)
    f2.close()
    phase2_log = open(os.path.join(args.out, "phase2.log")).read()
    print(f"[soak] phase 2 rc={rc} after {time.time()-t1:.0f}s", flush=True)
    assert rc == 0, f"phase 2 exited {rc}:\n{phase2_log[-2000:]}"

    # ---- analysis -------------------------------------------------------------
    mpath, recs = read_metrics(args.log_root)
    # resume boundary: metrics.jsonl is append-mode; the step sequence jumps
    # DOWN exactly once, at the restored checkpoint + 1
    loss_idx = [i for i, r in enumerate(recs) if args.loss_key in r]
    steps_seq = [recs[i]["step"] for i in loss_idx]
    drops = [i for i in range(1, len(steps_seq)) if steps_seq[i] < steps_seq[i - 1]]
    assert len(drops) == 1, f"expected exactly one resume boundary, got {drops}"
    bi = drops[0]
    resume_step = steps_seq[bi]
    import re

    m_res = re.search(r"resumed from step (\d+) \(t_min=(\d+)\)", phase2_log)
    assert m_res, "phase 2 did not report the checkpoint restore (with t_min)"
    ckpt_step, resumed_t_min = int(m_res.group(1)), int(m_res.group(2))
    assert resume_step == ckpt_step + 1, (resume_step, ckpt_step)
    # checkpoint saves are async (orbax; finalized by ckpt.wait() only at clean
    # exit), so a SIGTERM may legitimately lose the IN-FLIGHT save — but never
    # more than one interval, and never resume off-boundary or from a torn file
    assert ckpt_step % args.ckpt_every == 0, ckpt_step
    lost = pre_kill_step - ckpt_step
    assert 0 <= lost <= 2 * args.ckpt_every, \
        f"lost {lost} steps to the kill (> one in-flight ckpt interval)"

    losses = [(r["step"], r[args.loss_key]) for r in recs if args.loss_key in r]
    pre = [v for s, v in losses[:bi]][-args.window:]
    post = [v for s, v in losses[bi:]][:args.window]
    tail = [v for s, v in losses[bi:]][-args.window:]
    import statistics as st

    pre_m, post_m = st.fmean(pre), st.fmean(post)
    assert all(v == v and abs(v) != float("inf") for v in post + tail)
    skips = sum(r.get("skipped_nonfinite", 0.0) for r in recs)
    assert skips == 0, f"{skips} non-finite-guard skips during the soak"
    assert post_m <= pre_m * args.loss_tol, (pre_m, post_m)

    # step-time stability: perf samples, per process; drop each process's first
    # flush (compile/warmup), compare late vs early within phase 2
    perf = [(i, r["perf/step_seconds"]) for i, r in enumerate(recs)
            if "perf/step_seconds" in r]
    p2_start_wall = recs[loss_idx[bi]]["wall"]
    perf2 = [v for i, v in perf if recs[i]["wall"] >= p2_start_wall][1:]
    drift = None
    if len(perf2) >= 6:
        early = st.fmean(perf2[: len(perf2) // 3])
        late = st.fmean(perf2[-len(perf2) // 3:])
        drift = late / early - 1.0
        assert abs(drift) <= args.drift_tol, f"step-time drift {drift:+.1%}"

    summary = {
        "pre_kill_step": pre_kill_step, "resume_step": resume_step,
        "ckpt_step": ckpt_step, "steps_lost_to_kill": lost,
        "resumed_t_min": resumed_t_min,
        "final_step": max_step(recs),
        "loss_pre_kill_mean": pre_m, "loss_post_resume_mean": post_m,
        "loss_tail_mean": st.fmean(tail), "window": args.window,
        "nonfinite_skips": skips,
        "step_seconds_phase2": {
            "n": len(perf2),
            "median": st.median(perf2) if perf2 else None,
            "max": max(perf2) if perf2 else None,  # absorbs ckpt writes + grids
            "drift": drift,
        },
        "batch": args.batch, "ckpt_every": args.ckpt_every,
        "metrics_path": mpath, "tiny": args.tiny,
        "phase1_s": round(t1 - t0, 1),
        "phase2_s": round(time.time() - t1, 1),
    }
    with open(os.path.join(args.out, "soak_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    print(f"[soak] OK — killed at step {killed_at}, resumed at {resume_step} "
          f"(ckpt {ckpt_step}, t_min={resumed_t_min}), ran to "
          f"{summary['final_step']}; loss {pre_m:.3f} -> {post_m:.3f}; "
          f"drift {drift if drift is None else f'{drift:+.1%}'}", flush=True)


if __name__ == "__main__":
    main()
