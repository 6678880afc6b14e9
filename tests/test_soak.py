"""Miniature run of the kill/resume training soak (scripts/soak_train.py).

Pins the deployment-truth claims of the Lightning-replacement loop
(/root/reference/runs/train.py:50,55,59 — ModelCheckpoint + manual resume):
SIGTERM mid-training, relaunch, automatic latest-checkpoint pickup, loss and
t_min continuity, zero non-finite-guard skips — all asserted by the soak
driver itself; the test checks the driver reaches its OK verdict and that the
summary records a genuine mid-run resume. The flagship-scale on-chip run of
the same driver lands in artifacts/soak/ (PERF.md)."""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_soak_kill_resume_tiny(tmp_path):
    out = str(tmp_path / "soak")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "soak_train.py"),
         "--cpu", "--tiny", "--batch", "2", "--steps-per-epoch", "5",
         "--epochs1", "6", "--epochs2", "4", "--ckpt-every", "5",
         "--kill-after", "12", "--window", "5", "--out", out,
         "--timeout", "900"],
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    s = json.load(open(os.path.join(out, "soak_summary.json")))
    assert s["resume_step"] == s["ckpt_step"] + 1
    assert s["ckpt_step"] >= 5  # a real mid-run checkpoint, not the forced final
    assert s["final_step"] > s["pre_kill_step"]  # training continued past the kill
    assert s["nonfinite_skips"] == 0
    assert s["resumed_t_min"] is not None
