"""End-to-end learning proof on the Fill-circles control task (short CPU run).

The reference validates its control pathway with the Fill50k toy task
(/root/reference/diffdata/datasets.py:221-262); scripts/learnproof.py reproduces
that pattern tpu-side (VAE pretrain → uncond UNet pretrain → ControlNet-only
training). This test runs the driver with miniature step counts and asserts every
stage's loss decreases — training dynamics, not just one-step execution.
"""
import argparse
import importlib.util
import json
import os


def _load_learnproof():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "learnproof", os.path.join(root, "scripts", "learnproof.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_learnproof_losses_decrease(tmp_path):
    run = _load_learnproof().run

    args = argparse.Namespace(
        cpu=True, model="tiny", batch=4, steps_a1=12, steps_a2=12, steps_b=16,
        sample_steps=2, chunk=6, decisive_factor=0.0, lr_vae=1e-3, lr_unet=2e-4,
        lr_control=2e-4, seed=0, out=str(tmp_path),
    )
    rc = run(args)
    assert rc == 0, "a stage's fixed-probe loss failed to decrease"
    with open(os.path.join(str(tmp_path), "summary.json")) as f:
        s = json.load(f)
    for stage in ("a1_vae", "a2_unet", "b_control"):
        # deterministic probe (same batch + noise key before/after) — the per-step
        # curve means are sampling noise at these miniature step counts
        assert s[stage]["probe_last"] < s[stage]["probe_first"], (stage, s[stage])
    # artifacts written: loss curves + before/after/shuffled grids
    for fn in ("loss_a1_vae.jsonl", "loss_b_control.jsonl",
               "samples_shuffled_hint.png"):
        assert os.path.exists(os.path.join(str(tmp_path), fn))


def test_committed_artifact_is_decisive():
    """The COMMITTED learning-proof artifact (artifacts/learnproof, produced by
    the full on-chip run: small preset, 2000/4000/6000 steps, batch 32) must be
    decisive — after-control samples beat the before-control AND shuffled-hint
    baselines by >=5x sample MSE (VERDICT r3 #1 done-criterion). The committed
    grids show the samples visibly matching the hinted position/size/color."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "artifacts", "learnproof", "summary.json")) as f:
        s = json.load(f)
    mse = s["sample_vs_target_mse"]
    assert mse["before_control"] >= 5.0 * mse["after_control"], mse
    assert mse["shuffled_hint"] >= 5.0 * mse["after_control"], mse
    # every stage's fixed-probe loss decreased in the committed run too
    for stage in ("a1_vae", "a2_unet", "b_control"):
        assert s[stage]["probe_last"] < s[stage]["probe_first"], (stage, s[stage])
    for fn in ("samples_before_control.png", "samples_after_control.png",
               "samples_shuffled_hint.png", "samples_uncond_after_a2.png"):
        assert os.path.exists(os.path.join(root, "artifacts", "learnproof", fn))


def test_learnproof_makeup_recipe_runs_and_learns(tmp_path):
    """Miniature run of the FULL makeup-recipe proof (scripts/learnproof_makeup.py):
    the REAL composite_loss + PGT teacher on parametric faces with known region
    colors. At CI scale this asserts the machinery (pool build, on-device PGT
    compose, 3 stages, region metrics, grids) and that every stage's fixed
    probe decreases — the decisive-factor gate runs at full scale on-chip
    (artifacts/learnproof_makeup)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "learnproof_makeup", os.path.join(root, "scripts", "learnproof_makeup.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    args = argparse.Namespace(
        cpu=True, model="tiny", batch=4, pool=32, steps_a1=12, steps_a2=12,
        steps_c=12, sample_steps=2, chunk=6, alphas=(1.0, 1.0, 1.0),
        decisive_factor=0.0, bg_bound=1.0, lr_vae=1e-3, lr_unet=2e-4,
        lr_control=2e-4, seed=0, out=str(tmp_path),
        # production-parity CFG eval path (hint-channel CFG, uncond=control-free)
        eval_cfg=9.0, eval_every=0, from_stage="a1",
    )
    rc = mod.run(args)
    assert rc == 0
    with open(os.path.join(str(tmp_path), "summary.json")) as f:
        s = json.load(f)
    for stage in ("a1_vae", "a2_unet", "c_composite"):
        assert s[stage]["probe_last"] < s[stage]["probe_first"], (stage, s[stage])
    # region metrics present and finite for all three sample arms
    for arm in ("before_composite", "after_composite", "shuffled_ref"):
        m = s["region_color_err"][arm]
        assert 0 <= m["color_err"] < 4 and 0 <= m["bg_mse"] < 4, (arm, m)
