"""End-to-end smoke: tiny model, synthetic data → fit() 2 epochs with checkpointing
and image logs → restore → inference artifacts (the Fill50k-style sanity pattern,
SURVEY.md §4)."""
import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeupdiffuse_tpu.api import transfer, transfer_artifacts
from makeupdiffuse_tpu.config import tiny_test_config
from makeupdiffuse_tpu.core.ddim import DDIMTables
from makeupdiffuse_tpu.core.schedule import DiffusionSchedule
from makeupdiffuse_tpu.data.synthetic import synthetic_face_batch
from makeupdiffuse_tpu.models.controlled_ldm import init_model
from makeupdiffuse_tpu.training.checkpoint import CheckpointManager
from makeupdiffuse_tpu.training.loop import fit, prepare_model_batch
from makeupdiffuse_tpu.training.train_state import TrainState


@pytest.fixture(scope="module")
def setup(tiny_model_session):
    return tiny_model_session


def test_fit_checkpoints_and_metrics(setup, tmp_path):
    cfg, model, params = setup
    m = cfg.model
    import dataclasses
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ckpt_every_steps=2, logger_freq=0)
    )
    # copy: fit()'s donated train step would delete the shared fixture's buffers
    params = jax.tree_util.tree_map(lambda x: x.copy(), params)
    state = TrainState.create(params, cfg.train, m)

    def data(epoch):
        for i in range(2):
            yield synthetic_face_batch(2, m.image_size, m.unet.context_dim,
                                       m.clip.max_length, seed=epoch * 10 + i)

    ctx_fn = lambda b: jnp.zeros((b, m.clip.max_length, m.unet.context_dim))
    out = fit(cfg, model, state, data, ctx_fn, log_dir=str(tmp_path), num_epochs=2,
              mesh=None)
    assert int(out.step) == 4
    # AdjustTmin ran twice: 100 + 2·50
    assert int(out.t_min) == 200
    # metrics jsonl exists with per-loss keys
    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    step_recs = [r for r in recs if "loss_base" in r]
    assert len(step_recs) == 4
    assert {"loss_base", "loss_idt_src", "loss_makeup", "grad_norm"} <= set(step_recs[0])
    # checkpoints saved and restorable
    ck = CheckpointManager(str(tmp_path / "checkpoints"))
    assert ck.latest_step() == 4
    fresh = TrainState.create(params, cfg.train, m)
    restored = ck.restore(fresh)
    assert int(restored.step) == 4
    # the step-4 checkpoint was written during epoch 1 (t_min=150); orbax keeps the
    # first write for a step, and the final epoch's t_min=200 lives in `out` only
    assert int(restored.t_min) == 150
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(out.params)[0]),
    )


def test_prepare_model_batch_teachers(setup):
    cfg, model, params = setup
    m = cfg.model
    hb = synthetic_face_batch(2, m.image_size, m.unet.context_dim, m.clip.max_length)
    ctx = jnp.zeros((2, m.clip.max_length, m.unet.context_dim))
    alphas = jnp.asarray([0.1, 0.5, 0.3])
    mb = prepare_model_batch(hb, ctx, alphas, teacher_type="ELEGANT_PGT")
    np.testing.assert_array_equal(np.asarray(mb["pgt_sr"]), np.asarray(mb["makeup_pgt"]))
    mb2 = prepare_model_batch(hb, ctx, alphas, teacher_type="KEEP")
    np.testing.assert_array_equal(np.asarray(mb2["pgt_sr"]), hb["nonmakeup_img"])
    assert not np.allclose(np.asarray(mb2["makeup_pgt"]), hb["nonmakeup_img"])


def test_prepare_model_batch_gan_teachers(setup):
    """The production ELEGANT/SCGAN teacher types produce a target that is NOT the
    PGT side channel (get_target dispatch, diffusion_makeup.py:57-68)."""
    cfg, model, params = setup
    m = cfg.model
    hb = synthetic_face_batch(2, m.image_size, m.unet.context_dim, m.clip.max_length)
    ctx = jnp.zeros((2, m.clip.max_length, m.unet.context_dim))
    alphas = jnp.asarray([0.1, 0.5, 0.3])
    for tt in ("ELEGANT", "SCGAN"):
        mb = prepare_model_batch(hb, ctx, alphas, teacher_type=tt)
        assert not np.allclose(np.asarray(mb["pgt_sr"]), np.asarray(mb["makeup_pgt"])), tt
        assert np.isfinite(np.asarray(mb["pgt_sr"])).all(), tt
        assert float(jnp.abs(mb["pgt_sr"]).max()) <= 1.0, tt
    # the makeup_pgt side channel is the histogram compose in BOTH cases (:87-93)
    mb_e = prepare_model_batch(hb, ctx, alphas, teacher_type="ELEGANT")
    mb_p = prepare_model_batch(hb, ctx, alphas, teacher_type="ELEGANT_PGT")
    np.testing.assert_allclose(np.asarray(mb_e["makeup_pgt"]),
                               np.asarray(mb_p["makeup_pgt"]), atol=1e-6)


def test_prepare_model_batch_fixbkgrd(setup):
    """is_fixbkgrd pastes source background/teeth/hair (seg∈{0,11,12}) over the
    teacher target (Fixbackground.get_target, makeup_teacher.py:248-263)."""
    cfg, model, params = setup
    m = cfg.model
    hb = synthetic_face_batch(2, m.image_size, m.unet.context_dim, m.clip.max_length)
    ctx = jnp.zeros((2, m.clip.max_length, m.unet.context_dim))
    alphas = jnp.asarray([0.3, 0.6, 0.4])
    mb = prepare_model_batch(hb, ctx, alphas, teacher_type="ELEGANT_PGT",
                             is_fixbkgrd=True)
    bk = np.isin(hb["nonmakeup_seg"], (0, 11, 12))[..., None]
    got = np.asarray(mb["pgt_sr"])
    np.testing.assert_allclose(np.where(bk, got, 0),
                               np.where(bk, hb["nonmakeup_img"], 0), atol=1e-5)
    # with the paste on, target ≠ side channel even for ELEGANT_PGT
    assert not np.allclose(got, np.asarray(mb["makeup_pgt"]))


@pytest.mark.parametrize("teacher_type", ["ELEGANT_PGT", "KEEP", "ELEGANT", "SCGAN"])
def test_fit_one_step_each_teacher(setup, tmp_path, teacher_type):
    """fit() runs the reference's production config end-to-end for every
    teacher_type string (VERDICT r1 item 1)."""
    import dataclasses
    cfg, model, params = setup
    m = dataclasses.replace(cfg.model, teacher_type=teacher_type)
    cfg = dataclasses.replace(
        cfg, model=m,
        train=dataclasses.replace(cfg.train, ckpt_every_steps=0, logger_freq=0),
    )
    params = jax.tree_util.tree_map(lambda x: x.copy(), params)
    state = TrainState.create(params, cfg.train, m)

    def data(epoch):
        yield synthetic_face_batch(2, m.image_size, m.unet.context_dim,
                                   m.clip.max_length, seed=11)

    ctx_fn = lambda b: jnp.zeros((b, m.clip.max_length, m.unet.context_dim))
    out = fit(cfg, model, state, data, ctx_fn, log_dir=str(tmp_path), num_epochs=1,
              mesh=None)
    assert int(out.step) == 1
    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    step_recs = [r for r in recs if "loss" in r]
    assert step_recs and np.isfinite(step_recs[0]["loss"])


def test_transfer_artifacts_full_set(setup):
    cfg, model, params = setup
    m = cfg.model
    sched = DiffusionSchedule.create(timesteps=m.timesteps)
    tables = DDIMTables.create(sched, num_steps=4)
    b, H = 1, m.image_size
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    pgt = jax.random.uniform(ks[0], (b, H, H, 3)) * 2 - 1
    src = jax.random.uniform(ks[1], (b, H, H, 3))
    ref = jax.random.uniform(ks[2], (b, H, H, 3))
    ctx = jax.random.normal(ks[3], (b, m.clip.max_length, m.unet.context_dim))
    uc = jnp.zeros_like(ctx)
    arts = transfer_artifacts(model, params, sched, tables, pgt, src, ref, ctx, uc,
                              jax.random.PRNGKey(0), t_min=100, cfg_scale=9.0)
    expect = {"reconstruction", "control_src", "control_ref", "ground_truth",
              "sample_ddmp", "samples", "samples_cfg_scale_9.00"}
    assert expect == set(arts)
    for k, v in arts.items():
        assert v.shape == (b, H, H, 3), k
        assert float(jnp.abs(v).max()) <= 1.0, k
    np.testing.assert_allclose(np.asarray(arts["control_src"]), np.asarray(src * 2 - 1),
                               atol=1e-5)


def test_transfer_minimal_api(setup):
    cfg, model, params = setup
    m = cfg.model
    sched = DiffusionSchedule.create(timesteps=m.timesteps)
    tables = DDIMTables.create(sched, num_steps=3)
    b, H = 2, m.image_size
    src = jax.random.uniform(jax.random.PRNGKey(1), (b, H, H, 3))
    ref = jax.random.uniform(jax.random.PRNGKey(2), (b, H, H, 3))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (b, m.clip.max_length, m.unet.context_dim))
    out = transfer(model, params, sched, tables, src, ref, ctx, jnp.zeros_like(ctx),
                   jax.random.PRNGKey(4), cfg_scale=9.0)
    assert out.shape == (b, H, H, 3)
    assert bool(jnp.isfinite(out).all())


def test_interpolate_transfer(setup):
    from makeupdiffuse_tpu.api import interpolate_transfer
    cfg, model, params = setup
    m = cfg.model
    sched = DiffusionSchedule.create(timesteps=m.timesteps)
    tables = DDIMTables.create(sched, num_steps=3)
    H = m.image_size
    src = jax.random.uniform(jax.random.PRNGKey(1), (1, H, H, 3))
    ref_a = jax.random.uniform(jax.random.PRNGKey(2), (1, H, H, 3))
    ref_b = jax.random.uniform(jax.random.PRNGKey(3), (1, H, H, 3))
    ctx = jax.random.normal(jax.random.PRNGKey(4), (1, m.clip.max_length, m.unet.context_dim))
    out = interpolate_transfer(model, params, sched, tables, src, ref_a, ref_b,
                               ctx, jnp.zeros_like(ctx), jax.random.PRNGKey(5),
                               num_steps=4, cfg_scale=9.0)
    assert out.shape == (4, H, H, 3)
    assert bool(jnp.isfinite(out).all())


def test_fit_sample_logging(setup, tmp_path):
    """sample_log=True dumps sampled artifact grids every logger_freq steps
    (MakeupImageLogger full log_images parity)."""
    import dataclasses
    cfg, model, params = setup
    m = cfg.model
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ckpt_every_steps=0, logger_freq=1)
    )
    params = jax.tree_util.tree_map(lambda x: x.copy(), params)
    state = TrainState.create(params, cfg.train, m)

    def data(epoch):
        yield synthetic_face_batch(2, m.image_size, m.unet.context_dim,
                                   m.clip.max_length, seed=7)

    ctx_fn = lambda b: jnp.zeros((b, m.clip.max_length, m.unet.context_dim))
    fit(cfg, model, state, data, ctx_fn, log_dir=str(tmp_path), num_epochs=1,
        mesh=None, sample_log=True, sample_steps=2)
    pngs = {os.path.basename(p) for p in glob.glob(str(tmp_path / "images" / "*.png"))}
    assert any(p.startswith("samples_cfg_scale_9.00") for p in pngs), pngs
    assert any(p.startswith("sample_ddmp") for p in pngs)
    # progressive strips (plot_diffusion_rows/plot_denoise_rows parity)
    assert any(p.startswith("diffusion_row") for p in pngs), pngs
    assert any(p.startswith("denoise_row") for p in pngs)


def test_progressive_artifacts_shapes(setup):
    """diffusion_row tiles every log_every_t-th t (+T−1); denoise_row ~6 stops of
    the DDIM chain (makeup_controlnet.py:55-84)."""
    from makeupdiffuse_tpu.api import progressive_artifacts

    cfg, model, params = setup
    m = cfg.model
    H = m.image_size
    sched = DiffusionSchedule.create(timesteps=m.timesteps)
    tables = DDIMTables.create(sched, num_steps=4)
    b = 2
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    pgt = jax.random.uniform(ks[0], (b, H, H, 3)) * 2 - 1
    src = jax.random.uniform(ks[1], (b, H, H, 3))
    ref = jax.random.uniform(ks[2], (b, H, H, 3))
    ctx = jnp.zeros((b, m.clip.max_length, m.unet.context_dim))
    rows = progressive_artifacts(model, params, sched, tables, pgt, src, ref,
                                 ctx, ks[3], log_every_t=m.timesteps // 2)
    tiles, k1 = rows["diffusion_row"]
    # ts = {0, T/2} plus T-1
    assert k1 == 3 and tiles.shape == (b * k1, H, H, 3)
    tiles2, k2 = rows["denoise_row"]
    assert tiles2.shape == (b * k2, H, H, 3) and 1 <= k2 <= tables.num_steps
    for t in (tiles, tiles2):
        assert bool(jnp.isfinite(t).all())


def test_ddim_return_pred_x0_consistent():
    """return_pred_x0 keeps the final latent identical and stacks S predictions."""
    from makeupdiffuse_tpu.core.ddim import ddim_reconstruct

    sched = DiffusionSchedule.create(timesteps=100)
    tables = DDIMTables.create(sched, num_steps=5)
    den = lambda x, t: 0.1 * x  # any fixed pseudo-denoiser
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    plain = ddim_reconstruct(den, x, tables, t_start=5)
    both, preds = ddim_reconstruct(den, x, tables, t_start=5, return_pred_x0=True)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(both), rtol=1e-6)
    assert preds.shape == (5,) + x.shape
