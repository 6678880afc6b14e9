"""Composite-loss and train-step tests on the tiny config, incl. an 8-device DP run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeupdiffuse_tpu.config import tiny_test_config
from makeupdiffuse_tpu.core.schedule import DiffusionSchedule
from makeupdiffuse_tpu.losses import composite_loss, makeup_region_losses
from makeupdiffuse_tpu.models.controlled_ldm import init_model
from makeupdiffuse_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from makeupdiffuse_tpu.training.train_state import TrainState, trainable_mask
from makeupdiffuse_tpu.training.train_step import make_train_step


@pytest.fixture(scope="module")
def setup(tiny_model_session):
    cfg, model, params = tiny_model_session
    sched = DiffusionSchedule.create(timesteps=cfg.model.timesteps)
    return cfg, model, params, sched


def _batch(cfg, b=2, seed=0):
    m = cfg.model
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    H = m.image_size
    u = lambda k, *s: jax.random.uniform(k, s)
    batch = dict(
        src_img=u(ks[0], b, H, H, 3),
        ref_img=u(ks[1], b, H, H, 3),
        nonmakeup_img=u(ks[2], b, H, H, 3) * 2 - 1,
        makeup_img=u(ks[3], b, H, H, 3) * 2 - 1,
        nonmakeup_seg=jax.random.randint(ks[4], (b, H, H), 0, 14),
        mask_s_full=(u(ks[5], b, H, H, 4) > 0.7).astype(jnp.float32),
        pgt_sr=u(ks[6], b, H, H, 3) * 2 - 1,
        makeup_pgt=u(ks[7], b, H, H, 3) * 2 - 1,
        context=jax.random.normal(ks[0], (b, m.clip.max_length, m.unet.context_dim)),
    )
    return batch


def test_composite_loss_terms(setup):
    cfg, model, params, sched = setup
    batch = _batch(cfg)
    # jit: run as ONE compiled program (and persist it) — bare eager evaluation
    # dispatches thousands of per-op executables at ~60 ms each on this host
    loss, ld = jax.jit(lambda p, b: composite_loss(
        model, p, sched, cfg.model, b, jax.random.PRNGKey(1), jnp.asarray(100)
    ))(params, batch)
    expected_keys = {"loss_base", "loss_idt_src", "loss_idt_ref", "loss_cycle_content",
                     "loss_cycle_makeup", "loss_background", "loss_makeup", "loss"}
    assert expected_keys == set(ld)
    assert np.isfinite(float(loss))
    # weighted sum identity
    m = cfg.model
    total = (m.l_simple_weight * ld["loss_base"] + m.w_idt_src * ld["loss_idt_src"]
             + m.w_idt_ref * ld["loss_idt_ref"] + m.w_cycle_content * ld["loss_cycle_content"]
             + m.w_cycle_makeup * ld["loss_cycle_makeup"] + m.w_bkgrd * ld["loss_background"]
             + m.w_makeup * ld["loss_makeup"])
    np.testing.assert_allclose(float(loss), float(total), rtol=1e-6)


def test_makeup_region_losses_golden():
    b, h = 1, 8
    sr = jnp.ones((b, h, h, 3)) * 0.5
    pgt = jnp.zeros((b, h, h, 3))
    mask = jnp.zeros((b, h, h, 4)).at[:, 0:2, 0:2, 0].set(1.0)  # lip only
    got = makeup_region_losses(sr, pgt, mask, eye_margin=1,
                               lambda_lip=2.0, lambda_eye=1.0, lambda_skin=1.0)
    # L1 over ALL elements: 4 lip pixels × 3 ch × 0.5 / (8·8·3)
    expect = 2.0 * (4 * 3 * 0.5) / (h * h * 3)
    np.testing.assert_allclose(float(got), expect, rtol=1e-6)


def test_trainable_mask_controlnet_only(setup):
    cfg, model, params, sched = setup
    mask = trainable_mask(params["params"], sd_locked=True)
    import flax
    flat = flax.traverse_util.flatten_dict(mask, sep="/")
    on = {k for k, v in flat.items() if v}
    assert all(k.startswith("control_model") for k in on)
    assert any(k.startswith("control_model") for k in on)
    # unlocked adds UNet decoder side
    mask2 = trainable_mask(params["params"], sd_locked=False)
    flat2 = flax.traverse_util.flatten_dict(mask2, sep="/")
    on2 = {k for k, v in flat2.items() if v}
    assert any(k.startswith("diffusion_model/up_") for k in on2)
    assert not any(k.startswith("diffusion_model/down_") for k in on2)
    assert not any(k.startswith("first_stage_model") for k in on2)


def test_pristine_init_has_zero_grads(setup):
    """At exact zero-init (UNet conv_out AND control zero-convs are zeros — SD
    semantics) every trainable gradient vanishes; training always starts from
    converted SD weights, like the reference (runs/train.py:59-68)."""
    cfg, model, params, sched = setup
    batch = _batch(cfg)

    def loss_fn(p, b):
        return composite_loss(model, p, sched, cfg.model, b,
                              jax.random.PRNGKey(1), jnp.asarray(100))[0]

    grads = jax.jit(jax.grad(loss_fn))(params, batch)
    import flax
    flat = flax.traverse_util.flatten_dict(grads["params"], sep="/")
    ctrl = [v for k, v in flat.items() if k.startswith("control_model")]
    assert all(float(jnp.abs(v).max()) == 0.0 for v in ctrl)


def _trained_like(params):
    """Perturb params so zero-init convs are active (as converted weights would be)."""
    return jax.tree_util.tree_map(lambda p: p + 0.01, params)


def test_train_step_updates_only_controlnet(setup):
    cfg, model, params, sched = setup
    params = _trained_like(params)
    state = TrainState.create(params, cfg.train, cfg.model)
    step = make_train_step(model, sched, cfg.model, donate=False)
    batch = _batch(cfg)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # ControlNet params moved, UNet/VAE/CLIP untouched
    import flax
    old = flax.traverse_util.flatten_dict(params["params"], sep="/")
    new = flax.traverse_util.flatten_dict(new_state.params["params"], sep="/")
    moved = {k for k in old if not np.allclose(old[k], new[k])}
    assert moved, "no parameters moved"
    assert all(k.startswith("control_model") for k in moved)
    frozen_unet = [k for k in old if k.startswith("diffusion_model")]
    assert all(np.allclose(old[k], new[k]) for k in frozen_unet)


def test_adjust_t_min(setup):
    cfg, model, params, sched = setup
    state = TrainState.create(params, cfg.train, cfg.model)
    assert int(state.t_min) == 100
    state = state.adjust_t_min(delta_t=50, t_max=900)
    assert int(state.t_min) == 150
    for _ in range(20):
        state = state.adjust_t_min(delta_t=50, t_max=900)
    assert int(state.t_min) == 900  # capped


def test_dp_sharded_train_step_matches_single(setup):
    """8-device data-parallel step == single-device step (same math, psum'd grads)."""
    cfg, model, params, sched = setup
    batch = _batch(cfg, b=8, seed=3)

    state = TrainState.create(params, cfg.train, cfg.model)
    step = make_train_step(model, sched, cfg.model, donate=False)
    _, metrics_single = step(state, batch, jax.random.PRNGKey(4))

    mesh = make_mesh()
    assert mesh.devices.size == 8
    state_r = replicate(mesh, state)
    batch_s = shard_batch(mesh, batch)
    _, metrics_dp = step(state_r, batch_s, jax.random.PRNGKey(4))
    np.testing.assert_allclose(
        float(metrics_dp["loss"]), float(metrics_single["loss"]), rtol=2e-4
    )


def test_ema_tracking(setup):
    cfg, model, params, sched = setup
    params = _trained_like(params)
    state = TrainState.create(params, cfg.train, cfg.model, use_ema=True, ema_decay=0.5)
    assert state.ema_params is not None
    step = make_train_step(model, sched, cfg.model, donate=False)
    batch = _batch(cfg)
    new_state, _ = step(state, batch, jax.random.PRNGKey(0))
    import flax
    p = flax.traverse_util.flatten_dict(new_state.params["params"], sep="/")
    e = flax.traverse_util.flatten_dict(new_state.ema_params["params"], sep="/")
    moved = [k for k in p if not np.allclose(p[k], e[k])]
    assert moved  # EMA lags the live params where they moved
    # EMA = 0.5*old + 0.5*new for the moved leaves
    o = flax.traverse_util.flatten_dict(params["params"], sep="/")
    for k in moved[:3]:
        np.testing.assert_allclose(np.asarray(e[k]), 0.5 * np.asarray(o[k]) + 0.5 * np.asarray(p[k]),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("param", ["eps", "x0", "v"])
def test_parameterization_train_step(setup, param):
    """Training target follows cfg.parameterization (origin_x0.py:22-28 /
    makeup_diffuse.py:83-91) — all three train with finite loss."""
    import dataclasses
    cfg, model, params, _ = setup
    m = dataclasses.replace(cfg.model, parameterization=param)
    sched_p = DiffusionSchedule.create(timesteps=m.timesteps, parameterization=param)
    params = _trained_like(params)
    state = TrainState.create(params, cfg.train, m)
    step = make_train_step(model, sched_p, m, donate=False)
    new_state, metrics = step(state, _batch(cfg), jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"])), param
    assert int(new_state.step) == 1


def test_parameterization_targets_golden(setup):
    """v target == sched.get_v; x0 target == x_start; eps target == noise
    (VERDICT r1 item 2's done-criterion)."""
    from makeupdiffuse_tpu.losses import diffusion_target, x_recon_from_output
    cfg, model, params, sched = setup
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    z = jax.random.normal(k1, (2, 8, 8, 4))
    noise = jax.random.normal(k2, (2, 8, 8, 4))
    t = jnp.asarray([13, 977])
    np.testing.assert_array_equal(
        np.asarray(diffusion_target(sched, "eps", z, noise, t)), np.asarray(noise))
    np.testing.assert_array_equal(
        np.asarray(diffusion_target(sched, "x0", z, noise, t)), np.asarray(z))
    np.testing.assert_allclose(
        np.asarray(diffusion_target(sched, "v", z, noise, t)),
        np.asarray(sched.get_v(z, noise, t)), rtol=1e-6)
    # v-model x_recon roundtrip: x_t = q_sample(z, t, noise), v = get_v →
    # predict_start_from_z_and_v recovers z
    x_t = sched.q_sample(z, t, noise)
    v = sched.get_v(z, noise, t)
    np.testing.assert_allclose(
        np.asarray(x_recon_from_output(sched, "v", x_t, t, v)), np.asarray(z),
        rtol=1e-4, atol=1e-5)


def test_fake_sr_detached_by_default(setup):
    """Reference parity (ADVICE r1 high): fake_sr comes from a no-grad decode, so
    with only the fake_sr-dependent weights active the trainable grads are ZERO by
    default and nonzero under grad_through_fake_sr=True."""
    import dataclasses
    import flax
    cfg, model, params, sched = setup
    params = _trained_like(params)
    batch = _batch(cfg)
    base = dataclasses.replace(
        cfg.model, l_simple_weight=0.0, w_idt_src=0.0, w_idt_ref=0.0,
        w_cycle_content=0.0, w_cycle_makeup=0.0, w_bkgrd=1.0, w_makeup=1.0,
    )

    def gnorm(m_cfg):
        g = jax.jit(jax.grad(lambda p, b: composite_loss(
            model, p, sched, m_cfg, b, jax.random.PRNGKey(1), jnp.asarray(100)
        )[0]))(params, batch)
        flat = flax.traverse_util.flatten_dict(g["params"], sep="/")
        return sum(float(jnp.abs(v).sum()) for k, v in flat.items()
                   if k.startswith("control_model"))

    assert gnorm(base) == 0.0
    assert gnorm(dataclasses.replace(base, grad_through_fake_sr=True)) > 0.0


def test_cast_frozen_to_bf16(setup):
    from makeupdiffuse_tpu.training.train_state import cast_frozen_to_bf16
    cfg, model, params, sched = setup
    import flax
    cast = cast_frozen_to_bf16(params, sd_locked=True)
    flat = flax.traverse_util.flatten_dict(cast["params"], sep="/")
    for k, v in flat.items():
        if k.startswith("control_model"):
            assert v.dtype == jnp.float32, k  # trainable stays f32
        else:
            assert v.dtype == jnp.bfloat16, k  # frozen cast down
    # the model still runs with mixed-dtype params
    batch = _batch(cfg)
    loss, _ = jax.jit(lambda p, b: composite_loss(
        model, p, sched, cfg.model, b, jax.random.PRNGKey(0), jnp.asarray(100)
    ))(cast, batch)
    assert np.isfinite(float(loss))


def test_nonfinite_guard_skips_update(setup):
    """A batch that produces a non-finite loss/grads must NOT move params,
    optimizer moments or EMA — only `step` advances — and the next clean batch
    must train normally (in-graph guard, train_step.py; the reference's
    Lightning harness would silently poison the weights forever)."""
    import flax
    cfg, model, params, sched = setup
    params = _trained_like(params)
    state = TrainState.create(params, cfg.train, cfg.model, use_ema=True)
    step = make_train_step(model, sched, cfg.model, donate=False)

    bad = dict(_batch(cfg))
    bad["pgt_sr"] = jnp.asarray(bad["pgt_sr"]).at[0, 0, 0, 0].set(jnp.nan)
    s1, m1 = step(state, bad, jax.random.PRNGKey(0))
    assert float(m1["skipped_nonfinite"]) == 1.0
    assert not np.isfinite(float(m1["loss"]))
    assert int(s1.step) == 1  # the loop moves on; only the update is skipped
    for tree_a, tree_b in ((state.params, s1.params),
                           (state.ema_params, s1.ema_params),
                           (state.opt_state, s1.opt_state)):
        for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                        jax.tree_util.tree_leaves(tree_b)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    good = _batch(cfg, seed=3)
    s2, m2 = step(s1, good, jax.random.PRNGKey(1))
    assert float(m2["skipped_nonfinite"]) == 0.0
    assert np.isfinite(float(m2["loss"]))
    old = flax.traverse_util.flatten_dict(s1.params["params"], sep="/")
    new = flax.traverse_util.flatten_dict(s2.params["params"], sep="/")
    assert any(not np.allclose(old[k], new[k]) for k in old), \
        "clean step after a skipped one did not train"
