"""Module-level tests: shapes, zero-init control behavior, CFG fusion, VAE geometry.

Mirrors the reference's implicit invariants: a freshly initialized ControlNet is a
no-op on the UNet (zero convs — cldm design), apply_model(return_all) returns a
consistent (eps, x_recon) pair, and the latent is (H/8)²·4.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeupdiffuse_tpu.config import tiny_test_config
from makeupdiffuse_tpu.core.schedule import DiffusionSchedule
from makeupdiffuse_tpu.models.controlled_ldm import (
    ControlledLDM,
    apply_model,
    decode_image,
    get_z,
    init_model,
    make_denoiser,
)
from makeupdiffuse_tpu.models.layers import timestep_embedding


@pytest.fixture(scope="module")
def setup(tiny_model_session):
    cfg, model, params = tiny_model_session
    return cfg.model, model, params


def _batch(cfg, b=2, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    h = cfg.latent_size
    x = jax.random.normal(ks[0], (b, h, h, cfg.latent_channels))
    t = jnp.array([3, 700][:b], dtype=jnp.int32)
    ctx = jax.random.normal(ks[1], (b, cfg.clip.max_length, cfg.unet.context_dim))
    hint = jax.random.uniform(ks[2], (b, cfg.image_size, cfg.image_size, cfg.control.hint_channels))
    return x, t, ctx, hint


def test_timestep_embedding_golden():
    emb = timestep_embedding(jnp.array([0, 10]), 8)
    e = np.asarray(emb)
    assert e.shape == (2, 8)
    np.testing.assert_allclose(e[0], [1, 1, 1, 1, 0, 0, 0, 0], atol=1e-6)
    freqs = np.exp(-np.log(10000) * np.arange(4) / 4)
    np.testing.assert_allclose(e[1], np.concatenate([np.cos(10 * freqs), np.sin(10 * freqs)]), rtol=1e-5)


def test_eps_shape_and_zero_control_noop(setup):
    """With zero-initialized ControlNet zero-convs, eps(hint) == eps(None)."""
    cfg, model, params = setup
    x, t, ctx, hint = _batch(cfg)
    eps_ctrl = model.apply(params, x, t, ctx, hint, method=model.apply_eps)
    eps_free = model.apply(params, x, t, ctx, None, method=model.apply_eps)
    assert eps_ctrl.shape == x.shape
    np.testing.assert_allclose(np.asarray(eps_ctrl), np.asarray(eps_free), atol=1e-5)


def test_control_scales_zero_equals_uncontrolled(setup):
    cfg, model, params = setup
    # perturb zero convs so control is active, then verify scale=0 disables it
    params2 = jax.tree_util.tree_map(lambda p: p + 0.01, params)
    x, t, ctx, hint = _batch(cfg)
    scales0 = jnp.zeros((cfg.num_control_levels,))
    eps_s0 = model.apply(params2, x, t, ctx, hint, scales0, method=model.apply_eps)
    eps_free = model.apply(params2, x, t, ctx, None, method=model.apply_eps)
    np.testing.assert_allclose(np.asarray(eps_s0), np.asarray(eps_free), atol=1e-5)
    eps_s1 = model.apply(params2, x, t, ctx, hint, method=model.apply_eps)
    assert not np.allclose(np.asarray(eps_s1), np.asarray(eps_free), atol=1e-4)


def test_only_mid_control(setup):
    cfg, model, params = setup
    params2 = jax.tree_util.tree_map(lambda p: p + 0.01, params)
    x, t, ctx, hint = _batch(cfg)
    eps_full = model.apply(params2, x, t, ctx, hint, None, False, method=model.apply_eps)
    eps_mid = model.apply(params2, x, t, ctx, hint, None, True, method=model.apply_eps)
    assert not np.allclose(np.asarray(eps_full), np.asarray(eps_mid), atol=1e-5)


def test_apply_model_return_all_consistent(setup):
    cfg, model, params = setup
    sched = DiffusionSchedule.create()
    x, t, ctx, hint = _batch(cfg)
    eps, x_recon = apply_model(model, params, sched, x, t, ctx, hint, return_x_recon=True)
    expect = sched.predict_start_from_noise(x, t, eps)
    np.testing.assert_allclose(np.asarray(x_recon), np.asarray(expect), rtol=1e-5, atol=1e-5)


def test_vae_roundtrip_geometry(setup):
    cfg, model, params = setup
    img = jax.random.uniform(jax.random.PRNGKey(7), (2, cfg.image_size, cfg.image_size, 3)) * 2 - 1
    z = get_z(model, params, img, jax.random.PRNGKey(8))
    assert z.shape == (2, cfg.latent_size, cfg.latent_size, 4)
    out = decode_image(model, params, z)
    assert out.shape == img.shape
    assert float(jnp.abs(out).max()) <= 1.0  # clamped


def test_text_encoder_shape(setup):
    cfg, model, params = setup
    ids = jnp.zeros((2, cfg.clip.max_length), jnp.int32)
    ctx = model.apply(params, ids, method=model.encode_text)
    assert ctx.shape == (2, cfg.clip.max_length, cfg.clip.width)


def test_text_encoder_causality(setup):
    """Changing a later token must not affect earlier positions (causal mask)."""
    cfg, model, params = setup
    ids1 = jnp.zeros((1, cfg.clip.max_length), jnp.int32)
    ids2 = ids1.at[0, -1].set(5)
    c1 = model.apply(params, ids1, method=model.encode_text)
    c2 = model.apply(params, ids2, method=model.encode_text)
    np.testing.assert_allclose(np.asarray(c1[0, :-1]), np.asarray(c2[0, :-1]), atol=1e-5)
    assert not np.allclose(np.asarray(c1[0, -1]), np.asarray(c2[0, -1]), atol=1e-4)


def test_cfg_denoiser_math(setup):
    """Fused CFG == uncond + scale·(cond − uncond) from two separate passes."""
    cfg, model, params = setup
    params2 = jax.tree_util.tree_map(lambda p: p + 0.01, params)
    x, t, ctx, hint = _batch(cfg, b=1)
    uc = jnp.zeros_like(ctx)
    den = make_denoiser(model, params2, ctx, hint, uncond_context=uc, cfg_scale=9.0)
    fused = den(x, t[:1])
    e_c = model.apply(params2, x, t[:1], ctx, hint, method=model.apply_eps)
    e_u = model.apply(params2, x, t[:1], uc, hint, method=model.apply_eps)
    expect = e_u + 9.0 * (e_c - e_u)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(expect), rtol=2e-3, atol=2e-3)


def test_num_control_levels_matches_controlnet(setup):
    cfg, model, params = setup
    x, t, ctx, hint = _batch(cfg, b=1)
    controls = model.apply(
        params,
        x, hint, t[:1], ctx,
        method=lambda m, *a: m.control_model(*a),
    )
    assert len(controls) == cfg.num_control_levels


def test_hint_features_hoist_parity(setup):
    """apply_eps with a precomputed hint stem == apply_eps computing it inline,
    and the CFG denoiser (which hoists the stem out of the sampling scan) matches
    the manual cond/uncond combination."""
    from makeupdiffuse_tpu.models.controlled_ldm import compute_hint_features

    cfg, model, params = setup
    x, t, ctx, hint = _batch(cfg, seed=11)
    hf = compute_hint_features(model, params, hint)
    eps_inline = model.apply(params, x, t, ctx, hint, method=model.apply_eps)
    eps_hoisted = model.apply(params, x, t, ctx, None, None, False, hf,
                              method=model.apply_eps)
    np.testing.assert_allclose(np.asarray(eps_hoisted), np.asarray(eps_inline),
                               rtol=1e-5, atol=1e-5)
