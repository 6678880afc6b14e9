"""Cycle-finetune family tests: truncated schedule, gradients THROUGH the sampler,
criterionHis semantics, inversion precompute round-trip, FFHQ/simple loss, hint modes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeupdiffuse_tpu.config import tiny_test_config
from makeupdiffuse_tpu.core.schedule import DiffusionSchedule
from makeupdiffuse_tpu.losses import build_hint, simple_diffusion_loss
from makeupdiffuse_tpu.models.controlled_ldm import init_model
from makeupdiffuse_tpu.models.cycle_finetune import (
    CycleFinetuneConfig,
    criterion_his,
    cycle_finetune_loss,
)
from makeupdiffuse_tpu.tools.invert_latents import make_inverter, vae_roundtrip


@pytest.fixture(scope="module")
def setup():
    # the cycle-finetune family uses SINGLE-image hints (makeups.py c_concat = one
    # image, :119-127) → hint_channels=3 ControlNet
    import dataclasses
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            hint_mode="single_ref",
            control=dataclasses.replace(cfg.model.control, hint_channels=3),
        ),
    )
    model, params = init_model(cfg.model, jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(lambda p: p + 0.01, params)  # activate zero-convs
    return cfg, model, params


def _cycle_batch(cfg, b=1, seed=0):
    m = cfg.model
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    h, H = m.latent_size, m.image_size
    return dict(
        src_inv=jax.random.normal(ks[0], (b, h, h, 4)) * 0.2,
        ref_inv=jax.random.normal(ks[1], (b, h, h, 4)) * 0.2,
        src_img=jax.random.uniform(ks[2], (b, H, H, 3)),
        ref_img=jax.random.uniform(ks[3], (b, H, H, 3)),
        src_msk=jax.random.randint(ks[4], (b, H, H), 0, 14),
        ref_msk=jax.random.randint(ks[5], (b, H, H), 0, 14),
        context=jax.random.normal(ks[0], (b, m.clip.max_length, m.unet.context_dim)),
    )


def test_truncated_schedule():
    cyc = CycleFinetuneConfig(t0=100, iter_finetune=5)
    from makeupdiffuse_tpu.config import ModelConfig
    sched = cyc.truncated_schedule(ModelConfig())
    assert sched.num_timesteps == 100
    tabs = cyc.tables(sched)
    assert tabs.num_steps == 5
    assert int(tabs.timesteps[-1]) <= 99


def test_cycle_loss_terms_and_gradients(setup):
    """The loss is finite and ControlNet gradients flow THROUGH the sampler loop."""
    cfg, model, params = setup
    cyc = CycleFinetuneConfig(t0=50, iter_finetune=2, remat_sampler=True,
                              weight_loss_makeup=1.0)
    sched = cyc.truncated_schedule(cfg.model)
    tabs = cyc.tables(sched)
    batch = _cycle_batch(cfg)

    def loss_fn(p, b):
        return cycle_finetune_loss(model, p, cyc, tabs, b)[0]

    # jit: one compiled (persisted) program instead of an eager per-op storm
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params, batch)
    assert np.isfinite(float(loss))
    import flax
    flat = flax.traverse_util.flatten_dict(grads["params"], sep="/")
    ctrl_norm = sum(float(jnp.abs(v).sum()) for k, v in flat.items()
                    if k.startswith("control_model"))
    assert ctrl_norm > 0, "no gradient reached the ControlNet through the sampler"

    _, ld = jax.jit(lambda p, b: cycle_finetune_loss(model, p, cyc, tabs, b))(
        params, batch)
    assert {"loss_background", "loss_makeup", "loss_idt", "loss_cycle", "loss"} <= set(ld)


def test_cycle_loss_weight_gating(setup):
    cfg, model, params = setup
    cyc = CycleFinetuneConfig(t0=50, iter_finetune=2, weight_loss_makeup=0,
                              weight_loss_idt=0, weight_loss_cycle=0)
    sched = cyc.truncated_schedule(cfg.model)
    tabs = cyc.tables(sched)
    _, ld = jax.jit(lambda p, b: cycle_finetune_loss(model, p, cyc, tabs, b))(
        params, _cycle_batch(cfg))
    assert "loss_makeup" not in ld and "loss_idt" not in ld and "loss_cycle" not in ld


def test_criterion_his_zero_when_matched():
    """If fake's masked histogram already equals the target's, the loss ≈ 0."""
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 3))
    mask = jnp.ones((1, 16, 16))
    loss = criterion_his(img, img, mask, mask)
    assert float(loss) < 2.0  # binned at 256 levels → off-by-one bin at most
    # mismatched histograms → larger loss
    dark = img * 0.2
    bright = img * 0.8 + 0.2
    loss2 = criterion_his(dark, bright, mask, mask)
    assert float(loss2) > float(loss)


def test_inverter_roundtrip(setup):
    """DDIM invert → regenerate ≈ identity on the latent (pre_dataset InvRec)."""
    cfg, model, params = setup
    m = cfg.model
    invert, sched, tabs = make_inverter(model, m, t0=50, inv_steps=5)
    b, H = 1, m.image_size
    img = jax.random.uniform(jax.random.PRNGKey(1), (b, H, H, 3)) * 2 - 1
    ctx = jax.random.normal(jax.random.PRNGKey(2), (b, m.clip.max_length, m.unet.context_dim))
    z_inv, z_gen = invert(params, img, ctx, jax.random.PRNGKey(3))
    assert z_inv.shape == (b, m.latent_size, m.latent_size, 4)
    assert bool(jnp.isfinite(z_inv).all()) and bool(jnp.isfinite(z_gen).all())
    # regenerated latent should be closer to the original z than the inverted one
    mean, logvar = model.apply(params, img, method=model.encode_moments)
    z0 = m.scale_factor * mean
    err_gen = float(jnp.mean((z_gen - z0) ** 2))
    err_inv = float(jnp.mean((z_inv - z0) ** 2))
    assert err_gen < err_inv


def test_vae_roundtrip_tool(setup):
    cfg, model, params = setup
    img = jax.random.uniform(jax.random.PRNGKey(5), (2, cfg.model.image_size,
                                                     cfg.model.image_size, 3)) * 2 - 1
    rec = vae_roundtrip(model, params, img, jax.random.PRNGKey(6))
    assert rec.shape == img.shape and bool(jnp.isfinite(rec).all())


def test_simple_diffusion_loss_ffhq_path(setup):
    """FFHQ reconstruction finetune: target = real image, hint = src‖zeros."""
    cfg, model, params = setup
    m = cfg.model
    sched = DiffusionSchedule.create(timesteps=m.timesteps)
    b, H = 2, m.image_size
    img = jax.random.uniform(jax.random.PRNGKey(7), (b, H, H, 3)) * 2 - 1
    src = (img + 1) / 2
    hint = src  # this fixture's ControlNet is 3-ch; production FFHQ hint is src‖zeros
    ctx = jax.random.normal(jax.random.PRNGKey(8), (b, m.clip.max_length, m.unet.context_dim))
    loss, ld = simple_diffusion_loss(model, params, sched, m, img, hint, ctx,
                                     jax.random.PRNGKey(9))
    assert np.isfinite(float(loss))
    assert {"loss_simple", "loss_vlb", "loss"} <= set(ld)


def test_build_hint_modes():
    src = jnp.ones((1, 4, 4, 3)) * 0.2
    ref = jnp.ones((1, 4, 4, 3)) * 0.8
    assert build_hint(src, ref, "double").shape == (1, 4, 4, 6)
    np.testing.assert_array_equal(np.asarray(build_hint(src, ref, "single_ref")), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(build_hint(src, ref, "single_src")), np.asarray(src))
    assert build_hint(src, ref, "none") is None
    with pytest.raises(ValueError):
        build_hint(src, ref, "bogus")


def test_ffhq_folder_dataset(tmp_path):
    from PIL import Image as PILImage
    from makeupdiffuse_tpu.data.ffhq import FFHQImageFolder, ffhq_finetune_batch
    for i in range(3):
        arr = (np.random.RandomState(i).uniform(0, 255, (32, 32, 3))).astype(np.uint8)
        PILImage.fromarray(arr).save(tmp_path / f"{i}.png")
    ds = FFHQImageFolder(str(tmp_path), resolution=32, flip=False)
    assert len(ds) == 3
    it = ds[0]
    assert it["jpg"].shape == (32, 32, 3) and it["txt"] == "reconstruct"
    np.testing.assert_array_equal(it["ref_img"], 0)
    np.testing.assert_allclose(it["src_img"], (it["jpg"] + 1) / 2, atol=1e-6)
    batch = ffhq_finetune_batch([ds[0], ds[1]])
    assert batch["target"].shape == (2, 32, 32, 3)


def test_curriculum_idt_loss(setup):
    """Teacher_IDT parity: the 3-way draw selects matching (gt, hint) pairs."""
    from makeupdiffuse_tpu.losses import curriculum_idt_loss
    from makeupdiffuse_tpu.data.synthetic import synthetic_face_batch
    cfg, model, params = setup
    m = cfg.model
    sched = DiffusionSchedule.create(timesteps=m.timesteps)
    hb = synthetic_face_batch(2, m.image_size, m.unet.context_dim, m.clip.max_length)
    batch = {k: jnp.asarray(v) for k, v in hb.items()}
    seen = set()
    for i in range(8):
        loss, ld = curriculum_idt_loss(model, params, sched, m, batch,
                                       jax.random.PRNGKey(i), jnp.asarray(100))
        assert np.isfinite(float(loss))
        seen.add(int(ld["data_type"]))
    assert seen == {0, 1, 2}  # all three curriculum branches drawn
