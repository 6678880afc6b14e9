"""DP-sharded inference over the 8-device mesh + comparison-tool tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeupdiffuse_tpu.api import transfer
from makeupdiffuse_tpu.config import tiny_test_config
from makeupdiffuse_tpu.core.ddim import DDIMTables
from makeupdiffuse_tpu.core.schedule import DiffusionSchedule
from makeupdiffuse_tpu.models.controlled_ldm import init_model
from makeupdiffuse_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from makeupdiffuse_tpu.tools.compare_outputs import psnr, ssim


@pytest.fixture(scope="module")
def setup(tiny_model_session):
    return tiny_model_session


def test_dp_sharded_inference_matches_single(setup):
    """Batched transfer sharded over the 8-device data mesh == single-device
    (the BASELINE config-5 serving mode: pure DP over ICI)."""
    cfg, model, params = setup
    m = cfg.model
    sched = DiffusionSchedule.create(timesteps=m.timesteps)
    tables = DDIMTables.create(sched, num_steps=2)
    b, H = 8, m.image_size
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    src = jax.random.uniform(ks[0], (b, H, H, 3))
    ref = jax.random.uniform(ks[1], (b, H, H, 3))
    ctx = jax.random.normal(ks[2], (b, m.clip.max_length, m.unet.context_dim))
    uc = jnp.zeros_like(ctx)

    run = jax.jit(lambda p, s, r, c, u, k: transfer(model, p, sched, tables,
                                                    s, r, c, u, k, cfg_scale=9.0))
    key = jax.random.PRNGKey(2)
    out_single = run(params, src, ref, ctx, uc, key)

    mesh = make_mesh()
    p_r = replicate(mesh, params)
    batch = shard_batch(mesh, dict(src=src, ref=ref, ctx=ctx, uc=uc))
    out_dp = run(p_r, batch["src"], batch["ref"], batch["ctx"], batch["uc"], key)
    np.testing.assert_allclose(np.asarray(out_dp), np.asarray(out_single),
                               rtol=2e-3, atol=2e-3)


def test_psnr_ssim():
    rng = np.random.RandomState(0)
    a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    assert psnr(a, a) == float("inf")
    assert abs(ssim(a, a) - 1.0) < 1e-9
    noisy = np.clip(a + rng.normal(0, 0.01, a.shape), 0, 1)
    p = psnr(a, noisy)
    assert 35 < p < 45  # sigma 0.01 → ≈40 dB
    assert 0.8 < ssim(a, noisy) <= 1.0
    worse = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1)
    assert psnr(a, worse) < p


def test_compare_dirs(tmp_path):
    from PIL import Image
    from makeupdiffuse_tpu.tools.compare_outputs import compare_dirs
    (tmp_path / "ref").mkdir()
    (tmp_path / "out").mkdir()
    rng = np.random.RandomState(1)
    for i in range(2):
        arr = (rng.uniform(0, 255, (32, 32, 3))).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / "ref" / f"{i}.png")
        Image.fromarray(arr).save(tmp_path / "out" / f"{i}.png")
    res = compare_dirs(str(tmp_path / "ref"), str(tmp_path / "out"))
    assert res["pairs"] == 2
    assert res["psnr_mean"] == float("inf") or res["psnr_mean"] > 50
    assert res["ssim_mean"] > 0.999
