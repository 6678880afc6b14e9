"""DDIM sampler tests: table construction vs ldm semantics; step math goldens; a
closed-form end-to-end check with an oracle denoiser; inversion round-trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeupdiffuse_tpu.core.ddim import (
    DDIMTables,
    ddim_encode,
    ddim_reconstruct,
    ddim_sample,
    make_ddim_timesteps,
)
from makeupdiffuse_tpu.core.schedule import DiffusionSchedule


@pytest.fixture(scope="module")
def sched():
    return DiffusionSchedule.create()


def test_uniform_timesteps_ldm_semantics():
    # ldm: arange(0, 1000, 20) + 1 → [1, 21, ..., 981]
    ts = make_ddim_timesteps(50, 1000)
    assert ts.shape == (50,)
    assert ts[0] == 1 and ts[-1] == 981
    assert np.all(np.diff(ts) == 20)


def test_tables_alignment(sched):
    tabs = DDIMTables.create(sched, num_steps=50, eta=0.0)
    acp = np.asarray(sched.alphas_cumprod)
    ts = make_ddim_timesteps(50, 1000)
    np.testing.assert_allclose(np.asarray(tabs.alphas), acp[ts], rtol=1e-6)
    # alphas_prev = [acp[0]] + acp[ts[:-1]]
    np.testing.assert_allclose(np.asarray(tabs.alphas_prev)[0], acp[0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tabs.alphas_prev)[1:], acp[ts[:-1]], rtol=1e-6)
    assert np.all(np.asarray(tabs.sigmas) == 0.0)


def test_eta_sigmas(sched):
    tabs = DDIMTables.create(sched, num_steps=50, eta=1.0)
    a, ap = np.asarray(tabs.alphas, dtype=np.float64), np.asarray(tabs.alphas_prev, dtype=np.float64)
    expect = np.sqrt((1 - ap) / (1 - a) * (1 - a / ap))
    np.testing.assert_allclose(np.asarray(tabs.sigmas), expect, rtol=1e-4)


def test_single_step_golden(sched):
    """One deterministic DDIM step against hand-computed numpy (cddim.py:62-78)."""
    tabs = DDIMTables.create(sched, num_steps=50)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4))
    fixed_eps = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    denoiser = lambda xx, tt: jnp.broadcast_to(fixed_eps, xx.shape)

    out = ddim_reconstruct(denoiser, x, tabs, t_start=1)

    idx = 0
    a_t = float(tabs.alphas[idx])
    a_prev = float(tabs.alphas_prev[idx])
    s1m = float(tabs.sqrt_one_minus_alphas[idx])
    e = np.asarray(fixed_eps)
    pred_x0 = (np.asarray(x) - s1m * e) / np.sqrt(a_t)
    expect = np.sqrt(a_prev) * pred_x0 + np.sqrt(1 - a_prev) * e
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)


def test_oracle_denoiser_recovers_x0(sched):
    """With the exact eps oracle for a known x0, 50 deterministic DDIM steps from
    q_sample(x0, T-ish) recover x0 to high accuracy."""
    tabs = DDIMTables.create(sched, num_steps=50)
    x0 = 0.5 * jnp.ones((1, 8, 8, 4))
    acp = sched.alphas_cumprod

    def oracle(x, t):
        # exact eps given x_t and known x0: eps = (x - sqrt(acp)*x0)/sqrt(1-acp)
        a = acp[t].reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)

    noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    t_top = jnp.full((1,), int(tabs.timesteps[-1]), dtype=jnp.int32)
    x_T = sched.q_sample(x0, t_top, noise)
    out = ddim_sample(oracle, x_T, tabs)
    # the chain ends at ᾱ_prev[0]=ᾱ_0≈0.99915 (ldm semantics), so ~√(1-ᾱ_0)≈0.03
    # residual noise remains; the x0 estimate itself is exact:
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.1)
    a0 = float(sched.alphas_cumprod[0])
    pred_x0 = (np.asarray(out) - np.sqrt(1 - a0) * np.asarray(oracle(out, jnp.zeros((1,), jnp.int32)))) / np.sqrt(a0)
    np.testing.assert_allclose(pred_x0, np.asarray(x0), atol=1e-4)


def test_encode_decode_roundtrip(sched):
    """DDIM inversion then reconstruction with the same denoiser ≈ identity."""
    tabs = DDIMTables.create(sched, num_steps=50)
    x0 = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4)) * 0.3

    # a fixed linear "model": eps = 0.1 * x (stable, invertible)
    denoiser = lambda x, t: 0.1 * x

    t_enc = 20
    z = ddim_encode(denoiser, x0, tabs, t_enc=t_enc)
    back = ddim_reconstruct(denoiser, z, tabs, t_start=t_enc)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x0), rtol=2e-2, atol=2e-3)


def test_reconstruct_zero_steps_identity(sched):
    tabs = DDIMTables.create(sched, num_steps=50)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 4, 4))
    out = ddim_reconstruct(lambda xx, tt: xx, x, tabs, t_start=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_sample_jits_and_is_deterministic(sched):
    tabs = DDIMTables.create(sched, num_steps=10)
    denoiser = lambda x, t: 0.05 * x

    @jax.jit
    def run(x_T):
        return ddim_sample(denoiser, x_T, tabs)

    x_T = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 4, 4))
    a, b = run(x_T), run(x_T)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stochastic_path_uses_rng(sched):
    tabs = DDIMTables.create(sched, num_steps=10, eta=1.0)
    denoiser = lambda x, t: 0.05 * x
    x_T = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 4, 4))
    a = ddim_sample(denoiser, x_T, tabs, rng=jax.random.PRNGKey(1))
    b = ddim_sample(denoiser, x_T, tabs, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(a), np.asarray(b))
