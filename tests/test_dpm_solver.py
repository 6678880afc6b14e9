"""DPM-Solver++(2M) tests: table math, oracle recovery beats few-step DDIM."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeupdiffuse_tpu.core.ddim import DDIMTables, ddim_sample
from makeupdiffuse_tpu.core.dpm_solver import DPMTables, dpmpp_2m_sample
from makeupdiffuse_tpu.core.schedule import DiffusionSchedule


@pytest.fixture(scope="module")
def sched():
    return DiffusionSchedule.create()


def test_tables(sched):
    tabs = DPMTables.create(sched, num_steps=20)
    assert tabs.num_steps == 20
    ts = np.asarray(tabs.timesteps)
    assert ts[0] == 999 and np.all(np.diff(ts) < 0)
    lam = np.asarray(tabs.lamb)
    assert np.all(np.diff(lam) > 0)  # λ increases as noise decreases
    # α² + σ² = 1 (variance-preserving)
    np.testing.assert_allclose(
        np.asarray(tabs.alpha) ** 2 + np.asarray(tabs.sigma) ** 2, 1.0, atol=1e-5
    )


def test_oracle_recovery_and_order(sched):
    """With the exact eps oracle, 10-step DPM++ lands closer to x0 than
    10-step DDIM (2nd order beats 1st order at equal budget)."""
    x0 = 0.4 * jnp.ones((1, 8, 8, 4))
    acp = sched.alphas_cumprod

    def oracle(x, t):
        a = acp[t].reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)

    noise = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    t_top = jnp.full((1,), 999, jnp.int32)
    x_T = sched.q_sample(x0, t_top, noise)

    dpm = DPMTables.create(sched, num_steps=10)
    out_dpm = dpmpp_2m_sample(oracle, x_T, dpm)
    err_dpm = float(jnp.abs(out_dpm - x0).mean())

    ddim = DDIMTables.create(sched, num_steps=10)
    out_ddim = ddim_sample(oracle, x_T, ddim)
    err_ddim = float(jnp.abs(out_ddim - x0).mean())

    assert err_dpm < 0.05
    assert err_dpm < err_ddim  # strictly better at the same step budget


def test_jit_and_deterministic(sched):
    tabs = DPMTables.create(sched, num_steps=8)
    den = lambda x, t: 0.05 * x
    run = jax.jit(lambda xT: dpmpp_2m_sample(den, xT, tabs))
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 4))
    a, b = run(x_T), run(x_T)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert bool(jnp.isfinite(a).all())


def test_bf16_carry(sched):
    tabs = DPMTables.create(sched, num_steps=5)
    den = lambda x, t: 0.05 * x
    out = dpmpp_2m_sample(den, jnp.ones((1, 4, 4, 4), jnp.bfloat16), tabs)
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
