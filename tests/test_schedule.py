"""Golden tests for schedule math against independently derived closed-form values.

The expected values re-derive the reference's ldm schedule semantics
(/root/reference/diffmk/makeup_teacher.py:64-98 ancestry) in plain numpy float64.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeupdiffuse_tpu.core.schedule import DiffusionSchedule, make_linear_betas


@pytest.fixture(scope="module")
def sched():
    return DiffusionSchedule.create(timesteps=1000, linear_start=0.00085, linear_end=0.0120)


def test_beta_schedule_endpoints(sched):
    betas = np.asarray(sched.betas)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 0.0120, rtol=1e-6)
    # sqrt-linspace-squared, not plain linspace: midpoint differs from arithmetic mean
    mid = ((0.00085**0.5 + 0.0120**0.5) / 2) ** 2
    np.testing.assert_allclose(betas[499:501].mean(), mid, rtol=1e-3)


def test_alphas_cumprod_monotone(sched):
    acp = np.asarray(sched.alphas_cumprod)
    assert np.all(np.diff(acp) < 0)
    assert 0.0 < acp[-1] < 0.01  # nearly fully noised at T
    np.testing.assert_allclose(acp[0], 1 - 0.00085, rtol=1e-6)


def test_q_sample_closed_form(sched):
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([0, 999], dtype=jnp.int32)
    xt = sched.q_sample(x0, t, noise)
    acp = np.asarray(sched.alphas_cumprod)
    for i, ti in enumerate([0, 999]):
        expect = np.sqrt(acp[ti]) * np.asarray(x0)[i] + np.sqrt(1 - acp[ti]) * np.asarray(noise)[i]
        np.testing.assert_allclose(np.asarray(xt)[i], expect, rtol=1e-5, atol=1e-5)


def test_pred_x0_inverts_q_sample(sched):
    """predict_start_from_noise(q_sample(x0, t, n), t, n) == x0 exactly."""
    x0 = jax.random.normal(jax.random.PRNGKey(2), (3, 4, 4, 4))
    noise = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
    t = jnp.array([10, 500, 990], dtype=jnp.int32)
    xt = sched.q_sample(x0, t, noise)
    rec = sched.predict_start_from_noise(xt, t, noise)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_v_parameterization_roundtrip(sched):
    """predict_eps/start_from_z_and_v invert get_v."""
    x0 = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 4, 4))
    noise = jax.random.normal(jax.random.PRNGKey(5), x0.shape)
    t = jnp.array([100, 800], dtype=jnp.int32)
    xt = sched.q_sample(x0, t, noise)
    v = sched.get_v(x0, noise, t)
    eps_rec = sched.predict_eps_from_z_and_v(xt, t, v)
    x0_rec = sched.predict_start_from_z_and_v(xt, t, v)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), rtol=1e-4, atol=1e-5)


def test_lvlb_weights_eps_form(sched):
    betas = make_linear_betas(1000, 0.00085, 0.0120)
    alphas = 1 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    post_var = betas * (1 - acp_prev) / (1 - acp)
    expect = betas**2 / (2 * post_var * alphas * (1 - acp))
    expect[0] = expect[1]
    np.testing.assert_allclose(np.asarray(sched.lvlb_weights), expect, rtol=1e-4)
    assert np.all(np.isfinite(np.asarray(sched.lvlb_weights)))


def test_logvar_zeros_means_identity_weighting(sched):
    # logvar zeros → loss = loss_simple/exp(0)+0 (makeup_teacher.py:84-85)
    assert np.all(np.asarray(sched.logvar) == 0.0)


def test_schedule_is_pytree(sched):
    leaves = jax.tree_util.tree_leaves(sched)
    assert len(leaves) == 13
    mapped = jax.tree_util.tree_map(lambda x: x, sched)
    assert isinstance(mapped, DiffusionSchedule)


def test_q_posterior_matches_numpy(sched):
    x0 = jax.random.normal(jax.random.PRNGKey(6), (1, 2, 2, 4))
    xt = jax.random.normal(jax.random.PRNGKey(7), x0.shape)
    t = jnp.array([300], dtype=jnp.int32)
    mean, var, logvar = sched.q_posterior(x0, xt, t)
    betas = make_linear_betas(1000, 0.00085, 0.0120)
    alphas = 1 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    c1 = betas[300] * np.sqrt(acp_prev[300]) / (1 - acp[300])
    c2 = (1 - acp_prev[300]) * np.sqrt(alphas[300]) / (1 - acp[300])
    expect = c1 * np.asarray(x0) + c2 * np.asarray(xt)
    np.testing.assert_allclose(np.asarray(mean), expect, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        float(var[0, 0, 0, 0]), betas[300] * (1 - acp_prev[300]) / (1 - acp[300]), rtol=1e-4
    )
