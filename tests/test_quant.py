"""w8a8 quantized GEMM path (ops/quant.py + QConv/QDense in models/layers.py).

Pins three properties:
  1. QConv/QDense with the knob OFF are exact drop-ins for nn.Conv/nn.Dense —
     identical param trees and identical outputs (the whole repo's parity
     evidence rests on this).
  2. The quantized ops obey the w8a8 error model: per-output-channel weight +
     per-tensor activation symmetric int8 ⇒ relative error at the percent
     scale, and all-zero weights (zero-conv parity, reference ``zero_module``
     semantics /root/reference/runs/train.py:60-62 context) stay exactly 0.
  3. The flagship eps forward runs under QUANT8 end-to-end and stays close to
     the bf16 path (cosine similarity on the eps prediction).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeupdiffuse_tpu import ops
from makeupdiffuse_tpu.ops import quant
from makeupdiffuse_tpu.models.layers import QConv, QDense


@pytest.fixture(autouse=True)
def _restore_knob():
    old = quant.QUANT8
    yield
    quant.QUANT8 = old


def test_quantize_symmetric_roundtrip_and_zero():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((64, 96)), jnp.float32)
    q, s = quant.quantize_symmetric(v, axes=(0,))
    back = q.astype(jnp.float32) * s
    # symmetric 8-bit: max abs error <= scale/2 per column
    assert float(jnp.max(jnp.abs(back - v) / s)) <= 0.5 + 1e-6
    zq, zs = quant.quantize_symmetric(jnp.zeros((4, 4)), axes=(0,))
    assert float(jnp.max(jnp.abs(zq.astype(jnp.float32) * zs))) == 0.0


def test_qdense_error_model():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((32, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 128)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((128,)) * 0.1, jnp.float32)
    ref = x @ w + b
    out = quant.qdense(x, w, b)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_qconv_error_model_and_zero_kernel():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 32, 48)) * 0.05, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = quant.qconv(x, w, None, (1, 1), ((1, 1), (1, 1)))
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel
    zero = quant.qconv(x, jnp.zeros_like(w), None, (1, 1), "SAME")
    assert float(jnp.max(jnp.abs(zero))) == 0.0


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_qconv_off_matches_nn_conv_exactly(dtype):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    ours = QConv(24, (3, 3), strides=(2, 2), padding=1, dtype=dtype)
    theirs = nn.Conv(24, (3, 3), strides=(2, 2), padding=1, dtype=dtype)
    p1 = ours.init(jax.random.PRNGKey(0), x)
    p2 = theirs.init(jax.random.PRNGKey(0), x)
    chex_tree = jax.tree_util.tree_structure
    assert chex_tree(p1) == chex_tree(p2)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(ours.apply(p1, x)), np.asarray(theirs.apply(p1, x)))


@pytest.mark.parametrize("use_bias", [True, False])
def test_qdense_off_matches_nn_dense_exactly(use_bias):
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((5, 7, 16)), jnp.float32)
    ours = QDense(12, use_bias=use_bias, dtype=jnp.bfloat16)
    theirs = nn.Dense(12, use_bias=use_bias, dtype=jnp.bfloat16)
    p1 = ours.init(jax.random.PRNGKey(1), x)
    p2 = theirs.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_structure(p1)
            == jax.tree_util.tree_structure(p2))
    np.testing.assert_array_equal(
        np.asarray(ours.apply(p1, x)), np.asarray(theirs.apply(p1, x)))


def test_enable_quant8_knob():
    assert ops.enable_quant8(True) is True
    assert quant.QUANT8 is True
    assert ops.enable_quant8(False) is False
    assert quant.QUANT8 is False


def test_make_train_step_refuses_quant8(tiny_model_session):
    """w8a8 is inference-only: round/clip has zero gradient a.e., so a train
    step built under QUANT8 would silently freeze the weights (ADVICE r4).
    make_train_step must fail loudly at build time instead."""
    from makeupdiffuse_tpu.core.schedule import DiffusionSchedule
    from makeupdiffuse_tpu.training.train_step import make_train_step

    cfg, model, _ = tiny_model_session
    sched = DiffusionSchedule.create(timesteps=cfg.model.timesteps)
    quant.QUANT8 = True
    with pytest.raises(RuntimeError, match="inference-only"):
        make_train_step(model, sched, cfg.model)


def test_eps_forward_under_quant8_close_to_bf16(tiny_model_session):
    cfg, model, params = tiny_model_session
    m = cfg.model
    # fresh init has zero-init output convs (eps == 0 exactly) — perturb every
    # leaf so the control pathway and the final projection both carry signal
    leaves, treedef = jax.tree_util.tree_flatten(params)
    pks = jax.random.split(jax.random.PRNGKey(99), len(leaves))
    params = treedef.unflatten([
        l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, pks)])
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    x = jax.random.normal(
        ks[0], (2, m.latent_size, m.latent_size, m.latent_channels))
    t = jnp.asarray([100, 500], jnp.int32)
    ctx = jax.random.normal(
        ks[1], (2, m.clip.max_length, m.unet.context_dim)) * 0.1
    hint = jax.random.uniform(
        ks[2], (2, m.image_size, m.image_size, m.control.hint_channels))

    def eps(p):
        return model.apply(p, x, t, ctx, hint, method=model.apply_eps)

    quant.QUANT8 = False
    ref = np.asarray(eps(params), np.float32)
    quant.QUANT8 = True
    out = np.asarray(eps(params), np.float32)
    assert np.all(np.isfinite(out))
    cos = float((ref * out).sum()
                / (np.linalg.norm(ref) * np.linalg.norm(out) + 1e-12))
    # per-layer ~1% w8a8 error accumulated through a UNet: demand a strong
    # directional match, exact bound measured on-chip in PERF.md
    assert cos > 0.99, cos
