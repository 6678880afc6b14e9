"""Interpret-mode correctness tests for the Pallas TPU kernels.

The kernels only execute natively on the real chip (bench/train drivers enable
them); these tests run them through the Pallas interpreter on the CPU mesh so the
math is pinned in CI. Shapes mirror the UNet levels at a 32² latent
(SURVEY.md §3.1): 1024/256/64 spatial tokens, head dims 40/80/160.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeupdiffuse_tpu.ops import pallas_attention, pallas_norm
from makeupdiffuse_tpu.ops.attention import mha_attention


@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_attention.INTERPRET = True
    pallas_norm.INTERPRET = True
    yield
    pallas_attention.INTERPRET = False
    pallas_norm.INTERPRET = False


@pytest.mark.parametrize("n,s,h,d", [(256, 256, 4, 80), (64, 64, 4, 160),
                                     (77, 77, 4, 64),
                                     (1024, 1024, 1, 512),  # VAE AttnBlock shape
                                     (256, 77, 4, 40),      # CLIP cross-attention
                                     (1024, 77, 2, 40)])
def test_flash_forward_matches_xla(n, s, h, d):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    b = 2
    q = jax.random.normal(k1, (b, n, h, d))
    k = jax.random.normal(k2, (b, s, h, d))
    v = jax.random.normal(k3, (b, s, h, d))
    out = pallas_attention.flash_attention(q, k, v)
    ref = mha_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("diet", [True, False])
def test_flash_forward_diet_and_r3_bodies_match_xla(diet):
    """Both forward bodies — the shipped FLASH_DIET softmax (exp2 +
    output-folded normalization, +1.05% e2e) and the round-3 A/B reference —
    must match XLA attention at the served level-0 shape family (D=40, 8
    heads)."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    b, n, h, d = 2, 128, 8, 40
    q = jax.random.normal(k1, (b, n, h, d))
    k = jax.random.normal(k2, (b, n, h, d))
    v = jax.random.normal(k3, (b, n, h, d))
    old_diet = pallas_attention.FLASH_DIET
    try:
        pallas_attention.FLASH_DIET = diet
        out = pallas_attention.flash_attention(q, k, v)
    finally:
        pallas_attention.FLASH_DIET = old_diet
    ref = mha_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_backward_cross_shape():
    """Cross-attention (n≠s, 77-token KV) backward through the kernel. The
    production dispatch routes 77-token KV to XLA (FLASH_MIN_KV — measured
    faster unfused on v5e), but the kernel must stay correct at these shapes
    for callers that force use_flash=True."""
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    b, n, s, h, d = 2, 256, 77, 2, 40
    q = jax.random.normal(ks[0], (b, n, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))

    def loss(attn):
        return lambda q, k, v: jnp.sum(jnp.sin(attn(q, k, v)))

    g_flash = jax.grad(loss(pallas_attention.flash_attention), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss(mha_attention), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)


def test_flash_backward_matches_jnp_grads():
    """Pallas dQ/dK/dV vs jax.grad through the jnp reference (VERDICT r1 #8)."""
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    b, n, h, d = 2, 130, 3, 40  # deliberately ragged: pads N→256 rows, D→128 lanes
    q = jax.random.normal(ks[0], (b, n, h, d))
    k = jax.random.normal(ks[1], (b, n, h, d))
    v = jax.random.normal(ks[2], (b, n, h, d))

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(pallas_attention.flash_attention(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(mha_attention(q, k, v)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)


def test_flash_backward_vae_shape():
    """VAE AttnBlock dispatches flash at (n=1024, h=1, d=512) — larger head dim
    than any UNet level; training backprops through decode with kernels on
    (cycle losses), so the Pallas backward must be pinned here too (ADVICE r2)."""
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    b, n, h, d = 1, 1024, 1, 512
    q = jax.random.normal(ks[0], (b, n, h, d))
    k = jax.random.normal(ks[1], (b, n, h, d))
    v = jax.random.normal(ks[2], (b, n, h, d))

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(pallas_attention.flash_attention(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(mha_attention(q, k, v)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)


def test_flash_backward_bf16_finite_and_close():
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    b, n, h, d = 1, 256, 2, 80
    q, k, v = (jax.random.normal(kk, (b, n, h, d), jnp.bfloat16) for kk in ks)
    g = jax.grad(lambda q, k, v: jnp.sum(
        pallas_attention.flash_attention(q, k, v).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(
        mha_attention(q, k, v).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g, g_ref):
        assert a.dtype == jnp.bfloat16
        assert bool(jnp.all(jnp.isfinite(a.astype(jnp.float32))))
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b_, np.float32),
                                   rtol=0.1, atol=0.1)


@pytest.mark.parametrize(
    "shape,groups,act,with_add,dtype",
    [
        ((2, 16, 16, 320), 32, "silu", True, jnp.float32),
        ((2, 8, 8, 640), 32, None, False, jnp.bfloat16),
        ((1, 4, 4, 64), 32, "silu", False, jnp.float32),
    ],
)
def test_fused_group_norm_matches_reference(shape, groups, act, with_add, dtype):
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    c = shape[-1]
    x = (jax.random.normal(ks[0], shape) * 3).astype(dtype)
    scale = jax.random.normal(ks[1], (c,)) * 0.5 + 1.0
    bias = jax.random.normal(ks[2], (c,)) * 0.2
    add = jax.random.normal(ks[3], (shape[0], c)) if with_add else None
    out = pallas_norm.group_norm_silu(
        x, scale, bias, groups=groups, act=act, add=add, use_fused=True)
    ref = pallas_norm._jnp_group_norm(x, scale, bias, groups, 1e-5, act, add)
    tol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=tol, atol=tol)


def test_fused_group_norm_grads_match():
    ks = jax.random.split(jax.random.PRNGKey(4), 4)
    x = jax.random.normal(ks[0], (2, 8, 8, 64))
    scale = jnp.ones((64,)) * 1.3
    bias = jnp.zeros((64,)) + 0.1
    add = jax.random.normal(ks[1], (2, 64))

    def f(fused):
        return lambda x, s, b, a: jnp.sum(pallas_norm.group_norm_silu(
            x, s, b, groups=32, act="silu", add=a, use_fused=fused) ** 2)

    g1 = jax.grad(f(True), argnums=(0, 1, 2, 3))(x, scale, bias, add)
    g2 = jax.grad(f(False), argnums=(0, 1, 2, 3))(x, scale, bias, add)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_group_norm_module_fused_equals_unfused():
    """GroupNorm32-in-model parity: fused kernel vs the module's jnp math."""
    from makeupdiffuse_tpu.models.layers import ResBlock

    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    x = jax.random.normal(ks[0], (2, 8, 8, 96))
    emb = jax.random.normal(ks[1], (2, 48))
    block = ResBlock(out_channels=96)
    params = block.init(ks[2], x, emb)
    y_ref = block.apply(params, x, emb)
    old = pallas_norm.FUSED_DEFAULT
    pallas_norm.FUSED_DEFAULT = True
    try:
        y_fused = block.apply(params, x, emb)
    finally:
        pallas_norm.FUSED_DEFAULT = old
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_enable_tpu_kernels_env_overrides(monkeypatch):
    """MDT_* env knobs: gate overrides + independent per-family off switches."""
    from makeupdiffuse_tpu import ops

    old = (pallas_attention.FLASH_DEFAULT, pallas_norm.FUSED_DEFAULT,
           pallas_attention.FLASH_MIN_SEQ, pallas_attention.FLASH_MIN_KV)
    try:
        monkeypatch.setenv("MDT_FLASH_MIN_SEQ", "256")
        monkeypatch.setenv("MDT_FLASH_MIN_KV", "77")
        monkeypatch.setenv("MDT_FUSED_NORM", "0")
        assert ops.enable_tpu_kernels(True) is True
        assert pallas_attention.FLASH_DEFAULT is True
        assert pallas_norm.FUSED_DEFAULT is False      # family switched off via env
        assert pallas_attention.FLASH_MIN_SEQ == 256
        assert pallas_attention.FLASH_MIN_KV == 77

        monkeypatch.setenv("MDT_FLASH_ATTN", "0")
        monkeypatch.delenv("MDT_FUSED_NORM")
        ops.enable_tpu_kernels(True)
        assert pallas_attention.FLASH_DEFAULT is False
        assert pallas_norm.FUSED_DEFAULT is True

        monkeypatch.delenv("MDT_FLASH_ATTN")
        ops.enable_tpu_kernels(False)                  # master off wins regardless
        assert pallas_attention.FLASH_DEFAULT is False
        assert pallas_norm.FUSED_DEFAULT is False
    finally:
        (pallas_attention.FLASH_DEFAULT, pallas_norm.FUSED_DEFAULT,
         pallas_attention.FLASH_MIN_SEQ, pallas_attention.FLASH_MIN_KV) = old


def test_fuse_qkv_parity_and_tree_compat():
    """FUSE_QKV self-attention path: identical param tree (paths and init
    values) and identical outputs vs the three-Dense path; cross-attn untouched.
    (Perf note: measured -1.1% e2e on v5e — the knob stays default-off.)"""
    from makeupdiffuse_tpu.models.layers import CrossAttention

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 96))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 96))
    m = CrossAttention(heads=4, dim_head=24)

    old = pallas_attention.FUSE_QKV
    try:
        pallas_attention.FUSE_QKV = False
        p_unfused = m.init(jax.random.PRNGKey(2), x)
        y_ref = m.apply(p_unfused, x)
        pallas_attention.FUSE_QKV = True
        p_fused = m.init(jax.random.PRNGKey(2), x)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b), p_unfused, p_fused)
        y_fused = m.apply(p_unfused, x)
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-6)
        y_cross = m.apply(m.init(jax.random.PRNGKey(2), x, ctx), x, ctx)
        pallas_attention.FUSE_QKV = False
        y_cross_ref = m.apply(m.init(jax.random.PRNGKey(2), x, ctx), x, ctx)
        np.testing.assert_allclose(np.asarray(y_cross), np.asarray(y_cross_ref),
                                   rtol=1e-5, atol=1e-6)
    finally:
        pallas_attention.FUSE_QKV = old


def test_fused_attention_block_matches_reference():
    """fused_attention_block kernel vs the identical jnp math."""
    ks = jax.random.split(jax.random.PRNGKey(7), 9)
    b, n, c, heads = 2, 64, 96, 4
    x = jax.random.normal(ks[0], (b, n, c), jnp.float32)
    args = (x,
            jax.random.normal(ks[1], (c,)) * 0.1 + 1.0,
            jax.random.normal(ks[2], (c,)) * 0.1,
            jax.random.normal(ks[3], (c, c)) * 0.05,
            jax.random.normal(ks[4], (c, c)) * 0.05,
            jax.random.normal(ks[5], (c, c)) * 0.05,
            jax.random.normal(ks[6], (c, c)) * 0.05,
            jax.random.normal(ks[7], (c,)) * 0.1)
    y_k = pallas_attention.fused_attention_block(*args, heads)
    y_r = pallas_attention._block_reference(*args, heads, 1e-5)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r),
                               rtol=2e-4, atol=2e-4)


def test_fused_attention_block_grads_match_reference():
    """custom_vjp backward == jnp-path grads (training numerics unchanged)."""
    ks = jax.random.split(jax.random.PRNGKey(8), 9)
    b, n, c, heads = 1, 16, 32, 2
    args = (jax.random.normal(ks[0], (b, n, c)),
            jnp.ones((c,)), jnp.zeros((c,)),
            jax.random.normal(ks[3], (c, c)) * 0.1,
            jax.random.normal(ks[4], (c, c)) * 0.1,
            jax.random.normal(ks[5], (c, c)) * 0.1,
            jax.random.normal(ks[6], (c, c)) * 0.1,
            jax.random.normal(ks[7], (c,)) * 0.1)
    f_k = lambda *a: jnp.sum(pallas_attention.fused_attention_block(*a, heads) ** 2)
    f_r = lambda *a: jnp.sum(pallas_attention._block_reference(*a, heads, 1e-5) ** 2)
    g_k = jax.grad(f_k, argnums=tuple(range(8)))(*args)
    g_r = jax.grad(f_r, argnums=tuple(range(8)))(*args)
    for a, b_ in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_fused_block_module_parity_and_tree():
    """BasicTransformerBlock: FUSED_BLOCK path == unfused path on the SAME
    params (identical tree), at a production-gated N."""
    from makeupdiffuse_tpu.models.layers import BasicTransformerBlock

    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    b, n, c, heads = 1, 512, 64, 4  # n >= FLASH_MIN_SEQ so the gate opens
    x = jax.random.normal(ks[0], (b, n, c), jnp.float32)
    ctx = jax.random.normal(ks[1], (b, 77, c), jnp.float32)
    blk = BasicTransformerBlock(heads=heads, dim_head=c // heads)

    old = pallas_attention.FUSED_BLOCK
    try:
        pallas_attention.FUSED_BLOCK = False
        params = blk.init(ks[2], x, ctx)
        y_ref = blk.apply(params, x, ctx)
        pallas_attention.FUSED_BLOCK = True
        p_fused = blk.init(ks[2], x, ctx)
        jax.tree_util.tree_map(
            lambda a, b_: np.testing.assert_array_equal(a, b_), params, p_fused)
        y_fused = blk.apply(params, x, ctx)
    finally:
        pallas_attention.FUSED_BLOCK = old
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
