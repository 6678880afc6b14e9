"""Numerical parity of layer semantics + weight layouts against torch (CPU).

These tests pin down exactly the assumptions tools/convert_torch_ckpt.py makes —
conv OIHW→HWIO, linear OI→IO, the VAE's asymmetric (0,1,0,1) stride-2 padding,
GroupNorm/LayerNorm ε and affine placement, GEGLU/quick-gelu activations, and the
ldm timestep embedding — so converted SD1.5 weights reproduce torch activations
(the ≥40 dB PSNR prerequisite, BASELINE.md).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import flax.linen as fnn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from makeupdiffuse_tpu.models.layers import (  # noqa: E402
    FeedForwardGEGLU,
    GroupNorm32,
    timestep_embedding,
)
from makeupdiffuse_tpu.models.clip_text import quick_gelu  # noqa: E402
from makeupdiffuse_tpu.ops.attention import mha_attention  # noqa: E402
from makeupdiffuse_tpu.tools.convert_torch_ckpt import conv_w, lin_w  # noqa: E402


def _np(t):
    return t.detach().cpu().numpy()


def test_conv2d_layout_pad1():
    torch.manual_seed(0)
    tconv = torch.nn.Conv2d(6, 16, 3, padding=1)
    x = torch.randn(2, 6, 17, 17)
    y_t = _np(tconv(x)).transpose(0, 2, 3, 1)  # NCHW → NHWC

    fconv = fnn.Conv(16, (3, 3), padding=1)
    params = {"params": {"kernel": jnp.asarray(conv_w(tconv.weight)),
                         "bias": jnp.asarray(_np(tconv.bias))}}
    y_j = fconv.apply(params, jnp.asarray(_np(x).transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=2e-5)


def test_conv2d_stride2_vae_asymmetric_pad():
    """ldm VAE Downsample: F.pad(x, (0,1,0,1)) + stride-2 valid conv."""
    torch.manual_seed(1)
    tconv = torch.nn.Conv2d(8, 8, 3, stride=2, padding=0)
    x = torch.randn(1, 8, 16, 16)
    x_pad = torch.nn.functional.pad(x, (0, 1, 0, 1))
    y_t = _np(tconv(x_pad)).transpose(0, 2, 3, 1)

    fconv = fnn.Conv(8, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)))
    params = {"params": {"kernel": jnp.asarray(conv_w(tconv.weight)),
                         "bias": jnp.asarray(_np(tconv.bias))}}
    y_j = fconv.apply(params, jnp.asarray(_np(x).transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=2e-5)


def test_linear_layout():
    torch.manual_seed(2)
    tlin = torch.nn.Linear(20, 30)
    x = torch.randn(4, 20)
    y_t = _np(tlin(x))
    flin = fnn.Dense(30)
    params = {"params": {"kernel": jnp.asarray(lin_w(tlin.weight)),
                         "bias": jnp.asarray(_np(tlin.bias))}}
    y_j = flin.apply(params, jnp.asarray(_np(x)))
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=2e-5)


def test_groupnorm32_vs_torch():
    torch.manual_seed(3)
    tgn = torch.nn.GroupNorm(32, 64, eps=1e-5)
    with torch.no_grad():
        tgn.weight.uniform_(0.5, 1.5)
        tgn.bias.uniform_(-0.5, 0.5)
    x = torch.randn(2, 64, 8, 8)
    y_t = _np(tgn(x)).transpose(0, 2, 3, 1)
    gn = GroupNorm32(num_groups=32, epsilon=1e-5)
    params = {"params": {"scale": jnp.asarray(_np(tgn.weight)),
                         "bias": jnp.asarray(_np(tgn.bias))}}
    y_j = gn.apply(params, jnp.asarray(_np(x).transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=2e-5)


def test_layernorm_vs_torch():
    torch.manual_seed(4)
    tln = torch.nn.LayerNorm(48)
    with torch.no_grad():
        tln.weight.uniform_(0.5, 1.5)
        tln.bias.uniform_(-0.5, 0.5)
    x = torch.randn(3, 7, 48)
    y_t = _np(tln(x))
    fl = fnn.LayerNorm()
    params = {"params": {"scale": jnp.asarray(_np(tln.weight)),
                         "bias": jnp.asarray(_np(tln.bias))}}
    y_j = fl.apply(params, jnp.asarray(_np(x)))
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=5e-5)


def test_attention_math_vs_torch():
    """softmax(QKᵀ/√d)V with multi-head reshape equals torch reference."""
    torch.manual_seed(5)
    b, n, h, d = 2, 9, 4, 8
    q = torch.randn(b, n, h, d)
    k = torch.randn(b, n, h, d)
    v = torch.randn(b, n, h, d)
    scale = d ** -0.5
    att = torch.softmax(torch.einsum("bqhd,bkhd->bhqk", q, k) * scale, dim=-1)
    y_t = _np(torch.einsum("bhqk,bkhd->bqhd", att, v))
    y_j = mha_attention(jnp.asarray(_np(q)), jnp.asarray(_np(k)), jnp.asarray(_np(v)))
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=2e-5)


def test_geglu_vs_torch():
    torch.manual_seed(6)
    dim = 16
    proj = torch.nn.Linear(dim, dim * 4 * 2)
    out = torch.nn.Linear(dim * 4, dim)
    x = torch.randn(2, 5, dim)
    xg = proj(x)
    x1, gate = xg.chunk(2, dim=-1)
    y_t = _np(out(x1 * torch.nn.functional.gelu(gate)))

    ff = FeedForwardGEGLU()
    params = {"params": {
        "proj_in": {"kernel": jnp.asarray(lin_w(proj.weight)),
                    "bias": jnp.asarray(_np(proj.bias))},
        "proj_out": {"kernel": jnp.asarray(lin_w(out.weight)),
                     "bias": jnp.asarray(_np(out.bias))},
    }}
    y_j = ff.apply(params, jnp.asarray(_np(x)))
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=2e-5)


def test_quick_gelu_vs_torch():
    x = torch.randn(100)
    y_t = _np(x * torch.sigmoid(1.702 * x))
    y_j = quick_gelu(jnp.asarray(_np(x)))
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=1e-6)


def test_timestep_embedding_vs_ldm_formula():
    """ldm util: freqs=exp(-ln(10000)·arange(half)/half); cat([cos, sin])."""
    import math
    t = torch.tensor([0, 1, 500, 999], dtype=torch.float32)
    dim, half = 320, 160
    freqs = torch.exp(-math.log(10000) * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None] * freqs[None]
    y_t = _np(torch.cat([torch.cos(args), torch.sin(args)], dim=-1))
    y_j = timestep_embedding(jnp.asarray([0, 1, 500, 999]), dim)
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=1e-4)


def test_embedding_layout():
    torch.manual_seed(7)
    temb = torch.nn.Embedding(50, 16)
    ids = torch.tensor([[0, 3, 49]])
    y_t = _np(temb(ids))
    femb = fnn.Embed(50, 16)
    params = {"params": {"embedding": jnp.asarray(_np(temb.weight))}}
    y_j = femb.apply(params, jnp.asarray(_np(ids)))
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=1e-6)
