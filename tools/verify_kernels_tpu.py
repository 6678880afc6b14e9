"""On-chip numerics check for the Pallas kernels at the production shapes.

Interpret-mode tests (tests/test_pallas_kernels.py) pin the math; this script
verifies the REAL Mosaic lowering on the TPU — tiling/masking of non-128 channel
counts (320/640) and the dK/dV accumulation across grid revisits.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from makeupdiffuse_tpu.ops import pallas_attention, pallas_norm
from makeupdiffuse_tpu.ops.attention import mha_attention


def check(name, a, b, tol):
    err = float(jnp.max(jnp.abs(jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32))))
    status = "OK " if err < tol else "FAIL"
    print(f"{status} {name}: maxerr {err:.3e} (tol {tol:g})")
    return err < tol


def main():
    print(f"device={jax.devices()[0]}")
    ok = True
    key = jax.random.PRNGKey(0)

    # fused groupnorm+silu at the UNet's hot shapes (incl. ragged 320/640 lanes)
    for shape, act, with_add in [
        ((16, 32, 32, 320), "silu", True),
        ((16, 16, 16, 640), "silu", True),
        ((16, 8, 8, 1280), None, False),
        ((16, 32, 32, 640), "silu", False),  # up-path concat width
    ]:
        ks = jax.random.split(key, 4)
        c = shape[-1]
        x = (jax.random.normal(ks[0], shape) * 2).astype(jnp.bfloat16)
        sc = jax.random.normal(ks[1], (c,)) * 0.4 + 1
        bi = jax.random.normal(ks[2], (c,)) * 0.1
        add = jax.random.normal(ks[3], (shape[0], c)) if with_add else None
        fused = jax.jit(lambda x, s, b, a: pallas_norm.group_norm_silu(
            x, s, b, groups=32, act=act, add=a, use_fused=True))(x, sc, bi, add)
        ref = jax.jit(lambda x, s, b, a: pallas_norm._jnp_group_norm(
            x, s, b, 32, 1e-5, act, a))(x, sc, bi, add)
        ok &= check(f"gn_silu {shape} act={act} add={with_add}", fused, ref, 0.1)

    # flash fwd+bwd at the three UNet self-attention levels + the VAE AttnBlock
    # shape (1024 tokens, 1 head, d=512 — dispatched by models/vae.py) + the
    # 77-token-KV cross-attention shapes (on the flash path since round 3)
    for n, s, h, d in [(1024, 1024, 8, 40), (256, 256, 8, 80), (64, 64, 8, 160),
                       (1024, 1024, 1, 512), (1024, 77, 8, 40), (256, 77, 8, 80)]:
        ks = jax.random.split(jax.random.PRNGKey(n + d), 3)
        q = jax.random.normal(ks[0], (4, n, h, d), jnp.bfloat16)
        k, v = (jax.random.normal(kk, (4, s, h, d), jnp.bfloat16) for kk in ks[1:])
        out = jax.jit(pallas_attention.flash_attention)(q, k, v)
        ref = jax.jit(mha_attention)(q, k, v)
        ok &= check(f"flash fwd n={n} h={h} d={d}", out, ref, 0.05)

        loss_f = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
            pallas_attention.flash_attention(q, k, v).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2)))
        loss_r = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
            mha_attention(q, k, v).astype(jnp.float32) ** 2), argnums=(0, 1, 2)))
        gf = loss_f(q, k, v)
        gr = loss_r(q, k, v)
        for name, a, b in zip("qkv", gf, gr):
            ok &= check(f"flash bwd d{name} n={n}", a, b, 0.5)

    # fused attn1 sub-block (MDT_FUSED_BLOCK knob, default off — PERF.md) at the
    # production level-0 shape
    b, n, c, heads = 16, 1024, 320, 8
    ks = jax.random.split(jax.random.PRNGKey(5), 9)
    args = (jax.random.normal(ks[0], (b, n, c), jnp.bfloat16),
            jax.random.normal(ks[1], (c,)) * 0.1 + 1.0,
            jax.random.normal(ks[2], (c,)) * 0.1,
            *(jax.random.normal(kk, (c, c), jnp.bfloat16) * 0.05 for kk in ks[3:7]),
            jax.random.normal(ks[7], (c,)) * 0.1)
    y_k = jax.jit(lambda *a: pallas_attention.fused_attention_block(*a, heads))(*args)
    y_r = jax.jit(lambda *a: pallas_attention._block_reference(*a, heads, 1e-5))(*args)
    ok &= check(f"fused attn1 block b{b} n{n} c{c}", y_k, y_r, 0.05)

    print("ALL OK" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
