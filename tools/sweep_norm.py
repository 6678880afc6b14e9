"""Per-shape GroupNorm kernel sweep + custom-call breakdown of the eps forward.

Two trustworthy measurements (per-dispatch timings through the axon tunnel
mis-rank ops >100x — CLAUDE.md):

1. --sweep: fetch-synced lax.scan chains of the fused GN kernel vs the jnp path
   at the UNet level shapes (CFG batch 16), reporting ms/call and effective
   HBM GB/s vs the ~819 GB/s v5e speed-of-light.
2. --breakdown: jax.profiler trace of 10 jitted eps forwards, aggregating
   DEVICE time of ops whose HLO is a custom-call, BY OP NAME — splits the
   "custom_call_other" bucket of tools/profile_chain.py into attention vs
   norm vs anything else.

Usage: python tools/sweep_norm.py [--sweep] [--breakdown]
"""
import argparse
import collections
import dataclasses
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax"))

import jax
import jax.numpy as jnp

SHAPES = [  # (label, B(cfg-doubled), H, W, C) — UNet levels at the 32² latent
    ("level0", 16, 32, 32, 320),
    ("level1", 16, 16, 16, 640),
    ("level2", 16, 8, 8, 1280),
    ("level3", 16, 4, 4, 1280),
    ("level0-up(concat)", 16, 32, 32, 640),
]
ITERS = 400  # long chains: the tunnel's fetch round-trip (~30 ms) must amortize
HBM_GBPS = 819.0  # v5e


def _hlo_kind(long_name: str) -> str:
    """Op KIND from HLO text (see tools/profile_chain.hlo_kind — substring-matching
    'custom-call' against the whole line miscounts consumers of kernel outputs)."""
    from profile_chain import hlo_kind

    return hlo_kind(long_name)


def _chain(fn, x0, scale, bias, iters):
    def body(x, _):
        return fn(x, scale, bias), ()

    y, _ = jax.lax.scan(body, x0, None, length=iters)
    return y


def run_sweep():
    from makeupdiffuse_tpu.ops import pallas_norm

    print(f"{'shape':22s} {'dtype':6s} {'path':6s} {'ms/call':>8s} {'GB/s':>7s} "
          f"{'%SoL':>6s}")
    for label, b, h, w, c in SHAPES:
        for dtype in (jnp.bfloat16, jnp.float32):
            key = jax.random.PRNGKey(0)
            x0 = jax.random.normal(key, (b, h, w, c), dtype)
            scale = jnp.ones((c,), jnp.float32)
            bias = jnp.zeros((c,), jnp.float32)
            moved = 2 * b * h * w * c * x0.dtype.itemsize  # 1 read + 1 write
            for path, use_fused in (("pallas", True), ("xla", False)):
                fn = jax.jit(lambda x, s, bi, uf=use_fused: pallas_norm.group_norm_silu(
                    x, s, bi, groups=32, act="silu", use_fused=uf))
                chain = jax.jit(lambda x, s, bi, f=fn: _chain(f, x, s, bi, ITERS))
                out = chain(x0, scale, bias)
                jax.device_get(jnp.ravel(out)[0])  # compile + true sync
                best = 1e9
                for rep in range(3):
                    xr = x0 + jax.random.normal(
                        jax.random.fold_in(key, rep), x0.shape, dtype) * 0.01
                    t0 = time.time()
                    out = chain(xr, scale, bias)
                    jax.device_get(jnp.ravel(out)[0])
                    best = min(best, (time.time() - t0) / ITERS)
                gbps = moved / best / 1e9
                print(f"{label:22s} {x0.dtype.name:6s} {path:6s} "
                      f"{best*1e3:8.3f} {gbps:7.1f} {100*gbps/HBM_GBPS:5.1f}%")


def run_breakdown():
    from profile_chain import parse_trace  # same dir

    from makeupdiffuse_tpu.config import ModelConfig
    from makeupdiffuse_tpu.models.controlled_ldm import fast_init_model
    from makeupdiffuse_tpu.ops import enable_tpu_kernels

    enable_tpu_kernels()
    base = ModelConfig()
    cfg = dataclasses.replace(
        base,
        unet=dataclasses.replace(base.unet, use_checkpoint=False),
        control=dataclasses.replace(base.control, use_checkpoint=False),
    )
    model, params = fast_init_model(cfg, param_dtype=jnp.bfloat16)
    b = 16
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (b, cfg.latent_size, cfg.latent_size, 4))
    t = jnp.full((b,), 500, jnp.int32)
    ctx = jax.random.normal(ks[1], (b, cfg.clip.max_length, cfg.unet.context_dim))
    hint = jax.random.uniform(ks[2], (b, cfg.image_size, cfg.image_size, 6))
    fn = jax.jit(lambda p, x: model.apply(p, x, t, ctx, hint, method=model.apply_eps))
    out = fn(params, x)
    jax.device_get(jnp.ravel(out)[0])

    tmp = tempfile.mkdtemp(prefix="mdt_ccbreak_")
    with jax.profiler.trace(tmp):
        for i in range(10):
            out = fn(params, x + i * 1e-3)
        jax.device_get(jnp.ravel(out)[0])
    ops = parse_trace(tmp)
    total = sum(d for _, _, d in ops)
    by_kind = collections.Counter()
    for n, ln, d in ops:
        by_kind[_hlo_kind(ln)] += d
    print(f"\n== TRUE op-kind split (HLO kind, not substring match): "
          f"{total/1e3:.3f} ms device over 10 forwards ==")
    for kind, dur in by_kind.most_common(12):
        print(f"  {kind:22s} {dur/1e3:9.3f} ms  {100*dur/total:5.1f}%")
    cc = [(n, ln, d) for n, ln, d in ops if _hlo_kind(ln) == "custom-call"]
    cc_total = sum(d for _, _, d in cc)
    by_name = collections.Counter()
    calls = collections.Counter()
    sample = {}
    for n, ln, d in cc:
        by_name[n] += d
        calls[n] += 1
        sample.setdefault(n, ln[:100])
    print(f"\n== true custom-call ops: {cc_total/1e3:.3f} ms "
          f"({100*cc_total/total:.1f}%) ==")
    print(f"{'op':24s} {'calls':>6s} {'ms':>9s} {'us/call':>8s}  hlo")
    for name, dur in by_name.most_common(30):
        print(f"{name:24s} {calls[name]:6d} {dur/1e3:9.3f} "
              f"{dur/calls[name]:8.1f}  {sample[name][:70]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--breakdown", action="store_true")
    args = ap.parse_args()
    if not (args.sweep or args.breakdown):
        args.sweep = args.breakdown = True
    if args.sweep:
        run_sweep()
    if args.breakdown:
        run_breakdown()
