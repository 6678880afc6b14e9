"""SCGAN ``G.pth`` → flax conversion (strict 1:1).

Expected key set = ``tools/torch_scgen.SCGenTorch.state_dict()`` (the
reconstruction twin; reference loads the real module at
/root/reference/diffmk/teacher.py:12-23).  Same policy as convert_elegant /
convert_bisenet: every tensor lands on a ``teacher/scgen_munit.SCGenMunit``
leaf with a hard shape assert; missing/unexpected keys raise with full lists.

Torch → flax naming (mechanical):
  <mod>.model.N...        → <mod>.model_N...   (all Sequential indices)
  conv weights OIHW → HWIO; Linear weights [out,in] → [in,out];
  LayerNorm gamma/beta → norm gamma/beta.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


def expected_scgen_keys(**kw) -> Dict[str, tuple]:
    """The reconstruction's full key → shape manifest (requires torch)."""
    from .torch_scgen import SCGenTorch

    return {k: tuple(v.shape) for k, v in SCGenTorch(**kw).state_dict().items()}


def convert_scgen_state_dict(state: Mapping[str, Any],
                             template: Dict[str, Any]) -> Dict[str, Any]:
    """torch G.pth state dict → ``{"params": ...}`` for ``SCGenMunit``."""
    import flax

    flat = flax.traverse_util.flatten_dict(template["params"], sep=".")
    out: Dict[str, np.ndarray] = {}
    missing = []
    used = set()

    for fkey, tmpl in flat.items():
        path, leaf = fkey.rsplit(".", 1)
        tpath = re.sub(r"model_(\d+)", r"model.\1", path)
        if leaf == "kernel":
            tkey = tpath + ".weight"
        elif leaf in ("gamma", "beta", "bias"):
            tkey = tpath + "." + leaf
        else:
            raise AssertionError(f"unhandled flax leaf {fkey}")
        if tkey not in state:
            missing.append(tkey)
            continue
        a = _np(state[tkey])
        if leaf == "kernel":
            if a.ndim == 4:
                a = a.transpose(2, 3, 1, 0)  # conv OIHW → HWIO
            elif a.ndim == 2:
                a = a.transpose(1, 0)        # Linear [out,in] → [in,out]
        assert tuple(a.shape) == tuple(np.shape(tmpl)), (
            f"{tkey}: checkpoint shape {a.shape} != model {tuple(np.shape(tmpl))}")
        out[fkey] = a.astype(np.asarray(tmpl).dtype)
        used.add(tkey)

    unexpected = [k for k in state
                  if k not in used and not k.endswith("num_batches_tracked")]
    if missing or unexpected:
        raise ValueError(
            f"SCGen checkpoint does not match the reconstruction topology.\n"
            f"missing ({len(missing)}): {sorted(missing)}\n"
            f"unexpected ({len(unexpected)}): {sorted(unexpected)}")
    return {"params": flax.traverse_util.unflatten_dict(out, sep=".")}


def convert_scgen_checkpoint(path: str, **model_kw) -> Dict[str, Any]:
    """Load ``G.pth`` and convert → flax params for ``SCGenMunit``."""
    import jax
    import jax.numpy as jnp
    import torch

    from ..teacher.scgen_munit import SCGenMunit

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    model = SCGenMunit(**model_kw)
    H = 256
    dummy = (jnp.zeros((1, H, H, 3)), jnp.zeros((1, H, H, 3)),
             jnp.zeros((1, H, H, 3)), jnp.zeros((1, H, H, 3)))
    template = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), *dummy))
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), template)
    return convert_scgen_state_dict(sd, template)
