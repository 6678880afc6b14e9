"""EleGANt ``sow_pyramid_a5_e3d2_remapped.pth`` → flax conversion (strict 1:1).

The reference's production teacher checkpoint (loaded at
/root/reference/diffmk/teacher.py:121-129).  The expected key set is the
``state_dict()`` of the reconstruction twin ``tools/torch_elegant.ElegantSowTorch``
(see its docstring for the reconstruction provenance); every tensor lands on a
leaf of ``teacher/elegant_sow.ElegantSowGenerator`` with a hard shape assert,
and missing/unexpected keys raise with full lists — the convert_bisenet policy.

Torch → flax naming (mechanical):
  encoder.N.{conv,norm}.*  → encoder_N.{conv,norm}.*
  decoder.N.{conv,norm}.*  → decoder_N.{conv,norm}.*
  down / merge / pos_low / pos_high / attn_{low,high}.to_{q,k,v} / head → same
  conv+1x1 weights OIHW → HWIO; InstanceNorm weight/bias → norm scale/bias.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


def _flax_key(torch_key: str) -> str:
    """torch module path → flax param path (leaf name handled separately)."""
    name = re.sub(r"^(encoder|decoder)\.(\d+)\.", r"\1_\2.", torch_key)
    return name


def expected_elegant_keys(conv_dim: int = 64) -> Dict[str, tuple]:
    """The reconstruction's full key → shape manifest (requires torch)."""
    from .torch_elegant import ElegantSowTorch

    return {k: tuple(v.shape)
            for k, v in ElegantSowTorch(conv_dim=conv_dim).state_dict().items()}


def convert_elegant_state_dict(state: Mapping[str, Any],
                               template: Dict[str, Any]) -> Dict[str, Any]:
    """torch state dict → ``{"params": ...}`` matching an
    ``ElegantSowGenerator.init`` template. Strict: missing or unexpected
    checkpoint keys raise with the full lists; every shape is asserted."""
    import flax

    flat = flax.traverse_util.flatten_dict(template["params"], sep=".")
    out: Dict[str, np.ndarray] = {}
    missing = []
    used = set()

    for fkey, tmpl in flat.items():
        path, leaf = fkey.rsplit(".", 1)
        tpath = re.sub(r"^(encoder|decoder)_(\d+)\.", r"\1.\2.", path)
        if leaf == "kernel":
            tkey, transpose = tpath + ".weight", True
        elif leaf == "scale":
            tkey, transpose = tpath + ".weight", False
        else:  # bias
            tkey, transpose = tpath + ".bias", False
        if tkey not in state:
            missing.append(tkey)
            continue
        a = _np(state[tkey])
        if transpose and a.ndim == 4:
            a = a.transpose(2, 3, 1, 0)  # OIHW → HWIO
        assert tuple(a.shape) == tuple(np.shape(tmpl)), (
            f"{tkey}: checkpoint shape {a.shape} != model {tuple(np.shape(tmpl))}")
        out[fkey] = a.astype(np.asarray(tmpl).dtype)
        used.add(tkey)

    unexpected = [k for k in state
                  if k not in used and not k.endswith("num_batches_tracked")]
    if missing or unexpected:
        raise ValueError(
            f"EleGANt checkpoint does not match the reconstruction topology.\n"
            f"missing ({len(missing)}): {sorted(missing)}\n"
            f"unexpected ({len(unexpected)}): {sorted(unexpected)}")
    return {"params": flax.traverse_util.unflatten_dict(out, sep=".")}


def convert_elegant_checkpoint(path: str, conv_dim: int = 64,
                               window_size: int = 16) -> Dict[str, Any]:
    """Load ``sow_pyramid_a5_e3d2_remapped.pth`` and convert → flax params for
    ``ElegantSowGenerator(conv_dim, window_size)``."""
    import jax
    import jax.numpy as jnp
    import torch

    from ..teacher.elegant_sow import DIFF_CHANNELS, ElegantSowGenerator

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    model = ElegantSowGenerator(conv_dim=conv_dim, window_size=window_size)
    H = 256
    dummy = (jnp.zeros((1, H, H, 3)), jnp.zeros((1, H, H, 3)),
             jnp.zeros((1, H, H, 2)), jnp.zeros((1, H, H, 2)),
             jnp.zeros((1, H, H, DIFF_CHANNELS)), jnp.zeros((1, H, H, DIFF_CHANNELS)))
    template = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), *dummy))
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), template)
    return convert_elegant_state_dict(sd, template)
