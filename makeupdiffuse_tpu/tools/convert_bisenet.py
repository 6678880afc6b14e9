"""BiSeNet face-parser weight conversion: zllrunning ``79999_iter.pth`` → flax.

Capability parity: the reference's ``futils.mask.FaceParser`` loads the
face-parsing.PyTorch BiSeNet checkpoint (driven from
/root/reference/diffdata/preprocessing.py:37-38,151). ``data/faceparse.BiSeNet``
is a faithful re-architecture of that topology (ResNet18 context path + ARM/FFM),
so this converter is an exact 1:1 name map — every checkpoint tensor lands on a
flax leaf with a hard shape assertion.

Torch → flax naming:
  cp.resnet.layerN.M.*           → resnet.layerN_M.*   (downsample.0/1 → down_conv/down_bn)
  cp.{arm16,arm32,conv_avg,conv_head16,conv_head32}.* → same, ``cp.`` stripped
  ffm.*                          → ffm.*
  conv_out.conv.{conv,bn}        → conv_out.{conv,bn}
  conv_out.conv_out              → conv_out_cls
  conv_out16.* / conv_out32.*    → dropped (train-time auxiliary heads)
BatchNorm: weight/bias → params scale/bias; running_mean/var → batch_stats
mean/var; num_batches_tracked dropped. Convs OIHW → HWIO.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

# checkpoint prefixes that exist only for the training-time auxiliary losses
_DROPPED_PREFIXES = ("conv_out16.", "conv_out32.")


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


def _torch_to_flax_module(name: str) -> str:
    """Map a torch module path (no leaf) onto our flax module path."""
    if name.startswith("cp."):
        name = name[len("cp."):]
    name = re.sub(r"^resnet\.layer(\d)\.(\d)", r"resnet.layer\1_\2", name)
    name = name.replace(".downsample.0", ".down_conv")
    name = name.replace(".downsample.1", ".down_bn")
    if name.startswith("conv_out.conv.conv"):
        name = name.replace("conv_out.conv.conv", "conv_out.conv")
    elif name.startswith("conv_out.conv.bn"):
        name = name.replace("conv_out.conv.bn", "conv_out.bn")
    elif name.startswith("conv_out.conv_out"):
        name = name.replace("conv_out.conv_out", "conv_out_cls")
    return name


def convert_bisenet_state_dict(state: Mapping[str, Any],
                               template: Dict[str, Any]) -> Dict[str, Any]:
    """torch state dict → ``{"params": ..., "batch_stats": ...}`` matching the
    ``FaceParser``/``BiSeNet`` template variables. Missing/unexpected keys raise
    with full lists (same policy as the SD/teacher converters)."""
    import flax

    flat_p = flax.traverse_util.flatten_dict(template["params"], sep=".")
    flat_s = flax.traverse_util.flatten_dict(template["batch_stats"], sep=".")

    out_p: Dict[str, np.ndarray] = {}
    out_s: Dict[str, np.ndarray] = {}
    used = set()
    missing = []

    def take(torch_key: str, flax_key: str, tmpl, transpose: bool):
        if torch_key not in state:
            missing.append(torch_key)
            return None
        a = _np(state[torch_key])
        if transpose and a.ndim == 4:
            a = a.transpose(2, 3, 1, 0)  # OIHW → HWIO
        assert tuple(a.shape) == tuple(tmpl.shape), (
            f"{torch_key}: checkpoint shape {a.shape} != model {tuple(tmpl.shape)}")
        used.add(torch_key)
        return a.astype(np.asarray(tmpl).dtype)

    # inverse map: walk OUR leaves, derive the torch key for each
    inv = {_torch_to_flax_module(k[:k.rfind(".")]): k[:k.rfind(".")]
           for k in state if "." in k}

    for path, tmpl in flat_p.items():
        mod, leaf = path.rsplit(".", 1)
        tmod = inv.get(mod, mod)
        if leaf == "kernel":
            a = take(f"{tmod}.weight", path, tmpl, transpose=True)
        elif leaf == "scale":  # BatchNorm γ
            a = take(f"{tmod}.weight", path, tmpl, transpose=False)
        else:  # bias
            a = take(f"{tmod}.bias", path, tmpl, transpose=False)
        if a is not None:
            out_p[path] = a
    for path, tmpl in flat_s.items():
        mod, leaf = path.rsplit(".", 1)
        tmod = inv.get(mod, mod)
        src = {"mean": "running_mean", "var": "running_var"}[leaf]
        a = take(f"{tmod}.{src}", path, tmpl, transpose=False)
        if a is not None:
            out_s[path] = a

    unexpected = [
        k for k in state
        if k not in used
        and not k.startswith(_DROPPED_PREFIXES)
        and not k.endswith("num_batches_tracked")
    ]
    if missing or unexpected:
        raise KeyError(
            f"BiSeNet checkpoint mismatch — missing {len(missing)} "
            f"(e.g. {missing[:5]}), unexpected {len(unexpected)} "
            f"(e.g. {unexpected[:5]})")
    return {
        "params": flax.traverse_util.unflatten_dict(out_p, sep="."),
        "batch_stats": flax.traverse_util.unflatten_dict(out_s, sep="."),
    }


def export_bisenet_torch_names(template: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """flax variables → torch-layout state dict with zllrunning's names — the
    manifest/export half (drives the synthetic roundtrip test).

    Uses the FORWARD name map on our paths, then inverts module names to the
    torch spelling."""
    import flax

    out: Dict[str, np.ndarray] = {}

    def torch_module(mod: str) -> str:
        m = re.sub(r"^resnet\.layer(\d)_(\d)", r"resnet.layer\1.\2", mod)
        m = m.replace(".down_conv", ".downsample.0")
        m = m.replace(".down_bn", ".downsample.1")
        if m.startswith(("resnet.", "arm16.", "arm32.", "conv_avg", "conv_head16",
                         "conv_head32")):
            m = "cp." + m
        if m.startswith("conv_out_cls"):
            m = m.replace("conv_out_cls", "conv_out.conv_out")
        elif m.startswith("conv_out.conv"):
            m = m.replace("conv_out.conv", "conv_out.conv.conv")
        elif m.startswith("conv_out.bn"):
            m = m.replace("conv_out.bn", "conv_out.conv.bn")
        return m

    for path, val in flax.traverse_util.flatten_dict(template["params"], sep=".").items():
        mod, leaf = path.rsplit(".", 1)
        tmod = torch_module(mod)
        a = np.asarray(val)
        if leaf == "kernel":
            out[f"{tmod}.weight"] = a.transpose(3, 2, 0, 1) if a.ndim == 4 else a
        elif leaf == "scale":
            out[f"{tmod}.weight"] = a
        else:
            out[f"{tmod}.bias"] = a
    for path, val in flax.traverse_util.flatten_dict(template["batch_stats"], sep=".").items():
        mod, leaf = path.rsplit(".", 1)
        tmod = torch_module(mod)
        out[f"{tmod}.{'running_mean' if leaf == 'mean' else 'running_var'}"] = np.asarray(val)
    return out


def load_bisenet_checkpoint(path: str, seed: int = 0):
    """Build a FaceParser and load a zllrunning ``.pth`` into it (shape-checked)."""
    import torch

    from ..data.faceparse import FaceParser

    parser = FaceParser(seed=seed)
    sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = sd.get("state_dict", sd)
    parser.params = convert_bisenet_state_dict(sd, parser.params)
    return parser


def main():
    import argparse
    import json
    import pickle

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default=None, help="79999_iter.pth to convert")
    ap.add_argument("--manifest-out", default=None)
    ap.add_argument("--out", default=None, help="converted params pickle")
    args = ap.parse_args()

    from ..data.faceparse import FaceParser

    parser = FaceParser()
    manifest = {k: list(v.shape)
                for k, v in export_bisenet_torch_names(parser.params).items()}
    if args.manifest_out:
        with open(args.manifest_out, "w") as f:
            json.dump(manifest, f, indent=1)
        print(f"wrote {len(manifest)}-key manifest to {args.manifest_out}")
    if args.ckpt:
        assert args.out, "--out required with --ckpt"
        parser = load_bisenet_checkpoint(args.ckpt)
        with open(args.out, "wb") as f:
            pickle.dump(parser.params, f)
        print(f"wrote {args.out}")
    if not args.manifest_out and not args.ckpt:
        print(f"{len(manifest)} keys; pass --manifest-out or --ckpt")


if __name__ == "__main__":
    main()
