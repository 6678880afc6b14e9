"""Teacher checkpoint scaffolding: key manifests + torch↔flax converters for the
EleGANt / SCGAN teacher networks.

Capability parity: the reference loads frozen torch teachers —
``sow_pyramid_a5_e3d2_remapped.pth`` for EleGANt
(/root/reference/diffmk/teacher.py:121-129) and SCGAN's ``G.pth``
(/root/reference/diffmk/teacher.py:12-23). Our teachers are TPU-first
re-architectures (teacher/elegant.py, teacher/scgan.py), so a 1:1 key map to those
exact files does not exist; what this module provides is the full conversion
machinery for OUR teacher topologies:

  * ``teacher_key_manifest``  — every parameter's torch-style name + shape (the
    manifest a weight-porting effort starts from);
  * ``export_teacher_torch_names`` — flax params → torch-layout state dict
    (OIHW convs / OI linears / norm weight+bias);
  * ``convert_teacher_state_dict`` — torch-layout dict → flax params, with hard
    shape assertions per key and an explicit error listing missing/unexpected keys.

When real EleGANt/SCGAN checkpoints are to be ported, the path is: dump their
state_dicts, distill/retrain into this topology (or extend the name map), then load
through ``convert_teacher_state_dict`` — the shape manifest makes any mismatch loud.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


def _flatten(params: Dict[str, Any]) -> Dict[str, Any]:
    import flax

    inner = params["params"] if "params" in params else params
    return flax.traverse_util.flatten_dict(inner, sep=".")


def _torch_name_and_layout(path: str, val) -> Tuple[str, np.ndarray]:
    """flax leaf → (torch-style dotted name, torch-layout array)."""
    a = np.asarray(val)
    if path.endswith(".kernel"):
        base = path[: -len(".kernel")] + ".weight"
        if a.ndim == 4:  # HWIO → OIHW
            return base, a.transpose(3, 2, 0, 1)
        if a.ndim == 2:  # IO → OI
            return base, a.transpose(1, 0)
        return base, a
    if path.endswith(".scale"):
        return path[: -len(".scale")] + ".weight", a
    if path.endswith(".embedding"):
        return path[: -len(".embedding")] + ".weight", a
    return path, a  # bias and friends keep their name


def _from_torch_layout(torch_val, flax_path: str) -> np.ndarray:
    """Inverse layout transform, keyed on the flax leaf name (NOT shape — square
    dense kernels would be transpose-ambiguous by shape alone)."""
    a = _np(torch_val)
    if flax_path.endswith(".kernel"):
        if a.ndim == 4:
            return a.transpose(2, 3, 1, 0)  # OIHW → HWIO
        if a.ndim == 2:
            return a.transpose(1, 0)  # OI → IO
    return a


def export_teacher_torch_names(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Teacher flax params → torch-layout state dict (the export half of the
    scaffold; also drives the roundtrip tests)."""
    out: Dict[str, np.ndarray] = {}
    for path, val in _flatten(params).items():
        name, arr = _torch_name_and_layout(path, val)
        assert name not in out, f"name collision at {name}"
        out[name] = arr
    return out


def teacher_key_manifest(params: Dict[str, Any]) -> Dict[str, Tuple[int, ...]]:
    """{torch-style key: shape} — the shape manifest for a porting effort."""
    return {k: tuple(v.shape) for k, v in export_teacher_torch_names(params).items()}


def convert_teacher_state_dict(state: Mapping[str, Any], template_params: Dict[str, Any]
                               ) -> Dict[str, Any]:
    """torch-layout teacher state dict → flax params matching `template_params`.

    Every template leaf must be present with the right (transposed) shape; missing
    or unexpected keys raise with the full lists so checkpoint mismatches are
    diagnosable at a glance."""
    import flax

    flat = _flatten(template_params)
    out: Dict[str, Any] = {}
    used = set()
    missing = []
    for path, tmpl in flat.items():
        name, _ = _torch_name_and_layout(path, np.zeros(tmpl.shape, np.float32))
        if name not in state:
            missing.append(name)
            continue
        a = _from_torch_layout(state[name], path)
        assert tuple(a.shape) == tuple(tmpl.shape), (
            f"{name}: checkpoint shape {a.shape} != model shape {tuple(tmpl.shape)}"
        )
        out[path] = a.astype(np.asarray(tmpl).dtype)
        used.add(name)
    unexpected = [k for k in state if k not in used]
    if missing or unexpected:
        raise KeyError(
            f"teacher checkpoint mismatch — missing {len(missing)} keys "
            f"(e.g. {missing[:5]}), unexpected {len(unexpected)} "
            f"(e.g. {unexpected[:5]})"
        )
    tree = flax.traverse_util.unflatten_dict(out, sep=".")
    return {"params": tree} if "params" in template_params else tree


def load_teacher_checkpoint(path: str, teacher_type: str, image_size: int = 256):
    """Build the teacher, then load a torch-layout .pth into it (shape-checked)."""
    import torch

    from ..teacher.base import build_teacher

    teacher = build_teacher(teacher_type, image_size=image_size)
    sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = sd.get("state_dict", sd)
    teacher.params = convert_teacher_state_dict(sd, teacher.params)
    return teacher


def main():
    import argparse
    import json

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("teacher_type", choices=["ELEGANT", "SCGAN"])
    ap.add_argument("--ckpt", default=None, help="torch .pth to convert (optional)")
    ap.add_argument("--manifest-out", default=None,
                    help="write the {key: shape} manifest json here")
    ap.add_argument("--out", default=None, help="converted params pickle")
    ap.add_argument("--image-size", type=int, default=256)
    args = ap.parse_args()

    from ..teacher.base import build_teacher

    teacher = build_teacher(args.teacher_type, image_size=args.image_size)
    manifest = teacher_key_manifest(teacher.params)
    if args.manifest_out:
        with open(args.manifest_out, "w") as f:
            json.dump({k: list(v) for k, v in manifest.items()}, f, indent=1)
        print(f"wrote {len(manifest)}-key manifest to {args.manifest_out}")
    else:
        for k, s in list(manifest.items())[:20]:
            print(k, s)
        print(f"... {len(manifest)} keys total")
    if args.ckpt:
        import pickle

        teacher = load_teacher_checkpoint(args.ckpt, args.teacher_type, args.image_size)
        assert args.out, "--out required with --ckpt"
        with open(args.out, "wb") as f:
            pickle.dump(teacher.params, f)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
