"""torch SD1.5/ControlNet checkpoint → makeupdiffuse_tpu params, with the reference's
checkpoint surgeries.

Capability parity (SURVEY.md §5 checkpoint/resume):
  * hint-conv widening: ``control_model.input_hint_block.0.weight`` [16,3,3,3] is
    duplicated along in-channels to [16,6,3,3] so a stock ``control_sd15_ini.ckpt``
    drives the dual-image hint stem (/root/reference/runs/train.py:60-62);
  * teacher injection: teacher weights come from the freshly built model, i.e. torch
    checkpoints never carry the teacher (/root/reference/runs/train.py:63-68) — our
    teachers are parameterless (PGT/KEEP) or converted separately;
  * layout changes: torch NCHW conv [O,I,kh,kw] → HWIO, Linear [O,I] → [I,O],
    norm weight/bias → scale/bias.

Works on a raw ``state_dict``-like mapping (numpy or torch tensors); torch is only
imported to open ``.ckpt``/``.pth`` files.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

from ..config import ModelConfig


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor (cpu) — avoid importing torch unless needed
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


def conv_w(x) -> np.ndarray:
    return _np(x).transpose(2, 3, 1, 0)  # OIHW → HWIO


def lin_w(x) -> np.ndarray:
    return _np(x).transpose(1, 0)  # OI → IO


def inv_conv_w(x) -> np.ndarray:
    return _np(x).transpose(3, 2, 0, 1)  # HWIO → OIHW


def widen_hint_conv(weight: np.ndarray, hint_channels: int = 6) -> np.ndarray:
    """runs/train.py:60-62 — duplicate along in-channels 3→6 (OIHW layout in)."""
    w = _np(weight)
    reps = hint_channels // w.shape[1]
    assert reps * w.shape[1] == hint_channels
    return np.concatenate([w] * reps, axis=1)


# ---- name maps ---------------------------------------------------------------------


def _unet_block_index_maps(cfg: ModelConfig) -> Tuple[Dict[int, str], Dict[int, str]]:
    """torch input_blocks/output_blocks index → our module prefix."""
    u = cfg.unet
    n_levels = len(u.channel_mult)
    in_map: Dict[int, str] = {}
    idx = 1
    for level in range(n_levels):
        for i in range(u.num_res_blocks):
            in_map[idx] = f"down_{level}", i
            idx += 1
        if level != n_levels - 1:
            in_map[idx] = f"down_{level}_downsample", None
            idx += 1
    out_map: Dict[int, str] = {}
    idx = 0
    for level in reversed(range(n_levels)):
        for i in range(u.num_res_blocks + 1):
            out_map[idx] = f"up_{level}", i
            idx += 1
    return in_map, out_map


_RES_FIELDS = {
    "in_layers.0.weight": ("in_norm", "scale", _np),
    "in_layers.0.bias": ("in_norm", "bias", _np),
    "in_layers.2.weight": ("in_conv", "kernel", conv_w),
    "in_layers.2.bias": ("in_conv", "bias", _np),
    "emb_layers.1.weight": ("emb_proj", "kernel", lin_w),
    "emb_layers.1.bias": ("emb_proj", "bias", _np),
    "out_layers.0.weight": ("out_norm", "scale", _np),
    "out_layers.0.bias": ("out_norm", "bias", _np),
    "out_layers.3.weight": ("out_conv", "kernel", conv_w),
    "out_layers.3.bias": ("out_conv", "bias", _np),
    "skip_connection.weight": ("skip", "kernel", conv_w),
    "skip_connection.bias": ("skip", "bias", _np),
}

_ATTN_FIELDS = {
    "norm.weight": ("norm", "scale", _np),
    "norm.bias": ("norm", "bias", _np),
    "proj_in.weight": ("proj_in", "kernel", conv_w),
    "proj_in.bias": ("proj_in", "bias", _np),
    "proj_out.weight": ("proj_out", "kernel", conv_w),
    "proj_out.bias": ("proj_out", "bias", _np),
}

_TFB_FIELDS = {
    "attn1.to_q.weight": ("attn1/to_q", "kernel", lin_w),
    "attn1.to_k.weight": ("attn1/to_k", "kernel", lin_w),
    "attn1.to_v.weight": ("attn1/to_v", "kernel", lin_w),
    "attn1.to_out.0.weight": ("attn1/to_out", "kernel", lin_w),
    "attn1.to_out.0.bias": ("attn1/to_out", "bias", _np),
    "attn2.to_q.weight": ("attn2/to_q", "kernel", lin_w),
    "attn2.to_k.weight": ("attn2/to_k", "kernel", lin_w),
    "attn2.to_v.weight": ("attn2/to_v", "kernel", lin_w),
    "attn2.to_out.0.weight": ("attn2/to_out", "kernel", lin_w),
    "attn2.to_out.0.bias": ("attn2/to_out", "bias", _np),
    "ff.net.0.proj.weight": ("ff/proj_in", "kernel", lin_w),
    "ff.net.0.proj.bias": ("ff/proj_in", "bias", _np),
    "ff.net.2.weight": ("ff/proj_out", "kernel", lin_w),
    "ff.net.2.bias": ("ff/proj_out", "bias", _np),
    "norm1.weight": ("norm1", "scale", _np),
    "norm1.bias": ("norm1", "bias", _np),
    "norm2.weight": ("norm2", "scale", _np),
    "norm2.bias": ("norm2", "bias", _np),
    "norm3.weight": ("norm3", "scale", _np),
    "norm3.bias": ("norm3", "bias", _np),
}


def _set(tree: Dict, path: str, leaf: str, value: np.ndarray) -> None:
    node = tree
    for part in path.split("/"):
        node = node.setdefault(part, {})
    node[leaf] = value


def _convert_attn(tree, prefix: str, rest: str, value) -> bool:
    if rest in _ATTN_FIELDS:
        sub, leaf, fn = _ATTN_FIELDS[rest]
        _set(tree, f"{prefix}/{sub}", leaf, fn(value))
        return True
    m = re.match(r"transformer_blocks\.(\d+)\.(.+)", rest)
    if m and m.group(2) in _TFB_FIELDS:
        sub, leaf, fn = _TFB_FIELDS[m.group(2)]
        _set(tree, f"{prefix}/block_{m.group(1)}/{sub}", leaf, fn(value))
        return True
    return False


def _convert_res(tree, prefix: str, rest: str, value) -> bool:
    if rest in _RES_FIELDS:
        sub, leaf, fn = _RES_FIELDS[rest]
        _set(tree, f"{prefix}/{sub}", leaf, fn(value))
        return True
    return False


def convert_unet_like(
    state: Mapping[str, Any], torch_prefix: str, cfg: ModelConfig, is_control: bool
) -> Dict:
    """Convert diffusion_model.* or control_model.* keys into our UNet/ControlNet tree."""
    in_map, out_map = _unet_block_index_maps(cfg)
    attn_res = set(cfg.unet.attention_resolutions)
    # ds at each encoder level: 1,2,4,8...
    tree: Dict = {}
    consumed = set()
    for key, value in state.items():
        if not key.startswith(torch_prefix + "."):
            continue
        k = key[len(torch_prefix) + 1 :]
        ok = False
        if k.startswith("time_embed.0."):
            _set(tree, "time_embed/fc1", "kernel" if k.endswith("weight") else "bias",
                 lin_w(value) if k.endswith("weight") else _np(value)); ok = True
        elif k.startswith("time_embed.2."):
            _set(tree, "time_embed/fc2", "kernel" if k.endswith("weight") else "bias",
                 lin_w(value) if k.endswith("weight") else _np(value)); ok = True
        elif k.startswith("input_blocks.0.0."):
            _set(tree, "conv_in", "kernel" if k.endswith("weight") else "bias",
                 conv_w(value) if k.endswith("weight") else _np(value)); ok = True
        else:
            m = re.match(r"input_blocks\.(\d+)\.(\d+)\.(.+)", k)
            if m:
                bi, sub_i, rest = int(m.group(1)), int(m.group(2)), m.group(3)
                name, res_i = in_map[bi]
                if name.endswith("_downsample"):
                    if rest.startswith("op."):
                        _set(tree, f"{name}/conv",
                             "kernel" if rest.endswith("weight") else "bias",
                             conv_w(value) if rest.endswith("weight") else _np(value))
                        ok = True
                elif sub_i == 0:
                    ok = _convert_res(tree, f"{name}_res_{res_i}", rest, value)
                elif sub_i == 1:
                    ok = _convert_attn(tree, f"{name}_attn_{res_i}", rest, value)
            m = m or re.match(r"middle_block\.(\d+)\.(.+)", k)
            if not ok and k.startswith("middle_block."):
                mm = re.match(r"middle_block\.(\d+)\.(.+)", k)
                sub_i, rest = int(mm.group(1)), mm.group(2)
                if sub_i == 0:
                    ok = _convert_res(tree, "mid_res_0", rest, value)
                elif sub_i == 1:
                    ok = _convert_attn(tree, "mid_attn", rest, value)
                elif sub_i == 2:
                    ok = _convert_res(tree, "mid_res_1", rest, value)
            if not ok and k.startswith("output_blocks.") and not is_control:
                mm = re.match(r"output_blocks\.(\d+)\.(\d+)\.(.+)", k)
                bi, sub_i, rest = int(mm.group(1)), int(mm.group(2)), mm.group(3)
                name, res_i = out_map[bi]
                level = int(name.split("_")[1])
                n_levels = len(cfg.unet.channel_mult)
                ds = 2 ** level
                has_attn = ds in attn_res
                if sub_i == 0:
                    ok = _convert_res(tree, f"{name}_res_{res_i}", rest, value)
                elif sub_i == 1 and has_attn and not rest.startswith("conv."):
                    ok = _convert_attn(tree, f"{name}_attn_{res_i}", rest, value)
                elif rest.startswith("conv."):
                    _set(tree, f"{name}_upsample/conv",
                         "kernel" if rest.endswith("weight") else "bias",
                         conv_w(value) if rest.endswith("weight") else _np(value))
                    ok = True
        if not ok and not is_control and k.startswith("out.0."):
            _set(tree, "out_norm", "scale" if k.endswith("weight") else "bias", _np(value)); ok = True
        if not ok and not is_control and k.startswith("out.2."):
            _set(tree, "conv_out", "kernel" if k.endswith("weight") else "bias",
                 conv_w(value) if k.endswith("weight") else _np(value)); ok = True
        if is_control and not ok:
            mm = re.match(r"zero_convs\.(\d+)\.0\.(weight|bias)", k)
            if mm:
                _set(tree, f"zero_conv_{mm.group(1)}",
                     "kernel" if mm.group(2) == "weight" else "bias",
                     conv_w(value) if mm.group(2) == "weight" else _np(value)); ok = True
            mm = re.match(r"input_hint_block\.(\d+)\.(weight|bias)", k)
            if mm:
                ti = int(mm.group(1))
                name = "conv_out" if ti == 14 else f"conv_{ti // 2}"
                v = value
                if ti == 0 and mm.group(2) == "weight":
                    v = widen_hint_conv(v, cfg.control.hint_channels)
                _set(tree, f"input_hint_block/{name}",
                     "kernel" if mm.group(2) == "weight" else "bias",
                     conv_w(v) if mm.group(2) == "weight" else _np(v)); ok = True
            mm = re.match(r"middle_block_out\.0\.(weight|bias)", k)
            if mm:
                _set(tree, "middle_block_out",
                     "kernel" if mm.group(1) == "weight" else "bias",
                     conv_w(value) if mm.group(1) == "weight" else _np(value)); ok = True
        if ok:
            consumed.add(key)
    tree["__consumed__"] = consumed
    return tree


_VAE_RES_FIELDS = {
    "norm1.weight": ("norm1", "scale", _np), "norm1.bias": ("norm1", "bias", _np),
    "conv1.weight": ("conv1", "kernel", conv_w), "conv1.bias": ("conv1", "bias", _np),
    "norm2.weight": ("norm2", "scale", _np), "norm2.bias": ("norm2", "bias", _np),
    "conv2.weight": ("conv2", "kernel", conv_w), "conv2.bias": ("conv2", "bias", _np),
    "nin_shortcut.weight": ("nin_shortcut", "kernel", conv_w),
    "nin_shortcut.bias": ("nin_shortcut", "bias", _np),
}

_VAE_ATTN_FIELDS = {
    "norm.weight": ("norm", "scale", _np), "norm.bias": ("norm", "bias", _np),
    "q.weight": ("q", "kernel", conv_w), "q.bias": ("q", "bias", _np),
    "k.weight": ("k", "kernel", conv_w), "k.bias": ("k", "bias", _np),
    "v.weight": ("v", "kernel", conv_w), "v.bias": ("v", "bias", _np),
    "proj_out.weight": ("proj_out", "kernel", conv_w),
    "proj_out.bias": ("proj_out", "bias", _np),
}


def convert_vae(state: Mapping[str, Any], torch_prefix: str = "first_stage_model") -> Dict:
    tree: Dict = {}
    consumed = set()
    for key, value in state.items():
        if not key.startswith(torch_prefix + "."):
            continue
        k = key[len(torch_prefix) + 1 :]
        ok = False
        for side in ("encoder", "decoder"):
            if not k.startswith(side + "."):
                continue
            r = k[len(side) + 1 :]
            if r.startswith("conv_in.") or r.startswith("conv_out."):
                name = r.split(".")[0]
                _set(tree, f"{side}/{name}", "kernel" if r.endswith("weight") else "bias",
                     conv_w(value) if r.endswith("weight") else _np(value)); ok = True
            elif r.startswith("norm_out."):
                _set(tree, f"{side}/norm_out", "scale" if r.endswith("weight") else "bias",
                     _np(value)); ok = True
            else:
                m = re.match(r"(down|up)\.(\d+)\.block\.(\d+)\.(.+)", r)
                if m and m.group(4) in _VAE_RES_FIELDS:
                    sub, leaf, fn = _VAE_RES_FIELDS[m.group(4)]
                    _set(tree, f"{side}/{m.group(1)}_{m.group(2)}_block_{m.group(3)}/{sub}",
                         leaf, fn(value)); ok = True
                m = re.match(r"(down)\.(\d+)\.downsample\.conv\.(weight|bias)", r)
                if m:
                    _set(tree, f"{side}/down_{m.group(2)}_downsample",
                         "kernel" if m.group(3) == "weight" else "bias",
                         conv_w(value) if m.group(3) == "weight" else _np(value)); ok = True
                m = re.match(r"(up)\.(\d+)\.upsample\.conv\.(weight|bias)", r)
                if m:
                    _set(tree, f"{side}/up_{m.group(2)}_upsample",
                         "kernel" if m.group(3) == "weight" else "bias",
                         conv_w(value) if m.group(3) == "weight" else _np(value)); ok = True
                m = re.match(r"mid\.(block_1|attn_1|block_2)\.(.+)", r)
                if m:
                    fields = _VAE_ATTN_FIELDS if m.group(1) == "attn_1" else _VAE_RES_FIELDS
                    if m.group(2) in fields:
                        sub, leaf, fn = fields[m.group(2)]
                        _set(tree, f"{side}/mid_{m.group(1)}/{sub}", leaf, fn(value)); ok = True
        if k.startswith("quant_conv.") or k.startswith("post_quant_conv."):
            name = k.split(".")[0]
            _set(tree, name, "kernel" if k.endswith("weight") else "bias",
                 conv_w(value) if k.endswith("weight") else _np(value)); ok = True
        if ok:
            consumed.add(key)
    tree["__consumed__"] = consumed
    return tree


def convert_clip(state: Mapping[str, Any],
                 torch_prefix: str = "cond_stage_model.transformer.text_model") -> Dict:
    tree: Dict = {}
    consumed = set()
    for key, value in state.items():
        if not key.startswith(torch_prefix + "."):
            continue
        k = key[len(torch_prefix) + 1 :]
        ok = False
        if k == "embeddings.token_embedding.weight":
            _set(tree, "token_embedding", "embedding", _np(value)); ok = True
        elif k == "embeddings.position_embedding.weight":
            tree["position_embedding"] = _np(value); ok = True
        elif k.startswith("final_layer_norm."):
            _set(tree, "final_ln", "scale" if k.endswith("weight") else "bias", _np(value)); ok = True
        else:
            m = re.match(r"encoder\.layers\.(\d+)\.(.+)", k)
            if m:
                li, rest = m.group(1), m.group(2)
                mm = re.match(r"self_attn\.(q|k|v|out)_proj\.(weight|bias)", rest)
                if mm:
                    _set(tree, f"layer_{li}/attn/{mm.group(1)}_proj",
                         "kernel" if mm.group(2) == "weight" else "bias",
                         lin_w(value) if mm.group(2) == "weight" else _np(value)); ok = True
                mm = re.match(r"layer_norm(1|2)\.(weight|bias)", rest)
                if mm:
                    _set(tree, f"layer_{li}/ln{mm.group(1)}",
                         "scale" if mm.group(2) == "weight" else "bias", _np(value)); ok = True
                mm = re.match(r"mlp\.fc(1|2)\.(weight|bias)", rest)
                if mm:
                    _set(tree, f"layer_{li}/fc{mm.group(1)}",
                         "kernel" if mm.group(2) == "weight" else "bias",
                         lin_w(value) if mm.group(2) == "weight" else _np(value)); ok = True
        if ok:
            consumed.add(key)
    tree["__consumed__"] = consumed
    return tree


def convert_clip_hf(state: Mapping[str, Any]) -> Dict:
    """HF ``CLIPTextModel.state_dict()`` (keys ``text_model.…``) → our CLIP tree.

    The reference loads the same tower through FrozenCLIPEmbedder
    ("openai/clip-vit-large-patch14"); this entry accepts the standalone HF dump so
    the text encoder can be converted without a full ControlLDM checkpoint."""
    return convert_clip(state, torch_prefix="text_model")


def export_context_bank(model, params, tokenize=None, max_length: int = 77
                        ) -> Dict[str, Any]:
    """Encode the reference's three fixed prompts with the CONVERTED tower and
    return {'bank': {prompt: (77, width) np.ndarray}, 'ids_source': ...}.

    The reference only ever conditions on "makeup transfer" (datasets.py:633),
    "makeup style transfer" (:118) and "" (the CFG unconditional), so exporting the
    three context vectors at conversion time removes the tokenizer from the
    deployment path entirely. `tokenize` is a real str→ids callable (e.g.
    data/tokenizer.CLIPTokenizer.encode when a BPE vocab asset exists); without it
    the placeholder PROMPT_IDS are used and `ids_source` says so, so loaders can
    warn instead of silently conditioning on wrong tokens."""
    import jax
    import jax.numpy as jnp

    from ..models.clip_text import PROMPT_IDS, prompt_token_ids

    if tokenize is not None:
        ids = {p: list(tokenize(p)) for p in PROMPT_IDS}
        ids_source = "tokenizer"
    else:
        ids = {p: None for p in PROMPT_IDS}
        ids_source = "placeholder"

    enc = jax.jit(lambda p, i: model.apply(p, i, method=model.encode_text))
    bank: Dict[str, np.ndarray] = {}
    for prompt in PROMPT_IDS:
        if ids[prompt] is not None:
            row = ids[prompt][:max_length]
            row = row + [row[-1]] * (max_length - len(row))
            tok = jnp.asarray(row, jnp.int32)[None]
        else:
            tok = prompt_token_ids(prompt, max_length)
        bank[prompt] = np.asarray(enc(params, tok)[0])
    return {"bank": bank, "ids_source": ids_source}


def convert_state_dict(state: Mapping[str, Any], cfg: ModelConfig) -> Dict[str, Any]:
    """Full ControlLDM state dict → {'params': {...}} for ControlledLDM."""
    unet = convert_unet_like(state, "model.diffusion_model", cfg, is_control=False)
    ctrl = convert_unet_like(state, "control_model", cfg, is_control=True)
    vae = convert_vae(state)
    clip = convert_clip(state)
    consumed = set()
    for t in (unet, ctrl, vae, clip):
        consumed |= t.pop("__consumed__")
    params = {
        "diffusion_model": unet,
        "control_model": ctrl,
        "first_stage_model": vae,
        "cond_stage_model": clip,
    }
    leftovers = [
        k for k in state
        if k not in consumed
        and not k.startswith(("teacher_model", "pgt_model", "model_ema", "logvar",
                              "betas", "alphas", "sqrt", "posterior", "lvlb",
                              "cond_stage_model.transformer.text_model.embeddings.position_ids",
                              "scale_factor"))
    ]
    return {"params": params, "__unconsumed__": leftovers}


def export_torch_names(params: Dict[str, Any], cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Inverse map: our params tree → torch ControlLDM state_dict names/layouts.

    Used to round-trip-test the converter and to export trained ControlNets back to
    the torch ecosystem. Note: the exported hint conv keeps 6 in-channels (the
    widened dual-image stem)."""
    import flax

    u = cfg.unet
    n_levels = len(u.channel_mult)
    in_map, out_map = _unet_block_index_maps(cfg)
    inv_in = {}
    for bi, (name, res_i) in in_map.items():
        inv_in[(name, res_i)] = bi
    inv_out = {}
    for bi, (name, res_i) in out_map.items():
        inv_out[(name, res_i)] = bi

    res_inv = {v[0] + "/" + v[1]: (k, v[2]) for k, v in _RES_FIELDS.items()}
    attn_inv = {v[0] + "/" + v[1]: (k, v[2]) for k, v in _ATTN_FIELDS.items()}
    tfb_inv = {v[0] + "/" + v[1]: (k, v[2]) for k, v in _TFB_FIELDS.items()}
    vres_inv = {v[0] + "/" + v[1]: (k, v[2]) for k, v in _VAE_RES_FIELDS.items()}
    vattn_inv = {v[0] + "/" + v[1]: (k, v[2]) for k, v in _VAE_ATTN_FIELDS.items()}

    def inv_fn(fn):
        # conv_w and lin_w are involutions up to transpose direction
        if fn is conv_w:
            return lambda x: _np(x).transpose(3, 2, 0, 1)
        if fn is lin_w:
            return lambda x: _np(x).transpose(1, 0)
        return _np

    out: Dict[str, np.ndarray] = {}
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    for path, val in flat.items():
        parts = path.split("/")
        top = parts[0]
        rest = "/".join(parts[1:])
        leaf = parts[-1]

        def emit(name, fieldmap_key, inv_table):
            key2, fn = inv_table[fieldmap_key]
            out[name + "." + key2] = inv_fn(fn)(val)

        if top in ("diffusion_model", "control_model"):
            pfx = "model.diffusion_model" if top == "diffusion_model" else "control_model"
            mod = parts[1]
            sub = "/".join(parts[2:])
            if mod == "time_embed":
                idx = "0" if parts[2] == "fc1" else "2"
                out[f"{pfx}.time_embed.{idx}.{'weight' if leaf=='kernel' else 'bias'}"] = (
                    lin_w(val) if leaf == "kernel" else _np(val)
                )
            elif mod == "conv_in":
                out[f"{pfx}.input_blocks.0.0.{'weight' if leaf=='kernel' else 'bias'}"] = (
                    inv_conv_w(val) if leaf == "kernel" else _np(val)
                )
            elif mod == "out_norm":
                out[f"{pfx}.out.0.{'weight' if leaf=='scale' else 'bias'}"] = _np(val)
            elif mod == "conv_out" and top == "diffusion_model":
                out[f"{pfx}.out.2.{'weight' if leaf=='kernel' else 'bias'}"] = (
                    inv_conv_w(val) if leaf == "kernel" else _np(val)
                )
            elif mod.startswith("zero_conv_"):
                zi = mod.split("_")[-1]
                out[f"{pfx}.zero_convs.{zi}.0.{'weight' if leaf=='kernel' else 'bias'}"] = (
                    inv_conv_w(val) if leaf == "kernel" else _np(val)
                )
            elif mod == "middle_block_out":
                out[f"{pfx}.middle_block_out.0.{'weight' if leaf=='kernel' else 'bias'}"] = (
                    inv_conv_w(val) if leaf == "kernel" else _np(val)
                )
            elif mod == "input_hint_block":
                name = parts[2]
                ti = 14 if name == "conv_out" else int(name.split("_")[1]) * 2
                out[f"{pfx}.input_hint_block.{ti}.{'weight' if leaf=='kernel' else 'bias'}"] = (
                    inv_conv_w(val) if leaf == "kernel" else _np(val)
                )
            elif mod.startswith(("down_", "up_", "mid_")):
                if mod.endswith("_downsample"):
                    bi = inv_in[(mod, None)]
                    out[f"{pfx}.input_blocks.{bi}.0.op.{'weight' if leaf=='kernel' else 'bias'}"] = (
                        inv_conv_w(val) if leaf == "kernel" else _np(val)
                    )
                elif mod.endswith("_upsample"):
                    level = int(mod.split("_")[1])
                    bi = inv_out[(f"up_{level}", u.num_res_blocks)]
                    ds = 2 ** level
                    slot = 2 if ds in u.attention_resolutions else 1
                    out[f"{pfx}.output_blocks.{bi}.{slot}.conv.{'weight' if leaf=='kernel' else 'bias'}"] = (
                        inv_conv_w(val) if leaf == "kernel" else _np(val)
                    )
                else:
                    m = re.match(r"(down|up)_(\d+)_(res|attn)_(\d+)", mod)
                    if m:
                        side, level, kind, ri = m.group(1), int(m.group(2)), m.group(3), int(m.group(4))
                        if side == "down":
                            bi = inv_in[(f"down_{level}", ri)]
                            blocks, slot_attn = "input_blocks", 1
                        else:
                            bi = inv_out[(f"up_{level}", ri)]
                            blocks, slot_attn = "output_blocks", 1
                        if kind == "res":
                            key2, fn = res_inv["/".join(parts[2:])]
                            out[f"{pfx}.{blocks}.{bi}.0.{key2}"] = inv_fn(fn)(val)
                        else:
                            inner = "/".join(parts[2:])
                            if inner in attn_inv:
                                key2, fn = attn_inv[inner]
                                out[f"{pfx}.{blocks}.{bi}.{slot_attn}.{key2}"] = inv_fn(fn)(val)
                            else:
                                mb = re.match(r"block_(\d+)/(.+)", inner)
                                key2, fn = tfb_inv[mb.group(2)]
                                out[f"{pfx}.{blocks}.{bi}.{slot_attn}.transformer_blocks.{mb.group(1)}.{key2}"] = inv_fn(fn)(val)
                    elif mod in ("mid_res_0", "mid_res_1"):
                        slot = 0 if mod == "mid_res_0" else 2
                        key2, fn = res_inv["/".join(parts[2:])]
                        out[f"{pfx}.middle_block.{slot}.{key2}"] = inv_fn(fn)(val)
                    elif mod == "mid_attn":
                        inner = "/".join(parts[2:])
                        if inner in attn_inv:
                            key2, fn = attn_inv[inner]
                            out[f"{pfx}.middle_block.1.{key2}"] = inv_fn(fn)(val)
                        else:
                            mb = re.match(r"block_(\d+)/(.+)", inner)
                            key2, fn = tfb_inv[mb.group(2)]
                            out[f"{pfx}.middle_block.1.transformer_blocks.{mb.group(1)}.{key2}"] = inv_fn(fn)(val)
        elif top == "first_stage_model":
            pfx = "first_stage_model"
            mod = parts[1]
            if mod in ("quant_conv", "post_quant_conv"):
                out[f"{pfx}.{mod}.{'weight' if leaf=='kernel' else 'bias'}"] = (
                    inv_conv_w(val) if leaf == "kernel" else _np(val)
                )
            else:  # encoder/decoder
                side = mod
                name = parts[2]
                if name in ("conv_in", "conv_out"):
                    out[f"{pfx}.{side}.{name}.{'weight' if leaf=='kernel' else 'bias'}"] = (
                        inv_conv_w(val) if leaf == "kernel" else _np(val)
                    )
                elif name == "norm_out":
                    out[f"{pfx}.{side}.norm_out.{'weight' if leaf=='scale' else 'bias'}"] = _np(val)
                elif name.endswith("_downsample"):
                    l = name.split("_")[1]
                    out[f"{pfx}.{side}.down.{l}.downsample.conv.{'weight' if leaf=='kernel' else 'bias'}"] = (
                        inv_conv_w(val) if leaf == "kernel" else _np(val)
                    )
                elif name.endswith("_upsample"):
                    l = name.split("_")[1]
                    out[f"{pfx}.{side}.up.{l}.upsample.conv.{'weight' if leaf=='kernel' else 'bias'}"] = (
                        inv_conv_w(val) if leaf == "kernel" else _np(val)
                    )
                elif name.startswith("mid_"):
                    part = name[4:]
                    inner = "/".join(parts[3:])
                    table = vattn_inv if part == "attn_1" else vres_inv
                    key2, fn = table[inner]
                    out[f"{pfx}.{side}.mid.{part}.{key2}"] = inv_fn(fn)(val)
                else:
                    m = re.match(r"(down|up)_(\d+)_block_(\d+)", name)
                    inner = "/".join(parts[3:])
                    key2, fn = vres_inv[inner]
                    out[f"{pfx}.{side}.{m.group(1)}.{m.group(2)}.block.{m.group(3)}.{key2}"] = inv_fn(fn)(val)
        elif top == "cond_stage_model":
            pfx = "cond_stage_model.transformer.text_model"
            mod = parts[1]
            if mod == "token_embedding":
                out[f"{pfx}.embeddings.token_embedding.weight"] = _np(val)
            elif mod == "position_embedding":
                out[f"{pfx}.embeddings.position_embedding.weight"] = _np(val)
            elif mod == "final_ln":
                out[f"{pfx}.final_layer_norm.{'weight' if leaf=='scale' else 'bias'}"] = _np(val)
            elif mod.startswith("layer_"):
                li = mod.split("_")[1]
                inner = parts[2]
                if inner == "attn":
                    proj = parts[3]
                    out[f"{pfx}.encoder.layers.{li}.self_attn.{proj}.{'weight' if leaf=='kernel' else 'bias'}"] = (
                        lin_w(val) if leaf == "kernel" else _np(val)
                    )
                elif inner in ("ln1", "ln2"):
                    out[f"{pfx}.encoder.layers.{li}.layer_norm{inner[-1]}.{'weight' if leaf=='scale' else 'bias'}"] = _np(val)
                elif inner in ("fc1", "fc2"):
                    out[f"{pfx}.encoder.layers.{li}.mlp.{inner}.{'weight' if leaf=='kernel' else 'bias'}"] = (
                        lin_w(val) if leaf == "kernel" else _np(val)
                    )
    return out


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt.get("state_dict", ckpt)


def main():
    import argparse, pickle

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt", help="torch .ckpt/.pth (ControlLDM state dict)")
    ap.add_argument("out", help="output params file (pickle of numpy pytree)")
    ap.add_argument("--bpe-vocab", default=None,
                    help="CLIP bpe_simple_vocab_16e6.txt.gz — enables REAL prompt "
                         "ids for the exported context bank")
    ap.add_argument("--no-context-bank", action="store_true",
                    help="skip encoding the fixed-prompt context bank")
    args = ap.parse_args()
    cfg = ModelConfig()
    state = load_torch_checkpoint(args.ckpt)
    converted = convert_state_dict(state, cfg)
    un = converted.pop("__unconsumed__")
    if un:
        print(f"WARNING: {len(un)} unconsumed keys, e.g. {un[:5]}")
    if not args.no_context_bank:
        # context-vector export: production inference never needs a tokenizer
        from ..models.controlled_ldm import ControlledLDM

        tokenize = None
        if args.bpe_vocab:
            from ..data.tokenizer import CLIPTokenizer

            tokenize = CLIPTokenizer(args.bpe_vocab).encode
        model = ControlledLDM(cfg)
        import jax

        converted["context_bank"] = export_context_bank(
            model, {"params": converted["params"]}, tokenize=tokenize,
            max_length=cfg.clip.max_length,
        )
        if converted["context_bank"]["ids_source"] == "placeholder":
            print("WARNING: context bank encoded from PLACEHOLDER prompt ids — "
                  "supply --bpe-vocab for production-correct conditioning")
    with open(args.out, "wb") as f:
        pickle.dump(converted, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
