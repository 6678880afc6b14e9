"""ControlledLDM: the composite model = ControlNet + SD-UNet + KL-VAE + CLIP text.

Capability parity: ``cldm.cldm.ControlLDM`` as specialized by the reference's
``BaseDoubleControlModel`` chain —
  * ``apply_model``: ControlNet forward on (x_t, hint=src‖ref, t, ctx) → scaled
    residual list → UNet forward (/root/reference/diffmk/makeup_diffuse.py:152-170),
    with optional x_recon = predict_start_from_noise (return_all=True) and
    only_mid_control.
  * first-stage encode ×0.18215 (get_z, makeup_diffuse.py:37-40) and decode+clamp
    (generate_image, :172-177).
  * CFG denoiser: 2×-batched cond/uncond forward with shared hint, as the reference's
    sample_log/MKDDIMSampler do (cddim.py:18-40; uc_cat = c_cat at
    diffusion_makeup.py:241).

Everything here is functional: a flax module + pure helpers over its params pytree,
jit/pjit-composable. Hints arrive NHWC in [0,1] exactly like the reference's
c_concat (datasets return (img+1)/2, datasets.py:640-664).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..core.schedule import DiffusionSchedule
from .clip_text import CLIPTextEncoder
from .controlnet import ControlNet
from .unet import ControlledUNet
from .vae import AutoencoderKL


def _dtype(cfg: ModelConfig):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.compute_dtype]


class ControlledLDM(nn.Module):
    cfg: ModelConfig

    def setup(self):
        dt = _dtype(self.cfg)
        self.control_model = ControlNet(self.cfg.control, dtype=dt)
        self.diffusion_model = ControlledUNet(self.cfg.unet, dtype=dt)
        self.first_stage_model = AutoencoderKL(self.cfg.vae, dtype=dt)
        self.cond_stage_model = CLIPTextEncoder(self.cfg.clip, dtype=dt)

    # ---- eps prediction (the HOTTEST path, SURVEY §3.1) --------------------------

    def apply_eps(
        self,
        x_noisy: jnp.ndarray,  # [B,h,w,4]
        t: jnp.ndarray,  # [B]
        context: jnp.ndarray,  # [B,77,ctx]
        hint: Optional[jnp.ndarray],  # [B,H,W,6] in [0,1], or None (NoControl)
        control_scales: Optional[jnp.ndarray] = None,  # [num_control_levels]
        only_mid_control: bool = False,
        hint_features: Optional[jnp.ndarray] = None,  # precomputed hint-stem output
    ) -> jnp.ndarray:
        if hint is None and hint_features is None:
            return self.diffusion_model(x_noisy, t, context, control=None)
        control = self.control_model(x_noisy, hint, t, context,
                                     hint_features=hint_features)
        if control_scales is None:
            control = list(control)
        else:
            control = [c * s for c, s in zip(control, control_scales)]
        return self.diffusion_model(
            x_noisy, t, context, control=control, only_mid_control=only_mid_control
        )

    # ---- first stage --------------------------------------------------------------

    def encode_moments(self, x: jnp.ndarray):
        return self.first_stage_model.encode_moments(x)

    def decode_latent(self, z: jnp.ndarray) -> jnp.ndarray:
        """decode_first_stage: divide by scale_factor then VAE-decode."""
        return self.first_stage_model.decode(z / self.cfg.scale_factor)

    def encode_text(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.cond_stage_model(input_ids)


# ---- pure functional helpers over (model, params) ---------------------------------


def compute_hint_features(model: ControlledLDM, params, hint: jnp.ndarray) -> jnp.ndarray:
    """Run ONLY the ControlNet hint stem (input_hint_block, 7 convs 256²→32²).

    Its input is constant across a DDIM/DPM chain, so samplers compute it once and
    pass it through ``apply_eps(hint_features=...)`` — hoisting ~700 stem convs out
    of a 50-step CFG chain. The reference recomputes it every UNet call
    (cldm forward); on TPU the hoist is free because the scan body sees it as a
    loop-invariant argument."""
    from .controlnet import HintStem

    stem = HintStem(model.cfg.control.model_channels, _dtype(model.cfg))
    p = params["params"]["control_model"]["input_hint_block"]
    return stem.apply({"params": p}, hint)


def get_z(
    model: ControlledLDM,
    params,
    images: jnp.ndarray,  # [B,H,W,3] in [-1,1]
    rng: jax.Array,
) -> jnp.ndarray:
    """VAE-encode, sample the posterior, scale by 0.18215 (reference get_z)."""
    mean, logvar = model.apply(params, images, method=model.encode_moments)
    z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
    return model.cfg.scale_factor * z


def decode_image(
    model: ControlledLDM,
    params,
    z: jnp.ndarray,
    clamp: bool = True,
    format_01: bool = False,
) -> jnp.ndarray:
    """generate_image parity (makeup_diffuse.py:172-177)."""
    img = model.apply(params, z, method=model.decode_latent)
    if clamp:
        img = jnp.clip(img, -1.0, 1.0)
    if format_01:
        img = (img + 1.0) / 2.0
    return img


def apply_model(
    model: ControlledLDM,
    params,
    schedule: DiffusionSchedule,
    x_noisy: jnp.ndarray,
    t: jnp.ndarray,
    context: jnp.ndarray,
    hint: Optional[jnp.ndarray],
    control_scales: Optional[jnp.ndarray] = None,
    only_mid_control: bool = False,
    return_x_recon: bool = False,
):
    """eps (and optionally x_recon) — apply_model(return_all) parity
    (makeup_diffuse.py:152-170)."""
    eps = model.apply(
        params, x_noisy, t, context, hint, control_scales, only_mid_control,
        method=model.apply_eps,
    )
    if not return_x_recon:
        return eps
    x_recon = schedule.predict_start_from_noise(x_noisy, t, eps)
    return eps, x_recon


def make_denoiser(
    model: ControlledLDM,
    params,
    context: jnp.ndarray,
    hint: Optional[jnp.ndarray],
    uncond_context: Optional[jnp.ndarray] = None,
    cfg_scale: float = 1.0,
    control_scales: Optional[jnp.ndarray] = None,
    only_mid_control: bool = False,
    schedule: Optional[DiffusionSchedule] = None,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Build the `denoiser(x, t) -> eps` closure for core.ddim / core.dpm_solver.

    With cfg_scale > 1 this fuses the cond/uncond passes into ONE 2×-batched forward
    (uncond first, cond second — MKDDIMSampler order, cddim.py:25-40), sharing the
    hint between both halves (uc_cat = c_cat, diffusion_makeup.py:241).

    When the model is v-parameterized, pass `schedule` so the raw v output is
    converted to eps (cddim.py:42-43 predict_eps_from_z_and_v)."""

    use_cfg = uncond_context is not None and cfg_scale != 1.0
    is_v = model.cfg.parameterization == "v"
    if is_v and schedule is None:
        raise ValueError("v-parameterized model needs `schedule` for eps conversion")

    def to_eps(x, t, out):
        return schedule.predict_eps_from_z_and_v(x, t, out) if is_v else out

    # hint-stem hoist: the stem input never changes across the chain, so compute
    # its features here (traced once, loop-invariant to the sampler's scan) and
    # skip the 7-conv 256²-resolution stem inside every step
    hf = None
    if hint is not None:
        hint_full = jnp.concatenate([hint, hint], axis=0) if use_cfg else hint
        hf = compute_hint_features(model, params, hint_full)

    def denoiser(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        if not use_cfg:
            out = model.apply(
                params, x, t, context, None, control_scales, only_mid_control, hf,
                method=model.apply_eps,
            ) if hf is not None else model.apply(
                params, x, t, context, None, control_scales, only_mid_control,
                method=model.apply_eps,
            )
            return to_eps(x, t, out)
        x_in = jnp.concatenate([x, x], axis=0)
        t_in = jnp.concatenate([t, t], axis=0)
        ctx_in = jnp.concatenate([uncond_context, context], axis=0)
        out = model.apply(
            params, x_in, t_in, ctx_in, None, control_scales, only_mid_control, hf,
            method=model.apply_eps,
        )
        out = to_eps(x_in, t_in, out)
        e_uncond, e_cond = jnp.split(out, 2, axis=0)
        return e_uncond + cfg_scale * (e_cond - e_uncond)

    return denoiser


def init_model(
    cfg: ModelConfig, rng: jax.Array, batch: int = 1, init_on_cpu: bool = False
) -> Tuple[ControlledLDM, Dict[str, Any]]:
    """Initialize all four sub-model parameter trees with dummy shapes.

    ``init_on_cpu=True`` runs the (one-shot) init programs on the host CPU backend
    and transfers the resulting pytree to the default device — on remote-compile TPU
    attachments this avoids paying a multi-minute device compile for a throwaway
    initialization graph."""
    model = ControlledLDM(cfg)
    h = cfg.latent_size
    x = jnp.zeros((batch, h, h, cfg.latent_channels))
    t = jnp.zeros((batch,), jnp.int32)
    ctx = jnp.zeros((batch, cfg.clip.max_length, cfg.unet.context_dim))
    hint = jnp.zeros((batch, cfg.image_size, cfg.image_size, cfg.control.hint_channels))
    img = jnp.zeros((batch, cfg.image_size, cfg.image_size, 3))
    ids = jnp.zeros((batch, cfg.clip.max_length), jnp.int32)

    def deep_merge(a: dict, b: dict) -> dict:
        out = dict(a)
        for k, v in b.items():
            out[k] = deep_merge(out[k], v) if isinstance(out.get(k), dict) and isinstance(v, dict) else v
        return out

    k1, k2, k3, k4 = jax.random.split(rng, 4)
    params: Dict[str, Any] = {}
    import contextlib

    cpu_ctx = (
        jax.default_device(jax.devices("cpu")[0]) if init_on_cpu else contextlib.nullcontext()
    )
    with cpu_ctx:
        for key, args, method in (
            (k1, (x, t, ctx, hint), ControlledLDM.apply_eps),
            (k2, (img,), ControlledLDM.encode_moments),
            (k3, (x,), ControlledLDM.decode_latent),
            (k4, (ids,), ControlledLDM.encode_text),
        ):
            # jit the init so it compiles as ONE program (eager init dispatches
            # thousands of tiny ops — pathological on remote-compile backends)
            init_fn = jax.jit(
                lambda k, *a, _m=method: ControlledLDM(cfg).init(k, *a, method=_m)
            )
            v = init_fn(key, *args)
            params = deep_merge(params, v["params"])
    if init_on_cpu:
        params = jax.device_put(params, jax.devices()[0])
    return model, {"params": params}


# zero-initialized modules (SD semantics): ControlNet zero convs + hint-stem final
# conv + middle_block_out, ResBlock out convs, SpatialTransformer proj_out (NOT the
# VAE's attn proj_out), and the UNet's final conv.
_ZERO_PATTERNS = ("zero_conv", "middle_block_out", "input_hint_block/conv_out")


def _is_zero_leaf(path: str) -> bool:
    if any(p in path for p in _ZERO_PATTERNS):
        return True
    top = path.split("/")[0]
    if top in ("diffusion_model", "control_model"):
        if path.endswith("/out_conv/kernel") or path.endswith("/out_conv/bias"):
            return True
        if "_attn" in path and (path.endswith("/proj_out/kernel") or path.endswith("/proj_out/bias")):
            return True
        if path.startswith(f"{top}/conv_out/"):
            return True
    return False


def fast_init_model(
    cfg: ModelConfig, seed: int = 0, batch: int = 1, param_dtype=None,
    fill: str = "normal",
) -> Tuple[ControlledLDM, Dict[str, Any]]:
    """Structure via ``jax.eval_shape`` (no compile), leaves filled host-side with
    numpy — seconds instead of the minutes a compiled full init costs. Distributions:
    variance-scaled normal kernels, zeros for biases and the SD zero-init modules,
    ones for norm scales. Production weights come from tools/convert_torch_ckpt.py;
    this initializer serves benchmarks, smoke tests and from-scratch experiments.

    ``param_dtype`` casts floating leaves on the HOST before the device transfer:
    inference-grade bf16 weights move 2.8 GB instead of 5.6 through the (slow)
    device attachment — this halves flagship tool startup.

    ``fill="zeros"`` skips the random fill entirely (every leaf zero): for
    topology/shape-only consumers (converter roundtrip tests) this avoids
    ~3.5 GB of RNG + scale copies whose first-touch page faults cost minutes
    on this VM."""
    import flax

    model = ControlledLDM(cfg)
    h = cfg.latent_size
    x = jax.ShapeDtypeStruct((batch, h, h, cfg.latent_channels), jnp.float32)
    t = jax.ShapeDtypeStruct((batch,), jnp.int32)
    ctx = jax.ShapeDtypeStruct((batch, cfg.clip.max_length, cfg.unet.context_dim), jnp.float32)
    hint = jax.ShapeDtypeStruct(
        (batch, cfg.image_size, cfg.image_size, cfg.control.hint_channels), jnp.float32
    )
    img = jax.ShapeDtypeStruct((batch, cfg.image_size, cfg.image_size, 3), jnp.float32)
    ids = jax.ShapeDtypeStruct((batch, cfg.clip.max_length), jnp.int32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)

    def deep_merge(a: dict, b: dict) -> dict:
        out = dict(a)
        for k, v in b.items():
            out[k] = deep_merge(out[k], v) if isinstance(out.get(k), dict) and isinstance(v, dict) else v
        return out

    shapes: Dict[str, Any] = {}
    for args, method in (
        ((x, t, ctx, hint), ControlledLDM.apply_eps),
        ((img,), ControlledLDM.encode_moments),
        ((x,), ControlledLDM.decode_latent),
        ((ids,), ControlledLDM.encode_text),
    ):
        v = jax.eval_shape(
            lambda k, *a, _m=method: ControlledLDM(cfg).init(k, *a, method=_m), key, *args
        )
        shapes = deep_merge(shapes, v["params"])

    import numpy as np

    rng = np.random.default_rng(seed)
    flat = flax.traverse_util.flatten_dict(shapes, sep="/")
    out = {}
    for path, sds in flat.items():
        shape, dtype = sds.shape, sds.dtype
        if param_dtype is not None and np.issubdtype(dtype, np.floating):
            dtype = param_dtype
        leaf = path.rsplit("/", 1)[-1]
        if fill == "zeros" or _is_zero_leaf(path) or leaf == "bias":
            arr = np.zeros(shape, dtype)
        elif leaf == "scale":
            arr = np.ones(shape, dtype)
        elif leaf in ("kernel", "embedding") or path == "cond_stage_model/position_embedding":
            fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else shape[0]
            std = (1.0 / max(fan_in, 1)) ** 0.5
            if path == "cond_stage_model/position_embedding":
                std = 0.01
            # f32 generation, in-place scale, no same-dtype astype: each avoided
            # copy is ~first-touch page-fault cost on this VM (measured: a plain
            # `(normal * std).astype(f32)` fill of the 1.4B params costs ~200 s,
            # the copy-free form ~40 s)
            arr = rng.standard_normal(shape, dtype=np.float32)
            arr *= std
            if arr.dtype != dtype:
                arr = arr.astype(dtype)
        else:
            arr = np.zeros(shape, dtype)
        out[path] = jnp.asarray(arr)
    params = flax.traverse_util.unflatten_dict(out, sep="/")
    return model, {"params": params}
