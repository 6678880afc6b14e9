"""Dataclass config tree — the knob set of the reference's OmegaConf yaml.

Mirrors /root/reference/diffmodels/base_diffusion_makeup.yaml:1-116 (every hyperparameter
listed in SURVEY.md §2 row 2), replacing the reference's two-tier system (yaml
``target:``/``params:`` trees + edit-in-place driver constants,
/root/reference/runs/train.py:12-21) with one typed tree, JSON round-trippable, no env
vars. Teacher selection is a string enum exactly like the reference's ``teacher_type``
dispatch (/root/reference/diffmk/diffusion_makeup.py:57-86).
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Tuple


@dataclass(frozen=True)
class UNetConfig:
    """SD1.5 ControlledUnetModel knobs (yaml:69-84)."""

    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    num_res_blocks: int = 2
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 768
    use_checkpoint: bool = True  # jax.checkpoint on transformer/res blocks
    dropout: float = 0.0


@dataclass(frozen=True)
class ControlNetConfig:
    """ControlNet knobs (yaml:52-67); hint_channels=6 is the dual-image hint."""

    in_channels: int = 4
    hint_channels: int = 6
    model_channels: int = 320
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    num_res_blocks: int = 2
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 768
    use_checkpoint: bool = True
    dropout: float = 0.0


@dataclass(frozen=True)
class VAEConfig:
    """AutoencoderKL ddconfig (yaml:86-107)."""

    embed_dim: int = 4
    z_channels: int = 4
    double_z: bool = True
    resolution: int = 256
    in_channels: int = 3
    out_ch: int = 3
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = ()
    dropout: float = 0.0


@dataclass(frozen=True)
class CLIPTextConfig:
    """FrozenCLIPEmbedder = CLIP ViT-L/14 text tower (yaml:109-110)."""

    vocab_size: int = 49408
    max_length: int = 77
    width: int = 768
    layers: int = 12
    heads: int = 12


@dataclass(frozen=True)
class ModelConfig:
    """Root model knobs (yaml:3-50) — BaseDoubleControlModel params."""

    linear_start: float = 0.00085
    linear_end: float = 0.0120
    timesteps: int = 1000
    log_every_t: int = 200
    # region loss weights (yaml:10-12)
    lambda_lip: float = 1.0
    lambda_eye: float = 1.5
    lambda_skin: float = 0.5
    # teacher: SCGAN | ELEGANT | ELEGANT_PGT | KEEP (yaml:15; diffusion_makeup.py:57-86)
    teacher_type: str = "ELEGANT_PGT"
    # composite loss weights (yaml:19-24)
    w_idt_src: float = 1.0
    w_idt_ref: float = 1.0
    w_bkgrd: float = 1.0
    w_cycle_content: float = 1.0
    w_cycle_makeup: float = 1.0
    w_makeup: float = 10.0
    # t_min curriculum (yaml:26-29; makeup_diffuse.py:255-266)
    is_adjust: bool = True
    t_min: int = 100
    t_max: int = 900
    delta_t: int = 50
    is_fixbkgrd: bool = False
    # latent geometry (yaml:41-42); data is 256² so the latent is 32²·4ch
    image_size: int = 256
    latent_channels: int = 4
    scale_factor: float = 0.18215
    parameterization: str = "eps"
    # reference behavior: fake_sr = generate_image() is produced under
    # @torch.no_grad (decode_first_stage) and thus DETACHED from the base pass;
    # True backprops through the VAE decode into the base pass (extension)
    grad_through_fake_sr: bool = False
    only_mid_control: bool = False
    # hint ablations (SURVEY §2 row 10): double | single_ref | single_src | none
    hint_mode: str = "double"
    l_simple_weight: float = 1.0
    original_elbo_weight: float = 0.0
    # sub-model configs (yaml:52-116)
    unet: UNetConfig = field(default_factory=UNetConfig)
    control: ControlNetConfig = field(default_factory=ControlNetConfig)
    vae: VAEConfig = field(default_factory=VAEConfig)
    clip: CLIPTextConfig = field(default_factory=CLIPTextConfig)
    # compute dtype for the hot path (params stay fp32)
    compute_dtype: str = "bfloat16"

    @property
    def latent_size(self) -> int:
        return self.image_size // (2 ** (len(self.vae.ch_mult) - 1))

    @property
    def num_control_levels(self) -> int:
        """Number of control residuals: one zero-conv per UNet input block + middle.

        ControlLDM's ``control_scales = [1.0]*13`` for the SD1.5 topology
        (12 input blocks + middle)."""
        u = self.unet
        n_levels = len(u.channel_mult)
        return 1 + n_levels * u.num_res_blocks + (n_levels - 1) + 1


@dataclass(frozen=True)
class TrainConfig:
    """Driver knobs (/root/reference/runs/train.py:12-21,50,55)."""

    batch_size: int = 6
    learning_rate: float = 1e-5
    sd_locked: bool = True
    logger_freq: int = 200
    ckpt_every_steps: int = 200
    metrics_every: int = 10  # fetch device metrics every N steps (async dispatch)
    seed: int = 0
    num_epochs: int = 100
    steps_per_epoch: int = 0  # 0 → len(dataset)//batch_size
    data_axis: str = "data"  # mesh axis name for DP sharding
    log_dir: str = "./logs"


@dataclass(frozen=True)
class SampleConfig:
    """Inference knobs (diffusion_makeup.py:201,292-303; makeup_diffuse.py:361)."""

    ddim_steps: int = 50
    ddim_eta: float = 0.0
    cfg_scale: float = 9.0
    batch_size: int = 1


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    sample: SampleConfig = field(default_factory=SampleConfig)


# ---- (de)serialization -----------------------------------------------------------


def _to_dict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        return {f.name: _to_dict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_to_dict(x) for x in obj]
    return obj


def _from_dict(cls, data: Dict[str, Any]):
    import typing

    hints = typing.get_type_hints(cls)
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        ftype = hints.get(f.name, f.type)
        if isinstance(ftype, type) and dataclasses.is_dataclass(ftype):
            kwargs[f.name] = _from_dict(ftype, v)
        elif isinstance(v, list):
            kwargs[f.name] = tuple(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        json.dump(_to_dict(cfg), f, indent=2)


def load_config(path: str) -> Config:
    with open(path) as f:
        data = json.load(f)
    return _from_dict(Config, data)


def tiny_test_config() -> Config:
    """A miniature config for fast CPU tests (shapes only, same topology)."""
    return Config(
        model=ModelConfig(
            image_size=64,
            unet=UNetConfig(model_channels=32, num_heads=4, context_dim=64,
                            channel_mult=(1, 2), num_res_blocks=1,
                            attention_resolutions=(1,), use_checkpoint=False),
            control=ControlNetConfig(model_channels=32, num_heads=4, context_dim=64,
                                     channel_mult=(1, 2), num_res_blocks=1,
                                     attention_resolutions=(1,), use_checkpoint=False),
            # 4 levels → 8× spatial factor, matching the ControlNet hint stem's
            # fixed 8× downsample (image 64² → latent 8²)
            vae=VAEConfig(ch=16, ch_mult=(1, 2, 2, 2), num_res_blocks=1, resolution=64),
            clip=CLIPTextConfig(vocab_size=256, max_length=16, width=64, layers=2, heads=4),
            compute_dtype="float32",
        ),
        train=TrainConfig(batch_size=2),
        sample=SampleConfig(ddim_steps=5, batch_size=1),
    )
