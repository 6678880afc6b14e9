"""Torch twin of SCGAN's SCGen — the conversion oracle for ``G.pth``.

The reference's SCGAN teacher loads ``G.pth`` into the external
``scgan_models.SCGen`` (/root/reference/diffmk/teacher.py:12-23) and drives it as
``FIEnc(nonmakeup)`` → ``PSEnc(makeup, seg, makeup, seg, makeup, seg)`` →
``fuse(fid_x, code, code)`` (:88-93).  That repo is not vendored and this
environment has zero egress, so this module RECONSTRUCTS the generator from the
published architecture (SCGAN, "Spatially-Invariant Style-Codes Controlled Makeup
Transfer", CVPR'21 — an openly MUNIT-derived design) with the submodule names the
reference proves (FIEnc / PSEnc / fuse) and MUNIT-canonical internals:

  FIEnc  = MUNIT ContentEncoder  (7x7 stem + 2 strided downs + 3 'in' resblocks,
           reflect padding, InstanceNorm affine=False → normless state dict)
  PSEnc  = part-style encoder: a shared normless conv trunk applied to each
           component-masked image (lip / skin / eye), masked global average pool,
           1x1 fc → per-part style code, concatenated (style_dim = 3 x 64)
  fuse   = MUNIT Decoder: MLP(code₁‖code₂) → AdaIN params for 3 'adain'
           resblocks, then 2 x (upsample + 5x5 'ln' conv) and a 7x7 tanh head

This torch module is the single patch point for key-name fidelity (see
tools/torch_elegant.py for the policy): its ``state_dict()`` key set IS the
converter's expected set, shapes are hard-asserted on conversion, and
tests/test_teacher_convert.py proves a synthetic export → convert → forward
roundtrip with numeric torch-vs-flax parity against
``teacher/scgen_munit.SCGenMunit``.
"""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class LayerNorm(nn.Module):
    """MUNIT's LayerNorm: normalize over (C, H, W) per sample, affine γ/β."""

    def __init__(self, num_features, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.gamma = nn.Parameter(torch.ones(num_features))
        self.beta = nn.Parameter(torch.zeros(num_features))

    def forward(self, x):
        mean = x.mean(dim=(1, 2, 3), keepdim=True)
        var = x.var(dim=(1, 2, 3), keepdim=True, unbiased=False)
        x = (x - mean) / torch.sqrt(var + self.eps)
        return x * self.gamma.view(1, -1, 1, 1) + self.beta.view(1, -1, 1, 1)


class AdaIN(nn.Module):
    """MUNIT AdaptiveInstanceNorm2d: per-channel affine assigned at runtime from
    the style MLP; carries NO persistent parameters."""

    def __init__(self, num_features, eps=1e-5):
        super().__init__()
        self.num_features = num_features
        self.eps = eps
        self.weight = None
        self.bias = None

    def forward(self, x):
        assert self.weight is not None, "AdaIN params not assigned"
        mean = x.mean(dim=(2, 3), keepdim=True)
        var = x.var(dim=(2, 3), keepdim=True, unbiased=False)
        x = (x - mean) / torch.sqrt(var + self.eps)
        return x * self.weight.view(x.shape[0], -1, 1, 1) + \
            self.bias.view(x.shape[0], -1, 1, 1)


class Conv2dBlock(nn.Module):
    """MUNIT Conv2dBlock: reflect pad → conv → norm → activation."""

    def __init__(self, cin, cout, k, s, p, norm="none", activ="relu"):
        super().__init__()
        self.pad = nn.ReflectionPad2d(p)
        self.conv = nn.Conv2d(cin, cout, k, s, 0)
        if norm == "in":
            self.norm = nn.InstanceNorm2d(cout)  # affine=False: no keys
        elif norm == "ln":
            self.norm = LayerNorm(cout)
        elif norm == "adain":
            self.norm = AdaIN(cout)
        else:
            self.norm = None
        self.activ = activ

    def forward(self, x):
        x = self.conv(self.pad(x))
        if self.norm is not None:
            x = self.norm(x)
        if self.activ == "relu":
            x = F.relu(x)
        elif self.activ == "tanh":
            x = torch.tanh(x)
        return x


class ResBlock(nn.Module):
    def __init__(self, dim, norm):
        super().__init__()
        self.model = nn.Sequential(
            Conv2dBlock(dim, dim, 3, 1, 1, norm=norm, activ="relu"),
            Conv2dBlock(dim, dim, 3, 1, 1, norm=norm, activ="none"),
        )

    def forward(self, x):
        return x + self.model(x)


class ResBlocks(nn.Module):
    def __init__(self, n, dim, norm):
        super().__init__()
        self.model = nn.Sequential(*[ResBlock(dim, norm) for _ in range(n)])

    def forward(self, x):
        return self.model(x)


class ContentEncoder(nn.Module):
    """FIEnc: 256² source image → 64² identity features (4*dim channels)."""

    def __init__(self, dim=64, n_downsample=2, n_res=3):
        super().__init__()
        layers = [Conv2dBlock(3, dim, 7, 1, 3, norm="in")]
        d = dim
        for _ in range(n_downsample):
            layers.append(Conv2dBlock(d, 2 * d, 4, 2, 1, norm="in"))
            d *= 2
        layers.append(ResBlocks(n_res, d, norm="in"))
        self.model = nn.Sequential(*layers)
        self.output_dim = d

    def forward(self, x):
        return self.model(x)


class PartStyleEncoder(nn.Module):
    """PSEnc: (img, seg) per component → style code. A shared normless trunk on
    the component-masked image, component-masked global average pooling, 1x1 fc.
    Called with three (img, seg) pairs (lip, skin, eye — teacher.py:92)."""

    def __init__(self, dim=64, part_dim=64):
        super().__init__()
        self.model = nn.Sequential(
            Conv2dBlock(3, dim, 7, 1, 3, norm="none"),
            Conv2dBlock(dim, 2 * dim, 4, 2, 1, norm="none"),
            Conv2dBlock(2 * dim, 4 * dim, 4, 2, 1, norm="none"),
            Conv2dBlock(4 * dim, 4 * dim, 4, 2, 1, norm="none"),
        )
        self.fc = nn.Conv2d(4 * dim, part_dim, 1)
        self.phase = "test"

    def _one(self, img, comp_mask):
        x = img * comp_mask
        h = self.model(x)
        m = F.interpolate(comp_mask, size=h.shape[2:], mode="nearest")
        pooled = (h * m).sum(dim=(2, 3), keepdim=True) / \
            m.sum(dim=(2, 3), keepdim=True).clamp_min(1.0)
        return self.fc(pooled).flatten(1)

    def forward(self, img_lip, seg_lip, img_skin, seg_skin, img_eye, seg_eye):
        codes = [self._one(img_lip, seg_lip[:, 0:1]),
                 self._one(img_skin, seg_skin[:, 1:2]),
                 self._one(img_eye, seg_eye[:, 2:3])]
        return torch.cat(codes, dim=1)  # [B, 3*part_dim]


class MLP(nn.Module):
    def __init__(self, cin, cout, dim=256):
        super().__init__()
        self.model = nn.Sequential(
            nn.Linear(cin, dim), nn.ReLU(inplace=False),
            nn.Linear(dim, dim), nn.ReLU(inplace=False),
            nn.Linear(dim, cout),
        )

    def forward(self, x):
        return self.model(x)


class Decoder(nn.Module):
    """fuse: (content, code, code) → image. AdaIN params for the resblocks come
    from MLP(code₁ ‖ code₂); the reference's full-transfer path passes the same
    code twice (teacher.py:93)."""

    def __init__(self, dim=256, n_res=3, style_dim=192, mlp_dim=256):
        super().__init__()
        self.resblocks = ResBlocks(n_res, dim, norm="adain")
        ups = []
        d = dim
        for _ in range(2):
            ups += [nn.Upsample(scale_factor=2, mode="nearest"),
                    Conv2dBlock(d, d // 2, 5, 1, 2, norm="ln")]
            d //= 2
        ups.append(Conv2dBlock(d, 3, 7, 1, 3, norm="none", activ="tanh"))
        self.model = nn.Sequential(*ups)
        n_adain = 2 * 2 * n_res * dim  # (weight+bias) x 2 convs/block x n_res
        self.mlp = MLP(2 * style_dim, n_adain, mlp_dim)

    def _assign(self, params):
        i = 0
        for m in self.resblocks.modules():
            if isinstance(m, AdaIN):
                c = m.num_features
                m.weight = 1.0 + params[:, i:i + c]
                m.bias = params[:, i + c:i + 2 * c]
                i += 2 * c
        assert i == params.shape[1]

    def forward(self, content, code_a, code_b):
        self._assign(self.mlp(torch.cat([code_a, code_b], dim=1)))
        return self.model(self.resblocks(content))


class SCGenTorch(nn.Module):
    """SCGen reconstruction: FIEnc / PSEnc / fuse with the reference's call
    contract (teacher.py:88-93)."""

    def __init__(self, dim=64, style_dim=192, n_downsample=2, n_res=3,
                 mlp_dim=256, n_componets=3):
        super().__init__()
        self.n_componets = n_componets
        self.FIEnc = ContentEncoder(dim, n_downsample, n_res)
        self.PSEnc = PartStyleEncoder(dim, style_dim // n_componets)
        self.fuse = Decoder(self.FIEnc.output_dim, n_res, style_dim, mlp_dim)

    def forward(self, makeup, nonmakeup, makeup_seg, nonmakeup_seg):
        fid = self.FIEnc(nonmakeup)
        code = self.PSEnc(makeup, makeup_seg, makeup, makeup_seg,
                          makeup, makeup_seg)
        return self.fuse(fid, code, code)
