"""The remaining dataset zoo — every loader family of the reference's diffdata.

Capability parity (/root/reference/diffdata/datasets.py, SURVEY §2 row 19):
  * TestRandomDataset       — random pairs with img_name keys (:669-724)
  * GrayColorizationDataset — MT_ControlNET_V3: hint = color image, target = image
    with the face grayscaled except bg/hair/neck (:36-89) — the colorization sanity
    variant of the control task
  * InversionPairDataset    — MT_Dataset_V3/V4: images + segs + precomputed
    DDIM-inversion latents (± pseudo-GT) from tools/invert_latents.py
    (:92-218; inv dir naming 'inv_%d_%d' :111)
  * DoubleControlPGTDataset — MT_Dataset_DoubleControl: pre-rendered PGT images as
    the jpg target with (src, ref) hints (:265-321)
  * AddMakeupDataset        — MT_ControlNET_AddMakeUp: target = makeup image,
    hint = non-makeup source (:325-359)
  * TeacherDataset          — Teacher_Dataset: SCGAN-seg variant with the 3-way
    identity sampling folded in (:497-588) — covered by MTDataset's scgan segs +
    the loss-side identity passes; provided as an alias with keep_order sampling.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

from .mt_dataset import MTDataset, PROMPT
from .preprocess import load_image, load_seg

GRAY_WEIGHTS = np.array([0.299, 0.587, 0.114], np.float32)


class TestRandomDataset:
    """Random (non-makeup, makeup) pairs, no direction swap, with img_name."""

    def __init__(self, root: str, img_size: int = 256, seed: int = 0):
        self.inner = MTDataset(root, img_size, keep_order=True, seed=seed)
        self.rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.inner)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        name_s = self.inner.non_makeup_names[self.rng.randint(len(self.inner.non_makeup_names))]
        name_r = self.inner.makeup_names[self.rng.randint(len(self.inner.makeup_names))]
        item = self.inner.make_item(name_s, name_r, swap=False)
        item["txt"] = PROMPT
        b_s = os.path.splitext(os.path.basename(name_s))[0]
        b_r = os.path.splitext(os.path.basename(name_r))[0]
        item["img_name"] = f"{b_s}&{b_r}"
        return item


class GrayColorizationDataset:
    """MT_ControlNET_V3 parity: target keeps color only on bg/hair/neck, the face
    goes grayscale; the hint is the full-color image — ControlNet recolors."""

    SELECTED = (0, 10, 13)  # background, hair, neck (area_index_dict)

    def __init__(self, root: str, img_size: int = 256):
        self.root = root
        self.img_size = img_size
        names = []
        for lst in ("makeup.txt", "non-makeup.txt"):
            with open(os.path.join(root, lst)) as f:
                names += [l.strip() for l in f if l.strip()]
        self.names = names

    def __len__(self) -> int:
        return len(self.names)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        name = self.names[index % len(self.names)]
        img = load_image(os.path.join(self.root, "images", name), self.img_size)
        img01 = (img + 1.0) / 2.0
        seg = load_seg(os.path.join(self.root, "segs", name), self.img_size)
        keep_color = np.isin(seg, self.SELECTED)[..., None].astype(np.float32)
        gray = (img01 @ GRAY_WEIGHTS)[..., None].repeat(3, axis=-1)
        target01 = keep_color * img01 + (1 - keep_color) * gray
        return dict(
            jpg=(target01 * 2 - 1).astype(np.float32),
            hint=img01.astype(np.float32),
            txt="makeup style transfer",
            path=name,
        )


class InversionPairDataset:
    """MT_Dataset_V3/V4 parity: random pair + precomputed inversion latents."""

    def __init__(self, root: str, img_size: int = 256, t0: int = 100,
                 inv_steps: int = 40, seed: int = 0, with_pgt: bool = False):
        self.inner = MTDataset(root, img_size, keep_order=True, seed=seed)
        self.root = root
        self.inv_dir = os.path.join(root, f"inv_{t0}_{inv_steps}")
        self.rng = np.random.RandomState(seed)
        self.with_pgt = with_pgt  # V4 adds pseudo-GT pairs

    def __len__(self) -> int:
        return len(self.inner)

    def _load_inv(self, name: str) -> np.ndarray:
        d = np.load(os.path.join(self.inv_dir, f"{os.path.basename(name)}.npz"))
        return d["inv"].astype(np.float32)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        name_s = self.inner.non_makeup_names[self.rng.randint(len(self.inner.non_makeup_names))]
        name_r = self.inner.makeup_names[self.rng.randint(len(self.inner.makeup_names))]
        item = self.inner.make_item(name_s, name_r, swap=False)
        out = dict(
            src_img=item["src_img"], ref_img=item["ref_img"],
            src_msk=item["nonmakeup_seg"], ref_msk=item["makeup_seg"],
            src_inv=self._load_inv(name_s), ref_inv=self._load_inv(name_r),
            txt="makeup style transfer",
        )
        if self.with_pgt:
            out["mask_s_full"] = item["mask_s_full"]
            out["mask_r_full"] = item["mask_r_full"]
            out["nonmakeup_img"] = item["nonmakeup_img"]
            out["makeup_img"] = item["makeup_img"]
        return out


class DoubleControlPGTDataset:
    """MT_Dataset_DoubleControl parity: target = pre-rendered PGT image from
    `pgt_dir`, hints = (src, ref)."""

    def __init__(self, root: str, pgt_dir: str = "pgt", img_size: int = 256, seed: int = 0):
        self.inner = MTDataset(root, img_size, keep_order=True, seed=seed)
        self.root = root
        self.pgt_dir = pgt_dir
        self.rng = np.random.RandomState(seed)
        self.img_size = img_size

    def __len__(self) -> int:
        return len(self.inner)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        name_s = self.inner.non_makeup_names[self.rng.randint(len(self.inner.non_makeup_names))]
        name_r = self.inner.makeup_names[self.rng.randint(len(self.inner.makeup_names))]
        item = self.inner.make_item(name_s, name_r, swap=False)
        b_s = os.path.splitext(os.path.basename(name_s))[0]
        b_r = os.path.splitext(os.path.basename(name_r))[0]
        pgt = load_image(
            os.path.join(self.root, self.pgt_dir, f"{b_s}&{b_r}.png"), self.img_size
        )
        return dict(jpg=pgt.astype(np.float32), src_img=item["src_img"],
                    ref_img=item["ref_img"], txt=PROMPT)


class AddMakeupDataset:
    """MT_ControlNET_AddMakeUp parity: learn source→makeup directly
    (target = makeup image, hint = non-makeup source)."""

    def __init__(self, root: str, img_size: int = 256, seed: int = 0):
        self.inner = MTDataset(root, img_size, keep_order=True, seed=seed)
        self.rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.inner)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        name_s = self.inner.non_makeup_names[self.rng.randint(len(self.inner.non_makeup_names))]
        name_r = self.inner.makeup_names[self.rng.randint(len(self.inner.makeup_names))]
        item = self.inner.make_item(name_s, name_r, swap=False)
        return dict(jpg=item["makeup_img"], hint=item["src_img"],
                    txt="makeup style transfer")


def TeacherDataset(root: str, img_size: int = 256, seed: int = 0) -> MTDataset:
    """Teacher_Dataset capability: scgan-seg pair sampling; its 3-way identity
    triplets live in the loss (Teacher_IDT parity is composite_loss's idt terms)."""
    return MTDataset(root, img_size, keep_order=False, seed=seed)
