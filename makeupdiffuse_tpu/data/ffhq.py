"""FFHQ-256 LMDB reader + reconstruction-finetune batches.

Capability parity: /root/reference/diffdata/finetune_datasets.py —
LMDBDataset/FFHQ256 (:9-58): lmdb 'ffhq256x256' with keys '256-%06d', random
horizontal flip, normalize to [-1,1], batches of
{jpg: image, txt: 'reconstruct', ref_img: zeros, src_img: (img+1)/2}. The lmdb
import is gated (not baked into this image) — a directory-of-images fallback covers
the same capability.
"""
from __future__ import annotations

import glob
import io
import os
from typing import Dict

import numpy as np
from PIL import Image

PROMPT = "reconstruct"


def _to_item(img: np.ndarray) -> Dict[str, np.ndarray]:
    """[-1,1] image → FFHQ256.__getitem__ dict (finetune_datasets.py:51-58)."""
    return dict(
        jpg=img.astype(np.float32),
        txt=PROMPT,
        ref_img=np.zeros_like(img, dtype=np.float32),
        src_img=((img + 1.0) / 2.0).astype(np.float32),
    )


class FFHQImageFolder:
    """Directory-of-images fallback with the same item contract."""

    def __init__(self, root: str, resolution: int = 256, flip: bool = True, seed: int = 0):
        self.files = sorted(
            glob.glob(os.path.join(root, "**", "*.png"), recursive=True)
            + glob.glob(os.path.join(root, "**", "*.jpg"), recursive=True)
        )
        if not self.files:
            raise IOError(f"no images under {root}")
        self.resolution = resolution
        self.flip = flip
        self.rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        img = Image.open(self.files[index]).convert("RGB").resize(
            (self.resolution, self.resolution), Image.BILINEAR
        )
        arr = np.asarray(img, np.float32) / 127.5 - 1.0
        if self.flip and self.rng.rand() < 0.5:
            arr = arr[:, ::-1].copy()
        return _to_item(arr)


class FFHQ256LMDB:
    """LMDB-backed reader (requires the optional lmdb package)."""

    def __init__(self, path: str, resolution: int = 256, flip: bool = True, seed: int = 0):
        try:
            import lmdb
        except ImportError as e:  # pragma: no cover - env without lmdb
            raise ImportError(
                "lmdb is not installed in this image; use FFHQImageFolder instead"
            ) from e
        self.env = lmdb.open(path, max_readers=32, readonly=True, lock=False,
                             readahead=False, meminit=False)
        with self.env.begin(write=False) as txn:
            self.length = int(txn.get(b"length").decode("utf-8"))
        self.resolution = resolution
        self.flip = flip
        self.rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        with self.env.begin(write=False) as txn:
            key = f"{self.resolution}-{str(index).zfill(6)}".encode("utf-8")
            img_bytes = txn.get(key)
        img = Image.open(io.BytesIO(img_bytes)).convert("RGB")
        arr = np.asarray(img, np.float32) / 127.5 - 1.0
        if self.flip and self.rng.rand() < 0.5:
            arr = arr[:, ::-1].copy()
        return _to_item(arr)


def ffhq_finetune_batch(items) -> Dict[str, np.ndarray]:
    """Collate + map to the reconstruction-finetune loss contract: the target IS the
    real image (FinetuneModelFFHQ.get_target,
    /root/reference/diffmk/makeup_ffhq_finetune.py:17-20)."""
    jpg = np.stack([it["jpg"] for it in items])
    src = np.stack([it["src_img"] for it in items])
    ref = np.stack([it["ref_img"] for it in items])
    return dict(target=jpg, src_img=src, ref_img=ref, txt=[it["txt"] for it in items])
