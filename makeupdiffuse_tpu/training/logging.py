"""Metrics + image logging — TensorBoard/ImageLogger parity without torch.

Capability parity (SURVEY.md §6): TensorBoardLogger scalars
(/root/reference/runs/train.py:48; per-loss dict makeup_diffuse.py:115-149) become a
JSONL metrics stream (+ optional tensorboardX if present); MakeupImageLogger's
every-200-batches grids (/root/reference/diffmk/logger.py:4-11) and the test-time
save_local PNG grids + pair manifest (/root/reference/diffmk/diffusion_makeup.py:
394-411) are reproduced with PIL.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Sequence

import numpy as np
from PIL import Image


class MetricsLogger:
    """Append-only JSONL scalar stream: {"step": n, "wall": t, **scalars}."""

    def __init__(self, log_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self._f = open(self.path, "a")

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": int(step), "wall": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


def to_uint8(img: np.ndarray, rescale: bool = True) -> np.ndarray:
    """[-1,1] (or [0,1]) float image → uint8 (save_local :402-407)."""
    x = np.asarray(img, dtype=np.float32)
    if rescale:
        x = (x + 1.0) / 2.0
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


def make_grid(images: np.ndarray, nrow: int = 4, pad: int = 2) -> np.ndarray:
    """[N,H,W,3] uint8 → single grid image (torchvision.make_grid stand-in)."""
    n, h, w, c = images.shape
    ncol = nrow
    nr = (n + ncol - 1) // ncol
    grid = np.zeros((nr * (h + pad) + pad, ncol * (w + pad) + pad, c), np.uint8)
    for i in range(n):
        r, col = divmod(i, ncol)
        y0 = pad + r * (h + pad)
        x0 = pad + col * (w + pad)
        grid[y0:y0 + h, x0:x0 + w] = images[i]
    return grid


def log_txt_as_img(shape, texts, size: int = 16) -> np.ndarray:
    """Render prompts onto image tiles — ldm's log_txt_as_img capability (the
    'conditioning' artifact, diffusion_makeup.py:427). Returns [N,H,W,3] in [-1,1]."""
    from PIL import ImageDraw

    h, w = shape
    out = []
    for text in texts:
        img = Image.new("RGB", (w, h), "white")
        draw = ImageDraw.Draw(img)
        # wrap to ~w/(size/2) chars per line
        n = max(int(w / (size * 0.6)), 8)
        lines = "\n".join(text[i:i + n] for i in range(0, len(text), n))
        draw.text((4, 4), lines, fill="black")
        out.append(np.asarray(img, np.float32) / 127.5 - 1.0)
    return np.stack(out)


class ImageLogger:
    """Dump artifact grids every `every_steps` train steps (MakeupImageLogger
    parity: batch_frequency=200, runs/train.py:19,49)."""

    def __init__(self, log_dir: str, every_steps: int = 200, max_images: int = 4):
        self.dir = os.path.join(log_dir, "images")
        os.makedirs(self.dir, exist_ok=True)
        self.every_steps = every_steps
        self.max_images = max_images

    def should_log(self, step: int) -> bool:
        return self.every_steps > 0 and step % self.every_steps == 0

    def log_images(self, step: int, images: Dict[str, np.ndarray], rescale: bool = True) -> None:
        for k, v in images.items():
            arr = to_uint8(np.asarray(v)[: self.max_images], rescale)
            grid = make_grid(arr, nrow=min(len(arr), 4))
            Image.fromarray(grid).save(
                os.path.join(self.dir, f"{k}_gs-{step:06}.png")
            )

    def log_row_grid(self, step: int, key: str, tiles: np.ndarray, row_len: int,
                     rescale: bool = True) -> None:
        """Progressive strips ([B·K,H,W,3] row-major tiles, K columns per image):
        the diffusion_row / denoise_row grids of the reference's log_images
        (/root/reference/diffmk/makeup_controlnet.py:55-84)."""
        tiles = np.asarray(tiles)[: self.max_images * row_len]
        grid = make_grid(to_uint8(tiles, rescale), nrow=row_len)
        Image.fromarray(grid).save(os.path.join(self.dir, f"{key}_gs-{step:06}.png"))


class TestArtifactWriter:
    """save_local + pair-manifest parity (diffusion_makeup.py:379-411): per test
    batch, one PNG grid per artifact key and a 'test_pairs.txt' manifest."""

    def __init__(self, saved_dir: str, model_name: str):
        self.root = os.path.join(saved_dir, model_name)
        os.makedirs(self.root, exist_ok=True)
        self.pairs: List[Sequence[str]] = []

    def add_pairs(self, batch_idx: int, img_names: Sequence[str]) -> None:
        for i, name in enumerate(img_names):
            s, r = name.split("&")
            self.pairs.append(
                (f"{batch_idx:04d}-{i + 1}", f"non-makeup/{s}.png", f"makeup/{r}.png")
            )

    def save_batch(self, batch_idx: int, images: Dict[str, np.ndarray]) -> None:
        nrow = len(images)
        for k, v in images.items():
            arr = to_uint8(np.asarray(v))
            grid = make_grid(arr, nrow=nrow)
            Image.fromarray(grid).save(
                os.path.join(self.root, f"{k}_{batch_idx:04}.png")
            )

    def write_manifest(self, filename: str = "test_pairs.txt") -> str:
        path = os.path.join(self.root, filename)
        with open(path, "w") as f:
            for p in self.pairs:
                f.write("%s %s %s\n" % tuple(p))
        return path
