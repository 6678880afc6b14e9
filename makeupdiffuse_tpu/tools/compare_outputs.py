"""Output-parity harness: PSNR / SSIM between two image sets.

Supports the BASELINE.md fidelity target (≥40 dB PSNR vs the torch reference's
outputs): point it at a directory of reference PNGs and a directory of this
framework's PNGs (matching filenames), or call the array APIs directly from tests.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
from typing import Dict

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    k = np.outer(g, g)
    return k / k.sum()


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Single-scale SSIM (Wang et al.) with 11×11 Gaussian window, per-channel mean."""
    from scipy.signal import convolve2d  # scipy ships with the image

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a = a[..., None]
        b = b[..., None]
    k = _gaussian_kernel()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    vals = []
    for ch in range(a.shape[-1]):
        x, y = a[..., ch], b[..., ch]
        mu_x = convolve2d(x, k, mode="valid")
        mu_y = convolve2d(y, k, mode="valid")
        xx = convolve2d(x * x, k, mode="valid") - mu_x**2
        yy = convolve2d(y * y, k, mode="valid") - mu_y**2
        xy = convolve2d(x * y, k, mode="valid") - mu_x * mu_y
        s = ((2 * mu_x * mu_y + c1) * (2 * xy + c2)) / (
            (mu_x**2 + mu_y**2 + c1) * (xx + yy + c2)
        )
        vals.append(s.mean())
    return float(np.mean(vals))


def compare_dirs(ref_dir: str, out_dir: str, pattern: str = "*.png") -> Dict[str, float]:
    from PIL import Image

    refs = sorted(glob.glob(os.path.join(ref_dir, pattern)))
    assert refs, f"no {pattern} under {ref_dir}"
    psnrs, ssims, n = [], [], 0
    for rp in refs:
        op = os.path.join(out_dir, os.path.basename(rp))
        if not os.path.exists(op):
            continue
        a = np.asarray(Image.open(rp).convert("RGB"), np.float32) / 255.0
        b = np.asarray(Image.open(op).convert("RGB"), np.float32) / 255.0
        if a.shape != b.shape:
            continue
        psnrs.append(psnr(a, b))
        ssims.append(ssim(a, b))
        n += 1
    return {
        "pairs": n,
        "psnr_mean": float(np.mean(psnrs)) if psnrs else float("nan"),
        "psnr_min": float(np.min(psnrs)) if psnrs else float("nan"),
        "ssim_mean": float(np.mean(ssims)) if ssims else float("nan"),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ref_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--pattern", default="*.png")
    args = ap.parse_args()
    print(json.dumps(compare_dirs(args.ref_dir, args.out_dir, args.pattern)))


if __name__ == "__main__":
    main()
