"""MT-Dataset pipeline: pair sampling, 3-way direction randomization, batching.

Capability parity: the production train set ``Ele_PGT_Dataset``
(/root/reference/diffdata/datasets.py:591-665) and the fixed/random test sets
``TestFixed_Dataset``/``TestRandom_Dataset`` (:669-784):
  * directory layout: root/{images,segs,scgan_segs,lms}/{makeup,non-makeup}/*,
    name lists makeup.txt / non-makeup.txt, pair list test_0412.txt (env-var-free:
    root is an explicit argument, replacing $DATAROOT, datasets.py:98)
  * item keys: source/reference tuples (image, mask_full, diff, lms),
    {non,}makeup_img [-1,1], {non,}makeup_seg int labels, src_img/ref_img [0,1],
    txt prompt "makeup transfer" (:640-664)
  * 3-way direction randomization: p=1/3 swap source/reference roles (:636-639 —
    data_type>1 swaps; the Teacher_IDT curriculum's identity pairs are built in the
    loss, not here, matching the production model)

Pure numpy/PIL host code + a simple prefetching batcher (the reference uses torch
DataLoader(num_workers=2), runs/train.py:32).
"""
from __future__ import annotations

import os
import threading
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from .preprocess import diff_field, load_image, load_lms, load_seg, mask_channels, load_mask

PROMPT = "makeup transfer"


class MTDataset:
    """Random (non-makeup, makeup) pair sampler with direction randomization."""

    def __init__(self, root: str, img_size: int = 256, keep_order: bool = False,
                 seed: int = 0):
        self.root = root
        self.img_size = img_size
        self.keep_order = keep_order
        self.seed = seed
        with open(os.path.join(root, "makeup.txt")) as f:
            self.makeup_names = [l.strip() for l in f if l.strip()]
        with open(os.path.join(root, "non-makeup.txt")) as f:
            self.non_makeup_names = [l.strip() for l in f if l.strip()]

    def __len__(self) -> int:
        if self.keep_order:
            return max(len(self.makeup_names), len(self.non_makeup_names))
        return len(self.makeup_names) + len(self.non_makeup_names)

    def load_entry(self, name: str):
        base = os.path.splitext(name)[0]
        image = load_image(os.path.join(self.root, "images", name), self.img_size)
        mask = load_mask(os.path.join(self.root, "segs", name), self.img_size)
        lms = load_lms(os.path.join(self.root, "lms", f"{base}.npy"))
        seg = load_seg(os.path.join(self.root, "scgan_segs", name), self.img_size)
        return dict(
            image=image,
            mask_full=mask_channels(mask),
            diff=diff_field(lms, self.img_size),
            lms=lms.astype(np.float32),
            seg=seg,
        )

    def make_item(self, name_s: str, name_r: str, swap: bool) -> Dict[str, np.ndarray]:
        src = self.load_entry(name_s)
        ref = self.load_entry(name_r)
        if swap:
            src, ref = ref, src
        return dict(
            # source / reference tuples (EleGANt convention)
            image_s=src["image"], mask_s_full=src["mask_full"],
            diff_s=src["diff"], lms_s=src["lms"],
            image_r=ref["image"], mask_r_full=ref["mask_full"],
            diff_r=ref["diff"], lms_r=ref["lms"],
            # model-facing keys
            nonmakeup_img=src["image"].astype(np.float32),
            nonmakeup_seg=src["seg"],
            src_img=((src["image"] + 1) / 2).astype(np.float32),
            makeup_img=ref["image"].astype(np.float32),
            makeup_seg=ref["seg"],
            ref_img=((ref["image"] + 1) / 2).astype(np.float32),
        )

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        # index-driven RNG: (seed, index) fully determines the item, so worker
        # threads never share mutable state and the same seed reproduces the same
        # sequence regardless of thread scheduling
        rng = np.random.RandomState((self.seed * 1_000_003 + index) % (2**31 - 1))
        idx_s = rng.randint(len(self.non_makeup_names))
        idx_r = rng.randint(len(self.makeup_names))
        swap = (not self.keep_order) and rng.randint(3) > 1  # p = 1/3
        item = self.make_item(self.non_makeup_names[idx_s], self.makeup_names[idx_r], swap)
        item["txt"] = PROMPT
        return item


class TestFixedDataset:
    """Deterministic pair list (test_0412.txt: 'non-makeup-name makeup-name' per
    line, datasets.py:728-784)."""

    def __init__(self, root: str, img_size: int = 256, test_name: str = "test_0412.txt"):
        self.inner = MTDataset(root, img_size, keep_order=True)
        pairs = []
        with open(os.path.join(root, test_name)) as f:
            for line in f:
                if line.strip():
                    s, r = line.strip().split(" ")[:2]
                    pairs.append((s, r))
        self.pairs = pairs

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        name_s, name_r = self.pairs[index]
        item = self.inner.make_item(name_s, name_r, swap=False)
        item["txt"] = PROMPT
        b_s = os.path.splitext(os.path.basename(name_s))[0]
        b_r = os.path.splitext(os.path.basename(name_r))[0]
        item["img_name"] = f"{b_s}&{b_r}"
        return item


def collate(items: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k in items[0]:
        v0 = items[0][k]
        if isinstance(v0, str):
            out[k] = [it[k] for it in items]  # prompts / names stay as lists
        else:
            out[k] = np.stack([it[k] for it in items])
    return out


def data_loader(
    dataset,
    batch_size: int,
    num_steps: Optional[int] = None,
    num_workers: int = 2,
    seed: int = 0,
    prefetch: int = 4,
) -> Iterator[Dict[str, np.ndarray]]:
    """Threaded prefetching batcher (DataLoader(num_workers=2) stand-in).

    Deterministic and thread-safe: batch index lists come from `seed`, items are
    index-driven (see MTDataset.__getitem__), and batches are yielded in batch
    order regardless of which worker finished first — same seed ⇒ identical batch
    sequence at any worker count."""
    rng = np.random.RandomState(seed)
    n = len(dataset)
    total = num_steps if num_steps is not None else max(n // batch_size, 1)

    idx_batches = [
        rng.randint(0, n, size=batch_size).tolist() for _ in range(total)
    ]

    results: Dict[int, Dict[str, np.ndarray]] = {}
    cond = threading.Condition()
    budget = threading.Semaphore(max(prefetch, num_workers))

    def worker(start: int):
        for bi in range(start, total, num_workers):
            budget.acquire()
            batch = collate([dataset[i] for i in idx_batches[bi]])
            with cond:
                results[bi] = batch
                cond.notify_all()

    threads = [threading.Thread(target=worker, args=(w,), daemon=True)
               for w in range(num_workers)]
    for t in threads:
        t.start()
    for bi in range(total):
        with cond:
            while bi not in results:
                cond.wait()
            batch = results.pop(bi)
        budget.release()
        yield batch
