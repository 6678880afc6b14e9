"""Dataset-zoo tests over the fake MT root fixture."""
import os

import numpy as np
import pytest
from PIL import Image

from makeupdiffuse_tpu.data.dataset_zoo import (
    AddMakeupDataset,
    DoubleControlPGTDataset,
    GrayColorizationDataset,
    InversionPairDataset,
    TeacherDataset,
    TestRandomDataset,
)
from tests.test_data import fake_mt_root  # fixture reuse


def test_test_random_dataset(fake_mt_root):
    ds = TestRandomDataset(fake_mt_root, img_size=64)
    it = ds[0]
    assert "img_name" in it and "&" in it["img_name"]
    assert it["src_img"].shape == (64, 64, 3)


def test_gray_colorization(fake_mt_root):
    ds = GrayColorizationDataset(fake_mt_root, img_size=64)
    assert len(ds) == 4
    it = ds[0]
    assert it["jpg"].shape == (64, 64, 3) and it["hint"].shape == (64, 64, 3)
    # the target's non-kept regions are grayscale: R==G==B there
    tgt01 = (it["jpg"] + 1) / 2
    from makeupdiffuse_tpu.data.preprocess import load_seg
    seg = load_seg(os.path.join(fake_mt_root, "segs", it["path"]), 64)
    gray_region = ~np.isin(seg, (0, 10, 13))
    rg = np.abs(tgt01[..., 0] - tgt01[..., 1])[gray_region]
    assert rg.max() < 1e-5
    assert it["txt"] == "makeup style transfer"


def test_inversion_pair_dataset(fake_mt_root):
    # fabricate inversion latents for every image name
    inv_dir = os.path.join(fake_mt_root, "inv_100_40")
    os.makedirs(inv_dir, exist_ok=True)
    for sub in ("makeup", "non-makeup"):
        with open(os.path.join(fake_mt_root, f"{'makeup' if sub=='makeup' else 'non-makeup'}.txt")) as f:
            for name in f:
                name = name.strip()
                if not name:
                    continue
                z = np.random.RandomState(0).normal(size=(8, 8, 4)).astype(np.float32)
                np.savez(os.path.join(inv_dir, f"{os.path.basename(name)}.npz"), inv=z, gen=z)
    ds = InversionPairDataset(fake_mt_root, img_size=64, t0=100, inv_steps=40)
    it = ds[0]
    assert it["src_inv"].shape == (8, 8, 4)
    assert it["src_img"].shape == (64, 64, 3)
    assert it["src_msk"].dtype == np.int32
    ds4 = InversionPairDataset(fake_mt_root, img_size=64, with_pgt=True)
    it4 = ds4[0]
    assert "mask_s_full" in it4 and it4["mask_s_full"].shape == (64, 64, 4)


def test_double_control_pgt_dataset(fake_mt_root):
    pgt_dir = os.path.join(fake_mt_root, "pgt")
    os.makedirs(pgt_dir, exist_ok=True)
    # one pgt image per (c,a)/(c,b)/(d,a)/(d,b) combination
    for s in ("c", "d"):
        for r in ("a", "b"):
            arr = np.random.RandomState(1).randint(0, 255, (64, 64, 3)).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(pgt_dir, f"{s}&{r}.png"))
    ds = DoubleControlPGTDataset(fake_mt_root, img_size=64)
    it = ds[0]
    assert it["jpg"].shape == (64, 64, 3)
    assert it["src_img"].shape == (64, 64, 3) and it["ref_img"].shape == (64, 64, 3)


def test_add_makeup_dataset(fake_mt_root):
    ds = AddMakeupDataset(fake_mt_root, img_size=64)
    it = ds[0]
    assert it["jpg"].shape == (64, 64, 3)
    assert it["hint"].shape == (64, 64, 3)
    assert it["hint"].min() >= 0  # hint in [0,1]


def test_teacher_dataset_alias(fake_mt_root):
    ds = TeacherDataset(fake_mt_root, img_size=64)
    assert len(ds) == 4
    assert "nonmakeup_seg" in ds[0]
