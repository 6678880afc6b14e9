"""Data-layer tests: preprocessing math vs the reference's numpy semantics, dataset
item contract, synthetic fixtures, loader batching."""
import os

import numpy as np
import pytest
from PIL import Image

from makeupdiffuse_tpu.data.mt_dataset import MTDataset, TestFixedDataset, collate, data_loader
from makeupdiffuse_tpu.data.preprocess import (
    diff_field,
    fix_lip_landmarks,
    load_image,
    load_mask,
    mask_channels,
)
from makeupdiffuse_tpu.data.synthetic import FillCirclesDataset, synthetic_face_batch


def test_diff_field_semantics():
    """diff[y, x, k] = y − lms[k,0]; diff[y, x, K+k] = x − lms[k,1]
    (preprocessing.py:109-120 with fix = [ys…, xs…])."""
    lms = np.array([[3, 5], [10, 20]], dtype=np.int32)
    d = diff_field(lms, img_size=32)
    assert d.shape == (32, 32, 4)
    np.testing.assert_allclose(d[7, 9, 0], 7 - 3)
    np.testing.assert_allclose(d[7, 9, 1], 7 - 10)
    np.testing.assert_allclose(d[7, 9, 2], 9 - 5)
    np.testing.assert_allclose(d[7, 9, 3], 9 - 20)


def test_fix_lip_landmarks():
    lms = np.zeros((68, 2), np.int32) + 100
    out = fix_lip_landmarks(lms)
    # 61:64 x -= 1 then collision check with 67:64 (+1 already applied to 65:68)
    assert out[61, 0] == 99 and out[67, 0] == 101
    assert not np.any([np.abs(out[61 + i] - out[67 - i]).sum() == 0 for i in range(3)])


def test_mask_channels_palette():
    mask = np.array([[7, 9, 1], [6, 2, 3], [4, 5, 0]], np.int32)
    m = mask_channels(mask)
    np.testing.assert_array_equal(m[..., 0], [[1, 1, 0], [0, 0, 0], [0, 0, 0]])
    np.testing.assert_array_equal(m[..., 1], [[0, 0, 1], [1, 1, 1], [0, 0, 0]])


@pytest.fixture()
def fake_mt_root(tmp_path):
    """Miniature MT-Dataset on disk: 2 makeup + 2 non-makeup images w/ segs + lms."""
    root = tmp_path / "MT-Dataset"
    for sub in ("images/makeup", "images/non-makeup", "segs/makeup", "segs/non-makeup",
                "scgan_segs/makeup", "scgan_segs/non-makeup", "lms/makeup", "lms/non-makeup"):
        os.makedirs(root / sub)
    rng = np.random.RandomState(0)
    names = {"makeup": ["makeup/a.png", "makeup/b.png"],
             "non-makeup": ["non-makeup/c.png", "non-makeup/d.png"]}
    for kind, lst in names.items():
        for name in lst:
            img = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
            Image.fromarray(img).save(root / "images" / name)
            seg = rng.randint(0, 14, (64, 64)).astype(np.uint8)
            Image.fromarray(seg, mode="L").save(root / "segs" / name)
            Image.fromarray(seg, mode="L").save(root / "scgan_segs" / name)
            lms = rng.randint(0, 63, (68, 2)).astype(np.int32)
            np.save(root / "lms" / (os.path.splitext(name)[0] + ".npy"), lms)
    with open(root / "makeup.txt", "w") as f:
        f.write("\n".join(names["makeup"]))
    with open(root / "non-makeup.txt", "w") as f:
        f.write("\n".join(names["non-makeup"]))
    with open(root / "test_0412.txt", "w") as f:
        f.write("non-makeup/c.png makeup/a.png\nnon-makeup/d.png makeup/b.png\n")
    return str(root)


def test_mt_dataset_item_contract(fake_mt_root):
    ds = MTDataset(fake_mt_root, img_size=64, seed=1)
    assert len(ds) == 4
    item = ds[0]
    assert item["nonmakeup_img"].shape == (64, 64, 3)
    assert item["mask_s_full"].shape == (64, 64, 4)
    assert item["diff_s"].shape == (64, 64, 136)
    assert item["lms_s"].shape == (68, 2)
    assert item["nonmakeup_seg"].dtype == np.int32
    # ranges: *_img [-1,1]; src_img/ref_img [0,1] (datasets.py:640-664)
    assert item["nonmakeup_img"].min() >= -1 and item["nonmakeup_img"].max() <= 1
    assert item["src_img"].min() >= 0 and item["src_img"].max() <= 1
    np.testing.assert_allclose(item["src_img"], (item["nonmakeup_img"] + 1) / 2, atol=1e-6)
    assert item["txt"] == "makeup transfer"


def test_direction_randomization(fake_mt_root):
    """The swap draw matches the reference's p=1/3 (randint(0,3) > 1)."""
    rng = np.random.RandomState(3)
    draws = [rng.randint(3) > 1 for _ in range(300)]
    frac = np.mean(draws)
    assert 0.2 < frac < 0.45  # ≈ 1/3
    # keep_order=True never swaps and len == max(lists) (datasets.py:616-619)
    ds = MTDataset(fake_mt_root, img_size=64, keep_order=True)
    assert len(ds) == 2


def test_fixed_dataset_and_collate(fake_mt_root):
    ds = TestFixedDataset(fake_mt_root, img_size=64)
    assert len(ds) == 2
    it = ds[0]
    assert it["img_name"] == "c&a"
    batch = collate([ds[0], ds[1]])
    assert batch["src_img"].shape == (2, 64, 64, 3)
    assert batch["img_name"] == ["c&a", "d&b"]


def test_data_loader_batches(fake_mt_root):
    ds = MTDataset(fake_mt_root, img_size=64)
    batches = list(data_loader(ds, batch_size=2, num_steps=3, num_workers=2))
    assert len(batches) == 3
    for b in batches:
        assert b["src_img"].shape == (2, 64, 64, 3)


def test_data_loader_deterministic_across_workers(fake_mt_root):
    """Same seed ⇒ identical batch sequence, independent of worker count and
    thread scheduling (VERDICT r1 item 7)."""
    ds = MTDataset(fake_mt_root, img_size=64, seed=5)
    runs = []
    for workers in (1, 2, 2):
        bs = list(data_loader(ds, batch_size=2, num_steps=4, num_workers=workers,
                              seed=9))
        runs.append(bs)
    for other in runs[1:]:
        for a, b in zip(runs[0], other):
            for k in a:
                if isinstance(a[k], list):
                    assert a[k] == b[k], k
                else:
                    np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # a different loader seed changes the sequence
    diff = list(data_loader(ds, batch_size=2, num_steps=4, num_workers=2, seed=10))
    assert any(not np.array_equal(runs[0][i]["src_img"], diff[i]["src_img"])
               for i in range(4))


def test_mt_dataset_index_driven_items(fake_mt_root):
    """__getitem__ is a pure function of (dataset seed, index): repeated reads of
    the same index agree; different indices draw independently."""
    ds = MTDataset(fake_mt_root, img_size=64, seed=2)
    a1, a2 = ds[7], ds[7]
    for k in a1:
        if not isinstance(a1[k], str):
            np.testing.assert_array_equal(a1[k], a2[k], err_msg=k)
    many = [ds[i]["src_img"] for i in range(8)]
    assert any(not np.array_equal(many[0], m) for m in many[1:])


def test_fill_circles():
    ds = FillCirclesDataset(size=64, length=10)
    it = ds[3]
    assert it["jpg"].shape == (64, 64, 3) and it["hint"].shape == (64, 64, 3)
    assert it["jpg"].min() >= -1 and it["jpg"].max() <= 1
    assert it["hint"].min() >= 0 and it["hint"].max() <= 1
    assert it["hint"].sum() > 0  # outline present
    # deterministic per index
    np.testing.assert_array_equal(ds[3]["jpg"], it["jpg"])


def test_synthetic_face_batch_contract():
    b = synthetic_face_batch(2, 64, context_dim=32, max_length=16, seed=0)
    keys = {"src_img", "ref_img", "nonmakeup_img", "makeup_img", "nonmakeup_seg",
            "mask_s_full", "mask_r_full", "pgt_sr", "makeup_pgt", "context"}
    assert keys <= set(b)
    assert b["src_img"].shape == (2, 64, 64, 3)
    assert b["context"].shape == (2, 16, 32)
    assert b["mask_s_full"].shape == (2, 64, 64, 4)


def test_crop_face_geometry():
    from makeupdiffuse_tpu.data.preprocess import crop_face
    img = np.zeros((200, 300, 3), np.uint8)
    crop, box = crop_face(img, (100, 80, 160, 140))  # 60x60 face
    # expansions: width 0.235*60≈14, up 0.705*60≈42, down 0.235*60≈14
    h, w = crop.shape[:2]
    assert 80 < w < 100 and 110 < h < 125
    l, t, r, b = box
    assert 0 <= l < r and 0 <= t < b  # face box inside crop
    # clipping at borders
    crop2, _ = crop_face(img, (0, 0, 50, 50))
    assert crop2.shape[0] > 0 and crop2.shape[1] > 0


def test_face_pipeline_with_stubs():
    from makeupdiffuse_tpu.data.preprocess import FacePipeline
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (128, 128, 3), dtype=np.uint8).astype(np.uint8)

    class StubParser:
        def parse(self, big):
            return np.ones(big.shape[:2], np.int32)  # all face

    lms = rng.randint(0, 63, (68, 2)).astype(np.int32)
    pipe = FacePipeline(face_parser=StubParser(), img_size=64)
    out = pipe(img, face_box=(20, 20, 100, 100), lms=lms)
    assert out is not None
    image, mask_full, diff, lms_out = out
    assert image.shape == (64, 64, 3) and -1 <= image.min() and image.max() <= 1
    assert mask_full.shape == (64, 64, 4)
    assert mask_full[..., 1].sum() == 64 * 64  # all-face parser → face channel full
    assert diff.shape == (64, 64, 136)
    # no detector + no box → None
    assert FacePipeline(img_size=64)(img) is None
