"""Native host library tests: builds from source, matches the numpy fallbacks."""
import numpy as np
import pytest

from makeupdiffuse_tpu.utils import native


def test_native_builds_and_loads():
    assert native.native_available(), "native/libmdt_host.so should build via build.sh"


def test_resize_normalize_matches_range():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (37, 53, 3), np.uint8)
    out = native.resize_normalize(img, 32)
    assert out.shape == (32, 32, 3) and out.dtype == np.float32
    assert out.min() >= -1.0001 and out.max() <= 1.0001
    # identity-size resize reproduces the affine map exactly
    sq = rng.randint(0, 256, (16, 16, 3), np.uint8)
    out2 = native.resize_normalize(sq, 16)
    np.testing.assert_allclose(out2, sq.astype(np.float32) / 127.5 - 1.0, atol=1e-5)


def test_resize_labels_nearest_preserves_classes():
    rng = np.random.RandomState(1)
    labels = rng.randint(0, 14, (64, 64), np.uint8)
    out = native.resize_labels(labels, 32)
    assert out.shape == (32, 32) and out.dtype == np.int32
    assert set(np.unique(out)) <= set(np.unique(labels))
    # identity size = exact passthrough
    np.testing.assert_array_equal(native.resize_labels(labels, 64), labels)


def test_masked_cdf_matches_numpy():
    rng = np.random.RandomState(2)
    img = rng.uniform(0, 255, (500, 3)).astype(np.float32)
    mask = (rng.uniform(size=500) > 0.5).astype(np.float32)
    got = native.masked_cdf(img, mask)
    # numpy oracle
    idx = np.clip(img, 0, 255).astype(int)
    for ch in range(3):
        hist = np.bincount(idx[:, ch], weights=mask, minlength=256)[:256]
        expect = np.cumsum(hist / hist.sum())
        np.testing.assert_allclose(got[ch], expect, atol=1e-5)


def test_class_masks_matches_numpy():
    rng = np.random.RandomState(3)
    labels = rng.randint(0, 14, (32, 32)).astype(np.int32)
    groups = [(9, 13), (4, 8, 10), (6, 1)]
    got = native.class_masks(labels, groups)
    assert got.shape == (32, 32, 3)
    for i, g in enumerate(groups):
        np.testing.assert_array_equal(got[..., i], np.isin(labels, list(g)).astype(np.float32))


def test_batch_executor_matches_sequential():
    """The C++ worker-pool batch assembler == per-image ops, varied sizes."""
    ex = native.BatchExecutor(n_threads=4)
    rng = np.random.RandomState(4)
    imgs = [rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            for h, w in [(300, 200), (256, 256), (128, 400), (64, 64)]]
    batch = ex.resize_normalize(imgs, 96)
    seq = np.stack([native.resize_normalize(im, 96) for im in imgs])
    assert batch.shape == (4, 96, 96, 3)
    np.testing.assert_array_equal(batch, seq)

    labs = [rng.randint(0, 14, (h, w)).astype(np.uint8)
            for h, w in [(300, 200), (512, 512)]]
    lb = ex.resize_labels(labs, 96)
    ls = np.stack([native.resize_labels(lm, 96) for lm in labs])
    np.testing.assert_array_equal(lb, ls)


def test_batch_executor_fallback(monkeypatch):
    """Without the .so the executor degrades to the sequential numpy path."""
    ex = native.BatchExecutor.__new__(native.BatchExecutor)
    ex._lib = None
    ex._pool = None
    ex.n_threads = 1
    rng = np.random.RandomState(5)
    imgs = [rng.randint(0, 256, (100, 80, 3), dtype=np.uint8) for _ in range(2)]
    out = ex.resize_normalize(imgs, 32)
    assert out.shape == (2, 32, 32, 3)
    np.testing.assert_array_equal(
        out, np.stack([native.resize_normalize(im, 32) for im in imgs]))


def test_load_image_batch(tmp_path):
    from PIL import Image as PILImage
    from makeupdiffuse_tpu.data.preprocess import load_image, load_image_batch
    rng = np.random.RandomState(6)
    paths = []
    for i, (h, w) in enumerate([(300, 200), (256, 256)]):
        p = tmp_path / f"im{i}.png"
        PILImage.fromarray(rng.randint(0, 256, (h, w, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    batch = load_image_batch(paths, 64)
    seq = np.stack([load_image(p, 64) for p in paths])
    np.testing.assert_array_equal(batch, seq)
