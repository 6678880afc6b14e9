"""Histogram-matching and mask-op goldens vs a direct numpy re-derivation of the
reference's algorithms (histogram_matching.py, teacher.py rebound_box,
preprocessing.py mask_process)."""
import jax
import jax.numpy as jnp
import numpy as np

from makeupdiffuse_tpu.ops.histogram import (
    histogram_matching,
    masked_cdf,
    masked_histogram_match,
    transfer_table,
)
from makeupdiffuse_tpu.ops.masks import (
    background_mask,
    expand_area,
    fix_background,
    preprocess_mask_channels,
    rebound_box,
    scgan_component_masks,
)


# ---- numpy oracle re-deriving the reference's cal_hist/cal_trans ------------------

def np_cal_cdf(vals):
    hist, _ = np.histogram(np.clip(vals, 0, 255).astype(int), bins=256, range=(0, 256))
    s = hist.sum()
    if s == 0:
        return np.zeros(256)
    return np.cumsum(hist / s)


def np_cal_trans(dst_cdf, ref_cdf):
    table = list(range(256))
    for i in range(1, 256):
        for j in range(1, 256):
            if ref_cdf[j - 1] <= dst_cdf[i] <= ref_cdf[j]:
                table[i] = j
                break
    table[255] = 255
    return np.array(table)


def test_masked_cdf_against_numpy():
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 255, (32, 32)).astype(np.float32)
    mask = (rng.uniform(size=(32, 32)) > 0.5).astype(np.float32)
    got = np.asarray(masked_cdf(jnp.asarray(x), jnp.asarray(mask)))
    expect = np_cal_cdf(x[mask > 0])
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_transfer_table_against_reference_loop():
    rng = np.random.RandomState(1)
    d = rng.uniform(0, 255, 2000)
    r = rng.normal(128, 40, 3000)
    # compare at float32 — the on-device precision — so tie-breaks agree
    d_cdf = np_cal_cdf(d).astype(np.float32)
    r_cdf = np_cal_cdf(r).astype(np.float32)
    got = np.asarray(transfer_table(jnp.asarray(d_cdf), jnp.asarray(r_cdf)))
    expect = np_cal_trans(d_cdf, r_cdf)
    np.testing.assert_array_equal(got, expect)


def test_histogram_matching_moves_distribution():
    rng = np.random.RandomState(2)
    dst = rng.uniform(0, 80, (16, 16, 3)).astype(np.float32)  # dark
    ref = rng.uniform(170, 250, (16, 16, 3)).astype(np.float32)  # bright
    mask = np.ones((16, 16), np.float32)
    out = np.asarray(histogram_matching(jnp.asarray(dst), jnp.asarray(ref),
                                        jnp.asarray(mask), jnp.asarray(mask)))
    assert out.mean() > 150  # matched toward the bright reference
    # unmasked pixels pass through
    mask2 = np.zeros((16, 16), np.float32)
    out2 = np.asarray(histogram_matching(jnp.asarray(dst), jnp.asarray(ref),
                                         jnp.asarray(mask2), jnp.asarray(mask2)))
    np.testing.assert_allclose(out2, dst, atol=1e-5)


def test_histogram_matching_no_gradient_to_target():
    dst = jnp.ones((4, 4, 3)) * 100.0
    ref = jnp.ones((4, 4, 3)) * 200.0
    mask = jnp.ones((4, 4))
    g = jax.grad(lambda d: histogram_matching(d, ref, mask, mask).sum())(dst)
    np.testing.assert_allclose(np.asarray(g), 0.0)  # stop_gradient'ed


def test_masked_histogram_match_range():
    key = jax.random.PRNGKey(0)
    d = jax.random.uniform(key, (8, 8, 3)) * 2 - 1
    r = jax.random.uniform(jax.random.PRNGKey(1), (8, 8, 3)) * 2 - 1
    m = jnp.ones((8, 8))
    out = masked_histogram_match(d, r, m, m)
    assert float(out.min()) >= -1.01 and float(out.max()) <= 1.01


def test_expand_area_dilation():
    m = jnp.zeros((9, 9)).at[4, 4].set(1.0)
    out = np.asarray(expand_area(m, 2))
    assert out[2:7, 2:7].all() and out.sum() == 25
    np.testing.assert_array_equal(np.asarray(expand_area(m, 0)), np.asarray(m))


def test_background_mask_classes():
    seg = jnp.asarray([[0, 1], [11, 12]])
    np.testing.assert_array_equal(np.asarray(background_mask(seg)), [[1, 0], [1, 1]])


def test_preprocess_mask_channels():
    seg = jnp.asarray([[7, 9, 1], [6, 2, 3], [4, 5, 0]])
    m = np.asarray(preprocess_mask_channels(seg))
    assert m.shape == (3, 3, 4)
    np.testing.assert_array_equal(m[..., 0], [[1, 1, 0], [0, 0, 0], [0, 0, 0]])  # lip 7,9
    np.testing.assert_array_equal(m[..., 1], [[0, 0, 1], [1, 1, 1], [0, 0, 0]])  # face 1,6,2,3
    np.testing.assert_array_equal(m[..., 2], [[0, 0, 0], [0, 0, 0], [1, 0, 0]])  # eye_l 4
    np.testing.assert_array_equal(m[..., 3], [[0, 0, 0], [0, 0, 0], [0, 1, 0]])  # eye_r 5


def test_rebound_box():
    mask = jnp.zeros((20, 20)).at[8:10, 8:10].set(1.0)
    face = jnp.ones((20, 20))
    out = np.asarray(rebound_box(mask, face, margin=5))
    # inside the expanded box [3..14]² → face (1); outside → original (0)
    assert out[3:15, 3:15].all()
    assert out[0, 0] == 0 and out[16, 16] == 0


def test_scgan_component_masks():
    seg = jnp.asarray([[9, 13, 4], [8, 10, 6], [1, 0, 2]])
    m = np.asarray(scgan_component_masks(seg))
    np.testing.assert_array_equal(m[..., 0], [[1, 1, 0], [0, 0, 0], [0, 0, 0]])  # lip
    np.testing.assert_array_equal(m[..., 1], [[0, 0, 1], [1, 1, 0], [0, 0, 0]])  # skin
    np.testing.assert_array_equal(m[..., 2], [[0, 0, 0], [0, 0, 1], [1, 0, 0]])  # eyes


def test_fix_background_compose():
    b, h = 1, 4
    target = jnp.ones((b, h, h, 3)) * 0.5
    src = jnp.ones((b, h, h, 3)) * -0.5
    seg = jnp.zeros((b, h, h), jnp.int32).at[0, 0, 0].set(1)  # one face pixel
    out = np.asarray(fix_background(target, src, seg))
    np.testing.assert_allclose(out[0, 0, 0], 0.5, atol=1e-6)  # face: teacher kept
    np.testing.assert_allclose(out[0, 1, 1], -0.5, atol=1e-6)  # background: source
