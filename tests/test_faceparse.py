"""BiSeNet face-parser tests: shapes, palette remap, determinism."""
import jax
import jax.numpy as jnp
import numpy as np

from makeupdiffuse_tpu.data.faceparse import (
    CELEBA19_TO_FACE14,
    BiSeNet,
    FaceParser,
)


def test_remap_table_semantics():
    # skin→face(1), mouth→teeth(8), u_lip→7, l_lip→9, hair→10, ears→11/12, neck→13
    assert CELEBA19_TO_FACE14[1] == 1
    assert CELEBA19_TO_FACE14[11] == 8
    assert CELEBA19_TO_FACE14[12] == 7
    assert CELEBA19_TO_FACE14[13] == 9
    assert CELEBA19_TO_FACE14[17] == 10
    assert CELEBA19_TO_FACE14[7] == 11 and CELEBA19_TO_FACE14[8] == 12
    assert CELEBA19_TO_FACE14[14] == 13
    # accessories/bg → 0
    for c in (0, 6, 9, 15, 16, 18):
        assert CELEBA19_TO_FACE14[c] == 0


def test_bisenet_shapes_small():
    model = BiSeNet(n_classes=19)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 64, 64, 19)
    assert bool(jnp.isfinite(out).all())


def test_face_parser_interface():
    # tiny input keeps CPU cost low; FaceParser handles 512² in production
    import makeupdiffuse_tpu.data.faceparse as fp

    parser = FaceParser.__new__(FaceParser)
    parser.model = BiSeNet()
    dummy = jnp.zeros((1, 64, 64, 3))
    parser.params = parser.model.init(jax.random.PRNGKey(0), dummy)
    parser._remap = jnp.asarray(CELEBA19_TO_FACE14)
    parser._jit_parse = jax.jit(parser._parse)

    img = (np.random.RandomState(0).uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    mask = parser.parse(img)
    assert mask.shape == (64, 64)
    assert mask.dtype == np.int32
    assert mask.min() >= 0 and mask.max() <= 13
    np.testing.assert_array_equal(parser.parse(img), mask)  # deterministic


def test_bisenet_converter_roundtrip():
    """export → convert reproduces the exact variables; keys carry zllrunning's
    checkpoint spelling (tools/convert_bisenet, VERDICT r1 §2b faceutils item)."""
    import flax
    from makeupdiffuse_tpu.tools.convert_bisenet import (
        convert_bisenet_state_dict, export_bisenet_torch_names)

    model = BiSeNet()
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    sd = export_bisenet_torch_names(variables)
    # spot-check the torch-side naming contract
    assert "cp.resnet.layer2.0.downsample.0.weight" in sd
    assert "cp.arm16.conv.bn.running_mean" in sd
    assert "ffm.convblk.conv.weight" in sd
    assert "conv_out.conv_out.weight" in sd
    assert not any(k.endswith("conv_out.conv_out.bias") for k in sd)  # bias-free head
    # aux-head keys (train-only in the torch repo) are tolerated and dropped
    sd["conv_out16.conv_out.weight"] = np.zeros((19, 64, 1, 1), np.float32)
    sd["cp.resnet.bn1.num_batches_tracked"] = np.zeros((), np.int64)
    back = convert_bisenet_state_dict(sd, variables)
    flat_a = flax.traverse_util.flatten_dict(variables, sep="/")
    flat_b = flax.traverse_util.flatten_dict(back, sep="/")
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), flat_b[k])


def test_bisenet_converter_rejects_mismatch():
    import pytest as _pytest
    from makeupdiffuse_tpu.tools.convert_bisenet import (
        convert_bisenet_state_dict, export_bisenet_torch_names)

    model = BiSeNet()
    variables = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)))
    sd = export_bisenet_torch_names(variables)
    del sd["cp.resnet.conv1.weight"]
    sd["totally.unexpected.weight"] = np.zeros((1,), np.float32)
    with _pytest.raises(KeyError):
        convert_bisenet_state_dict(sd, variables)


# ---- parse-derived landmark fallback (VERDICT r2 #7) -------------------------------

def _synthetic_seg(H=256):
    """Face parse with every part present: oval face, brows, eyes, nose, lips."""
    seg = np.zeros((H, H), np.int32)
    yy, xx = np.mgrid[0:H, 0:H].astype(np.float32)
    face = ((yy - 0.52 * H) / (0.38 * H)) ** 2 + ((xx - 0.5 * H) / (0.3 * H)) ** 2 < 1
    seg[face] = 1
    seg[int(0.34 * H):int(0.37 * H), int(0.28 * H):int(0.42 * H)] = 2   # l brow
    seg[int(0.34 * H):int(0.37 * H), int(0.58 * H):int(0.72 * H)] = 3   # r brow
    seg[int(0.42 * H):int(0.46 * H), int(0.30 * H):int(0.40 * H)] = 4   # l eye
    seg[int(0.42 * H):int(0.46 * H), int(0.60 * H):int(0.70 * H)] = 5   # r eye
    seg[int(0.46 * H):int(0.62 * H), int(0.46 * H):int(0.54 * H)] = 6   # nose
    seg[int(0.68 * H):int(0.72 * H), int(0.40 * H):int(0.60 * H)] = 7   # u lip
    seg[int(0.72 * H):int(0.76 * H), int(0.40 * H):int(0.60 * H)] = 9   # l lip
    return seg


def test_landmarks_from_parse_shapes_and_placement():
    from makeupdiffuse_tpu.data.faceparse import landmarks_from_parse

    H = 256
    seg = _synthetic_seg(H)
    lms = landmarks_from_parse(seg)
    assert lms.shape == (68, 2) and lms.dtype == np.float32
    assert (lms >= 0).all() and (lms[:, 0] < H).all() and (lms[:, 1] < H).all()
    # jaw: below the face centroid mid-line, chin point near the bottom of the oval
    assert lms[8, 0] > 0.8 * H
    # brows sit in the brow band; left block left of right block
    assert lms[17:27, 0].mean() < 0.45 * H
    assert lms[17:22, 1].mean() < lms[22:27, 1].mean()
    # eyes: each 6-point ring centered in its eye box
    assert abs(lms[36:42, 1].mean() - 0.35 * H) < 0.06 * H
    assert abs(lms[42:48, 1].mean() - 0.65 * H) < 0.06 * H
    # nose bottom on the nose's lower edge
    assert abs(lms[31:36, 0].mean() - 0.62 * H) < 0.04 * H
    # outer lip ring surrounds the lip box; inner ring strictly inside outer extent
    assert lms[48:60, 1].min() < 0.42 * H and lms[48:60, 1].max() > 0.58 * H
    inner_w = lms[60:68, 1].max() - lms[60:68, 1].min()
    outer_w = lms[48:60, 1].max() - lms[48:60, 1].min()
    assert inner_w < outer_w


def test_landmarks_from_parse_degenerate_inputs():
    from makeupdiffuse_tpu.data.faceparse import (canonical_landmarks,
                                                  landmarks_from_parse)

    H = 128
    # empty parse → canonical template, finite and in-bounds
    lms = landmarks_from_parse(np.zeros((H, H), np.int32))
    np.testing.assert_array_equal(lms, canonical_landmarks(H))
    # face only (no parts) → jaw from contour, parts from template; in-bounds
    seg = np.zeros((H, H), np.int32)
    seg[20:110, 30:100] = 1
    lms2 = landmarks_from_parse(seg)
    assert lms2.shape == (68, 2)
    assert (lms2 >= 0).all() and (lms2 < H).all()


def test_face_box_from_parse():
    from makeupdiffuse_tpu.data.faceparse import face_box_from_parse

    seg = _synthetic_seg(256)
    box = face_box_from_parse(seg)
    l, t, r, b = box
    assert 0 <= l < r <= 256 and 0 <= t < b <= 256
    ys, xs = np.nonzero(seg > 0)
    assert l <= xs.min() and r >= xs.max() and t <= ys.min() and b >= ys.max()
    assert face_box_from_parse(np.zeros((64, 64), np.int32)) is None


def test_face_pipeline_parse_fallback_end_to_end():
    """Raw uint8 image → (image, mask, diff, lms) with ZERO external assets:
    no dlib, no lms cache, no detector (VERDICT r2 #7 done-criterion)."""
    from makeupdiffuse_tpu.data.preprocess import FacePipeline

    H = 256
    seg512 = np.kron(_synthetic_seg(256), np.ones((2, 2), np.int32))  # 512²

    class StubParser:  # deterministic parse (real BiSeNet covered elsewhere)
        def parse(self, image):
            assert image.shape == (512, 512, 3)
            return seg512

    pipe = FacePipeline(face_parser=StubParser(), parse_fallback=True, img_size=H)
    raw = np.random.RandomState(0).randint(0, 255, (300, 280, 3), np.uint8)
    out = pipe(raw)
    assert out is not None
    img, mask4, diff, lms = out
    assert img.shape == (H, H, 3) and img.min() >= -1 and img.max() <= 1
    assert mask4.shape == (H, H, 4)
    assert diff.shape == (H, H, 136) and diff.dtype == np.float32
    assert lms.shape == (68, 2) and lms.dtype == np.int32
    assert (lms >= 0).all() and (lms < H).all()
    # without the flag the dlib-free pipeline still refuses (reference behavior)
    pipe2 = FacePipeline(face_parser=StubParser(), parse_fallback=False, img_size=H)
    assert pipe2(raw) is None


def _analytic_parse(s=512):
    """512² parse built from ellipses with analytically-known geometry, so
    landmark error can be bounded in PIXELS (VERDICT r3 Weak #5): each part's
    center/radii below are ground truth the assertions compare against."""
    seg = np.zeros((s, s), np.int32)
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float64)

    def ell(cy, cx, ry, rx):
        return ((yy - cy * s) / (ry * s)) ** 2 + ((xx - cx * s) / (rx * s)) ** 2 <= 1

    seg[ell(0.52, 0.50, 0.40, 0.30)] = 1                     # face oval
    seg[ell(0.36, 0.38, 0.012, 0.060)] = 2                   # left brow
    seg[ell(0.36, 0.62, 0.012, 0.060)] = 3                   # right brow
    seg[ell(0.43, 0.38, 0.020, 0.050)] = 4                   # left eye
    seg[ell(0.43, 0.62, 0.020, 0.050)] = 5                   # right eye
    seg[ell(0.52, 0.50, 0.090, 0.035)] = 6                   # nose
    mouth = ell(0.70, 0.50, 0.045, 0.110)                    # mouth ellipse
    seg[mouth & (yy <= 0.70 * s)] = 7                        # upper lip
    seg[mouth & (yy > 0.70 * s)] = 9                         # lower lip
    return seg


def test_landmarks_from_parse_error_bounds():
    """Pixel-accuracy bounds for the dlib-free landmark fallback on analytic
    geometry (the 136-ch diff field conditioning EleGANt-style teachers depends
    on these points — reference behavior being approximated:
    /root/reference/diffdata/preprocessing.py:89-94,159-166)."""
    from makeupdiffuse_tpu.data.faceparse import landmarks_from_parse

    s = 512
    L = landmarks_from_parse(_analytic_parse(s))
    tol_c = 0.010 * s   # ~5 px: part centers/centroids
    tol_p = 0.020 * s   # ~10 px: individual contour points

    # eyes: 6-pt ring centroid == eye center; ring x-extent == 2*rx
    for start, ex in ((36, 0.38), (42, 0.62)):
        ring = L[start:start + 6]
        assert abs(ring[:, 0].mean() - 0.43 * s) < tol_c, ring
        assert abs(ring[:, 1].mean() - ex * s) < tol_c, ring
        assert abs((ring[:, 1].max() - ring[:, 1].min()) - 2 * 0.050 * s) < tol_p
        assert abs(ring[:, 1].min() - (ex - 0.050) * s) < tol_p  # outer corner

    # lips: outer ring centroid == mouth center; width == 2*rx; corners on-axis
    outer = L[48:60]
    assert abs(outer[:, 0].mean() - 0.70 * s) < tol_c
    assert abs(outer[:, 1].mean() - 0.50 * s) < tol_c
    assert abs(outer[:, 1].min() - (0.50 - 0.110) * s) < tol_p
    assert abs(outer[:, 1].max() - (0.50 + 0.110) * s) < tol_p
    # inner ring strictly inside the outer one
    inner = L[60:68]
    assert inner[:, 1].min() > outer[:, 1].min() and inner[:, 1].max() < outer[:, 1].max()

    # jaw: chin (L[8]) at the bottom of the face oval, on the center line
    assert abs(L[8, 0] - (0.52 + 0.40) * s) < tol_p
    assert abs(L[8, 1] - 0.50 * s) < tol_p
    # jaw endpoints at the horizontal extremes of the oval (lower-contour rays)
    assert abs(L[0, 1] - (0.50 - 0.30) * s) < 2 * tol_p
    assert abs(L[16, 1] - (0.50 + 0.30) * s) < 2 * tol_p

    # nose: bottom curve on the nose's lower edge, centered
    assert abs(L[31:36, 0].mean() - (0.52 + 0.090 * 0.8) * s) < 2 * tol_p
    assert abs(L[33, 1] - 0.50 * s) < tol_c
    # bridge on the center line
    assert np.all(np.abs(L[27:31, 1] - 0.50 * s) < tol_c)

    # brows: band y and per-brow x-centers
    assert abs(L[17:22, 0].mean() - 0.36 * s) < tol_c
    assert abs(L[22:27, 0].mean() - 0.36 * s) < tol_c
    assert abs(L[17:22, 1].mean() - 0.38 * s) < tol_c
    assert abs(L[22:27, 1].mean() - 0.62 * s) < tol_c

    # aggregate: RMS error of the ring/center points quantified above stays
    # inside 2% of the crop (the bound the diff-field consumer relies on)
    expected = {8: ((0.52 + 0.40) * s, 0.50 * s)}
    for k in range(6):
        a = np.pi + k * np.pi / 3
        expected[36 + k] = (0.43 * s + 0.020 * s * np.sin(a),
                            0.38 * s + 0.050 * s * np.cos(a))
        expected[42 + k] = (0.43 * s + 0.020 * s * np.sin(a),
                            0.62 * s + 0.050 * s * np.cos(a))
    err = np.array([np.hypot(L[i, 0] - e[0], L[i, 1] - e[1])
                    for i, e in expected.items()])
    assert np.sqrt((err ** 2).mean()) < 0.02 * s, err
