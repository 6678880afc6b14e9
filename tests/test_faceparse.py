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
