"""Real-topology teacher conversion: synthetic export → convert → forward
roundtrip with numeric torch-vs-flax parity (VERDICT r2 #5, the convert_bisenet
pattern applied to the production ELEGANT teacher checkpoint
``sow_pyramid_a5_e3d2_remapped.pth``, /root/reference/diffmk/teacher.py:121-129)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from makeupdiffuse_tpu.teacher.elegant_sow import (DIFF_CHANNELS,
                                                   ElegantSowGenerator,
                                                   ElegantSowTeacher)
from makeupdiffuse_tpu.tools.convert_elegant import (convert_elegant_state_dict,
                                                     expected_elegant_keys)
from makeupdiffuse_tpu.tools.torch_elegant import ElegantSowTorch

CONV_DIM = 8   # tiny width for CI; the mapping is width-agnostic
WIN = 4
H = 32


def _template(model):
    dummy = (jnp.zeros((1, H, H, 3)), jnp.zeros((1, H, H, 3)),
             jnp.zeros((1, H, H, 2)), jnp.zeros((1, H, H, 2)),
             jnp.zeros((1, H, H, DIFF_CHANNELS)), jnp.zeros((1, H, H, DIFF_CHANNELS)))
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), *dummy))
    return jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), shapes)


@pytest.fixture(scope="module")
def converted():
    tm = ElegantSowTorch(conv_dim=CONV_DIM, window_size=WIN)
    torch.manual_seed(0)
    for p in tm.parameters():  # break the degenerate IN-init symmetry
        with torch.no_grad():
            p.add_(0.05 * torch.randn_like(p))
    fm = ElegantSowGenerator(conv_dim=CONV_DIM, window_size=WIN)
    params = convert_elegant_state_dict(tm.state_dict(), _template(fm))
    return tm, fm, params


def test_key_manifest_covers_roundtrip():
    keys = expected_elegant_keys(conv_dim=CONV_DIM)
    # every reconstruction key is consumed by the converter (no silent drops)
    fm = ElegantSowGenerator(conv_dim=CONV_DIM, window_size=WIN)
    tm = ElegantSowTorch(conv_dim=CONV_DIM, window_size=WIN)
    params = convert_elegant_state_dict(tm.state_dict(), _template(fm))
    import flax
    n_leaves = len(flax.traverse_util.flatten_dict(params["params"]))
    assert n_leaves == len(keys)
    # production-width manifest sanity: first conv is 7x7 RGB at conv_dim 64
    prod = expected_elegant_keys(conv_dim=64)
    assert prod["encoder.0.conv.weight"] == (64, 3, 7, 7)
    assert prod["head.weight"] == (3, 64, 7, 7)
    assert prod["attn_high.to_v.weight"] == (512, 256, 1, 1)


def test_convert_rejects_bad_checkpoints():
    fm = ElegantSowGenerator(conv_dim=CONV_DIM, window_size=WIN)
    tm = ElegantSowTorch(conv_dim=CONV_DIM, window_size=WIN)
    tmpl = _template(fm)
    sd = tm.state_dict()
    # missing key
    bad = dict(sd)
    bad.pop("head.weight")
    with pytest.raises(ValueError, match="missing"):
        convert_elegant_state_dict(bad, tmpl)
    # unexpected key
    bad = dict(sd)
    bad["extra.weight"] = torch.zeros(1)
    with pytest.raises(ValueError, match="unexpected"):
        convert_elegant_state_dict(bad, tmpl)
    # shape mismatch
    bad = dict(sd)
    bad["head.bias"] = torch.zeros(7)
    with pytest.raises(AssertionError, match="head.bias"):
        convert_elegant_state_dict(bad, tmpl)


def test_torch_flax_forward_parity(converted):
    """Converted weights produce the SAME output — the exact-weight conversion
    proof the interface-only teacher lacked."""
    tm, fm, params = converted
    rng = np.random.RandomState(1)
    img_s = rng.uniform(-1, 1, (2, H, H, 3)).astype(np.float32)
    img_r = rng.uniform(-1, 1, (2, H, H, 3)).astype(np.float32)
    mask_s = (rng.uniform(0, 1, (2, H, H, 2)) > 0.5).astype(np.float32)
    mask_r = (rng.uniform(0, 1, (2, H, H, 2)) > 0.5).astype(np.float32)
    diff_s = rng.normal(0, 0.3, (2, H, H, DIFF_CHANNELS)).astype(np.float32)
    diff_r = rng.normal(0, 0.3, (2, H, H, DIFF_CHANNELS)).astype(np.float32)

    got = np.asarray(fm.apply(params, img_s, img_r, mask_s, mask_r, diff_s, diff_r))

    def t(x):  # NHWC → NCHW
        return torch.from_numpy(x.transpose(0, 3, 1, 2))

    with torch.no_grad():
        want = tm(t(img_s), t(img_r), t(mask_s), t(mask_r), t(diff_s), t(diff_r))
    want = want.permute(0, 2, 3, 1).numpy()

    assert got.shape == want.shape == (2, H, H, 3)
    err = np.max(np.abs(got - want))
    assert err < 1e-4, f"torch/flax mismatch: max abs err {err}"


def test_sow_teacher_adapter(converted):
    """ElegantSowTeacher slots into the teacher_type='ELEGANT' call contract
    (4-channel mask collapse + clip, teacher.py:136-140)."""
    _, fm, params = converted
    teacher = ElegantSowTeacher(params, conv_dim=CONV_DIM, window_size=WIN)
    rng = np.random.RandomState(2)
    img = rng.uniform(-1, 1, (1, H, H, 3)).astype(np.float32)
    mask4 = (rng.uniform(0, 1, (1, H, H, 4)) > 0.5).astype(np.float32)
    out = teacher(jnp.asarray(img), jnp.asarray(img), jnp.asarray(mask4),
                  jnp.asarray(mask4))
    assert out.shape == (1, H, H, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.max(jnp.abs(out))) <= 1.0


# ---- SCGAN SCGen (G.pth) — /root/reference/diffmk/teacher.py:12-23,88-93 -----------

from makeupdiffuse_tpu.teacher.scgen_munit import SCGenMunit
from makeupdiffuse_tpu.tools.convert_scgen import (convert_scgen_state_dict,
                                                   expected_scgen_keys)
from makeupdiffuse_tpu.tools.torch_scgen import SCGenTorch

SC_KW = dict(dim=8, style_dim=24, n_downsample=2, n_res=2, mlp_dim=32)
SH = 32


def _sc_template(model):
    dummy = (jnp.zeros((1, SH, SH, 3)),) * 2 + (jnp.zeros((1, SH, SH, 3)),) * 2
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), *dummy))
    return jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), shapes)


@pytest.fixture(scope="module")
def sc_converted():
    tkw = dict(SC_KW)
    tm = SCGenTorch(**tkw)
    torch.manual_seed(1)
    for p in tm.parameters():
        with torch.no_grad():
            p.add_(0.05 * torch.randn_like(p))
    fkw = {k: v for k, v in SC_KW.items()}
    fm = SCGenMunit(**fkw)
    params = convert_scgen_state_dict(tm.state_dict(), _sc_template(fm))
    return tm, fm, params


def test_scgen_key_manifest_and_rejects():
    keys = expected_scgen_keys(**SC_KW)
    assert "FIEnc.model.0.conv.weight" in keys
    assert "PSEnc.fc.weight" in keys
    assert "fuse.mlp.model.0.weight" in keys
    assert "fuse.model.1.norm.gamma" in keys
    tm = SCGenTorch(**SC_KW)
    fm = SCGenMunit(**SC_KW)
    tmpl = _sc_template(fm)
    import flax
    params = convert_scgen_state_dict(tm.state_dict(), tmpl)
    assert len(flax.traverse_util.flatten_dict(params["params"])) == len(keys)
    bad = dict(tm.state_dict())
    bad.pop("fuse.mlp.model.4.bias")
    with pytest.raises(ValueError, match="missing"):
        convert_scgen_state_dict(bad, tmpl)
    bad = dict(tm.state_dict())
    bad["PSEnc.fc.weight"] = torch.zeros(3, 3, 1, 1)
    with pytest.raises(AssertionError, match="PSEnc.fc.weight"):
        convert_scgen_state_dict(bad, tmpl)


def test_scgen_torch_flax_forward_parity(sc_converted):
    tm, fm, params = sc_converted
    rng = np.random.RandomState(4)
    makeup = rng.uniform(-1, 1, (2, SH, SH, 3)).astype(np.float32)
    nonmakeup = rng.uniform(-1, 1, (2, SH, SH, 3)).astype(np.float32)
    seg_m = (rng.uniform(0, 1, (2, SH, SH, 3)) > 0.5).astype(np.float32)
    seg_n = (rng.uniform(0, 1, (2, SH, SH, 3)) > 0.5).astype(np.float32)

    got = np.asarray(fm.apply(params, jnp.asarray(makeup), jnp.asarray(nonmakeup),
                              jnp.asarray(seg_m), jnp.asarray(seg_n)))

    def t(x):
        return torch.from_numpy(x.transpose(0, 3, 1, 2))

    with torch.no_grad():
        want = tm(t(makeup), t(nonmakeup), t(seg_m), t(seg_n))
    want = want.permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape == (2, SH, SH, 3)
    err = np.max(np.abs(got - want))
    assert err < 1e-4, f"torch/flax SCGen mismatch: max abs err {err}"
