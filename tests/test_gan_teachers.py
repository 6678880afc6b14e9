"""EleGANt/SCGAN teacher backend tests: shapes, identity-at-init, mask semantics,
empty-eye guard, dispatch registry."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeupdiffuse_tpu.teacher.base import build_teacher
from makeupdiffuse_tpu.teacher.elegant import EleGANtTeacher, collapse_mask
from makeupdiffuse_tpu.teacher.scgan import SCGanTeacher


def _inputs(b=1, H=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    image_s = jax.random.uniform(ks[0], (b, H, H, 3)) * 2 - 1
    image_r = jax.random.uniform(ks[1], (b, H, H, 3)) * 2 - 1
    mask = jnp.zeros((b, H, H, 4))
    mask = mask.at[:, 40:46, 20:40, 0].set(1.0)   # lip
    mask = mask.at[:, 8:56, 8:56, 1].set(1.0)     # face
    mask = mask.at[:, 20:24, 16:26, 2].set(1.0)   # eye_l
    mask = mask.at[:, 20:24, 38:48, 3].set(1.0)   # eye_r
    diff = jax.random.normal(ks[2], (b, H, H, 8))
    return image_s, image_r, mask, diff


def test_collapse_mask():
    m = jnp.zeros((1, 4, 4, 4)).at[0, 0, 0, 0].set(1).at[0, 1, 1, 1].set(1).at[0, 2, 2, 3].set(1)
    out = collapse_mask(m)
    assert out.shape == (1, 4, 4, 2)
    assert out[0, 0, 0, 0] == 1 and out[0, 1, 1, 1] == 1 and out[0, 2, 2, 1] == 1


def test_elegant_identity_at_init():
    image_s, image_r, mask, diff = _inputs()
    t = EleGANtTeacher(ch=8, image_size=64, diff_channels=8)
    out = t.transfer(image_s, image_r, mask, mask, diff, diff)
    assert out.shape == image_s.shape
    # zero-init residual head → identity at init
    np.testing.assert_allclose(np.asarray(out), np.asarray(jnp.clip(image_s, -1, 1)),
                               atol=1e-5)


def test_elegant_responds_to_weights():
    image_s, image_r, mask, diff = _inputs(seed=1)
    t = EleGANtTeacher(ch=8, image_size=64, diff_channels=8)
    t.params = jax.tree_util.tree_map(lambda p: p + 0.02, t.params)
    out = t.transfer(image_s, image_r, mask, mask, diff, diff)
    assert not np.allclose(np.asarray(out), np.asarray(image_s), atol=1e-3)
    assert float(jnp.abs(out).max()) <= 1.0


def test_scgan_forward_and_eye_guard():
    b, H = 2, 64
    ks = jax.random.split(jax.random.PRNGKey(2), 2)
    makeup = jax.random.uniform(ks[0], (b, H, H, 3)) * 2 - 1
    nonmakeup = jax.random.uniform(ks[1], (b, H, H, 3)) * 2 - 1
    seg = jnp.zeros((b, H, H), jnp.int32)
    seg = seg.at[:, 8:56, 8:56].set(4)       # skin/face
    seg = seg.at[:, 40:46, 20:40].set(9)     # lip
    # eyes only in batch item 0
    seg_r = seg.at[0, 20:24, 16:26].set(6).at[0, 20:24, 38:48].set(1)
    t = SCGanTeacher(ch=8, image_size=64)
    t.params = jax.tree_util.tree_map(lambda p: p + 0.02, t.params)
    out = t.forward(makeup, nonmakeup, seg_r, seg)
    assert out.shape == (b, H, H, 3)
    # item 1 has no reference eyes → identity passthrough
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(jnp.clip(nonmakeup[1], -1, 1)),
                               atol=1e-5)
    assert not np.allclose(np.asarray(out[0]), np.asarray(nonmakeup[0]), atol=1e-3)


def test_registry_dispatch():
    t1 = build_teacher("ELEGANT", ch=8, image_size=64, diff_channels=8)
    assert isinstance(t1, EleGANtTeacher)
    t2 = build_teacher("SCGAN", ch=8, image_size=64)
    assert isinstance(t2, SCGanTeacher)
    with pytest.raises(ValueError):
        build_teacher("NOPE")


def test_teacher_ckpt_roundtrip_elegant():
    """Manifest/export/convert scaffold (VERDICT r1 item 6): flax → torch-layout
    state dict → flax is bit-exact, and shape mismatches / missing keys raise."""
    from makeupdiffuse_tpu.tools.convert_teacher_ckpt import (
        convert_teacher_state_dict,
        export_teacher_torch_names,
        teacher_key_manifest,
    )

    t = EleGANtTeacher(ch=8, image_size=64, diff_channels=8)
    # randomize so zero-init leaves are distinguishable
    leaves, treedef = jax.tree_util.tree_flatten(t.params)
    rng = np.random.RandomState(0)
    leaves = [jnp.asarray(rng.normal(size=l.shape).astype(np.float32)) for l in leaves]
    p = jax.tree_util.tree_unflatten(treedef, leaves)

    sd = export_teacher_torch_names(p)
    # torch layout: conv weights OIHW
    any_conv = next(k for k, v in sd.items() if v.ndim == 4)
    assert sd[any_conv].shape[-2:] == (3, 3) or sd[any_conv].shape[-2:] == (1, 1)
    manifest = teacher_key_manifest(p)
    assert set(manifest) == set(sd)

    back = convert_teacher_state_dict(sd, p)
    flat_a = jax.tree_util.tree_leaves(p)
    flat_b = jax.tree_util.tree_leaves(back)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # missing key → loud KeyError
    sd_missing = dict(sd)
    sd_missing.pop(any_conv)
    with pytest.raises(KeyError):
        convert_teacher_state_dict(sd_missing, p)
    # wrong shape → assertion
    sd_bad = dict(sd)
    sd_bad[any_conv] = np.zeros((1, 1, 3, 3), np.float32)
    with pytest.raises(AssertionError):
        convert_teacher_state_dict(sd_bad, p)


def test_teacher_ckpt_roundtrip_scgan():
    from makeupdiffuse_tpu.tools.convert_teacher_ckpt import (
        convert_teacher_state_dict,
        export_teacher_torch_names,
    )

    t = SCGanTeacher(ch=8, image_size=64)
    leaves, treedef = jax.tree_util.tree_flatten(t.params)
    rng = np.random.RandomState(1)
    leaves = [jnp.asarray(rng.normal(size=l.shape).astype(np.float32)) for l in leaves]
    p = jax.tree_util.tree_unflatten(treedef, leaves)
    back = convert_teacher_state_dict(export_teacher_torch_names(p), p)
    for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sow_attention_no_border_wrap():
    """The shifted pass must NOT mix opposite image borders: a delta feature at the
    top edge may not influence the bottom edge output (the jnp.roll wrap-around
    failure mode this guards against)."""
    from makeupdiffuse_tpu.teacher.elegant import SowAttention

    H, C = 32, 8
    att = SowAttention(win=16, heads=2)
    rng = jax.random.PRNGKey(0)
    base_r = jax.random.normal(jax.random.PRNGKey(1), (1, H, H, C))
    diff = jnp.zeros((1, H, H, 4))
    mask = jnp.ones((1, H, H, 1))
    feat_s = jax.random.normal(jax.random.PRNGKey(2), (1, H, H, C))
    params = att.init(rng, feat_s, base_r, diff, diff, mask, mask)

    # perturb the reference's TOP-LEFT corner pixel only
    pert_r = base_r.at[0, 0, 0].add(100.0)
    g0, b0 = att.apply(params, feat_s, base_r, diff, diff, mask, mask)
    g1, b1 = att.apply(params, feat_s, pert_r, diff, diff, mask, mask)
    delta = np.abs(np.asarray(g1 - g0)).sum(-1)[0]  # [H, W]
    # the bottom-right quadrant is > win away in both axes: with non-wrapping
    # windows (shifted by win/2) it can never see the (0,0) key
    assert delta[24:, 24:].max() == 0.0, delta[24:, 24:].max()
    # sanity: the local neighborhood DID change
    assert delta[:8, :8].max() > 0.0
