"""PGT teacher behavior tests: annealing schedule, region compose, identity cases."""
import jax
import jax.numpy as jnp
import numpy as np

from makeupdiffuse_tpu.teacher.base import SourceTeacher, build_teacher
from makeupdiffuse_tpu.teacher.pgt import PGTConfig, PGTTeacher, annealed_alpha, compose_pgt


def test_annealed_alpha_milestones():
    ms, vals = (0, 12, 24, 50), (0.2, 0.4, 0.3, 0.2)
    assert annealed_alpha(0, ms, vals) == 0.2
    assert annealed_alpha(12, ms, vals) == 0.4
    assert abs(annealed_alpha(6, ms, vals) - 0.3) < 1e-9  # linear interp
    assert annealed_alpha(100, ms, vals) == 0.2  # clamps past last milestone


def _faces(seed=0, b=2, h=32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    img_s = jax.random.uniform(ks[0], (b, h, h, 3)) * 0.4 - 0.8  # dark source
    img_r = jax.random.uniform(ks[1], (b, h, h, 3)) * 0.4 + 0.4  # bright reference
    mask = jnp.zeros((b, h, h, 4))
    mask = mask.at[:, 24:28, 12:20, 0].set(1.0)  # lip
    mask = mask.at[:, 4:28, 4:28, 1].set(1.0)  # face
    mask = mask.at[:, 10:12, 8:12, 2].set(1.0)  # eye_l
    mask = mask.at[:, 10:12, 20:24, 3].set(1.0)  # eye_r
    return img_s, img_r, mask


def test_compose_pgt_moves_face_toward_reference():
    img_s, img_r, mask = _faces()
    alphas = jnp.asarray([0.5, 0.5, 0.5])
    pgt = compose_pgt(img_s, img_r, mask, mask, alphas, eye_margin=2, lip_margin=1)
    assert pgt.shape == img_s.shape
    face = np.asarray(mask[..., 1]) > 0
    # face pixels brightened toward reference; background untouched
    assert float(np.asarray(pgt)[face].mean()) > float(np.asarray(img_s)[face].mean())
    bg = ~(np.asarray(mask).sum(-1) > 0)
    # background may still overlap expanded lip; use far corner strictly
    np.testing.assert_allclose(np.asarray(pgt)[:, 0, 0], np.asarray(img_s)[:, 0, 0], atol=1e-5)


def test_compose_pgt_zero_alpha_is_identity():
    img_s, img_r, mask = _faces(1)
    pgt = compose_pgt(img_s, img_r, mask, mask, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(pgt), np.asarray(img_s), atol=1e-5)


def test_pgt_teacher_signature_and_annealing():
    t = PGTTeacher(PGTConfig())
    a0 = np.asarray(t.alphas())
    np.testing.assert_allclose(a0, [0.05, 0.6, 0.2])
    for _ in range(12):
        t.step()
    np.testing.assert_allclose(np.asarray(t.alphas()), [0.2, 0.8, 0.4])
    img_s, img_r, mask = _faces(2)
    out = t(img_s, img_r, mask, mask, None, None)
    assert out.shape == img_s.shape
    assert float(jnp.abs(out).max()) <= 1.0


def test_keep_teacher_identity_and_factory():
    img_s, img_r, mask = _faces(3)
    keep = build_teacher("KEEP")
    assert isinstance(keep, SourceTeacher)
    np.testing.assert_array_equal(np.asarray(keep(img_s, img_r)), np.asarray(img_s))
    pgt = build_teacher("ELEGANT_PGT")
    assert isinstance(pgt, PGTTeacher)
