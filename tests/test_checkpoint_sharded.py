"""Sharded-checkpoint round trips: save an FSDP-sharded TrainState, restore it
onto fresh meshes (same topology AND different topology), and resume training.

The reference's only resilience mechanism is Lightning's ModelCheckpoint +
manual resume (/root/reference/runs/train.py:50,59-69) on one GPU; this is the
multi-chip version a real sharded training run hits first: orbax must lay the
leaves back down under whatever NamedSharding the restore template carries —
fsdp→fsdp, fsdp→replicated, and replicated→fsdp all have to agree bitwise.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeupdiffuse_tpu.core.schedule import DiffusionSchedule
from makeupdiffuse_tpu.parallel import sharding as shd
from makeupdiffuse_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from makeupdiffuse_tpu.training.checkpoint import CheckpointManager
from makeupdiffuse_tpu.training.train_state import TrainState
from makeupdiffuse_tpu.training.train_step import make_train_step


@pytest.fixture(scope="module")
def setup(tiny_model_session):
    return tiny_model_session


def _leaves_equal(a_tree, b_tree, stride=5):
    al = jax.tree_util.tree_leaves(a_tree)
    bl = jax.tree_util.tree_leaves(b_tree)
    assert len(al) == len(bl)
    for a, b in zip(al[::stride], bl[::stride]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fsdp_state_roundtrip_and_resume(setup, tmp_path):
    cfg, model, params = setup
    mesh = make_mesh(n_data=8, n_model=1)
    state = shd.shard_train_state(
        mesh, TrainState.create(params, cfg.train, cfg.model, use_ema=True),
        fsdp=True)
    # advance bookkeeping so the restore has something non-trivial to get right
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    state = state.adjust_t_min(delta_t=50, t_max=900)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), every_steps=0)
    assert mgr.maybe_save(state, force=True)
    mgr.wait()

    # ---- restore onto the SAME topology (fresh fsdp-sharded template) ----------
    tmpl_fs = shd.shard_train_state(
        mesh, TrainState.create(params, cfg.train, cfg.model, use_ema=True),
        fsdp=True)
    restored = CheckpointManager(str(tmp_path / "ckpt")).restore(tmpl_fs)
    assert int(restored.step) == 7
    assert int(restored.t_min) == int(state.t_min)
    _leaves_equal(restored.params, state.params)
    _leaves_equal(restored.opt_state, state.opt_state)
    _leaves_equal(restored.ema_params, state.ema_params)
    # the restored leaves actually carry the template's fsdp sharding
    k = jax.tree_util.tree_leaves(restored.params)
    t = jax.tree_util.tree_leaves(tmpl_fs.params)
    big = max(range(len(k)), key=lambda i: k[i].size)
    assert k[big].sharding == t[big].sharding
    assert not k[big].sharding.is_fully_replicated

    # ---- and training RESUMES from it (one composite step runs + advances) ----
    sched = DiffusionSchedule.create(timesteps=cfg.model.timesteps)
    m = cfg.model
    H = m.image_size
    b = 8
    ks = jax.random.split(jax.random.PRNGKey(3), 9)
    u = lambda kk, *s: jax.random.uniform(kk, s)
    batch = shard_batch(mesh, dict(
        src_img=u(ks[0], b, H, H, 3),
        ref_img=u(ks[1], b, H, H, 3),
        nonmakeup_img=u(ks[2], b, H, H, 3) * 2 - 1,
        makeup_img=u(ks[3], b, H, H, 3) * 2 - 1,
        nonmakeup_seg=jax.random.randint(ks[4], (b, H, H), 0, 14),
        mask_s_full=(u(ks[5], b, H, H, 4) > 0.7).astype(jnp.float32),
        pgt_sr=u(ks[6], b, H, H, 3) * 2 - 1,
        makeup_pgt=u(ks[7], b, H, H, 3) * 2 - 1,
        context=jax.random.normal(ks[8], (b, m.clip.max_length, m.unet.context_dim)),
    ))
    step_fn = make_train_step(model, sched, cfg.model, donate=False)
    new_state, metrics = step_fn(restored, batch, jax.random.PRNGKey(11))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 8
    assert int(new_state.t_min) == int(state.t_min)  # curriculum continues

    # ---- restore onto a DIFFERENT topology: fsdp ckpt → replicated template ----
    tmpl_rep = replicate(mesh, TrainState.create(
        params, cfg.train, cfg.model, use_ema=True))
    rep = CheckpointManager(str(tmp_path / "ckpt")).restore(tmpl_rep)
    assert int(rep.step) == 7
    _leaves_equal(rep.params, state.params)
    _leaves_equal(rep.ema_params, state.ema_params)
    rl = jax.tree_util.tree_leaves(rep.params)
    assert rl[big].sharding.is_fully_replicated


def test_replicated_ckpt_restores_onto_fsdp_mesh(setup, tmp_path):
    """The reverse migration: a single-host (replicated) checkpoint taken before
    scaling out restores straight onto an fsdp mesh."""
    cfg, model, params = setup
    state = TrainState.create(params, cfg.train, cfg.model)
    state = state.replace(step=jnp.asarray(3, jnp.int32))
    mgr = CheckpointManager(str(tmp_path / "c2"), every_steps=0)
    assert mgr.maybe_save(state, force=True)
    mgr.wait()

    mesh = make_mesh(n_data=8, n_model=1)
    tmpl = shd.shard_train_state(
        mesh, TrainState.create(params, cfg.train, cfg.model), fsdp=True)
    restored = CheckpointManager(str(tmp_path / "c2")).restore(tmpl)
    assert int(restored.step) == 3
    _leaves_equal(restored.params, state.params)
    k = jax.tree_util.tree_leaves(restored.params)
    t = jax.tree_util.tree_leaves(tmpl.params)
    big = max(range(len(k)), key=lambda i: k[i].size)
    assert k[big].sharding == t[big].sharding
