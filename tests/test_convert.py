"""Converter round-trip test: params → torch-named state dict → params.

Validates that every parameter of the model maps to a torch ControlLDM name and back
bit-exactly (layout transposes are involutive), and that the hint-conv widening
surgery (runs/train.py:60-62) produces the right shape.
"""
import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeupdiffuse_tpu.config import tiny_test_config
from makeupdiffuse_tpu.models.controlled_ldm import init_model
from makeupdiffuse_tpu.tools.convert_torch_ckpt import (
    convert_state_dict,
    export_torch_names,
    widen_hint_conv,
)


@pytest.fixture(scope="module")
def setup(tiny_model_session):
    cfg, model, params = tiny_model_session
    return cfg.model, params


def test_roundtrip_exact(setup):
    cfg, params = setup
    # randomize so zero-init leaves are distinguishable
    leaves, treedef = jax.tree_util.tree_flatten(params["params"])
    rng = np.random.RandomState(0)
    leaves = [jnp.asarray(rng.normal(size=l.shape).astype(np.float32)) for l in leaves]
    p = jax.tree_util.tree_unflatten(treedef, leaves)

    torch_sd = export_torch_names(p, cfg)
    # the exported hint stem first conv carries 6 in-channels already; shrink to 3
    # to emulate a stock control_sd15_ini.ckpt, then let the converter re-widen
    k = "control_model.input_hint_block.0.weight"
    assert torch_sd[k].shape[1] == cfg.control.hint_channels
    torch_sd[k] = torch_sd[k][:, :3]

    back = convert_state_dict(torch_sd, cfg)
    assert not back["__unconsumed__"], back["__unconsumed__"][:10]

    flat_orig = flax.traverse_util.flatten_dict(p, sep="/")
    flat_back = flax.traverse_util.flatten_dict(back["params"], sep="/")
    assert set(flat_orig) == set(flat_back), (
        set(flat_orig) ^ set(flat_back)
    )
    for key in flat_orig:
        if key == "control_model/input_hint_block/conv_0/kernel":
            # widened: first 3 in-channels duplicated
            got = flat_back[key]
            np.testing.assert_array_equal(got[:, :, :3], got[:, :, 3:])
            np.testing.assert_array_equal(got[:, :, :3], np.asarray(flat_orig[key])[:, :, :3])
            continue
        np.testing.assert_array_equal(
            np.asarray(flat_back[key]), np.asarray(flat_orig[key]), err_msg=key
        )


def test_widen_hint_conv():
    w = np.arange(16 * 3 * 3 * 3, dtype=np.float32).reshape(16, 3, 3, 3)
    w6 = widen_hint_conv(w, 6)
    assert w6.shape == (16, 6, 3, 3)
    np.testing.assert_array_equal(w6[:, :3], w)
    np.testing.assert_array_equal(w6[:, 3:], w)


def test_torch_key_style(setup):
    """Exported names follow the ControlLDM layout the reference loads
    (runs/train.py:59-69)."""
    cfg, params = setup
    sd = export_torch_names(params["params"], cfg)
    keys = set(sd)
    assert any(k.startswith("model.diffusion_model.input_blocks.0.0.") for k in keys)
    assert any(k.startswith("control_model.zero_convs.0.0.") for k in keys)
    assert "control_model.input_hint_block.0.weight" in keys
    assert any(k.startswith("first_stage_model.encoder.down.0.block.0.") for k in keys)
    assert any(k.startswith("cond_stage_model.transformer.text_model.encoder.layers.0.") for k in keys)
    # every weight 2D+ in torch layout: conv OIHW / linear OI
    w = sd["model.diffusion_model.input_blocks.0.0.weight"]
    assert w.shape[-2:] == (3, 3)  # kh, kw last in torch


def test_full_sd15_topology_roundtrip():
    """Full-size SD1.5 topology (4 levels, attn on 3, 12 in-blocks + 12 out-blocks,
    upsample slot 1-vs-2 depending on attention) survives export→convert with every
    path and shape intact — shapes-only to keep CPU cost low."""
    from makeupdiffuse_tpu.config import ModelConfig
    from makeupdiffuse_tpu.models.controlled_ldm import fast_init_model

    cfg = ModelConfig()
    # shapes-only: the test never reads values, and the random fill of 1.4B
    # params costs minutes of first-touch page faults on this VM
    _, params = fast_init_model(cfg, seed=0, fill="zeros")
    p = params["params"]

    torch_sd = export_torch_names(p, cfg)
    # SD1.5 landmarks: 12 input blocks, middle, 12 output blocks, out head
    keys = set(torch_sd)
    assert "model.diffusion_model.input_blocks.11.0.in_layers.2.weight" in keys
    assert "model.diffusion_model.middle_block.1.proj_out.weight" in keys
    # level-3 first output block has NO attention → upsample at slot 1 of block 2
    assert "model.diffusion_model.output_blocks.2.1.conv.weight" in keys
    # level-2 output blocks HAVE attention → upsample at slot 2 of block 5
    assert "model.diffusion_model.output_blocks.5.2.conv.weight" in keys
    assert "model.diffusion_model.out.2.weight" in keys
    assert "control_model.zero_convs.11.0.weight" in keys
    assert "control_model.input_hint_block.14.weight" in keys
    assert "first_stage_model.decoder.up.3.upsample.conv.weight" in keys
    assert "cond_stage_model.transformer.text_model.encoder.layers.11.mlp.fc2.weight" in keys

    # shrink hint conv to 3 input channels (stock ckpt), reconvert, compare trees
    k = "control_model.input_hint_block.0.weight"
    torch_sd[k] = torch_sd[k][:, :3]
    back = convert_state_dict(torch_sd, cfg)
    assert not back["__unconsumed__"], back["__unconsumed__"][:10]
    flat_orig = flax.traverse_util.flatten_dict(p, sep="/")
    flat_back = flax.traverse_util.flatten_dict(back["params"], sep="/")
    assert set(flat_orig) == set(flat_back), sorted(set(flat_orig) ^ set(flat_back))[:10]
    for key in flat_orig:
        assert flat_back[key].shape == flat_orig[key].shape, key
