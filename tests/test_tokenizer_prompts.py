"""CLIP tokenizer + fixed-prompt bank tests."""
import gzip
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeupdiffuse_tpu.data.tokenizer import CLIPTokenizer, SOT, EOT, bytes_to_unicode
from makeupdiffuse_tpu.models.clip_text import (
    PROMPT_IDS,
    precompute_prompt_bank,
    prompt_token_ids,
    refresh_prompt_ids,
)


def test_missing_vocab_raises_helpfully(tmp_path):
    with pytest.raises(FileNotFoundError, match="bpe_simple_vocab"):
        CLIPTokenizer(str(tmp_path / "nope.txt.gz"))


def test_bytes_to_unicode_reversible():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256


def test_tokenizer_with_synthetic_vocab(tmp_path):
    """A miniature BPE merge list exercises the real merge loop end-to-end."""
    merges = ["#version: 0.2", "m a", "ma k", "mak e", "u p</w>", "make up</w>",
              "t r", "tr a", "tra n", "tran s"]
    path = tmp_path / "bpe.txt.gz"
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges) + "\n" + "\n".join("x y" for _ in range(60000)))
    tok = CLIPTokenizer(str(path))
    ids = tok.encode("makeup", max_length=8)
    assert len(ids) == 8
    assert ids[0] == SOT and EOT in ids
    # 'makeup' merges to the single 'makeup</w>' token
    makeup_id = tok.encoder["makeup</w>"]
    assert ids[1] == makeup_id
    # deterministic + lowercasing
    assert tok.encode("MAKEUP", max_length=8) == ids


def test_prompt_token_ids_contract():
    ids = prompt_token_ids("makeup transfer", max_length=10)
    assert ids.shape == (1, 10)
    assert int(ids[0, 0]) == SOT
    assert int(ids[0, -1]) == EOT
    with pytest.raises(KeyError):
        prompt_token_ids("unknown prompt")


def test_refresh_prompt_ids_and_bank():
    saved = {k: list(v) for k, v in PROMPT_IDS.items()}
    try:
        refresh_prompt_ids(lambda s: [SOT] + [len(s)] + [EOT])
        assert PROMPT_IDS["makeup transfer"] == [SOT, 15, EOT]
        # bank encodes every fixed prompt through a stub encoder
        calls = []

        def apply(params, ids):
            calls.append(np.asarray(ids))
            return jnp.zeros((1, ids.shape[1], 4))

        bank = precompute_prompt_bank(apply, None, max_length=6)
        assert set(bank) == {"", "makeup transfer", "makeup style transfer"}
        assert all(v.shape == (6, 4) for v in bank.values())
    finally:
        PROMPT_IDS.clear()
        PROMPT_IDS.update(saved)


def test_reduced_vocab_prompt_bank_is_finite(tiny_model_session):
    """Regression: the fixed PROMPT_IDS carry real CLIP ids (~49k); with a tiny
    test vocab (256) those were out-of-bounds for nn.Embed, and jnp.take's
    oob fill mode returned NaN embeddings that silently poisoned every synthetic
    train loss. CLIPTextEncoder folds ids by vocab_size (identity at 49408)."""
    cfg, model, params = tiny_model_session
    enc = lambda p, i: model.apply(p, i, method=model.encode_text)
    bank = precompute_prompt_bank(enc, params, cfg.model.clip.max_length)
    for k, v in bank.items():
        assert bool(jnp.isfinite(v).all()), f"prompt bank {k!r} has non-finite rows"
