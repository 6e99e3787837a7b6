"""Untied-classifier model family (Qwen3-4B / DeepSeek-R1-0528-Qwen3-8B have
shared_classifier=0): loader, forward and engine must use the separate cls
tensor."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from qwen3_tpu.config import PRESETS
from qwen3_tpu.io.checkpoint import load_checkpoint, write_checkpoint
from qwen3_tpu.io.synthetic import synthetic_weights
from qwen3_tpu.models import forward, init_kv_cache, init_params


@pytest.fixture(scope="module")
def untied_weights():
    cfg = dataclasses.replace(PRESETS["tiny"], shared_classifier=False)
    return synthetic_weights(cfg, seed=77)


def test_untied_roundtrip(tmp_path, untied_weights):
    path = str(tmp_path / "untied.bin")
    write_checkpoint(path, untied_weights)
    w = load_checkpoint(path)
    assert not w.config.shared_classifier
    assert not np.array_equal(w.cls_q, w.emb_q)
    np.testing.assert_array_equal(w.cls_q, untied_weights.cls_q)


def test_untied_forward_matches_oracle(untied_weights):
    cfg = untied_weights.config
    params = init_params(untied_weights, mode="exact")
    prompt = [3, 100, 400]

    st = oracle.OracleState(untied_weights, 32)
    k, v = init_kv_cache(cfg, 1, 32)
    logits, _, _ = forward(params, cfg, jnp.asarray([prompt], jnp.int32),
                           k, v, jnp.int32(0), mode="exact", all_logits=True)
    got = np.asarray(logits[0])
    for pos, tok in enumerate(prompt):
        want = oracle.forward(untied_weights, st, tok, pos)
        np.testing.assert_allclose(got[pos], want, rtol=5e-3, atol=5e-3)
    # the untied classifier must actually differ from the tied one
    tied = dataclasses.replace(cfg, shared_classifier=True)
    tw = dataclasses.replace(untied_weights, config=tied,
                             cls_q=untied_weights.emb_q,
                             cls_s=untied_weights.emb_s)
    tp = init_params(tw, mode="exact")
    k, v = init_kv_cache(cfg, 1, 32)
    tl, _, _ = forward(tp, tied, jnp.asarray([prompt], jnp.int32), k, v,
                       jnp.int32(0), mode="exact", all_logits=True)
    assert not np.allclose(np.asarray(tl), got)
