"""Sharded vs. single-device logit equality on an 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tpu.models import forward, init_kv_cache, init_params
from qwen3_tpu.parallel import make_mesh, shard_kv_cache, shard_params


@pytest.fixture(scope="module", params=["bf16", "exact"])
def mode(request):
    return request.param


def test_mesh_shapes():
    mesh = make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh = make_mesh(dp=1)
    assert mesh.shape == {"dp": 1, "tp": 8}


def test_tp_dp_logits_match_single_device(tiny_weights, tiny_cfg, mode):
    """tp=2 (kv heads split) x dp=2 (batch split) must reproduce the
    single-device logits bit-for-bit-ish."""
    cfg = tiny_cfg
    params = init_params(tiny_weights, mode=mode)
    toks = jnp.asarray([[1, 2, 3, 4], [9, 8, 7, 6]], jnp.int32)

    k, v = init_kv_cache(cfg, 2, 64)
    want, wk, wv = forward(params, cfg, toks, k, v, jnp.int32(0),
                           mode=mode, all_logits=True)

    mesh = make_mesh(dp=2, tp=2)
    sp = shard_params(params, mesh, mode=mode)
    sk, sv = shard_kv_cache(init_kv_cache(cfg, 2, 64), mesh)
    got, gk, gv = forward(sp, cfg, toks, sk, sv, jnp.int32(0),
                          mode=mode, all_logits=True)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(wk),
                               rtol=1e-5, atol=1e-5)


def test_decode_step_sharded(tiny_weights, tiny_cfg, mode):
    cfg = tiny_cfg
    params = init_params(tiny_weights, mode=mode)
    mesh = make_mesh(dp=1, tp=2)
    sp = shard_params(params, mesh, mode=mode)
    sk, sv = shard_kv_cache(init_kv_cache(cfg, 1, 64), mesh)

    k, v = init_kv_cache(cfg, 1, 64)
    tok = jnp.asarray([[5]], jnp.int32)
    want, _, _ = forward(params, cfg, tok, k, v, jnp.int32(0), mode=mode)
    got, _, _ = forward(sp, cfg, tok, sk, sv, jnp.int32(0), mode=mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
