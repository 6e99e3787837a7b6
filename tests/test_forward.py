"""End-to-end forward-pass parity: JAX engine vs. NumPy oracle on a tiny
synthetic model — greedy token streams must agree, logits must be close."""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from qwen3_tpu.models import forward, init_kv_cache, init_params


@pytest.fixture(scope="module")
def exact_params(tiny_weights):
    return init_params(tiny_weights, mode="exact")


@pytest.fixture(scope="module")
def bf16_params(tiny_weights):
    return init_params(tiny_weights, mode="bf16")


def oracle_greedy(w, prompt, n_steps):
    st = oracle.OracleState(w, w.config.seq_len)
    stream, logits_log = [], []
    token = prompt[0]
    for pos in range(len(prompt) + n_steps - 1):
        logits = oracle.forward(w, st, token, pos)
        logits_log.append(logits)
        nxt = prompt[pos + 1] if pos + 1 < len(prompt) else int(np.argmax(logits))
        stream.append(token)
        token = nxt
    return stream + [token], np.stack(logits_log)


def engine_greedy(params, cfg, prompt, n_steps, mode):
    k, v = init_kv_cache(cfg, 1, cfg.seq_len)
    toks = jnp.asarray([prompt], jnp.int32)
    # batched prefill over the whole prompt
    logits, k, v = forward(params, cfg, toks, k, v, jnp.int32(0),
                           mode=mode, all_logits=True)
    logits_log = [np.asarray(logits[0])]
    stream = list(prompt)
    token = int(np.argmax(np.asarray(logits[0, -1])))
    pos = len(prompt)
    for _ in range(n_steps - 1):
        stream.append(token)
        lg, k, v = forward(params, cfg, jnp.asarray([[token]], jnp.int32),
                           k, v, jnp.int32(pos), mode=mode)
        logits_log.append(np.asarray(lg[0]))
        token = int(np.argmax(np.asarray(lg[0, -1])))
        pos += 1
    stream.append(token)
    return stream, np.concatenate(logits_log, axis=0)


def test_exact_mode_greedy_parity(tiny_weights, tiny_cfg, exact_params):
    prompt = [1, 17, 42, 100, 7]
    n_steps = 12
    want_stream, want_logits = oracle_greedy(tiny_weights, prompt, n_steps)
    got_stream, got_logits = engine_greedy(
        exact_params, tiny_cfg, prompt, n_steps, "exact")
    assert got_stream == want_stream
    np.testing.assert_allclose(
        got_logits, want_logits, rtol=5e-3, atol=5e-3)


def test_bf16_mode_greedy_parity(tiny_weights, tiny_cfg, bf16_params):
    """Weight-only bf16 path: same greedy stream on a tame synthetic model."""
    prompt = [3, 9, 250]
    n_steps = 8
    want_stream, _ = oracle_greedy(tiny_weights, prompt, n_steps)
    got_stream, _ = engine_greedy(bf16_params, tiny_cfg, prompt, n_steps, "bf16")
    assert got_stream == want_stream


def test_prefill_matches_tokenwise_decode(tiny_weights, tiny_cfg, exact_params):
    """Batched prefill must produce the same logits/cache as feeding tokens
    one at a time (the reference's only mode)."""
    cfg = tiny_cfg
    prompt = [5, 301, 77, 12]
    k, v = init_kv_cache(cfg, 1, cfg.seq_len)
    toks = jnp.asarray([prompt], jnp.int32)
    lg_batch, kb, vb = forward(exact_params, cfg, toks, k, v, jnp.int32(0),
                               mode="exact", all_logits=True)

    k2, v2 = init_kv_cache(cfg, 1, cfg.seq_len)
    rows = []
    for pos, t in enumerate(prompt):
        lg, k2, v2 = forward(exact_params, cfg,
                             jnp.asarray([[t]], jnp.int32),
                             k2, v2, jnp.int32(pos), mode="exact")
        rows.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.asarray(lg_batch[0]), np.stack(rows),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(kb), np.asarray(k2),
                               rtol=1e-5, atol=1e-5)


def test_batched_streams_independent(tiny_weights, tiny_cfg, exact_params):
    """B=2 with different prompts must equal two B=1 runs (no cross-batch
    leakage) — a capability the reference does not have."""
    cfg = tiny_cfg
    p0, p1 = [1, 2, 3], [9, 8, 7]
    k, v = init_kv_cache(cfg, 2, cfg.seq_len)
    lg, _, _ = forward(exact_params, cfg, jnp.asarray([p0, p1], jnp.int32),
                       k, v, jnp.int32(0), mode="exact", all_logits=True)
    for i, p in enumerate((p0, p1)):
        k1, v1 = init_kv_cache(cfg, 1, cfg.seq_len)
        lg1, _, _ = forward(exact_params, cfg, jnp.asarray([p], jnp.int32),
                            k1, v1, jnp.int32(0), mode="exact", all_logits=True)
        np.testing.assert_allclose(np.asarray(lg[i]), np.asarray(lg1[0]),
                                   rtol=1e-4, atol=1e-4)
