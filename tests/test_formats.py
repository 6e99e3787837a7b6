"""Roundtrip tests for the .bin / .tokenizer binary formats."""

import numpy as np

from qwen3_tpu.io.checkpoint import (
    dequantize_q8_0,
    load_checkpoint,
    quantize_q8_0,
    read_header,
    write_checkpoint,
)
from qwen3_tpu.io.tokenizer_bin import load_tokenizer_bin, write_tokenizer_bin


def test_checkpoint_roundtrip(tmp_path, tiny_cfg, tiny_weights):
    path = str(tmp_path / "tiny.bin")
    write_checkpoint(path, tiny_weights)

    cfg = read_header(path)
    assert cfg == tiny_cfg

    w = load_checkpoint(path)
    for name in ("att_norm", "ffn_norm", "out_norm", "q_norm", "k_norm",
                 "emb_q", "emb_s", "wq_q", "wq_s", "wk_q", "wk_s",
                 "wv_q", "wv_s", "wo_q", "wo_s", "w1_q", "w1_s",
                 "w2_q", "w2_s", "w3_q", "w3_s", "cls_q", "cls_s"):
        np.testing.assert_array_equal(
            getattr(w, name), getattr(tiny_weights, name), err_msg=name
        )


def test_tied_classifier_aliases_embedding(tmp_path, tiny_weights):
    path = str(tmp_path / "tiny.bin")
    write_checkpoint(path, tiny_weights)
    w = load_checkpoint(path)
    assert w.config.shared_classifier
    np.testing.assert_array_equal(w.cls_q, w.emb_q)


def test_quantize_q8_0_semantics():
    # scale = absmax/127, round half away from zero, clamp, zero-guard 1e-6
    x = np.array([1.27, -1.27, 0.005, 0.0], dtype=np.float32)
    q, s = quantize_q8_0(x, 4)
    assert s[0] == np.float32(1.27 / 127.0)
    np.testing.assert_array_equal(q, [127, -127, 1, 0])

    z = np.zeros(4, dtype=np.float32)
    qz, sz = quantize_q8_0(z, 4)
    assert sz[0] == np.float32(1e-6)
    np.testing.assert_array_equal(qz, 0)

    # round-half-away: 0.5 * scale boundary
    x2 = np.array([127.0, 0.5, -0.5, 2.5], dtype=np.float32)
    q2, s2 = quantize_q8_0(x2, 4)
    assert s2[0] == np.float32(1.0)
    np.testing.assert_array_equal(q2, [127, 1, -1, 3])  # C roundf, not banker's


def test_dequantize_inverse():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(256).astype(np.float32)
    q, s = quantize_q8_0(x, 64)
    xd = dequantize_q8_0(q, s, 64)
    assert np.abs(xd - x).max() <= (np.abs(x).max() / 127.0) * 0.5 + 1e-7


def test_load_params_pack_cache(tmp_path, tiny_weights):
    """load_params: cached load returns tensors identical to the cold load,
    and the cache invalidates when the source checkpoint changes."""
    import os

    import jax.numpy as jnp

    from qwen3_tpu.models import load_params

    path = str(tmp_path / "tiny.bin")
    write_checkpoint(path, tiny_weights)

    for mode in ("pallas", "bf16"):
        cfg0, cold = load_params(path, mode=mode)
        meta = tmp_path / "tiny.bin.pack" / mode / "meta.json"
        assert meta.exists(), mode
        cfg1, warm = load_params(path, mode=mode)
        assert cfg0 == cfg1
        assert set(cold) == set(warm)
        for k in cold:
            assert cold[k].dtype == warm[k].dtype, (mode, k)
            np.testing.assert_array_equal(
                np.asarray(cold[k], dtype=jnp.float32),
                np.asarray(warm[k], dtype=jnp.float32), err_msg=f"{mode}/{k}")

    # stale cache: bump the source mtime -> rebuilt, not served
    before = meta.stat().st_mtime_ns
    os.utime(path, ns=(1, 1))
    load_params(path, mode="bf16")
    assert meta.stat().st_mtime_ns != before


def test_tokenizer_roundtrip(tmp_path, tiny_tok):
    path = str(tmp_path / "tiny.tokenizer")
    write_tokenizer_bin(path, tiny_tok)
    t = load_tokenizer_bin(path)
    assert t.vocab_size == tiny_tok.vocab_size
    assert t.max_len == tiny_tok.max_len
    assert t.special == tiny_tok.special
    assert t.tokens == tiny_tok.tokens
    np.testing.assert_allclose(t.scores, tiny_tok.scores, rtol=1e-6)
