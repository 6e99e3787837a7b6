"""Device-side synthetic params (io/device_synth.py): the analytically
derived packed shapes must match models.init_params' actual pallas pack
bit-for-layout, and the generated pytree must run the real decode program."""

import jax.numpy as jnp
import numpy as np

from qwen3_tpu.io.device_synth import packed_shapes, synth_device_params
from qwen3_tpu.models import init_kv_cache, init_params
from qwen3_tpu.models.qwen3 import forward_impl
from qwen3_tpu.runtime.decode_loop import decode_chunk
from qwen3_tpu.runtime.xorshift import seed_to_device


def test_shapes_match_real_pack(tiny_cfg, tiny_weights):
    real = init_params(tiny_weights, mode="pallas", max_seq_len=64)
    derived = packed_shapes(tiny_cfg)
    real_keys = {k for k in real if not k.startswith("rope_")}
    assert real_keys == set(derived)
    for k in sorted(derived):
        shape, dt = derived[k]
        assert tuple(real[k].shape) == shape, (k, real[k].shape, shape)
        assert str(real[k].dtype) == dt, (k, real[k].dtype, dt)


def test_synth_params_run_forward(tiny_cfg):
    cfg = tiny_cfg.with_seq_len(32)
    p = synth_device_params(cfg, 32, seed=7)
    kv = init_kv_cache(cfg, 1, 32, jnp.bfloat16)
    toks = jnp.asarray([[3, 5, 7, 9]], jnp.int32)
    logits, k, v = forward_impl(p, cfg, toks, kv[0], kv[1], jnp.int32(0),
                                mode="pallas")
    assert logits.shape == (1, 1, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()

    hi, lo = seed_to_device(3)
    packed, *_ = decode_chunk(
        p, k, v, jnp.asarray([7], jnp.int32), jnp.int32(4), jnp.int32(32),
        hi, lo, cfg=cfg, mode="pallas", chunk=8, temperature=0.0, top_p=0.9,
        greedy=True, bos=0, eos=1, emit_at_limit=False, top_k=0, attn="dense")
    arr = np.asarray(packed)
    assert int(arr[-2]) > 0
    assert (arr[: int(arr[-2])] >= 0).all()
