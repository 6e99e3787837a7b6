"""kv_write_rows kernel vs. the unrolled dynamic_update_slice reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tpu.ops.pallas.kv_write import kv_write_rows


def _reference(cache, rows, layer, positions):
    for b in range(cache.shape[1]):
        blk = rows[b].reshape((1, 1, 1) + rows[b].shape)
        cache = jax.lax.dynamic_update_slice(
            cache, blk.astype(cache.dtype), (layer, b, positions[b], 0, 0))
    return cache


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kv_write_rows_matches_unrolled(dtype):
    L, B, S, KV, D = 3, 8, 16, 2, 64
    rng = np.random.default_rng(0)
    cache = jnp.asarray(rng.standard_normal((L, B, S, KV, D)), dtype)
    rows = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
    # duplicate positions across slots + edge rows
    positions = jnp.asarray([0, 3, 3, S - 1, 7, 0, S - 1, 5], jnp.int32)

    for layer in (0, L - 1):
        got = kv_write_rows(cache, rows, jnp.int32(layer), positions,
                            interpret=jax.default_backend() == "cpu")
        want = _reference(cache, rows, layer, positions)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(want, np.float32))
        # untouched layers and rows preserved
        np.testing.assert_array_equal(
            np.asarray(got[1 - min(layer, 1)], np.float32),
            np.asarray(cache[1 - min(layer, 1)], np.float32))
