"""Test configuration: run the whole suite on a virtual 8-device CPU mesh so
sharding/collective tests work without TPU hardware. Must set env before jax
is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even if the env preselects TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU via config too.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from qwen3_tpu.config import PRESETS  # noqa: E402
from qwen3_tpu.io.synthetic import synthetic_tokenizer, synthetic_weights  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg():
    return PRESETS["tiny"]


@pytest.fixture(scope="session")
def tiny_weights(tiny_cfg):
    return synthetic_weights(tiny_cfg, seed=1234)


@pytest.fixture(scope="session")
def tiny_tok():
    return synthetic_tokenizer(vocab_size=PRESETS["tiny"].vocab_size)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
