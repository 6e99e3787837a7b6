"""Continuous batching: per-stream outputs must be identical to the
single-stream engine for the same (prompt, seed, sampler) request — batching
and slot scheduling must never change anyone's tokens."""

import numpy as np
import pytest

from qwen3_tpu.io.checkpoint import write_checkpoint
from qwen3_tpu.io.tokenizer_bin import write_tokenizer_bin
from qwen3_tpu.runtime.batched import BatchedEngine, Request
from qwen3_tpu.runtime.engine import Engine, EngineConfig


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory, tiny_weights, tiny_tok):
    d = tmp_path_factory.mktemp("bckpt")
    path = str(d / "tiny.bin")
    write_checkpoint(path, tiny_weights)
    write_tokenizer_bin(path + ".tokenizer", tiny_tok)
    return path


PROMPTS = ["the cat", "in the hat and", "er on at", "the the the", "and er"]


def single_stream(ckpt, prompt, seed, temp, max_tokens):
    eng = Engine(EngineConfig(path=ckpt, seed=seed, temperature=temp,
                              top_p=0.9, seq_len=96, mode="exact",
                              prefill_chunk=16, decode_chunk=8))
    res = eng.generate(prompt, max_tokens=max_tokens)
    return res.ids


@pytest.mark.parametrize("temp", [0.0, 0.9])
def test_batched_matches_single_stream(ckpt, temp):
    eng = BatchedEngine(ckpt, max_batch=2, seq_len=96, mode="exact",
                        temperature=temp, top_p=0.9, prefill_bucket=16,
                        decode_chunk=8)
    reqs = [eng.submit(Request(prompt=p, seed=100 + i, max_tokens=12))
            for i, p in enumerate(PROMPTS)]
    done = eng.run()
    assert len(done) == len(PROMPTS)
    for i, req in enumerate(reqs):
        assert req.finished
        want = single_stream(ckpt, PROMPTS[i], 100 + i, temp, 12)
        got = req.prompt_ids + req.out_ids
        assert got == want, f"req {i}: {got} != {want}"


def test_streaming_callback(ckpt):
    chunks = []
    eng = BatchedEngine(ckpt, max_batch=2, seq_len=96, mode="exact",
                        temperature=0.0, prefill_bucket=16, decode_chunk=4)
    eng.submit(Request(prompt="the cat", seed=1, max_tokens=8,
                       stream_cb=chunks.append))
    [req] = eng.run()
    assert b"".join(chunks) == eng.tokenizer.decode(req.out_ids)


def test_more_requests_than_slots_all_finish(ckpt):
    eng = BatchedEngine(ckpt, max_batch=2, seq_len=96, mode="exact",
                        temperature=0.0, prefill_bucket=16, decode_chunk=8)
    reqs = [eng.submit(Request(prompt=p, seed=i, max_tokens=6))
            for i, p in enumerate(PROMPTS * 2)]
    done = eng.run()
    assert len(done) == len(reqs)
    assert all(r.finished for r in reqs)
