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


def single_stream(ckpt, prompt, seed, temp, max_tokens, decode_impl="side"):
    # decode_impl="side" matches BatchedEngine's default side_buffer=True
    # program; "slot" matches side_buffer=False (see EngineConfig.decode_impl)
    eng = Engine(EngineConfig(path=ckpt, seed=seed, temperature=temp,
                              top_p=0.9, seq_len=96, mode="exact",
                              prefill_chunk=16, decode_chunk=8,
                              decode_impl=decode_impl))
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


@pytest.mark.parametrize("decode_impl,side_buffer",
                         [("side", True), ("slot", False)])
def test_batched_chat_matches_chat_session(ckpt, decode_impl, side_buffer):
    """Two interleaved multi-turn conversations + a completion request on
    one slot pool: every conversation's reply stream must be bit-equal to a
    dedicated single-stream ChatSession with the same seed (template, RNG
    burn, KV continuation, overflow reset). Holds by construction — both
    engines dispatch the same compiled prefill/decode programs (per-row math
    is batch-size-independent) — in both the side-buffer and scatter decode
    modes."""
    from qwen3_tpu.runtime.batched_chat import BatchedChat
    from qwen3_tpu.runtime.chat import ChatSession

    turns = ["the cat", "in the hat and er", "on at the the"]
    seq_len = 96

    def single(seed, system):
        eng = Engine(EngineConfig(path=ckpt, seed=seed, temperature=0.8,
                                  top_p=0.9, seq_len=seq_len, mode="exact",
                                  prefill_chunk=16, decode_chunk=8,
                                  decode_impl=decode_impl))
        session = ChatSession(eng, system_prompt=system)
        return [session.send(t) for t in turns]

    want_a = single(11, "sys a")
    want_b = single(22, None)

    beng = BatchedEngine(ckpt, max_batch=3, seq_len=seq_len, mode="exact",
                         temperature=0.8, top_p=0.9, prefill_bucket=16,
                         decode_chunk=8, side_buffer=side_buffer)
    chat = BatchedChat(beng)
    conv_a = chat.new_conversation(seed=11, system_prompt="sys a")
    conv_b = chat.new_conversation(seed=22)
    got_a, got_b = [], []
    for i, t in enumerate(turns):
        ra = chat.submit_turn(conv_a, t)
        rb = chat.submit_turn(conv_b, t)
        if i == 0:  # completion traffic shares the pool mid-conversation
            beng.submit(Request(prompt="the the", seed=5, max_tokens=6))
        beng.run()
        chat.finish_turn(conv_a, ra)
        chat.finish_turn(conv_b, rb)
        got_a.append(beng.tokenizer.decode(ra.out_ids))
        got_b.append(beng.tokenizer.decode(rb.out_ids))
    assert got_a == want_a
    assert got_b == want_b


def test_batched_chat_overflow_resets(ckpt):
    """Keep sending turns until the context overflows: the conversation must
    reset its position (reference semantics) and keep producing the same
    streams as the single-stream ChatSession."""
    from qwen3_tpu.runtime.batched_chat import BatchedChat
    from qwen3_tpu.runtime.chat import ChatSession

    seq_len = 48
    turns = ["the cat in the hat", "er on at the", "and the thinker"]

    eng = Engine(EngineConfig(path=ckpt, seed=9, temperature=0.0,
                              top_p=0.9, seq_len=seq_len, mode="exact",
                              prefill_chunk=16, decode_chunk=8))
    session = ChatSession(eng)
    want = [session.send(t) for t in turns]

    beng = BatchedEngine(ckpt, max_batch=2, seq_len=seq_len, mode="exact",
                         temperature=0.0, prefill_bucket=16, decode_chunk=8)
    chat = BatchedChat(beng)
    conv = chat.new_conversation(seed=9)
    got = [chat.send(conv, t) for t in turns]
    assert conv.last_stop in ("eos", "limit")
    assert got == want


def test_per_request_sampler_params(ckpt):
    """Mixed greedy + sampled requests with per-request temperature/top_p in
    ONE batch must each bit-match the single-stream engine configured with
    that request's sampler."""
    configs = [(0.0, 0.9), (0.9, 0.9), (0.7, 0.5), (0.0, 1.0), (1.3, 0.95)]
    eng = BatchedEngine(ckpt, max_batch=3, seq_len=96, mode="exact",
                        temperature=0.4, top_p=0.8, prefill_bucket=16,
                        decode_chunk=8)
    reqs = [eng.submit(Request(prompt=PROMPTS[i], seed=100 + i,
                               max_tokens=12, temperature=t, top_p=p))
            for i, (t, p) in enumerate(configs)]
    eng.run()
    for i, req in enumerate(reqs):
        t, p = configs[i]
        ref = Engine(EngineConfig(path=ckpt, seed=100 + i, temperature=t,
                                  top_p=p, seq_len=96, mode="exact",
                                  prefill_chunk=16, decode_chunk=8))
        want = ref.generate(PROMPTS[i], max_tokens=12).ids
        got = req.prompt_ids + req.out_ids
        assert got == want, f"req {i} (t={t}, p={p}): {got} != {want}"
        assert req.prompt_ms > 0 and req.generate_ms > 0


def test_streaming_callback(ckpt):
    chunks = []
    eng = BatchedEngine(ckpt, max_batch=2, seq_len=96, mode="exact",
                        temperature=0.0, prefill_bucket=16, decode_chunk=4)
    eng.submit(Request(prompt="the cat", seed=1, max_tokens=8,
                       stream_cb=chunks.append))
    [req] = eng.run()
    assert b"".join(chunks) == eng.tokenizer.decode(req.out_ids)


@pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
def test_side_buffer_matches_scatter_path(ckpt, kv_dtype):
    """The chunk side-buffer decode (uniform-step writes + two-segment
    attention + per-chunk merge) must produce the same streams as the
    per-step scatter path."""
    def run(side):
        eng = BatchedEngine(ckpt, max_batch=3, seq_len=96, mode="exact",
                            temperature=0.9, top_p=0.9, prefill_bucket=16,
                            decode_chunk=8, kv_dtype=kv_dtype,
                            side_buffer=side)
        reqs = [eng.submit(Request(prompt=p, seed=7 + i, max_tokens=20))
                for i, p in enumerate(PROMPTS)]
        eng.run()
        return [r.prompt_ids + r.out_ids for r in reqs]

    assert run(True) == run(False)


def test_side_buffer_merge_at_seq_len_edge(ckpt):
    """A slot decoding right up to seq_len merges its chunk window into the
    cache's padding rows without corrupting live rows (multi-chunk run where
    positions reach the limit mid-chunk)."""
    eng = BatchedEngine(ckpt, max_batch=2, seq_len=32, mode="exact",
                        temperature=0.0, prefill_bucket=16, decode_chunk=8,
                        side_buffer=True)
    reqs = [eng.submit(Request(prompt=p, seed=i)) for i, p in
            enumerate(PROMPTS[:3])]  # no max_tokens: run to seq_len/EOS
    done = eng.run()
    assert len(done) == 3
    for r in reqs:
        assert r.finished
        assert len(r.prompt_ids) + len(r.out_ids) <= 32
        want = single_stream(ckpt, r.prompt, r.seed, 0.0, None)
        # single_stream uses seq_len 96; compare within this engine's limit
        got = r.prompt_ids + r.out_ids
        assert got == want[:len(got)]


@pytest.mark.parametrize("kv_dtype,side", [("float32", True),
                                           ("int8", True),
                                           ("float32", False)])
def test_flash_attn_serving_matches_dense(ckpt, kv_dtype, side):
    """attn='flash' in the serving engine — including the side-buffer layout
    (flash_decode_gqa_two_segment) — must produce the same greedy streams as
    dense attention."""
    def run(attn):
        eng = BatchedEngine(ckpt, max_batch=3, seq_len=96, mode="exact",
                            temperature=0.0, prefill_bucket=16,
                            decode_chunk=8, kv_dtype=kv_dtype,
                            side_buffer=side, attn=attn)
        reqs = [eng.submit(Request(prompt=p, seed=3 + i, max_tokens=16))
                for i, p in enumerate(PROMPTS)]
        eng.run()
        return [r.prompt_ids + r.out_ids for r in reqs]

    assert run("flash") == run("dense")


def test_batched_admission_matches_serial(ckpt, monkeypatch):
    """Same-chunk-count fresh prompts are prefilled in ONE [N, C] forward
    per chunk (prefill_slots_chunk); streams must still be bit-equal to the
    single-stream engine. Multi-chunk prompts included."""
    import qwen3_tpu.runtime.batched as B

    calls = {"batch": 0, "serial": 0}
    orig_b, orig_s = B.prefill_slots_chunk, B.prefill_slot_chunk

    def count_b(*a, **kw):
        calls["batch"] += 1
        return orig_b(*a, **kw)

    def count_s(*a, **kw):
        calls["serial"] += 1
        return orig_s(*a, **kw)

    monkeypatch.setattr(B, "prefill_slots_chunk", count_b)
    monkeypatch.setattr(B, "prefill_slot_chunk", count_s)

    # long prompts -> 2 chunks at bucket 16; same chunk count groups them
    prompts = [" ".join(["the cat in a hat er on at"] * 3) + f" {i}"
               for i in range(3)]
    eng = B.BatchedEngine(ckpt, max_batch=3, seq_len=96, mode="exact",
                          temperature=0.9, top_p=0.9, prefill_bucket=16,
                          decode_chunk=8)
    reqs = [eng.submit(B.Request(prompt=p, seed=40 + i, max_tokens=10))
            for i, p in enumerate(prompts)]
    eng.run()
    assert calls["batch"] >= 2 and calls["serial"] == 0, calls
    for i, req in enumerate(reqs):
        want = single_stream(ckpt, prompts[i], 40 + i, 0.9, 10)
        assert req.prompt_ids + req.out_ids == want, f"req {i}"


def test_all_slots_pinned_raises_not_livelocks(ckpt):
    """A completion request that can never be admitted (every slot pinned by
    a conversation) must raise, not spin forever."""
    from qwen3_tpu.runtime.batched_chat import BatchedChat

    eng = BatchedEngine(ckpt, max_batch=1, seq_len=96, mode="exact",
                        temperature=0.0, prefill_bucket=16, decode_chunk=8)
    chat = BatchedChat(eng)
    conv = chat.new_conversation(seed=1)
    eng.submit(Request(prompt="the cat", seed=2, max_tokens=4))
    with pytest.raises(RuntimeError, match="pinned"):
        eng.run()
    chat.close(conv)
    [req] = eng.run()      # admissible after the pin drops
    assert req.finished


def test_more_requests_than_slots_all_finish(ckpt):
    eng = BatchedEngine(ckpt, max_batch=2, seq_len=96, mode="exact",
                        temperature=0.0, prefill_bucket=16, decode_chunk=8)
    reqs = [eng.submit(Request(prompt=p, seed=i, max_tokens=6))
            for i, p in enumerate(PROMPTS * 2)]
    done = eng.run()
    assert len(done) == len(reqs)
    assert all(r.finished for r in reqs)


def test_aot_dir_matches_jit(ckpt, tmp_path):
    """`aot_dir` routes the serving programs (decode chunk, batched and
    serial admission) through the cross-process executable cache
    (utils/aotcache); every stream must be identical to the plain jit
    path, both cold (compile + serialize) and warm (deserialize + load)."""

    def run(aot_dir):
        eng = BatchedEngine(ckpt, max_batch=4, seq_len=96, mode="exact",
                            temperature=0.0, prefill_bucket=16,
                            decode_chunk=8, aot_dir=aot_dir)
        reqs = [eng.submit(Request(prompt=p, seed=7 + i, max_tokens=10))
                for i, p in enumerate(PROMPTS)]
        eng.run()
        return [r.prompt_ids + r.out_ids for r in reqs]

    want = run(None)
    d = str(tmp_path / "exec")
    assert run(d) == want          # cold: compile (+ cache save if supported)
    assert run(d) == want          # warm: served from the cache when saved


@pytest.mark.parametrize("side_buffer", [True, False])
def test_static_bucket_matches_switch(tmp_path, monkeypatch, side_buffer):
    """Host-side static-bucket dispatch (QWEN3_TPU_STATIC_BUCKET=1 — an
    env-gated probe path, chip-measured slower than the lax.switch default,
    see ops/attention.py:_bucketed) must stay bit-equal to the switch
    bucketing. At seq_len=512 the engine has real sub-buckets (256 < S), so
    chunks run the sliced-prefix program — every stream must match the
    switch path exactly (cache rows past the mask contribute 0.0 either
    way)."""

    import dataclasses

    from qwen3_tpu.config import PRESETS
    from qwen3_tpu.io.synthetic import synthetic_tokenizer, synthetic_weights

    cfg = dataclasses.replace(PRESETS["tiny"], seq_len=1024)
    d = tmp_path / "deep"
    d.mkdir()
    path = str(d / "tiny1k.bin")
    write_checkpoint(path, synthetic_weights(cfg, seed=77))
    write_tokenizer_bin(path + ".tokenizer",
                        synthetic_tokenizer(vocab_size=cfg.vocab_size))

    def run():
        eng = BatchedEngine(path, max_batch=3, seq_len=512, mode="exact",
                            temperature=0.7, top_p=0.9, prefill_bucket=16,
                            decode_chunk=8, side_buffer=side_buffer)
        reqs = [eng.submit(Request(prompt=p, seed=31 + i, max_tokens=10))
                for i, p in enumerate(PROMPTS)]
        eng.run()
        return eng, [r.prompt_ids + r.out_ids for r in reqs]

    monkeypatch.setenv("QWEN3_TPU_STATIC_BUCKET", "1")
    eng, got = run()
    assert eng._attn_buckets is not None and len(eng._attn_buckets) > 1
    monkeypatch.delenv("QWEN3_TPU_STATIC_BUCKET")
    eng2, want = run()
    assert eng2._attn_buckets is None
    assert got == want


def test_static_bucket_chat_pinned_slots(tmp_path, monkeypatch):
    """Static-bucket dispatch with pinned conversation slots: between turns
    a pinned slot holds KV at rows < its frozen position with no live
    request, and `_pos_host` must keep covering it (a too-small bucket
    would let the frozen slot's two-segment attention read truncated main
    rows). Reply streams must match the switch path turn for turn."""

    import dataclasses

    from qwen3_tpu.config import PRESETS
    from qwen3_tpu.io.synthetic import synthetic_tokenizer, synthetic_weights
    from qwen3_tpu.runtime.batched_chat import BatchedChat

    cfg = dataclasses.replace(PRESETS["tiny"], seq_len=1024)
    d = tmp_path / "deep"
    d.mkdir()
    path = str(d / "tiny1k.bin")
    write_checkpoint(path, synthetic_weights(cfg, seed=78))
    write_tokenizer_bin(path + ".tokenizer",
                        synthetic_tokenizer(vocab_size=cfg.vocab_size))
    turns = ["the cat", "in the hat and er", "on at the the"]

    def run():
        eng = BatchedEngine(path, max_batch=3, seq_len=512, mode="exact",
                            temperature=0.8, top_p=0.9, prefill_bucket=16,
                            decode_chunk=8)
        chat = BatchedChat(eng)
        conv = chat.new_conversation(seed=11, system_prompt="sys")
        out = []
        for i, t in enumerate(turns):
            r = chat.submit_turn(conv, t)
            if i == 1:  # completion traffic interleaves mid-conversation
                eng.submit(Request(prompt="the the", seed=5, max_tokens=6))
            eng.run()
            chat.finish_turn(conv, r)
            out.append(list(r.out_ids))
        return eng, out

    monkeypatch.setenv("QWEN3_TPU_STATIC_BUCKET", "1")
    eng, got = run()
    assert eng._attn_buckets is not None and len(eng._attn_buckets) > 1
    monkeypatch.delenv("QWEN3_TPU_STATIC_BUCKET")
    _, want = run()
    assert got == want
