"""Integration tests: Engine completion + ChatSession vs. a literal C-semantics
loop driven by the NumPy oracle forward and host sampler."""

import numpy as np
import pytest

import oracle
from qwen3_tpu.io.checkpoint import write_checkpoint
from qwen3_tpu.io.tokenizer_bin import write_tokenizer_bin
from qwen3_tpu.runtime.chat import ChatSession, render_system, render_user
from qwen3_tpu.runtime.engine import Engine, EngineConfig
from qwen3_tpu.runtime.sampler import Sampler
from qwen3_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory, tiny_weights, tiny_tok):
    d = tmp_path_factory.mktemp("ckpt")
    path = str(d / "tiny.bin")
    write_checkpoint(path, tiny_weights)
    write_tokenizer_bin(path + ".tokenizer", tiny_tok)
    return path


def make_engine(ckpt, **kw):
    defaults = dict(path=ckpt, seed=42, temperature=1.0, top_p=0.9,
                    mode="exact", prefill_chunk=16)
    defaults.update(kw)
    return Engine(EngineConfig(**defaults))


def c_style_completion(weights, tok, prompt, seed, temperature, top_p,
                       seq_len, max_steps=None):
    """Literal reimplementation of src/completion.c:24-84 on the oracle."""
    ids = tok.encode(prompt)
    st = oracle.OracleState(weights, seq_len)
    sampler = Sampler(tok.vocab_size, temperature, top_p, seed)
    out = []
    token = ids[0]
    limit = seq_len if max_steps is None else min(seq_len, len(ids) + max_steps)
    for pos in range(limit):
        logits = oracle.forward(weights, st, token, pos)
        if pos + 1 < len(ids):
            nxt = ids[pos + 1]
        else:
            nxt = sampler.sample_host(logits)
        out.append(token)
        if nxt in (tok.special.bos, tok.special.eos):
            break
        token = nxt
    return out


def test_completion_matches_c_loop(ckpt, tiny_weights):
    eng = make_engine(ckpt, seed=42, temperature=0.8, top_p=0.9)
    tok = Tokenizer.from_file(ckpt)
    res = eng.generate("the cat in the hat", max_tokens=24)

    want = c_style_completion(tiny_weights, tok, "the cat in the hat",
                              seed=42, temperature=0.8, top_p=0.9,
                              seq_len=eng.model_cfg.seq_len, max_steps=24)
    assert res.ids == want


def test_completion_reproducible(ckpt):
    r1 = make_engine(ckpt, seed=7).generate("in the", max_tokens=16)
    r2 = make_engine(ckpt, seed=7).generate("in the", max_tokens=16)
    assert r1.ids == r2.ids
    r3 = make_engine(ckpt, seed=8).generate("in the", max_tokens=16)
    assert r3.ids != r1.ids  # different seed should diverge on a random model


def test_greedy_temperature_zero(ckpt, tiny_weights):
    eng = make_engine(ckpt, temperature=0.0)
    tok = Tokenizer.from_file(ckpt)
    res = eng.generate("and", max_tokens=10)

    st = oracle.OracleState(tiny_weights, eng.model_cfg.seq_len)
    ids = tok.encode("and")
    want = list(ids)
    token = ids[0]
    for pos in range(len(ids) + 10):
        logits = oracle.forward(tiny_weights, st, token, pos)
        if pos + 1 < len(ids):
            token = ids[pos + 1]
        else:
            token = int(np.argmax(logits))
            if token in (tok.special.bos, tok.special.eos):
                break
            if pos + 1 >= len(ids) + 10:
                break
            want.append(token)
    assert res.ids[: len(want)] == want


def test_chat_template_rendering(ckpt):
    eng = make_engine(ckpt)
    assert render_system(eng, "be brief") == \
        b"<|im_start|>system\nbe brief<|im_end|>\n"
    assert render_user(eng, "hi", think=True) == \
        b"<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n"
    assert render_user(eng, "hi", think=False) == (
        b"<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n"
        b"<think>\n\n</think>\n")


def c_style_chat_turn(weights, tok, sampler, st, pos, rendered, seq_len):
    """Literal reimplementation of the chat token loop
    (src/completion.c:279-348) for one turn."""
    ids = tok.encode(rendered)
    out = []
    user_idx = 0
    nxt = None
    while pos < seq_len:
        tid = ids[user_idx] if user_idx < len(ids) else nxt
        user_idx += 1
        logits = oracle.forward(weights, st, tid, pos)
        nxt = sampler.sample_host(logits)
        pos += 1
        if user_idx >= len(ids):
            if nxt in (tok.special.bos, tok.special.eos):
                break
            out.append(nxt)
    return out, pos


def test_chat_turn_matches_c_loop(ckpt, tiny_weights):
    seed = 99
    eng = make_engine(ckpt, seed=seed, temperature=0.9, top_p=0.95)
    tok = Tokenizer.from_file(ckpt)
    session = ChatSession(eng, system_prompt="sys")

    got = session.send("hello there")
    got_ids = tok.encode(got) if got else []

    st = oracle.OracleState(tiny_weights, eng.model_cfg.seq_len)
    sampler = Sampler(tok.vocab_size, 0.9, 0.95, seed)
    rendered = (render_system(eng, "sys") +
                render_user(eng, "hello there", think=True))
    want_ids, _ = c_style_chat_turn(tiny_weights, tok, sampler, st, 0,
                                    rendered, eng.model_cfg.seq_len)
    want = b"".join(tok.id_to_token(i) for i in want_ids)
    assert got == want


def test_chat_overflow_resets(ckpt):
    eng = make_engine(ckpt)
    session = ChatSession(eng)
    session.pos = eng.model_cfg.seq_len  # simulate exhausted context
    session.send("hi")
    assert session.pos <= eng.model_cfg.seq_len
    assert session.pos > 0  # restarted from 0 and consumed the new turn


def test_flash_attn_engine_matches_dense(ckpt):
    """Engine greedy decode with the flash attention backend must agree with
    the dense path (same values up to online-softmax fp32 reduction order;
    argmax over tame logits is stable)."""
    from qwen3_tpu.runtime.engine import Engine, EngineConfig

    outs = {}
    for attn in ("dense", "flash"):
        eng = Engine(EngineConfig(path=ckpt, seed=5, temperature=0.0,
                                  top_p=0.9, seq_len=96, mode="bf16",
                                  attn=attn, decode_chunk=16))
        outs[attn] = eng.generate("the thinker", max_tokens=24).ids
    assert outs["dense"] == outs["flash"]


def test_prefill_plan_graduated():
    """The shared chunk policy: graded ladder blocks for the bulk of long
    prompts, the configured chunk as floor/tail, never crossing seq_len."""
    from qwen3_tpu.runtime.decode_loop import prefill_blocks, prefill_plan

    # short prompt: identical to the ungraded policy (padded to the chunk)
    assert prefill_plan(10, 0, 64, 2048) == ((0, 64),)
    assert prefill_plan(100, 0, 64, 2048) == ((0, 64), (64, 64))
    # long prompt: 512 bulk, graded tail
    plan = prefill_plan(1000, 0, 64, 2048)
    assert plan[0] == (0, 512)
    assert sum(s for _, s in plan) >= 1000
    assert all(off + s <= 2048 for off, s in plan)
    # blocks cover the ids exactly, in order, padded to the plan width
    ids = list(range(1000))
    got = list(prefill_blocks(ids, 0, 64, 2048))
    assert [(o, len(b)) for o, b, _ in got] == [(o, s) for o, s in plan]
    flat = [t for _, b, n in got for t in b[:n]]
    assert flat == ids
    # near the cache edge the block is capped, not clamped
    plan = prefill_plan(600, 1600, 64, 2048)
    assert all(1600 + off + s <= 2048 for off, s in plan)
    # ladder respects a larger floor
    assert prefill_plan(200, 0, 256, 2048) == ((0, 256),)
