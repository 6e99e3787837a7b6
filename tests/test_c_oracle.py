"""Golden-token oracle tests against the actual reference C engine.

The reference source (read-only at /root/reference) is built once into /tmp
scratch and run on the same synthetic checkpoint/tokenizer our engine loads.
Greedy and seeded-sampled token streams must match byte-for-byte. Skipped when
the reference or a C toolchain is unavailable.
"""

import shutil
import subprocess
from pathlib import Path

import pytest

from qwen3_tpu.io.checkpoint import write_checkpoint
from qwen3_tpu.io.tokenizer_bin import write_tokenizer_bin
from qwen3_tpu.runtime.chat import ChatSession
from qwen3_tpu.runtime.engine import Engine, EngineConfig
from qwen3_tpu.tokenizer import Tokenizer

REF_SRC = Path("/root/reference")
BUILD = Path("/tmp/qwen3_ref_test")


@pytest.fixture(scope="module")
def ref_bin():
    if not REF_SRC.exists():
        pytest.skip("reference source unavailable")
    if shutil.which("cmake") is None:
        pytest.skip("no cmake")
    exe = BUILD / "build" / "examples" / "qwen"
    if not exe.exists():
        # the reference cmake writes executables into its source tree, which
        # is mounted read-only — stage a scratch copy
        shutil.rmtree(BUILD, ignore_errors=True)
        shutil.copytree(REF_SRC, BUILD)
        subprocess.run(
            ["cmake", "-S", str(BUILD), "-B", str(BUILD / "build"),
             "-DCMAKE_BUILD_TYPE=Release"],
            check=True, capture_output=True)
        subprocess.run(["cmake", "--build", str(BUILD / "build"), "-j", "4"],
                       check=True, capture_output=True)
    return exe


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory, tiny_weights, tiny_tok):
    d = tmp_path_factory.mktemp("oracle")
    path = str(d / "tiny.bin")
    write_checkpoint(path, tiny_weights)
    write_tokenizer_bin(path + ".tokenizer", tiny_tok)
    return path


def run_ref_completion(exe, ckpt, prompt, temp, top_p, seed, ctx):
    r = subprocess.run(
        [str(exe), ckpt, "-m", "completion", "-i", prompt, "-t", str(temp),
         "-p", str(top_p), "-s", str(seed), "-c", str(ctx)],
        capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr.decode(errors="replace")
    assert r.stdout.endswith(b"\n")
    return r.stdout[:-1]  # strip the trailing newline the CLI adds


def run_ref_chat(exe, ckpt, user, temp, top_p, seed, ctx, system=None):
    args = [str(exe), ckpt, "-m", "chat", "-t", str(temp), "-p", str(top_p),
            "-s", str(seed), "-c", str(ctx)]
    if system is not None:
        args += ["-y", system]
    r = subprocess.run(args, input=(user + "\n\n").encode(),
                       capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr.decode(errors="replace")
    # stdout framing: "\n> " prompt, assistant text, then either "\n" + next
    # "\n> " prompt (EOS path — detectable by the [pp/tg] metrics line on
    # stderr) or just the next "\n> " (context-overflow path)
    out = r.stdout
    assert out.startswith(b"\n> ")
    out = out[3:]
    assert out.endswith(b"\n> ")
    out = out[:-3]
    if b"[pp " in r.stderr:  # EOS path printed one extra newline
        assert out.endswith(b"\n")
        out = out[:-1]
    return out


def make_engine(ckpt, temp, top_p, seed, ctx, think=True):
    return Engine(EngineConfig(path=ckpt, think=think, seed=seed,
                               temperature=temp, top_p=top_p, seq_len=ctx,
                               mode="exact", prefill_chunk=16))


def test_tokenizer_parity_with_c(ref_bin, artifacts):
    tok_exe = ref_bin.parent / "tokenizer"
    tok = Tokenizer.from_file(artifacts)
    texts = ["the cat <|im_end|> sat", "héllo wörld", "a<b>c",
             "<|im_start|>user\nhi there<|im_end|>", "<think>\n\n</think>\n"]
    r = subprocess.run([str(tok_exe), artifacts + ""] + texts,
                       capture_output=True, timeout=60)
    assert r.returncode == 0
    lines = [l for l in r.stdout.decode(errors="replace").splitlines()
             if l.startswith("Tokens: ")]
    assert len(lines) == len(texts)
    for text, line in zip(texts, lines):
        want = [int(x) for x in line[len("Tokens: "):].split()]
        assert tok.encode(text) == want, text


def test_greedy_completion_matches_c(ref_bin, artifacts):
    prompt = "the cat in the hat"
    want = run_ref_completion(ref_bin, artifacts, prompt,
                              temp=0, top_p=0.9, seed=1, ctx=64)
    eng = make_engine(artifacts, temp=0.0, top_p=0.9, seed=1, ctx=64)
    got = eng.generate(prompt).text
    assert got == want


def test_seeded_sampled_completion_matches_c_prefix(ref_bin, artifacts):
    """Seeded stream parity. Bit-exact full-stream equality vs. the C binary
    is not achievable: the reference builds with -Ofast -march=native, whose
    fp reassociation shifts logits by ~1e-6, flipping inverse-CDF picks at
    near-tie boundaries (random-weight distributions are nearly flat, so
    boundaries are dense). We assert a long common prefix, which verifies the
    full RNG draw-count/order wiring and sampler semantics end-to-end. Note
    the C engine silently drops token 0 (printf of an embedded NUL), so we
    compare byte streams with \\x00 stripped."""
    prompt = "in the and"
    want = run_ref_completion(ref_bin, artifacts, prompt,
                              temp=0.9, top_p=0.9, seed=777, ctx=64)
    eng = make_engine(artifacts, temp=0.9, top_p=0.9, seed=777, ctx=64)
    got = eng.generate(prompt).text.replace(b"\x00", b"")
    prefix = 0
    for a, b in zip(got, want):
        if a != b:
            break
        prefix += 1
    assert prefix >= len(prompt) + 20, (got, want)


def test_greedy_multiturn_chat_matches_c(ref_bin, artifacts):
    """Two consecutive greedy turns: validates multi-turn KV continuation,
    per-turn RNG continuity and system-prompt-once semantics by comparing
    the C binary's complete stdout byte stream against a reconstruction from
    our ChatSession."""
    users = ["hello there", "and er on"]
    r = subprocess.run(
        [str(ref_bin), artifacts, "-m", "chat", "-t", "0", "-p", "0.9",
         "-s", "11", "-c", "128", "-y", "be brief"],
        input=("\n".join(users) + "\n\n").encode(),
        capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr.decode(errors="replace")

    eng = make_engine(artifacts, temp=0.0, top_p=0.9, seed=11, ctx=128)
    session = ChatSession(eng, system_prompt="be brief")
    expected = b""
    for u in users:
        expected += b"\n> " + session.send(u).replace(b"\x00", b"")
        if session.last_stop == "eos":
            expected += b"\n"
    expected += b"\n> "
    assert r.stdout == expected


def test_greedy_chat_turn_matches_c(ref_bin, artifacts):
    """Greedy chat (temp -> epsilon => argmax): template rendering, RNG-burn
    ordering, turn flow and stop handling must match the C binary exactly.
    (Full seeded chat parity vs. our own C-semantics loop is covered in
    test_engine.py::test_chat_turn_matches_c_loop.)"""
    want = run_ref_chat(ref_bin, artifacts, "hello there",
                        temp=0, top_p=0.95, seed=123, ctx=128, system="sys")
    eng = make_engine(artifacts, temp=0.0, top_p=0.95, seed=123, ctx=128)
    session = ChatSession(eng, system_prompt="sys")
    got = session.send("hello there").replace(b"\x00", b"")
    assert got == want
