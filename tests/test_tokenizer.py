"""Tokenizer semantics tests: heap-based merge vs. a literal reimplementation
of the C scan loop (src/tokenizer.c:229-287), special-token parsing, and
roundtrips."""

import numpy as np
import pytest

from qwen3_tpu.tokenizer import Tokenizer


def c_style_encode(tok: Tokenizer, data: bytes) -> list[int]:
    """Literal transcription of the reference selection semantics: rescan all
    adjacent pairs, pick the highest score with strict '>' (leftmost wins),
    merge, repeat."""
    ids = tok._pre_tokenize(data)
    while True:
        best_score, best_id, best_idx = -1e10, -1, -1
        for i in range(len(ids) - 1):
            merged = tok.token_to_id(tok.tokens[ids[i]] + tok.tokens[ids[i + 1]])
            if merged != -1 and tok.scores[merged] > best_score:
                best_score, best_id, best_idx = tok.scores[merged], merged, i
        if best_idx == -1:
            return ids
        ids[best_idx:best_idx + 2] = [best_id]


@pytest.fixture(scope="module")
def tok(tiny_tok):
    return Tokenizer(tiny_tok)


def test_byte_fallback_roundtrip(tok):
    data = "héllo wörld \x01\x7f".encode("utf-8")
    ids = tok.encode(data)
    assert tok.decode(ids) == data


def test_special_token_parse(tok):
    ids = tok.encode("<|im_start|>user\nhi<|im_end|>")
    assert ids[0] == tok.special.eot
    assert ids[-1] == tok.special.eos
    assert tok.decode(ids) == b"<|im_start|>user\nhi<|im_end|>"


def test_unclosed_angle_falls_back_to_byte(tok):
    ids = tok.encode("a < b")
    assert tok.decode(ids) == b"a < b"


def test_unknown_special_falls_back_to_byte(tok):
    # "<nope>" is not in the vocab: '<' becomes a byte token
    ids = tok.encode("<nope>")
    assert tok.decode(ids) == b"<nope>"
    assert len(ids) == 6


def test_merges_applied(tok):
    ids = tok.encode("the cat in the hat")
    # "the" and " the" (via merge chain) should appear as single tokens
    the_id = tok.token_to_id(b"the")
    assert the_id in ids
    assert tok.decode(ids) == b"the cat in the hat"


def test_think_tokens(tok):
    ids = tok.encode("<think>\n\n</think>\n")
    assert ids[0] == tok.special.bor
    assert tok.special.eor in ids


@pytest.mark.parametrize("seed", range(8))
def test_heap_merge_matches_c_scan_fuzz(tok, seed):
    rng = np.random.default_rng(seed)
    alphabet = b"the and in on er at reding \n<>|"
    n = int(rng.integers(1, 120))
    data = bytes(rng.choice(list(alphabet), size=n).tolist())
    assert tok.encode(data) == c_style_encode(tok, data)


def test_heap_merge_matches_c_scan_text(tok):
    text = ("The thinker thought then.  <|im_start|>assistant\n"
            "<think>\nreasoning here\n</think>\nanswer<|im_end|>")
    assert tok.encode(text) == c_style_encode(tok, text.encode())


def test_duplicate_token_first_id_wins(tiny_tok):
    import copy
    data = copy.deepcopy(tiny_tok)
    dup_target = data.tokens[300]
    data.tokens[400] = dup_target  # introduce duplicate at higher id
    t = Tokenizer(data)
    assert t.token_to_id(dup_target) == 300


def test_native_matches_python(tok, rng):
    """Native C++ encode core must agree with the Python implementation."""
    from qwen3_tpu.io.tokenizer_bin import dumps_tokenizer_bin
    from qwen3_tpu.tokenizer.native import load_native

    native = load_native(dumps_tokenizer_bin(tok._data))
    if native is None:
        import pytest
        pytest.skip("native tokenizer unavailable (no g++)")
    assert native.vocab_size == tok.vocab_size
    texts = ["the cat in the hat", "<|im_start|>user\nhi<|im_end|>",
             "héllo wörld", "a < b > c", "<think>\n\n</think>\n", ""]
    alphabet = b"the and in on er at reding \n<>|"
    for seed in range(6):
        r = __import__("numpy").random.default_rng(seed)
        n = int(r.integers(1, 300))
        texts.append(bytes(r.choice(list(alphabet), size=n).tolist()))
    for text in texts:
        assert native.encode(text) == tok.encode_python(text), text
