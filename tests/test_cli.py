"""CLI smoke tests on the tiny synthetic checkpoint (in-process)."""

import io
import sys

import pytest

from qwen3_tpu.cli import main
from qwen3_tpu.io.checkpoint import write_checkpoint
from qwen3_tpu.io.tokenizer_bin import write_tokenizer_bin


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory, tiny_weights, tiny_tok):
    d = tmp_path_factory.mktemp("cli")
    path = str(d / "tiny.bin")
    write_checkpoint(path, tiny_weights)
    write_tokenizer_bin(path + ".tokenizer", tiny_tok)
    return path


def test_completion_mode(ckpt, capsys):
    rc = main([ckpt, "-m", "completion", "-i", "the cat", "-t", "0",
               "-s", "7", "-c", "64", "--qmode", "exact",
               "--max-tokens", "8"])
    assert rc == 0
    out = capsys.readouterr()
    assert "the cat" in out.out
    assert "[Params]" in out.err and "[pp " in out.err


def test_chat_mode_scripted_stdin(ckpt, capsys, monkeypatch):
    monkeypatch.setattr(sys, "stdin", io.StringIO("hi there\n\n"))
    rc = main([ckpt, "-m", "chat", "-t", "0", "-s", "3", "-c", "128",
               "-y", "sys", "--qmode", "exact"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "[t/ms" in err


def test_bad_mode_rejected(ckpt):
    with pytest.raises(SystemExit):
        main([ckpt, "-m", "nope"])
