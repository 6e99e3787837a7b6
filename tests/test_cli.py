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


def test_completion_tp2_matches_tp1(ckpt, capsys):
    """--tp 2 builds a (1,2) mesh over the virtual CPU devices and must
    reproduce the single-device greedy stream (pallas mode)."""
    rc = main([ckpt, "-m", "completion", "-i", "the cat", "-t", "0",
               "-s", "7", "-c", "64", "--qmode", "pallas",
               "--max-tokens", "8", "--tp", "2"])
    assert rc == 0
    out_tp = capsys.readouterr().out
    rc = main([ckpt, "-m", "completion", "-i", "the cat", "-t", "0",
               "-s", "7", "-c", "64", "--qmode", "pallas",
               "--max-tokens", "8"])
    assert rc == 0
    assert capsys.readouterr().out == out_tp


def test_bad_mode_rejected(ckpt):
    with pytest.raises(SystemExit):
        main([ckpt, "-m", "nope"])


def test_model_check_tool(ckpt, capsys):
    from qwen3_tpu.tools.model_check import main
    assert main([ckpt]) == 0
    assert main(["/nonexistent.bin"]) == 1
    assert main([]) == 2


def test_tokenizer_check_tool(ckpt, capsys):
    from qwen3_tpu.tools.tokenizer_check import main
    assert main([ckpt, "hello world", "the thinker"]) == 0
    out = capsys.readouterr().out
    assert "ids" in out and "ok" in out


def test_eval_cli(ckpt, capsys, monkeypatch):
    import io as _io
    import sys as _sys
    from qwen3_tpu.eval.__main__ import main
    monkeypatch.setattr(_sys, "stdin",
                        _io.StringIO("the thinker thought a thought"))
    assert main([ckpt, "--qmode", "bf16"]) == 0
    assert '"ppl"' in capsys.readouterr().out


def test_profile_flag_captures_trace(ckpt, tmp_path, capsys):
    """--profile captures a real device trace (utils/profiling.py) around
    the generation."""
    trace_dir = str(tmp_path / "trace")
    rc = main([ckpt, "-m", "completion", "-i", "the cat", "-t", "0",
               "-s", "7", "-c", "64", "--max-tokens", "4",
               "--profile", trace_dir])
    assert rc == 0
    import pathlib
    files = list(pathlib.Path(trace_dir).rglob("*"))
    assert any(f.is_file() for f in files), files


def test_quality_table_tool(ckpt, capsys):
    """Delta-ppl table across quant paths on the tiny model (the BASELINE.md
    <=0.05 criterion tool; run at 0.6B+ scale on real hardware)."""
    import json as _json
    from qwen3_tpu.tools.quality_table import main as qmain
    rc = qmain([ckpt, "-c", "64", "--chunk", "32",
                "--modes", "exact,pallas,bf16"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    row = _json.loads(out)
    assert row["metric"] == "delta_ppl"
    assert set(row["rows"]) == {"exact", "pallas", "bf16", "pallas+int8kv"}
    assert row["rows"]["exact"]["delta"] == 0.0
    # pallas IS the exact integer math — delta stays epsilon-tiny
    assert abs(row["rows"]["pallas"]["delta"]) < 1e-3
    assert rc in (0, 1)


def test_serve_cli(ckpt, tmp_path, capsys):
    """Batch-serving CLI: one JSON line per request, reproducible with -s."""
    import json as _json
    from qwen3_tpu.serve import main as smain

    pf = tmp_path / "prompts.txt"
    pf.write_text("the cat\nin a hat\ner on at\n")
    rc = smain([ckpt, "-t", "0.8", "-s", "5", "-c", "96", "--batch", "2",
                "--max-tokens", "6", "--qmode", "exact",
                "--prefill-bucket", "16", "--decode-chunk", "4",
                "--prompts", str(pf)])
    assert rc == 0
    rows = [_json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert sorted(r["id"] for r in rows) == [0, 1, 2]
    assert all(0 < r["n_tokens"] <= 6 for r in rows)

    rc = smain([ckpt, "-t", "0.8", "-s", "5", "-c", "96", "--batch", "3",
                "--max-tokens", "6", "--qmode", "exact",
                "--prefill-bucket", "16", "--decode-chunk", "4",
                "--prompts", str(pf)])
    assert rc == 0
    rows2 = [_json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    # same seeds -> same texts regardless of slot-pool size
    by_id = lambda rs: {r["id"]: r["text"] for r in rs}
    assert by_id(rows) == by_id(rows2)
