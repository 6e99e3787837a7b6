"""Dry-run coverage for tools/e2e_8b.py (VERDICT r3 #8): the stage
skip/run logic, pack freshness validation, artifact merging, and the
serve-log parsing are all exercised on CPU with the tiny preset, so the
real 8B run on the chip doesn't die to a regex or a stale-pack branch."""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TOOL = REPO / "tools" / "e2e_8b.py"

sys.path.insert(0, str(REPO / "tools"))
import e2e_8b  # noqa: E402


def _env(tmp_path):
    env = dict(os.environ)
    env.update({
        "QWEN3_E2E_PRESET": "tiny",
        "QWEN3_E2E_SEQ_LEN": "128",
        "QWEN3_E2E_CACHE": str(tmp_path / "cache"),
        "QWEN3_E2E_ARTIFACT": str(tmp_path / "E2E.json"),
        "JAX_PLATFORMS": "cpu",
    })
    return env


def test_host_stages_and_artifact_merge(tmp_path):
    env = _env(tmp_path)
    art = Path(env["QWEN3_E2E_ARTIFACT"])

    # cold run: gen + pack execute, serve skipped
    r = subprocess.run(
        [sys.executable, str(TOOL), "--skip-serve"], env=env,
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    got = json.loads(art.read_text())
    assert got["preset"] == "tiny"
    assert got["gen_s"] is not None and got["pack_s"] is not None
    assert got["bin_gib"] >= 0
    ckpt = Path(env["QWEN3_E2E_CACHE"]) / "tiny.bin"
    assert ckpt.exists()
    assert (ckpt.parent / "tiny.bin.pack" / "pallas" / "meta.json").exists()

    # warm re-run: both stages skip, prior timings preserved (not nulled)
    prior = (got["gen_s"], got["pack_s"])
    r = subprocess.run(
        [sys.executable, str(TOOL), "--skip-serve"], env=env,
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stdout + r.stderr
    got = json.loads(art.read_text())
    assert (got["gen_s"], got["pack_s"]) == prior

    # stale pack (bin rewritten => mtime_ns changes): stage 2 re-runs
    ckpt.touch()
    r = subprocess.run(
        [sys.executable, str(TOOL), "--skip-serve"], env=env,
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "stage 2" in r.stdout


def test_pack_is_fresh(tmp_path):
    ckpt = tmp_path / "m.bin"
    ckpt.write_bytes(b"x" * 64)
    pack = tmp_path / "m.bin.pack" / "pallas"
    assert not e2e_8b.pack_is_fresh(pack, ckpt)  # no meta.json
    pack.mkdir(parents=True)
    st = ckpt.stat()
    (pack / "meta.json").write_text(json.dumps(
        {"src_size": st.st_size, "src_mtime_ns": st.st_mtime_ns}))
    assert e2e_8b.pack_is_fresh(pack, ckpt)
    ckpt.write_bytes(b"y" * 65)  # size + mtime change
    assert not e2e_8b.pack_is_fresh(pack, ckpt)
    (pack / "meta.json").write_text("not json")
    assert not e2e_8b.pack_is_fresh(pack, ckpt)


def test_parse_serve_output():
    # canned lines in the exact shapes serve.py emits (serve.py:82,99,107)
    stderr = ("[Serve] loading x (mode=pallas, batch=1, tp=1, dp=1)\n"
              "[Serve] engine ready in 42.5s (checkpoint load + pack cache"
              " + device transfer)\n"
              "[Serve] 1 requests, 96 tokens in 2.35s (40.8 tok/s"
              " aggregate)\n")
    stdout = json.dumps({"id": 0, "prompt": "p", "text": "t",
                         "n_tokens": 96, "prompt_ms": 812.0,
                         "generate_ms": 1530.0}) + "\n"
    got = e2e_8b.parse_serve_output(stdout, stderr)
    assert got["engine_ready_s"] == 42.5
    assert got["n_tokens"] == 96 and got["agg_tok_s"] == 40.8
    assert got["steady_tok_s"] == round(96 / 1.530, 2)
    # junk-tolerant: non-JSON stdout lines and missing stderr lines
    assert e2e_8b.parse_serve_output("garbage\n", "") == {}
