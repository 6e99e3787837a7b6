"""One real end-to-end 8B serve (VERDICT r2 #8): the actual multi-GB
`.bin` through load -> pack cache -> serve.py on the chip, recording
wall-clock for every stage plus steady-state tok/s — retiring the
"device-synth only" caveat on the 8B story.

Stages (each skipped if its artifact already exists):
  1. generate .cache/deepseek-r1-qwen3-8b.bin (+ tokenizer)   [host]
  2. build the pack cache <ckpt>.pack/pallas/                 [host CPU]
  3. serve.py --qmode pallas --kv-dtype int8 --attn flash -c 32768,
     one prompt, greedy, --max-tokens N                       [chip]

Writes E2E_8B.json at the repo root:
  {"gen_s": ..., "pack_s": ..., "serve": {"wall_s": ..., "engine_ready_s":
   ..., "steady_tok_s": ...}}
Stage wall-clocks from a previous run are preserved across re-runs (the
artifact is merged, not overwritten); a stage skipped because its artifact
already existed and no prior timing is on record is recorded as null.

Usage: python tools/e2e_8b.py [--max-tokens 96] [--ctx 32768] [--skip-serve]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
# env overrides exist so the test suite can dry-run the whole stage logic
# against a tiny synthetic checkpoint on CPU (tests/test_e2e_tool.py)
CACHE = Path(os.environ.get("QWEN3_E2E_CACHE", REPO / ".cache"))
PRESET = os.environ.get("QWEN3_E2E_PRESET", "deepseek-r1-qwen3-8b")
ARTIFACT = Path(os.environ.get("QWEN3_E2E_ARTIFACT", REPO / "E2E_8B.json"))
CKPT = CACHE / f"{PRESET}.bin"


def _child_env() -> dict:
    # children import qwen3_tpu regardless of the caller's cwd
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}{env['PYTHONPATH']}" \
        if env.get("PYTHONPATH") else str(REPO)
    return env


def run_logged(cmd: list[str], log: Path, timeout: float) -> tuple[float, str]:
    t0 = time.time()
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, env=_child_env())
    except subprocess.TimeoutExpired as e:
        # preserve whatever the stage printed before the timeout — the
        # longest stages (gen/pack) are exactly where diagnostics matter
        out = _decode(e.stdout) + _decode(e.stderr)
        log.write_text(out)
        raise
    out = (r.stdout or "") + (r.stderr or "")
    log.write_text(out)
    if r.returncode != 0:
        raise RuntimeError(f"{cmd[0]}..{cmd[-1]} rc={r.returncode}: "
                           f"{out[-500:]}")
    return time.time() - t0, out


def _decode(b) -> str:
    if b is None:
        return ""
    return b.decode("utf-8", "replace") if isinstance(b, bytes) else b


def pack_is_fresh(pack: Path, ckpt: Path) -> bool:
    """Mirror models.load_params' meta validation (src size + mtime) so a
    stale pack (e.g. .bin regenerated after a cache reset) is rebuilt here
    on the host instead of silently inside the chip serve stage."""
    meta_path = pack / "meta.json"
    if not meta_path.exists():
        return False
    try:
        meta = json.loads(meta_path.read_text())
        st = ckpt.stat()
    except (ValueError, OSError):
        return False
    return (meta.get("src_size") == st.st_size
            and meta.get("src_mtime_ns") == st.st_mtime_ns)


def parse_serve_output(stdout: str, stderr: str) -> dict:
    """Extract the serve-stage metrics from serve.py's stdout JSON lines
    and stderr diagnostics (qwen3_tpu/serve.py:82,107)."""
    serve: dict = {}
    m = re.search(r"engine ready in ([0-9.]+)s", stderr)
    if m:
        serve["engine_ready_s"] = float(m.group(1))
    m = re.search(r"(\d+) tokens in ([0-9.]+)s \(([0-9.]+) tok/s", stderr)
    if m:
        serve["n_tokens"] = int(m.group(1))
        serve["agg_tok_s"] = float(m.group(3))
    for line in stdout.splitlines():
        try:
            row = json.loads(line)
        except ValueError:
            continue
        serve["generate_ms"] = row.get("generate_ms")
        serve["prompt_ms"] = row.get("prompt_ms")
        if row.get("n_tokens") and row.get("generate_ms"):
            serve["steady_tok_s"] = round(
                row["n_tokens"] / (row["generate_ms"] / 1e3), 2)
    return serve


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-tokens", type=int, default=96)
    ap.add_argument("--ctx", type=int, default=32768)
    ap.add_argument("--skip-serve", action="store_true",
                    help="host-only stages (gen + pack) while the TPU is busy")
    args = ap.parse_args()

    result: dict = {}
    if ARTIFACT.exists():
        try:
            result = json.loads(ARTIFACT.read_text())
        except ValueError:
            result = {}
    result.update({"preset": PRESET, "ctx": args.ctx})
    logdir = Path(f"/tmp/e2e_8b_logs_{PRESET}")
    logdir.mkdir(exist_ok=True)

    if not CKPT.exists():
        print("[e2e-8b] stage 1: generating the .bin ...", flush=True)
        dt, _ = run_logged([sys.executable, str(REPO / "tools/gen_8b_ckpt.py")],
                           logdir / "gen.log", 7200)
        result["gen_s"] = round(dt, 1)
    else:
        result.setdefault("gen_s", None)  # artifact pre-existed, no timing
    result["bin_gib"] = round(CKPT.stat().st_size / 2**30, 2)

    pack = CKPT.parent / f"{CKPT.name}.pack" / "pallas"
    if not pack_is_fresh(pack, CKPT):
        print("[e2e-8b] stage 2: building the pack cache (host CPU, "
              "tens of minutes)...", flush=True)
        dt, _ = run_logged(
            [sys.executable, str(REPO / "tools/pack_ckpt.py"), str(CKPT),
             "pallas"], logdir / "pack.log", 14400)
        result["pack_s"] = round(dt, 1)
    else:
        result.setdefault("pack_s", None)

    if not args.skip_serve:
        print("[e2e-8b] stage 3: serving on the chip ...", flush=True)
        prompt = ("the thinker thought the thought and the thought thought "
                  "in the thinker and ") * 8
        qmode = os.environ.get("QWEN3_E2E_QMODE", "pallas")
        attn = os.environ.get("QWEN3_E2E_ATTN", "flash")
        kv = os.environ.get("QWEN3_E2E_KV", "int8")
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "qwen3_tpu.serve", str(CKPT),
             "--batch", "1", "--qmode", qmode, "--kv-dtype", kv,
             "--attn", attn, "-c", str(args.ctx), "-t", "0", "-s", "3",
             "--max-tokens", str(args.max_tokens),
             "--aot-dir", str(CACHE / "exec")],
            input=prompt + "\n", capture_output=True, text=True,
            timeout=7200, env=_child_env())
        wall = time.time() - t0
        (logdir / "serve.log").write_text(r.stdout + "\n--- stderr ---\n"
                                          + r.stderr)
        if r.returncode != 0:
            raise RuntimeError(f"serve failed rc={r.returncode}: "
                               f"{r.stderr[-500:]}")
        serve = parse_serve_output(r.stdout, r.stderr)
        serve["wall_s"] = round(wall, 1)
        serve["qmode"], serve["attn"], serve["kv_dtype"] = qmode, attn, kv
        result["serve"] = serve

    ARTIFACT.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
