"""Quality at depth: run tools.quality_table at long context with the
production serving numerics (pallas + int8 KV) and merge the result into
QUALITY.json under a "<preset>@<ctx>" key — the depth axis VERDICT r4 #5
asks for (every 32k serving claim rides on int8-KV numerics that had only
been quality-gated at ctx 2048; the error of the per-(position, head)
scales accumulates over the O(pos) attention read, src/forward.c:156-165,
so depth must be measured, not assumed).

    python tools/quality_depth.py <preset> <ctx> [--modes exact,pallas]

Uses the cached synthetic checkpoint .cache/<preset>.bin (weight values
don't affect kernel-numerics comparisons; quality_table docstring).
"""

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("preset")
    ap.add_argument("ctx", type=int)
    ap.add_argument("--modes", default="exact,pallas")
    args = ap.parse_args()

    ckpt = REPO / ".cache" / f"{args.preset}.bin"
    if not ckpt.exists():
        print(f"missing {ckpt}", file=sys.stderr)
        return 1
    cmd = [sys.executable, "-m", "qwen3_tpu.tools.quality_table", str(ckpt),
           "-c", str(args.ctx), "--modes", args.modes]
    if args.ctx >= 16384:
        # halve the dense-attention score temps ([1, chunk, H, ctx] fp32)
        # so the exact-mode fp32-KV evaluation fits beside the weights
        cmd += ["--chunk", "128"]
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=str(REPO / ".cache" / "jaxcache"))
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=str(REPO))
    sys.stderr.write(r.stderr[-4000:])
    if r.returncode not in (0, 1):
        print(f"quality_table failed rc={r.returncode}", file=sys.stderr)
        return 2
    table = json.loads(r.stdout.strip().splitlines()[-1])

    qpath = REPO / "QUALITY.json"
    q = json.loads(qpath.read_text()) if qpath.exists() else {
        "metric": "delta_ppl", "tables": {}}
    q.setdefault("tables", {})[f"{args.preset}@{args.ctx}"] = {
        "ctx": table["ctx"], "tokens": table["tokens"],
        "rows": table["rows"], "pass": table["pass"]}
    q["pass"] = all(t.get("pass") for t in q["tables"].values())
    qpath.write_text(json.dumps(q, indent=1))
    print(json.dumps({"merged": f"{args.preset}@{args.ctx}",
                      "pass": table["pass"], "overall": q["pass"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
