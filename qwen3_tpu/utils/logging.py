"""Observability conventions, matching the reference: stdout carries only
generated text; diagnostics go to stderr with [Component] prefixes
(SURVEY.md §5)."""

from __future__ import annotations

import os
import sys

_QUIET = os.environ.get("QWEN3_TPU_QUIET", "0") == "1"


def log(component: str, msg: str) -> None:
    if not _QUIET:
        print(f"[{component}] {msg}", file=sys.stderr, flush=True)
