"""ctypes binding for the native C++ tokenizer core (native/tokenizer.cpp).

The shared library is built on demand with g++ and cached under .cache/;
`NativeTokenizer` is a drop-in for the encode path of tokenizer.bpe.Tokenizer
(identical semantics, ~10-50x faster on long prompts). Falls back cleanly:
callers should use `load_native()` and keep the Python tokenizer if it
returns None.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_REPO = Path(__file__).resolve().parents[2]
_SRC = _REPO / "native" / "tokenizer.cpp"
_LIB = _REPO / ".cache" / "libqtok.so"

_lib = None


def _build() -> Path | None:
    if not _SRC.exists():
        return None
    _LIB.parent.mkdir(exist_ok=True)
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=300)
        return _LIB
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.qtok_create.restype = ctypes.c_void_p
    lib.qtok_create.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.qtok_free.argtypes = [ctypes.c_void_p]
    lib.qtok_vocab_size.restype = ctypes.c_int32
    lib.qtok_vocab_size.argtypes = [ctypes.c_void_p]
    lib.qtok_encode.restype = ctypes.c_int32
    lib.qtok_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    _lib = lib
    return lib


class NativeTokenizer:
    """Native encode core over a serialized .tokenizer blob."""

    def __init__(self, blob: bytes):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native tokenizer unavailable")
        self._lib = lib
        self._h = lib.qtok_create(blob, len(blob))
        if not self._h:
            raise ValueError("bad tokenizer blob")

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.qtok_free(self._h)
            self._h = None

    @property
    def vocab_size(self) -> int:
        return self._lib.qtok_vocab_size(self._h)

    def encode(self, text: str | bytes) -> list[int]:
        data = text.encode("utf-8") if isinstance(text, str) else text
        cap = max(len(data), 16)
        buf = (ctypes.c_int32 * cap)()
        n = self._lib.qtok_encode(self._h, data, len(data), buf, cap)
        if n < 0:
            raise RuntimeError("tokenizer output overflow")
        return list(buf[:n])


def load_native(blob: bytes) -> NativeTokenizer | None:
    try:
        return NativeTokenizer(blob)
    except (RuntimeError, ValueError):
        return None
