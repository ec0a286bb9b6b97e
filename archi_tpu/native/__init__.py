"""Native (C++) components: build + ctypes bindings.

``text_analyzer.cc`` is compiled on demand (g++ available in the image) into
``libtext_analyzer.so`` next to the source; if compilation fails (no
toolchain) every consumer transparently falls back to the pure-Python
implementations.  Non-ASCII inputs always take the Python path so Unicode
normalization lives in exactly one implementation.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "text_analyzer.cc")
_SO = os.path.join(_DIR, "libtext_analyzer.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # no toolchain / failed build → python fallback
        logger.info("native build unavailable: %s", e)
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """The compiled library, building it on first use; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            logger.info("native load failed: %s", e)
            return None
        lib.ta_analyze.restype = ctypes.c_int
        lib.ta_analyze.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                   ctypes.c_char_p, ctypes.c_int]
        lib.wp_create.restype = ctypes.c_void_p
        lib.wp_create.argtypes = [ctypes.c_char_p]
        lib.wp_free.argtypes = [ctypes.c_void_p]
        lib.wp_encode.restype = ctypes.c_int
        lib.wp_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def is_ascii(text: str) -> bool:
    try:
        text.encode("ascii")
        return True
    except UnicodeEncodeError:
        return False


def _build_translit_table() -> dict[int, str]:
    """Semantics-preserving ASCII transliteration for the analyzer path.

    Maps characters whose ``analyze()`` outcome is identical after
    substitution: accented Latin letters → NFD base letter (the Python path
    strips accents the same way), Unicode punctuation → '.' (separate
    token, filtered either way), Unicode spaces → ' '.  Symbols (S*) and
    non-Latin scripts stay unmapped so those texts keep the Python path.
    """
    import unicodedata

    table: dict[int, str] = {}
    for cp in range(0x80, 0x2700):
        ch = chr(cp)
        cat = unicodedata.category(ch)
        if cat == "Mn":
            table[cp] = ""
        elif cat.startswith(("P", "S")):
            table[cp] = "."
        elif cat.startswith("Z"):
            table[cp] = " "
        elif cat.startswith("L"):
            decomp = unicodedata.normalize("NFD", ch)
            base = "".join(c for c in decomp
                           if unicodedata.category(c) != "Mn")
            if base and is_ascii(base):
                table[cp] = base.lower()
    return table


_TRANSLIT = _build_translit_table()


def native_analyze(text: str, *, stemming: bool = False) -> Optional[list[str]]:
    """BM25 term analysis via C++; None → caller uses the Python path."""
    lib = load_library()
    if lib is None:
        return None
    if not is_ascii(text):
        text = text.translate(_TRANSLIT)
        if not is_ascii(text):
            return None
    raw = text.encode("ascii")
    cap = max(len(raw) * 2 + 16, 256)
    buf = ctypes.create_string_buffer(cap)
    n = lib.ta_analyze(raw, 1 if stemming else 0, buf, cap)
    if n < 0:
        return None
    if n == 0:
        return []
    return buf.value.decode("ascii").split("\x01")


class NativeWordPiece:
    """ctypes wrapper over the C++ WordPiece encoder."""

    def __init__(self, vocab: dict[str, int]):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        # id = line index ⇒ emit tokens in id order
        ordered = sorted(vocab.items(), key=lambda kv: kv[1])
        assert [i for _t, i in ordered] == list(range(len(ordered))), \
            "vocab ids must be dense 0..n-1"
        blob = "\n".join(t for t, _i in ordered).encode("utf-8")
        self._handle = lib.wp_create(blob)

    def encode(self, text: str, max_length: int, *, cls_id: int,
               sep_id: int, unk_id: int) -> Optional[list[int]]:
        if not is_ascii(text):
            return None
        cap = max_length + 8
        out = (ctypes.c_int * cap)()
        n = self._lib.wp_encode(
            self._handle, text.encode("ascii"), max_length, out, cap,
            cls_id, sep_id, unk_id,
        )
        if n < 0:
            return None
        return list(out[:n])

    def __del__(self):
        try:
            self._lib.wp_free(self._handle)
        except Exception:
            pass
