"""Optional system-libwebp binding (ctypes, no pip dependency).

Two jobs:

* **Lossy-WebP decode path** — full VP8 intra-frame decoding needs the
  RFC 6386 default probability tables (coefficient update/default probs,
  kf B-mode probs — several KB of constants not reproducible offline),
  so a from-spec Python decoder cannot be built verifiably in this
  sandbox (same blocker class as the o200k ranks data). When the
  platform ships ``libwebp.so`` (most Linux distros), this binding
  decodes lossy and lossless WebP natively; when it doesn't, callers
  keep their documented NotImplementedError/None behavior. Gated behind
  availability per the environment rules (import-try analog for a
  shared library).

* **Real-encoder validation oracle** — ``encode_lossless_rgba`` produces
  genuine libwebp VP8L streams, letting tests validate the from-spec
  ``webp_decode`` module against a real encoder instead of hand-packed
  fixtures only (the ADVICE r4 ask: the hand-packed cross-color fixture
  had encoded the same channel-swap bug the decoder had; a real-encoder
  round-trip can't share bugs with the code under test).

The from-spec VP8L decoder stays the primary lossless path — it has no
system dependency; this module never shadows it.
"""

from __future__ import annotations

import ctypes
import ctypes.util


_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            lib.WebPGetInfo.restype = ctypes.c_int
            lib.WebPGetInfo.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ]
            lib.WebPEncodeRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ]
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [ctypes.c_void_p]
            _LIB = lib
            break
        except OSError:
            continue
    return _LIB


def available() -> bool:
    return _load() is not None


def decode_rgba(data: bytes):
    """(width, height, rgba_bytes) or None (lib absent / undecodable)."""
    lib = _load()
    if lib is None or not data:
        return None
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    ptr = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        return None
    try:
        n = w.value * h.value * 4
        rgba = ctypes.string_at(ptr, n)
    finally:
        lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
    return w.value, h.value, rgba


def encode_lossless_rgba(rgba: bytes, width: int, height: int) -> bytes | None:
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeLosslessRGBA(
        rgba, width, height, width * 4, ctypes.byref(out)
    )
    if not size or not out:
        return None
    try:
        return ctypes.string_at(out, size)
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))


def encode_lossy_rgba(rgba: bytes, width: int, height: int,
                      quality: float = 75.0) -> bytes | None:
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeRGBA(
        rgba, width, height, width * 4, ctypes.c_float(quality),
        ctypes.byref(out)
    )
    if not size or not out:
        return None
    try:
        return ctypes.string_at(out, size)
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))


def decode_luma(data: bytes):
    """(width, height, luma ndarray) via the native decoder — the same
    REC-601 luma the pure-Python decoders produce."""
    import numpy as np

    decoded = decode_rgba(data)
    if decoded is None:
        return None
    width, height, rgba = decoded
    arr = np.frombuffer(rgba, dtype=np.uint8).reshape(height, width, 4)
    luma = (
        0.299 * arr[:, :, 0].astype(np.float64)
        + 0.587 * arr[:, :, 1]
        + 0.114 * arr[:, :, 2]
    )
    return width, height, luma
