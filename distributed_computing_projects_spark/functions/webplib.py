"""ctypes binding to the system ``libwebp`` — WebP image decode (and
the lossless encoder the fixture stage uses).

WebP is a top-3 image format on the modern web, so a crawl-ingest
multimodal tier that drops it loses real coverage. Like the zstd seam
(``functions/zstdlib.py``), the container has no Python imaging
library but DOES ship the reference C implementation
(``libwebp.so.7``); binding it through the stable public simple API
(``WebPGetInfo`` / ``WebPDecodeRGB`` / ``WebPEncodeLosslessRGB`` /
``WebPFree`` — public ABI, documented in webp/decode.h + encode.h)
gives C-speed decode inside the Arrow workers.

Fixtures use the LOSSLESS encoder so the decode round-trip is
byte-exact and the query oracle can recompute channel sums from
character codes (the PNG-family discipline); lossy WebP decodes
through the same entry point but has no exact oracle, so it stays a
pytest-level path. Dimension metadata is read FIRST and the implied
RGB size checked against the caller's bound before any pixel decode
— the bomb guard never materializes a hostile 1-gigapixel canvas.

A container without the library keeps the dormant-path behavior
(``available()`` False -> payloads drop), matching every other
backend seam in the package.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_lib = None
_probed = False


def _load():
    global _lib, _probed
    if _probed:
        return _lib
    _probed = True
    name = ctypes.util.find_library("webp")
    for cand in filter(None, [name, "libwebp.so.7", "libwebp.so"]):
        try:
            lib = ctypes.CDLL(cand)
        except OSError:
            continue
        try:
            lib.WebPGetInfo.restype = ctypes.c_int
            lib.WebPGetInfo.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_ubyte)
            lib.WebPDecodeRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [ctypes.c_void_p]
        except AttributeError:
            continue
        _lib = lib
        break
    return _lib


def available() -> bool:
    return _load() is not None


def encode_lossless_rgb(rgb: bytes, w: int, h: int) -> bytes:
    """One lossless WebP payload of packed RGB rows (stride = 3*w)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libwebp not available")
    if len(rgb) != w * h * 3:
        raise ValueError("rgb buffer size != w*h*3")
    out = ctypes.POINTER(ctypes.c_ubyte)()
    size = lib.WebPEncodeLosslessRGB(rgb, w, h, 3 * w, ctypes.byref(out))
    if size == 0 or not out:
        raise RuntimeError("WebPEncodeLosslessRGB failed")
    try:
        return ctypes.string_at(out, size)
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))


def get_info(data: bytes) -> tuple[int, int] | None:
    """(width, height) from the headers only — no pixel decode."""
    lib = _load()
    if lib is None:
        return None
    w, h = ctypes.c_int(0), ctypes.c_int(0)
    if not lib.WebPGetInfo(data, len(data),
                           ctypes.byref(w), ctypes.byref(h)):
        return None
    return w.value, h.value


def decode_rgb(data: bytes, max_bytes: int | None = None):
    """(w, h, packed RGB bytes) or None on malformed input or when the
    header-implied canvas exceeds ``max_bytes`` (the bomb guard runs
    BEFORE any pixel allocation)."""
    lib = _load()
    if lib is None:
        return None
    info = get_info(data)
    if info is None:
        return None
    w, h = info
    if w <= 0 or h <= 0:
        return None
    if max_bytes is not None and w * h * 3 > max_bytes:
        return None
    ow, oh = ctypes.c_int(0), ctypes.c_int(0)
    buf = lib.WebPDecodeRGB(data, len(data),
                            ctypes.byref(ow), ctypes.byref(oh))
    if not buf:
        return None  # torn/corrupt payload: the row drop
    try:
        return ow.value, oh.value, ctypes.string_at(buf, ow.value * oh.value * 3)
    finally:
        lib.WebPFree(ctypes.cast(buf, ctypes.c_void_p))
