"""ctypes binding to the system ``libzstd`` — the third (and on this
container, the ACTIVATING) backend for the ``.warc.zst`` seam in
``sources/warc.py``.

Why a binding and not a pure-Python RFC 8878 decoder: the container
ships ``libzstd.so.1`` (and virtually every Linux image does — zstd
is a kernel/apt/conda dependency), and at 100 TB the decode path must
run at C speed inside the Arrow workers; a Python bit-by-bit FSE/
Huffman walk would be a ~100x scale anti-pattern for a hot ingest
loop. The binding uses only the stable public simple+streaming API
(``ZSTD_compress``, ``ZSTD_createDStream``/``ZSTD_decompressStream``
— public ABI since libzstd 1.3, documented in zstd.h / RFC 8878).

The decompressor follows the ``bz2.BZ2Decompressor`` contract the
seam already targets for the stdlib 3.14 backend: one FRAME per
object, ``decompress(data, max_length)`` honors the bound
incrementally (the zip-bomb guard never materializes an over-bound
frame — decoding STOPS at the bound, unlike a post-hoc length
check), ``eof`` flips when the frame completes, ``unused_data``
carries the bytes after the frame end. Loading is lazy and memoized;
a container without the library keeps the documented dormant-path
behavior (``available()`` False -> seam returns None -> row drop).
"""

from __future__ import annotations

import ctypes
import ctypes.util

_MAX_ONE_SHOT = 1 << 31  # sanity cap for the compressor bound


class _InBuffer(ctypes.Structure):
    _fields_ = [("src", ctypes.c_char_p), ("size", ctypes.c_size_t),
                ("pos", ctypes.c_size_t)]


class _OutBuffer(ctypes.Structure):
    _fields_ = [("dst", ctypes.c_void_p), ("size", ctypes.c_size_t),
                ("pos", ctypes.c_size_t)]


_lib = None
_probed = False


def _load():
    global _lib, _probed
    if _probed:
        return _lib
    _probed = True
    name = ctypes.util.find_library("zstd")
    for cand in filter(None, [name, "libzstd.so.1", "libzstd.so"]):
        try:
            lib = ctypes.CDLL(cand)
        except OSError:
            continue
        try:
            lib.ZSTD_isError.restype = ctypes.c_uint
            lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
            lib.ZSTD_compressBound.restype = ctypes.c_size_t
            lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
            lib.ZSTD_compress.restype = ctypes.c_size_t
            lib.ZSTD_compress.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int]
            lib.ZSTD_createDStream.restype = ctypes.c_void_p
            lib.ZSTD_freeDStream.restype = ctypes.c_size_t
            lib.ZSTD_freeDStream.argtypes = [ctypes.c_void_p]
            lib.ZSTD_decompressStream.restype = ctypes.c_size_t
            lib.ZSTD_decompressStream.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(_OutBuffer),
                ctypes.POINTER(_InBuffer)]
        except AttributeError:
            continue
        _lib = lib
        break
    return _lib


def available() -> bool:
    return _load() is not None


def compress(data: bytes, level: int = 3) -> bytes:
    """One zstd frame of ``data`` (simple API)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libzstd not available")
    bound = lib.ZSTD_compressBound(len(data))
    if bound > _MAX_ONE_SHOT:
        raise ValueError("input too large for one frame")
    dst = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress(dst, bound, data, len(data), level)
    if lib.ZSTD_isError(n):
        raise RuntimeError("ZSTD_compress failed")
    return dst.raw[:n]


class ZstdDecompressor:
    """One-frame incremental decompressor with the bz2-style
    ``decompress(data, max_length)`` / ``eof`` / ``unused_data``
    contract the warc seam consumes."""

    _CHUNK = 1 << 17  # ZSTD_DStreamOutSize()'s typical value

    def __init__(self):
        lib = _load()
        if lib is None:
            raise RuntimeError("libzstd not available")
        self._lib = lib
        self._ds = lib.ZSTD_createDStream()
        if not self._ds:
            raise RuntimeError("ZSTD_createDStream failed")
        self.eof = False
        self.unused_data = b""

    def __del__(self):
        ds = getattr(self, "_ds", None)
        if ds:
            self._lib.ZSTD_freeDStream(ds)
            self._ds = None

    def decompress(self, data: bytes, max_length: int | None = None) -> bytes:
        if self.eof:
            self.unused_data += data
            return b""
        out_parts: list[bytes] = []
        produced = 0
        inb = _InBuffer(bytes(data), len(data), 0)
        buf = ctypes.create_string_buffer(self._CHUNK)
        while True:
            outb = _OutBuffer(
                ctypes.cast(buf, ctypes.c_void_p), self._CHUNK, 0)
            ret = self._lib.ZSTD_decompressStream(
                self._ds, ctypes.byref(outb), ctypes.byref(inb))
            if self._lib.ZSTD_isError(ret):
                raise ValueError("zstd: corrupt frame")
            if outb.pos:
                out_parts.append(buf.raw[:outb.pos])
                produced += outb.pos
            if ret == 0:  # frame complete
                self.eof = True
                self.unused_data = bytes(data[inb.pos:])
                break
            if max_length is not None and produced > max_length:
                break  # bomb bound: stop decoding, caller drops
            if inb.pos >= inb.size and outb.pos < outb.size:
                break  # input exhausted mid-frame (torn or streaming)
        return b"".join(out_parts)
