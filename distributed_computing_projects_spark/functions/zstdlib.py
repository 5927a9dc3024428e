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
    """One-frame incremental decompressor with the FULL bz2-style
    contract: ``decompress(data, max_length)`` returns at most
    ``max_length`` bytes; input and output beyond the bound are
    buffered internally (``needs_input`` False) so a later call —
    including ``decompress(b'', n)`` — CONTINUES the same frame.
    ``eof`` flips at frame end, ``unused_data`` carries the bytes
    after it. The warc seam's bomb guard (drop after one bounded
    call) and the compressed-line walker's streaming loop
    (``sources/compressed.py`` — decode a shard incrementally so a
    high-ratio file never materializes at once) both ride this one
    contract, same as the stdlib 3.14 backend."""

    _CHUNK = 1 << 17  # ZSTD_DStreamOutSize()'s typical value

    def __init__(self):
        lib = _load()
        if lib is None:
            raise RuntimeError("libzstd not available")
        self._lib = lib
        self._ds = lib.ZSTD_createDStream()
        if not self._ds:
            raise RuntimeError("ZSTD_createDStream failed")
        self.unused_data = b""
        self._stream_end = False  # frame end SEEN (output may be buffered)
        self._in_pending = b""   # unconsumed input (bound reached)
        self._out_pending = b""  # decoded output beyond the bound

    def __del__(self):
        ds = getattr(self, "_ds", None)
        if ds:
            self._lib.ZSTD_freeDStream(ds)
            self._ds = None

    @property
    def eof(self) -> bool:
        """True only once the frame end was reached AND every decoded
        byte has been returned — the stdlib rule; a bound-capped call
        that internally saw the frame end still reports False until
        the buffered tail drains."""
        return self._stream_end and not self._out_pending

    @property
    def needs_input(self) -> bool:
        """False while buffered input/output can make progress without
        new data — the bz2/lzma meaning."""
        return (not self._out_pending and not self._in_pending
                and not self._stream_end)

    def decompress(self, data: bytes, max_length: int | None = None) -> bytes:
        if self._stream_end:
            self.unused_data += data
            out = self._out_pending
            if max_length is not None:
                out = out[:max_length]
            self._out_pending = self._out_pending[len(out):]
            return out
        if self._in_pending:
            data = self._in_pending + data
            self._in_pending = b""
        out_parts: list[bytes] = []
        produced = 0
        if self._out_pending:
            out_parts.append(self._out_pending)
            produced = len(self._out_pending)
            self._out_pending = b""
        inb = _InBuffer(bytes(data), len(data), 0)
        buf = ctypes.create_string_buffer(self._CHUNK)
        while max_length is None or produced <= max_length:
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
                self._stream_end = True
                self.unused_data = bytes(data[inb.pos:])
                break
            if inb.pos >= inb.size and outb.pos < outb.size:
                break  # input exhausted mid-frame (torn or streaming)
        if not self._stream_end:
            self._in_pending = bytes(data[inb.pos:])
        out = b"".join(out_parts)
        if max_length is not None and len(out) > max_length:
            self._out_pending = out[max_length:]
            out = out[:max_length]
        return out
