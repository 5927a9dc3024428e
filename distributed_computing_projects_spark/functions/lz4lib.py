"""ctypes binding to the system ``liblz4`` — STANDARD LZ4 frame
format (magic ``04 22 4D 18``) decode, plus the one-shot frame
compressor the fixtures use.

Why: Hadoop ships an ``.lz4`` codec, but it reads Hadoop's OWN
block framing, not the standard LZ4 frame format every other tool
writes (``lz4`` CLI, Kafka archives, journald exports) — verified
empirically: a standard frame makes the built-in text scan throw.
So ``.jsonl.lz4`` shards are exactly the same gap class as
``.jsonl.zst``/``.xz``, and close the same way: a bz2-contract
decompressor consumed by the bounded line walker in
``sources/compressed.py``. The binding uses only the stable public
frame API (``LZ4F_createDecompressionContext`` /
``LZ4F_decompress`` / ``LZ4F_compressFrame`` — documented in
lz4frame.h, ABI-stable since liblz4 1.8).

Contract parity with ``functions/zstdlib.ZstdDecompressor``: one
FRAME per object, ``decompress(data, max_length)`` buffers input and
output beyond the bound (``needs_input`` False) so continuation
calls work, ``eof`` flips only after the frame end is reached AND
all output has drained, ``unused_data`` carries the bytes after the
frame. A container without the library keeps the dormant-path
behavior (``available()`` False -> the walker drops the file).
"""

from __future__ import annotations

import ctypes
import ctypes.util

_LZ4F_VERSION = 100  # lz4frame.h: LZ4F_VERSION, stable since 1.8

_lib = None
_probed = False


def _load():
    global _lib, _probed
    if _probed:
        return _lib
    _probed = True
    name = ctypes.util.find_library("lz4")
    for cand in filter(None, [name, "liblz4.so.1", "liblz4.so"]):
        try:
            lib = ctypes.CDLL(cand)
        except OSError:
            continue
        try:
            lib.LZ4F_isError.restype = ctypes.c_uint
            lib.LZ4F_isError.argtypes = [ctypes.c_size_t]
            lib.LZ4F_compressFrameBound.restype = ctypes.c_size_t
            lib.LZ4F_compressFrameBound.argtypes = [
                ctypes.c_size_t, ctypes.c_void_p]
            lib.LZ4F_compressFrame.restype = ctypes.c_size_t
            lib.LZ4F_compressFrame.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p]
            lib.LZ4F_createDecompressionContext.restype = ctypes.c_size_t
            lib.LZ4F_createDecompressionContext.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_uint]
            lib.LZ4F_freeDecompressionContext.restype = ctypes.c_size_t
            lib.LZ4F_freeDecompressionContext.argtypes = [
                ctypes.c_void_p]
            lib.LZ4F_decompress.restype = ctypes.c_size_t
            lib.LZ4F_decompress.argtypes = [
                ctypes.c_void_p,
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_void_p]
        except AttributeError:
            continue
        _lib = lib
        break
    return _lib


def available() -> bool:
    return _load() is not None


def compress(data: bytes) -> bytes:
    """One standard LZ4 frame of ``data`` (one-shot frame API)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("liblz4 not available")
    bound = lib.LZ4F_compressFrameBound(len(data), None)
    dst = ctypes.create_string_buffer(bound)
    n = lib.LZ4F_compressFrame(dst, bound, data, len(data), None)
    if lib.LZ4F_isError(n):
        raise RuntimeError("LZ4F_compressFrame failed")
    return dst.raw[:n]


class Lz4Decompressor:
    """One-frame incremental decompressor, full bz2-style contract
    (module docstring)."""

    _CHUNK = 1 << 17

    def __init__(self):
        lib = _load()
        if lib is None:
            raise RuntimeError("liblz4 not available")
        self._lib = lib
        ctx = ctypes.c_void_p()
        err = lib.LZ4F_createDecompressionContext(
            ctypes.byref(ctx), _LZ4F_VERSION)
        if lib.LZ4F_isError(err):
            raise RuntimeError("LZ4F_createDecompressionContext failed")
        self._ctx = ctx
        self.unused_data = b""
        self._stream_end = False
        self._in_pending = b""
        self._out_pending = b""

    def __del__(self):
        ctx = getattr(self, "_ctx", None)
        if ctx:
            self._lib.LZ4F_freeDecompressionContext(ctx)
            self._ctx = None

    @property
    def eof(self) -> bool:
        return self._stream_end and not self._out_pending

    @property
    def needs_input(self) -> bool:
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
        buf = ctypes.create_string_buffer(self._CHUNK)
        src = ctypes.create_string_buffer(bytes(data), len(data))
        pos = 0
        while max_length is None or produced <= max_length:
            dst_size = ctypes.c_size_t(self._CHUNK)
            src_size = ctypes.c_size_t(len(data) - pos)
            src_ptr = ctypes.cast(
                ctypes.addressof(src) + pos, ctypes.c_void_p)
            ret = self._lib.LZ4F_decompress(
                self._ctx, buf, ctypes.byref(dst_size),
                src_ptr, ctypes.byref(src_size), None)
            if self._lib.LZ4F_isError(ret):
                raise ValueError("lz4: corrupt frame")
            pos += src_size.value
            if dst_size.value:
                out_parts.append(buf.raw[:dst_size.value])
                produced += dst_size.value
            if ret == 0:  # frame complete
                self._stream_end = True
                self.unused_data = bytes(data[pos:])
                break
            if src_size.value == 0 and dst_size.value == 0:
                break  # input exhausted mid-frame (torn or streaming)
        if not self._stream_end:
            self._in_pending = bytes(data[pos:])
        out = b"".join(out_parts)
        if max_length is not None and len(out) > max_length:
            self._out_pending = out[max_length:]
            out = out[:max_length]
        return out
