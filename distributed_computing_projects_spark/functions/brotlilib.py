"""ctypes binding to the system ``libbrotlidec``/``libbrotlienc`` —
HTTP ``Content-Encoding: br`` response bodies in crawl WARCs.

Same seam pattern as ``functions/zstdlib.py``/``webplib.py``: no
Python wheel in the container, but the reference C implementation
ships on the image. Only the stable public streaming decoder API and
one-shot encoder API are bound (brotli/decode.h, brotli/encode.h).

Decoding is bomb-bounded: the streaming loop stops and drops once
output exceeds the caller's cap, and a stream that does not end
exactly at the input's end (torn, or trailing garbage where one HTTP
body must be one stream) drops rather than passing partial output.
The encoder exists for fixture building only.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_DEC_ERROR, _DEC_SUCCESS, _DEC_NEEDS_IN, _DEC_NEEDS_OUT = 0, 1, 2, 3
_CHUNK = 1 << 17

_dec = None
_enc = None
_probed = False


def _load():
    global _dec, _enc, _probed
    if _probed:
        return _dec, _enc
    _probed = True

    def dl(stem: str):
        name = ctypes.util.find_library(stem)
        for cand in filter(None, [name, f"lib{stem}.so.1", f"lib{stem}.so"]):
            try:
                return ctypes.CDLL(cand)
            except OSError:
                continue
        return None

    dec = dl("brotlidec")
    enc = dl("brotlienc")
    try:
        if dec is not None:
            dec.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
            dec.BrotliDecoderCreateInstance.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
            dec.BrotliDecoderDestroyInstance.restype = None
            dec.BrotliDecoderDestroyInstance.argtypes = [ctypes.c_void_p]
            dec.BrotliDecoderDecompressStream.restype = ctypes.c_int
            dec.BrotliDecoderDecompressStream.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.POINTER(ctypes.c_size_t)]
        if enc is not None:
            enc.BrotliEncoderMaxCompressedSize.restype = ctypes.c_size_t
            enc.BrotliEncoderMaxCompressedSize.argtypes = [ctypes.c_size_t]
            enc.BrotliEncoderCompress.restype = ctypes.c_int
            enc.BrotliEncoderCompress.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_size_t, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]
    except AttributeError:
        dec = enc = None
    _dec, _enc = dec, enc
    return _dec, _enc


def available() -> bool:
    dec, _ = _load()
    return dec is not None


def compress(data: bytes, quality: int = 5) -> bytes:
    """One brotli stream (fixture builder; lgwin 22, generic mode)."""
    _, enc = _load()
    if enc is None:
        raise RuntimeError("libbrotlienc not available")
    bound = enc.BrotliEncoderMaxCompressedSize(len(data)) or (
        len(data) + 1024)
    out = ctypes.create_string_buffer(bound)
    size = ctypes.c_size_t(bound)
    ok = enc.BrotliEncoderCompress(
        quality, 22, 0, len(data), data, ctypes.byref(size), out)
    if not ok:
        raise RuntimeError("BrotliEncoderCompress failed")
    return out.raw[:size.value]


def decompress(data: bytes, max_out: int):
    """The whole input as ONE brotli stream, or None on corrupt/torn
    input, trailing garbage, or output past ``max_out`` (decoding
    stops at the bound — the bomb never materializes)."""
    dec, _ = _load()
    if dec is None:
        return None
    state = dec.BrotliDecoderCreateInstance(None, None, None)
    if not state:
        return None
    try:
        inbuf = ctypes.create_string_buffer(bytes(data), len(data))
        next_in = ctypes.cast(inbuf, ctypes.POINTER(ctypes.c_ubyte))
        avail_in = ctypes.c_size_t(len(data))
        chunk = ctypes.create_string_buffer(_CHUNK)
        parts: list[bytes] = []
        produced = 0
        while True:
            next_out = ctypes.cast(chunk, ctypes.POINTER(ctypes.c_ubyte))
            avail_out = ctypes.c_size_t(_CHUNK)
            r = dec.BrotliDecoderDecompressStream(
                state, ctypes.byref(avail_in), ctypes.byref(next_in),
                ctypes.byref(avail_out), ctypes.byref(next_out), None)
            got = _CHUNK - avail_out.value
            if got:
                parts.append(chunk.raw[:got])
                produced += got
            if produced > max_out:
                return None  # bomb bound
            if r == _DEC_SUCCESS:
                if avail_in.value != 0:
                    return None  # trailing garbage after the stream
                return b"".join(parts)
            if r == _DEC_NEEDS_OUT:
                continue
            return None  # error, or needs-input on exhausted input: torn
    finally:
        dec.BrotliDecoderDestroyInstance(state)
