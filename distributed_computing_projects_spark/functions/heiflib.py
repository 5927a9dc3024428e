"""ctypes binding to the system ``libheif`` — HEIC and AVIF image
decode (and the lossless fixture encoder).

HEIC is what every iPhone has shot by default since 2017; AVIF is the
AV1-based successor the major browsers now serve. A crawl-ingest
multimodal tier that drops both loses the two fastest-growing image
formats on the web. Like the webp and zstd seams
(``functions/webplib.py`` / ``functions/zstdlib.py``), the container
ships no Python imaging library but DOES ship the reference C
implementation (``libheif.so.1`` 1.15, linked against libde265 +
libx265 for HEVC and libdav1d + libaom for AV1), so the binding uses
only the stable public C API documented in libheif's heif.h:
``heif_context_read_from_memory_without_copy`` /
``heif_context_get_primary_image_handle`` / ``heif_decode_image`` /
``heif_image_get_plane_readonly`` for decode, the encoder trio
(``heif_context_get_encoder_for_format`` + the ``lossless``/``chroma``
string parameters) for the fixture stage. ``heif_error`` is returned
BY VALUE (a 3-field struct) — declared as a ctypes Structure restype.

Byte-exact lossless (measured, not assumed): libheif 1.15's internal
RGB->YCbCr conversion rounds (max diff 1 even with ``lossless=1``,
``chroma=444``), so the encoder feeds the codec YCbCr-444 PLANES
under the IDENTITY matrix — Y=G, Cb=B, Cr=R, the GBR convention of
ISO 23091 matrix_coefficients=0 — with an nclx profile saying so
attached to the image. The codecs themselves are lossless in that
domain, and on decode libheif honors the file's identity nclx, so
``decode_rgb`` (the NORMAL interleaved-RGB decode path every real
file takes) returns the original bytes exactly; the oracle can
recompute channel sums from character codes (the PNG/WebP-family
discipline). Verified exact for both HEVC and AV1 across odd/even
dimensions.

Bomb guard: header dimensions are read from the image handle FIRST
and the implied RGB size checked against the caller's bound before
``heif_decode_image`` allocates any pixel canvas.

A container without the library (or a libheif built without the
needed codec) keeps the dormant-path behavior — ``available()`` /
``encoder_available()`` False -> payloads drop — matching every other
backend seam in the package.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import tempfile

# enum values from libheif's public heif.h (stable ABI constants)
_COLORSPACE_YCBCR = 0
_COLORSPACE_RGB = 1
_CHROMA_444 = 3
_CHROMA_INTERLEAVED_RGB = 10
_CHANNEL_Y = 0
_CHANNEL_CB = 1
_CHANNEL_CR = 2
_CHANNEL_INTERLEAVED = 10
COMPRESSION_HEVC = 1  # .heic
COMPRESSION_AV1 = 4   # .avif

# ISO BMFF major brands libheif handles (primary-image containers)
HEIF_BRANDS = {b"heic", b"heix", b"heim", b"heis", b"hevc", b"hevx",
               b"mif1", b"msf1", b"avif", b"avis"}


class _HeifError(ctypes.Structure):
    _fields_ = [("code", ctypes.c_int), ("subcode", ctypes.c_int),
                ("message", ctypes.c_char_p)]


class _Nclx(ctypes.Structure):
    # struct heif_color_profile_nclx (heif.h, version 1)
    _fields_ = [("version", ctypes.c_uint8),
                ("color_primaries", ctypes.c_int),
                ("transfer_characteristics", ctypes.c_int),
                ("matrix_coefficients", ctypes.c_int),
                ("full_range_flag", ctypes.c_int)]


_lib = None
_probed = False


def _load():
    global _lib, _probed
    if _probed:
        return _lib
    _probed = True
    name = ctypes.util.find_library("heif")
    for cand in filter(None, [name, "libheif.so.1", "libheif.so"]):
        try:
            lib = ctypes.CDLL(cand)
        except OSError:
            continue
        try:
            for fname, res, args in [
                ("heif_context_alloc", ctypes.c_void_p, []),
                ("heif_context_free", None, [ctypes.c_void_p]),
                ("heif_context_read_from_memory_without_copy", _HeifError,
                 [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
                  ctypes.c_void_p]),
                ("heif_context_get_primary_image_handle", _HeifError,
                 [ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]),
                ("heif_image_handle_get_width", ctypes.c_int,
                 [ctypes.c_void_p]),
                ("heif_image_handle_get_height", ctypes.c_int,
                 [ctypes.c_void_p]),
                ("heif_image_handle_release", None, [ctypes.c_void_p]),
                ("heif_decode_image", _HeifError,
                 [ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
                  ctypes.c_int, ctypes.c_int, ctypes.c_void_p]),
                ("heif_image_get_plane_readonly",
                 ctypes.POINTER(ctypes.c_ubyte),
                 [ctypes.c_void_p, ctypes.c_int,
                  ctypes.POINTER(ctypes.c_int)]),
                ("heif_image_get_plane", ctypes.POINTER(ctypes.c_ubyte),
                 [ctypes.c_void_p, ctypes.c_int,
                  ctypes.POINTER(ctypes.c_int)]),
                ("heif_image_release", None, [ctypes.c_void_p]),
                ("heif_context_get_encoder_for_format", _HeifError,
                 [ctypes.c_void_p, ctypes.c_int,
                  ctypes.POINTER(ctypes.c_void_p)]),
                ("heif_encoder_release", None, [ctypes.c_void_p]),
                ("heif_encoder_set_lossless", _HeifError,
                 [ctypes.c_void_p, ctypes.c_int]),
                ("heif_encoder_set_parameter_string", _HeifError,
                 [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]),
                ("heif_image_create", _HeifError,
                 [ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                  ctypes.POINTER(ctypes.c_void_p)]),
                ("heif_image_add_plane", _HeifError,
                 [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                  ctypes.c_int, ctypes.c_int]),
                ("heif_nclx_color_profile_alloc", ctypes.POINTER(_Nclx),
                 []),
                ("heif_nclx_color_profile_free", None,
                 [ctypes.POINTER(_Nclx)]),
                ("heif_image_set_nclx_color_profile", _HeifError,
                 [ctypes.c_void_p, ctypes.POINTER(_Nclx)]),
                ("heif_context_encode_image", _HeifError,
                 [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                  ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]),
                ("heif_context_write_to_file", _HeifError,
                 [ctypes.c_void_p, ctypes.c_char_p]),
            ]:
                fn = getattr(lib, fname)
                fn.restype = res
                fn.argtypes = args
        except AttributeError:
            continue
        _lib = lib
        break
    return _lib


def available() -> bool:
    return _load() is not None


def encoder_available(compression: int = COMPRESSION_AV1) -> bool:
    """True when libheif was built with an encoder for ``compression``
    (HEVC needs x265, AV1 needs aom/rav1e/svt — distro builds vary)."""
    lib = _load()
    if lib is None:
        return False
    ctx = lib.heif_context_alloc()
    try:
        enc = ctypes.c_void_p()
        err = lib.heif_context_get_encoder_for_format(
            ctx, compression, ctypes.byref(enc))
        if err.code != 0:
            return False
        lib.heif_encoder_release(enc)
        return True
    finally:
        lib.heif_context_free(ctx)


def encode_lossless_rgb(rgb: bytes, w: int, h: int,
                        compression: int = COMPRESSION_AV1) -> bytes:
    """One lossless HEIC/AVIF payload of packed RGB rows (stride =
    3*w), byte-exact under :func:`decode_rgb` — the identity-matrix
    plane trick documented in the module docstring."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libheif not available")
    if len(rgb) != w * h * 3:
        raise ValueError("rgb buffer size != w*h*3")
    ctx = lib.heif_context_alloc()
    enc = ctypes.c_void_p()
    img = ctypes.c_void_p()
    try:
        _check(lib.heif_context_get_encoder_for_format(
            ctx, compression, ctypes.byref(enc)), "encoder")
        _check(lib.heif_encoder_set_lossless(enc, 1), "lossless")
        _check(lib.heif_encoder_set_parameter_string(
            enc, b"chroma", b"444"), "chroma")
        _check(lib.heif_image_create(
            w, h, _COLORSPACE_YCBCR, _CHROMA_444, ctypes.byref(img)),
            "image_create")
        # identity/GBR: Y=G, Cb=B, Cr=R (matrix_coefficients = 0)
        for ch, off in ((_CHANNEL_Y, 1), (_CHANNEL_CB, 2),
                        (_CHANNEL_CR, 0)):
            _check(lib.heif_image_add_plane(img, ch, w, h, 8),
                   "add_plane")
            stride = ctypes.c_int()
            p = lib.heif_image_get_plane(img, ch, ctypes.byref(stride))
            plane = rgb[off::3]  # row-major channel extraction
            for r in range(h):
                ctypes.memmove(
                    ctypes.addressof(p.contents) + r * stride.value,
                    plane[r * w:(r + 1) * w], w)
        nclx = lib.heif_nclx_color_profile_alloc()
        try:
            nclx.contents.matrix_coefficients = 0  # identity
            nclx.contents.full_range_flag = 1
            _check(lib.heif_image_set_nclx_color_profile(img, nclx),
                   "nclx")
        finally:
            lib.heif_nclx_color_profile_free(nclx)
        hdl = ctypes.c_void_p()
        _check(lib.heif_context_encode_image(
            ctx, img, enc, None, ctypes.byref(hdl)), "encode")
        lib.heif_image_handle_release(hdl)
        # the public serializer writes through a file or a callback
        # struct; callbacks returning structs by value are fragile in
        # ctypes, so round through a private temp file
        fd, path = tempfile.mkstemp(suffix=".heif")
        os.close(fd)
        try:
            _check(lib.heif_context_write_to_file(ctx, path.encode()),
                   "write")
            with open(path, "rb") as f:
                return f.read()
        finally:
            os.unlink(path)
    finally:
        if img:
            lib.heif_image_release(img)
        if enc:
            lib.heif_encoder_release(enc)
        lib.heif_context_free(ctx)


def _check(err: _HeifError, what: str) -> None:
    if err.code != 0:
        raise RuntimeError(
            f"libheif {what}: {err.code}/{err.subcode} "
            f"{(err.message or b'').decode(errors='replace')}")


def get_info(data: bytes):
    """(width, height) from the container metadata only — no pixel
    decode. None on malformed/unsupported input."""
    lib = _load()
    if lib is None:
        return None
    ctx = lib.heif_context_alloc()
    hdl = ctypes.c_void_p()
    try:
        err = lib.heif_context_read_from_memory_without_copy(
            ctx, data, len(data), None)
        if err.code != 0:
            return None
        err = lib.heif_context_get_primary_image_handle(
            ctx, ctypes.byref(hdl))
        if err.code != 0:
            return None
        return (lib.heif_image_handle_get_width(hdl),
                lib.heif_image_handle_get_height(hdl))
    finally:
        if hdl:
            lib.heif_image_handle_release(hdl)
        lib.heif_context_free(ctx)


def decode_rgb(data: bytes, max_bytes: int | None = None):
    """(w, h, packed RGB bytes) or None on malformed input or when the
    header-implied canvas exceeds ``max_bytes`` (the bomb guard runs
    BEFORE any pixel allocation)."""
    lib = _load()
    if lib is None:
        return None
    ctx = lib.heif_context_alloc()
    hdl = ctypes.c_void_p()
    img = ctypes.c_void_p()
    try:
        err = lib.heif_context_read_from_memory_without_copy(
            ctx, data, len(data), None)
        if err.code != 0:
            return None
        err = lib.heif_context_get_primary_image_handle(
            ctx, ctypes.byref(hdl))
        if err.code != 0:
            return None
        w = lib.heif_image_handle_get_width(hdl)
        h = lib.heif_image_handle_get_height(hdl)
        if w <= 0 or h <= 0:
            return None
        if max_bytes is not None and w * h * 3 > max_bytes:
            return None
        err = lib.heif_decode_image(
            hdl, ctypes.byref(img), _COLORSPACE_RGB,
            _CHROMA_INTERLEAVED_RGB, None)
        if err.code != 0:
            return None  # torn/corrupt payload: the row drop
        stride = ctypes.c_int()
        p = lib.heif_image_get_plane_readonly(
            img, _CHANNEL_INTERLEAVED, ctypes.byref(stride))
        if not p:
            return None
        base = ctypes.addressof(p.contents)
        out = b"".join(
            ctypes.string_at(base + r * stride.value, w * 3)
            for r in range(h))
        return w, h, out
    finally:
        if img:
            lib.heif_image_release(img)
        if hdl:
            lib.heif_image_handle_release(hdl)
        lib.heif_context_free(ctx)
