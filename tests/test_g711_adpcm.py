"""G.711 and IMA-ADPCM audio decode: table/recurrence checks against
independently-written reference routines, WAV dispatch, and malformed
drops (operators/multimodal.py)."""

from __future__ import annotations

import struct

from distributed_computing_projects_spark.operators import multimodal as M


def _ulaw2linear(u_val: int) -> int:
    u_val = ~u_val & 0xFF
    t = ((u_val & 0x0F) << 3) + 0x84
    t <<= (u_val & 0x70) >> 4
    return (0x84 - t) if (u_val & 0x80) else (t - 0x84)


def _alaw2linear(a_val: int) -> int:
    a_val ^= 0x55
    t = (a_val & 0x0F) << 4
    seg = (a_val & 0x70) >> 4
    if seg == 0:
        t += 8
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a_val & 0x80) else -t


def test_g711_tables_match_itu_reference():
    alaw, mulaw = M._g711_tables()
    assert [int(x) for x in mulaw] == [_ulaw2linear(b) for b in range(256)]
    assert [int(x) for x in alaw] == [_alaw2linear(b) for b in range(256)]


def _wav(fmt_tag, channels, rate, block_align, bits, data):
    chunks = (b"fmt " + struct.pack("<I", 16)
              + struct.pack("<HHIIHH", fmt_tag, channels, rate,
                            rate * block_align, block_align, bits)
              + b"data" + struct.pack("<I", len(data)))
    return (b"RIFF" + struct.pack("<I", 4 + len(chunks) + len(data))
            + b"WAVE" + chunks + data)


def test_g711_wav_dispatch():
    data = bytes(range(0, 256, 8))  # 32 code bytes
    rate, ch, samples = M._decode_wav(_wav(7, 1, 8000, 1, 8, data))
    assert (rate, ch, len(samples)) == (8000, 1, 32)
    assert [int(x) for x in samples] == [_ulaw2linear(b) for b in data]
    _, _, asamples = M._decode_wav(_wav(6, 1, 8000, 1, 8, data))
    assert [int(x) for x in asamples] == [_alaw2linear(b) for b in data]


def _ima_ref(pred, idx, nibbles):
    out = [pred]
    for n in nibbles:
        step = M.IMA_STEP_TABLE[idx]
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + M.IMA_INDEX_TABLE[n & 7]))
        out.append(pred)
    return out


def test_ima_block_decode_matches_reference():
    body = struct.pack("<hBB", -123, 17, 0) + bytes(
        [0x3A, 0xF0, 0x81, 0x7E]
    )
    got = M._ima_decode_block(body)
    nibbles = []
    for b in (0x3A, 0xF0, 0x81, 0x7E):
        nibbles += [b & 0x0F, b >> 4]
    assert [int(x) for x in got] == _ima_ref(-123, 17, nibbles)
    # clamp paths: max-magnitude nibbles starting near the rails
    body = struct.pack("<hBB", 32700, 88, 0) + bytes([0x77, 0xFF])
    got = M._ima_decode_block(body)
    nibbles = [0x7, 0x7, 0xF, 0xF]
    assert [int(x) for x in got] == _ima_ref(32700, 88, nibbles)


def test_malformed_payloads_drop():
    # bad step index
    assert M._ima_decode_block(struct.pack("<hBB", 0, 89, 0)) is None
    # nonzero reserved byte
    assert M._ima_decode_block(struct.pack("<hBB", 0, 10, 1)) is None
    # short block
    assert M._ima_decode_block(b"\x00\x00") is None
    # G.711 with empty data chunk
    assert M._decode_wav(_wav(7, 1, 8000, 1, 8, b"")) is None
    # unknown fmt tag still drops
    assert M._decode_wav(_wav(3, 1, 8000, 2, 16, b"\x00" * 8)) is None


def test_ima_multiblock_decode_restarts_state_per_block():
    # two blocks, block_align = 8 (4-byte header + 4 nibble bytes):
    # the second block's header must RESTART the quantizer, giving the
    # concatenation of two independent single-block decodes
    b1 = struct.pack("<hBB", 100, 20, 0) + bytes([0x12, 0x34, 0x56, 0x78])
    b2 = struct.pack("<hBB", -500, 60, 0) + bytes([0x9A, 0xBC, 0xDE, 0xF0])
    got = M._decode_wav(_wav(17, 1, 8000, 8, 4, b1 + b2))
    assert got is not None
    _, _, samples = got
    import numpy as np

    want = np.concatenate(
        [M._ima_decode_block(b1), M._ima_decode_block(b2)]
    )
    assert [int(x) for x in samples] == [int(x) for x in want]
    assert len(samples) == 2 * (1 + 8)


def test_pcm24_and_float32_wav():
    import struct as _s

    import numpy as np

    # 24-bit: include negative, positive, and boundary samples
    samples = [-(1 << 23), -1, 0, 1, (1 << 23) - 1, 123456, -654321]
    data = b"".join(
        _s.pack("<I", v & 0xFFFFFFFF)[:3] for v in samples
    )
    got = M._decode_wav(_wav(1, 1, 48000, 3, 24, data))
    assert got is not None
    assert [int(x) for x in got[2]] == samples
    # float32: known values scale to int16 range, clipped
    f = np.array([0.0, 0.5, -0.5, 1.5, -1.5], dtype="<f4")
    got = M._decode_wav(_wav(3, 1, 48000, 4, 32, f.tobytes()))
    assert [int(x) for x in got[2]] == [0, 16384, -16384, 32767, -32768]
    # NaN payload drops
    bad = np.array([0.0, np.nan], dtype="<f4")
    assert M._decode_wav(_wav(3, 1, 48000, 4, 32, bad.tobytes())) is None
