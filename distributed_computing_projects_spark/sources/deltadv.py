"""Delta Lake deletion-vector codec — pure stdlib, from the public
Delta PROTOCOL (github.com/delta-io/delta/blob/master/PROTOCOL.md,
"Deletion Vectors" + "Deletion Vector Format") and the public
RoaringFormatSpec (github.com/RoaringBitmap/RoaringFormatSpec).

Why this matters: deletion vectors are ON BY DEFAULT in modern Delta
writers — a MERGE/DELETE/UPDATE no longer rewrites the data file, it
publishes a KB-sized bitmap of dead row indexes next to it. A reader
without DV support either refuses every such table (the engine's old
policy) or silently RESURRECTS deleted rows (a directory reader's
bug, and the protocol's canonical wrong-read). This module decodes
the bitmaps so ``read_delta`` can anti-join dead positions out.

Three layers, each from its spec:

- **Z85** (rfc.zeromq.org/spec/32): 4 bytes -> 5 chars over an
  85-char alphabet; Delta uses it for inline DV payloads and for the
  16-byte UUID inside ``u``-storage paths. Strict: input length must
  be a multiple of the group size, chars must be in-alphabet, and a
  group must not overflow 2^32 (a corrupt high char would otherwise
  wrap silently).
- **RoaringBitmapArray, portable form** (PROTOCOL.md): little-endian
  magic ``1681511377``, int64 number-of-bitmaps, then per bitmap an
  int32 key (the row index's high 32 bits, strictly increasing) and
  a standard 32-bit roaring bitmap in the RoaringFormatSpec portable
  layout — cookie 12346 (no runs, offset header always present) or
  12347 (run flags bitset, offsets only when >= 4 containers), then
  per-container array (sorted uint16s), bitmap (1024 little-endian
  words), or run (count x [start, length-1]) payloads. The PARSER
  accepts all three container kinds and both cookies; the WRITER
  emits the no-run form (arrays under 4097 values, bitmaps above) —
  decode and encode share no state, so a writer bug cannot hide a
  parser bug (the avro/ocf discipline).
- **DV file storage** (PROTOCOL.md): a sidecar ``.bin`` starts with
  one format-version byte (= 1); each vector within is
  ``[int32 size, big-endian][data][int32 CRC-32 of data, BE]`` at
  its descriptor's ``offset``. Size and checksum are VERIFIED, and
  the decoded cardinality must equal the descriptor's
  ``cardinality`` — any mismatch raises (a torn or swapped bitmap
  must never silently delete the wrong rows).

Descriptor forms (``add.deletionVector``): ``i`` inline (payload is
Z85 in ``pathOrInlineDv``), ``u`` relative (``pathOrInlineDv`` =
optional random prefix + 20-char Z85 UUID; the file lives at
``<table>/<prefix>/deletion_vector_<uuid>.bin``), ``p`` absolute
path. Unknown storage types refuse loudly.

Scale: a DV is O(deleted rows / 2^16) bytes on disk and decodes
driver-side in microseconds; the expansion to (file, row_index)
pairs for the anti-join is bounded by the descriptor cardinality sum
— the same order a native Delta reader materializes per task.

Reference: extension surface (the reference's SDFS stores immutable
flat files, mp3/src/sdfsmaster.go; row-level deletes are beyond it).
"""

from __future__ import annotations

import os
import struct
import uuid as uuidmod
import zlib

MAGIC = 1681511377
_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4  # run-cookie bitmaps omit offsets below this
_ARRAY_MAX = 4096         # container kind boundary (RoaringFormatSpec)

_Z85_CHARS = ("0123456789abcdefghijklmnopqrstuvwxyz"
              "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


# ------------------------------------------------------------- z85


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 input not a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_CHARS[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError("z85 input not a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i:i + 5]:
            d = _Z85_INDEX.get(c)
            if d is None:
                raise ValueError(f"invalid z85 character {c!r}")
            v = v * 85 + d
        if v >> 32:
            raise ValueError("z85 group overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out)


# ------------------------------------------- roaring bitmap: parse


def _parse_rb32(data: bytes, pos: int):
    """One standard 32-bit portable roaring bitmap at ``pos``;
    returns (sorted low-32 values, next pos)."""
    if pos + 4 > len(data):
        raise ValueError("roaring bitmap truncated at cookie")
    (cookie,) = struct.unpack_from("<I", data, pos)
    if (cookie & 0xFFFF) == _COOKIE_RUN:
        n = (cookie >> 16) + 1
        pos += 4
        nbytes = (n + 7) // 8
        run_flags = data[pos:pos + nbytes]
        if len(run_flags) != nbytes:
            raise ValueError("roaring run-flag bitset truncated")
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _COOKIE_NO_RUN:
        pos += 4
        if pos + 4 > len(data):
            raise ValueError("roaring bitmap truncated at size")
        (n,) = struct.unpack_from("<I", data, pos)
        pos += 4
        run_flags = b""
        has_offsets = True
    else:
        raise ValueError(f"unknown roaring cookie {cookie}")
    if n == 0 or n > 1 << 16:
        raise ValueError(f"implausible roaring container count {n}")
    if pos + 4 * n > len(data):
        raise ValueError("roaring descriptive header truncated")
    keys, cards = [], []
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", data, pos + 4 * i)
        keys.append(k)
        cards.append(cm1 + 1)
    pos += 4 * n
    if has_offsets:
        pos += 4 * n  # parse is sequential; offsets are redundant
    values = []
    for i in range(n):
        base = keys[i] << 16
        card = cards[i]
        is_run = bool(run_flags) and bool(
            run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            if pos + 2 > len(data):
                raise ValueError("run container truncated")
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2
            if pos + 4 * n_runs > len(data):
                raise ValueError("run container truncated")
            for r in range(n_runs):
                start, lm1 = struct.unpack_from(
                    "<HH", data, pos + 4 * r)
                values.extend(base + v
                              for v in range(start, start + lm1 + 1))
            pos += 4 * n_runs
        elif card <= _ARRAY_MAX:
            if pos + 2 * card > len(data):
                raise ValueError("array container truncated")
            values.extend(
                base + v for v in struct.unpack_from(
                    f"<{card}H", data, pos))
            pos += 2 * card
        else:
            if pos + 8192 > len(data):
                raise ValueError("bitmap container truncated")
            got = 0
            for w in range(1024):
                (word,) = struct.unpack_from("<Q", data, pos + 8 * w)
                while word:
                    low = word & -word
                    values.append(base + w * 64
                                  + low.bit_length() - 1)
                    word ^= low
                    got += 1
            if got != card:
                raise ValueError(
                    f"bitmap container cardinality {got} != "
                    f"declared {card}")
            pos += 8192
    return values, pos


def decode_bitmap(data: bytes) -> list[int]:
    """Serialized RoaringBitmapArray -> sorted 64-bit row indexes."""
    if len(data) < 12:
        raise ValueError("deletion vector bitmap too short")
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != MAGIC:
        raise ValueError(
            f"bad deletion vector magic {magic} (want {MAGIC})")
    (count,) = struct.unpack_from("<q", data, 4)
    if count < 0 or count > 1 << 32:
        raise ValueError(f"implausible bitmap count {count}")
    pos, out, last_key = 12, [], -1
    for _ in range(count):
        if pos + 4 > len(data):
            raise ValueError("bitmap key truncated")
        (key,) = struct.unpack_from("<i", data, pos)
        pos += 4
        if key <= last_key:
            raise ValueError("bitmap keys not strictly increasing")
        last_key = key
        lows, pos = _parse_rb32(data, pos)
        base = key << 32
        out.extend(base + v for v in lows)
    if pos != len(data):
        raise ValueError(
            f"{len(data) - pos} trailing bytes after bitmaps")
    return out


# --------------------------------------- roaring bitmap: serialize


def _encode_rb32(values: list[int]) -> bytes:
    """Sorted low-32 values -> standard portable bitmap (cookie
    12346: arrays up to 4096 values per container, bitmaps above)."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    payloads = []
    for k in keys:
        vals = containers[k]
        if len(vals) <= _ARRAY_MAX:
            payloads.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            payloads.append(struct.pack("<1024Q", *words))
    out = bytearray(struct.pack("<II", _COOKIE_NO_RUN, len(keys)))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    off = len(out) + 4 * len(keys)
    for p in payloads:
        out += struct.pack("<I", off)
        off += len(p)
    for p in payloads:
        out += p
    return bytes(out)


def encode_bitmap(indexes) -> bytes:
    """Sorted (or sortable) 64-bit row indexes -> serialized
    RoaringBitmapArray (portable form)."""
    idx = sorted(set(int(i) for i in indexes))
    if any(i < 0 for i in idx):
        raise ValueError("negative row index")
    highs: dict[int, list[int]] = {}
    for i in idx:
        highs.setdefault(i >> 32, []).append(i & 0xFFFFFFFF)
    out = bytearray(struct.pack("<iq", MAGIC, len(highs)))
    for key in sorted(highs):
        out += struct.pack("<i", key)
        out += _encode_rb32(highs[key])
    return bytes(out)


# -------------------------------------------------- dv file layout


def write_dv_file(path: str, payloads: list[bytes]) -> list[int]:
    """Sidecar ``.bin``: version byte 1, then per payload
    [BE size][data][BE CRC-32]. Returns each payload's offset (of
    its size field — what the descriptor records)."""
    offsets = []
    buf = bytearray(b"\x01")
    for data in payloads:
        offsets.append(len(buf))
        buf += struct.pack(">i", len(data))
        buf += data
        buf += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf)
    os.replace(tmp, path)
    return offsets


def read_dv_payload(path: str, offset: int | None,
                    size_in_bytes: int) -> bytes:
    """One vector's bitmap bytes out of a sidecar file, size and
    CRC verified against the descriptor."""
    with open(path, "rb") as f:
        head = f.read(1)
        if head != b"\x01":
            raise ValueError(
                f"unsupported deletion vector file version "
                f"{head!r} in {path}")
        off = 1 if offset is None else offset
        f.seek(off)
        raw = f.read(4)
        if len(raw) != 4:
            raise ValueError("deletion vector size field truncated")
        (size,) = struct.unpack(">i", raw)
        if size != size_in_bytes:
            raise ValueError(
                f"deletion vector size {size} != descriptor "
                f"sizeInBytes {size_in_bytes}")
        data = f.read(size)
        if len(data) != size:
            raise ValueError("deletion vector data truncated")
        crc_raw = f.read(4)
        if len(crc_raw) != 4:
            raise ValueError("deletion vector checksum truncated")
        (crc,) = struct.unpack(">I", crc_raw)
        if crc != (zlib.crc32(data) & 0xFFFFFFFF):
            raise ValueError("deletion vector checksum mismatch")
        return data


# ------------------------------------------------------ descriptor


def dv_file_name(prefix: str, uid: uuidmod.UUID) -> str:
    base = f"deletion_vector_{uid}.bin"
    return os.path.join(prefix, base) if prefix else base


def resolve_dv(descriptor: dict, table_path: str) -> list[int]:
    """``add.deletionVector`` -> sorted deleted row indexes, with
    every verification the docstring promises."""
    st = descriptor.get("storageType")
    card = descriptor.get("cardinality")
    size = descriptor.get("sizeInBytes")
    pol = descriptor.get("pathOrInlineDv", "")
    if st == "i":
        data = z85_decode(pol)
        if size is not None and len(data) < size:
            raise ValueError(
                f"inline deletion vector {len(data)}B < descriptor "
                f"sizeInBytes {size}")
        # z85 pads to 4-byte groups; trust sizeInBytes for the tail
        if size is not None:
            data = data[:size]
    elif st in ("u", "p"):
        if st == "u":
            if len(pol) < 20:
                raise ValueError(
                    f"u-storage pathOrInlineDv too short: {pol!r}")
            prefix, enc = pol[:-20], pol[-20:]
            uid = uuidmod.UUID(bytes=z85_decode(enc))
            path = os.path.join(table_path, dv_file_name(prefix,
                                                         uid))
        else:
            path = pol
        if size is None:
            raise ValueError(
                "file-stored deletion vector lacks sizeInBytes")
        data = read_dv_payload(path, descriptor.get("offset"), size)
    else:
        raise ValueError(
            f"unsupported deletion vector storageType {st!r}")
    idx = decode_bitmap(data)
    if card is not None and len(idx) != card:
        raise ValueError(
            f"deletion vector cardinality {len(idx)} != descriptor "
            f"cardinality {card}")
    return idx


def inline_descriptor(indexes) -> dict:
    data = encode_bitmap(indexes)
    padded = data + b"\x00" * (-len(data) % 4)
    return {"storageType": "i", "pathOrInlineDv": z85_encode(padded),
            "sizeInBytes": len(data),
            "cardinality": len(set(int(i) for i in indexes))}


def file_descriptors(table_path: str, dv_sets: list,
                     prefix: str = "") -> list[dict]:
    """Write ONE sidecar carrying every bitmap in ``dv_sets`` (the
    protocol's normal shape: many files' DVs share a sidecar) and
    return one ``u``-storage descriptor per set, in order."""
    uid = uuidmod.uuid4()
    payloads = [encode_bitmap(s) for s in dv_sets]
    dest = os.path.join(table_path, dv_file_name(prefix, uid))
    os.makedirs(os.path.dirname(dest) or table_path, exist_ok=True)
    offsets = write_dv_file(dest, payloads)
    tok = prefix + z85_encode(uid.bytes)
    return [{"storageType": "u", "pathOrInlineDv": tok,
             "offset": off, "sizeInBytes": len(data),
             "cardinality": len(set(int(i) for i in s))}
            for off, data, s in zip(offsets, payloads, dv_sets)]
