"""Snappy raw-format codec (Google's published format description) —
the block compression Avro containers and SequenceFiles actually ship
(``avro.codec: snappy``), implemented with NO codec library: the
varint uncompressed-length preamble, literal elements (with the
60/61/62/63 length-extension tags), and all three copy forms —
1-byte-offset (tag 01: lengths 4..11, 11-bit offsets), 2-byte-offset
(tag 10), 4-byte-offset (tag 11) — with overlap-safe copies.  The
encoder twin is a greedy hash-chain matcher emitting 2-byte-offset
copies, so repeated byte patterns in real record streams genuinely
exercise the copy paths.

Everything derives from the public format description; the format has
no empirical tables.

Reference scope note: the reference (sumaniitm/open-source-etl)
delegates storage formats to its warehouse; this module is part of
the training-data-pipeline surface the brief adds.
"""
from __future__ import annotations


def snappy_decompress(doc_id: int, data: bytes) -> bytes:
    """Decode one raw snappy stream, verifying the preamble's length
    claim exactly."""
    pos = 0
    ulen = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError(
                f"doc {doc_id}: truncated snappy length preamble"
            )
        b = data[pos]
        pos += 1
        ulen |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            break
        if shift > 35:
            raise ValueError(
                f"doc {doc_id}: runaway snappy length varint"
            )
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if pos + nb > n:
                    raise ValueError(
                        f"doc {doc_id}: truncated literal length"
                    )
                ln = int.from_bytes(data[pos : pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > n:
                raise ValueError(
                    f"doc {doc_id}: snappy literal overruns the stream"
                )
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 7) + 4
            if pos >= n:
                raise ValueError(
                    f"doc {doc_id}: truncated 1-byte copy offset"
                )
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError(
                    f"doc {doc_id}: truncated 2-byte copy offset"
                )
            off = data[pos] | (data[pos + 1] << 8)
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError(
                    f"doc {doc_id}: truncated 4-byte copy offset"
                )
            off = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError(
                f"doc {doc_id}: snappy copy offset {off} outside the "
                "decoded prefix"
            )
        for _ in range(ln):
            out.append(out[len(out) - off])
    if len(out) != ulen:
        raise ValueError(
            f"doc {doc_id}: snappy preamble claims {ulen} bytes, "
            f"decoded {len(out)}"
        )
    return bytes(out)


def _emit_literal(out: bytearray, chunk: bytes) -> None:
    while chunk:
        part = chunk[:65536]
        chunk = chunk[65536:]
        lm1 = len(part) - 1
        if lm1 < 60:
            out.append(lm1 << 2)
        elif lm1 < 256:
            out.append(60 << 2)
            out.append(lm1)
        else:
            out.append(61 << 2)
            out += lm1.to_bytes(2, "little")
        out += part


def snappy_compress(data: bytes) -> bytes:
    """Greedy hash-match encoder: 4-byte anchors, matches extended to
    at most 64 bytes, emitted as 2-byte-offset copies.  Always
    produces a valid stream (worst case: one literal run)."""
    out = bytearray()
    ln = len(data)
    v = ln
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            break
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    while i + 4 <= ln:
        key = data[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and 0 < i - j <= 65535:
            mlen = 4
            while (
                i + mlen < ln and mlen < 64
                and data[j + mlen] == data[i + mlen]
            ):
                mlen += 1
            _emit_literal(out, data[lit_start:i])
            out.append(((mlen - 1) << 2) | 2)
            out += (i - j).to_bytes(2, "little")
            end = i + mlen
            while i < end:
                if i + 4 <= ln:
                    table[data[i : i + 4]] = i
                i += 1
            lit_start = i
        else:
            i += 1
    _emit_literal(out, data[lit_start:])
    return bytes(out)
