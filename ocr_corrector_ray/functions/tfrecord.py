"""Dependency-free TFRecord + tf.train.Example encoding.

Closes the reference's training-corpus serving descope (S10,
create_tf_record.py:104-180 writes masked-LM instances as TFRecord via
TensorFlow): this module produces byte-identical *container* format —
TFRecord framing (length + masked-CRC32C framing, the format TF's
``tf.data.TFRecordDataset`` reads) around hand-encoded
``tf.train.Example`` protobuf messages — without TensorFlow, which is
not installed in this environment (SURVEY.md §7.0).

Wire formats implemented from the public specs:

- protobuf encoding (varint / length-delimited fields) for the Example
  message tree: Example{ features: Features{ feature: map<string,
  Feature{ bytes_list | float_list | int64_list } > } }
- TFRecord framing: little-endian uint64 length, 4-byte masked CRC32C
  of the length bytes, payload, 4-byte masked CRC32C of the payload;
  mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8 (mod 2^32)
- CRC32C (Castagnoli polynomial 0x82F63B78), table-driven

A matching reader (`read_tfrecords` / `decode_example`) round-trips the
format so tests verify structure without TF.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterable, List, Tuple, Union

import numpy as np

# -- CRC32C (Castagnoli), table-driven ---------------------------------------

_CRC_TABLE = None


def _crc_table() -> np.ndarray:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = np.uint32(0x82F63B78)
        table = np.zeros(256, dtype=np.uint32)
        for i in range(256):
            crc = np.uint32(i)
            for _ in range(8):
                crc = (crc >> np.uint32(1)) ^ (poly if crc & np.uint32(1) else np.uint32(0))
            table[i] = crc
        _CRC_TABLE = table
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    """CRC-32C of ``data`` (test vector: b'123456789' -> 0xE3069283)."""
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = int(table[(crc ^ b) & 0xFF]) ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# -- protobuf primitives ------------------------------------------------------

def _varint(n: int) -> bytes:
    if n < 0:  # protobuf int64: negatives as two's-complement 64-bit
        n &= 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        bits = n & 0x7F
        n >>= 7
        if n:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def _len_delimited(field_no: int, payload: bytes) -> bytes:
    return _varint((field_no << 3) | 2) + _varint(len(payload)) + payload


def _feature(value) -> bytes:
    """Encode one tf.train.Feature (oneof by python type)."""
    if isinstance(value, (bytes, str)) or (
        isinstance(value, (list, tuple)) and value and isinstance(value[0], (bytes, str))
    ):
        items = [value] if isinstance(value, (bytes, str)) else list(value)
        payload = b"".join(
            _len_delimited(1, v.encode("utf-8") if isinstance(v, str) else v)
            for v in items
        )
        return _len_delimited(1, payload)  # Feature.bytes_list
    if isinstance(value, float) or (
        isinstance(value, (list, tuple)) and value and isinstance(value[0], float)
    ):
        items = [value] if isinstance(value, float) else list(value)
        # FloatList.value is repeated float (packed): field 1, wire type 2
        payload = _varint((1 << 3) | 2) + _varint(4 * len(items)) + struct.pack(
            f"<{len(items)}f", *items
        )
        return _len_delimited(2, payload)  # Feature.float_list
    items = [value] if isinstance(value, (int, np.integer)) else list(value)
    body = b"".join(_varint(int(v)) for v in items)
    payload = _varint((1 << 3) | 2) + _varint(len(body)) + body
    return _len_delimited(3, payload)  # Feature.int64_list (packed varints)


def encode_example(features: Dict[str, Union[int, float, bytes, str, list]]) -> bytes:
    """Serialize one tf.train.Example."""
    entries = b""
    for name in sorted(features):  # deterministic output
        key = _len_delimited(1, name.encode("utf-8"))
        val = _len_delimited(2, _feature(features[name]))
        entries += _len_delimited(1, key + val)  # Features.feature map entry
    return _len_delimited(1, entries)  # Example.features


def write_tfrecord_file(path: str, examples: Iterable[bytes]) -> int:
    """Frame serialized Examples into one TFRecord file; returns count."""
    n = 0
    with open(path, "wb") as f:
        for payload in examples:
            length = struct.pack("<Q", len(payload))
            f.write(length)
            f.write(struct.pack("<I", _masked_crc(length)))
            f.write(payload)
            f.write(struct.pack("<I", _masked_crc(payload)))
            n += 1
    return n


# -- reader (round-trip verification without TF) ------------------------------

def read_tfrecords(path: str, verify_crc: bool = True) -> List[bytes]:
    out = []
    with open(path, "rb") as f:
        while True:
            head = f.read(8)
            if not head:
                return out
            (length,) = struct.unpack("<Q", head)
            (lcrc,) = struct.unpack("<I", f.read(4))
            payload = f.read(length)
            (pcrc,) = struct.unpack("<I", f.read(4))
            if verify_crc:
                if _masked_crc(head) != lcrc:
                    raise ValueError(f"length CRC mismatch in {path}")
                if _masked_crc(payload) != pcrc:
                    raise ValueError(f"payload CRC mismatch in {path}")
            out.append(payload)


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes):
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field_no, wire = tag >> 3, tag & 7
        if wire == 2:
            ln, pos = _read_varint(buf, pos)
            yield field_no, buf[pos : pos + ln]
            pos += ln
        elif wire == 0:
            v, pos = _read_varint(buf, pos)
            yield field_no, v
        else:  # pragma: no cover — not produced by this writer
            raise ValueError(f"unsupported wire type {wire}")


def decode_example(payload: bytes) -> Dict[str, list]:
    """Parse a serialized Example back to {name: [values]}."""
    out: Dict[str, list] = {}
    for fno, features_buf in _fields(payload):
        if fno != 1:
            continue
        for eno, entry in _fields(features_buf):
            if eno != 1:
                continue
            name = None
            vals: list = []
            for kno, kv in _fields(entry):
                if kno == 1:
                    name = kv.decode("utf-8")
                elif kno == 2:
                    for tno, lst in _fields(kv):
                        for _, inner in _fields(lst):
                            if tno == 1:  # bytes_list
                                vals.append(inner)
                            elif tno == 2:  # float_list (packed)
                                vals.extend(struct.unpack(f"<{len(inner)//4}f", inner))
                            elif tno == 3:  # int64_list (packed varints)
                                p = 0
                                while p < len(inner):
                                    v, p = _read_varint(inner, p)
                                    vals.append(v)
            out[name] = vals
    return out
