"""TFRecord + tf.train.Example IO without TensorFlow.

Container framing and crc32c live in C++ (_native/record_io.cpp); the
Example protobuf wire format is encoded/decoded here (it is a tiny stable
schema: Example > Features > map<string, Feature{bytes|float|int64 list}>).

Replaces the reference's tf-side TFRecord writing/reading
(reference src/ml_tools/tfwriter.py:23-110, tfrecord_util.py, tfdataset.py
decode path) and stays byte-compatible: files written here are readable by
tf.data and vice versa (covered by tests against the real tensorflow).
"""

from __future__ import annotations

import ctypes
import struct
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).parent / "_native"
_LIB_PATH = _NATIVE_DIR / "librecord_io.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True, timeout=120)
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.rec_writer_open.restype = ctypes.c_void_p
    lib.rec_writer_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.rec_writer_write.restype = ctypes.c_int
    lib.rec_writer_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64]
    lib.rec_writer_close.restype = ctypes.c_int
    lib.rec_writer_close.argtypes = [ctypes.c_void_p]
    lib.rec_reader_open.restype = ctypes.c_void_p
    lib.rec_reader_open.argtypes = [ctypes.c_char_p]
    lib.rec_reader_error.restype = ctypes.c_char_p
    lib.rec_reader_error.argtypes = [ctypes.c_void_p]
    lib.rec_reader_next.restype = ctypes.c_int64
    lib.rec_reader_next.argtypes = [ctypes.c_void_p]
    lib.rec_reader_data.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.rec_reader_data.argtypes = [ctypes.c_void_p]
    lib.rec_reader_close.restype = None
    lib.rec_reader_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class RecordWriter:
    def __init__(self, path, gzip: bool = True):
        self._lib = _load()
        self._h = self._lib.rec_writer_open(str(path).encode(), 1 if gzip else 0)
        if not self._h:
            raise IOError(f"cannot open {path}")

    def write(self, data: bytes):
        if self._lib.rec_writer_write(self._h, data, len(data)) != 0:
            raise IOError("record write failed")

    def close(self):
        if self._h:
            self._lib.rec_writer_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def read_records(path):
    """Yields raw record bytes (handles gzip transparently)."""
    lib = _load()
    h = lib.rec_reader_open(str(path).encode())
    try:
        err = lib.rec_reader_error(h)
        if err:
            raise IOError(f"{path}: {err.decode()}")
        while True:
            n = lib.rec_reader_next(h)
            if n == 0:
                break
            if n < 0:
                raise IOError(f"{path}: {lib.rec_reader_error(h).decode()}")
            yield ctypes.string_at(lib.rec_reader_data(h), n)
    finally:
        lib.rec_reader_close(h)


# --------------------------------------------------------------- protobuf ---


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def bytes_feature(values) -> bytes:
    """Feature{ bytes_list=1 { repeated bytes value=1 } }"""
    if isinstance(values, (bytes, str)):
        values = [values]
    inner = b"".join(
        _len_delim(1, v.encode() if isinstance(v, str) else v) for v in values
    )
    return _len_delim(1, inner)


def float_list_feature(values) -> bytes:
    """Feature{ float_list=2 { repeated float value=1 (packed) } }"""
    arr = np.asarray(values, np.float32).ravel()
    return _len_delim(2, _len_delim(1, arr.tobytes()))


def int64_feature(values) -> bytes:
    """Feature{ int64_list=3 { repeated int64 value=1 (packed) } }"""
    if np.isscalar(values):
        values = [values]
    payload = b"".join(
        _varint(int(v) & 0xFFFFFFFFFFFFFFFF) for v in values
    )
    return _len_delim(3, _len_delim(1, payload))


def encode_example(feature_dict: dict[str, bytes]) -> bytes:
    """Example{ features=1{ map<string, Feature> feature=1 } }.
    Values in feature_dict must already be encoded Feature messages."""
    entries = b""
    for key, feat in feature_dict.items():
        entry = _len_delim(1, key.encode()) + _len_delim(2, feat)
        entries += _len_delim(1, entry)
    return _len_delim(1, entries)


def _read_varint(data, pos):
    result = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def decode_example(data: bytes) -> dict:
    """Decode an Example into {name: np.ndarray|list[bytes]}."""
    out = {}
    pos = 0
    # Example: field 1 = Features
    tag, pos = _read_varint(data, pos)
    assert tag >> 3 == 1
    flen, pos = _read_varint(data, pos)
    end = pos + flen
    while pos < end:
        tag, pos = _read_varint(data, pos)
        assert tag >> 3 == 1  # map entry
        elen, pos = _read_varint(data, pos)
        eend = pos + elen
        key = None
        feat = None
        while pos < eend:
            t, pos = _read_varint(data, pos)
            ln, pos = _read_varint(data, pos)
            if t >> 3 == 1:
                key = data[pos : pos + ln].decode()
            else:
                feat = data[pos : pos + ln]
            pos += ln
        out[key] = _decode_feature(feat)
    return out


def _decode_feature(feat: bytes):
    pos = 0
    tag, pos = _read_varint(feat, pos)
    kind = tag >> 3
    ln, pos = _read_varint(feat, pos)
    body = feat[pos : pos + ln]
    if kind == 1:  # bytes list
        vals = []
        p = 0
        while p < len(body):
            t, p = _read_varint(body, p)
            l2, p = _read_varint(body, p)
            vals.append(body[p : p + l2])
            p += l2
        return vals
    if kind == 2:  # float list (packed or repeated)
        p = 0
        vals = []
        while p < len(body):
            t, p = _read_varint(body, p)
            if t & 7 == 2:  # packed
                l2, p = _read_varint(body, p)
                vals.append(np.frombuffer(body, np.float32, count=l2 // 4, offset=p))
                p += l2
            else:  # single fixed32
                vals.append(np.frombuffer(body, np.float32, count=1, offset=p))
                p += 4
        return np.concatenate(vals) if vals else np.zeros(0, np.float32)
    if kind == 3:  # int64 list
        p = 0
        vals = []
        while p < len(body):
            t, p = _read_varint(body, p)
            if t & 7 == 2:
                l2, p = _read_varint(body, p)
                e2 = p + l2
                while p < e2:
                    v, p = _read_varint(body, p)
                    vals.append(np.int64(np.uint64(v)))
            else:
                v, p = _read_varint(body, p)
                vals.append(np.int64(np.uint64(v)))
        return np.array(vals, np.int64)
    raise ValueError(f"unknown feature kind {kind}")
