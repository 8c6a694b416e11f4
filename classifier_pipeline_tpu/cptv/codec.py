"""CPTV v2 reader/writer.

Replaces the reference's external Rust extension (``cptv_rs_python_bindings``;
reference src/track/cliptrackextractor.py:30, src/ml_tools/rawdb.py:23) and
``python-cptv`` writer (reference src/piclassifier/cptvrecorder.py:4).

Two backends:
  * native  — C++ (``_native/cptv_codec.cpp``) via ctypes, built on demand.
  * python  — pure NumPy fallback, also the readable spec of the format.

The decoder is whole-clip: batch tracking wants every frame on device as one
(T, H, W) array, so we decode eagerly into a contiguous uint16 buffer instead
of mimicking the reference's frame-at-a-time iterator (a streaming-style
``next_frame`` view is still provided for the Pi runtime / replay paths).
"""

from __future__ import annotations

import ctypes
import dataclasses
import gzip
import logging
import os
import struct
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).parent / "_native"
_LIB_PATH = _NATIVE_DIR / "libcptv_codec.so"
_lib = None
_lib_failed = False


def _build_native() -> bool:
    try:
        subprocess.run(
            ["make", "-s"],
            cwd=_NATIVE_DIR,
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception as exc:  # pragma: no cover - toolchain missing
        logging.warning("cptv native build failed: %s", exc)
        return False


def _load_native():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    stale = (
        _LIB_PATH.exists()
        and _LIB_PATH.stat().st_mtime
        < (_NATIVE_DIR / "cptv_codec.cpp").stat().st_mtime
    )
    if (not _LIB_PATH.exists() or stale) and not _build_native():
        if not _LIB_PATH.exists():
            _lib_failed = True
            return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.cptv_open_file.restype = ctypes.c_void_p
    lib.cptv_open_file.argtypes = [ctypes.c_char_p]
    lib.cptv_open.restype = ctypes.c_void_p
    lib.cptv_open.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.cptv_error.restype = ctypes.c_char_p
    lib.cptv_error.argtypes = [ctypes.c_void_p]
    for name, restype in [
        ("cptv_num_frames", ctypes.c_int),
        ("cptv_width", ctypes.c_uint32),
        ("cptv_height", ctypes.c_uint32),
        ("cptv_device_id", ctypes.c_uint32),
        ("cptv_camera_serial", ctypes.c_uint32),
        ("cptv_fps", ctypes.c_uint8),
        ("cptv_preview_secs", ctypes.c_uint8),
        ("cptv_has_background", ctypes.c_uint8),
        ("cptv_latitude", ctypes.c_float),
        ("cptv_longitude", ctypes.c_float),
        ("cptv_altitude", ctypes.c_float),
        ("cptv_accuracy", ctypes.c_float),
        ("cptv_timestamp_us", ctypes.c_uint64),
        ("cptv_loc_timestamp_us", ctypes.c_uint64),
        ("cptv_devicename", ctypes.c_char_p),
        ("cptv_model", ctypes.c_char_p),
        ("cptv_brand", ctypes.c_char_p),
        ("cptv_firmware", ctypes.c_char_p),
        ("cptv_motion_config", ctypes.c_char_p),
    ]:
        fn = getattr(lib, name)
        fn.restype = restype
        fn.argtypes = [ctypes.c_void_p]
    lib.cptv_read_all.restype = ctypes.c_int
    lib.cptv_read_all.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.cptv_close.restype = None
    lib.cptv_close.argtypes = [ctypes.c_void_p]
    if hasattr(lib, "cptv_read_meta"):
        lib.cptv_read_meta.restype = ctypes.c_int
        lib.cptv_read_meta.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        for name in (
            "cptv_pixels_ptr", "cptv_resid_ptr", "cptv_shift_ptr",
            "cptv_exc_idx_ptr", "cptv_exc_val_ptr",
        ):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_void_p
            fn.argtypes = [ctypes.c_void_p]
    lib.cptv_writer_open.restype = ctypes.c_void_p
    lib.cptv_writer_open.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint64,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint32,
        ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8, ctypes.c_float,
        ctypes.c_float,
    ]
    lib.cptv_writer_error.restype = ctypes.c_char_p
    lib.cptv_writer_error.argtypes = [ctypes.c_void_p]
    lib.cptv_writer_write_frame.restype = ctypes.c_int
    lib.cptv_writer_write_frame.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_float, ctypes.c_float, ctypes.c_uint8,
    ]
    lib.cptv_writer_close.restype = ctypes.c_int
    lib.cptv_writer_close.argtypes = [ctypes.c_void_p]
    lib.nl_means_u8.restype = ctypes.c_longlong
    lib.nl_means_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_longlong, ctypes.c_longlong, ctypes.c_void_p,
    ]
    lib.delta_encode_u16.restype = ctypes.c_longlong
    lib.delta_encode_u16.argtypes = [
        ctypes.c_void_p, ctypes.c_longlong, ctypes.c_longlong,
        ctypes.c_longlong, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_longlong,
    ]
    if hasattr(lib, "cptv_num_exceptions"):
        lib.cptv_num_exceptions.restype = ctypes.c_longlong
        lib.cptv_num_exceptions.argtypes = [ctypes.c_void_p]
        lib.cptv_read_delta.restype = ctypes.c_longlong
        lib.cptv_read_delta.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
        ]
    if hasattr(lib, "mog2_update_u8"):
        lib.mog2_update_u8.restype = None
        lib.mog2_update_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_longlong,
            ctypes.c_float, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.mog2_background_u8.restype = None
        lib.mog2_background_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_longlong, ctypes.c_longlong, ctypes.c_void_p,
        ]
    if hasattr(lib, "pack4_count_i8"):
        lib.pack4_count_i8.restype = ctypes.c_longlong
        lib.pack4_count_i8.argtypes = [ctypes.c_void_p, ctypes.c_longlong]
        lib.pack4_emit_i8.restype = ctypes.c_longlong
        lib.pack4_emit_i8.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
        ]
    _lib = lib
    return _lib


def nl_means_u8_host(img):
    """Native NL-means (see _native nl_means_u8) for the CPU streaming path.
    img: (H, W) uint8-range array. Returns (H, W) int32, or None when the
    native lib is unavailable."""
    import numpy as np

    lib = _load_native()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty(img.shape, np.int32)
    lib.nl_means_u8(img.ctypes.data, img.shape[0], img.shape[1], out.ctypes.data)
    return out


def mog2_update_u8_host(frame, alphaT, weight, mean, var, nmodes, mask_out):
    """Native cv2-order MOG2 step (see _native mog2_update_u8) for the IR
    streaming runtime. All state arrays are modified in place; returns False
    when the native lib is unavailable."""
    lib = _load_native()
    if lib is None or not hasattr(lib, "mog2_update_u8"):
        return False
    lib.mog2_update_u8(
        frame.ctypes.data, frame.shape[0], frame.shape[1],
        ctypes.c_float(float(alphaT)), weight.ctypes.data, mean.ctypes.data,
        var.ctypes.data, nmodes.ctypes.data, mask_out.ctypes.data,
    )
    return True


def mog2_background_u8_host(weight, mean, nmodes, out):
    lib = _load_native()
    if lib is None or not hasattr(lib, "mog2_background_u8"):
        return False
    H, W = nmodes.shape
    lib.mog2_background_u8(
        weight.ctypes.data, mean.ctypes.data, nmodes.ctypes.data, H, W,
        out.ctypes.data,
    )
    return True


def delta_encode_u16(th, cap: int = 1 << 20):
    """Native delta encoder for the compressed device upload (see
    track/tracker_jax._encode_delta_u16). th: C-contiguous (B, T, H, W)
    uint16. Returns (first_i32, resid_i8, shift_i32, exc_idx, exc_val) or
    None when unavailable / too many exceptions (caller uploads raw)."""
    import numpy as np

    lib = _load_native()
    if lib is None:
        return None
    assert th.dtype == np.uint16 and th.flags.c_contiguous
    B, T, H, W = th.shape
    if T < 2:
        return None
    if B * (T - 1) * H * W >= 2**31:
        # exception indices are flat int32; past this the encoder would
        # silently wrap and corrupt the decode — fall back to raw upload
        return None
    resid = np.empty((B, T - 1, H, W), np.int8)
    shift = np.empty((B, T - 1), np.int32)
    exc_idx = np.zeros(cap, np.int32)
    exc_val = np.zeros(cap, np.int32)
    n = lib.delta_encode_u16(
        th.ctypes.data, B, T, H * W,
        resid.ctypes.data, shift.ctypes.data,
        exc_idx.ctypes.data, exc_val.ctypes.data, cap,
    )
    if n > cap:
        return None
    k = max(int(n), 1)
    k_pad = ((k + 4095) // 4096) * 4096
    return (
        th[:, 0].astype(np.int32),
        resid,
        shift,
        exc_idx[:k_pad],
        exc_val[:k_pad],
    )


def pack4_count(resid) -> int | None:
    """Count of int8 residuals outside the signed-nibble range [-8, 7] —
    the exception-list size pack4_into will emit. None when the native lib
    is unavailable or lacks the pack4 entry points (stale build)."""
    import numpy as np

    lib = _load_native()
    if lib is None or not hasattr(lib, "pack4_count_i8"):
        return None
    assert resid.dtype == np.int8 and resid.flags.c_contiguous
    return int(lib.pack4_count_i8(resid.ctypes.data, resid.size))


def pack4_into(resid, packed, exc_idx, exc_val, base_idx: int) -> int:
    """Pack int8 residuals (even count) into signed nibbles — pixel 2k in
    the low nibble of packed[k], 2k+1 in the high — clamping to [-8, 7];
    clamp remainders are written to exc_idx/exc_val as (base_idx + i,
    resid[i] - clamp). Destinations are caller-provided views (the fused
    staging buffer); exc views must be sized from pack4_count. Returns the
    emitted exception count."""
    import numpy as np

    lib = _load_native()
    n = resid.size
    assert n % 2 == 0 and resid.dtype == np.int8 and resid.flags.c_contiguous
    assert packed.size == n // 2 and packed.dtype == np.uint8
    return int(
        lib.pack4_emit_i8(
            resid.ctypes.data, n, packed.ctypes.data,
            exc_idx.ctypes.data, exc_val.ctypes.data, base_idx,
        )
    )


@dataclasses.dataclass
class CptvHeader:
    timestamp_us: int = 0
    x_resolution: int = 160
    y_resolution: int = 120
    compression: int = 1
    devicename: str = ""
    model: str = ""
    brand: str = ""
    firmware: str = ""
    motion_config: str = ""
    device_id: int = 0
    camera_serial: int = 0
    fps: int = 9
    preview_secs: int = 0
    latitude: float = 0.0
    longitude: float = 0.0
    loc_timestamp_us: int = 0
    altitude: float = 0.0
    accuracy: float = 0.0
    has_background: bool = False

    @property
    def timestamp(self) -> int:
        """Microseconds since epoch (reference Rust binding exposes this)."""
        return self.timestamp_us


@dataclasses.dataclass
class CptvFrame:
    """One decoded frame. ``pix`` is a (H, W) uint16 view into the clip buffer."""

    pix: np.ndarray
    time_on: int = 0  # milliseconds
    last_ffc_time: int = 0  # milliseconds
    temp_c: float = 0.0
    last_ffc_temp_c: float = 0.0
    background_frame: bool = False


class CptvClip:
    """A fully decoded CPTV clip: header + (T, H, W) uint16 pixel block."""

    def __init__(self, header: CptvHeader, pixels: np.ndarray, meta: np.ndarray,
                 delta=None):
        self.header = header
        self.pixels = pixels  # (T, H, W) uint16
        self._meta = meta  # (T, 5) uint32 [time_on, last_ffc, is_bg, temp, ffc_temp]
        # upload-ready delta stream from the native decoder, or None:
        # (resid (T-1, H, W) int8, shift (T-1,) int32, exc_idx, exc_val) with
        # exc flat indices = (frame-1)*H*W + pixel (see tracker_jax upload)
        self.delta = delta

    @property
    def n_frames(self) -> int:
        return self.pixels.shape[0]

    def leading_background_count(self):
        """Number of background frames when they form a contiguous leading
        prefix (the normal layout — a CPTV's background frame is frame 0),
        else None. Shared by foreground() and the delta-stream slicing in
        the extractor so frame selection can never desync between the
        thermal view and the sliced delta stream."""
        bg = self.is_background
        nbg = int(bg.sum())
        return nbg if nbg == 0 or bg[:nbg].all() else None

    def foreground(self):
        """(pixels, meta) excluding background frames. Returns VIEWS when
        the background frames are a leading prefix, avoiding a (T, H, W)
        copy on every access; falls back to fancy indexing otherwise."""
        nbg = self.leading_background_count()
        if nbg == 0:
            return self.pixels, self._meta
        if nbg is not None:
            return self.pixels[nbg:], self._meta[nbg:]
        keep = ~self.is_background
        return self.pixels[keep], self._meta[keep]

    @property
    def foreground_pixels(self) -> np.ndarray:
        return self.foreground()[0]

    @property
    def time_on_ms(self) -> np.ndarray:
        return self._meta[:, 0]

    @property
    def last_ffc_ms(self) -> np.ndarray:
        return self._meta[:, 1]

    @property
    def is_background(self) -> np.ndarray:
        return self._meta[:, 2].astype(bool)

    @property
    def temp_c(self) -> np.ndarray:
        return self._meta[:, 3].view(np.float32)

    @property
    def ffc_temp_c(self) -> np.ndarray:
        return self._meta[:, 4].view(np.float32)

    def frame(self, i: int) -> CptvFrame:
        m = self._meta[i]
        return CptvFrame(
            pix=self.pixels[i],
            time_on=int(m[0]),
            last_ffc_time=int(m[1]),
            temp_c=float(np.uint32(m[3]).view(np.float32)),
            last_ffc_temp_c=float(np.uint32(m[4]).view(np.float32)),
            background_frame=bool(m[2]),
        )

    def frames(self):
        for i in range(self.n_frames):
            yield self.frame(i)

    @property
    def background(self) -> np.ndarray | None:
        """The embedded background frame, if the clip has one."""
        if self.n_frames and self._meta[0, 2]:
            return self.pixels[0]
        return None


# ------------------------------------------------------------ pure python ---


def _parse_fields(data: bytes, pos: int):
    n = data[pos]
    pos += 1
    fields = {}
    for _ in range(n):
        ln = data[pos]
        code = chr(data[pos + 1])
        pos += 2
        fields[code] = data[pos : pos + ln]
        pos += ln
    return fields, pos


def _decode_py(path_or_bytes) -> CptvClip:
    if isinstance(path_or_bytes, (str, Path)):
        raw = Path(path_or_bytes).read_bytes()
    else:
        raw = path_or_bytes
    data = gzip.decompress(raw)
    if data[:4] != b"CPTV" or data[4] != 2:
        raise ValueError("not a CPTV v2 file")
    pos = 5
    if chr(data[pos]) != "H":
        raise ValueError("expected header section")
    fields, pos = _parse_fields(data, pos + 1)

    def u(code, fmt, default=0):
        return struct.unpack(fmt, fields[code])[0] if code in fields else default

    def s(code):
        return fields[code].decode("utf-8", "replace") if code in fields else ""

    header = CptvHeader(
        timestamp_us=u("T", "<Q"),
        x_resolution=u("X", "<I", 160),
        y_resolution=u("Y", "<I", 120),
        compression=u("C", "<B", 1),
        devicename=s("D"),
        model=s("E"),
        brand=s("B"),
        firmware=s("V"),
        motion_config=s("M"),
        device_id=u("I", "<I"),
        camera_serial=u("N", "<I"),
        fps=u("Z", "<B", 9),
        preview_secs=u("P", "<B"),
        latitude=u("L", "<f", 0.0),
        longitude=u("O", "<f", 0.0),
        loc_timestamp_us=u("S", "<Q"),
        altitude=u("A", "<f", 0.0),
        accuracy=u("U", "<f", 0.0),
        has_background=bool(u("g", "<B")),
    )
    W, H = header.x_resolution, header.y_resolution
    npix = W * H
    frames = []
    metas = []
    prev = np.zeros((H, W), np.int64)
    while pos < len(data):
        if chr(data[pos]) != "F":
            raise ValueError(f"unexpected section {data[pos]!r} at {pos}")
        f, pos = _parse_fields(data, pos + 1)
        size = struct.unpack("<I", f["f"])[0]
        w_bits = f["w"][0]
        buf = data[pos : pos + size]
        pos += size
        first = struct.unpack("<i", buf[:4])[0]
        bits = np.unpackbits(np.frombuffer(buf[4:], np.uint8))
        vals = bits[: (npix - 1) * w_bits].reshape(npix - 1, w_bits).astype(np.int64)
        adj = np.zeros(npix - 1, np.int64)
        for b in range(w_bits):
            adj = (adj << 1) | vals[:, b]
        adj[adj >= (1 << (w_bits - 1))] -= 1 << w_bits
        snake = np.concatenate([[first], adj]).cumsum().reshape(H, W)
        snake[1::2] = snake[1::2, ::-1]
        prev = prev + snake
        frames.append(prev.astype(np.uint16))
        t = struct.unpack("<I", f["t"])[0] if "t" in f else 0
        c = struct.unpack("<I", f["c"])[0] if "c" in f else 0
        g = f["g"][0] if "g" in f else 0
        ta = struct.unpack("<I", f["a"])[0] if "a" in f else 0
        tb = struct.unpack("<I", f["b"])[0] if "b" in f else 0
        metas.append([t, c, g, ta, tb])
    pixels = np.stack(frames) if frames else np.zeros((0, H, W), np.uint16)
    return CptvClip(header, pixels, np.array(metas, np.uint32).reshape(-1, 5))


def _encode_py(
    path,
    pixels: np.ndarray,
    header: CptvHeader,
    time_on_ms=None,
    last_ffc_ms=None,
    is_background=None,
):
    """Pure-python CPTV encoder (mirror of the C++ writer)."""
    T, H, W = pixels.shape
    out = bytearray(b"CPTV\x02")

    def field(code, data):
        return bytes([len(data), ord(code)]) + data

    hfields = [
        field("T", struct.pack("<Q", header.timestamp_us)),
        field("X", struct.pack("<I", W)),
        field("Y", struct.pack("<I", H)),
        field("C", b"\x01"),
        field("Z", bytes([header.fps])),
        field("P", bytes([header.preview_secs])),
        field("I", struct.pack("<I", header.device_id)),
    ]
    if header.has_background:
        hfields.append(field("g", b"\x01"))
    if header.devicename:
        hfields.append(field("D", header.devicename.encode()[:255]))
    if header.model:
        hfields.append(field("E", header.model.encode()[:255]))
    if header.brand:
        hfields.append(field("B", header.brand.encode()[:255]))
    out += b"H" + bytes([len(hfields)]) + b"".join(hfields)
    prev = np.zeros((H, W), np.int64)
    for i in range(T):
        cur = pixels[i].astype(np.int64)
        snake = cur - prev
        snake = snake.copy()
        snake[1::2] = snake[1::2, ::-1]
        flat = snake.reshape(-1)
        adj = np.diff(flat)
        max_abs = int(np.maximum(adj, -adj - 1).max()) if adj.size else 0
        w_bits = max(2, int(max_abs).bit_length() + 1)
        mask = (1 << w_bits) - 1
        u = (adj & mask).astype(np.uint64)
        npix1 = adj.size
        bits = np.zeros((npix1, w_bits), np.uint8)
        for b in range(w_bits):
            bits[:, b] = (u >> (w_bits - 1 - b)) & 1
        packed = np.packbits(bits.reshape(-1))
        bg = bool(is_background[i]) if is_background is not None else False
        ffields = []
        if bg:
            ffields.append(field("g", b"\x01"))
        else:
            ffields.append(field("t", struct.pack("<I", int(time_on_ms[i]) if time_on_ms is not None else 0)))
            ffields.append(field("c", struct.pack("<I", int(last_ffc_ms[i]) if last_ffc_ms is not None else 0)))
            ffields.append(field("a", struct.pack("<f", 0.0)))
            ffields.append(field("b", struct.pack("<f", 0.0)))
        fsize = 4 + packed.size
        ffields.append(field("w", bytes([w_bits])))
        ffields.append(field("f", struct.pack("<I", fsize)))
        out += b"F" + bytes([len(ffields)]) + b"".join(ffields)
        out += struct.pack("<i", int(flat[0])) + packed.tobytes()
        prev = cur
    Path(path).write_bytes(gzip.compress(bytes(out), 6))


# ----------------------------------------------------------------- native ---


class _ReaderOwner:
    """Keeps a native Reader handle (and the decode buffers the zero-copy
    numpy views point into) alive until the last view dies; closes on GC.
    The close function is bound at construction so module teardown order
    can't leave __del__ without it."""

    __slots__ = ("_close", "_h")

    def __init__(self, lib, h):
        self._close = lib.cptv_close
        self._h = h

    def __del__(self):
        h, self._h = self._h, None
        if h:
            self._close(h)


def _wrap_native(ptr, count, dtype, shape, owner):
    """numpy view over a native decode buffer. The view's base is a ctypes
    buffer that carries the _ReaderOwner, so any slice/view chain keeps the
    native memory alive (numpy base-chaining)."""
    dtype = np.dtype(dtype)
    if not ptr or count == 0:
        return np.zeros(shape, dtype)
    cbuf = (ctypes.c_char * (count * dtype.itemsize)).from_address(ptr)
    cbuf._owner = owner
    return np.frombuffer(cbuf, dtype=dtype).reshape(shape)


def _decode_native(path) -> CptvClip | None:
    lib = _load_native()
    if lib is None:
        return None
    h = lib.cptv_open_file(str(path).encode())
    zero_copy = hasattr(lib, "cptv_read_meta")
    try:
        err = lib.cptv_error(h)
        if err:
            raise ValueError(f"CPTV decode failed: {err.decode()}")
        n = lib.cptv_num_frames(h)
        W = lib.cptv_width(h)
        H = lib.cptv_height(h)
        header = CptvHeader(
            timestamp_us=lib.cptv_timestamp_us(h),
            x_resolution=W,
            y_resolution=H,
            devicename=(lib.cptv_devicename(h) or b"").decode("utf-8", "replace"),
            model=(lib.cptv_model(h) or b"").decode("utf-8", "replace"),
            brand=(lib.cptv_brand(h) or b"").decode("utf-8", "replace"),
            firmware=(lib.cptv_firmware(h) or b"").decode("utf-8", "replace"),
            motion_config=(lib.cptv_motion_config(h) or b"").decode("utf-8", "replace"),
            device_id=lib.cptv_device_id(h),
            camera_serial=lib.cptv_camera_serial(h),
            fps=lib.cptv_fps(h),
            preview_secs=lib.cptv_preview_secs(h),
            latitude=lib.cptv_latitude(h),
            longitude=lib.cptv_longitude(h),
            loc_timestamp_us=lib.cptv_loc_timestamp_us(h),
            altitude=lib.cptv_altitude(h),
            accuracy=lib.cptv_accuracy(h),
            has_background=bool(lib.cptv_has_background(h)),
        )
        if zero_copy:
            # pixels/delta are views into the Reader's own buffers — no
            # output memcpy, no fresh-numpy page faults (~22MB/clip saved on
            # the one-core hosts this runs on). The handle closes when the
            # last view dies.
            meta = np.empty((n, 5), np.uint32)
            got = lib.cptv_read_meta(h, meta.ctypes.data_as(ctypes.c_void_p))
            if got != n:
                raise ValueError("CPTV read_meta failed")
            owner = _ReaderOwner(lib, h)
            h = None  # owner holds it now; the finally must not double-close
            pixels = _wrap_native(
                lib.cptv_pixels_ptr(owner._h), n * H * W, np.uint16,
                (n, H, W), owner,
            )
            delta = None
            if n >= 2:
                n_exc = int(lib.cptv_num_exceptions(owner._h))
                if n_exc >= 0:  # <0: overflowed stream, decoder says fall back
                    delta = (
                        _wrap_native(lib.cptv_resid_ptr(owner._h),
                                     (n - 1) * H * W, np.int8,
                                     (n - 1, H, W), owner),
                        _wrap_native(lib.cptv_shift_ptr(owner._h), n - 1,
                                     np.int32, (n - 1,), owner),
                        _wrap_native(lib.cptv_exc_idx_ptr(owner._h), n_exc,
                                     np.int32, (n_exc,), owner),
                        _wrap_native(lib.cptv_exc_val_ptr(owner._h), n_exc,
                                     np.int32, (n_exc,), owner),
                    )
            return CptvClip(header, pixels, meta, delta=delta)
        pixels = np.empty((n, H, W), np.uint16)
        meta = np.empty((n, 5), np.uint32)
        got = lib.cptv_read_all(
            h,
            pixels.ctypes.data_as(ctypes.c_void_p),
            meta.ctypes.data_as(ctypes.c_void_p),
        )
        if got != n:
            raise ValueError("CPTV read_all failed")
        delta = None
        if n >= 2 and hasattr(lib, "cptv_num_exceptions"):
            n_exc = lib.cptv_num_exceptions(h)
            if n_exc < 0:  # overflowed stream: decoder says fall back
                return CptvClip(header, pixels, meta, delta=None)
            resid = np.empty((n - 1, H, W), np.int8)
            shift = np.empty(n - 1, np.int32)
            exc_idx = np.empty(max(int(n_exc), 1), np.int32)
            exc_val = np.empty(max(int(n_exc), 1), np.int32)
            got_exc = lib.cptv_read_delta(
                h,
                resid.ctypes.data_as(ctypes.c_void_p),
                shift.ctypes.data_as(ctypes.c_void_p),
                exc_idx.ctypes.data_as(ctypes.c_void_p),
                exc_val.ctypes.data_as(ctypes.c_void_p),
                int(n_exc),
            )
            if got_exc == n_exc:
                delta = (resid, shift, exc_idx[:n_exc], exc_val[:n_exc])
        return CptvClip(header, pixels, meta, delta=delta)
    finally:
        if h:
            lib.cptv_close(h)


def load_cptv(path, backend: str | None = None) -> CptvClip:
    """Decode a whole .cptv file. backend: None (auto), 'native', 'python'."""
    backend = backend or os.environ.get("CPTPU_CPTV_BACKEND")
    if backend == "python":
        return _decode_py(path)
    clip = _decode_native(path)
    if clip is None:
        if backend == "native":
            raise RuntimeError("native cptv codec unavailable")
        return _decode_py(path)
    return clip


class CptvReader:
    """Frame-at-a-time compatibility shim over the eager decoder.

    API shape mirrors the reference's Rust binding usage
    (``CptvReader(path).get_header() / .next_frame()``;
    reference src/track/cliptrackextractor.py:108-129).
    """

    def __init__(self, path, backend=None):
        self._clip = load_cptv(path, backend=backend)
        self._i = 0

    def get_header(self) -> CptvHeader:
        return self._clip.header

    def next_frame(self) -> CptvFrame | None:
        if self._i >= self._clip.n_frames:
            return None
        f = self._clip.frame(self._i)
        self._i += 1
        return f


class CptvWriter:
    """Streaming CPTV encoder (reference python-cptv CPTVWriter equivalent)."""

    def __init__(self, path, header: CptvHeader):
        self.path = Path(path)
        self.header = header
        self._lib = _load_native()
        self._h = None
        self._frames = []  # python fallback accumulates
        self._metas = []
        if self._lib is not None:
            self._h = self._lib.cptv_writer_open(
                str(path).encode(),
                header.x_resolution,
                header.y_resolution,
                header.timestamp_us,
                header.devicename.encode(),
                header.model.encode(),
                header.brand.encode(),
                header.device_id,
                header.fps,
                header.preview_secs,
                1 if header.has_background else 0,
                header.latitude,
                header.longitude,
            )
            err = self._lib.cptv_writer_error(self._h)
            if err:
                raise IOError(f"CPTV writer: {err.decode()}")

    def write_frame(
        self,
        pix: np.ndarray,
        time_on_ms: int = 0,
        last_ffc_ms: int = 0,
        temp_c: float = 0.0,
        last_ffc_temp_c: float = 0.0,
        is_background: bool = False,
    ):
        pix = np.ascontiguousarray(pix, np.uint16)
        if self._h is not None:
            rc = self._lib.cptv_writer_write_frame(
                self._h,
                pix.ctypes.data_as(ctypes.c_void_p),
                time_on_ms,
                last_ffc_ms,
                temp_c,
                last_ffc_temp_c,
                1 if is_background else 0,
            )
            if rc != 0:
                raise IOError("CPTV write_frame failed")
        else:
            self._frames.append(pix)
            self._metas.append((time_on_ms, last_ffc_ms, is_background))

    def close(self):
        if self._h is not None:
            self._lib.cptv_writer_close(self._h)
            self._h = None
        elif self._frames:
            _encode_py(
                self.path,
                np.stack(self._frames),
                self.header,
                time_on_ms=[m[0] for m in self._metas],
                last_ffc_ms=[m[1] for m in self._metas],
                is_background=[m[2] for m in self._metas],
            )
            self._frames = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
