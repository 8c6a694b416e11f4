"""Raw camera frame parsing + socket header handshake (reference
src/piclassifier/cameras/{rawframe,lepton3}.py, headerinfo.py)."""

from __future__ import annotations

import dataclasses
from datetime import timedelta
from struct import unpack_from

import numpy as np
import yaml


@dataclasses.dataclass
class Telemetry:
    telemetry_revision: int = 0
    time_on: int = 0  # milliseconds
    status_bits: int = 0
    software_revision: int = 0
    frame_counter: int = 0
    frame_mean: int = 0
    fpa_temp_counts: int = 0
    fpa_temp: float = 0.0
    fpa_temp_last_ffc: float = 0.0
    last_ffc_time: int = 0  # milliseconds
    ffc_imminent: bool = False
    ffc_status: int = 0


@dataclasses.dataclass
class CameraFrame:
    """Parsed streaming frame. time fields in int milliseconds (the format
    every consumer — FFC check, recorder — uses)."""

    pix: np.ndarray
    time_on: int
    last_ffc_time: int
    temp_c: float = 0.0
    last_ffc_temp_c: float = 0.0
    ffc_imminent: bool = False
    ffc_status: int = 0
    background_frame: bool = False
    received_at: float | None = None
    frame_number: int | None = None


@dataclasses.dataclass
class HeaderInfo:
    """Camera socket handshake header (reference headerinfo.py)."""

    res_x: int
    res_y: int
    fps: int
    brand: str | None = None
    model: str | None = None
    frame_size: int | None = None
    pixel_bits: int | None = None
    serial: int | None = None
    firmware: str | None = None

    @classmethod
    def parse_header(cls, raw_string):
        raw = yaml.safe_load(raw_string)
        h = cls(
            res_x=raw.get("ResX"),
            res_y=raw.get("ResY"),
            fps=raw.get("FPS"),
            brand=raw.get("Brand"),
            model=raw.get("Model"),
            serial=raw.get("CameraSerial"),
            frame_size=raw.get("FrameSize"),
            pixel_bits=raw.get("PixelBits"),
            firmware=str(raw.get("Firmware")),
        )
        if h.res_x and h.res_y:
            if not h.pixel_bits and h.frame_size:
                h.pixel_bits = int(8 * h.frame_size / (h.res_x * h.res_y))
            elif not h.frame_size and h.pixel_bits:
                h.frame_size = int(h.res_x * h.res_y * h.pixel_bits / 8)
        h.validate()
        return h

    def validate(self):
        if not (self.res_x and self.res_y and self.fps and self.pixel_bits):
            raise ValueError("header info missing ResX/ResY/FPS/PixelBits")
        return True


def _u16(raw, offset):
    return unpack_from(">H", raw, offset)[0]


def _u32_lepton(raw, offset):
    # lepton word-swapped big-endian u32
    return (
        raw[offset + 1]
        | (raw[offset] << 8)
        | (raw[offset + 3] << 16)
        | (raw[offset + 2] << 24)
    )


class Lepton3:
    """FLIR Lepton 3/3.5 raw socket frame: 4 telemetry VoSPI packets then
    big-endian pixels."""

    VOSPI_DATA_SIZE = 160
    TELEMETRY_PACKET_COUNT = 4

    def __init__(self, headers: HeaderInfo):
        self.headers = headers
        self.img_dtype = np.dtype(f"uint{headers.pixel_bits}")

    def get_telemetry_size(self):
        return self.VOSPI_DATA_SIZE * self.TELEMETRY_PACKET_COUNT

    def parse_telemetry(self, raw: bytes) -> Telemetry:
        t = Telemetry()
        t.telemetry_revision = _u16(raw, 0)
        time_counter = _u32_lepton(raw, 2)
        status_bits = _u32_lepton(raw, 6)
        t.status_bits = status_bits
        t.ffc_status = (status_bits >> 4) & 0b11
        offset = 2 + 4 + 4 + 16
        offset += 8 + 6
        t.frame_counter = _u32_lepton(raw, offset)
        offset += 4
        frame_mean, fpa_temp_counts, fpa_temp = unpack_from(">HHH", raw, offset)
        t.frame_mean = frame_mean
        t.fpa_temp_counts = fpa_temp_counts
        t.fpa_temp = (fpa_temp - 27315.0) / 100
        offset += 2 * (1 + 1 + 1 + 4)
        t.fpa_temp_last_ffc = (_u16(raw, offset) - 27315.0) / 100
        offset += 2
        t.last_ffc_time = _u32_lepton(raw, offset)
        t.time_on = time_counter
        t.ffc_imminent = raw[637] > 0
        return t

    def parse(self, data: bytes) -> CameraFrame:
        tel = self.parse_telemetry(data[: self.get_telemetry_size()])
        pix = np.frombuffer(
            data, dtype=self.img_dtype, offset=self.get_telemetry_size()
        ).reshape(self.headers.res_y, self.headers.res_x)
        return CameraFrame(
            pix=pix.byteswap(),
            time_on=int(tel.time_on),
            last_ffc_time=int(tel.last_ffc_time),
            temp_c=tel.fpa_temp,
            last_ffc_temp_c=tel.fpa_temp_last_ffc,
            ffc_imminent=tel.ffc_imminent,
            ffc_status=tel.ffc_status,
        )


class Boson:
    """FLIR Boson raw frame: no telemetry packets (reference cameras/boson.py)."""

    def __init__(self, headers: HeaderInfo):
        self.headers = headers
        self.img_dtype = np.dtype(f"uint{headers.pixel_bits}")

    def get_telemetry_size(self):
        return 0

    def parse(self, data: bytes) -> CameraFrame:
        pix = np.frombuffer(data, dtype=self.img_dtype).reshape(
            self.headers.res_y, self.headers.res_x
        )
        return CameraFrame(pix=pix.byteswap(), time_on=0, last_ffc_time=0)


def camera_for_headers(headers: HeaderInfo):
    if headers.model and headers.model.lower().startswith("boson"):
        return Boson(headers)
    return Lepton3(headers)
