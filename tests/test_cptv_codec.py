"""CPTV codec tests: native vs python backend agreement, round-trips, and
sanity against the reference clips (the only binary fixtures the reference
ships; reference tests/test_tracking_speed.py uses the same two)."""

import numpy as np
import pytest

from classifier_pipeline_tpu.cptv import (
    CptvHeader,
    CptvReader,
    CptvWriter,
    load_cptv,
)
from classifier_pipeline_tpu.cptv.codec import _decode_py, _load_native


def test_decode_possum_header(possum_cptv):
    clip = load_cptv(possum_cptv)
    h = clip.header
    assert (h.x_resolution, h.y_resolution) == (160, 120)
    assert h.model == "lepton3"
    assert h.brand == "flir"
    assert h.devicename == "ospri13"
    assert h.fps == 9
    assert h.has_background
    assert clip.n_frames == 161
    assert clip.is_background[0]
    assert not clip.is_background[1:].any()


def test_decode_pixel_sanity(possum_cptv, hedgehog_cptv):
    for path in (possum_cptv, hedgehog_cptv):
        clip = load_cptv(path)
        pix = clip.pixels
        # Lepton3 raw counts for these clips live in a narrow thermal band.
        assert 1500 < pix.min() and pix.max() < 5000
        # time_on must be monotonically nondecreasing over non-background frames.
        t = clip.time_on_ms[~clip.is_background]
        assert (np.diff(t.astype(np.int64)) >= 0).all()


def test_native_matches_python(possum_cptv):
    if _load_native() is None:
        pytest.skip("native codec unavailable")
    nat = load_cptv(possum_cptv, backend="native")
    py = load_cptv(possum_cptv, backend="python")
    assert nat.n_frames == py.n_frames
    np.testing.assert_array_equal(nat.pixels, py.pixels)
    np.testing.assert_array_equal(nat.time_on_ms, py.time_on_ms)
    np.testing.assert_array_equal(nat.last_ffc_ms, py.last_ffc_ms)
    assert nat.header == py.header


@pytest.mark.parametrize("backend", ["native", "python"])
def test_roundtrip(tmp_path, backend):
    if backend == "native" and _load_native() is None:
        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(0)
    T, H, W = 7, 120, 160
    base = rng.integers(2000, 4000, (H, W)).astype(np.uint16)
    pixels = (
        base[None].astype(np.int64)
        + rng.integers(-40, 40, (T, H, W))
    ).astype(np.uint16)
    header = CptvHeader(
        timestamp_us=1656632217813627,
        x_resolution=W,
        y_resolution=H,
        devicename="testdev",
        model="lepton3.5",
        brand="flir",
        fps=9,
        has_background=True,
    )
    out = tmp_path / f"rt_{backend}.cptv"
    if backend == "native":
        w = CptvWriter(out, header)
        assert w._h is not None
        for i in range(T):
            w.write_frame(
                pixels[i], time_on_ms=1000 + i * 111, last_ffc_ms=500,
                is_background=(i == 0),
            )
        w.close()
    else:
        from classifier_pipeline_tpu.cptv.codec import _encode_py

        _encode_py(
            out, pixels, header,
            time_on_ms=[1000 + i * 111 for i in range(T)],
            last_ffc_ms=[500] * T,
            is_background=[i == 0 for i in range(T)],
        )
    for decode_backend in ["native", "python"]:
        if decode_backend == "native" and _load_native() is None:
            continue
        clip = load_cptv(out, backend=decode_backend)
        np.testing.assert_array_equal(clip.pixels, pixels)
        assert clip.header.model == "lepton3.5"
        assert clip.is_background[0]
        assert clip.time_on_ms[1] == 1111


def test_reader_shim(possum_cptv):
    reader = CptvReader(possum_cptv)
    header = reader.get_header()
    assert header.x_resolution == 160
    n = 0
    first = None
    while True:
        f = reader.next_frame()
        if f is None:
            break
        if first is None:
            first = f
        n += 1
    assert n == 161
    assert first.background_frame
    assert first.pix.shape == (120, 160)


def test_decoder_delta_stream_bit_exact(possum_cptv, hedgehog_cptv):
    """The native decoder's upload-ready delta stream (CptvClip.delta)
    reconstructs the pixel block bit-exactly (resid+shift+exceptions chain,
    mirrored on device by tracker_jax._decode_delta_u16)."""
    import numpy as np

    from classifier_pipeline_tpu.cptv import load_cptv

    for path in (possum_cptv, hedgehog_cptv):
        clip = load_cptv(path)
        if clip.delta is None:
            import pytest

            pytest.skip("native codec unavailable")
        resid, shift, ei, ev = clip.delta
        assert resid.shape == (clip.n_frames - 1, *clip.pixels.shape[1:])
        d = resid.astype(np.int32) + shift[:, None, None]
        flat = d.reshape(-1)
        flat[ei] += ev
        px0 = clip.pixels[:1].astype(np.int32)
        rec = np.concatenate(
            [px0, px0 + np.cumsum(flat.reshape(resid.shape), axis=0)]
        )
        assert (rec.astype(np.uint16) == clip.pixels).all()


def test_foreground_delta_slice_matches_reencode(possum_cptv):
    """_foreground_delta's sliced decoder stream equals what the C re-encoder
    produces from the foreground pixels (possum has a leading background
    frame, so the slice path is exercised)."""
    import numpy as np

    from classifier_pipeline_tpu.cptv import load_cptv
    from classifier_pipeline_tpu.cptv.codec import delta_encode_u16
    from classifier_pipeline_tpu.pipeline.extractor import ClipTrackExtractor

    clip = load_cptv(possum_cptv)
    if clip.delta is None:
        import pytest

        pytest.skip("native codec unavailable")
    thermal = clip.foreground_pixels
    fg = ClipTrackExtractor._foreground_delta(clip, thermal, False)
    assert fg is not None
    resid, shift, ei, ev = fg
    # decode both streams back to pixels and compare (shift rounding may
    # differ half-even vs half-away; the reconstruction must not)
    enc = delta_encode_u16(np.ascontiguousarray(thermal)[None])
    assert enc is not None
    first, resid2, shift2, ei2, ev2 = enc

    def rec(first_i32, r, s, i, v):
        d = r.reshape(-1, *thermal.shape[1:]).astype(np.int32) + np.asarray(
            s
        ).reshape(-1, 1, 1)
        flat = d.reshape(-1)
        np.add.at(flat, np.asarray(i), np.asarray(v))
        return np.concatenate(
            [first_i32, first_i32 + np.cumsum(d, axis=0)]
        ).astype(np.uint16)

    a = rec(thermal[:1].astype(np.int32), resid, shift, ei, ev)
    b = rec(first.reshape(1, *thermal.shape[1:]), resid2, shift2, ei2, ev2)
    assert (a == b).all()
    assert (a == thermal).all()


def test_truncated_frame_payload_no_crash(tmp_path):
    """A frame whose packed payload holds fewer bits than npix values must
    decode without UB/crash (the decoder zero-pads the missing tail —
    cptv_codec.cpp scalar refill guard + unpack_bits_avx2 scalar tail)."""
    import gzip
    import struct

    def field(code, payload):
        return bytes([len(payload), ord(code)]) + payload

    W = H = 8

    def section(kind, fields):
        return kind + bytes([len(fields)]) + b"".join(fields)

    header = section(
        b"H",
        [field("X", struct.pack("<I", W)), field("Y", struct.pack("<I", H))],
    )
    # frame 0: initial value 100, all 63 remaining deltas 0 at 2 bits
    f0_data = struct.pack("<i", 100) + bytes((63 * 2 + 7) // 8)
    f0 = section(
        b"F",
        [
            field("t", struct.pack("<I", 1000)),
            field("c", struct.pack("<I", 0)),
            field("w", bytes([2])),
            field("f", struct.pack("<I", len(f0_data))),
        ],
    ) + f0_data
    # frame 1: declares 8-bit fields but supplies only 10 of 63 bytes
    f1_data = struct.pack("<i", 1) + bytes([1] * 10)
    f1 = section(
        b"F",
        [
            field("t", struct.pack("<I", 2000)),
            field("c", struct.pack("<I", 0)),
            field("w", bytes([8])),
            field("f", struct.pack("<I", len(f1_data))),
        ],
    ) + f1_data
    raw = b"CPTV\x02" + header + f0 + f1
    path = tmp_path / "truncated.cptv"
    path.write_bytes(gzip.compress(raw))

    clip = load_cptv(path, backend="native")
    assert clip.pixels.shape == (2, H, W)
    assert (clip.pixels[0] == 100).all()
    # frame 1 decodes deterministically (zero-padded tail) and the delta
    # stream reconstructs it exactly
    resid, shift, ei, ev = clip.delta
    rec = resid.astype(np.int64) + shift[:, None, None]
    flat = rec.reshape(-1)
    flat[ei] += ev
    out1 = (clip.pixels[0].astype(np.int64) + rec[0]).astype(np.uint16)
    np.testing.assert_array_equal(out1, clip.pixels[1])


def test_native_zero_copy_lifetime(possum_cptv):
    """The native decoder exports pixels/delta as zero-copy views into the
    Reader's buffers; the view base chain must keep the native memory alive
    after the CptvClip itself is garbage-collected."""
    import gc

    if _load_native() is None:
        pytest.skip("native codec unavailable")
    clip = load_cptv(possum_cptv, backend="native")
    want = clip.pixels[5:9].copy()
    view = clip.pixels[5:9]
    resid_view = clip.delta[0][:3] if clip.delta is not None else None
    resid_want = resid_view.copy() if resid_view is not None else None
    del clip
    gc.collect()
    # touch fresh heap so a use-after-free would show as corruption
    junk = [np.full((200, 200), i, np.uint16) for i in range(8)]
    assert np.array_equal(view, want)
    if resid_view is not None:
        assert np.array_equal(resid_view, resid_want)
    del junk
