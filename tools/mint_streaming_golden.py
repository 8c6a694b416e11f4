#!/usr/bin/env python3
"""Mint STREAMING (Pi replay) goldens by running the reference
piclassifier as an oracle — the streaming analog of tools/mint_goldens.py.

The reference's own acceptance test for the Pi path is
``piclassify.py --file possum.cptv`` in CI
(/root/reference/.github/workflows/release.yml:51, replay loop at
/root/reference/src/piclassifier/piclassify.py:202-416): the replay feeds
every frame through PiClassifier.process_frame with the motion-detector
background (cptvmotiondetector.py:144-153 — a genuinely different
background path from the batch extractor's), the CPTVRecorder rolls
recordings, and on_recording_stopping (piclassifier.py:1171-1242) writes a
``.txt`` JSON metadata sidecar with the streaming tracker's tracks.

This tool reproduces that replay IN-PROCESS (no sockets, no preview
process) with functional shims for the Pi-only services the reference
imports (dbus/gi for attiny+beacon+events+snapshot service, the python
``cptv`` package for the recorder's writer subprocess) and captures the
emitted metadata. Timestamps/ids are environment-dependent; the golden
keeps only the deterministic tracking content (per-track positions,
frame numbers, masses) plus per-track predictions when a classifier model
is configured.

Validation: minting is only trustworthy if the replay reproduces the CI
behavior — possum must produce one recording whose track boxes correspond
to the known possum tracks. tests/test_streaming_golden.py then asserts
OUR cli/piclassify.py --file replay matches exactly (boxes/masses) and
5e-4 (prediction outputs).

Usage: python tools/mint_streaming_golden.py [outdir=tests/goldens]
"""
import json
import sys
import types
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from mint_goldens import REF, install_shims  # noqa: E402


class _ShimFrame:
    """Module-level (picklable: the recorder queue ships frames to the
    writer subprocess) stand-in for the python `cptv` package's Frame."""

    def __init__(self, pix, time_on, last_ffc_time, temp_c,
                 last_ffc_temp_c, background_frame=False):
        self.pix = pix
        self.time_on = time_on
        self.last_ffc_time = last_ffc_time
        self.temp_c = temp_c
        self.last_ffc_temp_c = last_ffc_temp_c
        self.background_frame = background_frame
        self.ffc_imminent = False
        self.ffc_status = 0


class _ShimCPTVWriter:
    """Attribute-bag no-op: the recorder subprocess's .cptv bytes are
    irrelevant to the golden; only the .txt metadata matters. The
    recorder itself opens the file, so rename-on-stop still works."""

    def __init__(self, fileobj):
        self.f = fileobj

    def write_header(self):
        pass

    def write_frame(self, frame):
        pass

    def close(self):
        try:
            self.f.close()
        except Exception:
            pass


def install_pi_shims():
    """Shim the Pi-only hardware/service modules the reference streaming
    stack imports: dbus (attiny/beacon/eventreporter/service), gi.GLib
    (snapshot service mainloop), and the python `cptv` package (recorder
    writer + Frame). All are I/O side channels — none influence tracking."""

    class _Bus:
        def __init__(self, *a, **kw):
            pass

        def get_object(self, *a, **kw):
            raise RuntimeError("no dbus in minting harness")

    def _method(*a, **kw):
        def deco(fn):
            return fn

        return deco

    class _BusName:
        def __init__(self, *a, **kw):
            raise RuntimeError("no dbus in minting harness")

    dbus = types.ModuleType("dbus")
    dbus.SystemBus = _Bus
    dbus.SessionBus = _Bus
    dbus.Int64 = int
    dbus.String = str
    dbus.service = types.ModuleType("dbus.service")
    dbus.service.Object = type("Object", (), {"__init__": lambda self, *a, **kw: None})
    dbus.service.method = _method
    dbus.service.signal = _method
    dbus.service.BusName = _BusName
    dbus.mainloop = types.ModuleType("dbus.mainloop")
    dbus.mainloop.glib = types.ModuleType("dbus.mainloop.glib")
    dbus.mainloop.glib.DBusGMainLoop = lambda *a, **kw: None
    dbus.mainloop.glib.threads_init = lambda *a, **kw: None
    sys.modules.setdefault("dbus", dbus)
    sys.modules.setdefault("dbus.service", dbus.service)
    sys.modules.setdefault("dbus.mainloop", dbus.mainloop)
    sys.modules.setdefault("dbus.mainloop.glib", dbus.mainloop.glib)

    class _MainLoop:
        def run(self):
            pass

        def quit(self):
            pass

    gi = types.ModuleType("gi")
    gi.repository = types.ModuleType("gi.repository")
    gi.repository.GLib = types.SimpleNamespace(MainLoop=_MainLoop)
    sys.modules.setdefault("gi", gi)
    sys.modules.setdefault("gi.repository", gi.repository)

    cptv = types.ModuleType("cptv")
    cptv.Frame = _ShimFrame
    cptv.CPTVWriter = _ShimCPTVWriter
    sys.modules.setdefault("cptv", cptv)
    Frame = sys.modules["cptv"].Frame

    # the reference reads config.toml via the `toml` package; back it with
    # the stdlib tomllib (text- or binary-stream tolerant)
    import tomllib

    def _toml_load(stream):
        data = stream.read()
        if isinstance(data, bytes):
            data = data.decode()
        return tomllib.loads(data)

    toml = types.ModuleType("toml")
    toml.load = _toml_load
    toml.loads = tomllib.loads
    sys.modules.setdefault("toml", toml)

    # astral.Location: attribute bag; sun() is only reached when
    # use-sunrise-sunset windows are configured (the test config disables
    # them and parse_file replaces the window outright)
    class _Location:
        def __init__(self, *a, **kw):
            self.latitude = 0.0
            self.longitude = 0.0
            self.altitude = 0
            self.timezone = "Pacific/Auckland"

        def sun(self, date=None):
            raise RuntimeError("sun times not available in minting harness")

    astral = types.ModuleType("astral")
    astral.Location = _Location
    sys.modules.setdefault("astral", astral)

    # mint_goldens' TimezoneFinder shim only has timezone_at; the streaming
    # config path calls certain_timezone_at
    tzf = sys.modules.get("timezonefinder")
    if tzf is not None and not hasattr(tzf.TimezoneFinder, "certain_timezone_at"):
        tzf.TimezoneFinder.certain_timezone_at = (
            lambda self, **kw: "Pacific/Auckland"
        )
    return Frame


def patch_ref_kalman():
    """cv2 5.0 requires (2,1) measurements; the reference was written for
    cv2 4.x (same numbers either way) — same patch as mint_goldens.mint."""
    import numpy as np
    from track import kalman as ref_kalman

    def _correct(self, rect):
        pts = np.array(
            [[np.float32(rect.centroid[0])], [np.float32(rect.centroid[1])]],
            np.float32,
        )
        self.kalman.correct(pts)

    ref_kalman.Kalman.correct = _correct


def mint_replay(clip_path, workdir, classify=False, seed=None):
    """Replay clip_path through the reference PiClassifier exactly as
    parse_cptv does (piclassify.py:322-416); return the list of metadata
    dicts written by on_recording_stopping, in recording order."""
    import time
    from datetime import timedelta

    work = Path(workdir)
    (work / "cptv").mkdir(parents=True, exist_ok=True)

    from config.config import Config
    from config.thermalconfig import ThermalConfig
    from config.timewindow import RelAbsTime, TimeWindow
    from piclassifier.headerinfo import HeaderInfo
    from piclassifier.piclassifier import PiClassifier

    from classifier_pipeline_tpu.cptv.codec import CptvReader

    patch_ref_kalman()

    reader = CptvReader(str(clip_path))
    header = reader.get_header()
    telemetry_size = 160 * 4
    headers = HeaderInfo(
        res_x=header.x_resolution,
        res_y=header.y_resolution,
        fps=9,
        brand=header.brand if header.brand else None,
        model=header.model if header.model else None,
        frame_size=header.x_resolution * header.y_resolution * 2 + telemetry_size,
        pixel_bits=16,
        serial="",
        firmware="",
    )

    config = Config.load_from_file(str(REF / "tests/test-config.yaml"))
    if classify:
        # point the model at the committed .keras fixture (the CI's TFLite
        # artifact isn't downloadable here); type Keras loads via
        # ml_tools/kerasmodel.py — the same oracle path as
        # tools/mint_classify_golden.py
        for m in config.classify.models:
            m.type = "Keras"
            m.model_file = str(REPO / "tests/fixtures/classify_model.keras")
    thermal_config = ThermalConfig.load_from_file(
        str(REF / "tests/config.toml"), headers.model
    )
    thermal_config.recorder.output_dir = work / "cptv"
    thermal_config.recorder.rec_window = TimeWindow(
        RelAbsTime(""), RelAbsTime(""), None, None, 0
    )

    pi = PiClassifier(
        config,
        thermal_config,
        headers,
        classify,
        0,
        None,
        seed,
    )

    from cptv import Frame  # the shim installed above

    while True:
        frame = reader.next_frame()
        if frame is None:
            break
        frame = Frame(
            frame.pix,
            timedelta(milliseconds=frame.time_on),
            timedelta(milliseconds=frame.last_ffc_time),
            frame.temp_c,
            frame.last_ffc_temp_c,
            frame.background_frame,
        )
        if frame.background_frame:
            pi.motion_detector._background._background = frame.pix
            continue
        pi.process_frame(frame, time.time())
    pi.disconnected()
    try:
        pi.service.quit()
    except Exception:
        pass

    metas = []
    for txt in sorted((work / "cptv").glob("*.txt")):
        metas.append(json.loads(txt.read_text()))
    return metas


def normalize(metas):
    """Keep only the deterministic tracking/prediction content."""
    out = []
    for meta in metas:
        rec = {"tracks": []}
        for t in meta.get("tracks", []):
            nt = {
                "frame_start": t.get("frame_start"),
                "frame_end": t.get("frame_end"),
                "num_frames": t.get("num_frames"),
                "positions": [
                    {
                        "frame_number": p["frame_number"],
                        "x": p["x"],
                        "y": p["y"],
                        "width": p["width"],
                        "height": p["height"],
                        "mass": p["mass"],
                        "blank": p.get("blank", False),
                    }
                    for p in t.get("positions", [])
                ],
            }
            preds = []
            for p in t.get("predictions", []) or []:
                preds.append(
                    {
                        "tag": p.get("tag"),
                        "confident": p.get("confident"),
                        "confidence": p.get("confidence"),
                        "clarity": p.get("clarity"),
                        "all_class_confidences": p.get("all_class_confidences"),
                        "predictions": [
                            {
                                "prediction": sp.get("prediction"),
                                "frames": sp.get("frames"),
                                "masses": sp.get("masses"),
                            }
                            for sp in p.get("predictions", []) or []
                        ],
                    }
                )
            if preds:
                nt["predictions"] = preds
            rec["tracks"].append(nt)
        out.append(rec)
    return out


def main():
    outdir = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "tests/goldens"
    outdir.mkdir(parents=True, exist_ok=True)
    # Preload heavyweight oracle deps BEFORE the shims: pandas treats pytz
    # as optional and imports cleanly when it's absent, but the fake pytz
    # module install_shims plants (for the reference's tz lookups) makes
    # pandas' import blow up half-way — poisoning every later import.
    import pandas  # noqa: F401
    import sklearn  # noqa: F401
    import tensorflow  # noqa: F401

    install_shims()
    install_pi_shims()
    sys.path.insert(0, str(REF / "src"))

    import tempfile

    jobs = [
        ("possum", REF / "tests/clips/possum.cptv", False, None),
        ("hedgehog", REF / "tests/clips/hedgehog.cptv", False, None),
        ("synth_crossing", REPO / "tests/fixtures/synth_crossing.cptv", False, None),
        ("synth_ffc_storm", REPO / "tests/fixtures/synth_ffc_storm.cptv", False, None),
        ("synth_blank_gap", REPO / "tests/fixtures/synth_blank_gap.cptv", False, None),
        ("synth_merge_split", REPO / "tests/fixtures/synth_merge_split.cptv", False, None),
        ("synth_mass_flicker", REPO / "tests/fixtures/synth_mass_flicker.cptv", False, None),
        ("synth_tie_entry", REPO / "tests/fixtures/synth_tie_entry.cptv", False, None),
        # classified replay: predictions golden via the committed .keras
        # fixture, seeded so segment sampling is deterministic
        ("possum_classified", REF / "tests/clips/possum.cptv", True, 42),
    ]
    for name, clip, classify, seed in jobs:
        with tempfile.TemporaryDirectory() as td:
            print(f"minting stream golden: {name}", flush=True)
            metas = mint_replay(clip, td, classify=classify, seed=seed)
            if not metas and name in ("possum", "possum_classified"):
                raise SystemExit(f"{name}: replay produced no recording!")
            norm = normalize(metas)
            (outdir / f"stream_{name}.json").write_text(
                json.dumps(norm, indent=1)
            )
            n_tracks = sum(len(m["tracks"]) for m in norm)
            print(f"  {len(norm)} recording(s), {n_tracks} track(s)")
    print("streaming goldens written to", outdir)


if __name__ == "__main__":
    main()
