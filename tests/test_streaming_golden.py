"""Streaming-replay goldens vs the reference piclassify file replay.

tools/mint_streaming_golden.py runs the REFERENCE PiClassifier replay
(reference src/piclassifier/piclassify.py:202-416, the CI acceptance
harness — release.yml:51) over possum, hedgehog, three synthetic clips and
a seeded classified possum run, and records the ``.txt`` metadata its
on_recording_stopping (piclassifier.py:1171-1242) writes: the streaming
tracker's boxes/masses through the motion-detector background path
(cptvmotiondetector.py:144-153 — a genuinely different background model
from the batch extractor's), plus per-track predictions.

Here OUR PiClassifier replays the same clips the same way (background
frame seeds the detector, timedelta telemetry — cli/piclassify.replay_file
mirrors the reference's parse_cptv) and the outputs must match:
  * recordings and tracks: same counts;
  * positions: frame_number/x/y/width/height/mass EXACT, blank flags equal;
  * predictions (classified run): tag equal, rounded percentage vectors
    within ±1, confidence/clarity within 0.011 (rounded to 2/3 dp in the
    metadata; raw-output parity is 5e-4 — test_classify_golden.py).
"""

import json
from datetime import timedelta
from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent / "fixtures"
GOLDENS = Path(__file__).parent / "goldens"
REF_CLIPS = Path("/root/reference/tests/clips")


def _headers_of(clip):
    from classifier_pipeline_tpu.pipeline.cameras import HeaderInfo

    h = clip.header
    return HeaderInfo(
        res_x=h.x_resolution, res_y=h.y_resolution, fps=9,
        model=h.model or None, brand=h.brand or None,
        frame_size=h.x_resolution * h.y_resolution * 2 + 160 * 4,
        pixel_bits=16,
    )


def _replay(clip_path, tmp_path, classify=False, seed=None):
    """Our side of the reference's parse_cptv replay; returns the list of
    metadata dicts written on recording stop, in recording order."""
    import time

    from classifier_pipeline_tpu.config.config import Config
    from classifier_pipeline_tpu.config.thermalconfig import ThermalConfig
    from classifier_pipeline_tpu.cptv import load_cptv
    from classifier_pipeline_tpu.pipeline.cameras import CameraFrame
    from classifier_pipeline_tpu.pipeline.piclassifier import PiClassifier
    from classifier_pipeline_tpu.pipeline.recorders import DummyRecorder

    clip = load_cptv(clip_path)
    headers = _headers_of(clip)
    thermal_config = ThermalConfig.load_from_file(
        "/root/reference/tests/config.toml", headers.model
    )
    outdir = tmp_path / "cptv"
    thermal_config.recorder.output_dir = str(outdir)
    if classify:
        config = Config({"classify": {"models": [{
            "id": 2, "name": "Thermal WR",
            "model_file": str(FIXTURES / "classify_model.keras"),
        }]}})
    else:
        config = Config({})
    recorder = DummyRecorder(thermal_config, headers)
    pi = PiClassifier(
        config, thermal_config, headers, classify=classify, detect_after=0,
        recorder=recorder, seed=seed,
    )
    for f in clip.frames():
        if f.background_frame:
            pi.motion_detector.seed_background(np.asarray(f.pix))
            continue
        cf = CameraFrame(
            pix=np.asarray(f.pix),
            time_on=timedelta(milliseconds=int(f.time_on)),
            last_ffc_time=timedelta(milliseconds=int(f.last_ffc_time)),
            temp_c=f.temp_c,
            last_ffc_temp_c=f.last_ffc_temp_c,
        )
        pi.process_frame(cf, time.time())
    pi.disconnected()
    metas = []
    for txt in sorted(outdir.rglob("*.txt")):
        metas.append(json.loads(txt.read_text()))
    return metas


def _golden(name):
    return json.loads((GOLDENS / f"stream_{name}.json").read_text())


CLIPS = [
    ("possum", REF_CLIPS / "possum.cptv"),
    ("hedgehog", REF_CLIPS / "hedgehog.cptv"),
    ("synth_crossing", FIXTURES / "synth_crossing.cptv"),
    ("synth_ffc_storm", FIXTURES / "synth_ffc_storm.cptv"),
    ("synth_blank_gap", FIXTURES / "synth_blank_gap.cptv"),
    ("synth_merge_split", FIXTURES / "synth_merge_split.cptv"),
    ("synth_mass_flicker", FIXTURES / "synth_mass_flicker.cptv"),
    # tie_entry: the reference replay records NOTHING for this clip (the
    # slow mirrored blobs never trip the two-delta trigger) — the golden
    # pins that the motion gate stays closed on our side too
    ("synth_tie_entry", FIXTURES / "synth_tie_entry.cptv"),
]


def _assert_positions_match(ours, golden, label):
    assert len(ours) == len(golden), (
        f"{label}: {len(ours)} recordings vs golden {len(golden)}"
    )
    for ri, (rec, grec) in enumerate(zip(ours, golden)):
        our_tracks = rec["tracks"]
        gold_tracks = grec["tracks"]
        assert len(our_tracks) == len(gold_tracks), (
            f"{label} rec {ri}: {len(our_tracks)} tracks vs "
            f"golden {len(gold_tracks)}"
        )
        # reference track order within a recording is creation order; match
        # by (frame_start, first position) to stay order-insensitive among
        # same-frame ties (the reference iterates a set() of regions)
        def key(t):
            p0 = t["positions"][0]
            return (t["frame_start"], p0["x"], p0["y"], p0["width"],
                    p0["height"])

        for ours_t, gold_t in zip(sorted(our_tracks, key=key),
                                  sorted(gold_tracks, key=key)):
            assert ours_t["frame_start"] == gold_t["frame_start"], label
            assert ours_t["frame_end"] == gold_t["frame_end"], label
            got = [
                (p["frame_number"], p["x"], p["y"], p["width"], p["height"],
                 p["mass"], bool(p.get("blank", False)))
                for p in ours_t["positions"]
            ]
            want = [
                (p["frame_number"], p["x"], p["y"], p["width"], p["height"],
                 p["mass"], bool(p.get("blank", False)))
                for p in gold_t["positions"]
            ]
            assert got == want, f"{label}: positions diverge"


@pytest.mark.parametrize("name,clip", CLIPS, ids=[c[0] for c in CLIPS])
def test_streaming_tracking_golden(name, clip, tmp_path):
    metas = _replay(clip, tmp_path, classify=False)
    _assert_positions_match(metas, _golden(name), name)


def test_streaming_classified_golden(tmp_path):
    golden = _golden("possum_classified")
    metas = _replay(REF_CLIPS / "possum.cptv", tmp_path, classify=True,
                    seed=42)
    _assert_positions_match(metas, golden, "possum_classified")
    for rec, grec in zip(metas, golden):
        for ours_t, gold_t in zip(rec["tracks"], grec["tracks"]):
            gpreds = gold_t.get("predictions", [])
            opreds = ours_t.get("predictions", [])
            assert len(opreds) == len(gpreds), "prediction count"
            for op, gp in zip(opreds, gpreds):
                assert op["tag"] == gp["tag"]
                assert bool(op["confident"]) == bool(gp["confident"])
                assert abs(op["confidence"] - gp["confidence"]) <= 0.011
                assert abs(op["clarity"] - gp["clarity"]) <= 0.011
                for lbl, conf in gp["all_class_confidences"].items():
                    assert abs(op["all_class_confidences"][lbl] - conf) <= 0.011
                assert len(op["predictions"]) == len(gp["predictions"])
                for osp, gsp in zip(op["predictions"], gp["predictions"]):
                    assert osp["frames"] == gsp["frames"], "segment frames"
                    np.testing.assert_allclose(
                        np.asarray(osp["prediction"], np.int64),
                        np.asarray(gsp["prediction"], np.int64),
                        rtol=0, atol=1,
                    )
