"""End-to-end classification goldens vs the reference pipeline, over FOUR
clips (round-4 VERDICT item 5 broadened the original possum-only golden).

tools/mint_classify_golden.py runs the REFERENCE's KerasModel classify path
(reference src/ml_tools/interpreter.py:132-168 + kerasmodel.py predict,
trackprediction.py:127-194 accumulation) with a committed,
reference-built .keras fixture and seed 42, and records segment frames,
raw per-segment outputs, masses, and the accumulated scores for:

  * possum        — the CI clip (track 2 hits the sparse confidence cap);
  * hedgehog      — no background frame, single track;
  * synth_many12  — 12 simultaneous tracks (multi-track scheduling);
  * synth_sparse  — a 6-frame track: one segment with < square_width^2/4
                    unique frames, the 0.5 confidence-cap regime
                    (reference interpreter.py:161-167).

Here OUR pipeline — FlaxInterpreter with weights imported from the very
same .keras (models/keras_import.py), the fused device preprocess+forward
(classify/interpreter.py), and our TrackPrediction — classifies the same
clips with the same seed. Asserted:
  * sampled segment frames and masses: EXACT (same RNG call sequence);
  * raw per-segment sigmoid outputs: atol 5e-4 (cv2-resize vs
    separable-matmul preprocessing rounding + f32 conv stacks — the tile
    oracle bound is 8e-3 on a 0..255 scale, which the normalized sigmoid
    outputs compress well below);
  * accumulated class_best_score / max_score / clarity: atol 5e-4,
    predicted tag equal, and the sparse-cap firing exactly where the
    reference capped.

No tensorflow at test time — fixtures and goldens are committed; this
runs in the fast suite and pins the whole classifier half end-to-end.
"""

import json
from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent / "fixtures"
GOLDENS = Path(__file__).parent / "goldens"
REF_CLIPS = Path("/root/reference/tests/clips")

RAW_ATOL = 5e-4

CLIPS = {
    "possum": REF_CLIPS / "possum.cptv",
    "hedgehog": REF_CLIPS / "hedgehog.cptv",
    "synth_many12": FIXTURES / "synth_many12.cptv",
    "synth_sparse": FIXTURES / "synth_sparse.cptv",
}


@pytest.fixture(scope="module")
def interp():
    from classifier_pipeline_tpu.classify.interpreter import FlaxInterpreter

    return FlaxInterpreter(FIXTURES / "classify_model.keras")


@pytest.fixture(scope="module")
def classified(interp):
    """name -> (golden dict, {track_id: TrackPrediction})."""
    from classifier_pipeline_tpu.classify.interpreter import ClipContext
    from classifier_pipeline_tpu.pipeline.extractor import ClipTrackExtractor

    out = {}
    extractor = ClipTrackExtractor(keep_rows=True, emit_filtered=True)
    for name, clip_path in CLIPS.items():
        golden = json.loads((GOLDENS / f"{name}_classify.json").read_text())
        interp.seed = golden["seed"]
        result = extractor.extract(clip_path)
        clip = result.clip
        mask = ~clip.is_background
        ffc = list(np.nonzero(
            (clip.time_on_ms[mask].astype(np.int64)
             - clip.last_ffc_ms[mask].astype(np.int64)) < 9
        )[0])  # ClipClassifier._ffc_frames (int-ms FFC branch)
        ctx = ClipContext(clip.foreground_pixels, result.rows.filtered, ffc)
        preds = {}
        for track in result.tracks:
            # reference's long-track masked sampling shuffles through the
            # GLOBAL np.random (datasetstructures.py:1197; our port mirrors
            # the call trace). The mint reseeds per track from a CONTENT
            # signature (ids are set-order-dependent for same-frame ties);
            # apply the identical convention and key predictions by it.
            b0 = track.bounds[0]
            sig = (int(track.start_frame), int(b0.x), int(b0.y))
            np.random.seed(
                (golden["seed"] + sig[0] * 9176 + sig[1] * 131 + sig[2])
                % 2**31
            )
            preds[sig] = interp.classify_track(ctx, track, min_segments=1)
        out[name] = (golden, preds)
    return out


def test_labels_match(interp):
    golden = json.loads((GOLDENS / "possum_classify.json").read_text())
    assert interp.labels == golden["labels"]


@pytest.mark.parametrize("name", list(CLIPS))
def test_per_track_predictions_match_reference(name, classified):
    golden, preds = classified[name]
    active = [t for t in golden["tracks"] if not t.get("skipped")]
    assert len(preds) == len(golden["tracks"])
    for gt in active:
        tp = preds[tuple(gt["sig"])]
        assert tp is not None, f"track {gt['track_id']} skipped on our side"
        # segment sampling: exact same frames in the same order
        got_frames = [[int(f) for f in p.frames] for p in tp.predictions]
        assert got_frames == gt["prediction_frames"], (
            f"{name} track {gt['track_id']}: segment sampling diverged"
        )
        got_masses = [float(p.mass) for p in tp.predictions]
        np.testing.assert_allclose(got_masses, gt["masses"], rtol=0, atol=0)
        # raw model outputs per segment
        got_raw = np.array([np.asarray(p.prediction, np.float64)
                            for p in tp.predictions])
        np.testing.assert_allclose(
            got_raw, np.array(gt["raw_predictions"]), rtol=0, atol=RAW_ATOL,
            err_msg=f"{name} track {gt['track_id']}: raw segment outputs",
        )


@pytest.mark.parametrize("name", list(CLIPS))
def test_accumulated_scores_match_reference(name, classified):
    golden, preds = classified[name]
    for gt in golden["tracks"]:
        if gt.get("skipped"):
            assert preds[tuple(gt["sig"])] is None
            continue
        tp = preds[tuple(gt["sig"])]
        assert tp.predicted_tag() == gt["predicted_tag"], name
        np.testing.assert_allclose(
            np.asarray(tp.class_best_score, np.float64),
            np.array(gt["class_best_score"]), rtol=0, atol=RAW_ATOL,
        )
        assert abs(tp.max_score - gt["max_score"]) < RAW_ATOL
        assert abs(tp.clarity - gt["clarity"]) < RAW_ATOL
        if gt.get("capped"):
            # the sparse-segment 0.5 confidence cap fired on the reference
            # side; ours must have capped too (class_best_score equality
            # above pins the capped values themselves)
            assert tp.max_score <= 0.5 + 1e-9, (
                f"{name} track {gt['track_id']}: cap did not fire"
            )
