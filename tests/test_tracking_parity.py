"""Track-level regression tests against the reference's golden output.

possum.txt ships with the reference repo and is the tracker's acceptance
oracle (same role as tests/tracking-tests.yml in the reference CI). The
matcher tolerances mirror the reference's trackingtest.py (MAX_ERROR=8 px),
but our tracker currently matches exactly, so we assert much tighter.
"""

import json

import numpy as np
import pytest

from classifier_pipeline_tpu.pipeline.extractor import extract_file


@pytest.fixture(scope="module")
def possum_result(possum_cptv):
    return extract_file(possum_cptv)


def test_possum_track_parity(possum_result, possum_meta):
    mine = possum_result.metadata["tracks"]
    gold = possum_meta["tracks"]
    assert len(mine) == len(gold) == 2
    for m, g in zip(mine, gold):
        assert m["frame_start"] == g["frame_start"]
        assert m["frame_end"] == g["frame_end"]
        assert m["num_frames"] == g["num_frames"]
        assert m["start_s"] == g["start_s"]
        assert m["end_s"] == g["end_s"]
        assert abs(m["tracking_score"] - g["tracking_score"]) < 0.35
        gp = {p["frame_number"]: p for p in g["positions"]}
        mp = {p["frame_number"]: p for p in m["positions"]}
        assert set(gp) == set(mp)
        box_exact = 0
        for fn in gp:
            a, b = mp[fn], gp[fn]
            # boxes must be near-exact; mass may drift a few counts from the
            # NL-means LUT approximation
            assert abs(a["x"] - b["x"]) <= 1 and abs(a["y"] - b["y"]) <= 1
            assert abs(a["width"] - b["width"]) <= 2
            assert abs(a["height"] - b["height"]) <= 2
            assert abs(a["mass"] - b["mass"]) <= max(5, 0.02 * b["mass"])
            assert a["blank"] == b["blank"]
            if (a["x"], a["y"], a["width"], a["height"]) == (
                b["x"], b["y"], b["width"], b["height"]
            ):
                box_exact += 1
        # expect essentially everything to be pixel-exact
        assert box_exact >= len(gp) - 1


def test_possum_metadata_fields(possum_result, possum_meta):
    m = possum_result.metadata
    assert m["camera_model"] == possum_meta["camera_model"] == "lepton3"
    assert m["background_thresh"] == possum_meta["background_thresh"] == 20
    assert m["start_time"] == possum_meta["start_time"]
    assert m["algorithm"]["tracker_version"] == 11
    pos_keys = set(m["tracks"][0]["positions"][0].keys())
    gold_keys = set(possum_meta["tracks"][0]["positions"][0].keys())
    assert pos_keys == gold_keys


def test_hedgehog_runs(hedgehog_cptv):
    """hedgehog has no embedded background frame and no golden tracks file;
    smoke-check the no-background path (reference regression suite uses it
    for the speed bound)."""
    res = extract_file(hedgehog_cptv)
    assert res.n_frames == 119
    # the hedgehog clip contains a real animal; tracking should find it
    assert len(res.tracks) >= 1
    t = res.metadata["tracks"][0]
    assert t["num_frames"] > 9


def test_sharded_batch_matches_single_device(possum_cptv):
    """Fleet-scale extraction: the data-sharded SPMD scan over an 8-device
    mesh produces the same rows as the single-device batch path."""
    import jax
    import numpy as np

    from classifier_pipeline_tpu.cptv import load_cptv
    from classifier_pipeline_tpu.parallel.sharding import (
        make_mesh,
        track_clips_batch_sharded,
    )
    from classifier_pipeline_tpu.track import tracker_jax
    from classifier_pipeline_tpu.track.tracker_jax import TrackingParams

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-device virtual CPU mesh")

    clip = load_cptv(possum_cptv)
    mask = ~clip.is_background
    thermal = clip.pixels[mask]
    t = clip.time_on_ms[mask].astype(np.int64)
    c = clip.last_ffc_ms[mask].astype(np.int64)
    ffc = (t - c) < 9
    params = TrackingParams(weight_add=0.1, emit_mask=True)

    thermals = [thermal] * 3  # 3 clips over 8 devices exercises padding
    ffcs = [ffc] * 3
    bgs = [clip.pixels[0]] * 3

    single = tracker_jax.track_clips_batch(thermals, ffcs, params, bgs)
    mesh = make_mesh(8)
    sharded = track_clips_batch_sharded(thermals, ffcs, params, mesh, bgs)
    assert len(sharded) == 3
    for (r1, _), (r2, _) in zip(single, sharded):
        np.testing.assert_array_equal(np.asarray(r1.emitted), np.asarray(r2.emitted))
        np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))
        np.testing.assert_array_equal(np.asarray(r1.y), np.asarray(r2.y))
        np.testing.assert_array_equal(np.asarray(r1.mass), np.asarray(r2.mass))
        np.testing.assert_allclose(
            np.asarray(r1.variance), np.asarray(r2.variance), rtol=1e-5
        )


def test_sharded_classify_matches_single_device(possum_cptv, tmp_path_factory):
    """SPMD classification: resharding a scan group's device arrays over the
    data axis and running the SAME fused classify jit yields identical
    predictions (XLA partitions the program; lane gathers ride collectives)."""
    import jax
    import numpy as np
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")

    from classifier_pipeline_tpu.classify.interpreter import (
        ClipContext,
        classify_clip_batch,
    )
    from classifier_pipeline_tpu.config.config import Config, ModelConfig
    from classifier_pipeline_tpu.models.artifacts import create_model
    from classifier_pipeline_tpu.parallel.sharding import (
        make_mesh,
        shard_device_group,
    )
    from classifier_pipeline_tpu.pipeline.clipclassifier import ClipClassifier
    from classifier_pipeline_tpu.pipeline.extractor import ClipTrackExtractor

    prefix = tmp_path_factory.mktemp("model") / "m"
    create_model(prefix, model_name="simple-cnn")
    model = ModelConfig(id=1, name="t", model_file=str(prefix) + ".json")
    cc = ClipClassifier(Config({}), model=model, seed=3)
    interp = cc.get_classifier(model)

    ex = ClipTrackExtractor(config=Config({}).raw, keep_rows=True,
                            emit_filtered=True)
    # 5 clips -> subgroups of 4 + 1: the 1-clip group exercises the
    # pad-to-data-axis path in shard_device_group
    paths = [possum_cptv] * 5
    results = ex.collect_batch(ex.scan_batch(paths))

    def ctxs_for(group_map=None):
        ctxs = []
        for res in results:
            group = res.device_group
            if group_map is not None:
                group = group_map(group)
            ctx = ClipContext(
                res.clip.foreground_pixels, res.rows.filtered,
                cc._ffc_frames(res), medians=res.frame_medians,
                device_group=group, lane=res.lane,
            )
            ctxs.append(ctx)
        return ctxs

    track_lists = [res.tracks for res in results]
    np.random.seed(5)
    single = classify_clip_batch(interp, ctxs_for(), track_lists, 1)

    mesh = make_mesh(8)
    cache = {}

    def reshard(group):
        if id(group) not in cache:
            cache[id(group)] = shard_device_group(group, mesh)
        return cache[id(group)]

    np.random.seed(5)
    with mesh:
        sharded = classify_clip_batch(interp, ctxs_for(reshard), track_lists, 1)

    for s_map, d_map in zip(single, sharded):
        assert s_map.keys() == d_map.keys()
        for tid in s_map:
            a = [p.prediction for p in s_map[tid].predictions]
            b = [p.prediction for p in d_map[tid].predictions]
            np.testing.assert_allclose(
                np.asarray(a, np.float64), np.asarray(b, np.float64),
                atol=1e-4,
            )
