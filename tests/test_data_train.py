"""Dataset generation + training component tests."""

import json
import shutil
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tagged_corpus(tmp_path_factory, possum_cptv, possum_meta):
    d = tmp_path_factory.mktemp("corpus")
    shutil.copy(possum_cptv, d / "possum.cptv")
    meta = json.loads(json.dumps(possum_meta))
    meta["id"] = 201
    for t in meta["tracks"]:
        t["tags"] = [
            {"what": "possum", "confidence": 0.9, "automatic": False,
             "path": "all.mammal.possum"}
        ]
    (d / "possum.txt").write_text(json.dumps(meta))
    return d


def test_rawdb_load(tagged_corpus):
    from classifier_pipeline_tpu.data.rawdb import RawDatabase

    db = RawDatabase(tagged_corpus / "possum.cptv")
    db.load_frames()
    assert db.model == "lepton3"
    thermal, filtered = db.frames
    assert thermal.shape == (160, 120, 160)
    header = db.get_clip_tracks()
    assert len(header.tracks) == 2
    assert header.tracks[0].label == "possum"
    assert header.tracks[0].median_mass > 0


def test_build_and_records(tagged_corpus, tmp_path):
    from classifier_pipeline_tpu.cli import build
    from classifier_pipeline_tpu.data import tfrecords as tfr

    out = tmp_path / "records"
    rc = build.main([str(tagged_corpus), "-o", str(out), "--seed", "3",
                     "--num-shards", "2"])
    assert rc == 0
    meta = json.loads((out / "training-meta.json").read_text())
    assert "possum" in meta["labels"]
    total = sum(sum(c.values()) for c in meta["counts"].values())
    assert total >= 1
    recs = []
    for split in ("train", "validation", "test"):
        for f in (out / split).glob("*.tfrecord"):
            recs.extend(tfr.read_records(f))
    assert len(recs) >= 1
    ex = tfr.decode_example(recs[0])
    assert ex["image/class/text"] == [b"possum"]
    th = ex["image/thermalencoded"].reshape(25, 45, 45)
    assert 0 <= th.min() and th.max() <= 255


def test_loader_augment(tmp_path):
    import jax

    from classifier_pipeline_tpu.data.loader import augment_and_tile

    images = np.random.default_rng(0).uniform(
        0, 255, (2, 25, 45, 45, 2)
    ).astype(np.float32)
    out = augment_and_tile(images, jax.random.PRNGKey(0), augment=True)
    assert out.shape == (2, 160, 160, 2)
    assert float(out.min()) >= 0 and float(out.max()) <= 255
    # no-augment path is deterministic crop+tile
    a = augment_and_tile(images, jax.random.PRNGKey(0), augment=False)
    b = augment_and_tile(images, jax.random.PRNGKey(1), augment=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # tiling layout: first tile equals crop of frame 0
    np.testing.assert_allclose(
        np.asarray(a)[0, :32, :32, 0], images[0, 0, 7:39, 7:39, 0]
    )


def test_forest_model_roundtrip(tmp_path):
    from sklearn.ensemble import RandomForestClassifier

    from classifier_pipeline_tpu.models.forest import Forest

    rng = np.random.default_rng(0)
    X = rng.normal(size=(200, 11))
    y = (X[:, 0] + X[:, 3] > 0).astype(int)
    skl = RandomForestClassifier(n_estimators=10, random_state=0).fit(X, y)
    forest = Forest.convert_sklearn(skl)
    ours = forest.predict_proba(X[:20])
    theirs = skl.predict_proba(X[:20])
    np.testing.assert_allclose(ours, theirs, atol=1e-9)
    forest.save(tmp_path / "f.npz")
    loaded = Forest.load(tmp_path / "f.npz")
    np.testing.assert_allclose(loaded.predict_proba(X[:20]), theirs, atol=1e-9)


def test_timewindow():
    import datetime

    from classifier_pipeline_tpu.config.timewindow import (
        RelAbsTime,
        TimeWindow,
        sun_times,
    )

    w = TimeWindow(RelAbsTime("21:00"), RelAbsTime("06:30"))
    assert w.inside_window(datetime.datetime(2026, 1, 1, 23, 0))
    assert not w.inside_window(datetime.datetime(2026, 1, 1, 12, 0))
    assert w.inside_window(datetime.datetime(2026, 1, 1, 5, 0))
    # any-time window
    w2 = TimeWindow(RelAbsTime(""), RelAbsTime(""))
    assert w2.inside_window(datetime.datetime(2026, 1, 1, 12, 0))
    # offsets parse
    assert RelAbsTime("30m").offset_s == 1800
    assert RelAbsTime("-1h").offset_s == -3600
    # NOAA sunrise sanity: Christchurch midsummer ~ 05:50 local (UTC+13)
    rise, set_ = sun_times(datetime.date(2026, 1, 1), -43.5, 172.6)
    assert 16 <= rise.hour <= 18  # UTC
    assert 7 <= set_.hour <= 9  # UTC next day evening local


def test_framecache_roundtrip(tmp_path):
    """FrameCache HDF5 spill (reference framecache.py): channel stacks round
    trip, flow is stored clipped (x256) and restored."""
    import numpy as np

    from classifier_pipeline_tpu.data.framecache import Frame, FrameBuffer

    rng = np.random.default_rng(0)
    buf = FrameBuffer(str(tmp_path / "clip.cptv"), cache_to_disk=True)
    th = rng.uniform(2800, 3200, (120, 160)).astype(np.float32)
    fl = rng.normal(0, 5, (120, 160)).astype(np.float32)
    mask = (rng.uniform(size=(120, 160)) > 0.9).astype(np.float32)
    f = Frame(thermal=th, filtered=fl, mask=mask, frame_number=7,
              ffc_affected=True)
    f.flow = rng.normal(0, 2, (120, 160, 2)).astype(np.float32)
    buf.cache.add_frame(f)

    got = buf.get_frame(7)
    assert got.ffc_affected
    np.testing.assert_allclose(got.thermal, th, rtol=1e-6)
    np.testing.assert_allclose(got.filtered, fl, rtol=1e-6)
    np.testing.assert_array_equal(got.mask, mask)
    assert got.flow_clipped
    got.unclip_flow()
    np.testing.assert_allclose(got.flow, f.flow, atol=1e-3)
    assert buf.get_frame(99) is None
    buf.remove_cache()


def test_framebuffer_ring():
    from classifier_pipeline_tpu.data.framecache import FrameBuffer
    import numpy as np

    buf = FrameBuffer("x.cptv", keep_frames=True, max_frames=3)
    for i in range(5):
        buf.add_frame(np.full((4, 4), i, np.float32), None, None, i)
    assert [f.frame_number for f in buf.frames] == [2, 3, 4]
    assert buf.get_frame(0) is None
    assert buf.get_frame(4).thermal[0, 0] == 4


def test_class_weighted_train_step():
    """reference tfdataset.get_weighting + model.fit(class_weight=...):
    inverse-frequency weights scale per-sample loss by primary label."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from classifier_pipeline_tpu.models.registry import build_classifier
    from classifier_pipeline_tpu.train import steps

    model = build_classifier("simple-cnn", 3, logits_only=True)
    tx = optax.adam(1e-3)
    state = steps.create_train_state(model, jax.random.PRNGKey(0), (1, 16, 16, 2), tx)
    images = jnp.zeros((4, 16, 16, 2))
    labels = jnp.asarray(
        [[1, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32
    )
    rng = jax.random.PRNGKey(1)
    plain = steps.make_train_step(model, tx)
    weighted = steps.make_train_step(
        model, tx, class_weights=np.array([2.0, 1.0, 1.0], np.float32)
    )
    _, m0 = plain(state, images, labels, rng)
    _, m1 = weighted(state, images, labels, rng)
    # half the batch has label 0 with weight 2 -> loss scaled by 1.5
    assert float(m1["loss"]) == pytest.approx(1.5 * float(m0["loss"]), rel=1e-4)


def test_full_loop_build_train_classify(tagged_corpus, tmp_path):
    """End-to-end mirror of the reference CI: build.py over the fixture
    corpus -> 1-epoch training of a tiny model -> classify the clip with the
    trained artifact (reference .github/workflows/release.yml e2e steps)."""
    from classifier_pipeline_tpu.cli import build
    from classifier_pipeline_tpu.config.config import Config, ModelConfig
    from classifier_pipeline_tpu.pipeline.clipclassifier import ClipClassifier
    from classifier_pipeline_tpu.train.trainer import Trainer

    records = tmp_path / "records"
    rc = build.main([str(tagged_corpus), "-o", str(records), "--seed", "3",
                     "--num-shards", "1"])
    assert rc == 0

    out = tmp_path / "run"
    trainer = Trainer(
        "e2e", records, out, model_name="wr-resnet",
        hyperparams={"depth": 10, "k": 1, "square_width": 5, "frame_size": 32},
        seed=0,
    )
    trainer.train(epochs=1, batch_size=4)
    model_json = out / "e2e.json"
    assert model_json.exists() and (out / "e2e.msgpack").exists()
    meta = json.loads(model_json.read_text())
    assert "possum" in meta["labels"]

    model = ModelConfig(id=1, name="trained", model_file=str(model_json))
    cc = ClipClassifier(Config({}), model=model, seed=42)
    result = cc.process_file(tagged_corpus / "possum.cptv")
    preds = [t.get("predictions") for t in result["tracks"]]
    assert any(preds), "trained model produced no predictions"
    for track_preds in preds:
        for pm in track_preds or []:
            assert "tag" in pm and "model_id" in pm and "confidence" in pm


def test_build_split_file_and_validate(tagged_corpus, hedgehog_cptv,
                                       possum_meta, tmp_path):
    """Random build dumps datasplit.json; rebuilding with --split-file
    reproduces the same clip->split assignment deterministically
    (reference build.py:371-414 split_by_file + :635 dump_split_ids)."""
    import shutil

    from classifier_pipeline_tpu.cli import build

    # widen the corpus: a second, differently-tagged clip
    corpus = tmp_path / "corpus"
    shutil.copytree(tagged_corpus, corpus)
    shutil.copy(hedgehog_cptv, corpus / "hedgehog.cptv")
    meta = json.loads(json.dumps(possum_meta))
    meta["id"] = 202
    hh = json.loads((Path(__file__).parent / "goldens/hedgehog.txt").read_text())
    meta["tracks"] = hh["tracks"]
    for t in meta["tracks"]:
        t["tags"] = [{"what": "hedgehog", "confidence": 0.9,
                      "automatic": False, "path": "all.mammal.hedgehog"}]
    (corpus / "hedgehog.txt").write_text(json.dumps(meta, default=float))

    out1 = tmp_path / "r1"
    assert build.main([str(corpus), "-o", str(out1), "--seed", "3",
                       "--num-shards", "1"]) == 0
    split_file = out1 / "datasplit.json"
    assert split_file.exists()
    split = json.loads(split_file.read_text())
    assert set(split) == {"train", "validation", "test"}
    listed = [e["source"] for part in split.values() for e in part]
    assert listed, "datasplit.json lists no clips"
    for e in (e for part in split.values() for e in part):
        assert {"clip_id", "source", "station_id", "tags"} <= set(e)

    # hand-written split: possum (2 tracks -> 2 bins, so make_val's re-split
    # leaves one in train) and hedgehog pinned to test
    manual = tmp_path / "split.json"
    manual.write_text(json.dumps({
        "train": [{"source": str(corpus / "possum.cptv")}],
        "validation": [],
        "test": [{"source": str(corpus / "hedgehog.cptv")}],
    }))
    out2 = tmp_path / "r2"
    assert build.main([str(corpus), "-o", str(out2), "--seed", "3",
                       "--num-shards", "1",
                       "--split-file", str(manual)]) == 0
    meta2 = json.loads((out2 / "training-meta.json").read_text())
    assert sum(meta2["counts"]["test"].values()) >= 1, "pinned test clip lost"
    total = sum(sum(c.values()) for c in meta2["counts"].values())
    assert total >= 2


def test_validate_datasets_catches_leak(tagged_corpus, tmp_path):
    from classifier_pipeline_tpu.data.dataset import (
        Dataset,
        split_randomly,
        validate_datasets,
    )

    master = Dataset(tagged_corpus, "dataset")
    master.load_clips(dont_filter_segment=True)
    datasets = split_randomly(master, seed=1)
    validate_datasets(datasets)  # clean split passes

    # force a leak: copy one validation/test sample into train
    donor = next(d for d in datasets[1:] if d.samples_by_id)
    leak = next(iter(donor.samples_by_id.values()))
    datasets[0].add_sample(leak)
    with pytest.raises(AssertionError):
        validate_datasets(datasets)

    # test-clip pinning: a train sample whose clip is in test_clips fires
    # (compared by clip_id — bin ids are clip-track strings)
    datasets2 = (datasets[0], datasets[1], datasets[2])
    any_train = next(iter(datasets[0].samples_by_id.values()), None)
    if any_train is not None:
        with pytest.raises(AssertionError):
            validate_datasets(datasets2, test_clips=[any_train.clip_id])


def test_label_mapping_matches_reference_oracle(tmp_path, monkeypatch):
    """load_label_mapping regroups the full 534-label taxonomy identically
    to the reference's get_mappings (run as oracle with shimmed deps)."""
    import shutil
    import sys

    from classifier_pipeline_tpu.data.dataset import load_label_mapping

    src = Path("/root/reference/src/label_paths.json")
    if not src.exists():
        pytest.skip("reference label_paths.json unavailable")
    mine = load_label_mapping(src)

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    try:
        from mint_goldens import install_shims
    finally:
        sys.path.pop(0)
    install_shims()
    shutil.copy(src, tmp_path / "label_paths.json")
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, "/root/reference/src")
    try:
        from build import get_mappings

        theirs = get_mappings()
    finally:
        sys.path.pop(0)
    assert mine == theirs
