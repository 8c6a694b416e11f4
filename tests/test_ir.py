"""IR pipeline tests on synthetic video (no codec dependency: PNG frame
directory input)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ir_frames(tmp_path_factory):
    """640x480 synthetic IR clip: static noise background + a bright blob
    walking left to right."""
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("irclip")
    H, W, T = 480, 640, 40
    background = rng.integers(40, 60, (H, W)).astype(np.uint8)
    from PIL import Image

    for t in range(T):
        frame = background.copy()
        if t >= 5:
            cx = 80 + t * 10
            cy = 240
            yy, xx = np.mgrid[0:H, 0:W]
            blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < 35**2
            frame[blob] = 220
        Image.fromarray(frame).save(d / f"{t:04d}.png")
    return d


def test_mog_background(ir_frames):
    """Exact-oracle: IRBackground == cv2 MOG2 with the reference's params
    (reference cliptracker.py:561-613) on the synthetic clip, per pixel."""
    import pytest

    cv2 = pytest.importorskip("cv2")
    from classifier_pipeline_tpu.pipeline.ir_extractor import load_video
    from classifier_pipeline_tpu.track import ir_background

    frames = load_video(ir_frames)
    ref = cv2.createBackgroundSubtractorMOG2(history=1000, detectShadows=False)
    ref.apply(frames[0], learningRate=1)
    bg = ir_background.IRBackground()
    bg.set_background(frames[0])
    for f in frames[:12]:
        want = ref.apply(f, learningRate=-1)
        mask = np.asarray(bg.update_background(f))
        np.testing.assert_array_equal(mask, want)
    # behavior sanity on top of exactness: zero false positives off-blob
    blob_mask = frames[11] > 200
    assert (mask > 0)[~blob_mask].mean() < 0.05


def test_ir_extract_tracks_blob(ir_frames):
    from classifier_pipeline_tpu.pipeline.ir_extractor import IRTrackExtractor

    ex = IRTrackExtractor(scale=0.25, check_trapped=False)
    meta, good, filtered = ex.extract(ir_frames)
    assert meta["camera_model"] == "IR"
    all_tracks = good + filtered
    assert len(all_tracks) >= 1
    # the main track should follow the blob left to right
    main = max(all_tracks, key=lambda t: len(t.bounds))
    assert len(main.bounds) >= 15
    xs = [b.x + b.width / 2 for b in main.bounds if not b.blank]
    assert xs[-1] > xs[0] + 100, "track should move right"


def test_merge_components():
    import jax.numpy as jnp

    from classifier_pipeline_tpu.ops import imageops as ops

    # two nearby fragments + one distant one
    mask = np.zeros((120, 160), np.int32)
    mask[50:60, 30:40] = 255
    mask[50:60, 45:55] = 255  # 5px gap -> merge
    mask[100:112, 120:135] = 255  # far away
    comps = ops.connected_components_stats(jnp.asarray(mask), 8)
    merged = ops.merge_components_ir(comps, max_gap=40.0, min_mass=40.0)
    valid = np.asarray(merged.valid)
    assert valid.sum() == 2
    w = np.asarray(merged.w)[valid]
    assert 25 in w  # merged box spans 30..55


def test_irwriter_roundtrip_and_tf_oracle(tmp_path):
    """IR TFRecord writing (reference irwriter.py) round-trips through our
    reader and through tf.data byte-compatibly."""
    import numpy as np

    from classifier_pipeline_tpu.data import irwriter, tfrecords

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (10, 120, 160), dtype=np.uint8)
    frames[0] = 10  # background frame
    samples = [
        irwriter.IRSample(clip_id=1, track_id=2, label="cat",
                          frame_number=3, region=(40, 30, 32, 24)),
        irwriter.IRSample(clip_id=1, track_id=2, label="dog",
                          frame_number=7, region=(10, 10, 20, 20)),
    ]
    path = tmp_path / "ir-0.tfrecord"
    labels = ["cat", "dog"]
    with tfrecords.RecordWriter(str(path)) as w:
        n = irwriter.save_data(samples, w, labels,
                               {"back_thresh": 15, "frames": frames})
    assert n == 2

    got = list(irwriter.read_ir_records(str(path), image_size=(32, 32)))
    assert len(got) == 2
    img, label = got[0]
    assert img.shape == (32, 32, 2)
    assert label == 0
    # channel quirk: both channels are the thermal crop
    np.testing.assert_array_equal(img[..., 0], img[..., 1])

    # tf.data oracle: same bytes decodable by tensorflow
    import pytest
    tf = pytest.importorskip("tensorflow")
    ds = tf.data.TFRecordDataset(str(path), compression_type="GZIP")
    fmt = {
        "image/thermalencoded": tf.io.FixedLenFeature((), tf.string),
        "image/class/label": tf.io.FixedLenFeature((), tf.int64, -1),
        "image/height": tf.io.FixedLenFeature((), tf.int64, -1),
    }
    rows = [tf.io.parse_single_example(r, fmt) for r in ds]
    assert len(rows) == 2
    assert int(rows[0]["image/class/label"]) == 0
    dec = tf.image.decode_png(rows[0]["image/thermalencoded"], channels=1)
    assert dec.shape[:2] == (24, 32)


@pytest.mark.oracle
def test_ir_detect_and_merge_vs_reference_oracle():
    """Per-region oracle for the IR detection layer ABOVE the MOG2 core
    (round-4 VERDICT stretch item): the reference's own detect_objects_ir
    (imageprocessing.py:185-199 — tuple-kernel MORPH_OPEN quirk included)
    + IRTrackExtractor.merge_components (irtrackextractor.py:324-389,
    scale=0.25 Pi constants) run over synthetic foreground masks, and our
    ops.detect_objects_ir + merge_components_ir must produce the same
    merged regions (x, y, w, h, mass) for every scene."""
    import sys
    import types

    cv2 = pytest.importorskip("cv2")
    sys.path.insert(0, "/root/repo/tools")
    from mint_goldens import install_shims

    install_shims()
    sys.path.insert(0, "/root/reference/src")
    import jax.numpy as jnp
    from ml_tools.imageprocessing import detect_objects_ir as ref_detect
    from track.irtrackextractor import IRTrackExtractor

    from classifier_pipeline_tpu.ops import imageops as ops

    scale = 0.25
    H, W = 120, 160  # 640x480 at the Pi's 0.25 detection scale
    rng = np.random.default_rng(3)

    scenes = []
    # separated blobs
    m = np.zeros((H, W), np.uint8)
    m[20:40, 30:55] = 255
    m[70:95, 100:130] = 255
    scenes.append(m)
    # close pair (within MAX_GAP*scale=10) -> must merge
    m = np.zeros((H, W), np.uint8)
    m[30:50, 40:60] = 255
    m[30:50, 66:84] = 255
    scenes.append(m)
    # axis-overlapping L-shapes + a tiny fragment under min_mass
    m = np.zeros((H, W), np.uint8)
    m[10:30, 10:26] = 255
    m[28:44, 22:40] = 255
    m[100:102, 140:142] = 255  # 4 px: below min_mass AND min_size
    scenes.append(m)
    # speckle noise scene (MORPH_OPEN should eat singles)
    m = (rng.random((H, W)) < 0.004).astype(np.uint8) * 255
    m[60:80, 60:90] = 255
    scenes.append(m)
    # many blobs on a grid, some chains merging transitively
    m = np.zeros((H, W), np.uint8)
    for k in range(6):
        x0 = 8 + k * 24
        m[55:70, x0:x0 + 16] = 255
    scenes.append(m)

    stub = types.SimpleNamespace(scale=scale)
    for si, mask in enumerate(scenes):
        # reference: open+threshold+CCL, then merge at scale
        _, _, stats = ref_detect(mask, threshold=0)
        rects = [list(map(int, r[:5])) for r in stats[1:]]
        ref_merged = IRTrackExtractor.merge_components(stub, rects)
        want = sorted(
            (int(r[0]), int(r[1]), int(r[2]), int(r[3]), int(r[4]))
            for r in ref_merged
        )

        det_mask, comps = ops.detect_objects_ir(
            jnp.asarray(mask, jnp.int32), jnp.float32(0.0), 24
        )
        merged = ops.merge_components_ir(
            comps, max_gap=40.0 * scale,
            min_mass=int(10 * 4 * scale), min_size=int(16 * scale),
        )
        got = sorted(
            (int(x), int(y), int(w), int(h), int(a))
            for x, y, w, h, a, v in zip(
                np.asarray(merged.x), np.asarray(merged.y),
                np.asarray(merged.w), np.asarray(merged.h),
                np.asarray(merged.area), np.asarray(merged.valid),
            )
            if v
        )
        assert got == want, f"scene {si}: {got} vs {want}"
