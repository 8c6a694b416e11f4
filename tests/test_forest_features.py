"""Oracle tests for the 36-feature / 188-dim forest (MVM) feature pipeline.

The reference head is mid-refactor: FrameFeatures.features() returns only the
11 shape/SNR features (the 36-feature movement block is commented out,
reference forestmodel.py:564-674) while the aggregation path and the TFRecord
reader expect the 36/188 schema (forestmodel.py:383-422, thermaldataset.py:258).
These tests reconstruct the coherent era ON THE REFERENCE SIDE (test-only
monkeypatches re-enabling the documented commented-out block) and assert our
implementation matches it bit-for-bit, through to sklearn predict_proba.
"""

import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

# stub third-party modules the reference import chain pulls in but that are
# not installed here (only needed transitively, never by forestmodel itself)
if "timezonefinder" not in sys.modules:
    _tzf = types.ModuleType("timezonefinder")
    _tzf.TimezoneFinder = type("TimezoneFinder", (), {})
    sys.modules["timezonefinder"] = _tzf

from classifier_pipeline_tpu.models import forest as ours


class FakeRegion:
    def __init__(self, x, y, w, h, frame_number, mass=10, blank=False):
        self.x, self.y = x, y
        self.width, self.height = w, h
        self.frame_number = frame_number
        self.mass = mass
        self.blank = blank

    @property
    def right(self):
        return self.x + self.width

    @property
    def bottom(self):
        return self.y + self.height

    def subimage(self, img):
        return img[self.y : self.bottom, self.x : self.right]


class FakeFrame:
    def __init__(self, thermal, filtered, frame_number):
        self.thermal = thermal
        self.filtered = filtered
        self.frame_number = frame_number


def _make_clip(seed=0, T=24, H=120, W=160, blank_at=()):
    rng = np.random.RandomState(seed)
    background = rng.uniform(2000, 3000, (H, W)).astype(np.float32)
    thermal = background[None] + rng.uniform(0, 50, (T, H, W)).astype(np.float32)
    regions = []
    x, y = 30, 40
    for t in range(T):
        x += rng.randint(-3, 4)
        y += rng.randint(-2, 3)
        w = rng.randint(8, 20)
        h = rng.randint(8, 20)
        x = int(np.clip(x, 0, W - w))
        y = int(np.clip(y, 0, H - h))
        # a warm blob inside the region
        thermal[t, y : y + h, x : x + w] += rng.uniform(50, 400, (h, w))
        regions.append(FakeRegion(x, y, w, h, t, mass=rng.randint(5, 60),
                                  blank=t in blank_at))
    filtered = thermal - background[None]
    return thermal, filtered, background, regions


def _reference_36_features():
    """Reference FrameFeatures.features() from the documented commented-out
    block (forestmodel.py:635-674), plus the calc_histogram hook the era
    called before median adjustment (:336). Returns (features_fn, calc_fn)."""
    from ml_tools import forestmodel as ref

    def nz_stats(buf):
        non_zero = np.array([s for s in buf if s > 0])
        if len(non_zero) > 0:
            return np.amax(non_zero), np.amin(non_zero), np.mean(non_zero)
        return 0, 0, 0

    def features36(self):
        max_speed, min_speed, avg_speed = nz_stats(self.speed)
        max_speed_x, min_speed_x, avg_speed_x = nz_stats(self.speed_x)
        max_speed_y, min_speed_y, avg_speed_y = nz_stats(self.speed_y)
        max_rel, min_rel, avg_rel = nz_stats(self.rel_speed)
        max_rel_x, min_rel_x, avg_rel_x = nz_stats(self.rel_speed_x)
        max_rel_y, min_rel_y, avg_rel_y = nz_stats(self.rel_speed_y)
        return np.array(
            [
                self.sqrt_area, self.elongation, self.peak_snr, self.mean_snr,
                self.fill_factor,
                self.speed[0], self.rel_speed[0], self.rel_speed_x[0],
                self.rel_speed_y[0],
                self.speed[2], self.rel_speed[2], self.rel_speed_x[2],
                self.rel_speed_y[2],
                self.speed[4], self.rel_speed[4], self.rel_speed_x[4],
                self.rel_speed_y[4],
                max_speed, min_speed, avg_speed,
                max_speed_x, min_speed_x, avg_speed_x,
                max_speed_y, min_speed_y, avg_speed_y,
                max_rel, min_rel, avg_rel,
                max_rel_x, min_rel_x, avg_rel_x,
                max_rel_y, min_rel_y, avg_rel_y,
                self.histogram_diff,
            ]
        )

    orig_calculate = ref.FrameFeatures.calculate

    def calculate_with_hist(self, thermal, filtered, sub_back, mgrid):
        # min-max normalization is shift-invariant, so calling on the
        # median-adjusted thermal equals the era's raw-thermal call
        self.calc_histogram(sub_back, thermal, normalize=True)
        orig_calculate(self, thermal, filtered, sub_back, mgrid)

    return features36, calculate_with_hist


def _run_reference(thermal, filtered, background, regions, buf_len,
                   monkeypatch, with_36=False):
    from ml_tools import forestmodel as ref

    if with_36:
        features36, calc36 = _reference_36_features()
        monkeypatch.setattr(ref.FrameFeatures, "features", features36)
        monkeypatch.setattr(ref.FrameFeatures, "calculate", calc36)
    frames = [FakeFrame(thermal[r.frame_number, r.y : r.bottom, r.x : r.right],
                        filtered[r.frame_number, r.y : r.bottom, r.x : r.right],
                        r.frame_number)
              for r in regions]
    medians = {t: np.median(thermal[t]) for t in range(len(thermal))}
    return ref.forest_features(frames, background, medians, regions,
                               buf_len=buf_len, cropped=True)


def test_base11_matches_reference(monkeypatch):
    thermal, filtered, background, regions = _make_clip(seed=1)
    ref_X, ref_frames, ref_masses = _run_reference(
        thermal, filtered, background, regions, 1, monkeypatch)
    our_X, our_frames, our_masses = ours.forest_features(
        thermal, filtered, background, regions, buf_len=1)
    np.testing.assert_array_equal(ref_frames, our_frames)
    np.testing.assert_array_equal(ref_masses, our_masses)
    np.testing.assert_allclose(our_X, ref_X, rtol=0, atol=0)


def test_hist_diff_matches_cv2():
    from ml_tools import forestmodel as ref

    rng = np.random.RandomState(3)
    for i in range(12):
        h, w = rng.randint(4, 40), rng.randint(4, 40)
        back = rng.uniform(2000, 3000, (h, w)).astype(np.float32)
        crop = back + rng.uniform(-30, 400, (h, w)).astype(np.float32)
        ff = ref.FrameFeatures(FakeRegion(0, 0, w, h, 0))
        ff.calc_histogram(back, crop, normalize=True)
        assert ours.hist_diff(back, crop, normalize=True) == pytest.approx(
            ff.histogram_diff, abs=1e-9), f"case {i}"
    # degenerate flat crop
    flat = np.full((8, 8), 100.0, np.float32)
    varied = np.arange(64, dtype=np.float32).reshape(8, 8)
    ff = ref.FrameFeatures(FakeRegion(0, 0, 8, 8, 0))
    ff.calc_histogram(varied, flat, normalize=True)
    assert ours.hist_diff(varied, flat, normalize=True) == pytest.approx(
        ff.histogram_diff, abs=1e-9, nan_ok=True)


@pytest.mark.parametrize("seed,blank_at", [(2, ()), (7, (5, 6)), (11, (0,))])
def test_track188_matches_reference(monkeypatch, seed, blank_at):
    thermal, filtered, background, regions = _make_clip(
        seed=seed, blank_at=blank_at)
    ref_out = _run_reference(thermal, filtered, background, regions, 5,
                             monkeypatch, with_36=True)
    ref_X, ref_frames, ref_masses = ref_out
    our_X, our_frames, our_masses = ours.forest_features(
        thermal, filtered, background, regions, buf_len=5)
    assert our_X.shape == (ours.MVM_FEATURE_DIM,) == (188,)
    np.testing.assert_array_equal(ref_frames, our_frames)
    # hist_diff matches cv2.compareHist to ~1 ulp but not bit-exactly: the
    # OpenCV kernel accumulates with SIMD lane ordering that varies by
    # build/arch, so even two OpenCV installs can disagree at this level.
    # Its 5 aggregate dims get a 1e-13 band; all 183 others must be exact.
    hist_dims = np.array([35, 71, 107, 143, 179])
    exact = np.setdiff1d(np.arange(188), hist_dims)
    np.testing.assert_allclose(our_X[exact], ref_X[exact], rtol=0, atol=0)
    np.testing.assert_allclose(our_X[hist_dims], ref_X[hist_dims],
                               rtol=1e-13, atol=1e-15)


def test_sklearn_predict_proba_equality(monkeypatch):
    """Forest trained on reference-produced 188-dim vectors must agree with
    our converted forest fed by our feature pipeline (VERDICT item 1)."""
    from sklearn.ensemble import RandomForestClassifier

    X_ref, X_ours, y = [], [], []
    for seed in range(16):
        thermal, filtered, background, regions = _make_clip(seed=seed, T=16)
        rx, _, _ = _run_reference(thermal, filtered, background, regions, 5,
                                  monkeypatch, with_36=True)
        ox, _, _ = ours.forest_features(thermal, filtered, background,
                                        regions, buf_len=5)
        X_ref.append(rx)
        X_ours.append(ox)
        y.append(seed % 2)
    X_ref = np.array(X_ref)
    X_ours = np.array(X_ours)
    np.testing.assert_allclose(X_ours, X_ref, rtol=1e-13, atol=1e-15)

    skl = RandomForestClassifier(n_estimators=20, random_state=0).fit(X_ref, y)
    converted = ours.Forest.convert_sklearn(skl)
    np.testing.assert_allclose(
        converted.predict_proba(X_ours), skl.predict_proba(X_ref), atol=1e-12)


def test_normalize_features_layout():
    X = np.arange(188, dtype=np.float32)
    out = ours.normalize_features(X.copy())
    from classifier_pipeline_tpu.models.featurenorms import MEAN_V, STD_V

    np.testing.assert_allclose(out[:180], (X[:180] - MEAN_V[:180]) / STD_V[:180],
                               rtol=1e-6)
    # burst dims pass through untouched
    np.testing.assert_array_equal(out[180:187], X[180:187])
    assert out[187] == pytest.approx((X[187] - MEAN_V[180]) / STD_V[180])
    assert len(ours.ALL_FEATURES) == 180
    assert ours.feature_mask(["std-fill_factor"])[0] == 36 + 4


def test_forest_model_buffer_length(tmp_path):
    """buffer_length>1 model consumes one normalized 188-dim row per track."""
    import json

    from sklearn.ensemble import RandomForestClassifier

    rng = np.random.RandomState(0)
    Xtr = rng.uniform(-1, 1, (40, 188))
    skl = RandomForestClassifier(n_estimators=5, random_state=0).fit(
        Xtr, rng.randint(0, 2, 40))
    f = ours.Forest.convert_sklearn(skl)
    f.save(tmp_path / "m.npz")
    json.dump({"labels": ["animal", "false-positive"],
               "hyperparams": {"buffer_length": 5}},
              open(tmp_path / "m.json", "w"))
    model = ours.ForestModel(tmp_path / "m")
    assert model.buffer_length == 5
    assert model.shape() == (1, (1, 188))

    thermal, filtered, background, regions = _make_clip(seed=4, T=16)

    class Ctx:
        def __init__(self):
            self.thermal = thermal
            self.filtered = filtered
            self.background = background

        def has_frame(self, fn):
            return True

        def index_of(self, fn):
            return fn

    class Tr:
        track_id = 1
        bounds = regions

    result = model.predict_track(Ctx(), Tr())
    assert result is not None
    frames, preds, masses = result
    assert preds.shape == (1, 2)
    assert len(frames) == 1

def test_track_feature_vector_short_track_no_nan():
    """A track with exactly 5 valid frames used to yield 0/0 NaNs in the
    move_5 avg/std columns (divisor n = f_count - lag = 0); it must return
    the documented zeros instead."""
    import numpy as np

    from classifier_pipeline_tpu.models.forest import (
        MVM_FEATURE_DIM,
        forest_features,
        track_feature_vector,
    )

    rng = np.random.default_rng(0)
    T, H, W = 6, 32, 40
    thermal = rng.integers(2000, 3000, (T, H, W)).astype(np.uint16)
    filtered = rng.normal(0, 10, (T, H, W)).astype(np.float32)
    background = thermal[0].astype(np.float32)

    class R:
        def __init__(self, t):
            self.frame_number = t
            self.x, self.y, self.width, self.height = 4, 4, 10, 8
            self.blank = False
            self.mass = 50

        @property
        def bottom(self): return self.y + self.height

        @property
        def right(self): return self.x + self.width

    regions = [R(t) for t in range(5)]
    X, f, m = forest_features(thermal, filtered, background, regions,
                              buf_len=5)
    assert X is None  # too short to aggregate without a zero divisor
    vec = track_feature_vector(thermal, filtered, background, regions)
    assert vec.shape == (MVM_FEATURE_DIM,)
    assert not np.isnan(vec).any()
    assert (vec == 0).all()
    # 6 valid frames: aggregation runs, still no NaNs
    regions6 = [R(t) for t in range(6)]
    vec6 = track_feature_vector(thermal, filtered, background, regions6)
    assert not np.isnan(vec6).any()


def test_forest_small_buffer_length_no_crash():
    """buffer_length in 2..4 must read zero lags, not IndexError (reference
    FrameFeatures always allocates 5-deep speed buffers)."""
    import numpy as np

    from classifier_pipeline_tpu.models.forest import forest_features

    rng = np.random.default_rng(1)
    T, H, W = 10, 32, 40
    thermal = rng.integers(2000, 3000, (T, H, W)).astype(np.uint16)
    filtered = rng.normal(0, 10, (T, H, W)).astype(np.float32)
    background = thermal[0].astype(np.float32)

    class R:
        def __init__(self, t):
            self.frame_number = t
            self.x, self.y, self.width, self.height = 4, 4, 10, 8
            self.blank = False
            self.mass = 50

        @property
        def bottom(self): return self.y + self.height

        @property
        def right(self): return self.x + self.width

    regions = [R(t) for t in range(T)]
    for bl in (2, 3, 4):
        X, f, m = forest_features(thermal, filtered, background, regions,
                                  buf_len=bl)
        assert X is not None and not np.isnan(X).any()
