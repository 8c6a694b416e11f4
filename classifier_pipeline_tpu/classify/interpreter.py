"""Model interpreters (reference src/ml_tools/interpreter.py).

The reference dispatches to TFLite / OpenVINO / Keras backends; here there is
one native backend — Flax/XLA — plus the network-RPC passthrough. Model
artifacts are a pair:

  <model>.json     same metadata schema as the reference (labels, hyperparams,
                   thresholds, type)
  <model>.msgpack  flax.serialization bytes of {params, batch_stats}

Batch shapes are bucketed to powers of two so repeat clips hit the jit cache.
"""

from __future__ import annotations

import functools
import json
import logging
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from classifier_pipeline_tpu.classify import preprocess_jax
from classifier_pipeline_tpu.classify.trackprediction import TrackPrediction
from classifier_pipeline_tpu.data.segments import SegmentType, get_segments
from classifier_pipeline_tpu.track import tracker_jax
from classifier_pipeline_tpu.models.registry import build_classifier


class HyperParams(dict):
    """Dict with the reference's defaulted accessors (hyperparams.py)."""

    @property
    def model_name(self):
        return self.get("model_name", "wr-resnet")

    @property
    def frame_size(self):
        return self.get("frame_size", 32)

    @property
    def square_width(self):
        return self.get("square_width", 5 if self.use_segments else 1)

    @property
    def use_segments(self):
        return self.get("use_segments", True)

    @property
    def segment_width(self):
        return self.get("segment_width", 25 if self.use_segments else 1)

    @property
    def channels(self):
        return self.get("channels", ["thermal", "filtered"])

    @property
    def diff_norm(self):
        return self.get("diff_norm", True)

    @property
    def thermal_diff_norm(self):
        return self.get("thermal_diff_norm", False)

    @property
    def smooth_predictions(self):
        return self.get("smooth_predictions", False)

    @property
    def multi_label(self):
        return self.get("multi_label", True)

    @property
    def mvm(self):
        return self.get("mvm", False)

    @property
    def segment_types(self):
        st = self.get("segment_types", [SegmentType.ALL_RANDOM_MASKED])
        if isinstance(st, str):
            st = [SegmentType[st]]
        elif st and isinstance(st[0], str):
            st = [SegmentType[s] for s in st]
        return st

    @property
    def dense_sizes(self):
        return self.get("dense_sizes", None)

    @property
    def dropout(self):
        return self.get("dropout", 0.3)


def _next_bucket(n, minimum=1):
    b = minimum
    while b < n:
        b *= 2
    return b


def _fuse_host(arrays):
    """Serialize host job arrays into ONE uint8 buffer + a static layout.

    The remote-TPU tunnel charges latency per transfer, so the ~8 small
    per-track tensors of a classify batch ride a single upload; the device
    side splits them back inside the fused jit (_device_split)."""
    parts, specs = [], []
    for a in arrays:
        a = np.ascontiguousarray(a)
        if a.dtype == np.bool_:
            specs.append((a.shape, "bool"))
            parts.append(a.view(np.uint8).reshape(-1))
        elif a.dtype == np.uint8:
            specs.append((a.shape, "uint8"))
            parts.append(a.reshape(-1))
        else:
            assert a.dtype.itemsize == 4, a.dtype
            specs.append((a.shape, str(a.dtype)))
            parts.append(a.view(np.uint8).reshape(-1))
    return np.concatenate(parts), tuple(specs)


def _device_split(buf, specs):
    """In-jit inverse of _fuse_host (little-endian bitcasts, like numpy
    .view on the host side)."""
    out = []
    off = 0
    for shape, dt in specs:
        size = int(np.prod(shape, dtype=np.int64)) if shape else 1
        if dt in ("int32", "float32"):
            n = size * 4
            seg = buf[off : off + n].reshape(tuple(shape) + (4,))
            out.append(
                jax.lax.bitcast_convert_type(
                    seg, jnp.int32 if dt == "int32" else jnp.float32
                )
            )
        elif dt == "bool":
            n = size
            out.append(buf[off : off + n].reshape(shape) != 0)
        else:
            n = size
            out.append(buf[off : off + n].reshape(shape))
        off += n
    return out


class ClipContext:
    """Device-side clip state needed for classification: thermal + the
    tracking-time filtered frames + per-frame medians + ffc list.

    ``frame_numbers`` maps array rows to clip frame numbers (identity for
    whole-clip contexts; the streaming runtime passes its ring-buffer's
    frame numbers)."""

    def __init__(self, thermal: np.ndarray, filtered: np.ndarray, ffc_frames,
                 frame_numbers=None, medians=None, device_group=None,
                 lane=-1):
        self._thermal_np = np.asarray(thermal)
        self._thermal_dev = None  # lazy: the batch path never uploads it
        self._filtered_src = filtered
        self._filtered_dev = None
        # per-frame medians: reuse the batch scan's device-computed copy when
        # given (host np.median costs ~0.25ms/frame on the single-core hosts)
        if medians is not None:
            self._medians_np = np.asarray(medians, np.float32)
        else:
            self._medians_np = np.median(thermal, axis=(1, 2))
        self._medians_dev = None  # lazy: one upload per clip otherwise
        # batch path: the scan group's device arrays + this clip's lane
        self.device_group = device_group
        self.lane = lane
        self.ffc_frames = list(ffc_frames)
        self.background = None
        if frame_numbers is None:
            self._index = None
        else:
            self._index = {int(fn): i for i, fn in enumerate(frame_numbers)}

    @property
    def medians(self):
        if self._medians_dev is None:
            self._medians_dev = jnp.asarray(self._medians_np.astype(np.float32))
        return self._medians_dev

    @property
    def thermal(self):
        if self._thermal_dev is None:
            # raw dtype on purpose: zero-copy alias on CPU (a host-side
            # astype would copy the whole stack per call — 78 MB at IR
            # resolution); the consuming jit programs cast in-program
            self._thermal_dev = jnp.asarray(self._thermal_np)
        return self._thermal_dev

    @property
    def filtered(self):
        if self._filtered_dev is None:
            src = self._filtered_src
            if self.device_group is not None and getattr(src, "ndim", 0) == 4:
                # group layout (T, B, H, W): slice this clip's lane lazily
                src = src[: self._thermal_np.shape[0], self.lane]
            self._filtered_dev = jnp.asarray(src).astype(jnp.float32)
        return self._filtered_dev

    def index_of(self, frame_number: int) -> int:
        if self._index is None:
            return frame_number
        return self._index[int(frame_number)]

    def has_frame(self, frame_number: int) -> bool:
        if self._index is None:
            return 0 <= frame_number < self._thermal_np.shape[0]
        return int(frame_number) in self._index

    def clip_thermals_at_zero(self, regions) -> bool:
        """reference preprocess_segments:390-399: if any unique region's
        median(thermal crop - frame median) <= 0, don't clip at zero.

        median(x - c) == median(x) - c exactly here (uint16 values and the
        f32 frame median are all exactly representable through the mean of
        the two middle elements), so the test partitions the raw uint16
        crop instead of materializing a float copy per region."""
        for r in regions:
            i = self.index_of(r.frame_number)
            sub = self._thermal_np[i, r.y : r.y + r.height, r.x : r.x + r.width]
            n = sub.size
            if n == 0:
                continue
            k1, k2 = (n - 1) // 2, n // 2
            part = np.partition(sub.ravel(), (k1, k2))
            med = (np.float32(part[k1]) + np.float32(part[k2])) * np.float32(0.5)
            if med <= self._medians_np[i]:
                return False
        return True


class FlaxInterpreter:
    """Native interpreter: Flax model + device preprocessing."""

    TYPE = "Flax"

    def __init__(self, model_file, run_over_network=False, load_model=True):
        self.model_file = Path(model_file)
        self.load_json(self.model_file)
        self.run_over_network = run_over_network
        self.port = 8123
        self.id = None
        self.seed = None
        # (F_cap, T_cap, S_cap): fixed paddings for the streaming runtime.
        # When set, _segment_tensors pads to these instead of the dynamic
        # power-of-two buckets, so every live predict reuses ONE compiled
        # program (warmed by warmup_streaming) instead of stalling on a
        # fresh XLA compile per shape combination mid-stream.
        self.streaming_caps = None
        self.model = None
        self.variables = None
        if load_model and not run_over_network:
            self.load_model()

    def load_json(self, filename):
        filename = Path(filename).with_suffix(".json")
        metadata = json.load(open(filename))
        self.version = metadata.get("version")
        self.labels = metadata["labels"]
        self.params = HyperParams()
        self.params["remapped_labels"] = metadata.get("remapped_labels")
        self.params["excluded_labels"] = metadata.get("excluded_labels")
        self.params.update(metadata.get("hyperparams", {}))
        self.data_type = metadata.get("type", "thermal")
        self.mapped_labels = metadata.get("mapped_labels")
        self.label_probabilities = metadata.get("label_probabilities")
        self.thresholds = metadata.get("thresholds")

    def load_model(self):
        import flax.serialization

        from classifier_pipeline_tpu.ops import pallas_nlmeans

        # On TPU, inference runs with bf16 compute (params stay f32; Flax
        # layers cast per-op): the idiomatic TPU inference regime, ~2-4x
        # the f32 MXU rate; the reference's Pi deployment quantizes all
        # the way to int8 TFLite, so bf16 remains strictly more precise
        # than the reference's deployed numerics. CPU backends (the Pi
        # streaming path) have no MXU — bf16 there only adds convert ops —
        # so they stay f32. CPTPU_INFER_F32=1 forces f32 everywhere.
        use_bf16 = (
            os.environ.get("CPTPU_INFER_F32") != "1"
            and pallas_nlmeans.tpu_backend()
        )
        self.model = build_classifier(
            self.params.model_name,
            len(self.labels),
            params=self.params,
            dense_sizes=self.params.dense_sizes,
            dropout=self.params.dropout,
            multi_label=self.params.multi_label,
            compute_dtype=jnp.bfloat16 if use_bf16 else jnp.float32,
        )
        weights_file = self.model_file.with_suffix(".msgpack")
        if self.model_file.suffix == ".keras" and self.model_file.exists():
            # reference-released tf.keras artifact (reference
            # interpreter.py:569-583 consumes these): import its weights
            # into the matching Flax classifier, no tensorflow needed
            from classifier_pipeline_tpu.models.keras_import import (
                FLAX_BN_EPS,
                MODEL_BN_EPS,
                import_keras_weights,
            )

            target = self._init_variables()
            self.variables = import_keras_weights(
                target, self.model_file,
                flax_bn_eps=MODEL_BN_EPS.get(
                    self.params.model_name, FLAX_BN_EPS
                ),
            )
        elif weights_file.exists():
            target = self._init_variables()
            self.variables = flax.serialization.from_bytes(
                target, weights_file.read_bytes()
            )
        else:
            logging.warning(
                "No weights at %s — using random init (test mode)", weights_file
            )
            self.variables = self._init_variables()
        self._predict_jit = jax.jit(
            lambda v, x: self.model.apply(v, x, train=False).astype(
                jnp.float32
            )
        )
        # fused per-track path: diff limits + preprocess + tile + forward in
        # ONE device program so a track costs a single host<->device round
        # trip (the TPU may sit behind a high-latency tunnel)
        sw = self.params.square_width
        fs = self.params.frame_size
        use_mvm = bool(self.params.mvm)

        def _forward(variables, tiles, features):
            if use_mvm:
                feats = jnp.broadcast_to(
                    features[None, :], (tiles.shape[0], features.shape[-1])
                )
                out = self.model.apply(variables, tiles, feats, train=False)
            else:
                out = self.model.apply(variables, tiles, train=False)
            # downstream accumulation is host numpy: hand back f32 even when
            # the model computes in bf16
            return out.astype(jnp.float32)

        @functools.partial(jax.jit, static_argnames=("clip_at_zero", "diff_norm"))
        def fused(variables, thermal, filtered, medians, reg_arr, valid,
                  track_regs, track_valid, seg_idx, features, clip_at_zero,
                  diff_norm):
            thermal = thermal.astype(jnp.float32)  # accepts raw u16 stacks
            if diff_norm:
                limits = preprocess_jax.filtered_limits_for_track(
                    filtered, track_regs, track_valid
                )
            else:
                limits = jnp.asarray([jnp.nan, jnp.nan], jnp.float32)
            frames = preprocess_jax.preprocess_track_frames(
                thermal, filtered, reg_arr, valid, medians, limits,
                frame_size=fs, clip_at_zero=clip_at_zero,
            )
            tiles = preprocess_jax.tile_segments(frames.tiles, seg_idx, sw)
            return _forward(variables, tiles, features)

        self._fused_classify = fused

        # batched-across-tracks variant: classify EVERY track of a clip batch
        # in one device call. thermal_all (B,T,H,W), filtered_all (T,B,H,W —
        # the scan's native layout), medians_all (B,T); per-track tensors
        # carry a clip index.
        @functools.partial(jax.jit, static_argnames=("diff_norm",))
        def fused_all(variables, thermal_all_u16, filtered_all, medians_all,
                      clip_idx, reg_arr, valid, track_regs, track_valid,
                      seg_idx, features, clip_at_zero, diff_norm):
            thermal_all = thermal_all_u16.astype(jnp.float32)

            def one(ci, ra, va, tr, tv, si, feat, caz):
                th = thermal_all[ci]
                fi = filtered_all[:, ci]
                md = medians_all[ci]
                if diff_norm:
                    limits = preprocess_jax.filtered_limits_for_track(fi, tr, tv)
                else:
                    limits = jnp.asarray([jnp.nan, jnp.nan], jnp.float32)
                frames = preprocess_jax.preprocess_track_frames(
                    th, fi, ra, va, md, limits, frame_size=fs,
                    clip_at_zero=caz,
                )
                tiles = preprocess_jax.tile_segments(frames.tiles, si, sw)
                return _forward(variables, tiles, feat)

            return jax.vmap(one)(
                clip_idx, reg_arr, valid, track_regs, track_valid, seg_idx,
                features, clip_at_zero,
            )

        self._fused_classify_all = fused_all

        # grouped variant: consumes a scan group's device-resident arrays
        # DIRECTLY (no host-side stack/pad/slice ops — under a remote-TPU
        # tunnel every op dispatch costs latency) and a single fused uint8
        # upload of all per-track job tensors.
        @functools.partial(jax.jit, static_argnames=("specs", "diff_norm"))
        def fused_grouped(variables, thermal_g_u16, filtered_g, medians_g,
                          jobs_buf, specs, diff_norm):
            reg_arr, valid, tr, tv, seg_idx, features, caz, lane = (
                _device_split(jobs_buf, specs)
            )
            thermal_all = thermal_g_u16.astype(jnp.float32)

            def one(ci, ra, va, trk, tvk, si, feat, cazk):
                th = thermal_all[ci]
                fi = filtered_g[:, ci]
                md = medians_g[ci]
                if diff_norm:
                    limits = preprocess_jax.filtered_limits_for_track(
                        fi, trk, tvk
                    )
                else:
                    limits = jnp.asarray([jnp.nan, jnp.nan], jnp.float32)
                frames = preprocess_jax.preprocess_track_frames(
                    th, fi, ra, va, md, limits, frame_size=fs,
                    clip_at_zero=cazk,
                )
                tiles = preprocess_jax.tile_segments(frames.tiles, si, sw)
                return _forward(variables, tiles, feat)

            return jax.vmap(one)(
                lane, reg_arr, valid, tr, tv, seg_idx, features, caz
            )

        self._fused_classify_grouped = fused_grouped

    def _init_variables(self):
        size = self.params.frame_size * self.params.square_width
        dummy = jnp.zeros((1, size, size, len(self.params.channels)), jnp.float32)
        if self.params.mvm:
            from classifier_pipeline_tpu.models.forest import MVM_FEATURE_DIM

            feats = jnp.zeros((1, MVM_FEATURE_DIM), jnp.float32)
            return self.model.init(jax.random.PRNGKey(0), dummy, feats, train=False)
        return self.model.init(jax.random.PRNGKey(0), dummy, train=False)

    def shape(self):
        size = self.params.frame_size * self.params.square_width
        return 1, (None, size, size, len(self.params.channels))

    def predict(self, batch):
        batch = np.asarray(batch, np.float32)
        if self.run_over_network:
            return self.predict_over_network(batch)
        n = batch.shape[0]
        b = _next_bucket(n)
        if b != n:
            batch = np.concatenate(
                [batch, np.zeros((b - n,) + batch.shape[1:], np.float32)]
            )
        out = self._predict_jit(self.variables, jnp.asarray(batch))
        return np.asarray(out)[:n]

    def predict_over_network(self, data):
        """HTTP passthrough (reference interpreter.py:53-62)."""
        import urllib.request

        req = urllib.request.Request(
            f"http://127.0.0.1:{self.port}/predict",
            data=np.float32(data).tobytes(),
            headers={"content-type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req) as resp:
            out = np.frombuffer(resp.read(), dtype=np.float32)
        return out.reshape(len(data), -1)

    # ---------------------------------------------------------- tracks -----

    def frames_for_prediction(self, clip_ctx, track, **args):
        predict_from_last = args.get("predict_from_last")
        segment_frames = args.get("segment_frames")
        dont_filter = args.get("dont_filter", False)
        max_predictions = args.get("num_predictions")
        bounds = track.bounds
        from_last = predict_from_last
        if from_last is not None and segment_frames is None:
            available = len(bounds)
            from_last = min(from_last, available)
            if available > from_last:
                target = from_last
                from_last = 0
                valid = 0
                for i, r in enumerate(reversed(bounds[-available:])):
                    if r.blank:
                        continue
                    valid += 1
                    from_last = i + 1
                    if valid >= target:
                        break
        if from_last is not None:
            if from_last == 0:
                return []
            regions = bounds[-from_last:]
            start_frame = regions[0].frame_number
        else:
            regions = bounds
            start_frame = track.start_frame
        segments, _ = get_segments(
            "clip",
            track.track_id,
            start_frame,
            regions,
            segment_width=self.params.square_width**2,
            ffc_frames=[] if dont_filter else clip_ctx.ffc_frames,
            repeats=1,
            segment_types=self.params.segment_types,
            max_segments=max_predictions,
            dont_filter=dont_filter,
            min_segments=args.get("min_segments"),
            seed=self.seed,
        )
        return segments

    def _segment_tensors(self, clip_ctx, track, segments):
        """Build the fixed-shape index tensors for a track's segments."""
        unique = {}
        for seg in segments:
            for r in seg.regions:
                unique.setdefault(r.frame_number, r)
        # drop regions whose frame has been evicted from the streaming ring
        # (a blank-heavy track's frames_for_prediction lookback can span
        # more frames than the 64-slot ring holds) — mirrors the
        # track_regions filter below; index_of would KeyError otherwise
        regions = sorted(
            (r for r in unique.values() if clip_ctx.has_frame(r.frame_number)),
            key=lambda r: r.frame_number,
        )
        if not regions:
            return None
        clip_at_zero = clip_ctx.clip_thermals_at_zero(regions)
        F = len(regions)
        caps = self.streaming_caps
        Fb = caps[0] if caps and F <= caps[0] else _next_bucket(F, 8)
        reg_arr = np.zeros((Fb, 5), np.int32)
        valid = np.zeros((Fb,), bool)
        frame_to_pos = {}
        for i, r in enumerate(regions):
            reg_arr[i] = (clip_ctx.index_of(r.frame_number), r.x, r.y, r.width, r.height)
            valid[i] = True
            frame_to_pos[r.frame_number] = i
        track_regions = [
            b for b in track.bounds
            if not b.blank and b.width > 0 and b.height > 0
            and clip_ctx.has_frame(b.frame_number)
        ]
        nt = len(track_regions)
        Tb = caps[1] if caps and nt <= caps[1] else _next_bucket(nt, 8)
        tr = np.zeros((Tb, 5), np.int32)
        tv = np.zeros((Tb,), bool)
        for i, r in enumerate(track_regions):
            tr[i] = (clip_ctx.index_of(r.frame_number), r.x, r.y, r.width, r.height)
            tv[i] = True
        S = len(segments)
        Sb = caps[2] if caps and S <= caps[2] else _next_bucket(S)
        if caps and (F > caps[0] or nt > caps[1] or S > caps[2]):
            # falling back to dynamic buckets reintroduces the mid-stream
            # XLA compile the caps exist to prevent — make it visible
            # instead of manifesting as an unexplained multi-second stall
            logging.warning(
                "streaming caps exceeded (frames %d/%d, track regions %d/%d,"
                " segments %d/%d): classify will compile a new program",
                F, caps[0], nt, caps[1], S, caps[2],
            )
        sw2 = self.params.square_width**2
        seg_idx = np.zeros((Sb, sw2), np.int32)
        for i, seg in enumerate(segments):
            # an evicted frame (dropped by the has_frame filter above) falls
            # back to the segment's first still-present frame — degraded
            # tile repetition beats a KeyError mid-stream
            present = [f for f in seg.frame_indices if f in frame_to_pos]
            fallback = frame_to_pos[present[0]] if present else 0
            seg_idx[i] = [frame_to_pos.get(f, fallback)
                          for f in seg.frame_indices]
        return reg_arr, valid, tr, tv, seg_idx, clip_at_zero, S

    def preprocess_segments(self, clip_ctx, track, segments):
        tensors = self._segment_tensors(clip_ctx, track, segments)
        if tensors is None:
            return None, None, None
        reg_arr, valid, tr, tv, seg_idx, clip_at_zero, S = tensors
        if self.params.diff_norm:
            limits = preprocess_jax.filtered_limits_for_track(
                clip_ctx.filtered, jnp.asarray(tr), jnp.asarray(tv)
            )
        else:
            limits = jnp.asarray([np.nan, np.nan], np.float32)
        frames = preprocess_jax.preprocess_track_frames(
            clip_ctx.thermal,
            clip_ctx.filtered,
            jnp.asarray(reg_arr),
            jnp.asarray(valid),
            clip_ctx.medians,
            limits,
            frame_size=self.params.frame_size,
            clip_at_zero=clip_at_zero,
        )
        tiles = preprocess_jax.tile_segments(
            frames.tiles, jnp.asarray(seg_idx), self.params.square_width
        )
        preprocessed = np.asarray(tiles)[:S]
        masses = [seg.mass for seg in segments]
        return [list(s.frame_indices) for s in segments], preprocessed, masses

    def _track_features(self, clip_ctx, track):
        """Per-track 188-dim MVM feature vector, featurenorms-standardized
        (reference interpreter.py:439-445 forest_process_track(normalize=True)
        feeding the kerasmodel.py:310 Input((188)) branch). Zeros placeholder
        when mvm is off."""
        if not self.params.mvm:
            return np.zeros((1,), np.float32)
        from classifier_pipeline_tpu.models.forest import (
            _RemappedRegion,
            track_feature_vector,
        )

        thermal = clip_ctx._thermal_np
        filtered = np.asarray(clip_ctx.filtered)
        background = clip_ctx.background
        if background is None:
            background = np.zeros(thermal.shape[1:], np.float32)
        regions = [
            _RemappedRegion(r, clip_ctx.index_of(r.frame_number))
            for r in track.bounds
            if not r.blank and r.width > 0 and r.height > 0
            and clip_ctx.has_frame(r.frame_number)
        ]
        return track_feature_vector(thermal, filtered, background, regions)

    def classify_track_fused(self, clip_ctx, track, segments):
        """One device round trip per track: preprocess + forward fused."""
        tensors = self._segment_tensors(clip_ctx, track, segments)
        if tensors is None:
            return None, None, None
        reg_arr, valid, tr, tv, seg_idx, clip_at_zero, S = tensors
        out = self._fused_classify(
            self.variables,
            clip_ctx.thermal,
            clip_ctx.filtered,
            clip_ctx.medians,
            jnp.asarray(reg_arr),
            jnp.asarray(valid),
            jnp.asarray(tr),
            jnp.asarray(tv),
            jnp.asarray(seg_idx),
            jnp.asarray(self._track_features(clip_ctx, track)),
            clip_at_zero=clip_at_zero,
            diff_norm=bool(self.params.diff_norm),
        )
        output = np.asarray(out)[:S]
        masses = [seg.mass for seg in segments]
        return [list(s.frame_indices) for s in segments], output, masses

    def warmup_streaming(self, n_frames, h, w):
        """Pre-compile the streaming fused classify programs at the fixed
        streaming shapes (both clip_at_zero variants), so no XLA compile —
        seconds of stall on a weak host — ever lands mid-stream. Requires
        streaming_caps to be set; no-op otherwise."""
        if self.streaming_caps is None or self.run_over_network:
            return
        if self.model is None:
            return
        F, T, S = self.streaming_caps
        sw2 = self.params.square_width ** 2
        # uint16: the streaming ring hands the jit its raw u16 thermal
        # buffer (both thermal and IR runtimes store u16); warm that
        # exact signature
        thermal = jnp.zeros((n_frames, h, w), jnp.uint16)
        filtered = jnp.zeros((n_frames, h, w), jnp.float32)
        medians = jnp.zeros((n_frames,), jnp.float32)
        reg = np.zeros((F, 5), np.int32)
        reg[:, 1:3] = 1
        reg[:, 3:] = 8  # non-degenerate boxes keep the resize path benign
        valid = np.zeros((F,), bool)
        valid[0] = True
        tr = np.zeros((T, 5), np.int32)
        tr[:, 1:3] = 1
        tr[:, 3:] = 8
        tv = np.zeros((T,), bool)
        tv[0] = True
        seg = np.zeros((S, sw2), np.int32)
        if self.params.mvm:
            from classifier_pipeline_tpu.models.forest import MVM_FEATURE_DIM

            feats = np.zeros((MVM_FEATURE_DIM,), np.float32)
        else:
            feats = np.zeros((1,), np.float32)
        for caz in (True, False):
            out = self._fused_classify(
                self.variables, thermal, filtered, medians,
                jnp.asarray(reg), jnp.asarray(valid), jnp.asarray(tr),
                jnp.asarray(tv), jnp.asarray(seg), jnp.asarray(feats),
                clip_at_zero=caz, diff_norm=bool(self.params.diff_norm),
            )
            np.asarray(out)

    def predict_recent_frames(self, clip_ctx, track, **args):
        """Streaming cascade entry (reference interpreter.py:103-109):
        classify the last N frames of a live track. Returns
        (prediction, frames, masses) or None."""
        segments = self.frames_for_prediction(clip_ctx, track, **args)
        if not segments:
            return None
        if self.run_over_network:
            frames, preprocessed, masses = self.preprocess_segments(
                clip_ctx, track, segments
            )
            if preprocessed is None or len(preprocessed) == 0:
                return None
            prediction = self.predict(preprocessed)
            return prediction, frames, masses
        # local: one fused preprocess+forward program per call — with
        # streaming_caps set its shapes are fixed, so after
        # warmup_streaming no live predict ever waits on an XLA compile
        frames, output, masses = self.classify_track_fused(
            clip_ctx, track, segments
        )
        if output is None or len(output) == 0:
            return None
        return output, frames, masses

    def classify_track(self, clip_ctx, track, segment_frames=None, min_segments=None):
        start = time.time()
        segments = self.frames_for_prediction(
            clip_ctx,
            track,
            segment_frames=segment_frames,
            min_segments=min_segments,
        )
        if not segments:
            logging.info("Skipping track %s", track.track_id)
            return None
        if self.run_over_network:
            frames, preprocessed, masses = self.preprocess_segments(
                clip_ctx, track, segments
            )
            if preprocessed is None or len(preprocessed) == 0:
                return None
            output = self.predict(preprocessed)
        else:
            frames, output, masses = self.classify_track_fused(
                clip_ctx, track, segments
            )
            if output is None or len(output) == 0:
                return None
        track_pred = self.track_prediction_from_raw(
            track.track_id, frames, output, masses
        )
        track_pred.classify_time = time.time() - start
        return track_pred

    def track_prediction_from_raw(self, track_id, prediction_frames, output, masses):
        tp = TrackPrediction(
            track_id, self.labels, smooth_preds=self.params.smooth_predictions
        )
        tp.classified_track(output, prediction_frames, masses)
        if (
            len(prediction_frames) == 1
            and len(set(prediction_frames[0])) < self.params.square_width**2 / 4
        ):
            if tp.predicted_tag() != "false-positive":
                tp.cap_confidences(0.5)
        return tp


def classify_clip_batch(interpreter, ctxs, track_lists, min_segments=1):
    """Classify every track of a batch of clips in ONE device call.

    ctxs: per-clip ClipContext (thermal/filtered/medians on device).
    track_lists: per-clip list of tracks. Returns list of
    {track_id: TrackPrediction} aligned with ctxs.
    """
    return classify_clip_batch_collect(
        classify_clip_batch_dispatch(interpreter, ctxs, track_lists, min_segments)
    )


def classify_clip_batch_dispatch(interpreter, ctxs, track_lists, min_segments=1):
    """Dispatch the fused classify for a clip batch without blocking (JAX
    async dispatch); pair with classify_clip_batch_collect. Lets callers
    overlap the prediction compute/fetch with other host work."""
    jobs = []  # (clip_i, track, segments, tensors)
    for ci, (ctx, tracks) in enumerate(zip(ctxs, track_lists)):
        for track in tracks:
            segments = interpreter.frames_for_prediction(
                ctx, track, min_segments=min_segments
            )
            if not segments:
                continue
            tensors = interpreter._segment_tensors(ctx, track, segments)
            if tensors is None:
                continue
            jobs.append((ci, track, segments, tensors))
    results = [dict() for _ in ctxs]
    if not jobs:
        return (interpreter, [], results, 0.0)
    start = time.time()
    grouped = all(
        getattr(c, "device_group", None) is not None
        and c.device_group.medians is not None
        for c in ctxs
    )
    batches = []
    if grouped:
        # one fused device call per scan group: the group's device-resident
        # thermal/filtered/medians are consumed whole (no host-side stack or
        # per-clip slicing) and all job tensors ride one fused upload
        by_group = {}
        for job in jobs:
            g = ctxs[job[0]].device_group
            by_group.setdefault(id(g), (g, []))[1].append(job)
        for g, gjobs in by_group.values():
            arrays = _pack_jobs(
                interpreter, ctxs, gjobs, lambda ci: ctxs[ci].lane
            )
            buf, specs = _fuse_host(arrays)
            out = interpreter._fused_classify_grouped(
                interpreter.variables, g.thermal, g.filtered, g.medians,
                jnp.asarray(buf), specs=specs,
                diff_norm=bool(interpreter.params.diff_norm),
            )
            batches.append((gjobs, tracker_jax.fetch_async(out)))
    else:
        # fallback: stack per-clip tensors to a common shape
        arrays = _pack_jobs(interpreter, ctxs, jobs, lambda ci: ci)
        reg_arr, valid, tr, tv, seg_idx, features, caz, clip_idx = arrays
        B = len(ctxs)
        H, W = ctxs[0]._thermal_np.shape[1:]
        dev_thermals = [getattr(c, "thermal_dev16", None) for c in ctxs]
        if all(d is not None for d in dev_thermals):
            # reuse device-resident thermal (e.g. the sharded-SPMD scan sets
            # per-clip slices): pad to the batch max on device, no re-upload
            T = max(int(d.shape[0]) for d in dev_thermals)
            thermal_all = jnp.stack(
                [
                    d
                    if int(d.shape[0]) == T
                    else jnp.concatenate(
                        [d, jnp.zeros((T - int(d.shape[0]), H, W), d.dtype)],
                        axis=0,
                    )
                    for d in dev_thermals
                ]
            )
        else:
            T = max(int(c._thermal_np.shape[0]) for c in ctxs)
            thermal_all = np.zeros((B, T, H, W), np.uint16)
            for ci, ctx in enumerate(ctxs):
                t = int(ctx._thermal_np.shape[0])
                thermal_all[ci, :t] = np.asarray(ctx._thermal_np, np.uint16)
        medians_all = np.zeros((B, T), np.float32)
        fil = []
        for ci, ctx in enumerate(ctxs):
            t = int(ctx._thermal_np.shape[0])
            medians_all[ci, :t] = ctx._medians_np
            f = ctx.filtered
            if f.shape[0] < T:
                f = jnp.concatenate(
                    [f, jnp.zeros((T - f.shape[0], H, W), jnp.float32)],
                    axis=0,
                )
            fil.append(f)
        filtered_all = jnp.stack(fil, axis=1)  # (T, B, H, W)
        out = interpreter._fused_classify_all(
            interpreter.variables, jnp.asarray(thermal_all), filtered_all,
            jnp.asarray(medians_all), jnp.asarray(clip_idx),
            jnp.asarray(reg_arr), jnp.asarray(valid), jnp.asarray(tr),
            jnp.asarray(tv), jnp.asarray(seg_idx), jnp.asarray(features),
            jnp.asarray(caz),
            diff_norm=bool(interpreter.params.diff_norm),
        )
        batches.append((jobs, tracker_jax.fetch_async(out)))
    return (interpreter, batches, results, time.time() - start)


def _pack_jobs(interpreter, ctxs, jobs, lane_of):
    """Pack per-track job tensors into padded host arrays. Every dimension
    is bucketed to a power of two so the set of compiled shapes stays small
    across batches; padded job rows are all-invalid and their outputs are
    never read."""
    N = _next_bucket(len(jobs))
    Fb = _next_bucket(max(j[3][0].shape[0] for j in jobs))
    Tb = _next_bucket(max(j[3][2].shape[0] for j in jobs))
    Sb = _next_bucket(max(j[3][4].shape[0] for j in jobs))
    sw2 = interpreter.params.square_width ** 2
    reg_arr = np.zeros((N, Fb, 5), np.int32)
    valid = np.zeros((N, Fb), bool)
    tr = np.zeros((N, Tb, 5), np.int32)
    tv = np.zeros((N, Tb), bool)
    seg_idx = np.zeros((N, Sb, sw2), np.int32)
    caz = np.zeros((N,), bool)
    lane = np.zeros((N,), np.int32)
    feat_dim = 1
    if interpreter.params.mvm:
        from classifier_pipeline_tpu.models.forest import MVM_FEATURE_DIM

        feat_dim = MVM_FEATURE_DIM
    features = np.zeros((N, feat_dim), np.float32)
    for i, (ci, track, segments, tensors) in enumerate(jobs):
        ra, va, tra, tva, si, clip_at_zero, S = tensors
        reg_arr[i, : ra.shape[0]] = ra
        valid[i, : va.shape[0]] = va
        tr[i, : tra.shape[0]] = tra
        tv[i, : tva.shape[0]] = tva
        seg_idx[i, : si.shape[0]] = si
        caz[i] = clip_at_zero
        lane[i] = lane_of(ci)
        if interpreter.params.mvm:
            features[i] = interpreter._track_features(ctxs[ci], track)
    return reg_arr, valid, tr, tv, seg_idx, features, caz, lane


def classify_clip_batch_collect(handle):
    """Fetch predictions of a dispatched classify batch and assemble
    TrackPredictions (blocks on the device results)."""
    interpreter, batches, results, dispatch_elapsed = handle
    if not batches:
        return results
    # classify_time: dispatch-side host time + the result fetch wait, NOT
    # wall time since dispatch (collection may be deferred past other
    # chunks' host work in the pipelined batch path)
    t_fetch = time.time()
    outs = [fut.result() for _, fut in batches]
    elapsed = dispatch_elapsed + (time.time() - t_fetch)
    total = sum(len(gjobs) for gjobs, _ in batches)
    for (gjobs, _), out in zip(batches, outs):
        for i, (ci, track, segments, tensors) in enumerate(gjobs):
            S = tensors[6]
            output = out[i, :S]
            frames = [list(s.frame_indices) for s in segments]
            masses = [s.mass for s in segments]
            tp = interpreter.track_prediction_from_raw(
                track.track_id, frames, output, masses
            )
            tp.classify_time = elapsed / total
            results[ci][track.track_id] = tp
    return results


def guess_type(model_file):
    model_file = Path(model_file)
    if model_file.suffix in (".msgpack", ".flax", ""):
        return FlaxInterpreter.TYPE
    if model_file.suffix == ".pkl":
        return "RandomForest"
    return FlaxInterpreter.TYPE


def get_interpreter(model, run_over_network=False, load_model=True, seed=None):
    """Factory (reference interpreter.py:597-628). `model` is a ModelConfig."""
    mtype = model.type or guess_type(model.model_file)
    if mtype == "RandomForest":
        from classifier_pipeline_tpu.models.forest import ForestModel

        classifier = ForestModel(model.model_file, load_model=load_model)
    else:
        classifier = FlaxInterpreter(
            model.model_file,
            run_over_network=run_over_network or model.run_over_network,
            load_model=load_model,
        )
    classifier.id = model.id
    classifier.port = model.port
    if seed is not None:
        classifier.seed = seed
    return classifier
