"""Clip track extraction pipeline: CPTV decode -> device tracking scan ->
host track assembly -> metadata JSON.

Equivalent of the reference's ClipTrackExtractor.parse_clip + trackextractor
metadata writing (reference src/track/cliptrackextractor.py:141-179,
src/track/trackextractor.py:205-251), re-architected so the per-frame work is
one jitted ``lax.scan`` over the whole clip.
"""

from __future__ import annotations

import dataclasses
import datetime
import json
import logging
import os
import time
from pathlib import Path
from zoneinfo import ZoneInfo

import jax
import numpy as np

from classifier_pipeline_tpu.cptv import load_cptv
from classifier_pipeline_tpu.track import postprocess, tracker_jax
from classifier_pipeline_tpu.track.tracker_jax import TrackingParams

TRACKER_VERSION = 11
LOCAL_TZ = ZoneInfo("Pacific/Auckland")

# per-camera-model thresholds (reference src/config/trackingmotionconfig.py)
CAMERA_THRESHOLDS = {
    "lepton3": dict(temp_thresh=2900, background_thresh=20, default=True,
                    track_min_delta=1.0, track_max_delta=150),
    "lepton3.5": dict(temp_thresh=28000, background_thresh=50, default=False,
                      track_min_delta=1.0, track_max_delta=150),
    "IR": dict(temp_thresh=None, background_thresh=12, default=False,
               track_min_delta=1.0, track_max_delta=150),
}

FFC_PERIOD_MS_QUIRK = 9  # reference int-milliseconds branch: diff_ms < 9


def threshold_for_model(camera_model):
    t = CAMERA_THRESHOLDS.get(camera_model)
    if t is None:
        for v in CAMERA_THRESHOLDS.values():
            if v.get("default"):
                return v
    return t


def clip_stats(thermal: np.ndarray) -> dict:
    """reference ClipStats (clip.py:455-501): per-frame min/max/median/mean
    and aggregates, vectorized."""
    t = thermal.astype(np.float64)
    mins = t.min(axis=(1, 2))
    maxs = t.max(axis=(1, 2))
    medians = np.median(t, axis=(1, 2))
    means = t.mean(axis=(1, 2))
    return {
        "frame_stats_min": mins.tolist(),
        "frame_stats_max": maxs.tolist(),
        "frame_stats_median": medians.tolist(),
        "frame_stats_mean": means.tolist(),
        "min_temp": float(mins.min()),
        "max_temp": float(maxs.max()),
        "mean_temp": float(np.mean(np.uint16(means))),
    }


@dataclasses.dataclass
class ExtractResult:
    metadata: dict
    tracks: list
    filtered_tracks: list
    n_frames: int
    tracking_time: float
    rows: object = None  # stacked FrameRows (for classification reuse)
    clip: object = None  # CptvClip
    background: np.ndarray | None = None
    thermal_dev16: object = None  # (T, H, W) u16 device array (sharded path)
    device_group: object = None  # tracker_jax.DeviceGroup (batch path)
    lane: int = -1  # this clip's lane within device_group
    frame_medians: np.ndarray | None = None  # per-frame medians (host copy)

    def filtered_np(self) -> np.ndarray:
        """Host copy of this clip's filtered frames (debug/preview use)."""
        fil = np.asarray(self.rows.filtered)
        if self.device_group is not None and fil.ndim == 4:
            return fil[: self.n_frames, self.lane]
        return fil


class ClipTrackExtractor:
    """Batch thermal track extractor (TPU-native)."""

    VERSION = TRACKER_VERSION
    TYPE = "thermal"

    def __init__(
        self,
        config=None,
        verbose=False,
        keep_rows=True,
        emit_filtered=False,
        calculate_thumbnails=True,
        emit_mask=False,
    ):
        self.config = config or {}
        self.verbose = verbose
        self.keep_rows = keep_rows
        self.emit_filtered = emit_filtered
        self.calculate_thumbnails = calculate_thumbnails
        self.emit_mask = emit_mask
        self._clip_id = 0
        # optional stage accounting (CPTPU_TIMING=1): decode / dispatch /
        # scan-wait / assemble shares of the batch path
        self.timer = None
        if os.environ.get("CPTPU_TIMING", "0") == "1":
            from classifier_pipeline_tpu.utils.profiling import StageTimer

            self.timer = StageTimer()

    def _stage(self, name):
        import contextlib

        return self.timer.stage(name) if self.timer else contextlib.nullcontext()

    def params_for(self, camera_model) -> TrackingParams:
        th = threshold_for_model(camera_model)
        tracking = self.config.get("tracking", {}).get("thermal", {}) if self.config else {}
        weight_add = 1.0 if camera_model == "lepton3.5" else 0.1
        return TrackingParams(
            background_thresh=float(th["background_thresh"]),
            weight_add=weight_add,
            denoise=tracking.get("denoise", True),
            filter_regions_pre_match=tracking.get("filter_regions_pre_match", True),
            min_hist_diff=tracking.get("min_hist_diff", None),
            max_track_slots=tracking.get("max_track_slots", 24),
            max_region_slots=tracking.get("max_region_slots", 16),
            emit_filtered=self.emit_filtered,
            thumb_stats=tracking.get("thumb_stats", True),
            # masks only leave the device when a caller needs them (debug
            # previews, host-side thumbnail computation); by default
            # thumbnails use the scan's per-row component stats
            emit_mask=self.emit_mask
            or (
                self.calculate_thumbnails
                and (
                    not tracking.get("thumb_stats", True)
                    or os.environ.get("CPTPU_HOST_THUMBS", "0") == "1"
                )
            ),
        )

    def _prepare(self, path, process_background=False, clip_id=None):
        path = Path(path)
        clip = load_cptv(path)
        if clip_id is None:
            self._clip_id += 1
            clip_id = self._clip_id
        header = clip.header
        camera_model = header.model or None
        params = self.params_for(camera_model)
        pixels = clip.pixels
        # frames processed by the tracker (reference skips the embedded
        # background frame unless process_background). foreground() returns
        # a VIEW in the normal leading-background layout — these pixel
        # blocks are ~100MB per chunk and the host has one core.
        if not process_background:
            thermal, meta = clip.foreground()
        else:
            thermal, meta = pixels, clip._meta
        time_on = meta[:, 0].astype(np.int64)
        last_ffc = meta[:, 1].astype(np.int64)
        ffc = (time_on - last_ffc) < FFC_PERIOD_MS_QUIRK
        background = pixels[0]  # reference init uses the reader's first frame
        delta_fg = self._foreground_delta(clip, thermal, process_background)
        return (clip, camera_model, params, thermal, ffc, background, clip_id,
                delta_fg)

    @staticmethod
    def _foreground_delta(clip, thermal, process_background):
        """Slice the decoder's upload-ready delta stream (CptvClip.delta) to
        the tracked frame range, so the batch upload skips re-encoding.
        Returns None (→ re-encode fallback) when the decoder didn't provide
        deltas or background frames aren't a leading prefix."""
        d = getattr(clip, "delta", None)
        t_real = thermal.shape[0]
        if d is None or t_real < 2:
            return None
        if process_background:
            return d
        # same frame-selection helper as CptvClip.foreground(): the sliced
        # delta stream must describe exactly the thermal view's frames
        nbg = clip.leading_background_count()
        if nbg is None:
            return None  # fancy-indexed foreground: delta chain broken
        resid, shift, ei, ev = d
        if nbg == 0:
            return (resid, shift, ei, ev)
        HW = resid.shape[1] * resid.shape[2]
        lo, hi = nbg * HW, (nbg + t_real - 1) * HW
        m = (ei >= lo) & (ei < hi)
        return (
            resid[nbg : nbg + t_real - 1],
            shift[nbg : nbg + t_real - 1],
            ei[m] - lo,
            ev[m],
        )

    def scan_batch(self, paths, process_background=False):
        """Decode + upload + dispatch the vmapped scan for a clip batch
        without blocking (JAX async dispatch). Pair with collect_batch.
        Clips are grouped by camera model (static tracking params must
        match)."""
        start = time.time()
        if not paths:
            return ([], [], [], [], start)
        # decode clips in parallel: the native CPTV decoder runs under ctypes,
        # which drops the GIL for the duration of the C call. Clip ids are
        # assigned up front so threading can't reorder them.
        from concurrent.futures import ThreadPoolExecutor

        clip_ids = []
        for _ in paths:
            self._clip_id += 1
            clip_ids.append(self._clip_id)
        try:
            n_cpus = len(os.sched_getaffinity(0))  # respects pinning/cgroups
        except AttributeError:  # pragma: no cover - non-Linux
            n_cpus = os.cpu_count() or 1
        workers = min(8, len(paths), n_cpus)
        with self._stage("decode"):
            if workers <= 1:
                # single-core host: pooled decode is pure context-switch
                # overhead (the GIL-released C sections still serialize on
                # the one CPU; measured 1.77s serial vs 2.0s pool(8)/64)
                prepped = [
                    self._prepare(p, process_background, clip_id=cid)
                    for p, cid in zip(paths, clip_ids)
                ]
            else:
                with ThreadPoolExecutor(max_workers=workers) as pool:
                    prepped = list(
                        pool.map(
                            lambda pc: self._prepare(pc[0], process_background,
                                                     clip_id=pc[1]),
                            zip(paths, clip_ids),
                        )
                    )
        # Group by (static params, frame-count bucket): padding every clip to
        # the batch MAX length wastes scan compute and upload bytes on mixed
        # corpora (a 150-frame clip padded to a 400-frame batch runs 2.7x the
        # work). Same-bucket clips scan together; groups are split into
        # power-of-two-sized subgroups so the set of compiled (B, T) shapes
        # stays small (binary decomposition: 17 clips -> scans of 16 + 1).
        by_key = {}
        for i, pre in enumerate(prepped):
            tb = tracker_jax._round_up(max(pre[3].shape[0], 1), 32)
            by_key.setdefault((pre[2], tb), []).append(i)
        subgroups = []  # (params, sub indices, group device bytes)
        total_bytes = 0
        for (params, tb), idxs in by_key.items():
            # subgroup cap: (a) one scan program's NL-means pallas kernel
            # packs clip pairs into VMEM-resident lane tiles; past 32 clips
            # the compiler's scoped-VMEM budget overflows (measured on v5e);
            # (b) long clips are capped so the group's device residency
            # (thermal u16 + emitted filtered f32 + working set) stays well
            # under HBM — a 10-minute clip at B=32 would need >13GB for the
            # filtered emission alone. The cap is floored to a power of two
            # so compiled (B, T) shapes stay few.
            px = params.res_x * params.res_y
            bytes_per_clip = tb * px * (2 + (4 if params.emit_filtered else 0)) + tb * px // 2
            cap = max(1, min(32, int(6e9 // max(bytes_per_clip, 1))))
            max_sub = 1 << (cap.bit_length() - 1)  # power-of-two floor
            pos = 0
            while pos < len(idxs):
                n = len(idxs) - pos
                size = 1 << (n.bit_length() - 1)  # largest power of two <= n
                size = min(size, max_sub)
                sub = idxs[pos : pos + size]
                pos += size
                subgroups.append((params, sub, size * bytes_per_clip))
                total_bytes += size * bytes_per_clip

        # Dispatch everything up front while the BATCH total fits the device
        # budget; otherwise dispatch in waves — collect_batch launches the
        # next subgroup as each one completes, bounding live residency.
        handles = []
        pending = []
        budget = 8e9
        if total_bytes <= budget:
            handles = [self._dispatch_subgroup(prepped, p, s)
                       for p, s, _ in subgroups]
        else:
            live = 0.0
            for p, s, b in subgroups:
                if live + b <= budget or not handles:
                    handles.append(self._dispatch_subgroup(prepped, p, s))
                    live += b
                else:
                    pending.append((p, s, b))
        return (paths, prepped, handles, pending, start)

    def _dispatch_subgroup(self, prepped, params, sub):
        """Upload + dispatch one scan subgroup (single marshaling site for
        the up-front and residency-deferred waves)."""
        batch = [prepped[i] for i in sub]
        with self._stage("upload+dispatch"):
            return (
                sub,
                tracker_jax.track_clips_batch_dispatch(
                    [b[3] for b in batch],
                    [b[4] for b in batch],
                    params,
                    backgrounds=[b[5] for b in batch],
                    deltas=[b[7] for b in batch],
                ),
            )

    def collect_batch(self, scan_handle) -> list:
        """Block on a dispatched batch scan and assemble ExtractResults.
        Launches residency-deferred subgroups (huge batches) as earlier ones
        complete."""
        paths, prepped, handles, pending, start = scan_handle
        pending = list(pending)
        results: list = [None] * len(paths)
        queue = list(handles)
        while queue:
            idxs, handle = queue.pop(0)
            with self._stage("scan-wait"):
                scans = tracker_jax.track_clips_batch_collect(handle)
            if pending:
                # previous subgroup's big device buffers are fetched; start
                # the next wave
                p, s, _b = pending.pop(0)
                queue.append(self._dispatch_subgroup(prepped, p, s))
            for i, (rows, carry) in zip(idxs, scans):
                clip, camera_model, params_i, thermal, ffc, _, clip_id = (
                    prepped[i][:7]
                )
                with self._stage("assemble"):
                    results[i] = self._finalize(
                        Path(paths[i]), clip, camera_model, params_i, thermal,
                        rows, carry, start, clip_id=clip_id,
                    )
                # device-resident group arrays for downstream classification
                results[i].device_group = getattr(carry, "device_group", None)
                results[i].lane = getattr(carry, "lane", -1)
                results[i].thermal_dev16 = getattr(carry, "thermal_dev16", None)
                results[i].frame_medians = getattr(carry, "frame_medians", None)
        return results

    def extract_batch(self, paths, process_background=False) -> list:
        """Track many clips concurrently (one chip, vmapped scan)."""
        return self.collect_batch(self.scan_batch(paths, process_background))

    def extract(self, path, process_background=False) -> ExtractResult:
        start = time.time()
        clip, camera_model, params, thermal, ffc, background, clip_id = (
            self._prepare(path, process_background)[:7]
        )
        # track_clip fetches rows to host except the device-resident filtered
        rows, carry = tracker_jax.track_clip(thermal, ffc, params, background)
        return self._finalize(
            Path(path), clip, camera_model, params, thermal, rows, carry,
            start, clip_id=clip_id,
        )

    def _finalize(self, path, clip, camera_model, params, thermal, rows,
                  carry, start, clip_id=None):
        header = clip.header
        th = threshold_for_model(camera_model)

        tracks = postprocess.assemble_tracks(rows, fps=float(header.fps or 9))
        filter_cfg = dict(
            track_min_delta=th["track_min_delta"],
            track_max_delta=th["track_max_delta"],
        )
        # track-filter knobs live in the tracking.thermal section (reference
        # trackingconfig.py:44-48: max_tracks/min_moving_frames/... at the
        # tracker level, durations/offsets under its "filters" subdict)
        tracking = self.config.get("tracking", {}).get("thermal", {}) if self.config else {}
        for k in ("max_tracks", "min_moving_frames", "max_blank_percent",
                  "max_jitter"):
            if tracking.get(k) is not None:
                filter_cfg[k] = tracking[k]
        filter_cfg.update(tracking.get("filters", {}) or {})
        filter_cfg.update(self.config.get("filters", {}))
        good, filtered = postprocess.filter_tracks(tracks, params, filter_cfg)

        meta = self.build_metadata(
            path, clip, camera_model, th, good, thermal.shape[0],
            clip_id=clip_id,
        )
        if self.calculate_thumbnails:
            self._add_thumbnails(
                meta, thermal, rows, good, th,
                medians=getattr(carry, "frame_medians", None),
                thumb_stats=params.thumb_stats,
            )
        tracking_time = time.time() - start
        meta["source"] = str(path)
        meta["tracking_time"] = round(tracking_time, 1)
        meta["algorithm"] = {
            "tracker_version": TRACKER_VERSION,
            "tracker_config": dataclasses.asdict(params),
        }
        return ExtractResult(
            metadata=meta,
            tracks=good,
            filtered_tracks=filtered,
            n_frames=int(thermal.shape[0]),
            tracking_time=tracking_time,
            rows=rows if self.keep_rows else None,
            clip=clip,
            background=np.asarray(carry.background),
        )

    def _add_thumbnails(self, meta, thermal, rows, tracks, th, medians=None,
                        thumb_stats=True):
        """reference trackextractor.get_metadata:205-230 thumbnail wiring.

        Default path: the scan's device-computed per-row component stats
        (boundary length + component median) + per-frame medians — no
        detection-mask transfer or host mask crunching. The mask-based host
        computation remains for rows without stats (or CPTPU_HOST_THUMBS=1,
        used by the equivalence test)."""
        from classifier_pipeline_tpu.classify import thumbnail

        if medians is None:
            medians = thumbnail.frame_medians(thermal) if tracks else None
        # gate on whether the scan actually computed stats (thumb_stats
        # False emits all-zero rows, which must fall back to the mask path)
        use_rows = (
            thumb_stats
            and os.environ.get("CPTPU_HOST_THUMBS", "0") != "1"
        )
        if use_rows:
            for i, track in enumerate(tracks):
                meta["tracks"][i]["thumbnail"] = (
                    thumbnail.thumbnail_metadata_from_rows(track, medians)
                )
        else:
            masks = tracker_jax.unpack_mask(rows.mask)
            for i, track in enumerate(tracks):
                meta["tracks"][i]["thumbnail"] = thumbnail.thumbnail_metadata(
                    thermal, masks, track, th["background_thresh"],
                    medians=medians,
                )
        if not tracks:
            region_history = []
            rv = np.asarray(rows.reg_valid)
            rm = np.asarray(rows.reg_mass)
            rx = np.asarray(rows.reg_x)
            ry = np.asarray(rows.reg_y)
            rw = np.asarray(rows.reg_w)
            rh = np.asarray(rows.reg_h)
            for t in range(rv.shape[0]):
                regions = [
                    {
                        "x": int(rx[t, j]), "y": int(ry[t, j]),
                        "width": int(rw[t, j]), "height": int(rh[t, j]),
                        "mass": int(rm[t, j]), "frame_number": t,
                        "pixel_variance": 0, "blank": False, "in_trap": False,
                    }
                    for j in range(rv.shape[1])
                    if rv[t, j]
                ]
                region_history.append(regions)
            meta["thumbnail_region"] = thumbnail.best_trackless_thumb(
                thermal, region_history
            )

    def build_metadata(self, path, clip, camera_model, th, tracks, n_frames,
                       clip_id=None):
        header = clip.header
        meta = {}
        if camera_model:
            meta["camera_model"] = camera_model
        meta["background_thresh"] = th["background_thresh"]
        meta["id"] = clip_id if clip_id is not None else self._clip_id
        start_dt = datetime.datetime.fromtimestamp(
            header.timestamp_us / 1_000_000, tz=datetime.timezone.utc
        ).astimezone(LOCAL_TZ)
        fps = float(header.fps or 9)
        end_dt = start_dt + datetime.timedelta(seconds=n_frames / fps)
        meta["start_time"] = start_dt.isoformat()
        meta["end_time"] = end_dt.isoformat()
        meta["tracks"] = [t.get_metadata(TRACKER_VERSION) for t in tracks]
        return meta


def extract_file(path, config=None, verbose=False) -> ExtractResult:
    return ClipTrackExtractor(config=config, verbose=verbose).extract(path)


def save_metadata(result: ExtractResult, out_path=None):
    out = Path(out_path) if out_path else Path(result.metadata["source"]).with_suffix(".txt")
    with open(out, "w") as f:
        json.dump(result.metadata, f, indent=4, default=_json_default)
    return out


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not JSON serializable: {type(o)}")
