"""Dataset corpus management (reference src/ml_tools/dataset.py + the
splitting logic of src/build.py:234-692).

Scans a corpus of clips (raw .cptv + .txt sidecars, or HDF5 track database),
builds TrackHeaders with per-track samples (segments or sample frames),
indexes by label/bin, and splits train/validation/test with bins (station or
clip+track) kept within one split.
"""

from __future__ import annotations

import logging
import multiprocessing
import random
from pathlib import Path

import numpy as np

from .datasetstructures import SegmentType
from .rawdb import RawDatabase

VALIDATION_PERCENT = 0.15
TEST_PERCENT = 0.05
# reference build.py:31-34 (current values; older revisions used 100)
MIN_SAMPLES = 1
MIN_TRACKS = 1
LOW_SAMPLES_LABELS = []
SPLIT_BY_CLIP_LABELS = ["vehicle", "penguin", "wallaby"]

DEFAULT_IGNORED = ["insect", "untagged", "unidentified", "not identifiable"]


class Dataset:
    def __init__(self, dataset_dir, name, config=None, label_mapping=None,
                 raw=True, ext=".cptv", segment_length=25, segment_spacing=1,
                 segment_types=(SegmentType.ALL_RANDOM_MASKED,),
                 segment_min_avg_mass=10, max_segments=None,
                 min_frame_mass=16, use_segments=True, max_frames=75,
                 tag_precedence=None):
        self.dataset_dir = Path(dataset_dir) if dataset_dir else None
        self.name = name
        self.config = config
        self.label_mapping = label_mapping or {}
        self.raw = raw
        self.ext = ext
        self.segment_length = segment_length
        self.segment_spacing = segment_spacing
        self.segment_types = list(segment_types)
        self.segment_min_avg_mass = segment_min_avg_mass
        self.max_segments = max_segments
        self.min_frame_mass = min_frame_mass
        self.use_segments = use_segments
        self.max_frames = max_frames
        self.tag_precedence = tag_precedence
        self.filter_by_lq = False
        self.enable_augmentation = False
        self.skip_ffc = True

        self.clips = []  # ClipHeaders
        self.labels = []
        self.samples_by_label = {}
        self.samples_by_bin = {}
        self.samples_by_id = {}
        self.filtered_stats = {
            "no_tag": 0, "tags": 0, "notags": 0, "bad_track_json": 0,
            "confidence": 0,
        }

    # ------------------------------------------------------------- load ----

    def load_clips(self, dont_filter_segment=False, workers=0):
        files = sorted(self.dataset_dir.rglob(f"*{self.ext}"))
        logging.info("Loading %d clips from %s", len(files), self.dataset_dir)
        if workers:
            with multiprocessing.Pool(workers) as pool:
                headers = pool.map(self._load_header, files)
        else:
            headers = [self._load_header(f) for f in files]
        for header in headers:
            if header is None:
                continue
            self.add_clip(header, dont_filter_segment=dont_filter_segment)

    def _load_header(self, f):
        try:
            db = RawDatabase(f)
            if db.meta_data is None:
                self.filtered_stats["notags"] += 1
                return None
            db.load_frames()
            return db.get_clip_tracks(self.tag_precedence)
        except Exception:
            logging.error("Could not load %s", f, exc_info=True)
            return None

    def load_clip(self, source_file, dont_filter_segment=False):
        header = self._load_header(Path(source_file))
        if header is not None:
            self.add_clip(header, dont_filter_segment=dont_filter_segment)

    def add_clip(self, clip_header, dont_filter_segment=False):
        kept = []
        for track in clip_header.tracks:
            if not self._filter_track(track):
                kept.append(track)
                self._make_samples(track, clip_header, dont_filter_segment)
        clip_header.tracks = kept
        self.clips.append(clip_header)

    def _filter_track(self, track):
        if track.label is None:
            self.filtered_stats["no_tag"] += 1
            return True
        if track.label in DEFAULT_IGNORED:
            self.filtered_stats["tags"] += 1
            return True
        if track.confidence is not None and track.confidence < 0.5:
            self.filtered_stats["confidence"] += 1
            return True
        return False

    def _make_samples(self, track, clip_header, dont_filter_segment):
        if self.label_mapping and track.original_label in self.label_mapping:
            track.remapped_label = self.label_mapping[track.original_label]
        if self.use_segments:
            samples = track.get_segments(
                segment_width=self.segment_length,
                segment_frame_spacing=int(
                    self.segment_spacing * clip_header.frames_per_second
                ),
                segment_types=self.segment_types,
                segment_min_mass=self.segment_min_avg_mass,
                ffc_frames=clip_header.ffc_frames,
                dont_filter=dont_filter_segment,
                skip_ffc=self.skip_ffc,
                min_mass=self.min_frame_mass,
                max_segments=self.max_segments,
            )
            track.samples = samples
        else:
            track.calculate_sample_frames(
                min_mass=track.lower_mass,
                max_mass=track.upper_mass,
                ffc_frames=clip_header.ffc_frames if self.skip_ffc else None,
                max_frames=self.max_frames,
            )
        for s in track.samples:
            self.add_sample(s)

    def add_sample(self, sample):
        label = sample.label
        if label not in self.labels:
            self.labels.append(label)
        self.samples_by_label.setdefault(label, []).append(sample)
        self.samples_by_bin.setdefault(sample.bin_id, {})[sample.id] = sample
        self.samples_by_id[sample.id] = sample

    def add_samples(self, samples):
        for s in samples:
            self.add_sample(s)

    def remove_sample(self, sample):
        self.samples_by_label.get(sample.label, []).remove(sample)
        self.samples_by_bin.get(sample.bin_id, {}).pop(sample.id, None)
        self.samples_by_id.pop(sample.id, None)

    @property
    def samples(self):
        return list(self.samples_by_id.values())

    def counts(self, label):
        samples = self.samples_by_label.get(label, [])
        tracks = {s.track_id for s in samples}
        bins = {s.bin_id for s in samples}
        return len(tracks), len(samples), len(bins)

    def sub_dataset(self, name, samples):
        d = Dataset(
            self.dataset_dir, name, self.config,
            label_mapping=self.label_mapping, raw=self.raw, ext=self.ext,
            segment_length=self.segment_length,
            segment_spacing=self.segment_spacing,
            segment_types=self.segment_types, use_segments=self.use_segments,
            segment_min_avg_mass=self.segment_min_avg_mass,
            max_segments=self.max_segments,
            min_frame_mass=self.min_frame_mass, max_frames=self.max_frames,
            tag_precedence=self.tag_precedence,
        )
        d.labels = list(self.labels)
        d.clips = self.clips
        for s in samples:
            d.add_sample(s)
        return d


def split_randomly(dataset: Dataset, test_clips=(), use_test=True, seed=None):
    """reference build.py split_randomly/split_label: per-label bin-wise
    greedy fill of validation/test up to percentage or minimum-count
    targets; everything else trains. Bins never straddle splits."""
    if seed is not None:
        random.seed(seed)
        np.random.seed(seed)
    train_s, val_s, test_s = [], [], []
    # test clips forced to test
    for clip in dataset.clips:
        if clip.clip_id in set(test_clips):
            for track in clip.tracks:
                for s in list(track.samples):
                    if s.id in dataset.samples_by_id:
                        dataset.remove_sample(s)
                        test_s.append(s)
    labels = sorted(
        dataset.labels,
        key=lambda l: len(dataset.samples_by_label.get(l, [])),
    )
    train_counts = {l: 0 for l in labels}
    val_counts = {l: 0 for l in labels}
    test_counts = {l: 0 for l in labels}
    for label in labels:
        samples = list(dataset.samples_by_label.get(label, []))
        if not samples:
            continue
        sample_bins = list({s.bin_id for s in samples})
        random.shuffle(sample_bins)
        n_samples = len(samples)
        min_samples = 10 if label in LOW_SAMPLES_LABELS else MIN_SAMPLES
        num_val = max(n_samples * VALIDATION_PERCENT, min_samples) - val_counts[label]
        num_test = max(n_samples * TEST_PERCENT, min_samples) - test_counts[label]
        targets = [(val_s, num_val)] + ([(test_s, num_test)] if use_test else [])
        for target_list, sample_limit in targets:
            if sample_limit <= 0:
                continue
            count = 0
            used = 0
            for b in list(sample_bins):
                bin_samples = list(dataset.samples_by_bin.get(b, {}).values())
                if not bin_samples:
                    sample_bins.remove(b)
                    continue
                for s in bin_samples:
                    target_list.append(s)
                    dataset.samples_by_id.pop(s.id, None)
                    if s.label == label:
                        count += 1
                dataset.samples_by_bin.pop(b, None)
                sample_bins.remove(b)
                used += 1
                if count >= sample_limit:
                    break
        # remaining bins with this label -> train
        for b in list(sample_bins):
            bin_samples = list(dataset.samples_by_bin.get(b, {}).values())
            for s in bin_samples:
                train_s.append(s)
                dataset.samples_by_id.pop(s.id, None)
            dataset.samples_by_bin.pop(b, None)
    # anything left (labels processed via other bins)
    for b in list(dataset.samples_by_bin.keys()):
        for s in dataset.samples_by_bin[b].values():
            train_s.append(s)
        dataset.samples_by_bin.pop(b, None)
    dataset.samples_by_id = {}
    return (
        dataset.sub_dataset("train", train_s),
        dataset.sub_dataset("validation", val_s),
        dataset.sub_dataset("test", test_s),
    )


def split_by_file(master: Dataset, split_file, base_dir, make_val=True):
    """Deterministic splits from a datasplit.json (reference build.py
    split_by_file, :371-414): each split section lists clip source files;
    clips load directly into that split's dataset. Labels are unified
    across the three splits. With make_val, train is re-split randomly
    into train/validation (the file's validation section is ignored,
    matching the reference default)."""
    import json

    base_dir = Path(base_dir)
    with open(split_file) as f:
        wanted = json.load(f)

    splits = []
    for name in ("train", "validation", "test"):
        part = master.sub_dataset(name, [])
        part.clips = []
        if name == "train":
            part.enable_augmentation = True
        elif name == "test":
            part.skip_ffc = False
        for entry in wanted.get(name, []):
            src = base_dir / entry["source"]
            if not src.exists():
                continue
            try:
                part.load_clip(src, dont_filter_segment=True)
            except Exception:
                logging.error("Could not load %s", src, exc_info=True)
        splits.append(part)

    labels = sorted({l for part in splits for l in part.labels})
    for part in splits:
        part.labels = list(labels)
    if make_val:
        train, val, _ = split_randomly(splits[0], use_test=False)
        splits = [train, val, splits[2]]
    return splits


def dump_split_ids(datasets, out_file):
    """Record which clip went where (reference build.py dump_split_ids,
    :635-656) — the input format of split_by_file."""
    import json

    doc = {}
    for d in datasets:
        by_source = {}
        for s in d.samples_by_id.values():
            by_source.setdefault(s.source_file, []).append(s)
        doc[d.name] = [
            {
                "clip_id": group[0].clip_id,
                "source": str(src),
                "station_id": "{}".format(group[0].station_id),
                "tags": sorted({s.label for s in group}),
            }
            for src, group in by_source.items()
        ]
    with open(out_file, "w") as f:
        json.dump(doc, f)


def validate_datasets(datasets, test_clips=None, after_date=None):
    """Split hygiene asserts (reference build.py validate_datasets,
    :526-560): a bin appears in at most one split, and test-forced CLIPS
    appear only in the test split (compared by sample.clip_id — bin ids are
    "clip-track" strings, so a bin-level intersection against clip ids can
    never fire). Bins recorded after `after_date` legitimately exist only
    in test and are excluded from the overlap check against it."""
    test_clips = {int(c) for c in test_clips} if test_clips else None
    bin_sets = []
    for d in datasets:
        bins = {s.bin_id for s in d.samples_by_id.values()}
        bin_sets.append(bins)
        if test_clips and d.name != "test":
            leaked = {
                s.clip_id for s in d.samples_by_id.values()
                if int(s.clip_id) in test_clips
            }
            assert not leaked, (
                f"test clips leaked into {d.name}: {sorted(leaked)[:5]}")
    for i, d in enumerate(datasets[:2]):
        if not bin_sets[i]:
            continue
        for j in range(i + 1, len(datasets)):
            other = datasets[j]
            if other.name == d.name:
                continue
            other_bins = set(bin_sets[j])
            if other.name == "test" and after_date is not None:
                other_bins -= {
                    s.bin_id for s in other.samples_by_id.values()
                    if s.rec_time is not None and s.rec_time > after_date
                }
            overlap = bin_sets[i] & other_bins
            assert not overlap, (
                f"bins straddle {d.name}/{other.name}: {sorted(overlap)[:5]}")


# Birds whose taxonomy path collapses to "bird" for every other species but
# which train as their own class (reference build.py land_birds, :565-576).
LAND_BIRDS = [
    "pukeko", "california quail", "brown quail", "black swan", "quail",
    "pheasant", "penguin", "duck", "chicken", "rooster",
]


def regroup_label(label, tax_path):
    """Map one classification taxonomy path to a training label (reference
    build.py get_mappings, :596-632): mammals group to their genus level,
    kiwi subtypes to kiwi, other birds to 'bird', land birds stay
    themselves."""
    if label in LAND_BIRDS:
        return label
    parts = tax_path.split(".")
    if len(parts) == 1:
        return label
    if tax_path.startswith("all.mammal"):
        return parts[-2] if len(parts) == 4 else label
    parent = parts[-2]
    if parent == "kiwi" or parts[-1] == "kiwi":
        return "kiwi"
    if parent == "other":
        return label
    if "bird." in tax_path:
        return "bird"
    if len(parts) > 2:
        return parts[-3]
    return parts[-1]


def load_label_mapping(label_paths_file):
    """label_paths.json -> {original label: training label} (reference
    build.py get_mappings; the file ships with the Cacophony API and the
    reference repo at src/label_paths.json)."""
    import json

    with open(label_paths_file) as f:
        label_paths = json.load(f)
    return {l: regroup_label(l, p) for l, p in label_paths.items()}


def rough_balance(datasets, cap_percentile=75):
    """reference build.py rough_balance: cap heavily-overrepresented labels
    in the train set."""
    train = datasets[0]
    counts = [len(s) for s in train.samples_by_label.values()]
    if not counts:
        return
    cap = int(np.percentile(counts, cap_percentile) * 2)
    for label, samples in list(train.samples_by_label.items()):
        if len(samples) > cap:
            drop = np.random.choice(
                samples, len(samples) - cap, replace=False
            )
            for s in drop:
                train.remove_sample(s)
            logging.info("Balanced %s: dropped %d samples", label, len(drop))
