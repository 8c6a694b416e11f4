"""build CLI — corpus -> train/validation/test TFRecords (reference
src/build.py)."""

from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="dataset generation")
    parser.add_argument("data_dir", help="directory of clips")
    parser.add_argument("-c", "--config-file")
    parser.add_argument("--ext", default=".cptv")
    parser.add_argument("-o", "--out-dir", default=None,
                        help="output dir (default <base>/training-data)")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--num-shards", type=int, default=20)
    parser.add_argument("--workers", type=int, default=0)
    parser.add_argument("--split-file", default=None,
                        help="datasplit.json: deterministic splits by clip "
                        "source instead of random splitting")
    parser.add_argument("--label-paths", default=None,
                        help="label_paths.json taxonomy file; remaps raw "
                        "tags to training labels (reference get_mappings)")
    parser.add_argument("--date", default=None,
                        help="ISO date; recordings after it are test-only")
    args = parser.parse_args(argv)

    from classifier_pipeline_tpu.config.config import Config
    from classifier_pipeline_tpu.data.dataset import (
        Dataset,
        dump_split_ids,
        load_label_mapping,
        rough_balance,
        split_by_file,
        split_randomly,
        validate_datasets,
    )
    from classifier_pipeline_tpu.data.thermalwriter import create_tf_records
    from classifier_pipeline_tpu.utils.logs import init_logging
    from classifier_pipeline_tpu.utils.tools import enable_compile_cache

    init_logging()

    enable_compile_cache()
    config = Config.load_from_file(args.config_file)
    build_cfg = config.get("build", {}) or {}
    test_clips = build_cfg.get("test_clips") or []

    label_mapping = None
    if args.label_paths:
        label_mapping = load_label_mapping(args.label_paths)
        logging.info("Loaded %d label mappings", len(label_mapping))
    after_date = None
    if args.date:
        from datetime import datetime

        after_date = datetime.fromisoformat(args.date)

    master = Dataset(
        args.data_dir, "dataset", config,
        ext=args.ext,
        label_mapping=label_mapping,
        tag_precedence=build_cfg.get("tag_precedence"),
    )
    record_dir = Path(
        args.out_dir or (Path(config.get("base_data_folder", ".")) / "training-data")
    )
    record_dir.mkdir(parents=True, exist_ok=True)

    if args.split_file:
        logging.info("Splitting by file %s", args.split_file)
        datasets = split_by_file(master, args.split_file, args.data_dir)
    else:
        master.load_clips(dont_filter_segment=True, workers=args.workers)
        master.labels.sort()
        logging.info(
            "Loaded %d clips, %d samples, labels: %s",
            len(master.clips), len(master.samples_by_id), master.labels,
        )
        for k, v in master.filtered_stats.items():
            if v:
                logging.info("  %s filtered %d", k, v)

        datasets = split_randomly(master, test_clips=test_clips,
                                  seed=args.seed)
        rough_balance(datasets)
        validate_datasets(datasets, test_clips or None, after_date)
        dump_split_ids(datasets, record_dir / "datasplit.json")
    labels = sorted({l for d in datasets for l in d.samples_by_label.keys()})
    dataset_counts = {}
    for d in datasets:
        n = create_tf_records(
            d, record_dir / d.name, labels,
            num_shards=args.num_shards, num_frames=master.segment_length,
        )
        counts = {
            label: len(d.samples_by_label.get(label, [])) for label in labels
        }
        dataset_counts[d.name] = counts
        logging.info("%s: %d examples %s", d.name, n, counts)

    meta = {
        "labels": labels,
        "type": "thermal",
        "counts": dataset_counts,
        "by_label": False,
        "segment_types": [st.name for st in master.segment_types],
    }
    with open(record_dir / "training-meta.json", "w") as f:
        json.dump(meta, f, indent=4)
    logging.info("Wrote %s", record_dir / "training-meta.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
