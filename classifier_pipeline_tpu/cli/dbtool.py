"""HDF5 database utilities (reference src/{dbviewer,replicatedb,
generate_images,rebuildDate}.py): list/inspect clips, replicate a subset to
another database, export tracks as PNGs, and find the corpus cutoff date."""

from __future__ import annotations

import argparse
import json
import sys


def cmd_list(db, args):
    for cid in db.get_clip_ids():
        meta = db.get_clip_meta(cid)
        tracks = db.get_track_ids(cid)
        print(f"clip {cid}: {len(tracks)} tracks  source={meta.get('source', '?')}")
        if args.verbose:
            for tid in tracks:
                _, regions, attrs = db.get_track(cid, tid)
                print(
                    f"  track {tid}: {attrs.get('frames')} frames "
                    f"tags={attrs.get('tags')}"
                )


def cmd_show(db, args):
    frames, regions, attrs = db.get_track(args.clip, args.track)
    print(json.dumps({"attrs": {k: str(v) for k, v in attrs.items()},
                      "n_frames": len(frames),
                      "first_region": regions[0] if regions else None}, indent=2))


def cmd_replicate(db, args):
    from classifier_pipeline_tpu.data.trackdb import TrackDatabase
    from classifier_pipeline_tpu.track.postprocess import RegionRow

    out = TrackDatabase(args.dest)
    clip_ids = args.clips.split(",") if args.clips else db.get_clip_ids()
    if args.limit:
        clip_ids = clip_ids[: args.limit]
    for cid in clip_ids:
        meta = db.get_clip_meta(cid)
        out.create_clip(cid, metadata=meta, background=db.get_clip_background(cid))
        for tid in db.get_track_ids(cid):
            frames, regions, attrs = db.get_track(cid, tid)
            rr = [
                RegionRow(
                    x=r["x"], y=r["y"], width=r["width"], height=r["height"],
                    mass=r["mass"], frame_number=r["frame_number"],
                    pixel_variance=r.get("pixel_variance", 0),
                    blank=r.get("blank", False), centroid=(0, 0),
                    is_along_border=False,
                )
                for r in regions
            ]
            out.add_track(cid, tid, frames, rr, tags=attrs.get("tags"),
                          start_frame=attrs.get("start_frame", 0))
        print(f"replicated clip {cid}")


def cmd_images(db, args):
    """reference generate_images.py: dump per-track normalized PNGs + the clip
    background + a metadata sidecar, for people who don't want h5py."""
    import os

    import numpy as np
    from PIL import Image

    from classifier_pipeline_tpu.utils.tools import normalize_host

    def _norm(a):
        return normalize_host(a)[0]

    os.makedirs(args.out, exist_ok=True)
    for cid in db.get_clip_ids():
        clip_dir = os.path.join(args.out, str(cid))
        os.makedirs(clip_dir, exist_ok=True)
        background = db.get_clip_background(cid)
        if background is not None:
            Image.fromarray(np.uint8(_norm(background))).save(
                os.path.join(clip_dir, f"{cid}-background.png")
            )
        for tid in db.get_track_ids(cid):
            frames, regions, attrs = db.get_track(cid, tid)
            start = int(attrs.get("start_frame", 0))
            for i, frame in enumerate(frames):
                thermal = frame[0] if frame.ndim == 3 else frame
                Image.fromarray(np.uint8(_norm(thermal))).save(
                    os.path.join(clip_dir, f"{cid}-{start + i}.png")
                )
            with open(os.path.join(clip_dir, f"track-{tid}.json"), "w") as f:
                json.dump({k: str(v) for k, v in attrs.items()}, f, indent=2)
        print(f"exported clip {cid}")


def cmd_rebuild_date(_db, args):
    """reference rebuildDate.py: newest clip date in a cptv dir minus 6
    months, printed as a DB rebuild cutoff."""
    from datetime import datetime, timedelta
    from pathlib import Path

    latest = None
    for clip in Path(args.data_dir).glob("**/*.cptv"):
        name = clip.name
        try:
            date_s = name[name.index("-") + 1 :][:15]
            dt = datetime.strptime(date_s, "%Y%m%d-%H%M%S")
        except ValueError:
            continue
        if latest is None or dt > latest:
            latest = dt
    if latest is None:
        print("no cptv files found", file=sys.stderr)
        return 1
    print((latest - timedelta(days=30 * 6)).strftime("%Y-%m-%d 00:00:00"))
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(description="track database tool")
    parser.add_argument("db")
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list")
    p_list.add_argument("-v", "--verbose", action="store_true")
    p_show = sub.add_parser("show")
    p_show.add_argument("clip")
    p_show.add_argument("track")
    p_rep = sub.add_parser("replicate")
    p_rep.add_argument("dest")
    p_rep.add_argument("--clips", help="comma-separated clip ids")
    p_rep.add_argument("--limit", type=int)
    p_img = sub.add_parser("images", help="export tracks as PNGs")
    p_img.add_argument("out")
    p_date = sub.add_parser("rebuild-date", help="corpus cutoff date")
    p_date.add_argument("data_dir")
    args = parser.parse_args(argv)
    if args.cmd == "rebuild-date":
        return cmd_rebuild_date(None, args)
    from classifier_pipeline_tpu.data.trackdb import TrackDatabase

    db = TrackDatabase(args.db)
    rc = {
        "list": cmd_list,
        "show": cmd_show,
        "replicate": cmd_replicate,
        "images": cmd_images,
    }[args.cmd](db, args)
    return rc or 0


if __name__ == "__main__":
    sys.exit(main())
