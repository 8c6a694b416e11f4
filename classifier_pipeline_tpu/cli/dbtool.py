"""HDF5 database utilities (reference src/{dbviewer,replicatedb}.py):
list/inspect clips and replicate a subset to another database."""

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
    args = parser.parse_args(argv)
    from classifier_pipeline_tpu.data.trackdb import TrackDatabase

    db = TrackDatabase(args.db)
    {"list": cmd_list, "show": cmd_show, "replicate": cmd_replicate}[args.cmd](db, args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
