"""Golden tracking parity on the REAL TPU (sym NL-means kernel path)."""
import json, sys
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from classifier_pipeline_tpu.pipeline.extractor import extract_file

clip = "/root/reference/tests/clips/possum.cptv"
gold = json.load(open("/root/reference/tests/clips/possum.txt"))

res = extract_file(clip)
mine = res.metadata["tracks"]
gt = gold["tracks"]
assert len(mine) == len(gt) == 2, (len(mine), len(gt))
worst = 0
exact = total = 0
for m, g in zip(mine, gt):
    assert m["frame_start"] == g["frame_start"]
    assert m["frame_end"] == g["frame_end"]
    score_d = abs(m["tracking_score"] - g["tracking_score"])
    worst = max(worst, score_d)
    gp = {p["frame_number"]: p for p in g["positions"]}
    mp = {p["frame_number"]: p for p in m["positions"]}
    assert set(gp) == set(mp)
    for fn in gp:
        a, b = mp[fn], gp[fn]
        total += 1
        same = (a["x"], a["y"], a["width"], a["height"]) == (
            b["x"], b["y"], b["width"], b["height"])
        exact += same
        assert abs(a["x"] - b["x"]) <= 1 and abs(a["y"] - b["y"]) <= 1, (fn, a, b)
        assert abs(a["mass"] - b["mass"]) <= max(5, 0.02 * b["mass"]), (fn, a, b)
        assert a["blank"] == b["blank"]
print(f"GOLDEN OK on TPU: {exact}/{total} boxes exact, worst score diff {worst:.4f}")
