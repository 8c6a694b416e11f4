"""Golden tracking-test harness round trip: generate tests from our own
extract output, re-run, expect SAME verdicts."""

import json


def test_generate_and_score(possum_cptv, tmp_path):
    from classifier_pipeline_tpu.pipeline.extractor import extract_file
    from classifier_pipeline_tpu.utils import trackingtest

    res = extract_file(possum_cptv)
    meta_file = tmp_path / "possum.txt"
    meta_file.write_text(json.dumps(res.metadata, default=float))
    test_file = trackingtest.generate_tests([meta_file], tmp_path / "tests.yml")
    recs, _ = trackingtest.load_test_file(test_file)
    assert len(recs) == 1 and len(recs[0].tracks) == 2

    results = trackingtest.run_tests(
        test_file,
        clip_dir=possum_cptv.parent,
        extract_fn=lambda p: res.metadata["tracks"],
    )
    verdicts = results["possum.cptv"]
    assert all(v in ("SAME", "IMPROVED") for _, v in verdicts), verdicts


def test_score_against_reference_golden(possum_cptv, possum_meta, tmp_path):
    """Score our tracker against the REFERENCE's own output as the recorded
    baseline: must be SAME or IMPROVED on every track."""
    from classifier_pipeline_tpu.pipeline.extractor import extract_file
    from classifier_pipeline_tpu.utils import trackingtest

    meta_file = tmp_path / "ref.txt"
    meta_file.write_text(json.dumps(possum_meta))
    test_file = trackingtest.generate_tests([meta_file], tmp_path / "t.yml")
    res = extract_file(possum_cptv)
    results = trackingtest.run_tests(
        test_file,
        clip_dir=possum_cptv.parent,
        extract_fn=lambda p: res.metadata["tracks"],
    )
    verdicts = results["possum.cptv"]
    assert len(verdicts) == 2
    assert all(v in ("SAME", "IMPROVED") for _, v in verdicts), verdicts
