"""Service-layer tests: model HTTP server, classify socket daemon."""

import json
import socket
import threading
import time
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model_prefix(tmp_path_factory):
    from classifier_pipeline_tpu.models.artifacts import create_model

    prefix = tmp_path_factory.mktemp("model") / "m"
    # small backbone for fast tests
    create_model(prefix, model_name="simple-cnn")
    return prefix


def test_servemodel_http(model_prefix):
    from classifier_pipeline_tpu.classify.interpreter import FlaxInterpreter
    from classifier_pipeline_tpu.services.servemodel import make_handler
    from http.server import ThreadingHTTPServer

    interp = FlaxInterpreter(model_prefix)
    _, shape = interp.shape()
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(interp, shape[1:])
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/ready") as r:
            assert r.status == 200
        batch = np.random.default_rng(0).uniform(
            0, 255, (2, 160, 160, 2)
        ).astype(np.float32)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=batch.tobytes(),
            headers={"content-type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req) as r:
            out = np.frombuffer(r.read(), np.float32).reshape(2, -1)
        assert out.shape == (2, 17)
        assert (out >= 0).all() and (out <= 1).all()
        # network passthrough path of the interpreter
        interp2 = FlaxInterpreter(model_prefix, run_over_network=True,
                                  load_model=False)
        interp2.port = port
        out2 = interp2.predict(batch)
        np.testing.assert_allclose(out2.reshape(2, -1), out, rtol=1e-5)
    finally:
        server.shutdown()


def test_classify_service_ready(tmp_path):
    from classifier_pipeline_tpu.services import classifyjob

    sock_path = tmp_path / "svc.sock"
    server = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    server.bind(str(sock_path))
    server.listen(1)

    def fake_service():
        conn, _ = server.accept()
        data = conn.recv(4096)
        job = json.loads(data.decode())
        assert job.get("ready")
        conn.sendall(b'{"ready": true}')
        conn.close()

    t = threading.Thread(target=fake_service, daemon=True)
    t.start()
    reply = classifyjob.submit({"ready": True}, sock_path, timeout=5)
    assert reply == {"ready": True}


def test_postprocess_watcher(tmp_path):
    from classifier_pipeline_tpu.services.postprocess import DirWatcher

    class FakeClassifier:
        def __init__(self):
            self.processed = []

        def process_file(self, f):
            self.processed.append(f)
            return {"tracks": []}

        def save_metadata(self, meta, out):
            out.write_text(json.dumps(meta))

    watch = tmp_path / "postprocess"
    watch.mkdir()
    done = tmp_path
    fc = FakeClassifier()
    w = DirWatcher(watch, fc, move_to=done)
    f = watch / "rec.cptv"
    f.write_bytes(b"x" * 100)
    assert w.scan_once() == 0  # first sighting: size not yet stable
    assert w.scan_once() == 1  # stable -> processed + moved
    assert (done / "rec.cptv").exists()
    assert (done / "rec.txt").exists()
    assert len(fc.processed) == 1
    w.pause()
    f2 = watch / "rec2.cptv"
    f2.write_bytes(b"y")
    assert w.scan_once() == 0
    w.resume()
    w.scan_once()
    assert w.scan_once() == 1


def test_dbtool_images_and_rebuild_date(tmp_path):
    """dbtool images (reference generate_images.py) and rebuild-date
    (reference rebuildDate.py)."""
    import numpy as np

    from classifier_pipeline_tpu.cli import dbtool
    from classifier_pipeline_tpu.data.trackdb import TrackDatabase
    from classifier_pipeline_tpu.track.postprocess import RegionRow

    db_path = str(tmp_path / "db.h5")
    db = TrackDatabase(db_path)
    bg = np.full((120, 160), 3000, np.float32)
    db.create_clip("11", metadata={"source": "x.cptv"}, background=bg)
    frames = np.zeros((3, 2, 24, 24), np.float32)
    regions = [
        RegionRow(x=1, y=2, width=24, height=24, mass=10, frame_number=i,
                  pixel_variance=0, blank=False, centroid=(0, 0),
                  is_along_border=False)
        for i in range(3)
    ]
    db.add_track("11", "22", frames, regions, tags=["possum"], start_frame=5)

    out = tmp_path / "imgs"
    rc = dbtool.main([db_path, "images", str(out)])
    assert rc == 0
    assert (out / "11" / "11-background.png").exists()
    assert (out / "11" / "11-5.png").exists()
    assert (out / "11" / "11-7.png").exists()
    assert (out / "11" / "track-22.json").exists()

    cdir = tmp_path / "cptv"
    cdir.mkdir()
    (cdir / "cam-20240601-120000.cptv").write_bytes(b"")
    (cdir / "cam-20240901-130000.cptv").write_bytes(b"")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = dbtool.main([db_path, "rebuild-date", str(cdir)])
    assert rc == 0
    assert buf.getvalue().strip() == "2024-03-05 00:00:00"
