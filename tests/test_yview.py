"""Web viewer: progressive frames, edit->cancel->preview->restart, orbit."""

import json
import threading
import urllib.request

import numpy as np

from yocto_tpu.models.examples import make_cornellbox
from yocto_tpu.trace.params import SamplerType, TraceParams


def _params():
    return TraceParams(resolution=16, samples=4, bounces=2,
                       sampler=SamplerType.eyelight)


def test_viewer_progressive_and_edit():
    from yocto_tpu.apps.yview import ViewerServer

    v = ViewerServer(make_cornellbox(), _params())
    seq, samples, png = v.frame(-1, timeout=60.0)
    assert png[:4] == b"\x89PNG"
    assert samples >= 0

    # camera orbit triggers cancel -> preview -> restart
    v.command({"orbit": [0.3, 0.1]})
    seq2, _, png2 = v.frame(seq, timeout=60.0)
    assert seq2 != seq
    # param edit restarts with a different sampler
    v.command({"params": {"sampler": "falsecolor", "samples": 2}})
    assert v.params.sampler == SamplerType.falsecolor
    seq3, samples3, _ = v.frame(seq2, timeout=60.0)
    assert samples3 <= 2
    from yocto_tpu.trace.progressive import trace_cancel
    trace_cancel(v.ctx)


def test_viewer_http_roundtrip():
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from yocto_tpu.apps import yview

    viewer = yview.ViewerServer(make_cornellbox(), _params())

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path.startswith("/frame"):
                cur, samples, png = viewer.frame(-1, timeout=30.0)
                self.send_response(200)
                self.send_header("X-Seq", str(cur))
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)
            else:
                body = viewer.page().encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            viewer.command(json.loads(self.rfile.read(n)))
            self.send_response(204)
            self.end_headers()

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30).read()
        assert b"yview" in page
        frame = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame?seq=-1", timeout=60).read()
        assert frame[:4] == b"\x89PNG"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api",
            data=json.dumps({"dolly": 0.1}).encode(), method="POST")
        assert urllib.request.urlopen(req, timeout=60).status == 204
    finally:
        server.shutdown()
        from yocto_tpu.trace.progressive import trace_cancel
        trace_cancel(viewer.ctx)


def test_viewer_material_edit():
    """Scene-edit surface: a material emission edit round-trips through
    cancel -> preview -> restart and shows up in the next frame
    (apps/ytrace.cpp:233-247 edit contract)."""
    from yocto_tpu.apps.yview import ViewerServer
    from yocto_tpu.trace.progressive import trace_cancel

    scene = make_cornellbox()
    v = ViewerServer(scene, _params())
    try:
        seq, _, _ = v.frame(-1, timeout=60.0)

        info = v.scene_summary()
        assert info["materials"] and info["cameras"]
        idx = next(i for i, m in enumerate(info["materials"])
                   if m["type"] == "matte" and sum(m["emission"]) == 0)

        v.command({"material": {"index": idx, "color": [0.9, 0.1, 0.1],
                                "emission": [4.0, 4.0, 4.0],
                                "roughness": 0.3}})
        assert np.allclose(scene.materials[idx].emission, 4.0)
        assert scene.materials[idx].roughness == 0.3
        # the edit reaches the re-flattened scene (preview or restart frame)
        seq2, _, _ = v.frame(seq, timeout=60.0)
        assert seq2 != seq
        info2 = v.scene_summary()
        assert info2["materials"][idx]["emission"] == [4.0, 4.0, 4.0]
    finally:
        trace_cancel(v.ctx)
