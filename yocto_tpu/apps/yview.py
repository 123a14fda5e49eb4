"""yview: interactive scene viewer (web-based GUI equivalent).

The reference's yview (apps/yview.cpp:40-74) opens an OpenGL raster
preview; its trace GUI (show_trace_gui, yocto_gui.cpp:585) runs
progressive refinement with the edit -> cancel -> preview -> restart
contract and mouse camera orbit (uiupdate_camera_params,
yocto_gui.h:310). A TPU renderer has no GL surface, so the equivalent
promised by SURVEY.md §2.1 #16 is a browser viewer: a stdlib HTTP server
streams progressive frames from trace/progressive.py's TraceContext
(long-poll PNG; one sample batch per dispatch), and POSTed camera/param
edits cancel the worker, show a low-res eyelight preview
(trace_preview, yocto_trace.cpp:1660 semantics), and restart sampling.

Non-interactive mode renders a single eyelight frame to --output — the
raster-preview role of the reference's yview.
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time

import numpy as np


def _tonemap_png(img: np.ndarray, exposure: float = 0.0) -> bytes:
    """Linear [H,W,4] -> sRGB PNG bytes. Pure NumPy: HTTP handler threads
    must not touch jax (device access is single-threaded through the
    remote-TPU tunnel; the render worker owns it)."""
    from PIL import Image

    rgb = np.asarray(img[..., :3], np.float32) * (2.0 ** exposure)
    srgb = np.where(rgb <= 0.0031308, rgb * 12.92,
                    1.055 * np.maximum(rgb, 1e-12) ** (1 / 2.4) - 0.055)
    arr = np.clip(srgb * 256.0, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, "PNG")
    return buf.getvalue()


class Orbit:
    """Turntable camera state (uiupdate_camera_params semantics:
    drag = rotate around the focus point, wheel = dolly, shift = pan)."""

    def __init__(self, camera):
        frame = np.asarray(camera.frame, np.float32)
        self.from_ = frame[3].copy()
        focus = camera.focus if camera.focus < 1000 else 1.0
        self.to = frame[3] - frame[2] * focus
        self.up = np.asarray([0, 1, 0], np.float32)

    def rotate(self, dx, dy):
        z = self.from_ - self.to
        lz = np.linalg.norm(z)
        phi = np.arctan2(z[2], z[0]) + dx
        theta = np.arccos(np.clip(z[1] / lz, -1, 1)) + dy
        theta = np.clip(theta, 0.001, np.pi - 0.001)
        self.from_ = self.to + lz * np.asarray(
            [np.sin(theta) * np.cos(phi), np.cos(theta),
             np.sin(theta) * np.sin(phi)], np.float32)

    def dolly(self, d):
        z = self.from_ - self.to
        lz = max(0.001, np.linalg.norm(z) * (1 + d))
        self.from_ = self.to + z / np.linalg.norm(z) * lz

    def pan(self, dx, dy):
        z = self.from_ - self.to
        lz = np.linalg.norm(z)
        x = np.cross(self.up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z / lz, x)
        shift = x * dx * lz + y * dy * lz
        self.from_ += shift
        self.to += shift

    def frame(self):
        from ..io.sceneio import _lookat_frame
        return _lookat_frame(self.from_, self.to, self.up)

    def focus(self):
        return float(np.linalg.norm(self.from_ - self.to))


_PAGE = """<!doctype html><html><head><title>yview</title><style>
body{margin:0;background:#111;color:#ddd;font:13px sans-serif;display:flex}
#img{image-rendering:pixelated;cursor:grab;max-width:80vw;max-height:100vh}
#side{padding:12px;min-width:180px}label{display:block;margin:8px 0 2px}
input,select{width:160px}</style></head><body>
<img id=img draggable=false>
<div id=side>
  <div id=stat>starting...</div>
  <label>sampler <select id=sampler>
    <option>path</option><option>pathdirect</option><option>pathmis</option>
    <option>eyelight</option><option>naive</option><option>falsecolor</option>
  </select></label>
  <label>resolution <input id=resolution type=number value=RES></label>
  <label>samples <input id=samples type=number value=SPP></label>
  <label>bounces <input id=bounces type=number value=BNC></label>
  <label>exposure <input id=exposure type=range min=-4 max=4 step=0.1
     value=0></label>
  <button id=apply>apply</button>
  <hr><b>material</b>
  <label><select id=mat></select></label>
  <label>color <input id=mcolor placeholder="r g b"></label>
  <label>emission <input id=memission placeholder="r g b"></label>
  <label>roughness <input id=mrough type=number step=0.05></label>
  <label>metallic <input id=mmetal type=number step=0.05></label>
  <button id=mapply>apply material</button>
  <p>drag: orbit - shift-drag: pan - wheel: dolly</p>
</div><script>
const img=document.getElementById('img'),stat=document.getElementById('stat');
let sceneInfo=null;
async function loadScene(){
  sceneInfo=await (await fetch('/scene')).json();
  const sel=document.getElementById('mat');
  sel.innerHTML=sceneInfo.materials.map(
    m=>`<option value=${m.index}>${m.name}</option>`).join('');
  sel.onchange=fillMat;fillMat();
}
function fillMat(){
  const m=sceneInfo.materials[+document.getElementById('mat').value||0];
  if(!m)return;
  document.getElementById('mcolor').value=m.color.join(' ');
  document.getElementById('memission').value=m.emission.join(' ');
  document.getElementById('mrough').value=m.roughness;
  document.getElementById('mmetal').value=m.metallic;
}
document.getElementById('mapply').onclick=()=>{
  const v=id=>document.getElementById(id).value;
  send({material:{index:+v('mat'),
    color:v('mcolor').split(/\\s+/).map(Number),
    emission:v('memission').split(/\\s+/).map(Number),
    roughness:+v('mrough'),metallic:+v('mmetal')}}).then(loadScene);};
loadScene();
let seq=-1;
async function poll(){
  try{
    const r=await fetch('/frame?seq='+seq);
    if(r.ok){seq=+r.headers.get('X-Seq');
      stat.textContent=r.headers.get('X-Samples')+' spp';
      const b=await r.blob();img.src=URL.createObjectURL(b);}
  }catch(e){await new Promise(s=>setTimeout(s,500));}
  poll();
}
poll();
async function send(cmd){await fetch('/api',{method:'POST',
  body:JSON.stringify(cmd)});}
let drag=null;
img.onmousedown=e=>{drag=[e.clientX,e.clientY,e.shiftKey];};
window.onmouseup=()=>{drag=null;};
window.onmousemove=e=>{if(!drag)return;
  const dx=(e.clientX-drag[0])/200,dy=(e.clientY-drag[1])/200;
  drag=[e.clientX,e.clientY,drag[2]];
  send(drag[2]?{pan:[-dx,dy]}:{orbit:[dx,dy]});};
img.onwheel=e=>{e.preventDefault();send({dolly:e.deltaY>0?0.1:-0.1});};
document.getElementById('exposure').oninput=e=>send({exposure:+e.target.value});
document.getElementById('apply').onclick=()=>send({params:{
  sampler:document.getElementById('sampler').value,
  resolution:+document.getElementById('resolution').value,
  samples:+document.getElementById('samples').value,
  bounces:+document.getElementById('bounces').value}});
</script></body></html>"""


class ViewerServer:
    """Progressive viewer server around a TraceContext."""

    def __init__(self, scene, params):
        from ..trace.progressive import make_trace_context, trace_start

        self.scene = scene
        self.params = params
        self.exposure = 0.0
        self.orbit = Orbit(scene.cameras[params.camera])
        self.lock = threading.Lock()
        self.seq = 0
        self.preview_img = None
        self.host_img = np.zeros(
            (max(1, params.resolution), max(1, params.resolution), 4),
            np.float32)
        self.host_samples = 0
        self.cond = threading.Condition()
        self.ctx = make_trace_context(scene, params)
        trace_start(self.ctx)
        self._tick = threading.Thread(target=self._ticker, daemon=True)
        self._tick.start()

    def _ticker(self):
        """The only thread besides the render worker that touches jax:
        snapshots the device accumulator to host memory so HTTP handler
        threads serve pure-NumPy data."""
        from ..trace.progressive import get_current_image
        last = -1
        while True:
            time.sleep(0.2)
            try:
                with self.lock:
                    ctx = self.ctx
                    pv = self.preview_img
                s = int(ctx.state.samples) if ctx.state is not None else 0
                if s == last and pv is None:
                    continue
                img = pv if pv is not None else get_current_image(ctx)
                with self.lock:
                    self.host_img = np.asarray(img)
                    self.host_samples = s
                last = s
                self._bump()
            except Exception:
                time.sleep(0.5)

    def _bump(self):
        with self.cond:
            self.seq += 1
            self.cond.notify_all()

    def frame(self, seq, timeout=15.0):
        """Long-poll: wait for a newer frame than `seq` (jax-free)."""
        with self.cond:
            self.cond.wait_for(lambda: self.seq != seq, timeout=timeout)
            cur = self.seq
        with self.lock:
            img = self.host_img
            samples = self.host_samples
        return cur, samples, _tonemap_png(img, self.exposure)

    def _restart(self, preview=True):
        """cancel -> preview -> restart (apps/ytrace.cpp:189-204)."""
        from dataclasses import replace

        from ..trace.progressive import (make_trace_context, trace_cancel,
                                         trace_preview, trace_start)

        trace_cancel(self.ctx)
        cam = self.scene.cameras[self.params.camera]
        cam.frame = self.orbit.frame()
        cam.focus = self.orbit.focus()
        if preview:
            pv = trace_preview(self.scene, self.params)
            with self.lock:
                self.preview_img = pv
                self.host_img = np.asarray(pv)
            self._bump()
        ctx = make_trace_context(self.scene, self.params)
        with self.lock:
            self.ctx = ctx
            self.preview_img = None
        trace_start(ctx)

    def command(self, cmd: dict):
        if "orbit" in cmd:
            self.orbit.rotate(*cmd["orbit"])
            self._restart()
        elif "pan" in cmd:
            self.orbit.pan(*cmd["pan"])
            self._restart()
        elif "dolly" in cmd:
            self.orbit.dolly(cmd["dolly"])
            self._restart()
        elif "exposure" in cmd:
            self.exposure = float(cmd["exposure"])
            self._bump()
        elif "params" in cmd:
            from ..trace.params import SamplerType
            p = cmd["params"]
            if "sampler" in p:
                self.params.sampler = SamplerType[p["sampler"]]
            for key in ("resolution", "samples", "bounces"):
                if key in p:
                    setattr(self.params, key, int(p[key]))
            self._restart()
        elif "material" in cmd:
            self._edit_material(cmd["material"])
        elif "environment" in cmd:
            self._edit_environment(cmd["environment"])

    # -- scene edits (the reference trace GUI edits materials/cameras/
    #    environments live and restarts the render: apps/ytrace.cpp:233-247,
    #    yocto_gui.h:218-330). make_trace_context re-flattens the mutated
    #    SceneData, so one cancel->preview->restart round-trips the edit.
    def _edit_material(self, edit: dict):
        from ..models.scene import MaterialType
        idx = int(edit["index"])
        if not 0 <= idx < len(self.scene.materials):
            raise ValueError(f"material index {idx} out of range")
        mat = self.scene.materials[idx]
        if "type" in edit:
            mat.type = MaterialType[edit["type"]]
        for key in ("color", "emission", "scattering"):
            if key in edit:
                setattr(mat, key, np.asarray(edit[key], np.float32))
        for key in ("roughness", "metallic", "ior", "opacity", "trdepth",
                    "scanisotropy"):
            if key in edit:
                setattr(mat, key, float(edit[key]))
        self._restart()

    def _edit_environment(self, edit: dict):
        idx = int(edit["index"])
        if not 0 <= idx < len(self.scene.environments):
            raise ValueError(f"environment index {idx} out of range")
        env = self.scene.environments[idx]
        if "emission" in edit:
            env.emission = np.asarray(edit["emission"], np.float32)
        self._restart()

    def scene_summary(self) -> dict:
        """JSON-able edit surface: what the sidebar's scene panel shows."""
        def name(names, i, kind):
            return names[i] if i < len(names) else f"{kind}{i}"
        mats = []
        for i, m in enumerate(self.scene.materials):
            mats.append({
                "index": i,
                "name": name(self.scene.material_names, i, "material"),
                "type": m.type.name,
                "color": np.asarray(m.color, np.float32).tolist(),
                "emission": np.asarray(m.emission, np.float32).tolist(),
                "roughness": float(m.roughness),
                "metallic": float(m.metallic),
                "opacity": float(m.opacity)})
        envs = []
        for i, e in enumerate(self.scene.environments):
            envs.append({
                "index": i,
                "name": name(self.scene.environment_names, i, "env"),
                "emission": np.asarray(e.emission, np.float32).tolist()})
        return {"materials": mats, "environments": envs,
                "cameras": list(self.scene.camera_names)}

    def page(self):
        return (_PAGE.replace("RES", str(self.params.resolution))
                .replace("SPP", str(self.params.samples))
                .replace("BNC", str(self.params.bounces)))


def serve(scene, params, port: int = 8080, open_browser: bool = False):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    viewer = ViewerServer(scene, params)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path.startswith("/frame"):
                seq = -1
                if "seq=" in self.path:
                    try:
                        seq = int(self.path.split("seq=")[1].split("&")[0])
                    except ValueError:
                        pass
                cur, samples, png = viewer.frame(seq)
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("X-Seq", str(cur))
                self.send_header("X-Samples", str(samples))
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)
            elif self.path.startswith("/scene"):
                body = json.dumps(viewer.scene_summary()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                body = viewer.page().encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        def do_POST(self):
            # a malformed command must return an error response, not kill
            # the handler thread (ADVICE r3: unvalidated JSON indices)
            try:
                n = int(self.headers.get("Content-Length", 0))
                cmd = json.loads(self.rfile.read(n) or b"{}")
                viewer.command(cmd)
            except Exception as exc:
                body = json.dumps({"error": str(exc)}).encode()
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            self.send_response(204)
            self.end_headers()

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    print(f"yview: serving on http://127.0.0.1:{port}")
    if open_browser:
        import webbrowser
        webbrowser.open(f"http://127.0.0.1:{port}")
    server.serve_forever()


def main(argv=None):
    parser = argparse.ArgumentParser(
        "yview", description="view scenes interactively")
    parser.add_argument("--scene", required=True)
    parser.add_argument("--output", default="out.png",
                        help="non-interactive eyelight render target")
    parser.add_argument("--camera", default="")
    parser.add_argument("--resolution", type=int, default=512)
    parser.add_argument("--samples", type=int, default=64)
    parser.add_argument("--bounces", type=int, default=4)
    parser.add_argument("--sampler", default="path")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--interactive", action="store_true", default=True)
    parser.add_argument("--no-interactive", dest="interactive",
                        action="store_false")
    args = parser.parse_args(argv)

    from ..io.sceneio import (add_missing_lights, add_missing_material,
                              load_scene)
    from ..models.tesselate import tesselate_subdivs
    from ..trace.params import SamplerType, TraceParams

    scene = load_scene(args.scene)
    add_missing_material(scene)
    add_missing_lights(scene)
    tesselate_subdivs(scene)
    camera = 0
    if args.camera:
        camera = scene.camera_names.index(args.camera)
    params = TraceParams(
        camera=camera, resolution=args.resolution, samples=args.samples,
        bounces=args.bounces, sampler=SamplerType[args.sampler])

    if not args.interactive:
        # raster-preview role: one eyelight frame (apps/yview.cpp:40-74)
        from ..io.imageio import save_image
        from ..trace.renderer import Renderer, get_image
        pv = TraceParams(camera=camera, resolution=args.resolution,
                         samples=4, bounces=4,
                         sampler=SamplerType.eyelight)
        img = get_image(Renderer(scene, pv).render())
        save_image(args.output, img, linear=True)
        print(f"saved {args.output}")
        return 0

    serve(scene, params, port=args.port)
    return 0


if __name__ == "__main__":
    sys.exit(main())
