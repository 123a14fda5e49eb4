"""Interactive tonemap/colorgrade editor (web GUI).

The reference's show_colorgrade_gui / show_image_gui
(/root/reference/libs/yocto/yocto_gui.cpp:420,520) and the
`--interactive` branches of apps/ytonemap.cpp:60-125 and
apps/ycolorgrade.cpp:50-150 open an OpenGL window with parameter widgets
that re-grade the displayed image per edit. The TPU equivalent follows
yview's architecture: a stdlib HTTP server long-polls PNG frames; one
worker thread owns jax and re-grades the resident device image through
the fully-traced `colorgrade_dynamic` chain (ONE compile; every slider
edit is data, not a retrace); handler threads serve pure NumPy.
"""

from __future__ import annotations

import io
import json
import threading

import numpy as np

from ..ops.color import ColorgradeParams, colorgrade_params_vector

_FIELDS_TONEMAP = ("exposure", "filmic", "srgb")
_SLIDERS = (
    ("exposure", -4.0, 4.0),
    ("lincontrast", 0.0, 1.0), ("logcontrast", 0.0, 1.0),
    ("linsaturation", 0.0, 1.0), ("contrast", 0.0, 1.0),
    ("saturation", 0.0, 1.0), ("shadows", 0.0, 1.0),
    ("midtones", 0.0, 1.0), ("highlights", 0.0, 1.0),
)

_PAGE = """<!doctype html><html><head><title>TITLE</title><style>
body{margin:0;background:#111;color:#ddd;font:13px sans-serif;display:flex}
#img{image-rendering:auto;max-width:78vw;max-height:100vh}
#side{padding:12px;min-width:220px}label{display:block;margin:8px 0 2px}
input[type=range]{width:200px}</style></head><body>
<img id=img><div id=side><div id=stat>loading...</div>SLIDERS
<label><input id=filmic type=checkbox> filmic</label>
<label><input id=srgb type=checkbox checked> srgb</label>
<button id=reset>reset</button></div><script>
const img=document.getElementById('img');let seq=-1;
async function poll(){
  try{const r=await fetch('/frame?seq='+seq);
    if(r.ok){seq=+r.headers.get('X-Seq');
      const b=await r.blob();img.src=URL.createObjectURL(b);
      document.getElementById('stat').textContent='graded';}}
  catch(e){await new Promise(s=>setTimeout(s,500));}
  poll();}
poll();
async function send(){
  const cmd={};
  for(const el of document.querySelectorAll('input[type=range]'))
    cmd[el.id]=+el.value;
  cmd.filmic=document.getElementById('filmic').checked;
  cmd.srgb=document.getElementById('srgb').checked;
  await fetch('/api',{method:'POST',body:JSON.stringify(cmd)});}
for(const el of document.querySelectorAll('input'))el.oninput=send;
document.getElementById('reset').onclick=()=>{
  for(const el of document.querySelectorAll('input[type=range]'))
    el.value=el.dataset.def;
  document.getElementById('filmic').checked=false;
  document.getElementById('srgb').checked=true;send();};
</script></body></html>"""


def _slider_html(fields):
    rows = []
    for name, lo, hi in _SLIDERS:
        if fields is not None and name not in fields:
            continue
        default = getattr(ColorgradeParams(), name)
        rows.append(
            f'<label>{name} <input id={name} type=range min={lo} max={hi}'
            f' step=0.01 value={default} data-def={default}></label>')
    return "\n".join(rows)


def _png_bytes(arr_u8: np.ndarray) -> bytes:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr_u8, "RGB").save(buf, "PNG")
    return buf.getvalue()


class GradeServer:
    """Owns the image on device; re-grades per edit in a worker thread.

    `tonemap_only=True` restricts the UI to ytonemap's surface
    (exposure/filmic/srgb); the full panel mirrors show_colorgrade_gui's
    widget set."""

    def __init__(self, pixels: np.ndarray, linear: bool,
                 tonemap_only: bool = False, title: str = "ycolorgrade"):
        import jax
        import jax.numpy as jnp
        from ..ops.color import colorgrade_dynamic

        self.linear = bool(linear)
        self.tonemap_only = tonemap_only
        self.title = title
        self.params = ColorgradeParams()
        self.lock = threading.Lock()
        self.cond = threading.Condition()
        self.seq = 0
        self.host_png = None
        self._dirty = threading.Event()
        self._dirty.set()
        self._device_img = jnp.asarray(
            np.asarray(pixels, np.float32).reshape(
                pixels.shape[0], pixels.shape[1], -1))

        def make_grade(filmic, srgb):
            @jax.jit
            def g(img, vec):
                out = colorgrade_dynamic(img, self.linear, vec,
                                         filmic=filmic, srgb=srgb)
                return jnp.clip(out[..., :3] * 256.0, 0.0,
                                255.0).astype(jnp.uint8)
            return g

        self._grades = {}
        self._make_grade = make_grade
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _run(self):
        """The only thread that touches jax."""
        while True:
            self._dirty.wait()
            self._dirty.clear()
            with self.lock:
                p = ColorgradeParams(**vars(self.params))
            key = (bool(p.filmic), bool(p.srgb))
            if key not in self._grades:
                self._grades[key] = self._make_grade(*key)
            import jax.numpy as jnp
            vec = jnp.asarray(colorgrade_params_vector(p))
            arr = np.asarray(self._grades[key](self._device_img, vec))
            png = _png_bytes(arr)
            with self.cond:
                self.host_png = png
                self.seq += 1
                self.cond.notify_all()

    def command(self, cmd: dict):
        with self.lock:
            for key, val in cmd.items():
                if hasattr(self.params, key):
                    cur = getattr(self.params, key)
                    if isinstance(cur, bool):
                        val = bool(val)
                    elif isinstance(cur, tuple):
                        val = tuple(float(v) for v in val)
                    else:
                        val = float(val)
                    setattr(self.params, key, val)
        self._dirty.set()

    def frame(self, seq, timeout=15.0):
        with self.cond:
            self.cond.wait_for(
                lambda: self.seq != seq and self.host_png is not None,
                timeout=timeout)
            return self.seq, self.host_png or b""

    def page(self):
        fields = _FIELDS_TONEMAP if self.tonemap_only else None
        return (_PAGE.replace("TITLE", self.title)
                .replace("SLIDERS", _slider_html(fields)))

    def graded_image(self) -> np.ndarray:
        """Current grade applied at float precision (for saving)."""
        import jax.numpy as jnp
        from ..ops.color import colorgrade_dynamic
        with self.lock:
            p = ColorgradeParams(**vars(self.params))
        vec = jnp.asarray(colorgrade_params_vector(p))
        return np.asarray(colorgrade_dynamic(
            self._device_img, self.linear, vec,
            filmic=bool(p.filmic), srgb=bool(p.srgb)))


def serve_grade(pixels, linear, port: int = 8080, tonemap_only=False,
                title="ycolorgrade"):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    server_obj = GradeServer(pixels, linear, tonemap_only=tonemap_only,
                             title=title)

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
                cur, png = server_obj.frame(seq)
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("X-Seq", str(cur))
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)
            else:
                body = server_obj.page().encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            server_obj.command(json.loads(self.rfile.read(n) or b"{}"))
            self.send_response(204)
            self.end_headers()

    httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    print(f"{title}: serving on http://127.0.0.1:{port}")
    httpd.serve_forever()
