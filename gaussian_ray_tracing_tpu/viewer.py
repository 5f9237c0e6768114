"""Browser-based interactive viewer.

The TPU-native stand-in for the reference's GLFW/ImGui window
(src/gui.{h,cpp}): a TPU pod has no display stack, so interaction runs over
HTTP — a self-contained HTML page (no external assets) with mouse-drag
orbit / wheel zoom (gui.cpp:199-256 semantics), fisheye toggle
(gui.cpp:188-191), render-type selection and primitive insertion
(gui.cpp:319-438), fetching freshly rendered PNG frames from the tracer.

Stdlib-only (http.server); state lives in a GaussianRayTracer.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>gaussian-ray-tracing-tpu</title><style>
body { margin:0; background:#111; color:#ddd; font:13px monospace; }
#bar { padding:6px 10px; } img { display:block; margin:auto; cursor:grab; }
button, select { background:#222; color:#ddd; border:1px solid #444; margin-right:6px; }
</style></head><body>
<div id="bar">
 <button onclick="toggle('fisheye')">fisheye</button>
 <select id="mtype" onchange="refresh()">
   <option value="">no mesh</option><option value="mirror">mirror</option>
   <option value="glass">glass</option><option value="normal">normal</option>
 </select>
 <button onclick="addPrim('plane')">+plane</button>
 <button onclick="addPrim('sphere')">+sphere</button>
 <button onclick="clearPrims()">clear</button>
 <span id="stat"></span>
</div>
<img id="view" width="640" height="360"/>
<script>
let az = 0, el = 15, r = 3.0, fisheye = 0, busy = false, pending = false;
let interacting = false, settleTimer = null;
const img = document.getElementById('view');
function url() {
  const t = document.getElementById('mtype').value;
  const s = interacting ? 2 : 1;  // progressive: half-res while dragging
  return `/frame?az=${az}&el=${el}&r=${r}&fisheye=${fisheye}&s=${s}` + (t ? `&type=${t}` : '');
}
function settleSoon() {
  if (settleTimer) clearTimeout(settleTimer);
  settleTimer = setTimeout(() => { interacting = false; refresh(); }, 200);
}
function refresh() {
  if (busy) { pending = true; return; }
  busy = true;
  const t0 = performance.now();
  const u = url() + `&_=${Date.now()}`;
  const next = new Image();
  next.onload = () => {
    img.src = next.src; busy = false;
    document.getElementById('stat').textContent =
      `az ${az.toFixed(0)} el ${el.toFixed(0)} r ${r.toFixed(2)} — ${(performance.now()-t0).toFixed(0)} ms`;
    if (pending) { pending = false; refresh(); }
  };
  next.src = u;
}
function toggle(k) { fisheye = 1 - fisheye; refresh(); }
function addPrim(kind) { fetch('/add?kind=' + kind).then(refresh); }
function clearPrims() { fetch('/clear').then(refresh); }
let drag = null;
img.onmousedown = e => { drag = [e.clientX, e.clientY]; e.preventDefault(); };
window.onmouseup = () => drag = null;
window.onmousemove = e => {
  if (!drag) return;
  interacting = true;
  az -= (e.clientX - drag[0]) * 0.5;
  el = Math.max(-89, Math.min(89, el + (e.clientY - drag[1]) * 0.5));
  drag = [e.clientX, e.clientY]; refresh(); settleSoon();
};
img.onwheel = e => {
  interacting = true;
  r *= Math.exp(e.deltaY * 0.001); refresh(); settleSoon(); e.preventDefault();
};
refresh();
</script></body></html>"""


def make_handler(tracer, width: int, height: int):
    from gaussian_ray_tracing_tpu.cameras import orbit_camera
    from gaussian_ray_tracing_tpu.utils.image import encode_png, quantize_rgb8

    lock = threading.Lock()
    center = np.asarray(tracer.scene.center())

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="text/html"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            if u.path == "/":
                self._send(200, _PAGE.encode())
            elif u.path == "/frame":
                with lock:
                    tracer.set_camera_model(
                        "fisheye" if q.get("fisheye") == "1" else "pinhole"
                    )
                    if q.get("type"):
                        tracer.set_render_type(q["type"])
                    # progressive resolution: s=2 while the user drags
                    # (gui-latency analog of the reference's interactive
                    # loop; the browser upscales to the display size)
                    s = max(1, min(4, int(float(q.get("s", 1)))))
                    cam = orbit_camera(
                        center,
                        float(q.get("r", 3.0)),
                        float(q.get("az", 0.0)),
                        float(q.get("el", 15.0)),
                        width=width // s,
                        height=height // s,
                    )
                    tracer.update_camera(cam)
                    mesh_on = bool(q.get("type")) and tracer.primitives
                    frame = tracer.render_rgb8() if mesh_on else quantize_rgb8(
                        np.asarray(tracer.render(method="auto")["rgb"])
                    )
                self._send(200, encode_png(frame), "image/png")
            elif u.path == "/add":
                with lock:
                    if q.get("kind") == "sphere":
                        tracer.create_sphere(tess_u=36, tess_v=18)
                    else:
                        tracer.create_plane()
                self._send(200, b"{}", "application/json")
            elif u.path == "/clear":
                with lock:
                    tracer.primitives.clear()
                self._send(200, b"{}", "application/json")
            elif u.path == "/info":
                body = json.dumps(
                    {"n": int(tracer.scene.num_active), "prims": len(tracer.primitives)}
                ).encode()
                self._send(200, body, "application/json")
            else:
                self._send(404, b"not found", "text/plain")

    return Handler


def serve(tracer, host: str = "127.0.0.1", port: int = 8800,
          width: int = 640, height: int = 360, block: bool = True):
    """Start the viewer. Returns the server (call .shutdown() when block=False)."""
    server = ThreadingHTTPServer((host, port), make_handler(tracer, width, height))
    print(f"viewer: http://{host}:{server.server_address[1]}/")
    if block:
        server.serve_forever()
    else:
        threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
