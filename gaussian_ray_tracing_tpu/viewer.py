"""Browser-based interactive viewer.

The TPU-native stand-in for the reference's GLFW/ImGui window
(src/gui.{h,cpp}): a TPU pod has no display stack, so interaction runs over
HTTP — a self-contained HTML page (no external assets) with mouse-drag
orbit / wheel zoom / WASD+right-drag pan (gui.cpp:136-256 semantics),
fisheye toggle (gui.cpp:188-191), render-type selection, primitive
insertion, OBJ upload, per-primitive translate/rotate/scale editing and
removal (gui.cpp:319-438 -> GaussianTracer.cpp:711-736 semantics, driving
update_instance_transform / remove_primitive), fetching freshly rendered
PNG frames from the tracer.

Stdlib-only (http.server); state lives in a GaussianRayTracer.
"""

from __future__ import annotations

import json
import math
import os
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>gaussian-ray-tracing-tpu</title><style>
body { margin:0; background:#111; color:#ddd; font:13px monospace; }
#bar, #edit { padding:6px 10px; } img { display:block; margin:auto; cursor:grab; }
button, select, input { background:#222; color:#ddd; border:1px solid #444; margin-right:4px; }
</style></head><body>
<div id="bar">
 <button onclick="toggle('fisheye')">fisheye</button>
 <select id="mtype" onchange="refresh()">
   <option value="">no mesh</option><option value="mirror">mirror</option>
   <option value="glass">glass</option><option value="normal">normal</option>
 </select>
 <button onclick="addPrim('plane')">+plane</button>
 <button onclick="addPrim('sphere')">+sphere</button>
 <input type="file" id="objfile" accept=".obj" style="width:170px"
        onchange="uploadObj(this)"/>
 <button onclick="clearPrims()">clear</button>
 <span id="stat"></span>
</div>
<div id="edit">
 <select id="prim" onchange="refresh()"></select>
 <button onclick="removePrim()">remove</button>
 move <button onclick="edit('translate',{dx:-GS})">-x</button><button
  onclick="edit('translate',{dx:GS})">+x</button><button
  onclick="edit('translate',{dy:-GS})">-y</button><button
  onclick="edit('translate',{dy:GS})">+y</button><button
  onclick="edit('translate',{dz:-GS})">-z</button><button
  onclick="edit('translate',{dz:GS})">+z</button>
 rot <button onclick="edit('rotate',{axis:'y',deg:-15})">&#8634;y</button><button
  onclick="edit('rotate',{axis:'y',deg:15})">&#8635;y</button><button
  onclick="edit('rotate',{axis:'x',deg:-15})">&#8634;x</button><button
  onclick="edit('rotate',{axis:'x',deg:15})">&#8635;x</button>
 scale <button onclick="edit('scale',{f:0.8})">-</button><button
  onclick="edit('scale',{f:1.25})">+</button>
 <span style="opacity:.6">(shift-drag moves the selected primitive;
  WASD/QE or right-drag pans the camera)</span>
</div>
<img id="view" width="640" height="360"/>
<script>
let az = 0, el = 15, r = 3.0, fisheye = 0, busy = false, pending = false;
let cx = 0, cy = 0, cz = 0;  // camera pan offset (world)
let interacting = false, settleTimer = null;
const GS = 0.25;  // gizmo step (world units)
const img = document.getElementById('view');
function url() {
  const t = document.getElementById('mtype').value;
  const s = interacting ? 2 : 1;  // progressive: half-res while dragging
  return `/frame?az=${az}&el=${el}&r=${r}&fisheye=${fisheye}&s=${s}` +
    `&cx=${cx}&cy=${cy}&cz=${cz}` + (t ? `&type=${t}` : '');
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
function syncPrims() {
  fetch('/prims').then(r => r.json()).then(d => {
    const sel = document.getElementById('prim');
    const keep = sel.value;
    sel.innerHTML = d.prims.map((p, i) =>
      `<option value="${i}">#${i} ${p.kind} (${p.faces}f)</option>`).join('');
    if (keep && keep < d.prims.length) sel.value = keep;
  });
}
function toggle(k) { fisheye = 1 - fisheye; refresh(); }
function addPrim(kind) { fetch('/add?kind=' + kind).then(() => { syncPrims(); refresh(); }); }
function clearPrims() { fetch('/clear').then(() => { syncPrims(); refresh(); }); }
function removePrim() {
  const i = document.getElementById('prim').value;
  if (i === '') return;
  fetch('/remove?i=' + i).then(() => { syncPrims(); refresh(); });
}
function edit(op, p) {
  const i = document.getElementById('prim').value;
  if (i === '') return;
  const q = Object.entries(p).map(([k, v]) => `${k}=${v}`).join('&');
  fetch(`/edit?i=${i}&op=${op}&${q}`).then(refresh);
}
function uploadObj(inp) {
  const f = inp.files[0];
  if (!f) return;
  f.text().then(txt => fetch('/upload', {method: 'POST', body: txt})
    .then(() => { syncPrims(); refresh(); }));
}
let drag = null, dragBtn = 0;
img.onmousedown = e => { drag = [e.clientX, e.clientY]; dragBtn = e.button;
                         e.preventDefault(); };
img.oncontextmenu = e => e.preventDefault();
window.onmouseup = () => drag = null;
window.onmousemove = e => {
  if (!drag) return;
  interacting = true;
  const dx = e.clientX - drag[0], dy = e.clientY - drag[1];
  if (e.shiftKey) {
    // gizmo drag: move the SELECTED PRIMITIVE in the view plane
    const i = document.getElementById('prim').value;
    if (i !== '') {
      fetch(`/edit?i=${i}&op=drag&px=${dx}&py=${dy}&az=${az}&el=${el}&r=${r}`)
        .then(refresh);
    }
  } else if (dragBtn === 2) {
    // pan: move the orbit center in the view plane (gui.cpp:136-197)
    fetch(`/pan?px=${dx}&py=${dy}&az=${az}&el=${el}&r=${r}&cx=${cx}&cy=${cy}&cz=${cz}`)
      .then(rs => rs.json()).then(d => { cx = d.cx; cy = d.cy; cz = d.cz; refresh(); });
  } else {
    az -= dx * 0.5;
    el = Math.max(-89, Math.min(89, el + dy * 0.5));
    refresh();
  }
  drag = [e.clientX, e.clientY]; settleSoon();
};
img.onwheel = e => {
  interacting = true;
  r *= Math.exp(e.deltaY * 0.001); refresh(); settleSoon(); e.preventDefault();
};
window.onkeydown = e => {
  const k = e.key.toLowerCase();
  const step = r * 0.05;
  const rad = az * Math.PI / 180;
  // camera-relative WASD on the ground plane + QE vertical
  const fwd = [-Math.sin(rad), 0, -Math.cos(rad)];
  const rgt = [Math.cos(rad), 0, -Math.sin(rad)];
  if (k === 'w') { cx += fwd[0]*step; cz += fwd[2]*step; }
  else if (k === 's') { cx -= fwd[0]*step; cz -= fwd[2]*step; }
  else if (k === 'a') { cx -= rgt[0]*step; cz -= rgt[2]*step; }
  else if (k === 'd') { cx += rgt[0]*step; cz += rgt[2]*step; }
  else if (k === 'q') { cy -= step; }
  else if (k === 'e') { cy += step; }
  else return;
  refresh();
};
syncPrims(); refresh();
</script></body></html>"""


def _rotation(axis: str, deg: float) -> np.ndarray:
    c, s = math.cos(math.radians(deg)), math.sin(math.radians(deg))
    m = np.eye(4, dtype=np.float32)
    i, j = {"x": (1, 2), "y": (2, 0), "z": (0, 1)}[axis]
    m[i, i] = c; m[i, j] = -s; m[j, i] = s; m[j, j] = c
    return m


def _camera_basis(az: float, el: float):
    """Right/up unit vectors of the orbit camera's view plane (matches
    cameras.orbit_camera's az/el convention)."""
    ar, er = math.radians(az), math.radians(el)
    fwd = -np.array([
        math.cos(er) * math.sin(ar), math.sin(er), math.cos(er) * math.cos(ar)
    ], np.float32)  # eye -> center
    world_up = np.array([0.0, 1.0, 0.0], np.float32)
    right = np.cross(fwd, world_up)
    right /= max(np.linalg.norm(right), 1e-6)
    up = np.cross(right, fwd)
    return right, up


def apply_edit(tracer, index: int, op: str, q: dict) -> None:
    """Compose a gizmo edit onto a primitive's instance transform
    (GaussianTracer.cpp:711-736 updateInstanceTransform analog)."""
    old = np.asarray(tracer.primitives[index].transform, np.float32)
    if op == "translate":
        d = np.eye(4, dtype=np.float32)
        d[:3, 3] = [float(q.get("dx", 0)), float(q.get("dy", 0)),
                    float(q.get("dz", 0))]
        new = d @ old
    elif op == "drag":
        # screen-space drag -> world translation in the camera view plane
        right, up = _camera_basis(float(q.get("az", 0)), float(q.get("el", 15)))
        scale = float(q.get("r", 3.0)) * 0.002  # px -> world
        t = (float(q.get("px", 0)) * right - float(q.get("py", 0)) * up) * scale
        d = np.eye(4, dtype=np.float32)
        d[:3, 3] = t
        new = d @ old
    elif op == "rotate":
        rot = _rotation(q.get("axis", "y"), float(q.get("deg", 0)))
        p = np.eye(4, dtype=np.float32); p[:3, 3] = old[:3, 3]
        pn = np.eye(4, dtype=np.float32); pn[:3, 3] = -old[:3, 3]
        new = p @ rot @ pn @ old  # rotate about the primitive's position
    elif op == "scale":
        f = float(q.get("f", 1.0))
        sc = np.diag([f, f, f, 1.0]).astype(np.float32)
        p = np.eye(4, dtype=np.float32); p[:3, 3] = old[:3, 3]
        pn = np.eye(4, dtype=np.float32); pn[:3, 3] = -old[:3, 3]
        new = p @ sc @ pn @ old  # scale about the primitive's position
    else:
        raise ValueError(f"unknown edit op {op}")
    tracer.update_instance_transform(index, new)


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

        def do_POST(self):
            u = urlparse(self.path)
            if u.path == "/upload":
                # OBJ text body -> insert as a primitive (createLoadMesh
                # analog, gui.cpp:331-339)
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                with tempfile.NamedTemporaryFile(
                    "wb", suffix=".obj", delete=False
                ) as f:
                    f.write(body)
                    path = f.name
                try:
                    with lock:
                        idx = tracer.create_load_mesh(path)
                finally:
                    os.unlink(path)
                self._send(200, json.dumps({"index": idx}).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

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
                    pan = np.array([
                        float(q.get("cx", 0)), float(q.get("cy", 0)),
                        float(q.get("cz", 0)),
                    ], np.float32)
                    cam = orbit_camera(
                        center + pan,
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
            elif u.path == "/prims":
                with lock:
                    prims = [
                        {
                            "kind": ("sphere" if p.num_faces > 500 else
                                     "plane" if p.num_faces == 2 else "mesh"),
                            "faces": int(p.num_faces),
                            "transform": np.asarray(p.transform).tolist(),
                        }
                        for p in tracer.primitives
                    ]
                self._send(200, json.dumps({"prims": prims}).encode(),
                           "application/json")
            elif u.path == "/edit":
                with lock:
                    apply_edit(tracer, int(q["i"]), q.get("op", "translate"), q)
                self._send(200, b"{}", "application/json")
            elif u.path == "/remove":
                with lock:
                    tracer.remove_primitive(int(q["i"]))
                self._send(200, b"{}", "application/json")
            elif u.path == "/pan":
                # view-plane pan: return the new orbit-center offset
                right, up = _camera_basis(
                    float(q.get("az", 0)), float(q.get("el", 15))
                )
                scale = float(q.get("r", 3.0)) * 0.002
                d = (-float(q.get("px", 0)) * right
                     + float(q.get("py", 0)) * up) * scale
                cur = np.array([
                    float(q.get("cx", 0)), float(q.get("cy", 0)),
                    float(q.get("cz", 0)),
                ], np.float32) + d
                self._send(
                    200,
                    json.dumps({"cx": float(cur[0]), "cy": float(cur[1]),
                                "cz": float(cur[2])}).encode(),
                    "application/json",
                )
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
