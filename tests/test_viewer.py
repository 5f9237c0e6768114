"""Interactive HTTP viewer (the GLFW/ImGui window analog): serves the page,
renders frames, handles primitive insertion."""

import urllib.request

from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.renderer import GaussianRayTracer
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene
from gaussian_ray_tracing_tpu.viewer import serve

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def test_viewer_serves_frames():
    tracer = GaussianRayTracer(
        scene=random_scene(1000, seed=0),
        config=RenderConfig(hit_multiplicity=1, order="key"),
    )
    srv = serve(tracer, port=0, width=64, height=48, block=False)
    try:
        port = srv.server_address[1]
        get = lambda path: urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=120
        ).read()
        assert b"gaussian-ray-tracing-tpu" in get("/")
        assert get("/frame?az=30&el=10&r=3")[:8] == PNG_MAGIC
        assert get("/frame?az=0&el=0&r=3&fisheye=1")[:8] == PNG_MAGIC
        get("/add?kind=plane")
        assert get("/frame?az=0&el=0&r=3&type=normal")[:8] == PNG_MAGIC
        get("/clear")
        assert b'"prims": 0' in get("/info")
    finally:
        srv.shutdown()


def test_viewer_transform_edit_changes_render():
    """Gizmo parity (gui.cpp:374-438): translate/rotate/scale a primitive
    through the HTTP edit endpoint, drive update_instance_transform, and
    verify the rendered frame actually changes; remove restores it."""
    import json

    tracer = GaussianRayTracer(
        scene=random_scene(800, seed=0),
        config=RenderConfig(hit_multiplicity=1, order="key"),
    )
    srv = serve(tracer, port=0, width=64, height=48, block=False)
    try:
        port = srv.server_address[1]
        get = lambda path: urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=300
        ).read()
        get("/add?kind=plane")
        base = get("/frame?az=0&el=0&r=3&type=normal")
        t0 = json.loads(get("/prims"))["prims"][0]["transform"]
        get("/edit?i=0&op=translate&dx=0.4")
        t1 = json.loads(get("/prims"))["prims"][0]["transform"]
        assert abs(t1[0][3] - (t0[0][3] + 0.4)) < 1e-5
        moved = get("/frame?az=0&el=0&r=3&type=normal")
        assert moved != base  # the edit is visible
        get("/edit?i=0&op=rotate&axis=y&deg=30")
        get("/edit?i=0&op=scale&f=1.5")
        t2 = json.loads(get("/prims"))["prims"][0]["transform"]
        assert t2 != t1
        # shift-drag gizmo + camera pan endpoints respond sensibly
        get("/edit?i=0&op=drag&px=20&py=0&az=0&el=0&r=3")
        pan = json.loads(get("/pan?px=30&py=0&az=0&el=0&r=3&cx=0&cy=0&cz=0"))
        assert pan["cx"] != 0.0
        panned = get("/frame?az=0&el=0&r=3&cx=0.5")
        assert panned[:8] == PNG_MAGIC
        get("/remove?i=0")
        assert b'"prims": 0' in get("/info")
    finally:
        srv.shutdown()


def test_viewer_obj_upload():
    """OBJ insert through the viewer (createLoadMesh analog)."""
    import json

    tracer = GaussianRayTracer(
        scene=random_scene(500, seed=1),
        config=RenderConfig(hit_multiplicity=1, order="key"),
    )
    srv = serve(tracer, port=0, width=48, height=32, block=False)
    try:
        port = srv.server_address[1]
        obj = b"v -1 -1 0\nv 1 -1 0\nv 0 1 0\nf 1 2 3\n"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/upload", data=obj, method="POST"
        )
        body = json.loads(urllib.request.urlopen(req, timeout=120).read())
        assert body["index"] == 0
        info = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/info", timeout=120
        ).read()
        assert b'"prims": 1' in info
        frame = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame?az=0&el=0&r=3&type=normal",
            timeout=300,
        ).read()
        assert frame[:8] == PNG_MAGIC
    finally:
        srv.shutdown()
