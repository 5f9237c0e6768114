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
