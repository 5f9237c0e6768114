"""Top-level rendering API.

`render()` dispatches between the oracle, the tiled fast path, the Pallas
kernel path, and the mesh-bounce tracer. `GaussianRayTracer` is the
stateful host-side runtime with the same capabilities as the reference's
GaussianTracer (src/GaussianTracer.h:30-56): scene loading, camera updates,
primitive insert/remove/transform, render-type selection, rendering.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from gaussian_ray_tracing_tpu.cameras import Camera
from gaussian_ray_tracing_tpu.config import CameraModel, MeshType, RenderConfig
from gaussian_ray_tracing_tpu.models.mesh_tracer import render_with_mesh
from gaussian_ray_tracing_tpu.models.oracle import render_oracle
from gaussian_ray_tracing_tpu.models.tiled import render_tiled
from gaussian_ray_tracing_tpu.scene.gaussians import GaussianScene
from gaussian_ray_tracing_tpu.scene.mesh import (
    TriangleMesh,
    load_obj,
    make_plane,
    make_sphere,
    merge_meshes,
)


def render(
    scene: GaussianScene,
    camera: Camera,
    config: RenderConfig = RenderConfig(),
    mesh: Optional[TriangleMesh] = None,
    method: str = "auto",
    pair_capacity: int | None = None,
    return_aux: bool = False,
    supersample: int = 1,
):
    """Render a frame. method: auto | oracle | tiled | pallas.

    supersample=N renders at NxN sub-pixel resolution and box-filters down
    — anti-aliasing the reference lacks (one ray per pixel,
    tracer.cu:17-110; 3DGRUT adds MSAA-style filtering). Ray-traced
    supersampling is exact for any camera model, including distorted ones.
    """
    if supersample > 1:
        import jax.numpy as jnp

        s = int(supersample)
        hi = Camera.create(
            eye=camera.eye, lookat=camera.lookat, up=camera.up,
            fov_y_deg=camera.fov_y_deg,
            width=camera.width * s, height=camera.height * s,
        )
        out = render(scene, hi, config, mesh=mesh, method=method,
                     pair_capacity=pair_capacity, return_aux=return_aux)
        H, W = camera.height, camera.width
        out["rgb"] = jnp.mean(
            out["rgb"].reshape(H, s, W, s, 3), axis=(1, 3)
        )
        out["alpha"] = jnp.mean(
            out["alpha"].reshape(H, s, W, s), axis=(1, 3)
        )
        return out
    if mesh is not None:
        return render_with_mesh(scene, mesh, camera, config)
    if method == "auto":
        import jax

        on_tpu = jax.default_backend() == "tpu"
        method = "pallas" if (config.use_pallas or on_tpu) else "tiled"
    if method == "oracle":
        return render_oracle(scene, camera, config)
    if method == "tiled":
        return render_tiled(
            scene, camera, config, pair_capacity=pair_capacity,
            return_aux=return_aux,
        )
    if method == "pallas":
        from gaussian_ray_tracing_tpu.models.pallas_renderer import render_pallas

        return render_pallas(
            scene, camera, config, pair_capacity=pair_capacity,
            return_aux=return_aux,
        )
    raise ValueError(f"unknown method {method}")


class GaussianRayTracer:
    """Stateful runtime mirroring the reference's GaussianTracer interface.

    Capability parity (src/GaussianTracer.h:30-56): construct from a PLY,
    set size / camera, insert plane/sphere/OBJ primitives in front of the
    camera, re-transform or remove them, pick the render type, and render
    frames. Per-frame work is jit-compiled; scene edits only re-merge the
    (small) mesh soup on the host.
    """

    def __init__(self, ply_path: str | None = None, scene: GaussianScene | None = None,
                 config: RenderConfig = RenderConfig()):
        if scene is None:
            if ply_path is None:
                raise ValueError("need ply_path or scene")
            from gaussian_ray_tracing_tpu.scene.ply import load_ply

            scene = load_ply(ply_path)
        self.scene = scene
        self.config = config
        self.primitives: list[TriangleMesh] = []
        # pair-capacity bucket, refreshed from observed pair counts
        self._pair_capacity: int | None = None
        self.width = 1280
        self.height = 720
        self.camera = Camera.create(
            eye=(0.0, 0.0, 3.0), lookat=np.asarray(scene.center()), width=self.width,
            height=self.height,
        )

    # --- size & camera (main.cpp:68, GaussianTracer.cpp:540-551) ---
    def set_size(self, width: int, height: int):
        self.width, self.height = width, height
        self.camera = Camera.create(
            eye=np.asarray(self.camera.eye), lookat=np.asarray(self.camera.lookat),
            up=np.asarray(self.camera.up), fov_y_deg=self.camera.fov_y_deg,
            width=width, height=height,
        )

    def update_camera(self, camera: Camera):
        self.camera = camera

    # --- primitive management (GaussianTracer.cpp:578-651,711-736) ---
    def _spawn_position(self):
        """New primitives appear at 0.75*eye + 0.25*lookat (GaussianTracer.cpp:580-588)."""
        eye = np.asarray(self.camera.eye)
        lookat = np.asarray(self.camera.lookat)
        return 0.75 * eye + 0.25 * lookat

    def _with_type(self, mesh: TriangleMesh, mesh_type) -> TriangleMesh:
        if mesh_type is None:
            return mesh  # follow the global config.mesh_type
        if isinstance(mesh_type, str):
            mesh_type = MeshType[mesh_type.upper()]
        return mesh.with_type(mesh_type)

    def create_plane(self, mesh_type: MeshType | str | None = None) -> int:
        """Insert a plane; mesh_type pins this primitive's material
        (mirror/glass/normal) independently of the global render type —
        an extension over the reference's single scene-wide MeshType."""
        self.primitives.append(
            self._with_type(make_plane(self._spawn_position()), mesh_type)
        )
        return len(self.primitives) - 1

    def create_sphere(self, tess_u: int = 180, tess_v: int = 90,
                      mesh_type: MeshType | str | None = None) -> int:
        self.primitives.append(self._with_type(
            make_sphere(self._spawn_position(), tess_u=tess_u, tess_v=tess_v),
            mesh_type,
        ))
        return len(self.primitives) - 1

    def create_load_mesh(self, path: str,
                         mesh_type: MeshType | str | None = None) -> int:
        self.primitives.append(
            self._with_type(load_obj(path, self._spawn_position()), mesh_type)
        )
        return len(self.primitives) - 1

    def update_instance_transform(self, index: int, transform):
        self.primitives[index] = self.primitives[index].with_transform(transform)

    def remove_primitive(self, index: int):
        self.primitives.pop(index)

    def set_render_type(self, mesh_type: MeshType | str):
        if isinstance(mesh_type, str):
            mesh_type = MeshType[mesh_type.upper()]
        self.config = self.config.replace(mesh_type=mesh_type)

    def set_camera_model(self, model: CameraModel | str):
        if isinstance(model, str):
            model = CameraModel(model)
        self.config = self.config.replace(camera_model=model)

    # --- rendering ---
    def render(self, method: str = "auto", supersample: int = 1):
        """Render the current frame.

        Pair capacity is auto-bucketed from the previous frame's emitted
        pair count (recompiles only when the power-of-two bucket changes),
        so static scenes pay no slack in the sort/gather stages and growing
        scenes never silently drop pairs two frames in a row."""
        mesh = merge_meshes(self.primitives) if self.primitives else None
        if mesh is not None:
            return render(self.scene, self.camera, self.config, mesh=mesh,
                          method=method, supersample=supersample)
        out = render(
            self.scene, self.camera, self.config, method=method,
            pair_capacity=self._pair_capacity, return_aux=True,
            supersample=supersample,
        )
        aux = out.pop("aux", None)
        if aux is not None and method != "oracle":
            n = int(aux["n_pairs"])
            want = 1 << max(16, int(n * 1.3).bit_length())
            if want != self._pair_capacity:
                self._pair_capacity = want
        return out

    def render_rgb8(self, method: str = "auto", supersample: int = 1) -> np.ndarray:
        """RGB8 quantized frame (shaders/tracer.cuh:484-496)."""
        from gaussian_ray_tracing_tpu.utils.image import quantize_rgb8

        out = self.render(method=method, supersample=supersample)
        return quantize_rgb8(np.asarray(out["rgb"]))
