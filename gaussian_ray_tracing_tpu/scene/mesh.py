"""Triangle meshes for secondary-ray (mirror/normal/glass) effects.

TPU-native equivalent of the reference's reflection primitives
(src/geometry/Primitives.cpp): tessellated plane (0.3 x 0.5, 1x1 quads),
UV sphere (tessU=180, tessV=90, r=0.3), and OBJ loading with the reference's
Y-flip on positions and normals (Primitives.cpp:176-181).  Meshes carry a
4x4 transform; vertex normals are pre-transformed to world space by the
transform's upper 3x3 like the host upload does (src/GaussianTracer.cpp:659-663).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TriangleMesh:
    """World-space triangle soup: padded arrays, pytree-compatible.

    Attributes:
      vertices: (V, 3) object-space positions
      normals:  (V, 3) object-space vertex normals
      faces:    (F, 3) int32 vertex indices
      transform:(4, 4) object-to-world
      num_faces: active faces (rest is padding with degenerate zero-area tris)
    """

    vertices: jnp.ndarray
    normals: jnp.ndarray
    faces: jnp.ndarray
    transform: jnp.ndarray
    num_faces: int = dataclasses.field(default=0, metadata=dict(static=True))
    # per-face MeshType id, or None (= follow config.mesh_type). The
    # reference keys the WHOLE scene to one type (src/Parameters.h:80-85,
    # gui.cpp render-type selector); per-face types are an extension that
    # lets mirror/glass/normal primitives coexist in one scene. -1 entries
    # defer to config.mesh_type at trace time.
    face_types: jnp.ndarray | None = None

    def world_vertices(self) -> jnp.ndarray:
        # elementwise formulation keeps full f32 on TPU (matmul would take the
        # bf16 default-precision path)
        R = self.transform[:3, :3]
        v = self.vertices
        return (
            v[:, 0:1] * R[:, 0][None]
            + v[:, 1:2] * R[:, 1][None]
            + v[:, 2:3] * R[:, 2][None]
            + self.transform[:3, 3][None]
        )

    def world_normals(self) -> jnp.ndarray:
        """Normals transformed by mat3(transform) then normalized.

        The reference multiplies normals by the upper 3x3 (not its inverse
        transpose) and renormalizes (src/GaussianTracer.cpp:659-663) — exact
        for rotations and uniform scale; reproduced as-is.
        """
        R = self.transform[:3, :3]
        nv = self.normals
        n = (
            nv[:, 0:1] * R[:, 0][None]
            + nv[:, 1:2] * R[:, 1][None]
            + nv[:, 2:3] * R[:, 2][None]
        )
        return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)

    def with_transform(self, transform) -> "TriangleMesh":
        return dataclasses.replace(self, transform=jnp.asarray(transform, jnp.float32))

    def with_type(self, mesh_type) -> "TriangleMesh":
        """Stamp one material type on every face of this mesh."""
        ft = jnp.full((self.faces.shape[0],), int(mesh_type), jnp.int32)
        return dataclasses.replace(self, face_types=ft)


def _build(vertices, normals, faces, position, pad_faces: int | None = None) -> TriangleMesh:
    vertices = np.asarray(vertices, np.float32)
    normals = np.asarray(normals, np.float32)
    faces = np.asarray(faces, np.int32).reshape(-1, 3)
    nf = faces.shape[0]
    if pad_faces is not None and pad_faces > nf:
        faces = np.concatenate([faces, np.zeros((pad_faces - nf, 3), np.int32)], 0)
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = np.asarray(position, np.float32)
    return TriangleMesh(
        vertices=jnp.asarray(vertices),
        normals=jnp.asarray(normals),
        faces=jnp.asarray(faces),
        transform=jnp.asarray(t),
        num_faces=nf,
    )


def make_plane(position=(0.0, 0.0, 0.0), width=0.3, height=0.5, tess_u=1, tess_v=1) -> TriangleMesh:
    """Tessellated XY plane facing +Z (Primitives.cpp:6-61)."""
    u_tile, v_tile = width / tess_u, height / tess_v
    corner = np.array([-width * 0.5, -height * 0.5, 0.0], np.float32)
    verts, norms = [], []
    for j in range(tess_v + 1):
        for i in range(tess_u + 1):
            verts.append(corner + np.array([i * u_tile, j * v_tile, 0.0], np.float32))
            norms.append(np.array([0.0, 0.0, 1.0], np.float32))
    faces = []
    stride = tess_u + 1
    for j in range(tess_v):
        for i in range(tess_u):
            a, b = j * stride + i, j * stride + i + 1
            c, d = (j + 1) * stride + i + 1, (j + 1) * stride + i
            faces += [[a, b, c], [c, d, a]]
    return _build(verts, norms, faces, position)


def make_sphere(position=(0.0, 0.0, 0.0), radius=0.3, tess_u=180, tess_v=90) -> TriangleMesh:
    """UV sphere, south-pole-up ordering per Primitives.cpp:63-140."""
    phis = 2.0 * np.pi * np.arange(tess_u + 1) / tess_u
    thetas = np.pi * np.arange(tess_v) / (tess_v - 1)
    st, ct = np.sin(thetas)[:, None], np.cos(thetas)[:, None]
    sp, cp = np.sin(phis)[None, :], np.cos(phis)[None, :]
    normals = np.stack([cp * st, np.broadcast_to(ct, (tess_v, tess_u + 1)), sp * st], -1)
    normals = normals.reshape(-1, 3).astype(np.float32)
    verts = normals * radius
    cols = tess_u + 1
    faces = []
    for lat in range(tess_v - 1):
        for lon in range(tess_u):
            ll = lat * cols + lon
            lr = ll + 1
            ur = (lat + 1) * cols + lon + 1
            ul = (lat + 1) * cols + lon
            faces += [[ll, lr, ur], [ur, ul, ll]]
    return _build(verts, normals, faces, position)


def load_obj(path: str, position=(0.0, 0.0, 0.0)) -> TriangleMesh:
    """Minimal OBJ loader (v/vn/f), with the reference's Y-flip on positions
    and normals (Primitives.cpp:176-181). Faces are triangulated (fan)."""
    positions, normals_in = [], []
    tri_v, tri_n = [], []
    with open(path, "r") as f:
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                positions.append([float(t[1]), -float(t[2]), float(t[3])])
            elif t[0] == "vn":
                normals_in.append([float(t[1]), -float(t[2]), float(t[3])])
            elif t[0] == "f":
                refs = []
                for tok in t[1:]:
                    parts = tok.split("/")
                    vi = int(parts[0])
                    ni = int(parts[2]) if len(parts) > 2 and parts[2] else vi
                    refs.append((vi, ni))
                for k in range(1, len(refs) - 1):
                    tri_v.append((refs[0][0], refs[k][0], refs[k + 1][0]))
                    tri_n.append((refs[0][1], refs[k][1], refs[k + 1][1]))
    positions = np.asarray(positions, np.float32)
    normals_in = np.asarray(normals_in, np.float32) if normals_in else positions * 0
    verts, norms, faces = [], [], []
    # expand to unindexed soup (the reference emits one vertex per face corner,
    # Primitives.cpp:168-192)
    for fv, fn in zip(tri_v, tri_n):
        base = len(verts)
        for vi, ni in zip(fv, fn):
            verts.append(positions[(vi - 1) if vi > 0 else (len(positions) + vi)])
            if len(normals_in):
                norms.append(normals_in[(ni - 1) if ni > 0 else (len(normals_in) + ni)])
            else:
                norms.append(np.zeros(3, np.float32))
        faces.append([base, base + 1, base + 2])
    return _build(verts, norms, faces, position)


def merge_meshes(meshes: list[TriangleMesh]) -> TriangleMesh:
    """Bake world transforms and concatenate into one world-space mesh.

    Per-face material types are propagated; meshes without them get -1
    (defer to config.mesh_type). If no input carries types, the merged
    mesh's face_types stays None."""
    verts, norms, faces, types = [], [], [], []
    offset = 0
    any_types = any(m.face_types is not None for m in meshes)
    for m in meshes:
        v = np.asarray(m.world_vertices())
        n = np.asarray(m.world_normals())
        f = np.asarray(m.faces[: m.num_faces]) + offset
        offset += v.shape[0]
        verts.append(v)
        norms.append(n)
        faces.append(f)
        if any_types:
            if m.face_types is not None:
                types.append(np.asarray(m.face_types[: m.num_faces], np.int32))
            else:
                types.append(np.full((m.num_faces,), -1, np.int32))
    out = _build(np.concatenate(verts), np.concatenate(norms), np.concatenate(faces), (0, 0, 0))
    if any_types:
        out = dataclasses.replace(out, face_types=jnp.asarray(np.concatenate(types)))
    return out
