"""Precompute full-frame ORACLE goldens for the parity suite.

Produces data/golden/*.npz (float16 rgb + alpha + provenance metadata).
The oracle (models/oracle.py) is the exact per-ray-ordered reference
semantics (shaders/tracer.cuh:328-373); these goldens replace the
48x48-crop golden with full-frame, full-config evidence:

  pinhole_720p   1280x720 pinhole, 20k synthetic scene, hm=1
  fisheye_720    720x720 equisolid fisheye (blanked r>1 ring,
                 shaders/tracer.cuh:153-161), same scene
  hm2_360p       640x360 pinhole with hit_multiplicity=2 (the reference
                 config default: icosahedron hulls report 2 hits)
  bench_540p     960x540 pinhole on the BENCH scene (100k) — the headline
                 config's parity witness at scale

O(N*R) on one CPU core: run in background (an hour-plus for bench_540p).
Usage: python scripts/make_goldens.py [names...]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from gaussian_ray_tracing_tpu.cameras import Camera
from gaussian_ray_tracing_tpu.config import CameraModel, RenderConfig
from gaussian_ray_tracing_tpu.models.oracle import render_oracle
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "data", "golden")

GOLDENS = {
    "pinhole_720p": dict(n=20_000, seed=3, width=1280, height=720,
                         fisheye=False, hm=1),
    "fisheye_720": dict(n=20_000, seed=3, width=720, height=720,
                        fisheye=True, hm=1),
    "hm2_360p": dict(n=20_000, seed=3, width=640, height=360,
                     fisheye=False, hm=2),
    # the reference's true default config (double-hull anyhits,
    # src/GaussianTracer.cpp:355-360) at its default resolution
    # (src/main.cpp:65-66) — VERDICT r3 item 9
    "hm2_720p": dict(n=20_000, seed=3, width=1280, height=720,
                     fisheye=False, hm=2),
    "bench_540p": dict(n=100_000, seed=0, width=960, height=540,
                       fisheye=False, hm=1),
    # CPU-runnable golden tier (VERDICT r4 item 6): every camera/hm config
    # of the full-frame set at 256^2, small enough that the un-slow-marked
    # parity tests (tests/test_golden_small.py) finish in seconds on a
    # stock CPU host — so full-config parity is asserted on every pytest
    # run, not only by the on-chip bench gate
    "small_pinhole_256": dict(n=5_000, seed=3, width=256, height=256,
                              fisheye=False, hm=1),
    "small_fisheye_256": dict(n=5_000, seed=3, width=256, height=256,
                              fisheye=True, hm=1),
    "small_hm2_256": dict(n=5_000, seed=3, width=256, height=256,
                          fisheye=False, hm=2),
}


def main():
    names = sys.argv[1:] or list(GOLDENS)
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        spec = GOLDENS[name]
        path = os.path.join(OUT, f"{name}.npz")
        config = RenderConfig(
            hit_multiplicity=spec["hm"],
            camera_model=(CameraModel.FISHEYE if spec["fisheye"]
                          else CameraModel.PINHOLE),
        )
        scene = random_scene(spec["n"], seed=spec["seed"])
        camera = Camera.create(
            eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
            width=spec["width"], height=spec["height"],
        )
        print(f"{name}: oracle {spec['width']}x{spec['height']} "
              f"n={spec['n']} hm={spec['hm']} fisheye={spec['fisheye']}",
              flush=True)
        out = render_oracle(scene, camera, config, ray_chunk=2048)
        rgb = np.asarray(out["rgb"], np.float16)
        alpha = np.asarray(out["alpha"], np.float16)
        np.savez_compressed(
            path, rgb=rgb, alpha=alpha,
            meta=np.array(
                [spec["n"], spec["seed"], spec["width"], spec["height"],
                 spec["hm"], int(spec["fisheye"])], np.int64,
            ),
        )
        print(f"  wrote {path} rgb_mean={rgb.mean():.4f}", flush=True)


if __name__ == "__main__":
    main()
