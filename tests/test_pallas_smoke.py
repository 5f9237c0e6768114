"""Default-subset Pallas kernel smoke test (NOT slow-marked).

The full kernel-parity suite (tests/test_pallas.py) is slow-marked, which
round 3 proved dangerous: `pytest -m "not slow"` exercised zero kernel
code, so a kernel-structure regression (the Mosaic-illegal lane-group
split) sailed through the default subset. This file keeps one small,
fast interpret-mode render of BOTH production orders in the default
subset. Interpret mode still cannot see Mosaic layout legality — the
on-chip gate is `cli warmup --assert` — but it does pin the kernel's
end-to-end semantics (binning -> DMA pipeline -> response -> ordering ->
composite) against the XLA tiled path on every default test run.
"""

import numpy as np

from gaussian_ray_tracing_tpu.cameras import Camera
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.pallas_renderer import render_pallas
from gaussian_ray_tracing_tpu.models.tiled import render_tiled
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene
from gaussian_ray_tracing_tpu.utils.image import psnr

CAM = Camera.create(eye=(0.0, 0.2, 2.6), lookat=(0.0, 0.0, 0.0),
                    width=96, height=64)
CAP = 65_536


def test_key_order_matches_tiled():
    """key order + quad response vs the tiled path on a small scene."""
    scene = random_scene(800, seed=5)
    cfg = RenderConfig(hit_multiplicity=1, order="key", max_per_tile=2048,
                       chunk_skip_transmittance=1e-3)  # tiled compare
    a = render_tiled(scene, CAM, cfg, pair_capacity=CAP)
    b = render_pallas(scene, CAM, cfg, pair_capacity=CAP, return_aux=True,
                      interpret=True)
    assert int(b["aux"]["n_dropped"]) == 0
    assert float(psnr(a["rgb"], b["rgb"])) > 60.0


def test_window_order_vs_tiled_window():
    """window order (the production bench config) runs the per-ray sort
    network path; parity vs the tiled window march."""
    scene = random_scene(800, seed=5)
    cfg = RenderConfig(hit_multiplicity=1, order="window", march_chunk=64,
                       chunk_skip_transmittance=1e-3,
                       max_per_tile=2048)
    a = render_tiled(scene, CAM, cfg, pair_capacity=CAP)
    b = render_pallas(scene, CAM, cfg, pair_capacity=CAP, interpret=True)
    assert float(psnr(a["rgb"], b["rgb"])) > 45.0
