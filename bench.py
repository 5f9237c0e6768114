"""Headline benchmark: forward Mrays/s/chip, pinhole 1280x720 (the
reference's default resolution, src/main.cpp:65-66) on a synthetic
trained-like 100k-gaussian scene (no trained PLY ships with the reference;
README.md:9 downloads one externally).

Methodology: K full frames with per-frame camera motion are rendered inside
ONE jitted fori_loop and a scalar reduction is fetched; subtracting a
1-frame dispatch and dividing by K-1 removes both the host->device dispatch
overhead (tens of ms through tunneled transports, where
block_until_ready() does not actually block) and any risk of timing
unexecuted async work.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the fraction of the BASELINE.json north-star target of
1 Grays/s per chip (the reference publishes no numbers of its own,
BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax

from gaussian_ray_tracing_tpu.cameras import Camera
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.renderer import render
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

WIDTH, HEIGHT = 1280, 720
N_GAUSSIANS = 100_000
PAIR_CAPACITY = 1_216_000  # scene emits ~1.11M pairs with exact conic
# bboxes (checked at startup); sort/gather cost scales with capacity
NORTH_STAR_MRAYS = 1000.0  # 1 Grays/s/chip (BASELINE.json)


def main():
    for attempt in range(3):
        try:
            return _run()
        except Exception as e:  # tunneled TPU workers occasionally drop
            if attempt == 2:
                raise
            print(f"# bench attempt {attempt + 1} failed ({type(e).__name__}); retrying",
                  file=__import__("sys").stderr)


def _run():
    # parity-grade config: window-ordered march (PSNR >= 40 vs the exact
    # oracle, the BASELINE "forward parity" bar). march_chunk=128 halves
    # the per-ray sort window: 42.6 dB on the adversarial scene (the 256
    # window gives 43.1) and ~1.4x the throughput; chunk=64 (38 dB) is
    # below the parity bar. order="key" is faster still at
    # sorted-splatting quality (~30 dB).
    config = RenderConfig(hit_multiplicity=1, order="window", march_chunk=128)
    method = "pallas" if jax.default_backend() == "tpu" else "tiled"
    scene = jax.device_put(random_scene(N_GAUSSIANS, seed=0))

    # capacity sanity: nothing may be silently dropped at this size
    cam0 = Camera.create(eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                         width=WIDTH, height=HEIGHT)
    aux = render(scene, cam0, config, method=method,
                 pair_capacity=PAIR_CAPACITY, return_aux=True)["aux"]
    assert int(aux["n_dropped"]) == 0, f"pair capacity too small: {aux}"

    def frame(i):
        camera = Camera.create(
            eye=(0.002 * i, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
            width=WIDTH, height=HEIGHT,
        )
        out = render(scene, camera, config, method=method,
                     pair_capacity=PAIR_CAPACITY)
        return out["rgb"].mean()

    def loop(k):
        return jax.jit(
            lambda: jax.lax.fori_loop(0, k, lambda i, a: a + frame(i), 0.0)
        )

    k = 8
    fk, f1 = loop(k), loop(1)
    v = float(fk())  # compile + warm
    float(f1())
    best = float("inf")
    for _ in range(2):  # min-of-2: tunnel jitter is strictly additive
        t0 = time.perf_counter()
        float(fk())
        tk = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f1())
        t1 = time.perf_counter() - t0
        best = min(best, max((tk - t1) / (k - 1), 1e-9))
    dt = best

    mrays = WIDTH * HEIGHT / dt / 1e6
    assert v == v, "non-finite render output"
    print(
        json.dumps(
            {
                "metric": f"forward Mrays/s/chip (pinhole {WIDTH}x{HEIGHT}, "
                f"{N_GAUSSIANS} gaussians, {method})",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
