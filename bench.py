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

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
vs_baseline is the fraction of the BASELINE.json north-star target of
1 Grays/s per chip (the reference publishes no numbers of its own,
BASELINE.md). "extra" carries secondary rows measured in the same run so
regressions outside the headline config are visible in BENCH_r*.json:
fisheye Mrays/s, trained-scene Mrays/s (data/fitted_20k.ply), and the
full train-step ms (fused forward + hand-written backward + adam).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from gaussian_ray_tracing_tpu.cameras import Camera
from gaussian_ray_tracing_tpu.config import CameraModel, RenderConfig
from gaussian_ray_tracing_tpu.models.renderer import render
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

WIDTH, HEIGHT = 1280, 720
N_GAUSSIANS = 100_000
NORTH_STAR_MRAYS = 1000.0  # 1 Grays/s/chip (BASELINE.json)


def _time_loop(frame, k=8, reps=4, samples=None):
    """Seconds/frame of `frame(i) -> scalar` via the fori-loop methodology
    (min over reps; a 1-frame loop's time is subtracted as dispatch).

    Tunnel jitter is strictly additive, so min is the estimator; pass a
    list as `samples` to also receive every rep's seconds/frame so the
    spread (tunnel variance) is visible in the output."""

    def loop(n):
        return jax.jit(
            lambda: jax.lax.fori_loop(0, n, lambda i, a: a + frame(i), 0.0)
        )

    fk, f1 = loop(k), loop(1)
    v = float(fk())  # compile + warm
    assert v == v, "non-finite output"
    float(f1())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fk())
        tk = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f1())
        t1 = time.perf_counter() - t0
        spf = max((tk - t1) / (k - 1), 1e-9)
        if samples is not None:
            samples.append(spf)
        best = min(best, spf)
    return best


def _snug_capacity(scene, camera, config, method):
    """64k-multiple pair-capacity bucket with ~20% slack, verified
    drop-free (silently dropped pairs would fake a speedup)."""
    from gaussian_ray_tracing_tpu.models.tiled import default_pair_capacity

    cap = default_pair_capacity(scene.num_gaussians)
    for _ in range(3):
        aux = render(scene, camera, config, method=method,
                     pair_capacity=cap, return_aux=True)["aux"]
        n = int(aux["n_pairs"])
        want = -(-int(n * 1.2) // 65536) * 65536
        if int(aux["n_dropped"]) == 0 and want >= cap:
            return cap
        if int(aux["n_dropped"]) == 0:
            return want
        cap = max(want, cap * 2)
    raise AssertionError(f"could not find drop-free capacity: {aux}")


def _mrays(scene, camera, config, method, cap, samples=None):
    eye0 = jnp.asarray(camera.eye)

    def frame(i):
        cam = Camera.create(
            eye=eye0 + jnp.array([0.002, 0.0, 0.0]) * i,
            lookat=(0.0, 0.0, 0.0),
            width=camera.width, height=camera.height,
        )
        out = render(scene, cam, config, method=method, pair_capacity=cap)
        return out["rgb"].mean()

    dt = _time_loop(frame, samples=samples)
    return camera.width * camera.height / dt / 1e6


def _train_step_ms(method_is_pallas: bool):
    """Full train-step time (512x512, 50k gaussians): fused forward +
    hand-written backward + adam, snug pair bucket (PERF.md methodology)."""
    from gaussian_ray_tracing_tpu.models.gaussian_model import GaussianModel
    from gaussian_ray_tracing_tpu.train.trainer import (
        TrainState,
        default_optimizer,
        make_train_step,
    )

    config = RenderConfig(hit_multiplicity=1, order="key")
    scene = jax.device_put(random_scene(50_000, seed=1))
    camera = Camera.create(eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                           width=512, height=512)
    cap = _snug_capacity(scene, camera, config,
                         "pallas" if method_is_pallas else "tiled")
    target = render(scene, camera, config,
                    method="pallas" if method_is_pallas else "tiled",
                    pair_capacity=cap)["rgb"]
    tx = default_optimizer()
    step = make_train_step(config, tx, use_pallas=method_is_pallas,
                           pair_capacity=cap)
    state0 = TrainState.create(GaussianModel.from_scene(scene), tx)

    def k_steps(k):
        @jax.jit
        def run():
            def body(i, s):
                s2, m = step(s, camera, target)
                return s2
            s = jax.lax.fori_loop(0, k, body, state0)
            return s.params.means.mean()
        return run

    k = 4
    fk, f1 = k_steps(k), k_steps(1)
    v = float(fk())
    assert v == v
    float(f1())
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(fk())
        tk = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f1())
        t1 = time.perf_counter() - t0
        best = min(best, max((tk - t1) / (k - 1), 1e-9))
    return best * 1e3


def main():
    for attempt in range(3):
        try:
            return _run()
        except Exception as e:  # tunneled TPU workers occasionally drop
            if attempt == 2:
                raise
            print(f"# bench attempt {attempt + 1} failed ({type(e).__name__}); retrying",
                  file=sys.stderr)


def _run():
    # parity-grade config: window-ordered march (PSNR >= 40 vs the exact
    # oracle, the BASELINE "forward parity" bar). march_chunk=128 halves
    # the per-ray sort window: 42.6 dB on the adversarial scene (the 256
    # window gives 43.1) and ~1.4x the throughput; chunk=64 (38 dB) is
    # below the parity bar. order="key" is faster still at
    # sorted-splatting quality (~30 dB).
    config = RenderConfig(hit_multiplicity=1, order="window", march_chunk=128)
    on_tpu = jax.default_backend() == "tpu"
    method = "pallas" if on_tpu else "tiled"
    scene = jax.device_put(random_scene(N_GAUSSIANS, seed=0))

    cam0 = Camera.create(eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                         width=WIDTH, height=HEIGHT)
    # capacity sanity: nothing may be silently dropped at this size
    cap = _snug_capacity(scene, cam0, config, method)
    hs = []
    mrays = _mrays(scene, cam0, config, method, cap, samples=hs)

    extra = {}
    if hs:  # headline spread: per-rep Mrays/s so tunnel variance is visible
        rr = sorted(WIDTH * HEIGHT / s / 1e6 for s in hs)
        extra["headline_mrays_reps"] = [round(v, 2) for v in rr]
        extra["headline_mrays_median"] = round(rr[len(rr) // 2], 2)
    try:  # fisheye row (equisolid, blanked r>1 ring, tracer.cuh:153-161)
        fcam = Camera.create(eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                             width=768, height=768)
        # fisheye parity config: window/128 — the round-4 exact cone-cap
        # footprints cut dead pairs enough that the 128-candidate sort
        # window clears the bar (45.4 dB vs the fisheye_720 golden;
        # window/256 was needed at 40.3 dB with the old loose rects)
        fcfg = config.replace(camera_model=CameraModel.FISHEYE)
        fcap = _snug_capacity(scene, fcam, fcfg, method)
        extra["fisheye_768_mrays"] = round(
            _mrays(scene, fcam, fcfg, method, fcap), 2
        )
    except Exception as e:
        extra["fisheye_768_mrays"] = f"failed: {type(e).__name__}"
    try:  # trained-scene row (real PLY, lighter pair load than synthetic)
        ply = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "data", "fitted_20k.ply")
        if os.path.exists(ply):
            from gaussian_ray_tracing_tpu.scene.ply import load_ply

            tscene = jax.device_put(load_ply(ply))
            tcap = _snug_capacity(tscene, cam0, config, method)
            extra["trained_720p_mrays"] = round(
                _mrays(tscene, cam0, config, method, tcap), 2
            )
            # full view-dependent color: SH degree 3 (the reference ships
            # degree 0-3 eval, shaders/tracer.cuh:216-258; the PLY carries
            # all 16 coefficients) — "full SH" as a measured config
            s3cfg = config.replace(sh_degree=3)
            s3cap = _snug_capacity(tscene, cam0, s3cfg, method)
            extra["trained_720p_sh3_mrays"] = round(
                _mrays(tscene, cam0, s3cfg, method, s3cap), 2
            )
    except Exception as e:
        extra["trained_720p_mrays"] = f"failed: {type(e).__name__}"
    try:  # reference-default config row: hit_multiplicity=2 at 720p
        # (double-hull anyhits, src/GaussianTracer.cpp:355-360; the
        # reference's own default, src/main.cpp:65-66) with its golden
        # parity assertion when data/golden/hm2_720p.npz exists
        import numpy as np

        h2cfg = config.replace(hit_multiplicity=2)
        h2cap = _snug_capacity(scene, cam0, h2cfg, method)
        extra["hm2_720p_mrays"] = round(
            _mrays(scene, cam0, h2cfg, method, h2cap), 2
        )
        g2path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "data", "golden", "hm2_720p.npz")
        if os.path.exists(g2path):
            from gaussian_ray_tracing_tpu.scene.synthetic import random_scene as _rs
            from gaussian_ray_tracing_tpu.utils.image import psnr as _psnr

            gz2 = np.load(g2path)
            n2, seed2, w2, h2, hm2, _ = [int(v) for v in gz2["meta"]]
            gscene2 = jax.device_put(_rs(n2, seed=seed2))
            gcam2 = Camera.create(eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                                  width=w2, height=h2)
            gcfg2 = config.replace(hit_multiplicity=hm2)
            gcap2 = _snug_capacity(gscene2, gcam2, gcfg2, method)
            out2 = render(gscene2, gcam2, gcfg2, method=method,
                          pair_capacity=gcap2)["rgb"]
            p2 = float(_psnr(np.asarray(gz2["rgb"], np.float32),
                             np.asarray(out2)))
            extra["psnr_vs_golden_hm2"] = round(p2, 2)
            assert p2 >= 40.0, f"hm2 production-path PSNR {p2:.1f} < 40"
    except AssertionError:
        raise
    except Exception as e:
        extra["hm2_720p_mrays"] = f"failed: {type(e).__name__}"
    try:  # train-step row (fused fwd + hand-written bwd + adam, 512^2/50k)
        extra["train_step_512_50k_ms"] = round(_train_step_ms(on_tpu), 2)
    except Exception as e:
        extra["train_step_512_50k_ms"] = f"failed: {type(e).__name__}"
    try:
        # full-frame parity of the PRODUCTION path on THIS hardware: the
        # same pallas config renders the stored 720p oracle golden's scene
        # and must clear the PSNR >= 40 parity bar (the golden is the
        # exact per-ray-ordered reference semantics, tracer.cuh:328-373)
        import numpy as np

        gpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "data", "golden", "pinhole_720p.npz")
        if os.path.exists(gpath):
            from gaussian_ray_tracing_tpu.utils.image import psnr

            gz = np.load(gpath)
            n_g, seed_g, w_g, h_g, hm_g, fe_g = [int(v) for v in gz["meta"]]
            gscene = jax.device_put(random_scene(n_g, seed=seed_g))
            gcam = Camera.create(eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                                 width=w_g, height=h_g)
            gcfg = config.replace(hit_multiplicity=hm_g)
            gcap = _snug_capacity(gscene, gcam, gcfg, method)
            out = render(gscene, gcam, gcfg, method=method,
                         pair_capacity=gcap)["rgb"]
            p = float(psnr(np.asarray(gz["rgb"], np.float32),
                           np.asarray(out)))
            extra["psnr_vs_golden"] = round(p, 2)
            assert p >= 40.0, f"production-path PSNR {p:.1f} < 40 vs oracle"
    except AssertionError:
        raise
    except Exception as e:
        extra["psnr_vs_golden"] = f"failed: {type(e).__name__}"

    print(
        json.dumps(
            {
                "metric": f"forward Mrays/s/chip (pinhole {WIDTH}x{HEIGHT}, "
                f"{N_GAUSSIANS} gaussians, {method})",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
