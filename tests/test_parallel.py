import pytest as _pytest_slowmark
pytestmark = _pytest_slowmark.mark.slow
"""Multi-device tests on the 8-device virtual CPU mesh (BASELINE config 5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_ray_tracing_tpu.cameras import Camera, generate_rays
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.gaussian_model import GaussianModel
from gaussian_ray_tracing_tpu.models.oracle import render_oracle, render_rays_oracle
from gaussian_ray_tracing_tpu.models.tiled import render_tiled
from gaussian_ray_tracing_tpu.parallel.mesh import make_mesh, make_mesh_2d, GAUSS_AXIS
from gaussian_ray_tracing_tpu.parallel.sharded import (
    render_gaussian_sharded,
    render_rays_sharded_oracle,
    render_tiled_sharded,
)
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene
from gaussian_ray_tracing_tpu.train.trainer import TrainState, make_train_step, default_optimizer
from gaussian_ray_tracing_tpu.utils.image import psnr

CFG = RenderConfig(hit_multiplicity=1)
CAM = Camera.create(eye=(0, 0.3, 2.7), lookat=(0, 0, 0), width=64, height=48)


@pytest.fixture(scope="module")
def scene():
    # small: multi-device tests run 8 virtual devices on very few host cores
    return random_scene(600, seed=21, mean_scale=0.03, density_scaling=False)


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_ray_sharded_oracle_matches_single(scene):
    origins, dirs, _ = generate_rays(CAM, CFG)
    o, d = origins.reshape(-1, 3), dirs.reshape(-1, 3)
    ref_rgb, ref_den, _ = render_rays_oracle(scene, o, d, CFG)
    mesh = make_mesh(8)
    rgb, den, _ = render_rays_sharded_oracle(scene, o, d, CFG, mesh)
    # different chunking => different float fusion; hits exactly at the
    # alpha_min / min_transmittance gates may flip, so compare statistically
    assert psnr(np.asarray(ref_rgb), np.asarray(rgb)) > 55.0
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref_rgb), atol=2e-2)
    np.testing.assert_allclose(np.asarray(den), np.asarray(ref_den), atol=2e-2)


def test_tiled_sharded_matches_single(scene):
    ref = render_tiled(scene, CAM, CFG)
    mesh = make_mesh(8)
    out = render_tiled_sharded(scene, CAM, CFG, mesh)
    assert psnr(np.asarray(ref["rgb"]), np.asarray(out["rgb"])) > 55.0
    np.testing.assert_allclose(
        np.asarray(out["rgb"]), np.asarray(ref["rgb"]), atol=2e-2
    )


def test_gaussian_slab_sharded_close_to_oracle(scene):
    ref = render_oracle(scene, CAM, CFG)
    mesh = make_mesh(8, axis=GAUSS_AXIS)
    out = render_gaussian_sharded(scene, CAM, CFG, mesh)
    p = psnr(np.asarray(ref["rgb"]), np.asarray(out["rgb"]))
    assert p >= 40.0, f"slab-sharded vs oracle PSNR {p:.1f}"


def test_gaussian_slab_2d_mesh(scene):
    mesh2 = make_mesh_2d(4, 2)
    out = render_gaussian_sharded(scene, CAM, CFG, mesh2)
    ref = render_oracle(scene, CAM, CFG)
    p = psnr(np.asarray(ref["rgb"]), np.asarray(out["rgb"]))
    assert p >= 40.0, f"2d-mesh PSNR {p:.1f}"


def test_sharded_train_step_matches_single_device(scene):
    # keep the per-shard march tiny: 8 virtual devices share a few host
    # cores, and XLA's CPU collective rendezvous aborts if shards take
    # longer than its 40 s timeout to reach the psum
    cfg = CFG.replace(max_per_tile=128)
    cam = Camera.create(eye=(0, 0.3, 2.7), lookat=(0, 0, 0), width=64, height=32)
    model = GaussianModel.from_scene(
        random_scene(100, seed=5, mean_scale=0.05, density_scaling=False)
    )
    target = jnp.zeros((cam.height, cam.width, 3)).at[:, :, 0].set(0.5)
    tx = default_optimizer(1e-2)

    step_single = make_train_step(cfg, tx, mesh=None)
    step_sharded = make_train_step(cfg, tx, mesh=make_mesh(8))

    s0 = TrainState.create(model, tx)
    s1, m1 = step_single(s0, cam, target)
    s2, m2 = step_sharded(s0, cam, target)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s1.params.means), np.asarray(s2.params.means), atol=1e-4
    )
    # ZeRO-1 analog: the adam moments came back SHARDED over 'rays' on the
    # gaussian axis — each device holds 1/8 of the optimizer memory
    n = model.means.shape[0]
    moment_leaves = [
        x for x in jax.tree_util.tree_leaves(s2.opt_state)
        if isinstance(x, jnp.ndarray) and x.ndim >= 1 and x.shape[0] == n
    ]
    assert moment_leaves, "no slot-axis optimizer state found"
    for x in moment_leaves:
        shard = x.addressable_shards[0].data
        assert shard.shape[0] == n // 8, (
            f"moment leaf {x.shape} not sharded: shard {shard.shape}"
        )
    # loss decreases over a few steps
    s, prev = s2, float(m2["loss"])
    for _ in range(3):
        s, m = step_sharded(s, cam, target)
    assert float(m["loss"]) < prev


def test_pallas_sharded_matches_single():
    """Fused-Pallas forward with tiles sharded over 'rays' is bit-identical
    to the single-device kernel (pure ray data parallelism)."""
    from gaussian_ray_tracing_tpu.models.pallas_renderer import render_pallas
    from gaussian_ray_tracing_tpu.parallel.sharded import render_pallas_sharded

    scene = random_scene(2000, seed=3)
    cam = Camera.create(eye=(0.0, 0.2, 2.6), lookat=(0.0, 0.0, 0.0),
                        width=96, height=64)
    mesh = make_mesh(8)
    # bit-identity holds when binning is deterministic across program
    # shapes; the conic cull's borderline m < -margin decisions round
    # differently under the global vs per-shard-banded binning programs
    # (XLA fuses them differently), so it is pinned at float tolerance
    cfg = CFG.replace(order="key", conic_cull=False)
    a = render_pallas(scene, cam, cfg, pair_capacity=100_000)
    b = render_pallas_sharded(scene, cam, cfg, mesh, pair_capacity=100_000)
    np.testing.assert_array_equal(np.asarray(a["rgb"]), np.asarray(b["rgb"]))
    np.testing.assert_array_equal(np.asarray(a["alpha"]), np.asarray(b["alpha"]))
    cfg = CFG.replace(order="key")
    a = render_pallas(scene, cam, cfg, pair_capacity=100_000)
    b = render_pallas_sharded(scene, cam, cfg, mesh, pair_capacity=100_000)
    np.testing.assert_allclose(np.asarray(a["rgb"]), np.asarray(b["rgb"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a["alpha"]), np.asarray(b["alpha"]),
                               atol=1e-5)


def test_gaussian_sharded_fast_matches_oracle_slabs():
    """Fast depth-slab sharding reproduces the oracle slab decomposition."""
    from gaussian_ray_tracing_tpu.parallel.sharded import (
        render_gaussian_sharded,
        render_gaussian_sharded_fast,
    )
    from gaussian_ray_tracing_tpu.utils.image import psnr

    scene = random_scene(1500, seed=3)
    cam = Camera.create(eye=(0.0, 0.2, 2.6), lookat=(0.0, 0.0, 0.0),
                        width=64, height=32)
    cfg = CFG.replace(order="window", max_per_tile=4096)
    mesh = make_mesh(8, axis=GAUSS_AXIS)
    a = render_gaussian_sharded(scene, cam, cfg, mesh)
    b = render_gaussian_sharded_fast(scene, cam, cfg, mesh, pair_capacity=100_000)
    assert float(psnr(a["rgb"], b["rgb"])) > 45.0


def test_gaussian_slab_exact_straddlers_dense():
    """straddle="exact" removes the slab-order quality loss on a DENSE
    scene whose gaussians straddle the depth cuts: every hit event is
    composited by the one slab owning its per-ray view depth, so the fold
    is exactly per-ray ordered (VERDICT round-1 weak item 6)."""
    from gaussian_ray_tracing_tpu.parallel.sharded import (
        render_gaussian_sharded_fast,
    )

    # large scales => iso ellipsoids much wider than a slab's depth extent
    scene = random_scene(800, seed=7, mean_scale=0.12, density_scaling=False)
    cam = Camera.create(eye=(0.0, 0.2, 2.6), lookat=(0.0, 0.0, 0.0),
                        width=64, height=32)
    # march_chunk >= max_per_tile: the within-slab window sort is a full
    # per-ray argsort, so the only decomposition error is the straddle rule
    cfg = CFG.replace(order="window", max_per_tile=2048, march_chunk=2048)
    ref = render_oracle(scene, cam, cfg)
    mesh = make_mesh(8, axis=GAUSS_AXIS)
    ex = render_gaussian_sharded_fast(
        scene, cam, cfg, mesh, pair_capacity=100_000, straddle="exact",
        overlap_capacity=448,
    )
    assert int(ex["n_straddle_dropped"]) == 0
    p_ex = float(psnr(np.asarray(ref["rgb"]), np.asarray(ex["rgb"])))
    sl = render_gaussian_sharded_fast(scene, cam, cfg, mesh,
                                      pair_capacity=100_000)
    p_sl = float(psnr(np.asarray(ref["rgb"]), np.asarray(sl["rgb"])))
    assert p_ex >= 40.0, f"exact-straddle vs oracle PSNR {p_ex:.1f}"
    assert p_ex > p_sl, (
        f"exact {p_ex:.1f} dB should beat slab-order {p_sl:.1f} dB on a "
        "dense straddling scene"
    )


def test_gaussian_ring_matches_allgather_fold():
    """Ring exchange (ppermute ray blocks; two carried partials) computes
    the same image as the all_gather slab fold, without ever gathering
    the slab partials."""
    from gaussian_ray_tracing_tpu.parallel.sharded import (
        render_gaussian_ring,
        render_gaussian_sharded_fast,
    )

    scene = random_scene(1500, seed=3)
    cam = Camera.create(eye=(0.0, 0.2, 2.6), lookat=(0.0, 0.0, 0.0),
                        width=64, height=32)
    cfg = CFG.replace(order="window", max_per_tile=4096)
    mesh = make_mesh(8, axis=GAUSS_AXIS)
    a = render_gaussian_sharded_fast(scene, cam, cfg, mesh, pair_capacity=100_000)
    b = render_gaussian_ring(scene, cam, cfg, mesh, pair_capacity=100_000)
    np.testing.assert_allclose(
        np.asarray(b["rgb"]), np.asarray(a["rgb"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(b["alpha"]), np.asarray(a["alpha"]), atol=2e-5
    )


def test_pallas_sharded_diff_grads_match_single():
    """Sharded fused-kernel training grads (hand-written backward per shard,
    psum by shard_map transpose) match single device to f32 regrouping
    tolerance.

    NOT bit-exact, by design: the single-device backward accumulates every
    pair's gradient contribution in one scatter-add over the full stream,
    while the sharded backward scatter-adds each shard's sub-stream and then
    psums across shards — a different summation tree over the same f32
    terms. Forcing one association order would serialize the cross-shard
    reduction; the observed divergence is <= ~2e-7 abs on O(1e-2) grads
    (last-ulp regrouping noise), which the tolerance below pins.
    """
    from gaussian_ray_tracing_tpu.models.gaussian_model import GaussianModel
    from gaussian_ray_tracing_tpu.models.pallas_renderer import render_pallas_diff
    from gaussian_ray_tracing_tpu.parallel.sharded import render_pallas_sharded_diff

    cfg = CFG.replace(order="key")
    model = GaussianModel.from_scene(random_scene(600, seed=6))
    cam = Camera.create(eye=(0.0, 0.2, 2.6), lookat=(0.0, 0.0, 0.0),
                        width=64, height=32)
    target = jnp.full((32, 64, 3), 0.3, jnp.float32)
    mesh = make_mesh(8)

    gs = jax.grad(lambda m: jnp.mean(
        (render_pallas_sharded_diff(m.activate(), cam, cfg, mesh,
                                    pair_capacity=100_000)["rgb"] - target) ** 2
    ))(model)
    g1 = jax.grad(lambda m: jnp.mean(
        (render_pallas_diff(m.activate(), cam, cfg,
                            pair_capacity=100_000)["rgb"] - target) ** 2
    ))(model)
    for f in ("means", "log_scales", "raw_quats", "raw_opacities", "sh"):
        a = np.asarray(getattr(gs, f))
        b = np.asarray(getattr(g1, f))
        # f32 regrouping tolerance: the measured divergence is last-ulp
        # noise (<= ~2e-7 abs); atol=5e-7 pins it while still catching any
        # real gradient bug (grads here are O(1e-2)).
        np.testing.assert_allclose(a, b, rtol=3e-5, atol=5e-7)


def test_pallas_slabs_ring_matches_gather_and_scales_binning():
    """The PRODUCTION-kernel slab decomposition: render_pallas_slabs
    comm="ring" (ppermute ray blocks, two carried partials) matches
    comm="gather" (all_gather + ordered fold) to float-regrouping
    tolerance, both match the single-device Pallas render at slab-fold
    quality, and the per-shard binned pair count scales ~1/n_dev (no
    replicated binning stage)."""
    from gaussian_ray_tracing_tpu.models.pallas_renderer import render_pallas
    from gaussian_ray_tracing_tpu.parallel.sharded import render_pallas_slabs
    from gaussian_ray_tracing_tpu.utils.image import psnr

    scene = random_scene(1500, seed=3)
    cam = Camera.create(eye=(0.0, 0.2, 2.6), lookat=(0.0, 0.0, 0.0),
                        width=64, height=32)
    cfg = CFG.replace(order="window", march_chunk=64)
    mesh = make_mesh(8, axis=GAUSS_AXIS)
    g = render_pallas_slabs(scene, cam, cfg, mesh, pair_capacity=65_536,
                            comm="gather")
    r = render_pallas_slabs(scene, cam, cfg, mesh, pair_capacity=65_536,
                            comm="ring")
    assert int(g["n_dropped"]) == 0 and int(r["n_dropped"]) == 0
    # ring vs gather differ only in the front*back regrouping (~1 ulp) and
    # the gather fold's cumprod association
    np.testing.assert_allclose(np.asarray(r["rgb"]), np.asarray(g["rgb"]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(r["alpha"]), np.asarray(g["alpha"]),
                               atol=2e-5)
    # same slab decomposition as the tiled slab renderer (straddle="slab"):
    # the kernels differ only in march implementation
    from gaussian_ray_tracing_tpu.parallel.sharded import (
        render_gaussian_sharded_fast,
    )

    ts = render_gaussian_sharded_fast(scene, cam, cfg.replace(
        max_per_tile=4096), mesh, pair_capacity=65_536)
    assert float(psnr(ts["rgb"], r["rgb"])) > 40.0
    # vs the single-device production kernel the decomposition itself costs
    # quality on this dense straddling scene (slab-order compositing,
    # PERF.md) — sanity floor only; straddle-exact windows are the tiled
    # path's remedy (test_gaussian_slab_exact_straddlers_dense)
    a = render_pallas(scene, cam, cfg, pair_capacity=200_000)
    assert float(psnr(a["rgb"], r["rgb"])) > 30.0
    # 1/n binning-scaling witness: the largest shard binned well under the
    # full frame's pairs (each slab bins only its own gaussians)
    assert int(r["pairs_max_shard"]) * 4 < int(r["n_pairs"]), (
        int(r["pairs_max_shard"]), int(r["n_pairs"]))
