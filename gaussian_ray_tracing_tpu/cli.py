"""Command-line interface.

Superset of the reference CLI (src/main.cpp:23-42: -p/--ply, --width,
--height) with subcommands: render (offline PNG instead of the GLFW window),
bench, grad-check, and info. The interactive GUI capabilities map to flags:
fisheye toggle (gui.cpp:188-191), render type (gui.cpp:374-438), primitive
insertion (gui.cpp:319-330).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _add_scene_args(p: argparse.ArgumentParser):
    p.add_argument("-p", "--ply", type=str, default=None, help="trained 3DGS PLY")
    p.add_argument("--synthetic", type=int, default=None, metavar="N",
                   help="use a seeded synthetic scene with N gaussians")
    p.add_argument("--seed", type=int, default=0)


def _add_camera_args(p: argparse.ArgumentParser):
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--eye", type=float, nargs=3, default=None)
    p.add_argument("--lookat", type=float, nargs=3, default=None)
    p.add_argument("--fov", type=float, default=60.0)
    p.add_argument("--fisheye", action="store_true")
    p.add_argument("--distortion", type=float, nargs="+", default=None,
                   metavar="K",
                   help="OpenCV distortion k1 k2 p1 p2 [k3 [k4 k5 k6]] "
                        "(switches to the OPENCV camera model)")


def _add_dist_args(p: argparse.ArgumentParser):
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize before any "
                        "compute (with no further flags, JAX auto-detects "
                        "the cluster from Cloud TPU metadata / SLURM)")
    p.add_argument("--coordinator", type=str, default=None,
                   metavar="HOST:PORT",
                   help="coordinator address for explicit process wiring")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)


def _add_render_args(p: argparse.ArgumentParser):
    p.add_argument("--method", choices=["auto", "oracle", "tiled", "pallas"],
                   default="auto")
    p.add_argument("--sh-degree", type=int, default=0)
    p.add_argument("--hit-multiplicity", type=int, default=2,
                   help="2 = reference proxy-hull double-hit compositing; "
                        "1 = standard volume rendering")
    p.add_argument("--mesh-type", choices=["mirror", "normal", "glass"],
                   default="mirror")
    p.add_argument("--add-plane", action="store_true")
    p.add_argument("--add-sphere", action="store_true")
    p.add_argument("--load-obj", type=str, default=None)
    p.add_argument("--supersample", type=int, default=1,
                   help="N: trace NxN rays per pixel and box-filter "
                        "(anti-aliasing; the reference traces 1/pixel)")
    p.add_argument("--order", choices=["window", "merge", "key"],
                   default=None,
                   help="per-ray compositing order: window = in-chunk sort "
                        "(default), merge = cross-chunk streaming merge "
                        "(higher quality per chunk width), key = raw "
                        "stream order (fastest, sorted-splatting grade)")
    p.add_argument("--march-chunk", type=int, default=None,
                   help="march chunk / ordering window width (default 128)")


def _build(args):
    from gaussian_ray_tracing_tpu.cameras import Camera
    from gaussian_ray_tracing_tpu.config import CameraModel, RenderConfig
    from gaussian_ray_tracing_tpu.models.renderer import GaussianRayTracer
    from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

    if args.ply:
        from gaussian_ray_tracing_tpu.scene.ply import load_ply

        scene = load_ply(args.ply)
    else:
        n = args.synthetic or 100_000
        scene = random_scene(n, seed=args.seed)

    distortion = tuple(getattr(args, "distortion", None) or ())
    if args.fisheye:
        model = CameraModel.FISHEYE
    elif distortion:
        model = CameraModel.OPENCV
    else:
        model = CameraModel.PINHOLE
    cfg = RenderConfig(
        sh_degree=getattr(args, "sh_degree", 0),
        hit_multiplicity=getattr(args, "hit_multiplicity", 2),
        camera_model=model,
        distortion=distortion,
    )
    if getattr(args, "order", None):
        cfg = cfg.replace(order=args.order)
    if getattr(args, "march_chunk", None):
        cfg = cfg.replace(march_chunk=args.march_chunk)
    tracer = GaussianRayTracer(scene=scene, config=cfg)
    tracer.set_size(args.width, args.height)
    center = np.asarray(scene.center())
    eye = np.asarray(args.eye) if args.eye else center + np.array([0.0, 0.0, 3.0])
    lookat = np.asarray(args.lookat) if args.lookat else center
    tracer.update_camera(
        Camera.create(eye=eye, lookat=lookat, fov_y_deg=args.fov,
                      width=args.width, height=args.height)
    )
    if getattr(args, "add_plane", False):
        tracer.create_plane()
    if getattr(args, "add_sphere", False):
        tracer.create_sphere(tess_u=36, tess_v=18)
    if getattr(args, "load_obj", None):
        tracer.create_load_mesh(args.load_obj)
    tracer.set_render_type(getattr(args, "mesh_type", "mirror"))
    return tracer


def cmd_render(args):
    from gaussian_ray_tracing_tpu.utils.image import write_png

    tracer = _build(args)
    frame = tracer.render_rgb8(method=args.method,
                               supersample=getattr(args, "supersample", 1))
    write_png(args.output, frame)
    print(f"wrote {args.output} ({frame.shape[1]}x{frame.shape[0]})")


def cmd_bench(args):
    import time

    import jax
    import jax.numpy as jnp

    from gaussian_ray_tracing_tpu.cameras import Camera
    from gaussian_ray_tracing_tpu.models.renderer import render

    tracer = _build(args)
    scene, cfg = tracer.scene, tracer.config
    eye0 = np.asarray(tracer.camera.eye)
    lookat = np.asarray(tracer.camera.lookat)

    # honest timing on tunneled backends: K frames with per-frame camera
    # motion inside ONE jitted loop, scalar fetch, 1-frame dispatch
    # subtracted (block_until_ready does not block through axon tunnels
    # and per-dispatch overhead is tens of ms)
    def frame(i):
        cam = Camera.create(
            eye=eye0 + jnp.array([0.002, 0.0, 0.0]) * i, lookat=lookat,
            width=args.width, height=args.height,
        )
        return render(scene, cam, cfg, method=args.method)["rgb"].mean()

    loop = lambda k: jax.jit(
        lambda: jax.lax.fori_loop(0, k, lambda i, a: a + frame(i), 0.0)
    )
    k = max(args.iters, 2)
    fk, f1 = loop(k), loop(1)
    float(fk()); float(f1())
    t0 = time.perf_counter(); float(fk()); tk = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f1()); t1 = time.perf_counter() - t0
    dt = max((tk - t1) / (k - 1), 1e-9)
    mrays = args.width * args.height / dt / 1e6
    print(json.dumps({
        "metric": f"forward Mrays/s ({args.width}x{args.height}, {args.method})",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "mean_ms": round(dt * 1e3, 3),
        "backend": jax.default_backend(),
    }))


def cmd_orbit(args):
    """Turntable render: the offline analog of the reference's interactive
    orbit camera (gui.cpp:199-256)."""
    import os

    from gaussian_ray_tracing_tpu.cameras import orbit_camera
    from gaussian_ray_tracing_tpu.utils.image import quantize_rgb8, write_png

    tracer = _build(args)
    center = np.asarray(tracer.scene.center())
    os.makedirs(args.output_dir, exist_ok=True)
    for i in range(args.frames):
        az = 360.0 * i / args.frames
        cam = orbit_camera(center, args.radius, az, args.elevation,
                           fov_y_deg=args.fov, width=args.width,
                           height=args.height)
        tracer.update_camera(cam)
        frame = tracer.render_rgb8(method=args.method)
        path = os.path.join(args.output_dir, f"frame_{i:04d}.png")
        write_png(path, frame)
    print(f"wrote {args.frames} frames to {args.output_dir}")


def _maybe_resume(trainer, args):
    """Restore an orbax checkpoint if --checkpoint-dir holds one."""
    import os

    d = getattr(args, "checkpoint_dir", None)
    if not d:
        return
    if os.path.isdir(d) and any(
        s.isdigit() for s in os.listdir(d)
    ):
        trainer.restore_checkpoint(d)
        print(f"# resumed from {d} at step {int(trainer.state.step)}",
              file=sys.stderr)


def _maybe_checkpoint(trainer, args):
    d = getattr(args, "checkpoint_dir", None)
    if d:
        trainer.save_checkpoint(d)


def cmd_fit(args):
    """Fit a randomly initialized scene to target images — renders of a
    target scene, or a NeRF-synthetic dataset (--dataset). The training
    capability the reference lacks (README.md:2)."""
    import jax

    from gaussian_ray_tracing_tpu.cameras import orbit_camera
    from gaussian_ray_tracing_tpu.config import RenderConfig
    from gaussian_ray_tracing_tpu.models.gaussian_model import GaussianModel
    from gaussian_ray_tracing_tpu.models.tiled import render_tiled
    from gaussian_ray_tracing_tpu.scene.synthetic import random_scene
    from gaussian_ray_tracing_tpu.train.trainer import Trainer

    # training forward ordering: "key" (fast sorted-splatting) composites
    # adjacent tiles' shared gaussians in different depth orders, leaving
    # 16x16 tile-seam noise (~30 dB floor) that gradients BAKE into the
    # scene; "window" (per-ray ordered, the parity config — the
    # hand-written backward replays its sort) removes that floor at
    # ~1.5-2x the step cost
    cfg = RenderConfig(hit_multiplicity=1, order=args.order,
                       march_chunk=128 if args.order == "window" else 256,
                       sh_degree=args.sh_degree)
    if getattr(args, "dataset", None):
        import jax.numpy as jnp

        from gaussian_ray_tracing_tpu.scene.dataset import load_nerf_synthetic

        views_np, meta = load_nerf_synthetic(
            args.dataset, split=args.split, downscale=args.downscale,
            max_views=args.views if args.views else None,
        )
        views = [(cam, jnp.asarray(img)) for cam, img in views_np]
        init = random_scene(args.fit_gaussians, seed=args.seed + 1,
                            extent=meta["extent"] * 0.5,
                            pad_to=args.capacity)
        init = type(init)(  # recenter on the dataset
            means=init.means + jnp.asarray(meta["center"], jnp.float32),
            scales=init.scales, quats=init.quats,
            opacities=init.opacities, sh=init.sh,
            num_active=init.num_active,
        )
        density = None
        if args.densify:
            from gaussian_ray_tracing_tpu.train.density import DensityConfig

            density = DensityConfig(
                densify_from_step=(args.densify_from if args.densify_from
                                   is not None else max(args.steps // 20, 10)),
                densify_until_step=(args.densify_until if args.densify_until
                                    is not None else args.steps // 2),
                densify_every=(args.densify_every if args.densify_every
                               is not None else max(args.steps // 30, 10)),
                opacity_reset_every=(args.opacity_reset_every
                                     if args.opacity_reset_every is not None
                                     else 0),
                grad_threshold=args.densify_grad_threshold,
            )
        loss_fn = None
        if args.loss == "dssim_l1":
            from gaussian_ray_tracing_tpu.train.losses import dssim_l1_loss

            loss_fn = dssim_l1_loss
        optimizer = None
        if args.optimizer == "3dgs":
            from gaussian_ray_tracing_tpu.train.trainer import gaussian_optimizer

            optimizer = gaussian_optimizer(
                scene_extent=max(meta["extent"], 1e-3), total_steps=args.steps,
                lr_scale=args.lr_scale,
            )
        trainer = Trainer(GaussianModel.from_scene(init), config=cfg,
                          lr=args.lr, loss_fn=loss_fn, optimizer=optimizer,
                          density=density, seed=args.seed)
        _maybe_resume(trainer, args)
        losses = trainer.fit(views, steps=args.steps,
                             checkpoint_dir=getattr(args, "checkpoint_dir",
                                                    None))
        _maybe_checkpoint(trainer, args)
        if args.output:
            trainer.save(args.output)
        print(json.dumps({
            "dataset": args.dataset, "views": len(views),
            "loss_first": losses[0], "loss_last": losses[-1],
            "steps": args.steps, "out": args.output,
            "alive": trainer.alive() if args.densify else None,
        }))
        return
    if args.ply:
        from gaussian_ray_tracing_tpu.scene.ply import load_ply

        target_scene = load_ply(args.ply)
    else:
        target_scene = random_scene(args.synthetic or 20_000, seed=args.seed)
    center = np.asarray(target_scene.center())

    n_views = args.views or 8
    views = []
    for i in range(n_views):
        cam = orbit_camera(center, 2.8, 360.0 * i / n_views, 15.0,
                           width=args.width, height=args.height)
        target = render_tiled(target_scene, cam, cfg)["rgb"]
        views.append((cam, target))

    init = random_scene(args.fit_gaussians, seed=args.seed + 1,
                        pad_to=args.capacity)
    density = None
    optimizer = None
    loss_fn = None
    if args.densify:
        from gaussian_ray_tracing_tpu.train.density import DensityConfig

        density = DensityConfig(
            densify_from_step=(args.densify_from if args.densify_from
                               is not None else max(args.steps // 20, 10)),
            densify_until_step=(args.densify_until if args.densify_until
                                is not None else args.steps // 2),
            densify_every=(args.densify_every if args.densify_every
                           is not None else max(args.steps // 30, 10)),
            opacity_reset_every=(args.opacity_reset_every
                                 if args.opacity_reset_every is not None
                                 else 0),
            grad_threshold=args.densify_grad_threshold,
        )
    if args.loss == "dssim_l1":
        from gaussian_ray_tracing_tpu.train.losses import dssim_l1_loss

        loss_fn = dssim_l1_loss
    if args.optimizer == "3dgs":
        from gaussian_ray_tracing_tpu.train.trainer import gaussian_optimizer

        ext = float(np.linalg.norm(
            np.asarray(init.means) - center[None], axis=-1).max())
        optimizer = gaussian_optimizer(scene_extent=max(ext, 1e-3),
                                       total_steps=args.steps,
                                       lr_scale=args.lr_scale)
    trainer = Trainer(GaussianModel.from_scene(init), config=cfg, lr=args.lr,
                      loss_fn=loss_fn, optimizer=optimizer, density=density,
                      seed=args.seed)
    _maybe_resume(trainer, args)
    losses = trainer.fit(views, steps=args.steps)
    _maybe_checkpoint(trainer, args)
    if args.output:
        trainer.save(args.output)
    print(json.dumps({
        "loss_first": losses[0], "loss_last": losses[-1],
        "steps": args.steps, "out": args.output,
        "alive": trainer.alive() if args.densify else None,
    }))


def cmd_grad_check(args):
    import jax
    import jax.numpy as jnp

    from gaussian_ray_tracing_tpu.cameras import Camera
    from gaussian_ray_tracing_tpu.config import RenderConfig
    from gaussian_ray_tracing_tpu.models.gaussian_model import GaussianModel
    from gaussian_ray_tracing_tpu.models.tiled import render_tiled
    from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

    cfg = RenderConfig(hit_multiplicity=1)
    model = GaussianModel.from_scene(random_scene(args.n, seed=args.seed, pad_to=None))
    cam = Camera.create(eye=(0, 0, 3), lookat=(0, 0, 0), width=32, height=32)
    target = jnp.zeros((32, 32, 3))

    def loss(m):
        return jnp.mean((render_tiled(m.activate(), cam, cfg)["rgb"] - target) ** 2)

    g = jax.grad(loss)(model)
    import dataclasses
    base = float(loss(model))
    eps = 1e-3
    report = {}
    for f in ["means", "log_scales", "raw_quats", "raw_opacities", "sh"]:
        arr = np.asarray(getattr(model, f), np.float64)
        ga = np.asarray(getattr(g, f), np.float64)
        idx = np.unravel_index(int(np.argmax(np.abs(ga))), arr.shape)
        d = np.zeros_like(arr)
        d[idx] = eps
        up = dataclasses.replace(model, **{f: jnp.asarray(arr + d, jnp.float32)})
        dn = dataclasses.replace(model, **{f: jnp.asarray(arr - d, jnp.float32)})
        fd = (float(loss(up)) - float(loss(dn))) / (2 * eps)
        report[f] = {"autodiff": float(ga[idx]), "finite_diff": fd}
    print(json.dumps({"base_loss": base, "grads": report}, indent=2))


def cmd_serve(args):
    from gaussian_ray_tracing_tpu.viewer import serve

    tracer = _build(args)
    serve(tracer, host=args.host, port=args.port,
          width=args.width, height=args.height)


def cmd_eval(args):
    """PSNR of scene B (e.g. a fit) against scene A over orbit poses, or —
    with --dataset — against a NeRF-synthetic dataset's HELD-OUT split
    (the standard novel-view-synthesis evaluation)."""
    from gaussian_ray_tracing_tpu.cameras import orbit_camera
    from gaussian_ray_tracing_tpu.config import RenderConfig
    from gaussian_ray_tracing_tpu.models.renderer import render
    from gaussian_ray_tracing_tpu.scene.ply import load_ply
    from gaussian_ray_tracing_tpu.utils.image import psnr

    # parity-grade ordering: key order's ~30 dB ordering noise would cap
    # the measurable fit quality below the scores being evaluated.
    # max_per_tile raised for the XLA fallback path: a dense trained scene
    # overflows the 1024 default per-tile list (the pallas path has no cap)
    cfg = RenderConfig(hit_multiplicity=1, order="window", march_chunk=128,
                       sh_degree=args.sh_degree, max_per_tile=8192)
    if getattr(args, "dataset", None):
        from gaussian_ray_tracing_tpu.scene.dataset import load_nerf_synthetic

        views, _meta = load_nerf_synthetic(
            args.dataset, split=args.split, downscale=args.downscale,
        )
        b = load_ply(args.against)
        scores = []
        cap = None
        for cam, img in views:
            # drop-free capacity, escalated across views (a dense trained
            # scene overflows the default bucket and capacity drops show
            # as tile-blocky holes scored as fit error)
            for _ in range(4):
                out = render(b, cam, cfg, pair_capacity=cap,
                             return_aux=True)
                if int(out["aux"]["n_dropped"]) == 0:
                    break
                cap = max(int(out["aux"]["n_pairs"] * 1.3),
                          (cap or 0) * 2)
                cap = -(-cap // 65536) * 65536
            rb = np.asarray(out["rgb"])
            scores.append(float(psnr(np.asarray(img), rb)))
        print(json.dumps({
            "psnr_mean": round(float(np.mean(scores)), 2),
            "psnr_min": round(float(np.min(scores)), 2),
            "views": len(scores),
            "split": args.split,
            "dataset": args.dataset,
            "against": args.against,
        }))
        return
    a = load_ply(args.ply)
    b = load_ply(args.against)
    c = np.asarray(a.center())
    scores = []
    for i in range(args.poses):
        az = 360.0 * (i + 0.37) / args.poses  # offset: unlikely train poses
        cam = orbit_camera(c, args.radius, az, 15.0,
                           width=args.width, height=args.height)
        ra = np.asarray(render(a, cam, cfg)["rgb"])
        rb = np.asarray(render(b, cam, cfg)["rgb"])
        scores.append(float(psnr(ra, rb)))
    print(json.dumps({
        "psnr_mean": round(float(np.mean(scores)), 2),
        "psnr_min": round(float(np.min(scores)), 2),
        "poses": args.poses,
        "scenes": [args.ply, args.against],
    }))


def cmd_warmup(args):
    """Populate the persistent compilation cache for the common config set
    (first Mosaic compiles take minutes; cached reruns are instant). Run
    once per (resolution, scene-size bucket) after deploys."""
    import time

    import jax

    from gaussian_ray_tracing_tpu.cameras import Camera
    from gaussian_ray_tracing_tpu.config import CameraModel, RenderConfig
    from gaussian_ray_tracing_tpu.models.renderer import render
    from gaussian_ray_tracing_tpu.models.tiled import default_pair_capacity
    from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

    n = args.synthetic or 100_000
    scene = jax.device_put(random_scene(n, seed=args.seed))
    method = "pallas" if jax.default_backend() == "tpu" else "tiled"
    cam = Camera.create(eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                        width=args.width, height=args.height)
    variants = [("pinhole", RenderConfig(hit_multiplicity=1, order="window"))]
    variants.append(("pinhole key", RenderConfig(hit_multiplicity=1, order="key")))
    variants.append(
        ("fisheye", RenderConfig(hit_multiplicity=1, order="window",
                                 camera_model=CameraModel.FISHEYE))
    )
    caps = sorted({default_pair_capacity(n), *(
        int(c) for c in (args.pair_capacity or [])
    )})
    done = []
    for name, cfg in variants:
        for cap in caps:
            t0 = time.perf_counter()
            out = render(scene, cam, cfg, method=method, pair_capacity=cap)
            jax.block_until_ready(out["rgb"])
            done.append({"config": name, "pair_capacity": cap,
                         "seconds": round(time.perf_counter() - t0, 1)})
            print(json.dumps(done[-1]), flush=True)
    print(json.dumps({"warmed": len(done), "method": method,
                      "width": args.width, "height": args.height}))
    if getattr(args, "assert_golden", False):
        # on-backend golden gate: the production window-order path must
        # clear the parity bar on the stored full-frame oracle golden.
        # CPU interpret tests cannot see Mosaic layout legality or
        # bf16/MXU numeric traps (round-3 lessons) — this can.
        import os

        import numpy as np

        from gaussian_ray_tracing_tpu.utils.image import psnr

        gpath = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data", "golden",
            "pinhole_720p.npz")
        gz = np.load(gpath)
        n_g, seed_g, w_g, h_g, hm_g, _fe = [int(v) for v in gz["meta"]]
        gscene = jax.device_put(random_scene(n_g, seed=seed_g))
        gcam = Camera.create(eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                             width=w_g, height=h_g)
        gcfg = RenderConfig(hit_multiplicity=hm_g, order="window",
                            march_chunk=128)
        cap = default_pair_capacity(n_g)
        for _ in range(3):
            aux = render(gscene, gcam, gcfg, method=method,
                         pair_capacity=cap, return_aux=True)["aux"]
            if int(aux["n_dropped"]) == 0:
                break
            cap *= 2
        out = render(gscene, gcam, gcfg, method=method, pair_capacity=cap)
        p = float(psnr(np.asarray(gz["rgb"], np.float32),
                       np.asarray(out["rgb"])))
        print(json.dumps({"psnr_vs_golden": round(p, 2), "method": method}))
        assert p >= 40.0, f"production path PSNR {p:.1f} < 40 vs golden"


def cmd_info(args):
    tracer = _build(args)
    s = tracer.scene
    print(json.dumps({
        "num_gaussians": s.num_active,
        "padded": s.num_gaussians,
        "sh_coeffs": s.sh_coeffs,
        "center": np.asarray(s.center()).tolist(),
        "native_core": __import__(
            "gaussian_ray_tracing_tpu.native.bindings", fromlist=["available"]
        ).available(),
    }))


def main(argv=None):
    parser = argparse.ArgumentParser(prog="grt", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("render", help="render a frame to PNG")
    _add_scene_args(p); _add_camera_args(p); _add_render_args(p); _add_dist_args(p)
    p.add_argument("-o", "--output", type=str, default="render.png")
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser("bench", help="measure forward Mrays/s")
    _add_scene_args(p); _add_camera_args(p); _add_render_args(p); _add_dist_args(p)
    p.add_argument("--iters", type=int, default=10)
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("orbit", help="turntable render to PNG frames")
    _add_scene_args(p); _add_camera_args(p); _add_render_args(p); _add_dist_args(p)
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--radius", type=float, default=3.0)
    p.add_argument("--elevation", type=float, default=15.0)
    p.add_argument("-o", "--output-dir", type=str, default="orbit")
    p.set_defaults(fn=cmd_orbit)

    p = sub.add_parser("fit", help="fit a random scene to target renders")
    _add_scene_args(p)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--views", type=int, default=None,
                   help="number of views (synthetic default 8; --dataset "
                   "default: the whole split)")
    p.add_argument("--order", choices=["key", "window"], default="key",
                   help="training-forward hit ordering: key = fast "
                   "sorted splatting (tile-seam noise floor), window = "
                   "per-ray ordered (parity-grade, ~1.5-2x step cost)")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--fit-gaussians", type=int, default=2000)
    p.add_argument("--sh-degree", type=int, default=0)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--densify", action="store_true",
                   help="3DGS adaptive density control (clone/split/prune)")
    p.add_argument("--capacity", type=int, default=None,
                   help="static slot capacity for densification headroom")
    p.add_argument("--densify-from", type=int, default=None,
                   help="densify window start step (default steps//20)")
    p.add_argument("--densify-until", type=int, default=None,
                   help="densify window end step (default steps//2; the "
                        "3DGS reference uses 15000 on 30k-step runs)")
    p.add_argument("--densify-every", type=int, default=None,
                   help="steps between densify rounds (default steps//30; "
                        "3DGS uses 100)")
    p.add_argument("--opacity-reset-every", type=int, default=None,
                   help="steps between opacity resets inside the densify "
                        "window (default 0 = never; 3DGS uses 3000 — "
                        "resets stop floaters from locking in on long "
                        "schedules)")
    p.add_argument("--densify-grad-threshold", type=float, default=2e-4,
                   help="NDC-units mean-grad threshold for clone/split "
                        "(the 3DGS default)")
    p.add_argument("--loss", choices=["l2", "dssim_l1"], default="l2")
    p.add_argument("--optimizer", choices=["adam", "3dgs"], default="adam")
    p.add_argument("--lr-scale", type=float, default=1.0,
                   help="multiplier on the 3dgs per-group rates (raise for "
                        "schedules much shorter than the 30k-step default)")
    p.add_argument("--dataset", type=str, default=None,
                   help="NeRF-synthetic dataset root (transforms_*.json)")
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--downscale", type=int, default=1)
    p.add_argument("--checkpoint-dir", type=str, default=None,
                   help="orbax checkpoint dir: saved after fitting, "
                        "restored first when it already holds a step "
                        "(resumable training)")
    p.add_argument("-o", "--output", type=str, default=None)
    p.set_defaults(fn=cmd_fit)

    p = sub.add_parser("grad-check", help="autodiff vs finite differences")
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_grad_check)

    p = sub.add_parser("serve", help="interactive browser viewer")
    _add_scene_args(p); _add_camera_args(p); _add_render_args(p)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8800)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("info", help="scene statistics")
    _add_scene_args(p); _add_camera_args(p)
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser(
        "eval",
        help="PSNR of a PLY vs a reference PLY over poses, or vs a "
        "dataset's held-out split (--dataset)",
    )
    p.add_argument("-p", "--ply", type=str, default=None, help="reference PLY")
    p.add_argument("--against", type=str, required=True, help="candidate PLY")
    p.add_argument("--dataset", type=str, default=None,
                   help="NeRF-synthetic root: evaluate against its images")
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--downscale", type=int, default=1)
    p.add_argument("--poses", type=int, default=6)
    p.add_argument("--radius", type=float, default=2.8)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--sh-degree", type=int, default=0)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("warmup", help="precompile the common config set")
    _add_scene_args(p)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--pair-capacity", type=int, nargs="*", default=None,
                   help="extra pair-capacity buckets to warm")
    p.add_argument("--assert", dest="assert_golden", action="store_true",
                   help="after warming, render the stored 720p golden's "
                   "scene with the production config on THIS backend and "
                   "fail unless PSNR >= 40 (catches Mosaic compile or "
                   "numeric regressions the CPU tests cannot see)")
    p.set_defaults(fn=cmd_warmup)

    args = parser.parse_args(argv)
    if getattr(args, "distributed", False):
        # must run before ANY jax backend touch (the lazy in-function jax
        # imports below keep this ordering safe)
        from gaussian_ray_tracing_tpu.parallel.distributed import (
            initialize_distributed,
        )

        initialize_distributed(
            args.coordinator, args.num_processes, args.process_id
        )
    try:
        return args.fn(args)
    except Exception as e:  # pragma: no cover - tunnel-specific
        # the tunneled TPU worker occasionally drops right after a crash /
        # OOM in a previous process (FAILED_PRECONDITION); one retry in the
        # same process usually finds it recovered
        name = type(e).__name__
        if "FAILED_PRECONDITION" in str(e) or "XlaRuntimeError" in name:
            print(f"# TPU worker dropped ({name}); retrying once",
                  file=sys.stderr)
            return args.fn(args)
        raise


if __name__ == "__main__":
    sys.exit(main())
