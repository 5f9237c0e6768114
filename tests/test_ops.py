"""Unit tests for pure math ops against tiny NumPy oracles transcribed from
the reference formulas (SURVEY.md section 4 strategy)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gaussian_ray_tracing_tpu.ops.quaternion import quat_to_rotmat, normalize_quat
from gaussian_ray_tracing_tpu.ops.sh import eval_sh, SH_C0
from gaussian_ray_tracing_tpu.ops.response import (
    canonical_frames,
    adaptive_radius,
    max_response,
    ray_ellipsoid_span,
)
from gaussian_ray_tracing_tpu.ops.composite import composite_depth_ordered, effective_alpha
from gaussian_ray_tracing_tpu.ops.intersect import (
    moller_trumbore,
    closest_hit,
    reflect,
    refract_or_tir,
)


def np_quat_to_rot(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


class TestQuaternion:
    def test_identity(self):
        R = quat_to_rotmat(jnp.array([1.0, 0.0, 0.0, 0.0]))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_orthonormal(self):
        rng = np.random.default_rng(0)
        q = normalize_quat(jnp.asarray(rng.normal(size=(32, 4)), jnp.float32))
        R = np.asarray(quat_to_rotmat(q))
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), np.ones(32), atol=1e-5)

    def test_vs_numpy(self):
        rng = np.random.default_rng(1)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        np.testing.assert_allclose(
            quat_to_rotmat(jnp.asarray(q, jnp.float32)), np_quat_to_rot(q), atol=1e-6
        )

    def test_z_rotation_90(self):
        # 90 deg about z: (w, x, y, z) = (cos45, 0, 0, sin45); x-axis -> y-axis
        s = np.sqrt(0.5)
        R = quat_to_rotmat(jnp.array([s, 0.0, 0.0, s]))
        np.testing.assert_allclose(R @ jnp.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


class TestSH:
    def test_degree0(self):
        sh = jnp.zeros((16, 3)).at[0].set(jnp.array([1.0, 2.0, -3.0]))
        d = jnp.array([0.0, 0.0, 1.0])
        out = eval_sh(sh[None], d[None], 0)[0]
        expected = np.maximum(0.5 + SH_C0 * np.array([1.0, 2.0, -3.0]), 0.0)
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_clamped_at_zero(self):
        sh = jnp.zeros((16, 3)).at[0].set(-10.0)
        out = eval_sh(sh[None], jnp.array([[0.0, 0.0, 1.0]]), 0)
        np.testing.assert_allclose(out, 0.0)

    def test_degree1_signs(self):
        # reference: L += SH_C1 * (-y*sh1 + z*sh2 - x*sh3)  (tracer.cuh:230)
        sh = jnp.zeros((16, 3))
        sh = sh.at[1, 0].set(1.0)  # band (-y) into R
        d = jnp.array([0.0, 1.0, 0.0])
        out = eval_sh(sh[None], d[None], 1)[0]
        assert np.isclose(out[0], max(0.5 - 0.4886025119029199, 0.0), atol=1e-6)

    def test_higher_degrees_finite(self):
        rng = np.random.default_rng(2)
        sh = jnp.asarray(rng.normal(size=(8, 16, 3)), jnp.float32)
        d = rng.normal(size=(8, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        for deg in (0, 1, 2, 3):
            out = eval_sh(sh, jnp.asarray(d, jnp.float32), deg)
            assert np.all(np.isfinite(out)) and np.all(out >= 0)


class TestResponse:
    def test_isotropic_peak(self):
        # unit isotropic gaussian at origin: ray through center -> resp 1
        means = jnp.zeros((1, 3))
        M = canonical_frames(jnp.ones((1, 3)), jnp.array([[1.0, 0, 0, 0]]))
        o = jnp.array([[0.0, 0.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        resp, t_star = max_response(means, M, o, d)
        np.testing.assert_allclose(resp, 1.0, atol=1e-6)
        np.testing.assert_allclose(t_star, 5.0, atol=1e-5)

    def test_offset_ray(self):
        # ray passing at distance b from an isotropic unit gaussian:
        # resp = exp(-b^2/2)
        means = jnp.zeros((1, 3))
        M = canonical_frames(jnp.ones((1, 3)), jnp.array([[1.0, 0, 0, 0]]))
        o = jnp.array([[2.0, 0.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        resp, _ = max_response(means, M, o, d)
        np.testing.assert_allclose(resp, np.exp(-2.0), atol=1e-6)

    def test_reference_formula_oracle(self):
        """Transcribed NumPy oracle of computeResponse (tracer.cuh:187-214)."""
        rng = np.random.default_rng(3)
        for _ in range(20):
            mu = rng.normal(size=3)
            scale = np.exp(rng.normal(size=3) * 0.3)
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            o = rng.normal(size=3) * 3
            d = rng.normal(size=3)
            d /= np.linalg.norm(d)

            R = np_quat_to_rot(q)
            Minv = np.diag(1.0 / scale) @ R.T
            o_g = Minv @ (o - mu)
            d_g = Minv @ d
            t = -np.dot(o_g, d_g) / max(1e-6, np.dot(d_g, d_g))
            pos = o + t * d
            p_g = Minv @ (mu - pos)
            expected = np.exp(-0.5 * np.dot(p_g, p_g))

            M = canonical_frames(
                jnp.asarray(scale[None], jnp.float32), jnp.asarray(q[None], jnp.float32)
            )
            resp, _ = max_response(
                jnp.asarray(mu[None], jnp.float32),
                M,
                jnp.asarray(o[None], jnp.float32),
                jnp.asarray(d[None], jnp.float32),
            )
            np.testing.assert_allclose(resp[0], expected, rtol=2e-4, atol=1e-6)

    def test_adaptive_radius(self):
        # reference: s = sqrt(2 ln(opacity/alpha_min)) (GaussianTracer.cpp:306)
        r = adaptive_radius(jnp.array([0.5]), 0.01)
        np.testing.assert_allclose(r, np.sqrt(2 * np.log(0.5 / 0.01)), rtol=1e-5)
        # opacity below alpha_min: radius 0 (reference would NaN; such
        # particles can never pass the alpha_min test)
        assert adaptive_radius(jnp.array([0.005]), 0.01)[0] == 0.0

    def test_ellipsoid_span_sphere(self):
        means = jnp.zeros((1, 3))
        M = canonical_frames(jnp.ones((1, 3)), jnp.array([[1.0, 0, 0, 0]]))
        r = jnp.array([2.0])
        o = jnp.array([[0.0, 0.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        hit, t0, t1 = ray_ellipsoid_span(means, M, r, o, d)
        assert bool(hit[0])
        np.testing.assert_allclose(t0, 3.0, atol=1e-5)
        np.testing.assert_allclose(t1, 7.0, atol=1e-5)

    def test_ellipsoid_alpha_min_equivalence(self):
        """Missing the adaptive ellipsoid <=> alpha <= alpha_min (by design)."""
        rng = np.random.default_rng(4)
        n = 256
        means = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        scales = jnp.asarray(np.exp(rng.normal(size=(n, 3)) * 0.5) * 0.3, jnp.float32)
        quats = normalize_quat(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
        op = jnp.asarray(rng.uniform(0.02, 1.0, size=n), jnp.float32)
        M = canonical_frames(scales, quats)
        radius = adaptive_radius(op, 0.01)
        o = jnp.zeros((1, 3)) + jnp.array([0.0, 0.0, -4.0])
        d = jnp.array([[0.0, 0.0, 1.0]])
        hit, _, _ = ray_ellipsoid_span(means, M, radius, o, d)
        resp, _ = max_response(means, M, o, d)
        alpha = resp * op
        # strict equivalence away from the boundary
        margin = np.abs(np.asarray(alpha) - 0.01) > 1e-5
        np.testing.assert_array_equal(
            np.asarray(hit)[margin], (np.asarray(alpha) > 0.01)[margin]
        )


class TestComposite:
    def _sequential(self, alphas, colors, valid, alpha_min, min_t, mult, t0=1.0):
        """Literal transcription of the reference march loop (tracer.cuh:341-369)."""
        T = t0
        radiance = np.zeros(3)
        for a, c, v in zip(alphas, colors, valid):
            for _ in range(mult):
                if v and T > min_t and a > alpha_min:
                    radiance += T * c * a
                    T *= 1.0 - a
        return radiance, 1.0 - T, T

    @pytest.mark.parametrize("mult", [1, 2])
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_vs_sequential(self, mult, seed):
        rng = np.random.default_rng(seed)
        m = 64
        # float32 inputs (identical bits in both implementations), nudged off
        # the alpha_min / min_transmittance gate boundaries so the float64
        # sequential oracle and the float32 vectorized path cannot disagree
        # about gate inclusion
        alphas = (rng.uniform(0.02, 0.98, size=m) * (rng.uniform(size=m) > 0.3)).astype(
            np.float32
        )
        colors = rng.uniform(size=(m, 3)).astype(np.float32)
        valid = rng.uniform(size=m) > 0.2
        rgb, dens, tf = composite_depth_ordered(
            jnp.asarray(alphas)[None],
            jnp.asarray(colors)[None],
            jnp.asarray(valid)[None],
            alpha_min=0.01,
            min_transmittance=1e-3,
            hit_multiplicity=mult,
        )
        er, ed, et = self._sequential(alphas, colors, valid, 0.01, 1e-3, mult)
        # multiplicity > 1: the closed form 1-(1-a)^m deviates from the
        # reference's per-pass T>minT re-check only at the termination hit,
        # bounded by min_transmittance (see ops/composite.py docstring)
        atol = 1e-6 if mult == 1 else 2e-3
        np.testing.assert_allclose(rgb[0], er, rtol=2e-4, atol=atol)
        np.testing.assert_allclose(dens[0], ed, rtol=2e-4, atol=atol)
        np.testing.assert_allclose(tf[0], et, rtol=2e-4, atol=atol)

    def test_early_termination(self):
        # near-opaque hits drive T below min_transmittance; later hits
        # contribute nothing (values chosen off the exact 1e-3 boundary)
        vals = np.array([0.995, 0.9, 0.9], np.float32)
        alphas = jnp.asarray(vals)[None]
        colors = jnp.ones((1, 3, 3))
        valid = jnp.ones((1, 3), bool)
        rgb, dens, tf = composite_depth_ordered(
            alphas, colors, valid, alpha_min=0.01, min_transmittance=1e-3,
            hit_multiplicity=1,
        )
        er, ed, et = self._sequential(vals, np.ones((3, 3)), [True] * 3, 0.01, 1e-3, 1)
        np.testing.assert_allclose(rgb[0], er, rtol=1e-5)
        np.testing.assert_allclose(tf[0], et, rtol=1e-5)
        # the third hit must not have contributed (T frozen below 1e-3)
        assert float(tf[0]) == float(
            np.float32(1 - vals[0]) * np.float32(1 - vals[1])
        )

    def test_carry_in_transmittance(self):
        alphas = np.array([0.5, 0.3])
        colors = np.ones((2, 3)) * 0.7
        rgb, dens, tf = composite_depth_ordered(
            jnp.asarray(alphas, jnp.float32)[None],
            jnp.asarray(colors, jnp.float32)[None],
            jnp.ones((1, 2), bool),
            alpha_min=0.01,
            min_transmittance=1e-3,
            hit_multiplicity=1,
            t0=jnp.array([0.4]),
        )
        er, ed, et = self._sequential(alphas, colors, [True, True], 0.01, 1e-3, 1, t0=0.4)
        np.testing.assert_allclose(rgb[0], er, rtol=1e-5)
        np.testing.assert_allclose(tf[0], et, rtol=1e-5)

    def test_terminated_carry_in(self):
        rgb, dens, tf = composite_depth_ordered(
            jnp.array([[0.5]]), jnp.ones((1, 1, 3)), jnp.ones((1, 1), bool),
            alpha_min=0.01, min_transmittance=1e-3, hit_multiplicity=1,
            t0=jnp.array([5e-4]),
        )
        np.testing.assert_allclose(rgb[0], 0.0)
        np.testing.assert_allclose(tf[0], 5e-4)

    def test_effective_alpha_clamp(self):
        a = effective_alpha(jnp.array([1.0]), jnp.array([5.0]))
        np.testing.assert_allclose(a, 0.99)


class TestIntersect:
    def test_single_triangle(self):
        v0 = jnp.array([0.0, 0.0, 0.0])
        v1 = jnp.array([1.0, 0.0, 0.0])
        v2 = jnp.array([0.0, 1.0, 0.0])
        o = jnp.array([0.2, 0.2, -1.0])
        d = jnp.array([0.0, 0.0, 1.0])
        hit, t, u, v = moller_trumbore(o, d, v0, v1, v2, 1e-5, 1e5)
        assert bool(hit)
        np.testing.assert_allclose(t, 1.0, atol=1e-6)
        np.testing.assert_allclose([u, v], [0.2, 0.2], atol=1e-6)

    def test_double_sided(self):
        v0 = jnp.array([0.0, 0.0, 0.0])
        v1 = jnp.array([1.0, 0.0, 0.0])
        v2 = jnp.array([0.0, 1.0, 0.0])
        o = jnp.array([0.2, 0.2, 1.0])
        d = jnp.array([0.0, 0.0, -1.0])
        hit, t, _, _ = moller_trumbore(o, d, v0, v1, v2, 1e-5, 1e5)
        assert bool(hit)

    def test_closest_hit_picks_nearest(self):
        tri = lambda z: (
            jnp.array([[-1.0, -1.0, z]]),
            jnp.array([[3.0, -1.0, z]]),
            jnp.array([[-1.0, 3.0, z]]),
        )
        v0 = jnp.concatenate([tri(2.0)[0], tri(1.0)[0]])
        v1 = jnp.concatenate([tri(2.0)[1], tri(1.0)[1]])
        v2 = jnp.concatenate([tri(2.0)[2], tri(1.0)[2]])
        o = jnp.zeros((1, 3))
        d = jnp.array([[0.0, 0.0, 1.0]])
        hit = closest_hit(o, d, v0, v1, v2, 1e-5, 1e5)
        np.testing.assert_allclose(hit.t, [1.0], atol=1e-6)
        assert hit.face[0] == 1

    def test_reflect(self):
        d = jnp.array([1.0, -1.0, 0.0]) / np.sqrt(2)
        n = jnp.array([0.0, 1.0, 0.0])
        r = reflect(d, n)
        np.testing.assert_allclose(r, np.array([1.0, 1.0, 0.0]) / np.sqrt(2), atol=1e-6)

    def test_refract_straight_through(self):
        d = jnp.array([[0.0, 0.0, 1.0]])
        n = jnp.array([[0.0, 0.0, -1.0]])
        new_d, tir = refract_or_tir(d, n, 1.5 / 1.0003)
        assert not bool(tir[0])
        np.testing.assert_allclose(new_d[0], [0.0, 0.0, 1.0], atol=1e-5)

    def test_snell_angle(self):
        # entering glass at 45 deg: sin(t) = sin(45)/1.49955
        s = np.sqrt(0.5)
        d = jnp.array([[s, 0.0, s]])
        n = jnp.array([[0.0, 0.0, -1.0]])
        ratio = 1.5 / 1.0003
        new_d, tir = refract_or_tir(d, n, ratio)
        assert not bool(tir[0])
        sin_out = float(new_d[0, 0]) / float(np.linalg.norm(new_d[0]))
        np.testing.assert_allclose(sin_out, s / ratio, rtol=1e-5)

    def test_total_internal_reflection(self):
        # leaving glass at grazing angle: TIR
        s = np.sin(np.deg2rad(60))
        c = np.cos(np.deg2rad(60))
        d = jnp.array([[s, 0.0, c]])
        n = jnp.array([[0.0, 0.0, -1.0]])  # back face (dot(d,n) < 0 is False)
        # exiting: dot(d, n) must be > 0 for the "else" branch -> flip n
        n = jnp.array([[0.0, 0.0, 1.0]])
        new_d, tir = refract_or_tir(d, n, 1.5 / 1.0003)
        assert bool(tir[0])


class TestFusedScan:
    """ops/scan.py: fused multi-channel int32 prefix sums (MXU hi/lo split)."""

    def test_multi_cumsum_matches_jnp(self):
        import numpy as np

        from gaussian_ray_tracing_tpu.ops.scan import multi_cumsum_i32

        rng = np.random.default_rng(0)
        # adversarial values: large magnitudes + wraparound-heavy deltas
        x = rng.integers(-(2**31), 2**31 - 1, size=(3, 70_000), dtype=np.int64)
        x = x.astype(np.int32)
        got = np.asarray(multi_cumsum_i32(jnp.asarray(x), interpret=True))
        want = np.cumsum(x.astype(np.int64), axis=1).astype(np.int32)  # wraps
        np.testing.assert_array_equal(got, want)

    def test_multi_head_fill_matches_reference(self):
        import numpy as np

        from gaussian_ray_tracing_tpu.ops.scan import multi_head_fill
        from gaussian_ray_tracing_tpu.ops.tiles import _head_fill

        rng = np.random.default_rng(1)
        n, cap = 500, 4096
        counts = rng.integers(0, 20, size=n)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
        first = np.minimum(offsets, cap).astype(np.int32)
        vals = [
            jnp.asarray(rng.integers(-(2**28), 2**28, size=n, dtype=np.int64).astype(np.int32))
            for _ in range(3)
        ]
        fused = multi_head_fill(jnp.asarray(first), vals, cap, use_kernel=False)
        for f, v in zip(fused, vals):
            ref = _head_fill(jnp.asarray(first), v, cap)
            np.testing.assert_array_equal(np.asarray(f), np.asarray(ref))

    def test_rank_fill_matches_cummax(self):
        """The owner-rank delta fill equals the old scatter-max + cummax."""
        import numpy as np

        from gaussian_ray_tracing_tpu.ops.scan import multi_head_fill

        rng = np.random.default_rng(2)
        n, cap = 300, 2048
        counts = rng.integers(0, 12, size=n)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
        first = np.minimum(offsets, cap).astype(np.int32)
        ranks = np.arange(n, dtype=np.int32)
        (got,) = multi_head_fill(jnp.asarray(first), [jnp.asarray(ranks + 1)], cap,
                                 use_kernel=False)
        buf = np.zeros(cap + 1, np.int32)
        np.maximum.at(buf, first, ranks + 1)
        want = np.maximum.accumulate(buf[:cap])
        np.testing.assert_array_equal(np.asarray(got), want)
