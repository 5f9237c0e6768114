"""Native C++ core (native/grtcore.cpp via ctypes): build + parity with the
pure-NumPy fallbacks."""

import os
import tempfile

import numpy as np
import pytest

from gaussian_ray_tracing_tpu.native import bindings as B


@pytest.fixture(scope="module")
def lib_ok():
    ok = B.build()
    if not ok or not B.available():
        pytest.skip("native toolchain unavailable")
    return True


class TestNativePly:
    def test_roundtrip_exact(self, lib_ok):
        from gaussian_ray_tracing_tpu.scene.ply import read_ply_raw, save_ply

        rng = np.random.default_rng(0)
        n = 5000
        means = rng.normal(size=(n, 3)).astype(np.float32)
        s = rng.normal(size=(n, 3)).astype(np.float32)
        q = rng.normal(size=(n, 4)).astype(np.float32)
        o = rng.normal(size=(n,)).astype(np.float32)
        sh = rng.normal(size=(n, 16, 3)).astype(np.float32)
        path = tempfile.mktemp(suffix=".ply")
        try:
            save_ply(path, means, s, q, o, sh)
            cols = read_ply_raw(path)  # native fast path
            np.testing.assert_array_equal(cols["x"], means[:, 0])
            np.testing.assert_array_equal(cols["opacity"], o)
            np.testing.assert_array_equal(cols["rot_3"], q[:, 3])
            np.testing.assert_array_equal(cols["f_rest_29"], sh[:, 15, 1])
        finally:
            os.remove(path)

    def test_native_matches_numpy_reader(self, lib_ok):
        from gaussian_ray_tracing_tpu.scene import ply as P

        rng = np.random.default_rng(1)
        n = 257
        path = tempfile.mktemp(suffix=".ply")
        try:
            P.save_ply(
                path,
                rng.normal(size=(n, 3)), rng.normal(size=(n, 3)),
                rng.normal(size=(n, 4)), rng.normal(size=(n,)),
                rng.normal(size=(n, 16, 3)),
            )
            native = B.ply_read_native(path)
            assert native is not None
            # force the numpy reader
            import unittest.mock as mock

            with mock.patch.object(B, "_load", return_value=None):
                pure = P.read_ply_raw(path)
            for k in pure:
                np.testing.assert_array_equal(native[k], pure[k])
        finally:
            os.remove(path)


class TestNativeMorton:
    def test_matches_numpy(self, lib_ok):
        rng = np.random.default_rng(2)
        pos = rng.uniform(-1, 1, size=(1000, 3)).astype(np.float32)
        codes = B.morton3d(pos)
        assert codes.shape == (1000,)
        # locality: sorted order neighbors are close
        order = np.argsort(codes)
        pts = pos[order]
        adj = np.linalg.norm(np.diff(pts, axis=0), axis=-1).mean()
        rnd = np.linalg.norm(
            pts[:-1] - pts[rng.permutation(999)], axis=-1
        ).mean()
        assert adj < 0.6 * rnd

    def test_argsort_u64(self, lib_ok):
        rng = np.random.default_rng(3)
        keys = rng.integers(0, 1 << 62, size=10_000, dtype=np.uint64)
        perm = B.argsort_u64(keys)
        assert np.all(np.diff(keys[perm].astype(np.uint64)) >= 0)
