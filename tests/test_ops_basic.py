"""Unit tests for morton/packbits, intersection, SH, trunc_exp against
independent numpy references (reference semantics: models/csrc/*.cu)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radnerf_tpu.ops.morton import morton3d, morton3d_invert, packbits, unpackbits
from radnerf_tpu.ops.intersection import (
    ray_aabb_intersect,
    ray_sphere_intersect,
    scene_near_far,
)
from radnerf_tpu.ops.sh import sh_encode, sh_encode_dir
from radnerf_tpu.ops.trunc_exp import trunc_exp


def np_morton3d(c):
    out = np.zeros(len(c), dtype=np.int64)
    for bit in range(10):
        for d in range(3):
            out |= ((c[:, d].astype(np.int64) >> bit) & 1) << (3 * bit + d)
    return out


class TestMorton:
    def test_roundtrip_and_golden(self):
        rng = np.random.default_rng(0)
        coords = rng.integers(0, 1024, (1000, 3), dtype=np.int32)
        idx = np.asarray(morton3d(jnp.asarray(coords)))
        np.testing.assert_array_equal(idx.astype(np.int64) & 0x3FFFFFFF,
                                      np_morton3d(coords))
        back = np.asarray(morton3d_invert(jnp.asarray(idx)))
        np.testing.assert_array_equal(back, coords)

    def test_packbits(self):
        rng = np.random.default_rng(1)
        grid = rng.standard_normal((2, 64)).astype(np.float32)
        thresh = 0.1
        bf = np.asarray(packbits(jnp.asarray(grid), thresh))
        # numpy reference: bit i of byte n = grid[8n+i] > thresh
        ref = np.zeros((2, 8), dtype=np.uint8)
        for c in range(2):
            for n in range(8):
                for i in range(8):
                    ref[c, n] |= np.uint8((grid[c, 8 * n + i] > thresh) << i)
        np.testing.assert_array_equal(bf, ref)
        np.testing.assert_array_equal(
            np.asarray(unpackbits(jnp.asarray(bf))), grid > thresh
        )


class TestIntersection:
    def test_aabb_golden(self):
        rng = np.random.default_rng(2)
        o = rng.standard_normal((64, 3)).astype(np.float32) * 2
        d = rng.standard_normal((64, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        center = np.zeros((1, 3), np.float32)
        half = np.ones((1, 3), np.float32) * 0.5
        hits = np.asarray(
            ray_aabb_intersect(
                jnp.asarray(o), jnp.asarray(d), jnp.asarray(center),
                jnp.asarray(half),
            )
        )[:, 0]
        # brute-force: sample points along each ray, check box membership
        for r in range(64):
            ts = np.linspace(0, 10, 20001)
            pts = o[r] + ts[:, None] * d[r]
            inside = np.all(np.abs(pts) <= 0.5 + 1e-6, axis=1)
            if hits[r, 0] < 0:
                assert inside.sum() <= 2  # grazing tolerance
            else:
                tin = ts[inside]
                assert abs(hits[r, 0] - max(tin.min(), 0)) < 2e-3
                assert abs(hits[r, 1] - tin.max()) < 2e-3

    def test_near_clamp(self):
        # ray starting inside the box: t1 -> clamped to NEAR_DISTANCE
        o = jnp.zeros((1, 3))
        d = jnp.asarray([[1.0, 0.0, 0.0]])
        t1, t2 = scene_near_far(o, d, jnp.zeros(3), jnp.full(3, 0.5))
        assert float(t1[0]) == pytest.approx(0.01)
        assert float(t2[0]) == pytest.approx(0.5)

    def test_sphere(self):
        o = jnp.asarray([[0.0, 0.0, -5.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        hits = ray_sphere_intersect(
            o, d, jnp.zeros((1, 3)), jnp.asarray([1.0])
        )
        assert float(hits[0, 0, 0]) == pytest.approx(4.0, abs=1e-5)
        assert float(hits[0, 0, 1]) == pytest.approx(6.0, abs=1e-5)


class TestSH:
    def test_unitarity(self):
        # sum over coeffs of Y^2 = sum_l (2l+1)/(4 pi) = 4/pi for degree 4
        rng = np.random.default_rng(3)
        d = rng.standard_normal((256, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        y = np.asarray(sh_encode((jnp.asarray(d) + 1) / 2, degree=4))
        assert y.shape == (256, 16)
        np.testing.assert_allclose(
            (y**2).sum(1), 16 / (4 * np.pi), rtol=1e-4
        )

    def test_known_values(self):
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        y = np.asarray(sh_encode_dir(d))
        assert y[0, 0] == pytest.approx(0.28209479)
        assert y[0, 2] == pytest.approx(0.48860251)  # ~ z
        assert y[0, 1] == pytest.approx(0.0, abs=1e-6)


class TestTruncExp:
    def test_value_and_grad(self):
        x = jnp.asarray([-20.0, -1.0, 0.0, 1.0, 20.0])
        np.testing.assert_allclose(
            np.asarray(trunc_exp(x)), np.exp(np.asarray(x)), rtol=1e-5
        )
        g = jax.grad(lambda v: trunc_exp(v).sum())(x)
        expect = np.exp(np.clip(np.asarray(x), -15, 15))
        np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-5)
