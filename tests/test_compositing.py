"""Compositing + distortion tests vs sequential numpy emulation of
volumerendering.cu / losses.cu, including gradient checks against finite
differences (the CUDA backward is the analytic VJP of the same function)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from radnerf_tpu.ops.compositing import (
    composite_train,
    composite_test_block,
)
from radnerf_tpu.ops.distortion import distortion_loss


def np_composite(sigmas, rgbs, deltas, ts, n_samples, thr=1e-4):
    """Emulation of composite_train_fw_kernel (volumerendering.cu:6-84)."""
    N, S = sigmas.shape
    opacity = np.zeros(N)
    depth = np.zeros(N)
    rgb = np.zeros((N, 3))
    ws = np.zeros((N, S))
    for r in range(N):
        T = 1.0
        for s in range(n_samples[r]):
            a = 1.0 - np.exp(-sigmas[r, s] * deltas[r, s])
            w = a * T
            rgb[r] += w * rgbs[r, s]
            depth[r] += w * ts[r, s]
            opacity[r] += w
            ws[r, s] = w
            T *= 1.0 - a
            if T <= thr:
                break
    return opacity, depth, rgb, ws


def rand_batch(seed=0, N=16, S=32, hot=False):
    rng = np.random.default_rng(seed)
    sig = rng.uniform(0, 30.0 if hot else 3.0, (N, S)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (N, S, 3)).astype(np.float32)
    deltas = np.full((N, S), 0.01, np.float32)
    ts = 0.5 + np.cumsum(deltas, 1).astype(np.float32)
    n = rng.integers(0, S + 1, N)
    valid = np.arange(S)[None, :] < n[:, None]
    return sig, rgbs, deltas, ts, n, valid


class TestCompositeTrain:
    @pytest.mark.slow  # compile-heavy: slow tier (VERDICT r3 #7)
    def test_golden(self):
        for hot in (False, True):  # hot=True exercises the early stop
            sig, rgbs, deltas, ts, n, valid = rand_batch(seed=1, hot=hot)
            out = composite_train(
                jnp.asarray(sig), jnp.asarray(rgbs), jnp.asarray(deltas),
                jnp.asarray(ts), jnp.asarray(valid),
            )
            o, d, c, w = np_composite(sig, rgbs, deltas, ts, n)
            np.testing.assert_allclose(out["opacity"], o, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(out["depth"], d, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(out["rgb"], c, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(out["ws"], w, rtol=1e-3, atol=1e-5)

    def test_grads_vs_fd(self):
        sig, rgbs, deltas, ts, n, valid = rand_batch(seed=2, N=4, S=8)
        sig_j = jnp.asarray(sig)

        def loss(s):
            out = composite_train(
                s, jnp.asarray(rgbs), jnp.asarray(deltas),
                jnp.asarray(ts), jnp.asarray(valid),
            )
            return (
                out["rgb"].sum()
                + 2.0 * out["opacity"].sum()
                + 0.5 * out["depth"].sum()
                + 0.1 * (out["ws"] ** 2).sum()
            )

        g = np.asarray(jax.grad(loss)(sig_j))
        f0 = float(loss(sig_j))
        eps = 1e-3
        rng = np.random.default_rng(0)
        for _ in range(8):
            r, s = rng.integers(4), rng.integers(8)
            f1 = float(loss(sig_j.at[r, s].add(eps)))
            fd = (f1 - f0) / eps
            assert abs(fd - g[r, s]) < 5e-3, (r, s, fd, g[r, s])

    def test_rgb_grads_masked_by_weight(self):
        sig, rgbs, deltas, ts, n, valid = rand_batch(seed=3, N=4, S=8)

        def loss(c):
            out = composite_train(
                jnp.asarray(sig), c, jnp.asarray(deltas), jnp.asarray(ts),
                jnp.asarray(valid),
            )
            return out["rgb"].sum()

        g = np.asarray(jax.grad(loss)(jnp.asarray(rgbs)))
        out = composite_train(
            jnp.asarray(sig), jnp.asarray(rgbs), jnp.asarray(deltas),
            jnp.asarray(ts), jnp.asarray(valid),
        )
        # dL/drgbs[s] = dL/drgb * w[s]  (volumerendering.cu:136-138)
        np.testing.assert_allclose(
            g, np.broadcast_to(np.asarray(out["ws"])[..., None], g.shape),
            rtol=1e-4, atol=1e-6,
        )


class TestCompositeTestBlocks:
    def test_resumable_equals_oneshot(self):
        sig, rgbs, deltas, ts, n, valid = rand_batch(seed=4, N=8, S=32,
                                                     hot=True)
        full = composite_train(
            jnp.asarray(sig), jnp.asarray(rgbs), jnp.asarray(deltas),
            jnp.asarray(ts), jnp.asarray(valid),
        )
        acc = {
            "opacity": jnp.zeros(8),
            "depth": jnp.zeros(8),
            "rgb": jnp.zeros((8, 3)),
            "transmittance": jnp.ones(8),
            "alive": jnp.ones(8, bool),
        }
        for blk in range(4):  # four blocks of 8 samples
            sl = slice(blk * 8, (blk + 1) * 8)
            acc = composite_test_block(
                jnp.asarray(sig[:, sl]), jnp.asarray(rgbs[:, sl]),
                jnp.asarray(deltas[:, sl]), jnp.asarray(ts[:, sl]),
                jnp.asarray(valid[:, sl]), acc,
            )
        np.testing.assert_allclose(
            acc["opacity"], full["opacity"], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(acc["rgb"], full["rgb"], rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(acc["depth"], full["depth"], rtol=1e-4,
                                   atol=1e-5)


class TestDistortion:
    def test_equals_naive_double_sum(self):
        rng = np.random.default_rng(5)
        N, S = 8, 16
        w = rng.uniform(0, 0.2, (N, S)).astype(np.float32)
        deltas = np.full((N, S), 0.01, np.float32)
        ts = 0.5 + np.cumsum(deltas, 1).astype(np.float32)
        n = rng.integers(1, S + 1, N)
        valid = np.arange(S)[None, :] < n[:, None]
        got = np.asarray(
            distortion_loss(
                jnp.asarray(w), jnp.asarray(deltas), jnp.asarray(ts),
                jnp.asarray(valid),
            )
        )
        for r in range(N):
            m = n[r]
            wi, ti = w[r, :m], ts[r, :m]
            naive = (
                np.abs(ti[:, None] - ti[None, :]) * wi[:, None] * wi[None, :]
            ).sum() + (wi**2 * deltas[r, :m]).sum() / 3.0
            assert abs(got[r] - naive) < 1e-4


class TestBlockedSegmentedCumsum:
    def test_matches_scan_reference(self):
        """The blocked two-level segmented cumsum must agree with the
        associative-scan reference across block boundaries, long
        segments spanning many blocks, and multi-channel values."""
        import jax.numpy as jnp
        import numpy as np

        from radnerf_tpu.ops.compositing import (
            segmented_cumsum,
            segmented_cumsum_scan,
        )

        rng = np.random.default_rng(0)
        # (1024, 0.0) reuses the (1024, 0.3) shape so the whole-array-
        # single-segment edge costs no extra jit specialization (this
        # test is compile-bound: each distinct B is 4 compiles)
        for B, p_start in ((1500, 0.02), (1024, 0.3), (1024, 0.0)):
            v = rng.standard_normal(B).astype(np.float32)
            starts = rng.random(B) < p_start
            starts[0] = True
            got = segmented_cumsum(jnp.asarray(v), jnp.asarray(starts))
            ref = segmented_cumsum_scan(jnp.asarray(v), jnp.asarray(starts))
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4
            )
            v3 = rng.standard_normal((B, 3)).astype(np.float32)
            got3 = segmented_cumsum(jnp.asarray(v3), jnp.asarray(starts))
            ref3 = segmented_cumsum_scan(jnp.asarray(v3), jnp.asarray(starts))
            np.testing.assert_allclose(
                np.asarray(got3), np.asarray(ref3), rtol=1e-5, atol=1e-4
            )
