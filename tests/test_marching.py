"""Ray-marching tests: sequential numpy emulation of the CUDA kernel
(raymarching.cu:166-332, including DDA empty-space skip) vs the closed-form
lattice marcher. With a single cascade the sample sets must match exactly."""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from radnerf_tpu.ops.marching import (
    MarchConfig,
    march_rays_train,
    march_rays_test_block,
    sample_lattice,
    calc_dt,
)

SQRT3 = math.sqrt(3.0)


def np_calc_dt(t, cfg):
    return float(np.clip(t * cfg.exp_step_factor, cfg.dt_min, cfg.dt_max))


def np_mip_from_pos(x, cascades):
    mx = np.max(np.abs(x))
    e = np.frexp(mx)[1]
    return min(cascades - 1, max(0, e + 1))


def np_mip_from_dt(dt, grid_size, cascades):
    e = np.frexp(dt * grid_size)[1]
    return min(cascades - 1, max(0, e))


def np_march_ray(o, d, t1, t2, occ, cfg):
    """Faithful emulation of raymarching_train_kernel for one ray."""
    G = cfg.grid_size
    samples = []
    t = t1
    if t1 < 0:
        return samples
    while 0 <= t < t2 and len(samples) < cfg.max_samples:
        x = o + t * d
        dt = np_calc_dt(t, cfg)
        mip = max(
            np_mip_from_pos(x, cfg.cascades),
            np_mip_from_dt(dt, G, cfg.cascades),
        )
        mip_bound = min(2.0 ** (mip - 1), cfg.scale)
        n = np.clip(0.5 * (x / mip_bound + 1) * G, 0, G - 1).astype(int)
        if occ[mip, n[0], n[1], n[2]]:
            samples.append((t, dt))
            t += dt
        else:  # DDA skip to next voxel boundary, stepping the same lattice
            tb = (
                ((n + 0.5 + 0.5 * np.sign(d)) / G * 2 - 1) * mip_bound - x
            ) / d
            t_target = t + max(0.0, tb.min())
            while t < t_target:
                t += np_calc_dt(t, cfg)
    return samples


def make_sphere_occ(cfg, radius=0.3):
    """Occupancy: a sphere of given radius in the finest cascade; coarser
    cascades fully occupied."""
    G = cfg.grid_size
    lin = (np.arange(G) + 0.5) / G * 2 - 1  # cell centers in [-1, 1]
    xx, yy, zz = np.meshgrid(lin, lin, lin, indexing="ij")
    r = np.sqrt(xx**2 + yy**2 + zz**2) * cfg.scale
    occ = np.ones((cfg.cascades, G, G, G), bool)
    occ[0] = r < radius
    return occ


def run_case(cfg, n_rays=32, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-0.2, 0.2, (n_rays, 3)).astype(np.float32)
    o[:, 2] = -cfg.scale * 1.5  # start outside the box
    d = rng.standard_normal((n_rays, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    occ = make_sphere_occ(cfg)

    # AABB times
    from radnerf_tpu.ops.intersection import scene_near_far

    t1, t2 = scene_near_far(
        jnp.asarray(o), jnp.asarray(d),
        jnp.zeros(3), jnp.full(3, cfg.scale),
    )
    out = march_rays_train(
        jnp.asarray(o), jnp.asarray(d), t1, t2, jnp.asarray(occ), cfg,
        noise=None,
    )
    return o, d, np.asarray(t1), np.asarray(t2), occ, out


class TestLattice:
    def test_matches_sequential_stepping(self):
        for f in (0.0, 1 / 256):
            cfg = MarchConfig(scale=4.0, exp_step_factor=f, cascades=4)
            t0 = 0.05
            # sequential reference
            ts = [t0]
            for _ in range(300):
                ts.append(ts[-1] + np_calc_dt(ts[-1], cfg))
            got = np.asarray(
                sample_lattice(
                    jnp.full((1,), t0), jnp.arange(301)[None, :], cfg
                )
            )[0]
            np.testing.assert_allclose(got, ts, rtol=2e-4, atol=1e-5)


class TestMarchTrain:
    def test_golden_synthetic(self):
        cfg = MarchConfig(
            scale=0.5, cascades=1, exp_step_factor=0.0, samples_per_ray=256
        )
        o, d, t1, t2, occ, out = run_case(cfg)
        ts = np.asarray(out["ts"])
        n = np.asarray(out["n_samples"])
        for r in range(len(o)):
            ref = np_march_ray(o[r], d[r], t1[r], t2[r], occ, cfg)
            ref_t = np.array([s[0] for s in ref])
            take = min(len(ref), cfg.samples_per_ray)
            assert n[r] == take, f"ray {r}: {n[r]} vs {len(ref)}"
            np.testing.assert_allclose(
                ts[r, :take], ref_t[:take], rtol=1e-4, atol=1e-5
            )

    def test_golden_exp_stepping(self):
        cfg = MarchConfig(
            scale=0.5, cascades=1, exp_step_factor=1 / 256,
            samples_per_ray=256,
        )
        o, d, t1, t2, occ, out = run_case(cfg, seed=3)
        ts = np.asarray(out["ts"])
        n = np.asarray(out["n_samples"])
        for r in range(len(o)):
            ref = np_march_ray(o[r], d[r], t1[r], t2[r], occ, cfg)
            take = min(len(ref), cfg.samples_per_ray)
            assert abs(int(n[r]) - take) <= 1  # fp boundary tolerance
            m = min(int(n[r]), take)
            np.testing.assert_allclose(
                ts[r, :m], np.array([s[0] for s in ref])[:m],
                rtol=1e-3, atol=1e-4,
            )

    def test_miss_rays_get_zero_samples(self):
        cfg = MarchConfig(scale=0.5, cascades=1)
        o = jnp.asarray([[2.0, 2.0, 2.0]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])  # pointing away
        occ = jnp.ones((1, 128, 128, 128), bool)
        out = march_rays_train(
            o, d, jnp.asarray([-1.0]), jnp.asarray([-1.0]), occ, cfg
        )
        assert int(out["n_samples"][0]) == 0
        assert not bool(out["valid"].any())


class TestMarchTest:
    @pytest.mark.slow  # compile-heavy: slow tier (VERDICT r3 #7)
    def test_blocks_cover_train_lattice(self):
        """Repeated test-time blocks must enumerate the same occupied
        samples as one train-time march."""
        cfg = MarchConfig(
            scale=0.5, cascades=1, exp_step_factor=0.0, samples_per_ray=512
        )
        o, d, t1, t2, occ, out = run_case(cfg, seed=5, n_rays=8)
        want_ts = np.asarray(out["ts"])
        want_n = np.asarray(out["n_samples"])

        cursor = jnp.asarray(t1)
        collected = [[] for _ in range(8)]
        for _ in range(40):
            blk = march_rays_test_block(
                jnp.asarray(o), jnp.asarray(d), cursor, jnp.asarray(t2),
                jnp.asarray(occ), cfg, n_samples=32, k_block=128,
            )
            bts = np.asarray(blk["ts"])
            bn = np.asarray(blk["n_eff"])
            for r in range(8):
                collected[r].extend(bts[r, : bn[r]].tolist())
            cursor = blk["new_cursor"]
        for r in range(8):
            got = np.array(collected[r][: want_n[r]])
            np.testing.assert_allclose(
                got, want_ts[r, : want_n[r]], rtol=1e-3, atol=1e-4
            )


class TestCalcDt:
    def test_clamps(self):
        cfg = MarchConfig(scale=8.0, exp_step_factor=1 / 256)
        t = jnp.asarray([0.0, 0.2, 30.0, 1e5])
        dt = np.asarray(calc_dt(t, cfg))
        assert dt[0] == np.float32(cfg.dt_min)
        assert dt[1] == np.float32(cfg.dt_min)  # 0.2/256 < dt_min
        assert abs(dt[2] - 30.0 / 256) < 1e-6
        assert dt[3] == np.float32(cfg.dt_max)


class TestOccupancyRunDedup:
    def test_matches_full_gather(self):
        """occupancy_lookup_runs is exact: per-block run dedup merges only
        candidates with identical (mip, cell) flat indices."""
        import jax

        from radnerf_tpu.ops.marching import (
            occupancy_lookup, occupancy_lookup_runs,
        )

        cfg = MarchConfig(scale=0.5, cascades=1, grid_size=64)
        rng = np.random.default_rng(3)
        occ = jnp.asarray(rng.random((1, 64, 64, 64)) < 0.3)
        N, K = 16, 300   # K not a multiple of the 256 block: exercises pad
        o = rng.normal(size=(N, 3))
        o = o / np.linalg.norm(o, axis=1, keepdims=True) * 1.2
        d = -o / np.linalg.norm(o, axis=1, keepdims=True)
        t = 0.7 + np.arange(K) * cfg.dt_min
        xyz = jnp.asarray(
            o[:, None, :] + t[None, :, None] * d[:, None, :], jnp.float32
        )
        dt = jnp.full((N, K), cfg.dt_min, jnp.float32)
        full = occupancy_lookup(xyz, dt, occ, cfg)
        ded = occupancy_lookup_runs(xyz, dt, occ, cfg)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(ded))

    @pytest.mark.tpu
    def test_matches_full_gather_large_grid_tpu(self):
        """TPU-semantics exactness: at G=128 flat indices reach 2^21,
        far past bf16's ~8-bit mantissa. The sort-free compaction's
        one-hot index matmul MUST therefore run at Precision.HIGHEST on
        TPU (ADVICE r4 high) — this test runs on the real device (where
        default matmul precision truncates f32 operands to bf16) and
        fails if the einsum ever loses that annotation. CPU runs skip:
        CPU matmuls are true-f32 and cannot detect the truncation."""
        import jax

        if jax.default_backend() in ("cpu",):
            pytest.skip("needs accelerator matmul semantics")
        from radnerf_tpu.ops.marching import (
            occupancy_lookup, occupancy_lookup_runs,
        )

        cfg = MarchConfig(scale=0.5, cascades=1, grid_size=128)
        rng = np.random.default_rng(7)
        occ = jnp.asarray(rng.random((1, 128, 128, 128)) < 0.15)
        N, K = 64, 512
        o = rng.normal(size=(N, 3))
        o = o / np.linalg.norm(o, axis=1, keepdims=True) * 1.2
        d = -o / np.linalg.norm(o, axis=1, keepdims=True)
        t = 0.7 + np.arange(K) * cfg.dt_min
        xyz = jnp.asarray(
            o[:, None, :] + t[None, :, None] * d[:, None, :], jnp.float32
        )
        dt = jnp.full((N, K), cfg.dt_min, jnp.float32)
        full = occupancy_lookup(xyz, dt, occ, cfg)
        ded = occupancy_lookup_runs(xyz, dt, occ, cfg)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(ded))

    def test_exp_stepping_falls_back(self):
        """Non-zero exp_step_factor (unbounded configs) must route to the
        plain gather — the run cap derivation assumes dt == dt_min."""
        from radnerf_tpu.ops.marching import (
            occupancy_lookup, occupancy_lookup_runs,
        )

        cfg = MarchConfig(scale=4.0, cascades=4, grid_size=32,
                          exp_step_factor=1 / 256)
        rng = np.random.default_rng(4)
        occ = jnp.asarray(rng.random((4, 32, 32, 32)) < 0.3)
        xyz = jnp.asarray(rng.normal(size=(8, 64, 3)) * 2, jnp.float32)
        dt = jnp.asarray(rng.random((8, 64)) * 0.05 + 0.001, jnp.float32)
        full = occupancy_lookup(xyz, dt, occ, cfg)
        ded = occupancy_lookup_runs(xyz, dt, occ, cfg)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(ded))


class TestOccupancyBricks:
    def _stream(self, cfg, N, K, seed=3, occ_p=0.3):
        rng = np.random.default_rng(seed)
        G = cfg.grid_size
        occ = jnp.asarray(rng.random((cfg.cascades, G, G, G)) < occ_p)
        o = rng.normal(size=(N, 3))
        o = o / np.linalg.norm(o, axis=1, keepdims=True) * 1.2
        d = -o / np.linalg.norm(o, axis=1, keepdims=True)
        t = 0.7 + np.arange(K) * cfg.dt_min
        xyz = jnp.asarray(
            o[:, None, :] + t[None, :, None] * d[:, None, :], jnp.float32
        )
        dt = jnp.full((N, K), cfg.dt_min, jnp.float32)
        return occ, xyz, dt

    def test_bricks_match_full_gather(self):
        """occupancy_lookup_bricks is exact on a ray stream that engages
        the brick-dedup kernel (N*Kp divisible by the extract grid)."""
        from radnerf_tpu.ops.marching import (
            occupancy_lookup, occupancy_lookup_bricks,
        )

        cfg = MarchConfig(scale=0.5, cascades=1, grid_size=64)
        # N=32, K=256 -> Kp=256, nb=32: kernel path (OCC_GBLK=32)
        occ, xyz, dt = self._stream(cfg, 32, 256)
        full = occupancy_lookup(xyz, dt, occ, cfg)
        got = occupancy_lookup_bricks(xyz, dt, occ, cfg)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(got))

    def test_bricks_random_points_fall_back(self):
        """Spatially-random candidates overflow the brick run cap -> the
        lax.cond fallback reproduces the plain gather exactly."""
        from radnerf_tpu.ops.marching import (
            occupancy_lookup, occupancy_lookup_bricks,
        )

        cfg = MarchConfig(scale=0.5, cascades=1, grid_size=64)
        rng = np.random.default_rng(11)
        occ = jnp.asarray(rng.random((1, 64, 64, 64)) < 0.3)
        xyz = jnp.asarray(
            rng.uniform(-0.45, 0.45, size=(32, 256, 3)), jnp.float32
        )
        dt = jnp.full((32, 256), cfg.dt_min, jnp.float32)
        full = occupancy_lookup(xyz, dt, occ, cfg)
        got = occupancy_lookup_bricks(xyz, dt, occ, cfg)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(got))

    def test_pack_occ_bricks_layout(self):
        from radnerf_tpu.ops.marching import OCC_BRICK, pack_occ_bricks

        rng = np.random.default_rng(5)
        G = 16
        occ = rng.random((1, G, G, G)) < 0.5
        rows = np.asarray(pack_occ_bricks(jnp.asarray(occ)), np.float32)
        bx, by, bz = OCC_BRICK
        for _ in range(50):
            x, y, z = rng.integers(0, G, size=3)
            bk = ((x // bx) * (G // by) + y // by) * (G // bz) + z // bz
            lane = (x % bx) + (y % by) * bx + (z % bz) * bx * by
            assert rows[bk, lane] == float(occ[0, x, y, z])
