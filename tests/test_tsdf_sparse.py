"""Sparse (banded) TSDF: equivalence with the dense path + classification."""

import jax.numpy as jnp
import numpy as np
import pytest

from hive_tpu.ops.tsdf import TSDFVolume
from hive_tpu.ops.tsdf_sparse import SparseTSDFVolume
from tests.test_tsdf import H, K, W, look_at_pose, render_sphere_depth


def _frames(num_frames=3, seed=0):
    rng = np.random.default_rng(seed)
    depths = rng.uniform(0.8, 2.5, size=(num_frames, H, W)).astype(np.float32)
    colors = rng.integers(0, 255, size=(num_frames, H, W, 3)).astype(np.uint8)

    poses = np.tile(np.eye(4, dtype=np.float32), (num_frames, 1, 1))
    # Irrational-ish offsets keep voxel centres off exact half-pixel
    # boundaries, where fp32 evaluation-order differences between the dense
    # and sparse paths legitimately round to different pixels.
    poses[:, 0, 3] = np.linspace(0.0, 0.3, num_frames) + 0.01237
    poses[:, 1, 3] = 0.00731

    return depths, colors, poses


BOUNDS = np.array([[-1.6, 1.6], [-1.6, 1.6], [0.0, 3.2]], dtype=np.float32)


class TestSparseEquivalence:
    def _run_both(self, depths, colors, poses, voxel=0.05, **sparse_kwargs):
        dense = TSDFVolume(BOUNDS, voxel_size=voxel)
        dense.integrate_frames(colors, depths, K, poses)

        # rgb888 is the bit-exact sampling mode; the packed production mode
        # (u16-mm depth + dithered RGB565) is covered by TestPackedSampling.
        sparse_kwargs.setdefault("color_mode", "rgb888")
        sparse = SparseTSDFVolume(BOUNDS, voxel_size=voxel, **sparse_kwargs)
        sparse.integrate_frames(colors, depths, K, poses)

        return dense, sparse

    def test_matches_dense_random_depth(self):
        depths, colors, poses = _frames()
        dense, sparse = self._run_both(depths, colors, poses)

        # Dims match (both 64^3 at these bounds).
        assert sparse.dims == dense.dims

        tsdf_d, w_d, c_d = dense.get_volume()
        tsdf_s, w_s, c_s = sparse.get_volume()

        # Allow a tiny fraction of voxels on exact pixel boundaries to differ
        # (fp32 rounding-order artefacts), everything else matches exactly.
        weight_mismatch = np.abs(w_s - w_d) > 1e-5
        assert weight_mismatch.mean() < 1e-3

        tsdf_mismatch = np.abs(tsdf_s - tsdf_d) > 1e-4
        assert tsdf_mismatch.mean() < 2e-3

        agree = ~weight_mismatch & (w_d > 0)
        np.testing.assert_allclose(c_s[agree], c_d[agree], atol=1.0)

    def test_matches_dense_with_invalid_depth(self):
        depths, colors, poses = _frames()
        depths[:, :, : W // 3] = 0.0  # a third of every image invalid

        dense, sparse = self._run_both(depths, colors, poses)

        tsdf_d, w_d, _ = dense.get_volume()
        tsdf_s, w_s, _ = sparse.get_volume()

        assert (np.abs(w_s - w_d) > 1e-5).mean() < 1e-3
        assert (np.abs(tsdf_s - tsdf_d) > 1e-4).mean() < 2e-3

    def test_matches_dense_sphere_views(self):
        center = np.zeros(3)
        poses = np.stack([look_at_pose(eye, center) for eye in
                          [(0, 0, -2.0), (2.0, 0, 0), (0, 2.0, 0.01)]]).astype(np.float32)
        depths = np.stack([render_sphere_depth(center, 0.5, p) for p in poses])
        colors = np.full((3, H, W, 3), 90, dtype=np.uint8)

        bounds = np.array([[-0.9, 0.9]] * 3, dtype=np.float32)

        dense = TSDFVolume(bounds, voxel_size=0.03)
        dense.integrate_frames(colors, depths, K, poses)
        sparse = SparseTSDFVolume(bounds, voxel_size=0.03)
        sparse.integrate_frames(colors, depths, K, poses)

        # Grids may differ in size (block rounding); compare meshes instead.
        verts_d, faces_d, _, _ = dense.get_mesh()
        verts_s, faces_s, _, _ = sparse.get_mesh()

        assert len(verts_s) > 0.8 * len(verts_d)
        radii = np.linalg.norm(verts_s, axis=-1)
        assert np.quantile(np.abs(radii - 0.5), 0.9) < 0.05

    def test_matches_dense_free_edge_blocks(self):
        """Frustum-border blocks in open space take the gather-free edge pass.

        A constant-depth wall seen from inside a wide volume puts many blocks
        partially inside the image with provably-free footprints (class
        FREE_EDGE). Their masked dist=1 updates must match the dense
        integrator's free-space voxels bit-for-bit (same projection
        rounding), modulo the usual pixel-boundary fraction.
        """
        wall_bounds = np.array([[-2.0, 2.0], [-2.0, 2.0], [0.0, 2.2]],
                               dtype=np.float32)
        depths = np.full((2, H, W), 2.0, dtype=np.float32)
        colors = np.full((2, H, W, 3), 120, dtype=np.uint8)
        poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        poses[:, 0, 3] = [0.01237, 0.11237]
        poses[:, 1, 3] = 0.00731

        dense = TSDFVolume(wall_bounds, voxel_size=0.05)
        dense.integrate_frames(colors, depths, K, poses)
        sparse = SparseTSDFVolume(wall_bounds, voxel_size=0.05,
                                  color_mode="rgb888")
        sparse.integrate_frames(colors, depths, K, poses)

        # The scene must actually exercise the FREE_EDGE class.
        integ = next(iter(sparse._integrators.values()))
        w2c = np.linalg.inv(poses[0])
        classes = np.asarray(integ.classify_refined(
            sparse.block_origins_device, jnp.asarray(depths[0]),
            jnp.asarray(w2c[:3, :3]), jnp.asarray(w2c[:3, 3]),
            jnp.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2]],
                        dtype=jnp.float32)))
        assert (classes == SparseTSDFVolume.FREE_EDGE).sum() > 20

        tsdf_d, w_d, _ = dense.get_volume()
        tsdf_s, w_s, _ = sparse.get_volume()
        # Sparse dims round up to block multiples; compare the common crop.
        X, Y, Z = tsdf_d.shape
        w_s, tsdf_s = w_s[:X, :Y, :Z], tsdf_s[:X, :Y, :Z]
        assert (np.abs(w_s - w_d) > 1e-5).mean() < 1e-3
        assert (np.abs(tsdf_s - tsdf_d) > 1e-4).mean() < 2e-3

    def test_tiny_band_capacity_multi_trip(self):
        depths, colors, poses = _frames(num_frames=1)
        dense, sparse = self._run_both(depths, colors, poses,
                                       band_capacity_fraction=0.001)

        tsdf_d, w_d, _ = dense.get_volume()
        tsdf_s, w_s, _ = sparse.get_volume()

        assert (np.abs(w_s - w_d) > 1e-5).mean() < 1e-3
        assert (np.abs(tsdf_s - tsdf_d) > 1e-4).mean() < 2e-3

    def test_zero_weight_frame_is_noop(self):
        """obs_weight = 0 must leave BOTH integrators untouched: without
        the w_obs > 0 guard, (tsdf*0 + dist*0)/1e-12 zeroed the tsdf — the
        isosurface value — at never-observed voxels on the band/dense
        paths while the FREE/edge passes (which guard) left it at 1."""
        depths, colors, poses = _frames(num_frames=1)
        zero = np.zeros((1,), np.float32)

        dense = TSDFVolume(BOUNDS, voxel_size=0.05)
        dense.integrate_frames(colors, depths, K, poses, obs_weights=zero)
        sparse = SparseTSDFVolume(BOUNDS, voxel_size=0.05,
                                  color_mode="rgb888")
        sparse.integrate_frames(colors, depths, K, poses, obs_weights=zero)

        tsdf_d, w_d, _ = dense.get_volume()
        tsdf_s, w_s, _ = sparse.get_volume()
        assert np.all(w_d == 0) and np.all(tsdf_d == 1.0)
        assert np.all(w_s == 0) and np.all(tsdf_s == 1.0)

    def test_matches_dense_with_infinite_depth(self):
        """+inf depth pixels are valid FAR SPACE in rgb888/f32 semantics
        (dist saturates to 1, like the dense path). The old pyramid let one
        +inf pixel poison its whole cell into 'no valid pixel', wrongly
        SKIPping blocks that share the cell with a real finite surface."""
        depths, colors, poses = _frames(num_frames=2)
        # A sky region: the top third of every frame reads +inf.
        depths[:, : H // 3, :] = np.inf

        dense, sparse = self._run_both(depths, colors, poses)

        tsdf_d, w_d, _ = dense.get_volume()
        tsdf_s, w_s, _ = sparse.get_volume()
        assert w_d.sum() > 0  # the scene still observes plenty
        assert (np.abs(w_s - w_d) > 1e-5).mean() < 1e-3
        assert (np.abs(tsdf_s - tsdf_d) > 1e-4).mean() < 2e-3



class TestCompactedClassification:
    """Pass-1 pyramid queries on a compacted frustum-candidate list."""

    # 4x4x2.2 m at 0.05 m / (8,8,8) blocks -> 10x10x6 = 600 blocks is below
    # the 1024-id compaction floor; this wider volume engages it.
    BIG_BOUNDS = np.array([[-4.0, 4.0], [-4.0, 4.0], [0.0, 4.0]],
                          dtype=np.float32)

    def _classify(self, volume, compact_cap, depth, pose):
        integ = volume._integrators.setdefault(
            ("t", compact_cap),
            volume._build_integrator(H, W, compact_cap=compact_cap))
        w2c = np.linalg.inv(pose)
        return np.asarray(integ.classify(
            volume.block_origins_device, jnp.asarray(depth),
            jnp.asarray(w2c[:3, :3]), jnp.asarray(w2c[:3, 3]),
            jnp.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2]],
                        dtype=jnp.float32)))

    def test_compacted_matches_full_query(self):
        """Inside-looking camera: compacted == full classification."""
        volume = SparseTSDFVolume(self.BIG_BOUNDS, voxel_size=0.05)
        cap = max(1024, 3 * volume.num_blocks // 8)
        assert cap < volume.num_blocks, "scene too small to engage compaction"

        depth = np.full((H, W), 2.0, dtype=np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.01237

        frac = volume.estimate_candidate_fraction(K, pose[None], H, W)
        from hive_tpu.ops.tsdf_sparse import pick_compact_cap
        assert pick_compact_cap(frac) is not None  # a compacted level fits

        full = self._classify(volume, None, depth, pose)
        compacted = self._classify(volume, 0.375, depth, pose)
        np.testing.assert_array_equal(full, compacted)

    def test_overflow_is_conservative_band(self):
        """Candidates beyond capacity stay BAND (correct, just slower)."""
        # An outside-in camera 6 m back sees the whole volume: candidate
        # count far exceeds the 3/8 capacity.
        volume = SparseTSDFVolume(self.BIG_BOUNDS, voxel_size=0.05)
        pose = look_at_pose((0.0, 0.0, -6.0), (0.0, 0.0, 2.0)).astype(
            np.float32)

        frac = volume.estimate_candidate_fraction(K, pose[None], H, W)
        assert frac > 0.375  # a 3/8 capacity would overflow on this view

        depth = np.full((H, W), 8.0, dtype=np.float32)
        full = self._classify(volume, None, depth, pose)
        compacted = self._classify(volume, 0.375, depth, pose)

        # Wherever the compacted pass decided at all, it matches; the
        # overflow remainder must be conservative BAND, never SKIP/FREE.
        differs = compacted != full
        assert (compacted[differs] == SparseTSDFVolume.BAND).all()

    def test_integrate_matches_dense_despite_overflow(self):
        """Forcing the compacted build on an overflowing view stays correct."""
        pose = look_at_pose((0.0, 0.0, -6.0), (0.0, 0.0, 2.0)).astype(
            np.float32)
        depth = render_sphere_depth((0.0, 0.0, 2.0), 1.0, pose) + 0.0
        colors = np.full((1, H, W, 3), 90, dtype=np.uint8)

        dense = TSDFVolume(self.BIG_BOUNDS, voxel_size=0.05)
        dense.integrate_frames(colors, depth[None], K, pose[None])

        sparse = SparseTSDFVolume(self.BIG_BOUNDS, voxel_size=0.05,
                                  color_mode="rgb888")
        # Bypass integrate_frames' host heuristic: force an overflowing cap.
        integ = sparse._integrators[(H, W, 0.375)] = \
            sparse._build_integrator(H, W, compact_cap=0.375)
        w2c = np.linalg.inv(pose)
        sparse.state = integ.scan(
            sparse.state, sparse.block_origins_device,
            jnp.asarray(depth[None]), jnp.asarray(colors, jnp.float32),
            jnp.asarray(w2c[None]),
            jnp.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2]],
                        dtype=jnp.float32),
            jnp.ones((1,), jnp.float32))

        tsdf_d, w_d, _ = dense.get_volume()
        tsdf_s, w_s, _ = sparse.get_volume()
        X, Y, Z = tsdf_d.shape
        w_s, tsdf_s = w_s[:X, :Y, :Z], tsdf_s[:X, :Y, :Z]
        assert (np.abs(w_s - w_d) > 1e-5).mean() < 1e-3
        assert (np.abs(tsdf_s - tsdf_d) > 1e-4).mean() < 2e-3


class TestPackedSampling:
    """rgb565d16 (one-gather production sampling) vs exact rgb888."""

    def test_packed_close_to_exact(self):
        depths, colors, poses = _frames()

        exact = SparseTSDFVolume(BOUNDS, voxel_size=0.05, color_mode="rgb888")
        exact.integrate_frames(colors, depths, K, poses)

        packed = SparseTSDFVolume(BOUNDS, voxel_size=0.05,
                                  color_mode="rgb565d16")
        packed.integrate_frames(colors, depths, K, poses)

        tsdf_e, w_e, c_e = exact.get_volume()
        tsdf_p, w_p, c_p = packed.get_volume()

        # Depth quantises to 0.5 mm -> tsdf moves by <= 0.0005/trunc(0.25)
        # = 0.002; the 0.5 mm shift can also flip voxels across the
        # sdf >= -trunc boundary, so allow a tiny weight-mismatch fraction.
        weight_same = np.abs(w_p - w_e) < 1e-5
        assert (~weight_same).mean() < 1e-3

        both = weight_same & (w_e > 0)
        assert np.abs(tsdf_p - tsdf_e)[both].max() < 0.005

        # RGB565 + 2x2 dither: per-channel error bounded by one quantisation
        # step (255/31 ~ 8.2), and it dithers toward the mean over frames.
        assert np.abs(c_p - c_e)[both].max() < 9.0
        assert np.abs(c_p - c_e)[both].mean() < 3.0

    def test_gather_split_is_value_identical(self):
        # gather_split only re-decomposes the band pixel take into several
        # independent gather ops (a latency-overlap optimisation on TPU);
        # every split must produce bit-identical state.
        depths, colors, poses = _frames()

        reference = SparseTSDFVolume(BOUNDS, voxel_size=0.05, gather_split=1)
        reference.integrate_frames(colors, depths, K, poses)

        # One non-trivial split suffices: the contract is that the op
        # DECOMPOSITION is value-free, and each extra split value costs a
        # full integrator compile on the one-core CI host.
        for split in (2,):
            volume = SparseTSDFVolume(BOUNDS, voxel_size=0.05,
                                      gather_split=split)
            volume.integrate_frames(colors, depths, K, poses)

            for field in ("tsdf", "weight", "color"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(volume.state, field)),
                    np.asarray(getattr(reference.state, field)),
                    err_msg=f"gather_split={split} changed {field}")

    def test_depth_beyond_u16_range_is_invalid_not_wrapped(self):
        # 70 m depth exceeds the u16-mm range the packed sampler can
        # represent: it must be INVALID end-to-end — never wrap around to a
        # small depth (fabricating a near surface), and never update at all
        # (round-5 review: the old pyramid counted it valid, so FREE blocks
        # updated while band blocks sampled the invalid packed 0 and did
        # not — classification-dependent state).
        depths = np.full((1, H, W), 70.0, dtype=np.float32)
        colors = np.zeros((1, H, W, 3), dtype=np.uint8)
        poses = np.eye(4, dtype=np.float32)[None]

        volume = SparseTSDFVolume(BOUNDS, voxel_size=0.05,
                                  color_mode="rgb565d16")
        volume.integrate_frames(colors, depths, K, poses)

        tsdf, weight, _ = volume.get_volume()
        assert weight.sum() == 0.0
        assert tsdf.min() == 1.0  # no wraparound surface fabricated


class TestBF16Storage:
    def test_bf16_matches_fp32_closely(self):
        depths, colors, poses = _frames()

        fp32 = SparseTSDFVolume(BOUNDS, voxel_size=0.05)
        fp32.integrate_frames(colors, depths, K, poses)

        bf16 = SparseTSDFVolume(BOUNDS, voxel_size=0.05, dtype=jnp.bfloat16)
        bf16.integrate_frames(colors, depths, K, poses)

        assert bf16.state.tsdf.dtype == jnp.bfloat16

        tsdf_f, w_f, c_f = fp32.get_volume()
        tsdf_b, w_b, c_b = bf16.get_volume()

        observed = w_f > 0
        # bf16 has ~8 mantissa bits: |tsdf| <= 1 stores to ~4e-3.
        assert np.abs(tsdf_b - tsdf_f)[observed].max() < 0.02
        np.testing.assert_allclose(w_b, w_f, atol=0.05)
        assert np.abs(c_b - c_f)[observed].max() < 4.0

    def test_bf16_mesh_extraction_works(self):
        depths, colors, poses = _frames(num_frames=1)
        volume = SparseTSDFVolume(BOUNDS, voxel_size=0.05, dtype=jnp.bfloat16)
        volume.integrate_frames(colors, depths, K, poses)

        verts, faces, normals, vcols = volume.get_mesh()
        assert len(verts) > 0 and len(faces) > 0
        assert verts.dtype == np.float32


class TestBlockedExtraction:
    """get_mesh reads the block-major state directly; it must match the
    generic dense-volume extraction path bit-for-bit."""

    def _volume(self):
        depths, colors, poses = _frames(num_frames=2)
        vol = SparseTSDFVolume(BOUNDS, voxel_size=0.05, color_mode="rgb888")
        vol.integrate_frames(colors, depths, K, poses)
        return vol

    def test_matches_dense_extraction(self):
        from hive_tpu.ops.marching import extract_isosurface

        vol = self._volume()
        verts_b, faces_b, _, cols_b = vol.get_mesh()

        tsdf, weight, color = vol._dense()
        verts_d, faces_d, cols_d, _ = extract_isosurface(
            tsdf, weight, color, origin=vol.origin,
            voxel_size=vol.voxel_size)

        assert len(verts_b) > 0
        np.testing.assert_allclose(verts_b, verts_d, atol=1e-5)
        np.testing.assert_array_equal(faces_b, faces_d)
        np.testing.assert_array_equal(cols_b, cols_d)

    def test_permuted_blocks_extract_identically(self):
        vol = self._volume()
        verts_ref, faces_ref, _, _ = vol.get_mesh()

        perm = np.random.default_rng(3).permutation(vol.num_blocks)
        vol.apply_block_permutation(perm)
        verts_p, faces_p, _, _ = vol.get_mesh()

        np.testing.assert_allclose(verts_p, verts_ref, atol=1e-5)
        np.testing.assert_array_equal(faces_p, faces_ref)


class TestSparseProperties:
    def test_dims_round_to_block_multiple(self):
        volume = SparseTSDFVolume(np.array([[0.0, 0.9]] * 3), voxel_size=0.05,
                                  block_size=16)
        assert all(d % 16 == 0 for d in volume.dims)

    def test_unseen_volume_stays_unobserved(self):
        depths = np.zeros((1, H, W), dtype=np.float32)
        colors = np.zeros((1, H, W, 3), dtype=np.uint8)
        poses = np.eye(4, dtype=np.float32)[None]

        volume = SparseTSDFVolume(BOUNDS, voxel_size=0.1)
        volume.integrate_frames(colors, depths, K, poses)

        _, weight, _ = volume.get_volume()
        assert weight.sum() == 0


class TestPallasSampler:
    """The Pallas block-window sampler (ops/pallas_sampler.py) fetches the
    same packed words as the take path, so integration must be bit-identical.
    The compiled kernel is TPU-only; CPU CI runs it in the Pallas
    interpreter."""

    def test_interpret_matches_take_path(self):
        height, width = 64, 256  # smallest frame the 64x256 window allows
        k = np.array([[90.0, 0.0, (width - 1) / 2],
                      [0.0, 90.0, (height - 1) / 2],
                      [0.0, 0.0, 1.0]], np.float32)
        rng = np.random.default_rng(3)
        # ONE frame: the contract (sampled words identical to the take path)
        # is per-frame; the interpreter runs ~linear in frames on one core.
        num_frames = 1
        depths = rng.uniform(0.8, 1.8,
                             (num_frames, height, width)).astype(np.float32)
        colors = rng.integers(
            0, 255, (num_frames, height, width, 3)).astype(np.uint8)
        poses = np.tile(np.eye(4, dtype=np.float32), (num_frames, 1, 1))
        poses[:, 0, 3] = [0.0123]

        bounds = np.array([[-0.5, 0.5], [-0.5, 0.5], [0.0, 1.2]], np.float32)

        # Small trips: the interpreted kernel emulation is traced per grid
        # row, so the default 128-row chunk costs ~10 s of tracing alone.
        take = SparseTSDFVolume(bounds, voxel_size=1.0 / 16,
                                pallas_sampler=False, chunk_voxels=4096)
        take.integrate_frames(colors, depths, k, poses)

        pallas = SparseTSDFVolume(bounds, voxel_size=1.0 / 16,
                                  pallas_sampler="interpret",
                                  chunk_voxels=4096)
        pallas.integrate_frames(colors, depths, k, poses)

        integ = next(iter(pallas._integrators.values()))
        assert integ.use_pallas, "sampler gate rejected a qualifying shape"

        assert float(jnp.sum(pallas.state.weight.astype(jnp.float32))) > 0
        for name in ("tsdf", "weight", "color"):
            np.testing.assert_array_equal(
                np.asarray(getattr(take.state, name)),
                np.asarray(getattr(pallas.state, name)), err_msg=name)

    def test_small_window_class_bit_identical(self, monkeypatch):
        """Routing band blocks between the small- and large-window sampler
        classes must not change a single bit vs the single-window build —
        every block integrates exactly once, through exactly one path."""
        height, width = 64, 256
        k = np.array([[90.0, 0.0, (width - 1) / 2],
                      [0.0, 90.0, (height - 1) / 2],
                      [0.0, 0.0, 1.0]], np.float32)
        rng = np.random.default_rng(11)
        # ONE frame (see test_interpret_matches_take_path): routing is
        # per-frame and the interpreter dominates this test's wall time.
        depths = rng.uniform(0.8, 1.8, (1, height, width)).astype(np.float32)
        colors = rng.integers(0, 255, (1, height, width, 3)).astype(np.uint8)
        poses = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1))
        poses[:, 0, 3] = [0.0123]
        bounds = np.array([[-0.5, 0.5], [-0.5, 0.5], [0.0, 1.2]], np.float32)

        # 1/32 voxels -> 0.25-unit blocks -> ~22 px footprints at z~1:
        # small enough to fit the 48-row window, so BOTH classes see blocks
        # (the PW=128 fit is positional, so some blocks straddle a lane
        # boundary and stay large).
        monkeypatch.setenv("HIVE_PALLAS_WIN_S", "0")
        single = SparseTSDFVolume(bounds, voxel_size=1.0 / 32,
                                  pallas_sampler="interpret",
                                  chunk_voxels=4096)
        single.integrate_frames(colors, depths, k, poses)

        monkeypatch.setenv("HIVE_PALLAS_WIN_S", "48,128")
        dual = SparseTSDFVolume(bounds, voxel_size=1.0 / 32,
                                pallas_sampler="interpret",
                                chunk_voxels=4096)
        dual.integrate_frames(colors, depths, k, poses)

        integ = next(iter(dual._integrators.values()))
        w2c = np.linalg.inv(poses[0])
        intr = jnp.asarray([k[0, 0], k[1, 1], k[0, 2], k[1, 2]], jnp.float32)
        out = integ.classify_refined_full(
            dual.block_origins_device, jnp.asarray(depths[0]),
            jnp.asarray(w2c[:3, :3]), jnp.asarray(w2c[:3, 3]), intr)
        small, large = out[4]
        assert small is not None and int(jnp.sum(small[2])) > 0, \
            "small-window class never engaged — the test scene regressed"
        assert int(jnp.sum(large[2] & ~small[2])) > 0, \
            "large-window class never engaged — the test scene regressed"

        assert float(jnp.sum(dual.state.weight.astype(jnp.float32))) > 0
        for name in ("tsdf", "weight", "color"):
            np.testing.assert_array_equal(
                np.asarray(getattr(single.state, name)),
                np.asarray(getattr(dual.state, name)), err_msg=name)

    @pytest.mark.parametrize("knob", ["HIVE_PALLAS_DYN", "HIVE_PALLAS_DMAB"])
    def test_bounded_kernel_modes_bit_identical(self, monkeypatch, knob):
        """The dynamic-tiles and bounded-DMA kernel variants must integrate
        bit-identically to the static full-window build (out-of-footprint
        lanes read word 0 / stale bytes respectively — both masked)."""
        height, width = 64, 256
        k = np.array([[90.0, 0.0, (width - 1) / 2],
                      [0.0, 90.0, (height - 1) / 2],
                      [0.0, 0.0, 1.0]], np.float32)
        rng = np.random.default_rng(7)
        depths = rng.uniform(0.8, 1.8, (1, height, width)).astype(np.float32)
        colors = rng.integers(0, 255, (1, height, width, 3)).astype(np.uint8)
        poses = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1))
        poses[:, 0, 3] = [0.0123]
        bounds = np.array([[-0.5, 0.5], [-0.5, 0.5], [0.0, 1.2]], np.float32)

        static = SparseTSDFVolume(bounds, voxel_size=1.0 / 16,
                                  pallas_sampler="interpret",
                                  chunk_voxels=4096)
        static.integrate_frames(colors, depths, k, poses)

        monkeypatch.setenv(knob, "1")
        bounded = SparseTSDFVolume(bounds, voxel_size=1.0 / 16,
                                   pallas_sampler="interpret",
                                   chunk_voxels=4096)
        bounded.integrate_frames(colors, depths, k, poses)

        assert float(jnp.sum(bounded.state.weight.astype(jnp.float32))) > 0
        for name in ("tsdf", "weight", "color"):
            np.testing.assert_array_equal(
                np.asarray(getattr(static.state, name)),
                np.asarray(getattr(bounded.state, name)), err_msg=name)

    def test_skip_empty_gate_bit_identical(self, monkeypatch):
        """The empty-stream lax.cond gate (skip a trip stream's compaction
        sort when its count is zero this frame) must not change a bit vs
        the unconditional build."""
        height, width = 48, 64
        k = np.array([[60.0, 0.0, (width - 1) / 2],
                      [0.0, 60.0, (height - 1) / 2],
                      [0.0, 0.0, 1.0]], np.float32)
        rng = np.random.default_rng(3)
        depths = rng.uniform(0.8, 1.8, (2, height, width)).astype(np.float32)
        colors = rng.integers(0, 255, (2, height, width, 3)).astype(np.uint8)
        poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        poses[:, 0, 3] = [0.0, 0.0123]
        bounds = np.array([[-0.5, 0.5], [-0.5, 0.5], [0.0, 1.2]], np.float32)

        monkeypatch.setenv("HIVE_TSDF_SKIP_EMPTY", "0")
        plain = SparseTSDFVolume(bounds, voxel_size=1.0 / 16,
                                 chunk_voxels=4096)
        plain.integrate_frames(colors, depths, k, poses)

        monkeypatch.setenv("HIVE_TSDF_SKIP_EMPTY", "1")
        gated = SparseTSDFVolume(bounds, voxel_size=1.0 / 16,
                                 chunk_voxels=4096)
        gated.integrate_frames(colors, depths, k, poses)

        assert float(jnp.sum(gated.state.weight.astype(jnp.float32))) > 0
        for name in ("tsdf", "weight", "color"):
            np.testing.assert_array_equal(
                np.asarray(getattr(plain.state, name)),
                np.asarray(getattr(gated.state, name)), err_msg=name)

    def test_unqualifying_shapes_fall_back(self):
        """Frames smaller than the sampler window must auto-disable Pallas
        (width 128 < PW) even when explicitly requested."""
        bounds = np.array([[-0.5, 0.5], [-0.5, 0.5], [0.0, 1.2]], np.float32)
        volume = SparseTSDFVolume(bounds, voxel_size=1.0 / 16,
                                  pallas_sampler="interpret")
        integ = volume._build_integrator(96, 128, compact_cap=None)
        assert not integ.use_pallas


class TestQueryCoverage:
    def test_under_covered_query_config_rejected(self):
        """grid taps must cover every cell an AABB can touch at the chosen
        level bias — an under-covered config silently returns non-bounds
        (measured: a 3-tap bias=-2 experiment corrupted the volume)."""
        from hive_tpu.ops.tsdf_sparse import pyramid_layout, query_flat_pyramid

        layout = pyramid_layout(64, 128)
        args = (jnp.zeros(4, jnp.complex64), layout,
                jnp.zeros(2), jnp.ones(2) * 20, jnp.zeros(2), jnp.ones(2) * 20,
                64, 128)

        with pytest.raises(ValueError):
            query_flat_pyramid(*args, grid=3, level_bias=-2)
        with pytest.raises(ValueError):
            query_flat_pyramid(*args, grid=4, level_bias=-2)


class TestCompactIds:
    """compact_ids must reproduce the jnp.nonzero(size, fill_value) contract
    exactly — the integrator's trip lists are built on it (the sort-based
    implementation replaced nonzero's cumsum+scatter lowering for a measured
    +23% integrator throughput; see CLAUDE.md 2026-08-20)."""

    @pytest.mark.parametrize("density", [0.0, 0.05, 0.5, 1.0])
    def test_matches_nonzero(self, density):
        from hive_tpu.ops.tsdf_sparse import compact_ids

        rng = np.random.default_rng(7)
        mask = jnp.asarray(rng.random(1000) < density)
        want = jnp.nonzero(mask, size=1000, fill_value=1000)[0]
        got = compact_ids(mask, 1000, 1000)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_truncation_keeps_smallest(self):
        from hive_tpu.ops.tsdf_sparse import compact_ids

        mask = jnp.asarray(np.arange(100) % 3 == 0)  # 34 True entries
        want = jnp.nonzero(mask, size=10, fill_value=100)[0]
        got = compact_ids(mask, 10, 100)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_env_knob_restores_nonzero(self, monkeypatch):
        from hive_tpu.ops.tsdf_sparse import compact_ids

        monkeypatch.setenv("HIVE_TSDF_COMPACT", "nonzero")
        mask = jnp.asarray(np.arange(50) % 7 == 0)
        want = jnp.nonzero(mask, size=50, fill_value=50)[0]
        got = compact_ids(mask, 50, 50)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_size_beyond_mask_width_pads_with_fill(self):
        from hive_tpu.ops.tsdf_sparse import compact_ids

        mask = jnp.asarray([True, False, True, False])
        want = jnp.nonzero(mask, size=8, fill_value=4)[0]
        got = compact_ids(mask, 8, 4)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestPallasRefineQuery:
    """The refine-query window kernel (ops/pallas_refine.py) must reproduce
    query_flat_pyramid(grid=5, level_bias=-2) EXACTLY — integer min/max/AND
    in-kernel commute with the monotone u16->metres decode, and duplicate
    clamped rows are idempotent. Interpreter-mode check; hardware
    bit-identity verified 2026-08-20 at caps 64/4608/16384."""

    @pytest.mark.parametrize("height,width", [(96, 128), (120, 1280)])
    def test_bit_identical_to_take_path(self, height, width):
        """The wide case exercises the width-derived window-row count: at
        w_l = 2048 the worst span needs ~73 rows, and a fixed 48-row window
        silently truncated the reduce (review finding)."""
        import numpy as np

        from hive_tpu.ops.pallas_refine import (padded_pyramid_rows,
                                                query_flat_pyramid_pallas,
                                                window_rows)
        from hive_tpu.ops.tsdf_sparse import (build_flat_pyramid,
                                              pyramid_layout,
                                              query_flat_pyramid)

        layout = pyramid_layout(height, width)
        total = int(layout[0][-1]) + int(layout[2][-1]) * int(layout[1][-1])
        rows = padded_pyramid_rows(total, window_rows(width))

        rng = np.random.default_rng(3)
        depth = rng.uniform(0.5, 4.0, (height, width)).astype(np.float32)
        depth[rng.random((height, width)) < 0.1] = 0.0  # invalid pixels
        pyramid = build_flat_pyramid(jnp.asarray(depth), height, width)
        pyr2d = jnp.pad(pyramid,
                        (0, rows * 128 - pyramid.shape[0])).reshape(rows, 128)

        cap = 16
        ext_u = rng.uniform(1, 40, cap).astype(np.float32)
        ext_v = ext_u * rng.uniform(0.5, 1.5, cap).astype(np.float32)
        u0 = jnp.asarray(rng.uniform(0, width - 1 - ext_u).astype(np.float32))
        v0 = jnp.asarray(rng.uniform(0, height - 1 - ext_v).astype(np.float32))
        u1, v1 = u0 + ext_u, v0 + ext_v

        want = query_flat_pyramid(pyramid, layout, u0, u1, v0, v1,
                                  height, width, grid=5, level_bias=-2)
        got = query_flat_pyramid_pallas(pyr2d, layout, u0, u1, v0, v1,
                                        height, width, interpret=True)
        for name, w, g in zip(("dmin", "dmax", "valid"), want, got):
            np.testing.assert_array_equal(np.asarray(w), np.asarray(g),
                                          err_msg=name)
