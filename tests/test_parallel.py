"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Covers the mesh helpers, frame-parallel batch sharding, the space-sharded TSDF
integrate, and the data-sharded pose-optimisation step — the shardings the
driver's dryrun exercises.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hive_tpu.parallel.mesh import (get_device_mesh, pad_to_multiple, replicate,
                                    shard_batch, shard_volume)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")

    return get_device_mesh(8)


class TestMeshHelpers:
    def test_mesh_shape(self, mesh):
        assert mesh.devices.shape == (8,)
        assert mesh.axis_names == ("data",)

    def test_shard_batch_places_shards(self, mesh):
        x = jnp.arange(16 * 4).reshape(16, 4).astype(jnp.float32)
        sharded = shard_batch(mesh, x)

        assert sharded.sharding.spec == P("data", None)
        assert len(sharded.addressable_shards) == 8
        assert sharded.addressable_shards[0].data.shape == (2, 4)

    def test_replicate(self, mesh):
        x = jnp.eye(3)
        replicated = replicate(mesh, x)
        assert replicated.sharding.spec == P()

    def test_pad_to_multiple(self):
        x = np.ones((13, 4))
        padded = pad_to_multiple(x, 8, axis=0)
        assert padded.shape == (16, 4)
        assert padded[13:].sum() == 0

        same = pad_to_multiple(np.ones((16, 4)), 8, axis=0)
        assert same.shape == (16, 4)

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError):
            get_device_mesh(10_000)


class TestShardedSparseTSDF:
    @pytest.mark.parametrize("placement", ["contiguous", "cyclic"])
    def test_block_sharded_sparse_integration_matches_single_device(
            self, mesh, placement):
        """The sparse integrator inside shard_map (blocks sharded over the
        mesh) must reproduce the single-device result exactly — integration
        is block-local, so no collectives and no tolerance. Cyclic placement
        additionally permutes the block rows (load balance); extraction must
        invert it."""
        from hive_tpu.ops.tsdf_sparse import SparseTSDFVolume
        from hive_tpu.parallel.fusion import (integrate_frames_sharded,
                                              shard_sparse_state)

        height, width = 24, 32
        K = np.array([[30.0, 0, 15.5], [0, 30.0, 11.5], [0, 0, 1.0]])
        rng = np.random.default_rng(0)
        depths = rng.uniform(0.8, 1.6, (3, height, width)).astype(np.float32)
        colors = rng.uniform(0, 255, (3, height, width, 3)).astype(np.float32)
        poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        poses[:, 0, 3] = [0.0, 0.05, 0.1]
        bounds = np.array([[-1.0, 1.0], [-1.0, 1.0], [0.0, 2.0]])

        ref = SparseTSDFVolume(bounds, voxel_size=2.0 / 32)
        ref.integrate_frames(colors, depths, K, poses)

        vol = SparseTSDFVolume(bounds, voxel_size=2.0 / 32)
        assert vol.num_blocks % 8 == 0
        shard_sparse_state(vol, mesh, placement=placement)
        integrate_frames_sharded(vol, mesh, colors, depths, K, poses)

        if placement == "contiguous":
            np.testing.assert_array_equal(np.asarray(vol.state.weight),
                                          np.asarray(ref.state.weight))
            np.testing.assert_allclose(np.asarray(vol.state.tsdf),
                                       np.asarray(ref.state.tsdf), atol=1e-6)
            np.testing.assert_allclose(np.asarray(vol.state.color),
                                       np.asarray(ref.state.color), atol=1e-4)

        # Dense extraction un-permutes whatever the placement did.
        tsdf_r, w_r, c_r = ref.get_volume()
        tsdf_v, w_v, c_v = vol.get_volume()
        np.testing.assert_array_equal(w_v, w_r)
        np.testing.assert_allclose(tsdf_v, tsdf_r, atol=1e-6)
        np.testing.assert_allclose(c_v, c_r, atol=1e-4)

    @pytest.mark.parametrize("placement", ["contiguous", "cyclic"])
    def test_sharded_extraction_matches_single_device(self, mesh, placement):
        """get_mesh_sharded partitions active cubes over the mesh (state
        replicated) — the emitted stream preserves order, so vertices,
        faces, normals and colors must be BYTE-identical to get_mesh().
        A small chunk_size forces multiple dispatch rounds."""
        from hive_tpu.ops.tsdf_sparse import SparseTSDFVolume
        from hive_tpu.parallel.fusion import (get_mesh_sharded,
                                              integrate_frames_sharded,
                                              shard_sparse_state)

        height, width = 24, 32
        K = np.array([[30.0, 0, 15.5], [0, 30.0, 11.5], [0, 0, 1.0]])
        rng = np.random.default_rng(1)
        depths = rng.uniform(0.8, 1.6, (2, height, width)).astype(np.float32)
        colors = rng.uniform(0, 255, (2, height, width, 3)).astype(np.float32)
        poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        bounds = np.array([[-1.0, 1.0], [-1.0, 1.0], [0.0, 2.0]])

        ref = SparseTSDFVolume(bounds, voxel_size=2.0 / 32)
        ref.integrate_frames(colors, depths, K, poses)
        verts_r, faces_r, norms_r, cols_r = ref.get_mesh()
        assert len(verts_r) > 0

        vol = SparseTSDFVolume(bounds, voxel_size=2.0 / 32)
        shard_sparse_state(vol, mesh, placement=placement)
        integrate_frames_sharded(vol, mesh, colors, depths, K, poses)
        verts_s, faces_s, norms_s, cols_s = get_mesh_sharded(
            vol, mesh, chunk_size=64)

        np.testing.assert_array_equal(verts_s, verts_r)
        np.testing.assert_array_equal(faces_s, faces_r)
        np.testing.assert_array_equal(norms_s, norms_r)
        np.testing.assert_array_equal(cols_s, cols_r)

    def test_cyclic_placement_interleaves_blocks(self, mesh):
        from hive_tpu.ops.tsdf_sparse import SparseTSDFVolume
        from hive_tpu.parallel.fusion import shard_sparse_state

        vol = SparseTSDFVolume(np.array([[-1.0, 1.0], [-1.0, 1.0], [0.0, 2.0]]),
                               voxel_size=2.0 / 32)
        origins_before = vol.block_origins.copy()
        shard_sparse_state(vol, mesh, placement="cyclic")

        n = vol.num_blocks // 8
        # Device 0's slab holds canonical blocks 0, 8, 16, ... — its origins
        # are strided rows of the x-major origin table.
        np.testing.assert_array_equal(vol.block_origins[:n],
                                      origins_before[0::8])

    def test_indivisible_blocks_raise(self, mesh):
        from hive_tpu.ops.tsdf_sparse import SparseTSDFVolume
        from hive_tpu.parallel.fusion import shard_sparse_state

        vol = SparseTSDFVolume(np.array([[-1.0, 1.0]] * 3), voxel_size=2.0 / 24,
                               block_size=(8, 8, 4))
        if vol.num_blocks % 8 == 0:
            pytest.skip("grid unexpectedly divisible")
        with pytest.raises(ValueError):
            shard_sparse_state(vol, mesh)


class TestShardedTSDF:
    def test_space_sharded_integration_matches_single_device(self, mesh):
        """Voxel-X-sharded integration is voxel-local: results must equal the
        unsharded run bit-for-bit."""
        from hive_tpu.ops.tsdf import TSDFState, _integrate_one

        dims = (32, 16, 16)
        height, width = 24, 32

        rng = np.random.default_rng(0)
        depth = jnp.asarray(rng.uniform(0.5, 3.0, (height, width)).astype(np.float32))
        color = jnp.asarray(rng.uniform(0, 255, (height, width, 3)).astype(np.float32))
        world_to_cam = jnp.eye(4)
        intr = jnp.asarray([30.0, 30.0, 15.5, 11.5])
        origin = jnp.asarray([-1.0, -1.0, 0.0])

        def step(state):
            new_state, _ = _integrate_one(
                state, (depth, color, world_to_cam, jnp.float32(1.0), intr),
                origin=origin, voxel_size=2.0 / 16, trunc_margin=0.5,
                dims=dims, height=height, width=width)
            return new_state

        def fresh_state(sharded=False):
            state = TSDFState(tsdf=jnp.ones(dims), weight=jnp.zeros(dims),
                              color=jnp.zeros((3, *dims)))
            if sharded:
                state = TSDFState(tsdf=shard_volume(mesh, state.tsdf),
                                  weight=shard_volume(mesh, state.weight),
                                  color=shard_volume(mesh, state.color, axis=1))
            return state

        expected = jax.jit(step)(fresh_state())

        sharded_state = fresh_state(sharded=True)
        with mesh:
            result = jax.jit(step)(sharded_state)

        np.testing.assert_array_equal(np.asarray(result.weight),
                                      np.asarray(expected.weight))
        np.testing.assert_allclose(np.asarray(result.tsdf),
                                   np.asarray(expected.tsdf), atol=1e-6)

    def test_sharded_output_keeps_sharding(self, mesh):
        """The integrate output stays x-sharded (no implicit gather)."""
        from hive_tpu.ops.tsdf import TSDFState, _integrate_one

        dims = (32, 16, 16)
        height, width = 24, 32

        state = TSDFState(
            tsdf=shard_volume(mesh, jnp.ones(dims)),
            weight=shard_volume(mesh, jnp.zeros(dims)),
            color=shard_volume(mesh, jnp.zeros((3, *dims)), axis=1),
        )

        depth = jnp.ones((height, width))
        color = jnp.zeros((height, width, 3))

        def step(state):
            new_state, _ = _integrate_one(
                state, (depth, color, jnp.eye(4), jnp.float32(1.0),
                        jnp.asarray([30.0, 30.0, 15.5, 11.5])),
                origin=jnp.asarray([-1.0, -1.0, 0.0]), voxel_size=2.0 / 16,
                trunc_margin=0.5, dims=dims, height=height, width=width)
            return new_state

        with mesh:
            result = jax.jit(step)(state)

        assert result.weight.sharding.spec[0] == "data"


class TestShardedPoseStep:
    def test_data_sharded_gradients_match_replicated(self, mesh):
        """Sharding correspondences over devices must give the same gradients
        as the replicated computation (XLA inserts the psum)."""
        from hive_tpu.core import transforms as T

        m = 64
        num_frames = 4

        rng = np.random.default_rng(1)
        features = {
            "idx": rng.integers(0, num_frames, m).astype(np.int32),
            "points": rng.uniform(0, 32, (m, 2)).astype(np.float32),
            "depth": rng.uniform(0.5, 3.0, m).astype(np.float32),
            "target": rng.normal(size=(m, 3)).astype(np.float32),
        }

        params = {
            "q": jnp.asarray(np.tile([0.0, 0.0, 0.0, 1.0], (num_frames, 1)),
                             dtype=jnp.float32),
            "t": jnp.zeros((num_frames, 3)),
        }

        def loss_fn(params, features):
            q = T.quat_normalize(params["q"][features["idx"]])
            t = params["t"][features["idx"]]

            x = (features["points"][:, 0] - 16.0) * features["depth"] / 30.0
            y = (features["points"][:, 1] - 12.0) * features["depth"] / 30.0
            cam = jnp.stack([x, y, features["depth"]], axis=-1)

            world = T.quat_rotate(T.quat_conjugate(q), cam - t)
            return jnp.mean(jnp.sum((world - features["target"]) ** 2, axis=-1))

        grad_fn = jax.jit(jax.grad(loss_fn))

        expected = grad_fn(params, jax.tree.map(jnp.asarray, features))

        sharded_features = {
            "idx": shard_batch(mesh, jnp.asarray(features["idx"])),
            "points": shard_batch(mesh, jnp.asarray(features["points"])),
            "depth": shard_batch(mesh, jnp.asarray(features["depth"])),
            "target": shard_batch(mesh, jnp.asarray(features["target"])),
        }
        replicated_params = jax.tree.map(lambda a: replicate(mesh, a), params)

        with mesh:
            result = grad_fn(replicated_params, sharded_features)

        np.testing.assert_allclose(np.asarray(result["q"]),
                                   np.asarray(expected["q"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(result["t"]),
                                   np.asarray(expected["t"]), atol=1e-5)


class TestDryrunEntry:
    @pytest.mark.slow  # ~43 s; the round driver runs this exact function as
    # its MULTICHIP artifact, so the default CI profile skips the duplicate.
    def test_dryrun_multichip_runs(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 (virtual) devices")

        import sys
        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)


class TestProductionShardedPose:
    """optimise_packed_features — the production PoseOptimiser loop — with
    mesh-sharded correspondences must match the single-device run."""

    def _inputs(self):
        from hive_tpu.pose_optimisation import OptimisationOptions

        rng = np.random.default_rng(3)
        num_frames = 6
        m = 64

        features = {
            "idx_i": rng.integers(0, num_frames, m).astype(np.int32),
            "points_i": rng.uniform(0, 32, (m, 2)).astype(np.float32),
            "depth_i": rng.uniform(0.5, 3.0, m).astype(np.float32),
            "idx_j": rng.integers(0, num_frames, m).astype(np.int32),
            "points_j": rng.uniform(0, 32, (m, 2)).astype(np.float32),
            "depth_j": rng.uniform(0.5, 3.0, m).astype(np.float32),
            "weight": np.ones(m, dtype=np.float32),
        }
        params = {
            "q": jnp.asarray(np.tile([0.0, 0.0, 0.0, 1.0], (num_frames, 1)),
                             dtype=jnp.float32),
            "t": jnp.zeros((num_frames, 3), dtype=jnp.float32),
            "scale": jnp.zeros((0,), dtype=jnp.float32),
            "shift": jnp.zeros((0,), dtype=jnp.float32),
        }
        intrinsics = jnp.asarray([50.0, 50.0, 15.5, 11.5], dtype=jnp.float32)
        options = OptimisationOptions(num_epochs=10, epochs_per_chunk=5)
        return features, params, intrinsics, options

    def test_sharded_matches_single_device(self, mesh):
        from hive_tpu.pose_optimisation import (ResidualType,
                                                optimise_packed_features)

        features, params, intrinsics, options = self._inputs()

        kwargs = dict(residual_type=ResidualType.World3D,
                      frame_size=(32, 24), fps=30.0)

        expected = optimise_packed_features(features, intrinsics, dict(params),
                                            options, **kwargs)
        result = optimise_packed_features(features, intrinsics, dict(params),
                                          options, mesh=mesh, **kwargs)

        np.testing.assert_allclose(np.asarray(result["q"]),
                                   np.asarray(expected["q"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(result["t"]),
                                   np.asarray(expected["t"]), atol=1e-5)

    def test_indivisible_correspondences_raise(self, mesh):
        from hive_tpu.pose_optimisation import (ResidualType,
                                                optimise_packed_features)

        features, params, intrinsics, options = self._inputs()
        features = {k: v[:-1] for k, v in features.items()}  # 63 rows

        with pytest.raises(ValueError, match="divide"):
            optimise_packed_features(features, intrinsics, params, options,
                                     residual_type=ResidualType.World3D,
                                     frame_size=(32, 24), fps=30.0, mesh=mesh)

    def test_pose_optimiser_pads_for_mesh(self, mesh, tmp_path):
        """PoseOptimiser._optimisation_loop under a runtime mesh pads the
        correspondence count to a mesh multiple and still optimises."""
        from hive_tpu.parallel import runtime
        from hive_tpu.pose_optimisation import (FeatureData, FeatureSet,
                                                OptimisationOptions,
                                                PoseOptimiser, ResidualType)

        rng = np.random.default_rng(5)
        m = 13  # deliberately not a multiple of 8
        num_frames = 4

        def feature_data(idx):
            return FeatureData(index=idx.astype(np.int64),
                               points=rng.uniform(0, 32, (m, 2)),
                               depth=rng.uniform(0.5, 3.0, m))

        idx_i = rng.integers(0, num_frames - 1, m)
        feature_set = FeatureSet(camera_matrix=np.array([[50.0, 0, 16.0],
                                                         [0, 50.0, 12.0],
                                                         [0, 0, 1.0]]),
                                 frame_i=feature_data(idx_i),
                                 frame_j=feature_data(idx_i + 1))

        class _StubDataset:
            frame_width = 32
            frame_height = 24
            fps = 30.0
            num_frames = 4

        optimiser = PoseOptimiser.__new__(PoseOptimiser)
        optimiser.dataset = _StubDataset()
        optimiser.optimisation_options = OptimisationOptions(num_epochs=4,
                                                             epochs_per_chunk=2)

        params = {
            "q": jnp.asarray(np.tile([0.0, 0.0, 0.0, 1.0], (num_frames, 1)),
                             dtype=jnp.float32),
            "t": jnp.zeros((num_frames, 3), dtype=jnp.float32),
            "scale": jnp.zeros((0,), dtype=jnp.float32),
            "shift": jnp.zeros((0,), dtype=jnp.float32),
        }

        runtime.set_runtime_mesh(mesh)
        try:
            result = optimiser._optimisation_loop(
                feature_set, params, optimiser.optimisation_options,
                ResidualType.World3D)
        finally:
            runtime.set_runtime_mesh(None)

        assert np.all(np.isfinite(np.asarray(result["q"])))
        assert not np.allclose(np.asarray(result["t"]), 0.0)


class TestShardedDPT:
    def test_sharded_depth_matches_single_device(self):
        """DPTDepthEstimator with a mesh shards the frame batch (padding to a
        mesh multiple) and must reproduce the single-device predictions."""
        if len(jax.devices()) < 2:
            pytest.skip("needs 2 (virtual) devices")

        from hive_tpu.models.dpt import DPTDepthEstimator

        mesh2 = get_device_mesh(2)

        rng = np.random.default_rng(7)
        frames = rng.integers(0, 255, (3, 64, 96, 3)).astype(np.uint8)

        single = DPTDepthEstimator(net_size=(64, 96), dtype=jnp.float32)
        sharded = DPTDepthEstimator(net_size=(64, 96), dtype=jnp.float32,
                                    mesh=mesh2)
        # Same random init for both instances (no weights on disk).
        sharded.params = jax.tree.map(
            lambda a: jax.device_put(
                a, jax.sharding.NamedSharding(
                    mesh2, jax.sharding.PartitionSpec())),
            single.params)

        expected = single.predict_batch(frames)
        result = sharded.predict_batch(frames)

        assert result.shape == expected.shape == (3, 64, 96)
        np.testing.assert_allclose(result, expected, atol=1e-4)


class TestDeviceCountValidation:
    def test_nonpositive_count_raises(self):
        from hive_tpu.parallel.mesh import get_device_mesh

        with pytest.raises(ValueError, match="positive"):
            get_device_mesh(-2)
        with pytest.raises(ValueError, match="positive"):
            get_device_mesh(0)
