"""Checkpoint manager tests."""

import numpy as np
import pytest

from hive_tpu.checkpoint import CheckpointManager


class TestCheckpointManager:
    def test_save_restore_roundtrip(self, tmp_path):
        manager = CheckpointManager(str(tmp_path))

        tree = {"a": np.arange(5), "nested": {"b": np.eye(3)}}
        manager.save(10, tree, metadata={"lr": 0.01})

        restored, metadata = manager.restore()
        np.testing.assert_array_equal(restored["a"], tree["a"])
        np.testing.assert_array_equal(restored["nested"]["b"], tree["nested"]["b"])
        assert metadata == {"lr": 0.01}

    def test_latest_step(self, tmp_path):
        manager = CheckpointManager(str(tmp_path))
        assert manager.latest_step() is None

        manager.save(1, {"x": np.zeros(2)})
        manager.save(5, {"x": np.ones(2)})

        assert manager.latest_step() == 5
        restored, _ = manager.restore()
        np.testing.assert_array_equal(restored["x"], np.ones(2))

    def test_retention(self, tmp_path):
        manager = CheckpointManager(str(tmp_path), max_to_keep=2)

        for step in (1, 2, 3, 4):
            manager.save(step, {"x": np.full(1, step)})

        assert manager.all_steps() == [3, 4]

    def test_restore_specific_step(self, tmp_path):
        manager = CheckpointManager(str(tmp_path), max_to_keep=5)
        manager.save(1, {"x": np.full(1, 1.0)})
        manager.save(2, {"x": np.full(1, 2.0)})

        restored, _ = manager.restore(step=1)
        assert restored["x"][0] == 1.0

    def test_empty_restore(self, tmp_path):
        manager = CheckpointManager(str(tmp_path))
        tree, metadata = manager.restore()
        assert tree is None and metadata is None

    def test_container_types_roundtrip(self, tmp_path):
        """Lists and tuples restore as their original container types (a
        restored optax state must re-enter jax.tree.unflatten unchanged)."""
        manager = CheckpointManager(str(tmp_path))
        tree = ({"q": np.zeros(3)}, [np.ones(2), np.full(1, 7.0)])
        manager.save(0, tree)

        restored, _ = manager.restore()
        assert isinstance(restored, tuple) and len(restored) == 2
        assert isinstance(restored[0], dict)
        assert isinstance(restored[1], list)
        np.testing.assert_array_equal(restored[0]["q"], np.zeros(3))
        np.testing.assert_array_equal(restored[1][0], np.ones(2))
        np.testing.assert_array_equal(restored[1][1], np.full(1, 7.0))


class TestAmbiguousTreesRefused:
    """The path encoding cannot represent '/'-bearing keys or empty
    containers; they must refuse loudly instead of silently restoring a
    different tree (round-5 review finding, verified by execution)."""

    def test_slash_key_refused(self, tmp_path):
        from hive_tpu.checkpoint import CheckpointManager

        manager = CheckpointManager(str(tmp_path))
        with pytest.raises(ValueError, match="round-trip"):
            manager.save(0, {"a/b": np.zeros(2)})

    def test_empty_list_refused(self, tmp_path):
        from hive_tpu.checkpoint import CheckpointManager

        manager = CheckpointManager(str(tmp_path))
        with pytest.raises(ValueError, match="empty list"):
            manager.save(0, {"a": [], "b": np.zeros(2)})
