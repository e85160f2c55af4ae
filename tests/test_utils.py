"""Utility-layer tests (validate_shape, key paths, timers, formatting, UI form)."""

import time

import numpy as np
import pytest

from hive_tpu.utils import (Domain, Timer, check_domain, format_bytes, get_key_path,
                            set_key_path, temp_seed, timed_block, tqdm_imap,
                            validate_shape)


class TestValidateShape:
    def test_accepts_matching(self):
        validate_shape(np.zeros((3, 4)), "x", (3, 4))
        validate_shape(np.zeros((7, 3)), "x", (None, 3))

    def test_rejects_wrong_rank(self):
        with pytest.raises(AssertionError, match="wrong rank"):
            validate_shape(np.zeros((3,)), "x", (3, 4))

    def test_rejects_wrong_size(self):
        with pytest.raises(AssertionError, match="x has the wrong shape"):
            validate_shape(np.zeros((3, 5)), "x", (None, 4))


class TestCheckDomain:
    def test_positive(self):
        check_domain(5, "n", int, Domain.Positive)
        with pytest.raises(ValueError):
            check_domain(0, "n", int, Domain.Positive)

    def test_nullable(self):
        check_domain(None, "n", int, Domain.Positive, nullable=True)

    def test_type_mismatch(self):
        with pytest.raises(ValueError):
            check_domain(1.5, "n", int)


class TestKeyPaths:
    def test_set_and_get(self):
        d = {}
        set_key_path(d, ["a", "b", "c"], 42)
        assert d == {"a": {"b": {"c": 42}}}
        assert get_key_path(d, ["a", "b", "c"]) == 42

    def test_get_missing_raises(self):
        with pytest.raises(KeyError):
            get_key_path({}, ["missing", "path"])

    def test_overwrite(self):
        d = {"a": {"b": 1}}
        set_key_path(d, ["a", "b"], 2)
        assert d["a"]["b"] == 2


class TestTimedBlock:
    def test_records_elapsed(self):
        profiling = {}
        with timed_block(None, profiling, ["timing", "step"]):
            time.sleep(0.01)
        assert profiling["timing"]["step"] >= 0.01

    def test_records_on_exception(self):
        profiling = {}
        with pytest.raises(RuntimeError):
            with timed_block(None, profiling, ["x"]):
                raise RuntimeError("boom")
        assert "x" in profiling

    def test_none_profiling_ok(self):
        with timed_block(None, None, ["unused"]):
            pass


class TestFormatBytes:
    def test_units(self):
        assert format_bytes(512) == "512.0 B"
        assert format_bytes(2048) == "2.0 KiB"
        assert format_bytes(3 * 1024 ** 3) == "3.0 GiB"


class TestTqdmImap:
    def test_preserves_order(self):
        result = tqdm_imap(lambda x: x * x, range(10), show_progress=False)
        assert result == [x * x for x in range(10)]

    def test_multi_worker_preserves_order(self):
        """Frames are embarrassingly parallel; with a genuinely concurrent
        pool and jittered task durations the output order must still match
        the input order (reference hive/utils.py:77-105 contract)."""
        import threading
        import time

        seen_threads = set()

        def work(x):
            seen_threads.add(threading.get_ident())
            time.sleep(0.005 * ((x * 7) % 4))
            return x * x

        result = tqdm_imap(work, range(24), num_workers=4, show_progress=False)

        assert result == [x * x for x in range(24)]
        assert len(seen_threads) > 1  # the pool really fanned out

    def test_env_var_pins_pool_width(self, monkeypatch):
        import threading
        import time

        monkeypatch.setenv("HIVE_NUM_WORKERS", "3")
        seen_threads = set()

        def work(x):
            seen_threads.add(threading.get_ident())
            time.sleep(0.005)
            return x

        result = tqdm_imap(work, range(12), show_progress=False)

        assert result == list(range(12))
        assert len(seen_threads) <= 3


class TestTempSeed:
    def test_restores_state(self):
        np.random.seed(123)
        before = np.random.get_state()[1][:5].copy()

        with temp_seed(7):
            inner1 = np.random.random()

        with temp_seed(7):
            inner2 = np.random.random()

        assert inner1 == inner2
        np.testing.assert_array_equal(np.random.get_state()[1][:5], before)


class TestTimer:
    def test_context_manager(self):
        with Timer() as timer:
            time.sleep(0.01)
        assert timer.elapsed_seconds >= 0.01


class TestInterfaceForm:
    def test_form_fields_cover_cli(self):
        from hive_tpu.interface import _collect_fields

        names = {f["name"] for f in _collect_fields()}
        # Spot-check the flag surface.
        for expected in ("dataset_path", "output_path", "num_frames", "estimate_depth",
                         "sdf_voxel_size", "webxr_path", "quality", "billboard"):
            assert expected in names

    def test_render_form_html(self):
        from hive_tpu.interface import Interface

        html = Interface().render_form()
        assert "<form" in html
        assert "dataset_path" in html
        assert "Start Pipeline" in html

    def test_build_pipeline_from_form(self):
        from hive_tpu.interface import build_pipeline_from_form

        pipeline = build_pipeline_from_form({
            "dataset_path": "in", "output_path": "out",
            "num_frames": "5", "estimate_depth": "on",
        })

        assert pipeline.options.num_frames == 5
        assert pipeline.options.estimate_depth is True
        assert pipeline.storage_options.dataset_path == "in"


class TestEnsureResponsiveBackend:
    """Outage fallback (utils.ensure_responsive_backend): never probes when
    CPU is already forced, falls back to CPU when the accelerator is dead."""

    def test_no_probe_when_env_forces_cpu(self, monkeypatch):
        from hive_tpu import utils

        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        monkeypatch.setattr(utils, "accelerator_alive",
                            lambda **kw: pytest.fail("must not probe"))
        assert utils.ensure_responsive_backend() is False

    def test_no_probe_when_config_forces_cpu(self, monkeypatch):
        from hive_tpu import utils

        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        monkeypatch.setattr(utils, "accelerator_alive",
                            lambda **kw: pytest.fail("must not probe"))
        # conftest already pinned jax.config to cpu for the whole suite.
        assert utils.ensure_responsive_backend() is False

    def test_opt_out_env(self, monkeypatch):
        from hive_tpu import utils

        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        monkeypatch.setenv("HIVE_PROBE_ACCELERATOR", "0")
        monkeypatch.setattr(utils, "accelerator_alive",
                            lambda **kw: pytest.fail("must not probe"))
        assert utils.ensure_responsive_backend() is False


class TestAcceleratorAliveBudget:
    """The probe's retries must not multiply a hanging attach: total probing
    wall time is bounded by HIVE_BENCH_PROBE_TOTAL (the dominant outage mode
    is an attach that hangs until killed, so each retry pays its full
    per-attempt timeout)."""

    def test_total_budget_stops_retries(self, monkeypatch):
        import subprocess
        from hive_tpu import utils

        monkeypatch.setenv("HIVE_BENCH_PROBE_TOTAL", "0")

        attempts = []

        class FakeProc:
            pid = 0

            def wait(self, timeout=None):
                if timeout is not None:
                    attempts.append(timeout)
                    raise subprocess.TimeoutExpired(cmd="probe",
                                                    timeout=timeout)
                return 1

        monkeypatch.setattr(subprocess, "Popen", lambda *a, **kw: FakeProc())
        monkeypatch.setattr(utils.os, "killpg", lambda *a, **kw: None)

        assert utils.accelerator_alive(timeout_s=60, retries=3) is False
        # First attempt always runs (clamped to >= 1 s by the exhausted
        # budget); the remaining retries are skipped.
        assert len(attempts) == 1

    def test_attempt_timeout_clamped_to_budget(self, monkeypatch):
        import subprocess
        from hive_tpu import utils

        monkeypatch.setenv("HIVE_BENCH_PROBE_TOTAL", "10")

        attempts = []

        class FakeProc:
            pid = 0

            def wait(self, timeout=None):
                if timeout is None:
                    return 1
                attempts.append(timeout)
                raise subprocess.TimeoutExpired(cmd="probe", timeout=timeout)

        monkeypatch.setattr(subprocess, "Popen", lambda *a, **kw: FakeProc())
        monkeypatch.setattr(utils.os, "killpg", lambda *a, **kw: None)

        assert utils.accelerator_alive(timeout_s=900, retries=3) is False
        assert attempts and all(t <= 10 for t in attempts)


class TestInterfaceErrorHandling:
    def test_empty_form_raises_value_error_not_system_exit(self):
        """argparse SystemExit must not escape the web handler's
        `except Exception` (the browser would get an empty reply)."""
        from hive_tpu.interface import build_pipeline_from_form

        with pytest.raises(ValueError, match="dataset_path"):
            build_pipeline_from_form({})

    def test_bad_value_raises_value_error(self):
        from hive_tpu.interface import build_pipeline_from_form

        with pytest.raises(ValueError):
            build_pipeline_from_form({"dataset_path": "in", "output_path": "out",
                                      "num_frames": "not-a-number"})


class TestBackendProbeSkip:
    def test_no_probe_once_backends_initialized(self, monkeypatch):
        """A process with live backends must NOT pay a probe subprocess (its
        attach can burn minutes on a busy tunnel, and the platform cannot be
        switched post-init anyway)."""
        import jax.numpy as jnp

        from hive_tpu import utils

        jnp.ones(2).sum()  # ensure backends are initialised

        def boom(*args, **kwargs):  # pragma: no cover - failure path
            raise AssertionError("probe subprocess spawned after backend init")

        monkeypatch.setattr(utils, "accelerator_alive", boom)
        monkeypatch.setenv("JAX_PLATFORMS", "axon")  # pretend forced accel

        # The backends-initialised check must be what answers (it runs before
        # the forced-cpu-config early-return): spy on it.
        from jax._src import xla_bridge

        calls = []
        original = xla_bridge.backends_are_initialized
        monkeypatch.setattr(xla_bridge, "backends_are_initialized",
                            lambda: calls.append(1) or original())

        assert utils.ensure_responsive_backend() is False
        assert calls, "the backends-initialised probe-skip never ran"


class TestCheckDomainTypeErrors:
    """check_domain must raise ValueError (its contract) for non-numeric
    values — the domain comparison used to run first and raise TypeError
    (round-5 review finding)."""

    def test_string_value_raises_value_error(self):
        from hive_tpu.utils import Domain, check_domain

        with pytest.raises(ValueError, match="must be a int"):
            check_domain("20", "n", int, Domain.Positive)

    def test_none_value_raises_value_error_when_not_nullable(self):
        from hive_tpu.utils import Domain, check_domain

        with pytest.raises(ValueError):
            check_domain(None, "n", float, Domain.NonNegative)
