"""Host-side utilities: shape validation, parallel map, profiling, logging.

Capability parity with reference hive/utils.py (validate_shape:38, tqdm_imap:77,
temp_seed:109, setup_logger:186, format_bytes:242, Timer:253, set_key_path:302,
get_key_path:330, timed_block:356), re-implemented independently.
"""

from __future__ import annotations

import contextlib
import enum
import logging
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterable, Optional, Sequence, Type, Union

import numpy as np

try:
    from tqdm import tqdm
except ImportError:  # pragma: no cover - tqdm is expected to be present
    tqdm = None


def validate_camera_parameter_shapes(K, R, t):
    """Assert K is 3x3, R is 3x3 and t is a 3x1 column vector."""
    validate_shape(K, "K", expected_shape=(3, 3))
    validate_shape(R, "R", expected_shape=(3, 3))
    validate_shape(t, "t", expected_shape=(3, 1))


def validate_shape(x, x_name: str, expected_shape: tuple):
    """Assert that ``x.shape`` matches ``expected_shape``.

    ``None`` entries in ``expected_shape`` act as wildcards, e.g. ``(None, 3)``
    accepts any Nx3 array.
    """
    if not isinstance(expected_shape, tuple):
        raise AssertionError("expected_shape should be given as a tuple.")

    actual = tuple(x.shape)
    if len(actual) != len(expected_shape):
        raise AssertionError(
            f"{x_name} has the wrong rank: "
            f"wanted {len(expected_shape)} dims, got {len(actual)}"
        )

    for want, got in zip(expected_shape, actual):
        if want is not None and want != got:
            pretty = "(" + ", ".join("?" if d is None else str(d) for d in expected_shape) + ")"
            raise AssertionError(
                f"{x_name} has the wrong shape: wanted {pretty}, got {actual}"
            )


class Domain(enum.Enum):
    """Value-domain constraints used by :func:`check_domain`."""

    Negative = enum.auto()  # < 0
    Positive = enum.auto()  # > 0
    NonNegative = enum.auto()  # >= 0


def check_domain(value: Any, name: str, value_type: Union[Type[int], Type[float]],
                 domain: Optional[Domain] = None, nullable: bool = False):
    """Raise ``ValueError`` unless ``value`` is a ``value_type`` inside ``domain``."""
    if nullable and value is None:
        return

    # Type check FIRST: the domain comparison on a non-numeric value would
    # raise TypeError instead of the promised ValueError (review finding,
    # r5 — validators exist precisely for the bad inputs).
    if not isinstance(value, value_type):
        raise ValueError(
            f"{name} must be a {value_type.__name__}, "
            f"but got {value!r} ({type(value).__name__}) instead")

    in_domain = True
    domain_name = ""

    if domain is Domain.Negative:
        in_domain = value < 0
        domain_name = " negative "
    elif domain is Domain.Positive:
        in_domain = value > 0
        domain_name = " positive "
    elif domain is Domain.NonNegative:
        in_domain = value >= 0
        domain_name = " non-negative "

    if not in_domain:
        raise ValueError(
            f"{name} must be a{domain_name}{value_type.__name__}, "
            f"but got {value!r} ({type(value).__name__}) instead"
        )


def tqdm_imap(func, args: Sequence, num_workers: Optional[int] = None,
              show_progress: bool = True) -> list:
    """Apply ``func`` over ``args`` with a thread pool, preserving order.

    Frames in this framework are embarrassingly parallel on the host side, so a
    thread pool (NumPy/cv2 release the GIL) is the right tool; device work is
    batched separately.

    Pool width: explicit ``num_workers`` > the ``HIVE_NUM_WORKERS`` env var >
    ``os.cpu_count()``. The env var pins a width for benchmarking or for
    overlapping host meshing with device work on many-core machines.
    """
    args = list(args)
    workers = (num_workers or int(os.environ.get("HIVE_NUM_WORKERS", 0) or 0)
               or os.cpu_count() or 1)

    with ThreadPoolExecutor(max_workers=workers) as pool:
        it = pool.map(func, args)

        if show_progress and tqdm is not None:
            it = tqdm(it, total=len(args))

        return list(it)


def enable_compile_cache(cache_dir: Optional[str] = None) -> None:
    """Enable JAX's persistent compilation cache for this process.

    XLA compiles of the big programs (the TSDF integrate scan, isosurface
    emission, DPT) take tens of seconds each and dominate cold pipeline runs;
    the persistent cache turns every later run's compiles into ~1 s disk
    loads (verified working through the TPU backend and on CPU). Called by
    the pipeline and the benchmarks. ``cache_dir`` falls back to the
    JAX_COMPILATION_CACHE_DIR env var, then to the repo's ``.jax_cache``.
    """
    import jax

    # GOTCHA: this jax version does NOT honour the JAX_COMPILATION_CACHE_DIR
    # environment variable (jax.config.jax_compilation_cache_dir stays None
    # and the persistent cache silently stays disabled) — the config flag is
    # the only working switch. Treat the env var as the requested directory,
    # never as evidence the cache is already on.
    if cache_dir is None:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or None

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache")

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as exc:  # pragma: no cover — older jax flag names
        logging.debug(f"Could not enable the compilation cache: {exc}")


def accelerator_alive(timeout_s: Optional[int] = None,
                      retries: Optional[int] = None,
                      total_s: Optional[int] = None) -> bool:
    """Probe the forced accelerator backend in a KILLABLE subprocess.

    During tunnel outages an in-process attach hangs for ~45 min before
    failing UNAVAILABLE and cannot be cancelled (signals don't interrupt the
    blocking C++ call). A subprocess probe is killable; killing an
    attach-WAITING client is safe (the device-wedge hazard is killing
    mid-computation). Healthy-but-busy attaches can take minutes, so the
    per-attempt timeout is generous. The child runs in its own session and
    the whole group is killed on timeout — attach helper processes must not
    keep the probe's pipes (and so the caller) alive.

    Retries guard against fast transient failures; the dominant outage mode
    is an attach that HANGS, so total probing time is additionally bounded
    by ``total_s`` (env HIVE_BENCH_PROBE_TOTAL when unset, default 1200 s —
    retrying a hang just burns the caller's wall clock 3x before the same
    CPU fallback). Note the total bound also clamps an explicit
    ``timeout_s``: pass a matching ``total_s`` when a single attempt should
    be allowed to exceed 1200 s.
    """
    import signal
    import subprocess
    import sys
    import time

    if timeout_s is None:
        timeout_s = int(os.environ.get("HIVE_BENCH_PROBE_TIMEOUT", "900"))
    if retries is None:
        retries = int(os.environ.get("HIVE_BENCH_PROBE_RETRIES", "3"))
    if total_s is None:
        total_s = int(os.environ.get("HIVE_BENCH_PROBE_TOTAL", "1200"))
    deadline = time.monotonic() + total_s

    for attempt in range(retries):
        remaining = deadline - time.monotonic()
        if attempt and remaining <= 0:
            break
        attempt_timeout = min(timeout_s, max(1.0, remaining))
        proc = subprocess.Popen(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(float(jnp.ones((8,)).sum()))"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            start_new_session=True)
        try:
            if proc.wait(timeout=attempt_timeout) == 0:
                return True
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
            proc.wait()
    return False


# Last outage-probe observations, folded into perf artifacts
# (tunnel_health_report) so cross-day numbers carry their own weather context.
_LAST_PROBE: dict = {}


def ensure_responsive_backend() -> bool:
    """Fall back to CPU (with a warning) when the forced accelerator backend
    is unreachable, instead of hanging for ~45 min at the first device op.

    Must run BEFORE JAX initialises its backends (config updates are ignored
    afterwards). Returns True when the fallback was taken. Opt out with
    HIVE_PROBE_ACCELERATOR=0 (the probe itself pays one extra attach, which
    on a busy-but-healthy tunnel can take minutes). HIVE_FORCE_CPU=1 skips
    the probe and pins the CPU backend outright — the reliable way to run a
    small host-bound job without paying a remote attach (the JAX_PLATFORMS
    env var alone cannot do this once a plugin backend is force-registered
    by sitecustomize).
    """
    forced = os.environ.get("JAX_PLATFORMS", "")

    if os.environ.get("HIVE_FORCE_CPU", "0") == "1":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:  # backends already initialised; too late
            logging.warning(
                "HIVE_FORCE_CPU=1 was requested but JAX backends are "
                "already initialised — the CPU pin cannot take effect and "
                "device ops will use the existing backend (possibly the "
                "tunnelled accelerator). Set the flag before the first "
                "jax call.")
            return False
        return forced not in ("", "cpu")

    if (not forced or forced == "cpu"
            or os.environ.get("HIVE_PROBE_ACCELERATOR", "1") == "0"):
        return False

    import jax

    # A process whose backends are ALREADY initialised can't switch platform
    # anyway (config updates are ignored) — and its device evidently works.
    # Skip the probe: the probe subprocess pays its own tunnel attach, which
    # on a busy tunnel burns MINUTES (observed: +380 s inside a bench e2e
    # stage whose same-process TSDF stage had just run fine on the device).
    try:
        from jax._src import xla_bridge

        if xla_bridge.backends_are_initialized():
            return False
    except (ImportError, AttributeError):  # pragma: no cover — jax internals
        pass

    # A caller that already forced CPU via jax.config (the reliable switch —
    # the env var alone doesn't stop the sitecustomize-registered backend)
    # needs no probe.
    if getattr(jax.config, "jax_platforms", None) == "cpu":
        return False

    # Probed healthy earlier in this process (e.g. run(trace_dir=...) probes
    # before the profiler context, then _run_impl probes again): a second
    # subprocess attach would burn minutes for nothing.
    if _LAST_PROBE.get("probe_ok"):
        return False

    import time

    probe_start = time.monotonic()
    alive = accelerator_alive()
    _LAST_PROBE["probe_s"] = round(time.monotonic() - probe_start, 1)
    _LAST_PROBE["probe_ok"] = alive

    if alive:
        return False

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:  # backends already initialised; too late to switch
        return False

    logging.warning(f"Accelerator backend '{forced}' is unreachable "
                    "(tunnel outage?) — running this process on CPU.")
    return True


def tunnel_health_report(include_call_floor: bool = True) -> dict:
    """Session weather context for performance artifacts.

    Numbers through this tunnelled accelerator drift ±20% across hours and a
    timed call carries a large fixed dispatch+round-trip cost, so artifacts
    (profiling.json, bench breakdowns) record per-session health alongside
    the measurements: the backend platform, the outage-probe latency when a
    probe ran this process, and the median latency of a trivial timed call
    (the call floor — ~35 ms through the tunnel, ~0 locally).
    """
    import time

    report = dict(_LAST_PROBE)

    try:
        import jax
        import jax.numpy as jnp

        backend = jax.default_backend()
    except Exception as exc:  # pragma: no cover — no backend at all
        report["backend_error"] = str(exc)[:120]
        return report

    report["backend"] = backend

    if include_call_floor and backend != "cpu":
        @jax.jit
        def tick(x):
            return x + 1.0

        x = jnp.float32(0)
        float(tick(x))  # compile

        samples = []
        for _ in range(5):
            start = time.perf_counter()
            float(tick(x))
            samples.append(time.perf_counter() - start)
        report["call_floor_ms"] = round(
            1000.0 * sorted(samples)[len(samples) // 2], 2)

    return report


@contextlib.contextmanager
def temp_seed(seed: int):
    """Temporarily seed NumPy's global RNG."""
    state = np.random.get_state()
    try:
        np.random.seed(seed)
        yield
    finally:
        np.random.set_state(state)


def setup_logger(log_path: Optional[str] = None):
    """Configure root logging: DEBUG to file, INFO to stdout, WARNING+ to stderr.

    Mirrors the reference behaviour (hive/utils.py:186-239) so downstream log
    consumers see the same stream layout.
    """
    logger = logging.getLogger()
    logger.setLevel(logging.DEBUG)
    logger.handlers = []

    detailed = logging.Formatter(
        "%(asctime)s.%(msecs)03d %(levelname)s %(pathname)s:%(lineno)s %(funcName)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    simple = logging.Formatter(
        "%(asctime)s.%(msecs)03d %(levelname)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )

    if log_path is not None:
        fh = logging.FileHandler(log_path)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(detailed)
        logger.addHandler(fh)

    class _AtMost(logging.Filter):
        def __init__(self, level):
            super().__init__()
            self._level = level

        def filter(self, record):
            return record.levelno <= self._level

    out = logging.StreamHandler(sys.stdout)
    out.setLevel(logging.INFO)
    out.addFilter(_AtMost(logging.INFO))
    out.setFormatter(simple)
    logger.addHandler(out)

    err = logging.StreamHandler(sys.stderr)
    err.setLevel(logging.WARNING)
    err.setFormatter(detailed)
    logger.addHandler(err)

    logging.getLogger("PIL").setLevel(logging.INFO)
    logging.getLogger("matplotlib").setLevel(logging.INFO)
    logging.getLogger("jax").setLevel(logging.INFO)


def format_bytes(bytes_count: float) -> str:
    """Human-readable byte count (binary units)."""
    for unit in ("", "Ki", "Mi", "Gi", "Ti"):
        if abs(bytes_count) < 1024.0:
            return f"{bytes_count:3.1f} {unit}B"
        bytes_count /= 1024.0

    return f"{bytes_count:3.1f} PiB"


class Timer:
    """Wall-clock timer; usable as a context manager."""

    def __init__(self):
        self._start: float = 0.0
        self._stop: Optional[float] = None

    @property
    def elapsed_seconds(self) -> float:
        end = self._stop if self._stop is not None else time.monotonic()
        return end - self._start

    def start(self):
        self._start = time.monotonic()
        self._stop = None

    def stop(self):
        self._stop = time.monotonic()

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.stop()


def set_key_path(dictionary: dict, path: Sequence, value: Any):
    """Set ``dictionary[path[0]][path[1]]... = value``, creating nested dicts."""
    node = dictionary

    for key in path[:-1]:
        node = node.setdefault(key, {})

    node[path[-1]] = value


def get_key_path(dictionary: dict, path: Sequence) -> Any:
    """Get the value at a nested key path; raises ``KeyError`` if absent."""
    node = dictionary

    for key in path[:-1]:
        if key not in node:
            raise KeyError(f"Key path {list(path)} missing at {key!r}")
        node = node[key]

    return node[path[-1]]


@contextlib.contextmanager
def timed_block(log_msg: Optional[str], profiling: Optional[dict], key_path: Sequence):
    """Run a block, recording its wall time (seconds) into ``profiling`` at ``key_path``.

    This is the profiling primitive whose output forms the ``profiling.json``
    benchmark contract (reference hive/utils.py:356-379).
    """
    if log_msg:
        logging.info(log_msg)

    timer = Timer()
    timer.start()

    try:
        yield timer
    finally:
        if profiling is not None:
            set_key_path(profiling, list(key_path), timer.elapsed_seconds)
