"""Framework utilities: compilation cache, tracing, and phase timers.

The reference's only observability was coarse wall-clock prints
(``/root/reference/oinkoink/neural/training.py:89-97``); here tracing is a
first-class hook: ``trace()`` captures an XLA/TPU profile viewable in
TensorBoard/Perfetto, and ``PhaseTimer`` gives structured per-phase
seconds plus derived throughput (moves/s, sims/s).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA compilations across processes. The search/self-play
    programs take minutes to compile cold on TPU; with the cache they load
    in seconds on every subsequent run (bench, CLI, training restarts)."""
    import jax

    path = path or os.path.expanduser("~/.cache/connect4_tpu_xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def np_load_retry(path: str, attempts: int = 5):
    """``np.load`` with retries on truncated-zip errors.

    The benchmark npz files are rewritten in place by the (long-running)
    dataset builders; writers are atomic from this round on, but an older
    builder process may still write non-atomically, so concurrent readers
    retry briefly instead of crashing a training generation."""
    import zipfile

    import numpy as np

    for attempt in range(attempts):
        try:
            return np.load(path)
        except FileNotFoundError:
            raise  # a missing file is not transient — surface it now
        except (zipfile.BadZipFile, EOFError, OSError, ValueError):
            if attempt == attempts - 1:
                raise
            time.sleep(2.0 * (attempt + 1))


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """Capture a device profile for the enclosed block.

    Writes a TensorBoard/Perfetto-compatible trace under ``log_dir``
    (default ``~/connect4_tpu_traces/<timestamp>``). Use around a *warm*
    region — include one throwaway call first so compilation does not
    dominate the trace.
    """
    import jax

    log_dir = log_dir or os.path.expanduser(
        f"~/connect4_tpu_traces/{int(time.time())}"
    )
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield log_dir


class PhaseTimer:
    """Structured wall-clock accounting across named phases.

    ``with timer.phase("self_play"): ...`` accumulates seconds per phase;
    ``summary(counters)`` renders seconds plus any ``unit/phase`` rates
    (e.g. ``counters={"self_play": ("moves", 31000)}`` → moves/s).
    """

    def __init__(self) -> None:
        self.seconds: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.seconds[name] = self.seconds.get(name, 0.0) + time.time() - t0

    def summary(self, counters: Optional[Dict[str, tuple]] = None) -> str:
        parts = []
        for name, secs in self.seconds.items():
            part = f"{name}: {secs:.1f}s"
            if counters and name in counters:
                unit, count = counters[name]
                if secs > 0:
                    part += f" ({count / secs:,.0f} {unit}/s)"
            parts.append(part)
        return "  ".join(parts)
