"""Structured timing/logging facility.

The reference scatters `print(time.time()-t0)` across every module
(SURVEY.md §5 "Tracing / profiling"); here all stage and kernel timings flow
through one logger with scoped timers, and `jax.profiler` traces can be
toggled with SPADOT_PROFILE=1.
"""
import contextlib
import logging
import os
import time

logger = logging.getLogger("spadot_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("[%(asctime)s spadot] %(message)s", "%H:%M:%S"))
    logger.addHandler(_h)
    logger.setLevel(os.environ.get("SPADOT_LOG", "INFO"))


@contextlib.contextmanager
def timed(name: str, level=logging.INFO):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        logger.log(level, "%s: %.3fs", name, time.perf_counter() - t0)


@contextlib.contextmanager
def maybe_profile(outdir="/tmp/spadot_trace"):
    """jax.profiler trace scope, enabled by SPADOT_PROFILE=1."""
    if os.environ.get("SPADOT_PROFILE"):
        import jax

        with jax.profiler.trace(outdir):
            yield
        logger.info("profile trace written to %s", outdir)
    else:
        yield
