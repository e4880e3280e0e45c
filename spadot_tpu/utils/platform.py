"""JAX platform selection shared by the stage entry points.

The reference pipeline exposes a device choice only on the train CLI
(SpaDOT/cli.py:48-49); here analyze gets one too because its full-cell
transport maps run on the accelerator — and on a remote-tunneled TPU a
tiny analyze job would otherwise pay minutes of remote compile for
seconds of work.
"""


def select_platform(device, logger=None):
    """Point jax at `device` ("cpu"/"tpu"/"gpu", optional ":N" suffix
    ignored), falling back to the installation default when unavailable.

    Must run before the backend initializes to take effect; safe to call
    later (jax raises, we fall back silently to the active backend).
    """
    if not device:
        return
    import jax

    platform = str(device).split(":")[0].lower()
    if platform not in ("cpu", "tpu", "gpu"):
        return
    previous = jax.config.jax_platforms
    try:
        jax.config.update("jax_platforms", platform)
        jax.devices()  # force backend init NOW so failure is catchable
    except Exception:
        jax.config.update("jax_platforms", previous)
        if logger is not None:
            logger.warning(
                "platform %r unavailable; using default backend %s",
                platform, jax.default_backend(),
            )
