"""Persistent JAX compilation cache for every framework entry point.

The TPU tunnel makes first compiles minutes-slow (a 1080p MK headline
program alone cost ~25 min of the round-4 bench budget), and nothing in the
reference repo has an analogue — PyTorch eager pays no compile at all. The
TPU-native answer is JAX's persistent compilation cache: serialized XLA
executables keyed by program hash + backend, so any program compiled once on
this machine (by the test lane, a bench pre-warm, or a previous driver run)
loads in milliseconds forever after.

Enabled automatically on ``import color_transfer_tpu`` (see __init__.py).

Environment knobs:
    CT_TPU_COMPILATION_CACHE=0   disable entirely
    CT_TPU_CACHE_DIR=<path>      override the cache directory
                                 (default ~/.cache/color_transfer_tpu/jax)

Verified working through the axon TPU tunnel (second-process compile of a
warm program: 1.76 s -> 0.30 s) and for the forced-host-platform CPU backend
the test suite uses.
"""

import os

_enabled_dir = None


def enable(cache_dir=None):
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Idempotent; safe to call before or after backend initialization (the
    config flags are read at compile time, not at backend init). Failures
    (read-only filesystem, ancient jax) degrade to a no-op with a warning
    rather than breaking the import.
    """
    global _enabled_dir
    if os.environ.get("CT_TPU_COMPILATION_CACHE", "1") in ("0", "off", "false"):
        return None
    if cache_dir is None:
        cache_dir = os.environ.get("CT_TPU_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "color_transfer_tpu", "jax"
        )
    if _enabled_dir == cache_dir:
        return _enabled_dir
    try:
        os.makedirs(cache_dir, exist_ok=True)
        # XLA:CPU logs a screenful of advisory "machine feature mismatch"
        # ERRORs on every cached-AOT load because its compile fingerprint
        # includes pseudo-features (+prefer-no-scatter/gather) the host
        # detector never reports. The cache is same-machine by design
        # (per-user ~/.cache), so silence C++ ERROR logs unless the user
        # asked for them. Python-level exceptions are unaffected.
        os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every entry: the driver budget cares about wall-clock, not
        # disk, and even sub-second CPU compiles add up over a 250-test lane.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _enabled_dir = cache_dir
    except Exception as e:  # noqa: BLE001 — never break import over caching
        import warnings

        warnings.warn(
            f"persistent compilation cache disabled ({e!r}); compiles will "
            "not be reused across processes",
            stacklevel=2,
        )
        return None
    return _enabled_dir
