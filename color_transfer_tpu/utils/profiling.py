"""Profiling hooks (SURVEY.md §5: the reference has none; cheap to add).

``trace(log_dir)`` wraps ``jax.profiler.trace`` so any block (a train step,
an eval sweep, a single kernel) dumps an XPlane/Perfetto trace viewable in
TensorBoard or ui.perfetto.dev. ``annotate(name)`` adds named spans that show
up inside device traces.

Usage:
    with profiling.trace("runs/prof"):
        state, logs = module.train_step(state, batch, key)

    with profiling.annotate("parallax-attention"):
        out = row_attention_warp(...)

Trainer integration: pass ``profile_dir`` to Trainer to capture steps 10-15
of the first epoch automatically.
"""

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir):
    with jax.profiler.trace(str(log_dir)):
        yield


def annotate(name):
    return jax.profiler.TraceAnnotation(name)


def start_server(port=9999):
    """Expose the live profiling endpoint (TensorBoard 'capture profile')."""
    return jax.profiler.start_server(port)
