"""Video color transfer — batched/sharded frame processing.

The public video entry point (``color_transfer_between_videos``): apply any
registered method to a stereo video clip. Frames are independent work items,
so the pipeline is vmap over a frame batch + sharding of the frame axis
across the device mesh — the distributed serving path this framework is
designed around (SURVEY.md §2.8: each frame/row is trivially parallel; no
ring machinery needed).

Two statistics modes:
  * per_frame (default) — each frame matched independently, the reference
    semantics of running the image method per frame;
  * global — one set of color statistics from the first reference frame,
    applied to every frame (temporally stable for the global/linear methods).
"""

import jax
import jax.numpy as jnp

from color_transfer_tpu import methods
from color_transfer_tpu.parallel import create_mesh, shard_batch


def color_transfer_between_videos(
    target_frames,
    reference_frames,
    method="monge_kantorovitch",
    batch_size=8,
    mesh=None,
    per_frame=True,
):
    """Transfer color from reference_frames onto target_frames.

    Args:
      target_frames / reference_frames: (T, H, W, 3) float arrays in [0, 1]
        (numpy or jax; processed in device batches of ``batch_size``).
      method: registry name (see methods.available_methods()).
      mesh: optional device mesh; defaults to all devices on one 'data' axis.
      per_frame: independent per-frame statistics (reference semantics).

    Returns (T, H, W, 3) corrected frames (device array).
    """
    fn = methods.get_method(method)
    if mesh is None:
        mesh = create_mesh()
    n_dev = mesh.devices.size
    batch_size = max(batch_size, n_dev)
    batch_size -= batch_size % n_dev

    if not per_frame:
        # Temporally stable mode: statistics come from the FIXED reference
        # frame 0, applied to every target frame.
        r0 = jnp.asarray(reference_frames[0])
        mapped = jax.jit(jax.vmap(lambda t: jnp.clip(fn(t, r0), 0.0, 1.0)))
    else:
        mapped = jax.jit(jax.vmap(lambda t, r: jnp.clip(fn(t, r), 0.0, 1.0)))

    t_total = target_frames.shape[0]
    outputs = []
    for start in range(0, t_total, batch_size):
        t_chunk = jnp.asarray(target_frames[start : start + batch_size])
        r_chunk = jnp.asarray(reference_frames[start : start + batch_size])
        actual = t_chunk.shape[0]
        if actual % n_dev != 0:
            pad = n_dev - actual % n_dev
            t_chunk = jnp.concatenate([t_chunk, t_chunk[-1:].repeat(pad, 0)], 0)
            r_chunk = jnp.concatenate([r_chunk, r_chunk[-1:].repeat(pad, 0)], 0)
        sharded = shard_batch({"t": t_chunk, "r": r_chunk}, mesh)
        if per_frame:
            out = mapped(sharded["t"], sharded["r"])
        else:
            out = mapped(sharded["t"])
        outputs.append(out[:actual])
    return jnp.concatenate(outputs, axis=0)
