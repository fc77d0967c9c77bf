"""color_transfer_tpu — a TPU-native framework for color-mismatch correction
in stereoscopic images and video.

A ground-up JAX / XLA / Pallas / pjit re-design with the capabilities of the
reference research stack (egorchistov/color-transfer): six color-transfer
methods, the artificial/real-world stereo evaluation harness, on-device
PSNR/SSIM/FSIM/iCID metrics, distortion synthesis, a fit/test CLI, orbax
checkpointing and W&B-compatible logging.

Layout (see SURVEY.md §7):
    core/      numeric core: colorspace, blur, resize, sampling, linalg
    metrics/   on-device quality metrics (PSNR, SSIM, FSIM, iCID)
    methods/   the six transfer methods + registry
    models/    Flax modules (PASM attention, GMFlow, EfficientNet/UNet)
    ops/       Pallas TPU kernels for the hot paths
    data/      datasets, distortion synthesis, input pipeline
    parallel/  mesh / sharding helpers (DP/row-sharded attention over ICI)
    run/       config system, CLI, train/eval loops, checkpointing, logging
    tools/     offline tooling (weight conversion, dataset postprocessing)
"""

__version__ = "0.1.0"

# Persistent XLA-executable cache (compile_cache.py): tunnel compiles are
# minutes-slow and the reference pays none (eager torch), so every entry
# point — bench, CLI, tests, the driver's graft entries — shares one
# on-disk cache. Opt out with CT_TPU_COMPILATION_CACHE=0.
from color_transfer_tpu import compile_cache as _compile_cache

_compile_cache.enable()
