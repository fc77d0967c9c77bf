"""``python -m color_transfer_tpu.cli`` — see run/cli.py."""

import os

# Honor an explicit JAX_PLATFORMS before anything imports jax: some managed
# environments register a TPU plugin from sitecustomize and re-pin the
# platform config at interpreter startup, which would silently override
# ``JAX_PLATFORMS=cpu python -m color_transfer_tpu.cli ...``.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:  # noqa: BLE001 — leave an already-initialized backend be
        pass

from color_transfer_tpu.run.cli import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
