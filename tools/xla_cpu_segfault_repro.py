"""Upstream-ready repro: XLA:CPU compiler segfault after hundreds of
accumulated executables in one process.

Observed in this repo's full test suite (280 tests, 8-device virtual CPU
mesh): with no cache clearing, the XLA:CPU (LLVM ORC JIT) compiler
segfaults late in the run inside compilation of an UNRELATED, individually
passing test's program — reproducibly around several hundred live compiled
executables. tests/conftest.py works around it by calling
``jax.clear_caches()`` between test modules, which bounds the live
executable population (the crash has not reproduced since).

This script is the standalone repro ATTEMPT: it compiles a stream of
distinct programs (unique shapes so nothing cache-hits) WITHOUT clearing
caches and reports progress. STATUS (2026-08-19, this image's jax/jaxlib):
1200 small conv/reduce programs did NOT reproduce — the crash evidently
needs the suite's larger program population (whole-model forwards,
8-device sharded computations, Pallas interpret calls). Kept as the
harness to bisect with when upstreaming; the authoritative observation
remains: full suite without conftest cache clearing -> SIGSEGV late in
the run, with clearing -> no crash across every run since.

    JAX_PLATFORMS=cpu python tools/xla_cpu_segfault_repro.py
    JAX_PLATFORMS=cpu python tools/xla_cpu_segfault_repro.py --clear

Environment where this was observed: jax/jaxlib of this image (see
`pip show jax jaxlib`), Linux x86-64, XLA_FLAGS
--xla_force_host_platform_device_count=8.
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clear", action="store_true",
                    help="clear jax caches every 50 programs (workaround)")
    ap.add_argument("--n", type=int, default=1200,
                    help="number of distinct programs to compile")
    args = ap.parse_args()

    for i in range(args.n):
        # Unique shapes force a fresh executable each iteration; the mix of
        # conv/reduce/elementwise mirrors the suite's program population.
        h = 8 + (i % 37)
        w = 16 + (i % 53)
        x = jnp.ones((2, h, w, 4), jnp.float32)
        k = jnp.ones((3, 3, 4, 4), jnp.float32)

        @jax.jit
        def prog(x, k):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jnp.tanh(y).sum(axis=(1, 2)) + x.mean()

        float(prog(x, k).sum())
        if i % 50 == 49:
            print(f"compiled {i + 1}/{args.n} programs", flush=True)
            if args.clear:
                jax.clear_caches()
    print("survived", flush=True)


if __name__ == "__main__":
    main()
