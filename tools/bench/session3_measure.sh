#!/bin/bash
# Round-3 measurement backlog — run on a box with the TPU tunnel UP.
# Serializes everything (single chip; remote compiles are minutes-slow).
# Usage: bash tools/bench/session3_measure.sh 2>&1 | tee /tmp/measure_r3.log
set -x
cd "$(dirname "$0")/../.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

# 0. Tunnel sanity (fails fast if the chip is unreachable).
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. Transformer A/B: naive vs window-major vs fused kernels, f32+bf16,
#    both matcher scale shapes. The headline decision input: if `fused`
#    beats `winmaj`, flip fused_attention defaults in models/gmflow.py +
#    configs/dmsct.yaml (and re-gate bf16 parity via mini_eval below).
timeout 3600 python tools/bench/bench_transformer.py train
timeout 3600 python tools/bench/bench_transformer.py fullres

# 2. Whole-model + kernel-integrity re-baseline (writes the stderr lines
#    PERF.md quotes; canaries catch Mosaic miscompiles of every new mode).
timeout 3600 python bench.py

# 3. Train-step timings (DMSCT matcher + DCMCS3DI recipes).
timeout 3600 python tools/bench/dbg_trainstep.py
timeout 3600 python tools/bench/bench_dmsct_bf16.py

# 4. Quality gates: mini 31-distortion protocol for the bf16 recipes and
#    (if flipped) the fused-kernel path; PSNR delta must stay < 0.05 dB.
#    Needs a real stereopair — point at any NNNN_L/NNNN_R pair.
if [ -n "$LEFT" ] && [ -n "$RIGHT" ]; then
  timeout 3600 python -m examples.mini_eval --left "$LEFT" --right "$RIGHT"
else
  echo "SKIP mini_eval: set LEFT=/path/NNNN_L.png RIGHT=/path/NNNN_R.png"
fi
