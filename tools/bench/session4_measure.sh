#!/bin/bash
# Round-4 measurement queue (single chip; everything serialized).
# Assumes prof_multichip_overhead_r4.py already ran (or run it first).
# Usage: bash tools/bench/session4_measure.sh 2>&1 | tee /tmp/measure_r4.log
set -x
cd "$(dirname "$0")/../.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

timeout 300 python -c "import jax; print(jax.devices())" || exit 1

# 1. Extraction conv-gap diagnosis (roofline follow-up): why do ResB
#    stacks run 2.3x the chip's own in-chain conv rate?
timeout 2400 python tools/bench/ab_extraction_r4.py

# 2. Transformer A/B tables (VERDICT r3 #5): naive/winmaj/fused x f32/bf16.
timeout 3600 python tools/bench/bench_transformer.py train
timeout 3600 python tools/bench/bench_transformer.py fullres

# 3. Train-step timings (VERDICT r3 #5).
timeout 3600 python tools/bench/dbg_dcmcs3di_trainstep_r4.py
timeout 3600 python tools/bench/dbg_trainstep.py
