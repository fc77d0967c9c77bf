#!/bin/bash
# Round-5 measurement session (serialized on one TPU chip; PYTHONPATH must
# keep the axon sitecustomize dir). Reproduces the PERF.md round-5 and
# PARITY_RESULTS.md round-5 numbers.
set -x
cd "$(dirname "$0")/../.."
export PYTHONPATH=$PWD:$PYTHONPATH

# Recipe quality gates (PARITY_RESULTS.md round-5)
python -m examples.deep_gate --model dmsct --recipe bf16+refine32
python -m examples.deep_gate --model dmsct --recipe bf16c
python -m examples.deep_gate --model dcmcs3di --recipe bf16

# Train-shape conv-chain A/B (PERF.md: kernel stays serving-only)
python tools/bench/ab_train_extraction_r5.py

# DMSCT corrector floor + warp-stage splits (in-program ablations)
python tools/bench/prof_corrector_ablate_r4.py
python tools/bench/prof_warp_split_r5.py
PROF_DTYPE=f32 python tools/bench/prof_warp_split_r5.py

# f32 (gated) matcher knob ablation
python tools/bench/prof_f32_matcher_r5.py

# Serving batch sweep (batch-1-per-chip default evidence)
python tools/bench/prof_dmsct_batch.py

# Flow-smoothness probe (kills the tile-window warp kernel at random init)
python tools/bench/probe_flow_smoothness_r5.py

# Full bench (all sections; persistent cache makes repeat runs warm)
BENCH_BUDGET_SECONDS=100000 python bench.py
