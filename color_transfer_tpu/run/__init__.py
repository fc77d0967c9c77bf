"""Orchestration: config system, CLI, train/eval loops, checkpoints, logging.

The TPU-native replacement for the reference's LightningCLI + Trainer stack
(reference utils/cli.py, configs/*.yaml): YAML configs with class-path
instantiation, a fit/test CLI, orbax checkpointing with best-metric gating,
and a W&B-compatible metric logger with the reference's exact metric names.
"""
