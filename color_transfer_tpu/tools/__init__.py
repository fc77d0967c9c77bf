"""Offline tooling: pretrained-weight conversion, dataset postprocessing."""
