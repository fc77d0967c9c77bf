"""Recorded quality-gate verdicts for the deep-model throughput recipes.

Every opt-in mixed-precision / fused-kernel recipe is admitted through the
31-distortion drift gate (examples/deep_gate.py; protocol: reference
utils/data.py:12-22 grid, recipe-vs-f32 on identical weights, pass =
|dPSNR| < 0.05 dB, |dSSIM| < 5e-4, |diCID| < 5e-4). This table is the
machine-readable record of those runs (PARITY_RESULTS.md has the full
numbers), and the serving surfaces (methods/video.py, run/predict.py)
consult it so a configuration whose recorded verdict is FAIL cannot be
served silently — the user gets a loud warning naming the measured drift,
or passes ``allow_ungated=True`` to acknowledge it (VERDICT r4 #6).

Signatures are the dtype knobs that determine numerics; kernel-routing
flags (use_pallas / fused_extraction / matcher_fused_attention="auto") are
NOT part of the signature where the gate measured them equal-drift
(PARITY_RESULTS.md round-4: bf16 vs bf16+fused vs bf16-nofuse identical).
"""

import warnings

def _is_bf16(v):
    if v is None:
        return False
    if isinstance(v, str):
        return v in ("bfloat16", "bf16")
    try:
        import jax.numpy as jnp

        return jnp.dtype(v) == jnp.dtype(jnp.bfloat16)
    except (TypeError, ValueError):
        return False


def recipe_verdict(method, module_kwargs):
    """Return (verdict, detail) for a deep-method recipe configuration.

    verdict: "pass" | "fail" | "unrecorded". Measured evidence:
    PARITY_RESULTS.md round-4/round-5 gate tables.
    """
    kw = dict(module_kwargs or {})
    if method == "dcmcs3di":
        if _is_bf16(kw.get("compute_dtype")):
            return (
                "pass",
                "dcmcs3di bf16 recipe (incl. fused conv-chain): worst "
                "dPSNR +0.0012 dB (PARITY_RESULTS.md round-4)",
            )
        return ("pass", "bit-strict f32 default")
    if method == "dmsct":
        matcher_bf16 = _is_bf16(kw.get("matcher_compute_dtype")) or _is_bf16(
            kw.get("matcher_corr_dtype")
        )
        corrector_bf16 = _is_bf16(kw.get("corrector_compute_dtype"))
        if matcher_bf16:
            return (
                "fail",
                "dmsct recipes with a bf16 MATCHER fail the drift gate "
                "(worst dPSNR +0.110 dB / dSSIM 1.5e-2). The round-5 "
                "refine32 experiment (flow arithmetic pinned f32, bf16 only "
                "in the feature stacks) drifts IDENTICALLY: any upstream "
                "rounding is amplified by the iterative refinement to the "
                "same saturated scale, so no selective matcher recipe "
                "passes at random init (PARITY_RESULTS.md round-5). Keep "
                "the matcher f32",
            )
        if corrector_bf16:
            return (
                "fail",
                "dmsct corrector-only bf16 (matcher f32) is a measured "
                "NEAR-miss: worst dPSNR +0.0001 dB, diCID 1.8e-5, pair "
                "PSNR 67.5 dB, but worst dSSIM -8.7e-4 exceeds the 5e-4 "
                "line at random init (PARITY_RESULTS.md round-5)",
            )
        return ("pass", "bit-strict f32 default")
    return ("unrecorded", f"no gate record for method {method!r}")


def check_recipe(method, module_kwargs, allow_ungated=False):
    """Warn loudly (or raise nothing, if acknowledged) when a recipe whose
    recorded gate verdict is FAIL is about to serve."""
    verdict, detail = recipe_verdict(method, module_kwargs)
    if verdict == "fail" and not allow_ungated:
        warnings.warn(
            f"serving a recipe that FAILED its quality gate: {detail}. "
            "Pass allow_ungated=True to acknowledge.",
            UserWarning,
            stacklevel=3,
        )
    return verdict
