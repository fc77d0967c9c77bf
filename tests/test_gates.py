"""Recipe quality-gate guard (methods/gates.py) — VERDICT r4 #6.

A configuration whose recorded drift-gate verdict is FAIL must warn loudly
at the serving surfaces; gate-passing recipes must serve silently.
"""

import warnings

import numpy as np
import pytest

import jax.numpy as jnp

from color_transfer_tpu.methods import gates
from color_transfer_tpu.methods import video


class TestVerdictTable:
    def test_dcmcs3di_bf16_passes(self):
        verdict, _ = gates.recipe_verdict(
            "dcmcs3di", {"compute_dtype": "bfloat16"}
        )
        assert verdict == "pass"

    def test_dcmcs3di_f32_passes(self):
        assert gates.recipe_verdict("dcmcs3di", {})[0] == "pass"

    def test_dmsct_matcher_bf16_fails(self):
        for kw in (
            {"matcher_compute_dtype": "bfloat16"},
            {"matcher_corr_dtype": "bfloat16"},
            {
                "matcher_corr_dtype": "bfloat16",
                "matcher_compute_dtype": "bfloat16",
                "corrector_compute_dtype": "bfloat16",
            },
            # jnp dtype objects, not just strings
            {"matcher_compute_dtype": jnp.bfloat16},
        ):
            verdict, detail = gates.recipe_verdict("dmsct", kw)
            assert verdict == "fail", (kw, verdict)
            assert "0.110" in detail  # cites the measured drift

    def test_dmsct_f32_passes(self):
        assert gates.recipe_verdict("dmsct", {})[0] == "pass"
        assert gates.recipe_verdict("dmsct", None)[0] == "pass"

    def test_check_recipe_warns_only_on_fail(self):
        with pytest.warns(UserWarning, match="FAILED its quality gate"):
            gates.check_recipe(
                "dmsct", {"matcher_compute_dtype": "bfloat16"}
            )
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            gates.check_recipe("dcmcs3di", {"compute_dtype": "bfloat16"})
            gates.check_recipe("dmsct", {})

    def test_allow_ungated_suppresses_warning(self):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            verdict = gates.check_recipe(
                "dmsct",
                {"matcher_compute_dtype": "bfloat16"},
                allow_ungated=True,
            )
        assert verdict == "fail"


class TestServingSurfaceIntegration:
    """The video API must consult the gate table before building a deep
    module (monkeypatched build so the test stays CPU-cheap)."""

    @pytest.fixture
    def stub_deep(self, monkeypatch):
        class StubModule:
            def eval_forward(self, variables, batch):
                return batch["target"]

        def fake_build(method, ckpt_path, module, variables, kwargs, sample):
            return StubModule(), {"params": {}}

        monkeypatch.setattr(video, "_build_deep", fake_build)

    def _frames(self):
        rng = np.random.default_rng(0)
        t = rng.uniform(0.2, 0.8, (2, 8, 16, 3)).astype(np.float32)
        return t, np.clip(t * 0.9, 0, 1).astype(np.float32)

    def test_video_warns_for_failing_dmsct_recipe(self, stub_deep):
        t, r = self._frames()
        with pytest.warns(UserWarning, match="FAILED its quality gate"):
            video.color_transfer_between_videos(
                t, r, method="dmsct", batch_size=2,
                module_kwargs={"matcher_compute_dtype": "bfloat16"},
            )

    def test_video_silent_for_passing_dcmcs3di_recipe(self, stub_deep):
        t, r = self._frames()
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            video.color_transfer_between_videos(
                t, r, method="dcmcs3di", batch_size=2,
                module_kwargs={"compute_dtype": "bfloat16"},
            )

    def test_video_allow_ungated_acknowledges(self, stub_deep):
        t, r = self._frames()
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            video.color_transfer_between_videos(
                t, r, method="dmsct", batch_size=2,
                module_kwargs={"matcher_compute_dtype": "bfloat16"},
                allow_ungated=True,
            )
