"""Checkpoint-converter structural tests: the converted tree must exactly
match the flax models' init trees (names, shapes) — fabricated torch-layout
state dicts stand in for the real downloads (zero-egress image)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from color_transfer_tpu.models.dcmcs3di import DCMCS3DI
from color_transfer_tpu.models.efficientnet import EfficientNetEncoder
from color_transfer_tpu.tools import convert_checkpoints as cc


def _tree_paths(tree):
    return {
        jax.tree_util.keystr(k): np.shape(v)
        for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def _fake_torch_conv(sd, key, flax_kernel, bias=True):
    kh, kw, i, o = flax_kernel.shape
    sd[f"{key}.weight"] = np.random.default_rng(0).normal(size=(o, i, kh, kw)).astype(np.float32)
    if bias:
        sd[f"{key}.bias"] = np.zeros(o, dtype=np.float32)


class TestDCMCS3DIConverter:
    def test_tree_matches_model_init(self, rng):
        model = DCMCS3DI(extraction_layers=2, transfer_layers=1, channels=8)
        x = jnp.zeros((1, 8, 16, 3))
        want = _tree_paths(model.init(jax.random.PRNGKey(0), x, x)["params"])

        # Fabricate a torch state dict with the reference's module names.
        sd = {}
        c = 8

        def conv(key, i, o, k):
            sd[f"{key}.weight"] = np.zeros((o, i, k, k), dtype=np.float32)
            sd[f"{key}.bias"] = np.zeros(o, dtype=np.float32)

        def resb(key, ch):
            conv(f"{key}.body.0", ch, ch, 3)
            conv(f"{key}.body.2", ch, ch, 3)

        conv("extraction.0", 3, c, 3)
        resb("extraction.1", c)
        resb("extraction.2", c)
        resb("matcher.head", c)
        conv("matcher.query", c, c, 1)
        conv("matcher.key", c, c, 1)
        conv("matcher.value", c, c, 1)
        conv("transfer.0", 2 * c + 1, c, 1)
        resb("transfer.1", c)
        conv("transfer.2", c, c // 2, 3)
        conv("transfer.3", c // 2, 3, 3)

        got_tree = cc.convert_dcmcs3di(sd, extraction_layers=2, transfer_layers=1)
        got = _tree_paths(got_tree)
        assert got == want


class TestEfficientNetConverter:
    @pytest.mark.parametrize("variant,depth", [("efficientnet-b2", 4)])
    def test_tree_matches_encoder_init(self, variant, depth):
        enc = EfficientNetEncoder(name_variant=variant, depth=depth)
        x = jnp.zeros((1, 32, 32, 3))
        variables = enc.init(jax.random.PRNGKey(0), x)
        want_p = _tree_paths(variables["params"])
        want_s = _tree_paths(variables["batch_stats"])

        # Fabricate efficientnet-pytorch-style keys with correct shapes by
        # inverting the conversion from the known flax shapes.
        sd = {}
        p = variables["params"]
        s = variables["batch_stats"]
        sd["encoder._conv_stem.weight"] = np.transpose(
            np.asarray(p["stem_conv"]["kernel"]), (3, 2, 0, 1)
        )

        def put_bn(key, params_mod, stats_mod):
            sd[f"{key}.weight"] = np.asarray(params_mod["BatchNorm_0"]["scale"])
            sd[f"{key}.bias"] = np.asarray(params_mod["BatchNorm_0"]["bias"])
            sd[f"{key}.running_mean"] = np.asarray(stats_mod["BatchNorm_0"]["mean"])
            sd[f"{key}.running_var"] = np.asarray(stats_mod["BatchNorm_0"]["var"])

        put_bn("encoder._bn0", p["stem_bn"], s["stem_bn"])

        from color_transfer_tpu.models.efficientnet import _B0_STAGES, _COEFFS, round_repeats

        _, depth_c = _COEFFS[variant]
        flat = 0
        for stage_idx, (k_, s_, e, base_out, base_r) in enumerate(_B0_STAGES):
            for r in range(round_repeats(base_r, depth_c)):
                name = f"stage{stage_idx}_block{r}"
                if name not in p:
                    continue
                bp = f"encoder._blocks.{flat}"
                block = p[name]
                bstat = s[name]
                if "expand_conv" in block:
                    sd[f"{bp}._expand_conv.weight"] = np.transpose(
                        np.asarray(block["expand_conv"]["kernel"]), (3, 2, 0, 1)
                    )
                    put_bn(f"{bp}._bn0", block["bn0"], bstat["bn0"])
                sd[f"{bp}._depthwise_conv.weight"] = np.transpose(
                    np.asarray(block["depthwise_conv"]["kernel"]), (3, 2, 0, 1)
                )
                put_bn(f"{bp}._bn1", block["bn1"], bstat["bn1"])
                for se in ["se_reduce", "se_expand"]:
                    sd[f"{bp}._{se}.weight"] = np.transpose(
                        np.asarray(block[se]["kernel"]), (3, 2, 0, 1)
                    )
                    sd[f"{bp}._{se}.bias"] = np.asarray(block[se]["bias"])
                sd[f"{bp}._project_conv.weight"] = np.transpose(
                    np.asarray(block["project_conv"]["kernel"]), (3, 2, 0, 1)
                )
                put_bn(f"{bp}._bn2", block["bn2"], bstat["bn2"])
                flat += 1

        got_p, got_s = cc.convert_efficientnet(sd, name_variant=variant, depth=depth)
        assert _tree_paths(got_p) == want_p
        assert _tree_paths(got_s) == want_s
