"""DMSCT model + module tests (tiny shapes) and GMFlow converter round-trip."""

import numpy as np

import jax
import jax.numpy as jnp

from color_transfer_tpu.models.dmsct import DMSCT
from color_transfer_tpu.models.efficientnet import EfficientNetEncoder, encoder_out_channels
from color_transfer_tpu.run.modules import DMSCTModule


class TestEfficientNet:
    def test_b2_channel_plan(self):
        # smp's encoders table for efficientnet-b2: (3, 32, 24, 48, 120, 352)
        # — reduction 2 is the 32-ch STEM output, not stage-0's 16-ch MBConv.
        assert encoder_out_channels("efficientnet-b2", 4) == (3, 32, 24, 48, 120)
        assert encoder_out_channels("efficientnet-b2", 5) == (3, 32, 24, 48, 120, 352)
        assert encoder_out_channels("efficientnet-b0", 5) == (3, 32, 24, 40, 112, 320)

    def test_feature_pyramid_shapes(self, rng):
        enc = EfficientNetEncoder(depth=4)
        x = jnp.asarray(rng.uniform(0, 1, (1, 32, 48, 3)).astype(np.float32))
        variables = enc.init(jax.random.PRNGKey(0), x)
        feats = enc.apply(variables, x)
        shapes = [f.shape for f in feats]
        assert shapes == [
            (1, 32, 48, 3),
            (1, 16, 24, 32),
            (1, 8, 12, 24),
            (1, 4, 6, 48),
            (1, 2, 3, 120),
        ]

    def test_decoder_skip_channels_match_smp(self, rng):
        """Decoder block input channels must follow smp's (2C+1) skip plan:
        [241+97, 256+49, 128+65, 64+7] for b2/depth4 with (256,128,64,32)
        (reference methods/dmsct.py:40-51). The 65 = 2*32+1 entry is the one
        the stem tap controls."""
        model = DMSCT(matcher_num_layers=1, matcher_num_reg_refine=1)
        t = jnp.zeros((1, 32, 32, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, t, t
        )
        dec = variables["params"]["decoder"]
        got = [dec[f"block{i}"]["conv1"]["kernel"].shape[2] for i in range(4)]
        assert got == [241 + 97, 256 + 49, 128 + 65, 64 + 7]

    def test_batch_stats_updated_in_train(self, rng):
        enc = EfficientNetEncoder(depth=2)
        x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
        variables = enc.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
        )
        _, updates = enc.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(updates["batch_stats"])
        assert any(
            np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in zip(after, before)
        )


class TestDMSCTModel:
    def test_forward_shape_and_range(self, rng):
        model = DMSCT(matcher_num_layers=1, matcher_num_reg_refine=1)
        # 30x50 exercises both the x32 matcher resize and the x16 pad/crop.
        t = jnp.asarray(rng.uniform(0, 1, (1, 30, 50, 3)).astype(np.float32))
        r = jnp.asarray(rng.uniform(0, 1, (1, 30, 50, 3)).astype(np.float32))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, t, r
        )
        out = model.apply(variables, t, r)
        assert out.shape == (1, 30, 50, 3)
        o = np.asarray(out)
        assert np.isfinite(o).all() and o.min() >= 0 and o.max() <= 1


class TestCorrectorMixedPrecision:
    """corrector_compute_dtype: bf16 encoder/decoder/head convs, f32 params,
    f32 BN statistics, f32 warp boundary and residual add."""

    def _pair(self, rng, b=1, h=32, w=32):
        t = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
        r = jnp.clip(t * 0.9 + 0.03, 0, 1)
        return t, r

    def test_bf16_corrector_tracks_f32_with_shared_weights(self, rng):
        kwargs = dict(matcher_num_layers=1, matcher_num_reg_refine=1)
        f32 = DMSCT(**kwargs)
        bf16 = DMSCT(**kwargs, corrector_compute_dtype="bfloat16")
        t, r = self._pair(rng)
        keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        variables = jax.jit(f32.init)(keys, t, r)
        # Param tree is dtype-independent (params stay f32): the bf16 model
        # applies the SAME variables.
        out_a = np.asarray(jax.jit(f32.apply)(variables, t, r))
        out_b = np.asarray(jax.jit(bf16.apply)(variables, t, r))
        assert out_b.dtype == np.float32
        assert np.isfinite(out_b).all()
        # [0,1] image output through a shallow random-init corrector should
        # track f32 to bf16 resolution.
        assert np.max(np.abs(out_a - out_b)) < 0.05
        assert not np.array_equal(out_a, out_b)  # the knob engages

    def test_default_path_is_bit_strict(self, rng):
        kwargs = dict(matcher_num_layers=1, matcher_num_reg_refine=1)
        a = DMSCT(**kwargs)
        b = DMSCT(**kwargs, corrector_compute_dtype=None)
        t, r = self._pair(rng)
        keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        variables = jax.jit(a.init)(keys, t, r)
        np.testing.assert_array_equal(
            np.asarray(jax.jit(a.apply)(variables, t, r)),
            np.asarray(jax.jit(b.apply)(variables, t, r)),
        )

    def test_bf16_train_step_updates_and_keeps_f32_params(self, rng):
        module = DMSCTModule(
            heavy_metrics=False, matcher_num_layers=1,
            matcher_num_reg_refine=1, corrector_compute_dtype="bfloat16",
        )
        gt = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
        batch = {"gt": gt, "reference": jnp.clip(gt * 0.9 + 0.03, 0, 1)}
        state = module.init_state(jax.random.PRNGKey(0), batch, num_train_steps=10)
        params_before = jax.tree_util.tree_map(np.asarray, state.params)
        new_state, logs = module.train_step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(logs["Training Total Loss"]))
        leaves = jax.tree_util.tree_leaves(new_state.params)
        assert all(a.dtype == jnp.float32 for a in leaves)
        diffs = [
            np.abs(np.asarray(a) - b).max()
            for a, b in zip(
                jax.tree_util.tree_leaves(new_state.params["encoder"]),
                jax.tree_util.tree_leaves(params_before["encoder"]),
            )
        ]
        assert max(diffs) > 0


class TestDMSCTModule:
    def test_train_step_updates_corrector_not_matcher(self, rng):
        module = DMSCTModule(
            heavy_metrics=False, matcher_num_layers=1, matcher_num_reg_refine=1
        )
        b, h, w = 2, 32, 32
        gt = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
        batch = {"gt": gt, "reference": jnp.clip(gt * 0.9 + 0.03, 0, 1)}
        state = module.init_state(jax.random.PRNGKey(0), batch, num_train_steps=10)

        # Copy before the step: train_step donates its input state.
        params_before = jax.tree_util.tree_map(np.asarray, state.params)
        new_state, logs = module.train_step(state, batch, jax.random.PRNGKey(1))

        assert np.isfinite(float(logs["Training Total Loss"]))
        # Matcher frozen.
        for a, b_ in zip(
            jax.tree_util.tree_leaves(new_state.params["matcher"]),
            jax.tree_util.tree_leaves(params_before["matcher"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), b_)
        # Corrector trained.
        diffs = [
            np.abs(np.asarray(a) - np.asarray(b_)).max()
            for a, b_ in zip(
                jax.tree_util.tree_leaves(new_state.params["encoder"]),
                jax.tree_util.tree_leaves(params_before["encoder"]),
            )
        ]
        assert max(diffs) > 0


class TestConverter:
    def test_round_trip(self, rng):
        from color_transfer_tpu.models.gmflow import GMFlow
        from color_transfer_tpu.tools.convert_gmflow import (
            convert_state_dict,
            invert_to_state_dict,
        )

        model = GMFlow(inference_size=(32, 32))
        x = jnp.asarray(rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, x)
        params = jax.tree_util.tree_map(np.asarray, variables["params"])

        sd = invert_to_state_dict(params)
        back = convert_state_dict(sd)

        flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_b = {
            jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_flatten_with_path(back)[0]
        }
        assert len(flat_a) == len(flat_b)
        for k, v in flat_a:
            ks = jax.tree_util.keystr(k)
            assert ks in flat_b, ks
            np.testing.assert_array_equal(v, flat_b[ks])
