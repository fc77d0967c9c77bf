"""Visualization helper tests."""

import numpy as np

import jax.numpy as jnp

from color_transfer_tpu.utils import visualizations as viz
from color_transfer_tpu.utils import flow_viz


class TestVisualizations:
    def test_chess_mix_alternates(self, rng):
        x = jnp.zeros((1, 50, 50, 3))
        y = jnp.ones((1, 50, 50, 3))
        out = np.asarray(viz.chess_mix(x, y, size=25))
        assert (out[0, :25, :25] == 0).all()
        assert (out[0, :25, 25:] == 1).all()
        assert (out[0, 25:, :25] == 1).all()
        assert (out[0, 25:, 25:] == 0).all()

    def test_rgbmse_red_channel_only(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
        y = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
        out = np.asarray(viz.rgbmse(x, y))
        assert out[..., 1:].max() == 0
        assert 0 <= out[..., 0].min() and out[..., 0].max() <= 1 + 1e-6

    def test_rgbssim_runs(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        y = jnp.clip(x + 0.1, 0, 1)
        out = np.asarray(viz.rgbssim(x, y))
        assert out.shape == x.shape and np.isfinite(out).all()


class TestFlowViz:
    def test_wheel_shape(self):
        wheel = flow_viz.make_color_wheel()
        assert wheel.shape == (55, 3)
        assert wheel.max() == 255

    def test_flow_to_image(self, rng):
        flow = rng.normal(0, 3, (20, 30, 2)).astype(np.float32)
        img = flow_viz.flow_to_image(flow)
        assert img.shape == (20, 30, 3) and img.dtype == np.uint8

    def test_zero_flow_is_white(self):
        img = flow_viz.flow_to_image(np.zeros((8, 8, 2)))
        assert (img > 240).all()  # zero motion ~ white center of the wheel

    def test_batch(self, rng):
        flows = rng.normal(0, 2, (3, 8, 10, 2)).astype(np.float32)
        imgs = flow_viz.flow_batch_to_images(flows)
        assert imgs.shape == (3, 8, 10, 3)
