"""Video transfer entry point over the 8-device mesh."""

import numpy as np

import jax.numpy as jnp

from color_transfer_tpu.methods.video import color_transfer_between_videos
from color_transfer_tpu.methods import linear


class TestVideoTransfer:
    def test_matches_per_frame_application(self, rng):
        t = rng.uniform(0.2, 0.8, (11, 16, 24, 3)).astype(np.float32)
        r = np.clip(t * 0.9 + 0.05, 0, 1).astype(np.float32)
        out = np.asarray(
            color_transfer_between_videos(t, r, method="monge_kantorovitch", batch_size=8)
        )
        assert out.shape == t.shape
        want = np.clip(
            np.asarray(linear.monge_kantorovitch(jnp.asarray(t[3]), jnp.asarray(r[3]))),
            0,
            1,
        )
        np.testing.assert_allclose(out[3], want, atol=1e-5)

    def test_global_mode_is_consistent(self, rng):
        base = rng.uniform(0.3, 0.7, (1, 16, 24, 3)).astype(np.float32)
        t = np.repeat(base, 5, axis=0)
        r = np.clip(t * 0.9, 0, 1)
        out = np.asarray(
            color_transfer_between_videos(
                t, r, method="reinhard", batch_size=8, per_frame=False
            )
        )
        for i in range(1, 5):
            np.testing.assert_allclose(out[i], out[0], atol=1e-6)
