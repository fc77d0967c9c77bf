"""flow_warp_batched: forward parity with vmap(flow_warp) and adjoint
correctness of the custom VJP (incl. the Pallas scatter in interpret mode).

The custom VJP exists because XLA lowers the gather-transpose (scatter-add
of 2x2xC windows) to a serialized update loop — measured 2.4 s of DMSCT's
train step at the reference recipe shape (reference configs/dmsct.yaml:13-18,
warp at reference methods/dmsct.py:104-114).
"""

import numpy as np
import jax
import jax.numpy as jnp

from color_transfer_tpu.core import sampling


def _data(b=2, h=9, w=11, c=5, mag=3.0, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    feat = jax.random.uniform(k1, (b, h, w, c), dtype=jnp.float32)
    flow = jax.random.normal(k2, (b, h, w, 2), dtype=jnp.float32) * mag
    return feat, flow


def test_forward_matches_vmap_flow_warp():
    feat, flow = _data()
    out_new = sampling.flow_warp_batched(feat, flow)
    out_ref = jax.vmap(sampling.flow_warp)(feat, flow)
    np.testing.assert_allclose(
        np.asarray(out_new), np.asarray(out_ref), atol=1e-6
    )


def test_feature_gradient_matches_autodiff_of_reference():
    feat, flow = _data(mag=5.0)

    def loss_new(f):
        return jnp.sum(sampling.flow_warp_batched(f, flow) ** 2)

    def loss_ref(f):
        return jnp.sum(jax.vmap(sampling.flow_warp)(f, flow) ** 2)

    g_new = jax.grad(loss_new)(feat)
    g_ref = jax.grad(loss_ref)(feat)
    np.testing.assert_allclose(
        np.asarray(g_new), np.asarray(g_ref), atol=1e-5
    )


def test_flow_gradient_matches_autodiff_of_reference():
    # Keep samples strictly interior so the clamp subgradient choice can't
    # differ from autodiff's at boundary ties.
    feat, flow = _data(mag=1.0)

    def loss_new(fl):
        return jnp.sum(sampling.flow_warp_batched(feat, fl) ** 2)

    def loss_ref(fl):
        return jnp.sum(jax.vmap(sampling.flow_warp)(feat, fl) ** 2)

    g_new = jax.grad(loss_new)(flow)
    g_ref = jax.grad(loss_ref)(flow)
    np.testing.assert_allclose(
        np.asarray(g_new), np.asarray(g_ref), atol=1e-4, rtol=1e-4
    )


def test_pallas_scatter_matches_xla_scatter_interpret():
    feat, flow = _data(b=2, h=16, w=7, c=3, mag=4.0)
    b, h, w, c = feat.shape
    _, _, starts, wx, wy = sampling._warp_geometry(flow, h, w)
    corner_w = jnp.stack(
        [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy], axis=-1
    )
    g = jax.random.normal(jax.random.PRNGKey(7), (b, h, w, c))
    out_pallas = sampling._adjoint_warp_pallas(
        starts, wx, wy, g, interpret=True
    )
    out_xla = sampling._adjoint_warp_xla(starts, corner_w, g)
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_xla), atol=1e-5
    )


def test_out_of_bounds_samples_contribute_zero_grad():
    feat, _ = _data(mag=0.0)
    b, h, w, c = feat.shape
    flow = jnp.full((b, h, w, 2), 1000.0)  # everything far out of bounds

    out = sampling.flow_warp_batched(feat, flow)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    g = jax.grad(lambda f: jnp.sum(sampling.flow_warp_batched(f, flow)))(feat)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)
