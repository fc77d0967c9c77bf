"""FSIM / FSIMc — feature-similarity index, on-device.

The reference outsources FSIM to the external ``piq`` package
(reference methods/__init__.py:5,:34); piq in turn ports the original MATLAB
FSIM.m (Zhang et al., "FSIM: A Feature Similarity Index for Image Quality
Assessment", IEEE TIP 2011) whose phase-congruency transform is Kovesi's
``phasecong2``. This module re-derives that pipeline in JAX:

  1. scale to [0, 255], RGB -> YIQ, average-pool by f = round(min(H,W)/256);
  2. phase congruency of both luminance images via a log-Gabor filter bank
     (4 scales x 4 orientations) in the FFT domain, with Rayleigh noise
     threshold estimated from the median response at the smallest scale;
  3. Scharr gradient magnitude similarity;
  4. FSIMc chromatic term on I/Q channels with lambda = 0.03 (MATLAB takes
     the real part of the complex power for negative bases — reproduced
     analytically here);
  5. score = sum(S_L * PCm) / sum(PCm).

Everything is static-shape and jittable; the filter bank is built at trace
time from the (static) image shape.
"""

from functools import lru_cache
import math

import jax.numpy as jnp
import numpy as np
from jax import lax

from color_transfer_tpu.core.colorspace import rgb_to_yiq
from color_transfer_tpu.core.resize import avg_pool2d


@lru_cache(maxsize=16)
def _filter_bank(h, w, scales, orientations, min_length, mult, sigma_f, delta_theta):
    """Log-Gabor x angular-spread filter bank (numpy, cached per shape).

    Returns (filters[o, s, H, W] float32, lowpass-normalized) following
    phasecong2.m's frequency-plane construction.
    """
    if w % 2 == 0:
        xr = np.arange(-w // 2, w // 2) / w
    else:
        xr = np.arange(-(w - 1) // 2, (w - 1) // 2 + 1) / w
    if h % 2 == 0:
        yr = np.arange(-h // 2, h // 2) / h
    else:
        yr = np.arange(-(h - 1) // 2, (h - 1) // 2 + 1) / h
    x, y = np.meshgrid(xr, yr)
    radius = np.fft.ifftshift(np.sqrt(x**2 + y**2))
    theta = np.fft.ifftshift(np.arctan2(-y, x))
    radius[0, 0] = 1.0

    # lowpassfilter(size, cutoff=0.45, n=15)
    lp = np.fft.ifftshift(1.0 / (1.0 + (np.sqrt(x**2 + y**2) / 0.45) ** 30))

    log_gabors = []
    for s in range(scales):
        wavelength = min_length * mult**s
        fo = 1.0 / wavelength
        lg = np.exp(-(np.log(radius / fo) ** 2) / (2 * math.log(sigma_f) ** 2))
        lg *= lp
        lg[0, 0] = 0.0
        log_gabors.append(lg)

    sin_t, cos_t = np.sin(theta), np.cos(theta)
    theta_sigma = math.pi / orientations / delta_theta
    spreads = []
    for o in range(orientations):
        angl = o * math.pi / orientations
        ds = sin_t * math.cos(angl) - cos_t * math.sin(angl)
        dc = cos_t * math.cos(angl) + sin_t * math.sin(angl)
        dtheta = np.abs(np.arctan2(ds, dc))
        spreads.append(np.exp(-(dtheta**2) / (2 * theta_sigma**2)))

    filters = np.stack(
        [np.stack([lg * sp for lg in log_gabors]) for sp in spreads]
    )  # [O, S, H, W]
    return filters.astype(np.float32)


def phase_congruency(
    x,
    scales=4,
    orientations=4,
    min_length=6,
    mult=2,
    sigma_f=0.55,
    delta_theta=1.2,
    k=2.0,
    eps=1e-4,
):
    """Kovesi phasecong2 as used by FSIM: PC map for (N, H, W) images."""
    n, h, w = x.shape
    filters = jnp.asarray(
        _filter_bank(h, w, scales, orientations, min_length, mult, sigma_f, delta_theta)
    )  # [O, S, H, W]

    imfft = jnp.fft.fft2(x)[:, None, None, :, :]  # [N, 1, 1, H, W]
    eo = jnp.fft.ifft2(imfft * filters)  # [N, O, S, H, W] complex
    an = jnp.abs(eo)
    e = jnp.real(eo)
    o_ = jnp.imag(eo)

    sum_an = an.sum(axis=2)  # [N, O, H, W]
    sum_e = e.sum(axis=2)
    sum_o = o_.sum(axis=2)

    x_energy = jnp.sqrt(sum_e**2 + sum_o**2) + eps
    mean_e = sum_e / x_energy
    mean_o = sum_o / x_energy

    energy = (
        e * mean_e[:, :, None] + o_ * mean_o[:, :, None]
        - jnp.abs(e * mean_o[:, :, None] - o_ * mean_e[:, :, None])
    ).sum(axis=2)  # [N, O, H, W]

    # --- Rayleigh noise threshold (phasecong2.m noise model) ---
    ifft_filters = jnp.real(jnp.fft.ifft2(filters)) * math.sqrt(h * w)  # [O, S, H, W]
    em_n = (filters[:, 0] ** 2).sum(axis=(-2, -1))  # [O]
    median_e2n = jnp.median(
        (an[:, :, 0] ** 2).reshape(n, orientations, -1), axis=-1
    )  # [N, O]
    mean_e2n = -median_e2n / math.log(0.5)
    noise_power = mean_e2n / em_n  # [N, O]

    est_sum_an2 = (ifft_filters**2).sum(axis=1)  # [O, H, W]
    sum_est_sum_an2 = est_sum_an2.sum(axis=(-2, -1))  # [O]

    cross = jnp.zeros((orientations,))
    for si in range(scales - 1):
        for sj in range(si + 1, scales):
            cross = cross + (ifft_filters[:, si] * ifft_filters[:, sj]).sum(axis=(-2, -1))

    est_noise_energy2 = 2 * noise_power * sum_est_sum_an2 + 4 * noise_power * cross
    tau = jnp.sqrt(est_noise_energy2 / 2.0)
    est_noise_energy = tau * math.sqrt(math.pi / 2.0)
    est_noise_sigma = jnp.sqrt((2.0 - math.pi / 2.0) * tau**2)
    t = (est_noise_energy + k * est_noise_sigma) / 1.7  # empirical rescale

    energy = jnp.maximum(energy - t[:, :, None, None], 0.0)

    return energy.sum(axis=1) / (sum_an.sum(axis=1) + eps)  # [N, H, W]


def _scharr_grad(x):
    """Scharr gradient magnitude with zero 'same' padding (FSIM.m dx/dy/16)."""
    kx = jnp.array([[3.0, 0.0, -3.0], [10.0, 0.0, -10.0], [3.0, 0.0, -3.0]]) / 16.0
    ky = kx.T
    n, h, w = x.shape
    flat = x.reshape(n, 1, h, w)

    def conv(img, kern):
        return lax.conv_general_dilated(
            img, kern.reshape(1, 1, 3, 3), (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    gx = conv(flat, kx)
    gy = conv(flat, ky)
    return jnp.sqrt(gx**2 + gy**2).reshape(n, h, w)


def _sim(a, b, t):
    return (2.0 * a * b + t) / (a**2 + b**2 + t)


def fsim(x, y, data_range=1.0, chromatic=True, valid_hw=None):
    """FSIM / FSIMc over channel-last (B, H, W, 3) batches in [0, data_range].

    Matches the MATLAB reference protocol piq follows: 0..255 scaling, YIQ
    luminance, f-fold average pooling, T1=0.85, T2=160, T3=T4=200,
    lambda=0.03.

    ``valid_hw``: optional dynamic (h_true, w_true) for bucketed eval
    (run/bucketing.py) — the PC-weighted reduction then excludes the padded
    region, whose artificial step edge otherwise dominates phase congruency.
    The global-FFT phase congruency inside the true region remains slightly
    perturbed by the padding (approximation quantified in test_bucketing).
    """
    x = x * (255.0 / data_range)
    y = y * (255.0 / data_range)

    if x.shape[-1] == 3:
        x = rgb_to_yiq(x)
        y = rgb_to_yiq(y)
    x = jnp.moveaxis(x, -1, 1)  # (B, C, H, W)
    y = jnp.moveaxis(y, -1, 1)

    f = max(1, round(min(x.shape[-2], x.shape[-1]) / 256))
    if f > 1:
        x = avg_pool2d(x, f)
        y = avg_pool2d(y, f)
        if valid_hw is not None:
            valid_hw = (valid_hw[0] // f, valid_hw[1] // f)

    lum_x, lum_y = x[:, 0], y[:, 0]

    pc_x = phase_congruency(lum_x)
    pc_y = phase_congruency(lum_y)
    g_x = _scharr_grad(lum_x)
    g_y = _scharr_grad(lum_y)

    s_pc = _sim(pc_x, pc_y, 0.85)
    s_g = _sim(g_x, g_y, 160.0)
    s_l = s_pc * s_g

    if chromatic:
        lmbda = 0.03
        s_i = _sim(x[:, 1], y[:, 1], 200.0)
        s_q = _sim(x[:, 2], y[:, 2], 200.0)
        s_iq = s_i * s_q
        # MATLAB: real((S_I*S_Q)^lambda) — for negative bases the principal
        # complex power has real part |b|^l * cos(pi*l).
        mag = jnp.abs(s_iq) ** lmbda
        s_l = s_l * jnp.where(s_iq >= 0, mag, mag * math.cos(math.pi * lmbda))

    pc_max = jnp.maximum(pc_x, pc_y)
    if valid_hw is not None:
        mh, mw = pc_max.shape[-2], pc_max.shape[-1]
        ih = lax.broadcasted_iota(jnp.int32, (mh, mw), 0)
        iw = lax.broadcasted_iota(jnp.int32, (mh, mw), 1)
        pc_max = pc_max * ((ih < valid_hw[0]) & (iw < valid_hw[1])).astype(
            pc_max.dtype
        )
    score = (s_l * pc_max).sum(axis=(-2, -1)) / pc_max.sum(axis=(-2, -1))
    return score.mean()
