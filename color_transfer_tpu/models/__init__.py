"""Flax model zoo: the two deep correctors and their backbones.

  * pasm      — parallax attention (PAB / masked softmax / attention warp /
                disparity regression) for DCMCS3DI
  * dcmcs3di  — deep color-mismatch corrector #1 (Croci et al. 2021)
  * gmflow    — UniMatch/GMFlow optical-flow matcher (frozen in DMSCT)
  * efficientnet / unet_decoder — DMSCT's trainable corrector UNet
  * dmsct     — deep multi-scale color transfer (the reference authors' method)
"""
