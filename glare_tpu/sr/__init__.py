"""Stage-1 VQGAN-codebook training framework (reference:
``defor_cuda_ext/basicsr`` — the vendored BasicSR/RIDCP subset).

Subsystems: fvcore-style registries with auto-import, the RIDCP
weighted-codebook VQ autoencoder (VQWeightDehazeNet) with Swin RSTB blocks
and DCN warp alignment, UNet-SN discriminator, registry losses (pixel /
perceptual+style / GAN family), GAN trainer with EMA + best-metric
tracking, on-the-fly degradation datasets, and config-driven train/test
pipelines.
"""
