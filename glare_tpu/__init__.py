"""GLARE-TPU: a TPU-native (JAX/XLA/Pallas) low-light image enhancement framework.

Re-implements the full capability surface of GLARE (ECCV 2024, low-light image
enhancement via generative latent feature based codebook retrieval) as a
TPU-first stack:

  * stage 1 — VQGAN codebook prior training (``glare_tpu.sr``; reference:
    ``defor_cuda_ext/basicsr``)
  * stage 2 — conditional normalizing flow over the VQGAN latent
    (``glare_tpu.modules.llflow_vqgan2``; reference: ``code/models/modules``)
  * stage 3 — adaptive feature transformation decoder with a TPU-native
    modulated deformable convolution (``glare_tpu.ops.dcn``; reference:
    ``code/models/modules/ops/dcn`` CUDA extension)

Design stance: NHWC layouts, flax.linen modules, single jitted train/eval
steps, explicit PRNG threading, ``jax.sharding.Mesh`` SPMD for scale-out.
"""

__version__ = "0.1.0"
