"""subspace_reg_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of feyzaakyurek/subspace-reg (ICLR 2022, arXiv 2110.07059).

Built from scratch, TPU-first:
  * functional Flax backbone (RFS-style ResNet) with PyTorch-faithful numerics
  * statically-padded growing classifier head (XLA-friendly FSCIL "surgery")
  * the three subspace/semantic regularizers as pure functions
  * jit-compiled incremental-session engine (one compilation serves all sessions)
  * pjit/mesh data-parallel pretraining with device-fused augmentation
  * PyTorch .pth checkpoint importer (reference interchange format)

Reference layout is documented in SURVEY.md; every module cites the reference
behavior it reproduces by file:line.
"""

__version__ = "0.1.0"
