#!/bin/bash
# Environment setup (counterpart of the reference's setup.sh conda recipe).
#
# This framework targets images where the JAX TPU stack is pre-installed:
#   jax, flax, optax, orbax, chex, einops, numpy          (compute path)
#   torch (CPU)                                            (.pth interchange only)
#   transformers, nltk                                     (description embeds)
#   pytest                                                 (tests)
# plus a C++ toolchain (g++) for the native host-staging library, which
# builds lazily on first use (or explicitly):
python -m subspace_reg_tpu.data.native

# No pip installs are performed here on purpose: the deployment images pin
# their own JAX/libtpu pairs. For a fresh machine:
#   pip install -U "jax[tpu]" flax optax orbax-checkpoint chex einops pytest
#   pip install torch --index-url https://download.pytorch.org/whl/cpu
