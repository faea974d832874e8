"""Shared JAX runtime configuration for every CLI entry point.

Two settings, both measured on v5e:

* **persistent compilation cache** — the FSCIL session program costs
  ~120s of a 128s golden CLI run to compile (BASELINE.md hardware matrix);
  warm-starting from the on-disk cache turns repeat invocations into
  seconds.  The cache dir defaults to ``<repo>/.jax_cache`` (same one the
  test harness uses, tests/conftest.py) and can be moved with
  ``$SUBSPACE_REG_JAX_CACHE``; set it to ``off`` to disable.
* **hardware RNG** (``rbg``) on TPU — +4% step time vs threefry for the
  dropout/augmentation bits; distribution-level parity is unaffected
  (the reference's torch RNG streams are not reproduced bit-for-bit
  anyway — parity rests on the host-side numpy episode streams).

Replaces: nothing in the reference (no compile step exists in torch);
the wall-clock contract being improved is the per-session minutes of
eval/language_eval.py:242-350 on V100.
"""

from __future__ import annotations

import os


def configure(enable_cache: bool = True, tpu_rng: bool = True) -> None:
    """Apply process-wide JAX config.  Call once, before building any jitted
    function.  Idempotent."""
    import jax

    # Honor $JAX_PLATFORMS through jax.config: a pre-registered TPU relay
    # plugin (axon) overrides the bare env var, so `JAX_PLATFORMS=cpu
    # python train_supervised.py ...` would still try the relay — and
    # during a relay outage backend init hangs for minutes before failing.
    # Forcing the config here makes CPU-first CLI runs work exactly like
    # the test harness (tests/conftest.py does the same).
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass

    if tpu_rng and env_platforms != "cpu" and jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")

    cache_dir = os.environ.get("SUBSPACE_REG_JAX_CACHE")
    if cache_dir == "off":
        return
    if not enable_cache:
        return
    if not cache_dir:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.path.join(repo_root, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
