"""extended_gan_tpu — a TPU-native adversarial video-frame-prediction framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
GiulioZani/extended-gan (see SURVEY.md): vanilla GAN, DCGAN-style
frame-prediction GAN with dual discriminators, CycleGAN, convolutional-GAT
and SmaAt-UNet frame predictors, streaming data pipelines, experiment
management, metrics/history/visualisation, and benchmark harnesses —
re-designed TPU-first:

- all compute under ``jax.jit`` (one compiled program per train step,
  including the full adversarial G/D update),
- data parallelism via ``jax.sharding.Mesh`` + NamedSharding over ICI,
- NHWC conv layouts, bf16-capable precision policy, static shapes,
- Pallas kernels for hot fused ops (``extended_gan_tpu.ops.pallas``).
"""

__version__ = "0.1.0"

# ---------------------------------------------------------------------------
# Persistent XLA compilation cache. Remote-compiled TPU backends pay tens of
# seconds per program; caching makes every CLI/bench rerun start hot.
# Opt out with EGT_COMPILATION_CACHE=0.
# ---------------------------------------------------------------------------
import os as _os

if _os.environ.get("EGT_COMPILATION_CACHE", "1") != "0":
    import jax as _jax

    _cache_dir = _os.path.expanduser(
        _os.environ.get("EGT_CACHE_DIR", "~/.cache/egt_jax_cache")
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - older jax
        pass
