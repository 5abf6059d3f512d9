"""deep_cartograph_tpu: TPU-native framework for mapping MD trajectories onto
learned collective variables (featurize -> filter -> train CVs -> project ->
cluster -> FES -> PLUMED export), built on JAX/XLA/Pallas/pjit.

Re-designed TPU-first with the capabilities of NBDsoftware/deep_cartograph.
"""

__version__ = "0.1.0"

import jax as _jax

# XLA:TPU lowers f32 matmuls to bf16 MXU passes by default; the geometry and
# covariance paths (absolute coordinates through +/-1 selector contractions,
# TICA C0/Ctau) lose ~1e-3 to input rounding under that default, breaking the
# 1e-4 projection-parity contract. Force full f32 matmul accuracy everywhere;
# callers that can tolerate bf16 pass an explicit precision= at the call site.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: tool processes are short-lived, and the
# cold featurize/train compiles dominate their wall-clock (minutes per fresh
# process on a remote backend). Caching compiled executables on disk makes
# every process after the first pay milliseconds instead (measured 0.59 s ->
# 0.03 s on the axon TPU backend; the big featurize programs save minutes).
# Override the location with DEEP_CARTO_COMPILE_CACHE=<dir>, disable with
# DEEP_CARTO_COMPILE_CACHE=0.
import os as _os

_cache_dir = _os.environ.get("DEEP_CARTO_COMPILE_CACHE")
# XLA:CPU AOT cache entries embed compile-option pseudo-features
# (+prefer-no-scatter/-gather) that the loader compares against real host
# CPU features, logging machine-mismatch errors (and a nominal SIGILL risk)
# on every load. CPU programs here are small and recompile in seconds, so
# pure-CPU processes (tests, examples, dryrun children) skip the persistent
# cache; the cache's payoff is the minutes-long remote TPU compiles.
if not _cache_dir and _os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    _cache_dir = "0"
if _cache_dir != "0":
    if not _cache_dir:
        _cache_dir = _os.path.join(
            _os.path.expanduser("~"), ".cache", "deep_cartograph_tpu", "xla"
        )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # Cache every entry that took >=0.5 s to compile, regardless of size
        # (the default 1 MiB floor would skip small-but-slow programs).
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except (OSError, AttributeError):  # unwritable dir / older jax
        pass


def deep_cartograph(*args, **kwargs):
    """Main pipeline entry point (lazy import to keep `import
    deep_cartograph_tpu` light)."""
    from deep_cartograph_tpu.pipeline import deep_cartograph as _impl

    return _impl(*args, **kwargs)
