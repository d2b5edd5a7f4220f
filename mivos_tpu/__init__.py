"""mivos_tpu: TPU-native interactive video object segmentation framework.

JAX/XLA/Pallas rebuild of the MiVOS capability set (interaction-to-mask,
space-time memory propagation, difference-aware fusion). See SURVEY.md.
"""
import os

__version__ = "0.1.0"


def _enable_persistent_compilation_cache() -> None:
    """XLA compiles of the conv towers take minutes on remote-attached
    TPUs; cache them across processes. Opt out with MIVOS_NO_CACHE=1."""
    if os.environ.get("MIVOS_NO_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "MIVOS_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "mivos_tpu_xla"),
    )
    # CPU AOT artifacts are machine-feature-sensitive and compile fast
    # anyway — only worth persisting TPU executables.
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these flags: soft-fail
        pass


_enable_persistent_compilation_cache()
