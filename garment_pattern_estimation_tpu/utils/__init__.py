"""Utilities: synthetic data generation, runtime helpers."""

import os


def enable_compilation_cache(cache_dir=None):
    """Persistent XLA compilation cache — first-compile of the Pallas kernels
    through a remote compile service can take minutes; the cache makes every
    later process start instant."""
    import jax
    if cache_dir is None:
        base = os.environ.get('JAX_COMPILATION_CACHE_DIR',
                              os.path.expanduser('~/.cache/jax_gpe'))
        # separate caches per platform: a CPU AOT blob compiled for a remote
        # host's machine features can SIGILL when loaded on a different CPU
        platform = os.environ.get('JAX_PLATFORM_NAME') \
            or os.environ.get('JAX_PLATFORMS') or 'default'
        cache_dir = os.path.join(base, platform.replace(',', '_'))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    try:
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except AttributeError:  # older jax
        pass
