"""Utilities: synthetic data generation, runtime helpers."""

import hashlib
import os
import shutil

_CACHE_DIR = None


def _backend_fingerprint():
    """(platform, hash) of the actual runtime identity: platform +
    platform_version (carries the libtpu / CPU-runtime build string) +
    jax/jaxlib versions. Initializes the backend."""
    import jax
    parts = [jax.__version__]
    try:
        import jaxlib
        parts.append(str(getattr(jaxlib, '__version__', '')))
    except ImportError:
        pass
    backend = jax.devices()[0].client
    parts.append(backend.platform)
    parts.append(str(getattr(backend, 'platform_version', '')))
    fp = hashlib.sha1('|'.join(parts).encode()).hexdigest()[:12]
    return backend.platform, fp


def enable_compilation_cache(cache_dir=None):
    """Persistent XLA compilation cache — first-compile of the Pallas kernels
    through a remote compile service can take minutes; the cache makes every
    later process start instant.

    The cache dir is keyed by the *actual backend fingerprint* (platform +
    platform_version + jax/jaxlib versions), never by env vars: an AOT blob
    compiled against one libtpu build (or one host CPU's machine features)
    must never be served to a different runtime. If a stale entry slips
    through anyway, `run_with_cache_containment` clears it and recompiles.
    """
    global _CACHE_DIR
    import jax
    if cache_dir is None:
        base = os.environ.get('JAX_COMPILATION_CACHE_DIR',
                              os.path.expanduser('~/.cache/jax_gpe'))
        platform, fp = _backend_fingerprint()
        if platform == 'cpu':
            # CPU compiles are fast and CPU AOT blobs encode host machine
            # features (cross-host reload risks SIGILL): never cache on CPU.
            # Disable EXPLICITLY — jax itself honors JAX_COMPILATION_CACHE_DIR
            # from the environment, so merely returning would leave caching
            # on at the raw, un-fingerprinted path
            try:
                jax.config.update('jax_enable_compilation_cache', False)
                jax.config.update('jax_compilation_cache_dir', None)
            except (AttributeError, ValueError):
                pass
            return None
        cache_dir = os.path.join(base, f'{platform}-{fp}')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    try:
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except AttributeError:  # older jax
        pass
    _CACHE_DIR = cache_dir
    return cache_dir


def disable_compilation_cache(clear=False):
    """Turn the persistent cache off for this process; optionally delete its
    entries (after poisoning was detected) so no other process loads them."""
    global _CACHE_DIR
    import jax
    if clear and _CACHE_DIR and os.path.isdir(_CACHE_DIR):
        shutil.rmtree(_CACHE_DIR, ignore_errors=True)
    for name, value in (('jax_enable_compilation_cache', False),
                        ('jax_compilation_cache_dir', None)):
        try:
            jax.config.update(name, value)
        except (AttributeError, ValueError):
            pass
    _CACHE_DIR = None


# Symptoms of a compiled-executable/runtime mismatch: a cached AOT blob built
# against a different libtpu, a CPU blob compiled for another host's machine
# features, or a corrupted cache entry. Markers are kept SPECIFIC — a generic
# FAILED_PRECONDITION (donated-buffer misuse, collective mismatch, ...) must
# not wipe the cache.
_POISON_MARKERS = (
    'libtpu version mismatch',
    'cpu_aot_loader',
    'machine type used for xla',
    'failed to deserialize',
    'incompatible serialized executable',
    'serialized executable is incompatible',
)


def is_cache_poisoning(exc) -> bool:
    msg = str(exc).lower()
    return any(marker in msg for marker in _POISON_MARKERS)


def run_with_cache_containment(fn, *args, **kwargs):
    """Run `fn`; if it dies with a poisoned-compilation-cache symptom, clear
    the cache, disable it for this process, and retry once with a fresh
    compile. A stale cache must degrade to a slow start, never to a crash."""
    try:
        return fn(*args, **kwargs)
    except Exception as e:  # noqa: BLE001 — filtered by symptom below
        if not is_cache_poisoning(e):
            raise
        import traceback
        traceback.print_exc()
        print('utils::Warning::compilation-cache/runtime mismatch detected '
              f'(original error above, {type(e).__name__}); clearing the '
              'cache and recompiling fresh')
        disable_compilation_cache(clear=True)
        return fn(*args, **kwargs)
