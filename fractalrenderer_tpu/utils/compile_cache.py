"""Persistent XLA compilation cache configuration.

The reference app compiles its six SPIR-V pipelines in milliseconds at
startup (``compute_effect_manager.cpp:120-138``); our XLA compiles cost
tens of seconds per static config on a cold process (bench_all.json
recorded 907 s wall for the config-1 matrix before this existed).  JAX
ships a persistent compilation cache that keys on (HLO, compile options,
platform); enabling it turns every repeat compile — across processes —
into a disk read.

Called once from the package ``__init__``.  Opt out with
``FRACTAL_TPU_NO_COMPILE_CACHE=1``; point the cache elsewhere with
``FRACTAL_TPU_COMPILE_CACHE=/path`` (or JAX's own
``JAX_COMPILATION_CACHE_DIR``, which we never override).
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "fractalrenderer_tpu", "jax_cache")

# ~2 GiB: a full bench_all matrix of kernel specializations is < 200 MB,
# so this bounds disk use while never evicting a working set.
_MAX_SIZE_BYTES = 2 * 1024**3


def _host_fingerprint() -> str:
    """Short hash of the host CPU's feature set.

    XLA:CPU AOT cache entries embed the compile machine's features; a
    cache written on a different host loads with feature-mismatch
    warnings and can SIGILL/SIGABRT mid-execution (observed: a pty-driven
    CLI subprocess dying with SIGABRT when the home-dir cache carried
    another container's entries).  Keying the directory by the host's
    own features makes entries host-pure; a new host simply recompiles
    into its own subdir."""
    import hashlib
    import platform

    ident = platform.machine()
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    ident += line
                    break
    except OSError:
        ident += platform.processor()
    return hashlib.sha256(ident.encode()).hexdigest()[:12]


def configure_persistent_cache() -> str | None:
    """Enable JAX's persistent compilation cache; return the dir in use.

    Returns None when disabled (env opt-out) or when configuration fails
    (e.g. read-only home) — failures are silent by design: the cache is
    an optimization, never a requirement.
    """
    if os.environ.get("FRACTAL_TPU_NO_COMPILE_CACHE"):
        return None
    try:
        import jax

        # Respect an explicit JAX-level setting from the environment.
        already = jax.config.jax_compilation_cache_dir
        if already:
            return already
        cache_dir = (os.environ.get("FRACTAL_TPU_COMPILE_CACHE")
                     or os.path.join(_DEFAULT_DIR, _host_fingerprint()))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_compilation_cache_max_size", _MAX_SIZE_BYTES)
        # Cache XLA-level autotuning results too where supported.
        try:
            jax.config.update("jax_persistent_cache_enable_xla_caches",
                              "all")
        except Exception:
            pass
        return cache_dir
    except Exception:
        return None
