"""ganspace-tpu: TPU-native framework for discovering interpretable GAN controls.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
harskish/ganspace (GANSpace: Discovering Interpretable GAN Controls,
NeurIPS 2020).  The compute path is pure JAX: generators are stage-indexed
pure functions specialized per tap point (the compiler dead-code-eliminates
everything past the tap, replacing the reference's hand-unrolled
``partial_forward``, reference ``models/wrappers.py:40-42``), edits are a
pytree argument added at the tap (replacing the monkey-patch hook runtime in
``netdissect/nethook.py``), and the decomposition estimators stream
activations through sharded sufficient statistics psum-reduced over ICI.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (on by default).

    On remotely-attached chips a fresh compile is a minutes-scale round
    trip; caching compiled executables across processes turns every CLI
    restart, bench warmup, and notebook rerun into a disk hit.  Disable
    with ``GANSPACE_COMPILE_CACHE=`` (empty) or point it elsewhere.
    """
    cache_dir = _os.environ.get(
        "GANSPACE_COMPILE_CACHE",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    if not cache_dir:
        return
    # XLA:CPU persists AOT executables specialized to the *host's* CPU
    # features, but the cache key does not include them — a cache written on
    # one machine poisons runs on another (observed: avx512/amx host change
    # -> per-entry load errors and flaky numerics).  Partition by a host
    # fingerprint so a machine change starts a fresh subcache.
    import hashlib
    import platform
    try:
        with open("/proc/cpuinfo") as f:
            # x86 lists 'flags'; ARM lists 'Features'.  Arches with neither
            # fall back to the coarse machine type — the first processor
            # block contains boot-volatile fields (clock, bogomips) that
            # would churn the partition every run.
            lines = f.read().split("\n\n", 1)[0]
        flags = next((ln for ln in lines.splitlines()
                      if ln.startswith(("flags", "Features"))),
                     platform.machine())
    except OSError:
        # No procfs (macOS, BSD): still partition, by the coarse machine
        # type — unpartitioned sharing is the failure mode being guarded.
        flags = platform.machine()
    cache_dir = _os.path.join(
        cache_dir, hashlib.sha1(flags.encode()).hexdigest()[:10])
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax or read-only fs: run uncached


_enable_compile_cache()

from ganspace_tpu.config import Config

__all__ = ["Config", "__version__"]
