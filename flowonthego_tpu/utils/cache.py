"""Persistent-compilation-cache setup shared by tests, bench, and tools.

One call, one policy.  The cache directory is keyed by the machine's CPU
feature set: XLA:CPU AOT executables record the compile machine's
features and loading them on a host with different features is rejected
with "could lead to execution errors such as SIGILL" warnings (seen when
/tmp/fot_jax_cache survived across driver hosts).  Keying the directory
makes each feature-set population disjoint, so stale entries from a
different machine are never even considered.
"""

from __future__ import annotations

import hashlib
import os


def machine_key() -> str:
    """Stable short hash of this host's CPU feature flags."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        import platform
        flags = platform.processor() or platform.machine()
    return hashlib.sha1(flags.encode()).hexdigest()[:12]


def enable_compile_cache(base: str | None = None) -> str:
    """Point jax's persistent compile cache at a machine-keyed directory.

    ``base`` defaults to $FOT_CACHE_DIR or /tmp/fot_jax_cache.  Returns
    the resolved directory.
    """
    import jax

    base = base or os.environ.get("FOT_CACHE_DIR", "/tmp/fot_jax_cache")
    path = os.path.join(base, machine_key())
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # 0.1 s: the suite's mid-size programs (per-scale solves, resize
    # forms, oracle helpers) compile in 0.1-0.5 s each; at the default
    # 0.5 s threshold they are recompiled by every process.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    return path
