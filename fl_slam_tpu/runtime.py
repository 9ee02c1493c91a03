"""Single JAX initialization point (parity: reference ``common/jax_init.py``).

Everything that touches process-global JAX configuration lives here, imported
exactly once from ``fl_slam_tpu.__init__``. Unlike the reference (which forces
``JAX_PLATFORMS=cuda``) we never select a platform: tests pin CPU via
``JAX_PLATFORMS`` in ``tests/conftest.py`` and production uses whatever TPU
runtime is present.
"""

from __future__ import annotations

import os

import jax

# The reference pipeline is float64 end to end. We enable x64 so the belief
# algebra (22x22, tiny) can run in f64 for CPU-parity tests; large point-cloud
# arrays are created with explicit float32 dtype on the hot path regardless.
jax.config.update("jax_enable_x64", True)

# Never preallocate the whole device memory pool (useful on shared TPU hosts).
os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

# Persistent compilation cache: the full-replay program takes minutes to
# compile; cache it across processes (dev loop + bench + eval tools).
#
# The default cache dir is version-keyed (jax + libtpu): round-1's driver
# dryrun died on a libtpu AOT/terminal version mismatch (MULTICHIP_r01.json),
# and a cache shared across libtpu upgrades serves stale AOT executables.
# Set GC_COMPILE_CACHE=off to disable entirely (the hermetic dryrun does).


def _versioned_cache_dir() -> str:
    key = jax.__version__
    try:
        from importlib import metadata
        key += "-libtpu" + metadata.version("libtpu")
    except Exception:
        pass
    # XLA:CPU stores AOT executables compiled for the EXACT host CPU feature
    # set; this (virtualized) host exposes different features run to run, and
    # a loaded mismatch "could lead to execution errors such as SIGILL"
    # (xla cpu_aot_loader) — observed as fatal suite crashes. Key the cache
    # by a fingerprint of the visible CPU flags whenever the process can end
    # up on the CPU backend: either no TPU plugin is installed (backend
    # silently defaults to CPU regardless of JAX_PLATFORMS), or the env var
    # gives "cpu" priority (JAX_PLATFORMS is an ordered list — "cpu" or
    # "cpu,tpu" both resolve CPU-first). TPU executables do not depend on
    # host CPU features, and fingerprinting them guaranteed a cold cache
    # (and a 500-1,500 s replay compile) on every driver run because this
    # virtualized host never shows the same flags twice (round-2 verdict,
    # BENCH_r02.json compile_s=1548.6). Residual edge (accepted): TPU plugin
    # present + env not cpu-first + device init FAILS at runtime falls back
    # to unfingerprinted CPU executables; that fallback prints a loud jax
    # warning and none of our entry points run compute after it.
    platforms = os.environ.get("JAX_PLATFORMS", "").lower()
    cpu_first = platforms.split(",")[0].strip() == "cpu" if platforms else False
    tpu_plugin = False
    try:
        from importlib import metadata as _md
        _md.version("libtpu")
        tpu_plugin = True
    except Exception:
        tpu_plugin = False
    if cpu_first or not tpu_plugin:
        try:
            import hashlib
            with open("/proc/cpuinfo") as fh:
                flags = next((ln for ln in fh if ln.startswith("flags")), "")
            key += "-cpu" + hashlib.sha1(flags.encode()).hexdigest()[:8]
        except Exception:
            pass
    return f"/tmp/gc_jax_cache_{key}"


_cache = os.environ.get("GC_COMPILE_CACHE", "")
if _cache.lower() not in ("off", "0", "none"):
    jax.config.update("jax_compilation_cache_dir",
                      _cache or _versioned_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def backend_name() -> str:
    return jax.default_backend()


def device_count() -> int:
    return jax.device_count()
