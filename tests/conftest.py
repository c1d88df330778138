import os
import sys

# ---------------------------------------------------------------------------
# Test environment isolation.
#
# Tests run on CPU with a simulated 8-device mesh (SURVEY.md §4: multi-host
# behavior is tested on simulated meshes).  The container injects a TPU PJRT
# plugin into every Python process via PYTHONPATH sitecustomize, which
# routes compilation through a remote relay — unnecessary and slow for CPU
# unit tests.  Re-exec once with that path stripped so tests get a plain
# local-CPU jax.  Benchmarks (bench.py) keep the default environment and run
# on the real TPU.
# ---------------------------------------------------------------------------
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize imports jax before this file runs, so the
# env vars above may be read too late; force the platform through the
# runtime config as well (backends are created lazily, so this sticks).
jax.config.update("jax_platforms", "cpu")

# float64 so the scalar-oracle comparisons are exact; production runs f32.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: compilation dominates test wall-time in this
# environment (compiles are routed through a remote service), so cache them
# across pytest runs.  CPU tests get their OWN cache dir: a process that
# dies mid-write (observed: segfault in executable.serialize) leaves a
# truncated entry whose later deserialize also segfaults, and we must never
# risk poisoning the TPU cache (each TPU entry costs 20-40 s to rebuild
# through the relay).
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir,
                          ".jax_cache_cpu")
# Full-sweep runs (hundreds of distinct executables in one process) hit a
# deterministic jaxlib segfault inside executable.serialize() during the
# cache write — reproduced twice at the same test with both a warm and a
# freshly-created cache dir, and the same executable serializes fine in a
# standalone process.  Serialize only runs for persistent-cache writes, so
# sweeps simply run uncached (local CPU compiles; costs wall-time, not
# correctness).
if os.environ.get("PYPWT_FULL_SWEEP", "") != "1":
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(_cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
