"""Test configuration.

Tests run on CPU with a virtual 8-device mesh (sharding tests) and float64
enabled (accuracy references; TPU itself is float32 — dedicated tests cover
f32 tolerance accounting).

NOTE on this environment: a sitecustomize hook registers the experimental
`axon` TPU backend and force-sets ``jax_platforms='axon,cpu'`` via
`jax.config.update` at interpreter start — env vars alone cannot override
it, so we re-override via `jax.config.update` after importing jax. The
virtual host device count must still go in before the CPU client
initializes, which it has not at conftest-import time.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache (round-4 verdict item 5): the default tier
# is compile-bound on this single-core box (hundreds of XLA-CPU compiles
# of near-identical solver programs drove the wall past 35 min). Caching
# every executable makes warm runs test-bound instead; the cache dir is
# repo-local and gitignored. min thresholds are zeroed so even sub-second
# compiles cache (they dominate by count).
#
# The cache dir is keyed by the host's CPU feature fingerprint: XLA:CPU
# cache entries are AOT results compiled for a specific machine-feature
# set, and this sandbox can resume on hosts with different features —
# reusing a stale entry risks SIGILL (observed as a worker segfault with
# a cpu_aot_loader feature-mismatch warning). A migrated host gets a
# cold cache instead.
import hashlib  # noqa: E402

try:
    with open("/proc/cpuinfo") as _f:
        _flags = next(line for line in _f if line.startswith("flags"))
    _tag = hashlib.sha1(_flags.encode()).hexdigest()[:10]
except (OSError, StopIteration):
    _tag = "generic"
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), ".jax_cache", _tag))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
