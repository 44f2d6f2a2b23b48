"""Test env: force CPU with 8 virtual devices so jax.sharding Mesh tests can
simulate an 8-chip TPU slice without hardware (SURVEY.md §4 test plan).

Note: the session env may pin JAX_PLATFORMS to a TPU tunnel, and pytest plugins
(jaxtyping) import jax before this conftest — so we also flip the config after
import, which works as long as no backend has been initialized yet.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
jax.config.update('jax_enable_x64', False)

# persistent compile cache — the test box has few cores, XLA compiles dominate.
# Salted with the host CPU's feature set: XLA:CPU AOT artifacts baked for a
# different microarchitecture load with a "may SIGILL" warning and can
# mis-execute (observed 2026-08-19: a cross-machine cache entry turned a
# bit-entropy reduction into NaN); the salt makes each machine use its own
# cache tree instead.
import hashlib

try:
    with open('/proc/cpuinfo') as f:
        _flags = next((l for l in f if l.startswith('flags')), '')
except OSError:
    _flags = ''
_salt = hashlib.sha256(_flags.encode()).hexdigest()[:12]
_cache_dir = os.path.join(
    os.path.dirname(__file__), '..', f'.jax_cache_{_salt}')
jax.config.update('jax_compilation_cache_dir', os.path.abspath(_cache_dir))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

assert jax.default_backend() == 'cpu'
