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

assert jax.default_backend() == 'cpu'
