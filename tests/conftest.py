"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPUs via
`xla_force_host_platform_device_count` (SURVEY.md §4); the driver's bench
runs separately on the real chip. jax may already be imported by
sitecustomize before this conftest runs, so the platform is forced through
jax.config rather than env vars.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
assert jax.devices()[0].platform == 'cpu', jax.devices()
assert jax.device_count() == 8, jax.devices()
