"""Test configuration: run on a virtual 8-device CPU mesh.

This is the TPU-native analog of multi-node testing without a cluster
(SURVEY.md §4): sharding/collective code paths are exercised on
``xla_force_host_platform_device_count=8`` fake CPU devices.

Note: the environment may preload jax with a TPU platform (sitecustomize),
so plain env vars in this file would be too late — we reconfigure through
``jax.config`` before any backend is initialized instead.
"""

import os

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
