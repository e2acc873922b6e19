"""Test configuration: run on a virtual 8-device CPU mesh.

The axon sitecustomize pins ``jax_platforms='axon,cpu'`` from the config
side (env vars alone are ineffective), so we override the config after
importing jax.  Multi-chip sharding is validated the TPU way — with
``xla_force_host_platform_device_count`` — so the suite needs no real
TPU pod (SURVEY.md §4).  Set ``ENDODAV_TPU_TESTS=tpu`` to run the suite
on the real chip instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

if os.environ.get("ENDODAV_TPU_TESTS", "cpu") != "tpu":
    jax.config.update("jax_platforms", "cpu")
    # keep CPU artifacts separate from remote-compiled TPU-session entries
    # (mismatched machine features in shared entries risk SIGILL)
    cpu_cache = os.path.join(os.path.expanduser("~"), ".cache", "endodav_tpu_jax_cpu")
    os.makedirs(cpu_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cpu_cache)
jax.config.update("jax_enable_x64", False)
