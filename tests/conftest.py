"""Test env: force JAX onto CPU with 8 virtual devices so data-parallel
sharding is exercised without TPU hardware (SURVEY.md §4).

This container's sitecustomize registers the 'axon' (real TPU tunnel) backend
in every interpreter and pins it regardless of JAX_PLATFORMS env — only a
post-import `jax.config.update('jax_platforms', ...)` overrides it. Compiles
over the tunnel take minutes, so tests must stay on host CPU.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache (same .jax_cache/ the TPU tools use; entries
# are platform-keyed so CPU test executables coexist with TPU ones). The
# full suite is compile-dominated — warm reruns skip most of it. Opt out
# with IFCBNN_TEST_NO_CACHE=1 (e.g. to measure true cold-compile time).
import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # repo root — needed regardless of cache
if os.environ.get("IFCBNN_TEST_NO_CACHE") != "1":
    from ifcb_classifier_tpu.utils.config import enable_compile_cache
    enable_compile_cache()
