"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native substitute for multi-chip tests without a cluster
(SURVEY.md section 4): XLA exposes 8 host devices so jax.sharding code paths
compile and execute exactly as they would on an 8-chip slice.

The ambient environment may register a remote-TPU PJRT plugin (axon) via
sitecustomize before this file runs, so the env-var route is not enough;
``jax.config.update('jax_platforms', 'cpu')`` overrides backend selection at
runtime and must run before any JAX computation.
"""
import os

# Tests build many tiny procedural datasets; don't let them populate (or
# read) the protocol runs' dataset memo (data/synthetic.py cache) -- even
# when the ambient environment exports a cache dir for protocol runs.
os.environ["NMF_DATASET_CACHE"] = ""

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compilation cache: repeat test runs skip XLA compiles
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
