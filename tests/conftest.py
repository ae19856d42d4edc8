"""Test harness: fast virtual 8-device CPU platform.

Two environment fixes, both applied BEFORE jax backends initialize:

1. The session environment registers a remote-TPU PJRT plugin at interpreter
   start (sitecustomize, gated on PALLAS_AXON_POOL_IPS) and forces
   ``jax_platforms="axon,cpu"`` — which routes every eager op / compile
   through a network tunnel (~1s each). Tests must run on the local CPU
   backend, so we override the config back to ``cpu`` here, which takes
   precedence because no backend has initialized yet at conftest-import
   time.

2. ``--xla_force_host_platform_device_count=8`` exposes 8 virtual CPU
   devices so multi-chip sharding paths are testable without a TPU pod
   (SURVEY.md §4 implication).

Real-chip runs go through bench.py / the train CLIs, which keep the tunnel.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # XLA:CPU's thunk runtime splits each program's LLVM module and compiles
    # the splits concurrently on a thread pool. Under host oversubscription
    # (the compile-heavy suite + concurrent TPU dispatch) long runs
    # nondeterministically SIGSEGV inside backend_compile_and_load — a
    # different test each time, every one passing solo (round-3 VERDICT
    # weakness 1). Serializing codegen removes the suspect concurrency for
    # a few extra seconds of compile time across the whole suite.
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

import warnings  # noqa: E402

warnings.filterwarnings("ignore", message="Some donated buffers were not usable")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
