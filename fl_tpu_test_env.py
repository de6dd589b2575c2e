"""Early pytest plugin: pin the test environment to an 8-device CPU mesh.

Loaded via ``-p fl_tpu_test_env`` in pyproject addopts, which imports this
module before pytest enables output capture — required because the fix is a
process re-exec: this machine's axon TPU plugin initializes the PJRT backend
at interpreter start (sitecustomize), so JAX_PLATFORMS must be corrected in
the process environment *before* Python starts, not merely before jax
imports.
"""

import os
import sys

_MARKER = "FL_TPU_TESTS_REEXEC"


def _needs_reexec() -> bool:
    if os.environ.get(_MARKER) == "1":
        return False
    return (
        os.environ.get("JAX_PLATFORMS") != "cpu"
        or bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
        or "xla_force_host_platform_device_count"
        not in os.environ.get("XLA_FLAGS", "")
    )


if _needs_reexec():
    env = dict(os.environ)
    env[_MARKER] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # disarm the axon sitecustomize
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    # persistent compile cache: the round-engine tests compile several
    # superstep programs; cache hits make suite reruns fast
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    sys.stdout.flush()
    sys.stderr.flush()
    os.execvpe(
        sys.executable,
        [sys.executable, "-m", "pytest", *sys.argv[1:]],
        env,
    )
