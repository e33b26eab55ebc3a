import os
import sys

# Expose an 8-device host-CPU platform alongside the real backend so sharding
# tests can build a virtual mesh; must be set before jax import.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Keep the axon TPU-tunnel plugin from initializing under pytest: tests run on
# host CPU, and a concurrent TPU holder can block backend init indefinitely.
os.environ["JAX_PLATFORMS"] = "cpu"
# Stronger: skip the plugin REGISTRATION entirely (sitecustomize registers it
# iff PALLAS_AXON_POOL_IPS is set). With it registered, jax.devices('cpu')
# still initializes the axon backend, whose client retry-sleeps on the tunnel
# relay — a wedged chip (e.g. an earlier killed TPU process's orphaned claim)
# then blocks EVERY backend-init in every test process indefinitely (observed:
# main thread in clock_nanosleep, 1 s CPU over 9 min).
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The harness pins JAX_PLATFORMS=axon (one real TPU chip over a tunnel), and
# that plugin stays the default backend even when JAX_PLATFORMS=cpu is
# requested. Tests must run on host CPU — true float64 (TPU emulates it) and
# second-scale instead of minute-scale compiles — so pin the default device
# explicitly.
jax.config.update("jax_default_device", jax.devices("cpu")[0])

# Validation tests compare against float64 C++ goldens (1e-9 relative Poisson
# tolerances are below float32 resolution, SURVEY.md section 7).
jax.config.update("jax_enable_x64", True)
