"""Test harness setup.

Mirrors the reference test strategy (SURVEY.md §4): the reference runs a real Spark
context with master=local[*] and 8 RDD partitions to exercise distributed paths in one
JVM (UniformRandomWalkTest.scala:12-24,187); we force an 8-device virtual CPU mesh the
same way. x64 is enabled so exact-parity tests against the float64 NumPy oracle are
numerically stable (the production TPU path runs float32; parity at f32 is validated
distributionally).
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS to the (tunneled, slow-compile) TPU.
os.environ["JAX_PLATFORMS"] = "cpu"

# Drop the axon TPU-tunnel plugin from the import path: it hooks XLA compilation even
# for the CPU backend (PALLAS_AXON_REMOTE_COMPILE) and routes every eager-op compile
# through the tunnel, turning millisecond compiles into minutes.
import sys  # noqa: E402

sys.path = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = ""
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="session")
def karate_path():
    return os.path.join(DATA, "karate.txt")


@pytest.fixture(scope="session")
def testgraph_path():
    return os.path.join(DATA, "testgraph.txt")
