"""Test environment: 8 virtual CPU devices (the TPU-world substitute for a
multi-chip slice; SURVEY §4).

Set ``XNODE_TEST_TPU=1`` to skip the CPU forcing and run the suite on the
real accelerator (e.g. to exercise the Pallas kernels in compiled rather
than interpret mode). Default is the virtual 8-device CPU mesh so multi-
device sharding tests run anywhere. Must run before jax initializes.
"""

import os

_USE_TPU = os.environ.get("XNODE_TEST_TPU", "") == "1"

if not _USE_TPU:
    # The image hard-sets JAX_PLATFORMS=axon (real TPU through a relay) and
    # a sitecustomize registers that plugin at interpreter start — so this
    # must OVERRIDE, not setdefault, and JAX_PLATFORM_NAME is the knob that
    # is still honored after the plugin registered.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

if not _USE_TPU:
    # Belt-and-braces: the env vars above are not honored once the image's
    # sitecustomize has force-registered the axon TPU plugin, but the
    # config knob IS (same mechanism __graft_entry__.dryrun_multichip
    # uses). Must run before any backend initialization.
    jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
