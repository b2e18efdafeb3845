"""Test configuration.

Tests run on CPU with a virtual 8-device mesh (the "fake cluster" the
reference lacks — SURVEY.md §4 implication).  Pallas kernels run in
interpreter mode off-TPU (see utils.pallas_interpret_default).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["SGLT_TEST_MODE"] = "1"
# zero-egress environment: never let transformers/hub retry network fetches
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax

# The environment may pin JAX_PLATFORMS to a TPU plugin (e.g. axon); tests
# must run on the host CPU platform regardless.
jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    # fast tier: `pytest -m "not slow"` (< a few minutes); slow tier adds
    # the multi-process / many-engine integration tests
    config.addinivalue_line("markers", "slow: multi-minute integration test")
