"""Test env: force CPU with 8 virtual devices so multi-chip sharding logic
is exercised without TPU hardware (the JAX analogue of the reference's
env-var distributed fakes, SURVEY.md §4).

Note: this image's sitecustomize registers an 'axon' TPU PJRT plugin and
sets jax_platforms='axon,cpu' at interpreter start, so plain env vars are
not enough — we must override the jax config and clear any initialized
backends before the first trace.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():  # pragma: no cover
        from jax.extend.backend import clear_backends

        clear_backends()
except Exception:  # pragma: no cover
    pass


# ---- test tiers (reference ci/ split: unit vs integration) -----------
# `pytest -m smoke` = fast core-spine path (target <= 2 min); everything
# not explicitly smoke or slow runs in the full (nightly) tier.
SMOKE_FILES = {
    "test_import_all.py",
    "test_asr_model.py",
    "test_ops_frontend.py",
    "test_text.py",
    "test_native.py",
    "test_beam_search.py",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        fname = item.path.name if hasattr(item, "path") else \
            item.fspath.basename
        if fname in SMOKE_FILES and \
                not any(m.name == "slow" for m in item.iter_markers()):
            item.add_marker(pytest.mark.smoke)
