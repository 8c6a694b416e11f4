import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (the driver separately dry-runs them).
# NOTE: this environment force-registers a remote TPU ("axon") platform via
# sitecustomize and overrides JAX_PLATFORMS; jax.config.update is the only
# reliable way to pin tests to local CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")
CLIPS = REFERENCE / "tests" / "clips"


@pytest.fixture(scope="session")
def possum_cptv():
    p = CLIPS / "possum.cptv"
    if not p.exists():
        pytest.skip("reference test clips not available")
    return p


@pytest.fixture(scope="session")
def hedgehog_cptv():
    p = CLIPS / "hedgehog.cptv"
    if not p.exists():
        pytest.skip("reference test clips not available")
    return p


@pytest.fixture(scope="session")
def possum_meta():
    p = CLIPS / "possum.txt"
    if not p.exists():
        pytest.skip("reference test clips not available")
    import json

    return json.loads(p.read_text())


@pytest.fixture(scope="session")
def clips_dir():
    if not CLIPS.exists():
        pytest.skip("reference test clips not available")
    return CLIPS
