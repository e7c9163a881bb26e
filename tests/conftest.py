import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs the
# multi-chip path). Must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# An 'axon' TPU-tunnel plugin may override JAX_PLATFORMS; force CPU so the
# test suite runs locally (the bench runs on real TPU separately).
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: repeated test runs skip recompiles (the CI box
# has 2 cores; cold compiles dominate suite time otherwise)
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import gzip
import shutil
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden_dir(tmp_path_factory):
    """Decompress golden fixtures (reference-binary outputs) to a temp dir."""
    if not GOLDEN.exists():
        pytest.skip("golden fixtures not present")
    out = tmp_path_factory.mktemp("golden")
    for p in GOLDEN.iterdir():
        if p.is_dir():
            continue
        if p.suffix == ".gz":
            with gzip.open(p, "rb") as f_in, open(out / p.stem, "wb") as f_out:
                shutil.copyfileobj(f_in, f_out)
        else:
            shutil.copy(p, out / p.name)
    return out


@pytest.fixture(scope="session")
def golden_chunk(golden_dir):
    from relate_tpu.io import chunking
    return chunking.read_reference_chunk(str(golden_dir / "chunk_0"))
