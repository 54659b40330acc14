"""Multi-host tier (parallel/distributed.py): initialize() no-op contract,
2-level (DCN x ICI) mesh factorization, and the v5e-16 launch config shape.
Real multi-host needs >1 process; here the simulated-host layout must
produce the same mesh topology (8 virtual CPU devices, see conftest)."""

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from fhe_study_tpu.parallel import distributed, pipeline
import pytest


def test_initialize_single_process_noop():
    # nothing configured -> must not try to bring up a coordinator
    assert distributed.initialize() is False


def test_hybrid_mesh_layout():
    mesh = distributed.hybrid_mesh(ici={"ep": 2}, simulate_hosts=2)
    assert mesh.axis_names == ("dp", "ep", "sp", "tp")
    assert mesh.shape == {"dp": 4, "ep": 2, "sp": 1, "tp": 1}
    # host factor is OUTERMOST in dp: consecutive dp rows hold distinct
    # simulated hosts' devices in order
    devs = np.array(jax.devices()).reshape(4, 2)
    assert (mesh.devices[:, :, 0, 0] == devs).all()


def test_hybrid_mesh_collective_rides_mesh():
    import jax.numpy as jnp
    mesh = distributed.hybrid_mesh(ici={"ep": 2, "tp": 2}, simulate_hosts=2)
    assert mesh.shape == {"dp": 2, "ep": 2, "sp": 1, "tp": 2}
    x = jnp.arange(8.0).reshape(2, 2, 2)
    sh = NamedSharding(mesh, P("dp", "ep", "tp"))
    xs = jax.device_put(x, sh)
    got = jax.jit(lambda v: v.sum())(xs)
    assert float(got) == float(x.sum())


def test_v5e16_launch_config_consistent():
    cfg = distributed.v5e16_launch_config()
    ici = cfg["mesh"]["ici"]
    total = 16
    per_ici = ici["ep"] * ici["sp"] * ici["tp"]
    assert cfg["expected_mesh_shape"]["dp"] * per_ici == total
    assert cfg["env_per_host"]["JAX_NUM_PROCESSES"] == "4"


@pytest.mark.slow
def test_dryrun_hybrid_rns_and_sp():
    # the multi-host code path at production ring size, decrypt-verified
    pipeline.dryrun_hybrid(8)
