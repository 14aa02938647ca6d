"""Multi-chip sharded aggregation on the 8-device virtual CPU mesh."""

import numpy as np
import pytest


def test_sharded_agg_matches_single_chip():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from aresdb_tpu import demo
    from aresdb_tpu.parallel import sharded
    from aresdb_tpu.query import kernels as K

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"

    rows_per_device = 512
    k_groups = 1024
    mesh = sharded.make_mesh(8)
    total = 8 * rows_per_device

    plan = demo.demo_plan()
    cols_np, _ = demo.demo_columns(plan, total, seed=3, n_cities=40)

    # single-chip reference result
    columns_1 = {k: (jnp.asarray(v), jnp.asarray(b))
                 for k, (v, b) in cols_np.items()}
    single = jax.jit(
        lambda c, n: K.agg_batch_body(plan, total, 4096, c, (), n)
    )(columns_1, np.int32(total))
    s_keys = np.asarray(single[0])
    s_used = np.asarray(single[2])
    s_agg = np.asarray(single[3])
    expected = {int(k): float(a) for k, u, a in zip(s_keys, s_used, s_agg) if u}

    # sharded result
    row_sharding = NamedSharding(mesh, P(sharded.SHARD_AXIS))
    columns = {
        k: (jax.device_put(jnp.asarray(v), row_sharding),
            jax.device_put(jnp.asarray(b), row_sharding))
        for k, (v, b) in cols_np.items()
    }
    n_valid = jax.device_put(
        jnp.asarray(sharded.per_shard_valid(total, 8, rows_per_device)),
        row_sharding)
    fn = sharded.make_sharded_agg_kernel(plan, rows_per_device, k_groups, mesh)
    out = fn(columns, (), n_valid, jnp.int64(0))
    keys = np.asarray(out[0])
    used = np.asarray(out[1])
    agg = np.asarray(out[2])
    got = {int(k): float(a) for k, u, a in zip(keys, used, agg) if u}

    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == pytest.approx(expected[k], rel=1e-5)


def test_dryrun_multichip_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
