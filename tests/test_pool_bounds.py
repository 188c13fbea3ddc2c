"""Actor-pool sizing invariants (config.BuildConfig.pool_bounds).

A fixed pool equal to the cluster CPU count reserves every logical CPU
before processing, so fused read tasks / the write operator of the same
execution can't schedule and the stage deadlocks (observed at 8 CPUs in
build_serve_partitions).  pool_bounds must therefore clamp below the
CPU count even for explicitly configured sizes, and keep a min floor so
short stages start parallel instead of ramping from one actor.
"""

import pytest

from dint_ray.config import BuildConfig


@pytest.fixture()
def cfg():
    return BuildConfig()


def test_pool_bounds_cap_below_cpu_count(ray_session, cfg):
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    lo, hi = cfg.pool_bounds(0)
    assert 1 <= lo <= hi
    assert hi < ncpu, "cap must leave scheduler headroom below the CPU count"


def test_pool_bounds_clamps_explicit_oversize(ray_session, cfg):
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    # an explicit pool covering every CPU recreated the deadlock; the
    # clamp must bring ANY configured value under the headroom ceiling
    for configured in (ncpu, ncpu * 4, 10_000):
        lo, hi = cfg.pool_bounds(configured)
        assert hi <= ncpu - max(1, ncpu // 8)
        assert lo <= hi


def test_pool_bounds_min_floor_is_meaningful(ray_session, cfg):
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    lo, _hi = cfg.pool_bounds(0)
    # ramping from 1 actor leaves short stages near-serial at any CPU
    # count; the floor must scale with the cluster (about a third)
    assert lo >= max(1, ncpu // 3)
