"""Small shared runtime helpers."""

from __future__ import annotations


def clamp_pool(requested: int | None, *, reserve: int = 1, floor: int = 1) -> int:
    """Clamp an actor-pool size so at least ``reserve`` CPUs stay free
    for downstream task-pool / all-to-all operators.

    An actor pool sized to every CPU in the cluster deadlocks any
    pipeline with a shuffle after it: Ray Data keeps pool actors alive
    for the whole dataset execution, so the sort/aggregate tasks behind
    the pool can never be scheduled. Always leave headroom.
    """
    import ray

    if ray.is_initialized():
        total = int(ray.cluster_resources().get("CPU", 4))
    else:
        total = 4
    cap = max(floor, total - reserve)
    if requested is None:
        return cap
    return max(floor, min(int(requested), cap))
