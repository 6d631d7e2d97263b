"""Shared parallelism sizing: derive stage concurrency from the cluster
instead of hardcoding it — a fixed ``concurrency=2`` is right on a
laptop and starves a 1000-core cluster (the reference hardcodes
``min(cpu, 4)`` workers, ``pipeline.py:14-26``; at cluster scale both
under- and over-subscription must track ``ray.cluster_resources()``)."""

from __future__ import annotations


def cluster_cpus(default: int = 4) -> int:
    try:
        import ray

        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", default)))
    except Exception:  # pragma: no cover
        pass
    return default


def default_pool(min_actors: int = 1) -> tuple[int, int]:
    """Autoscaling actor-pool bounds ``(min, cluster CPUs)``: the pool
    ramps with available work instead of pinning to a magic number, and
    pytest's tiny inputs no longer warn about idle pool minimums."""
    return (min_actors, max(min_actors + 1, cluster_cpus()))
