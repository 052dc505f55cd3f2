"""Broadcast side-inputs: ``ray.put`` once, cached per worker process.

Small lookup structures (the places index ST2, endpoint-tag map ST3) are
shipped to every task via an object-store ref. ``ray.get`` of a large Python
dict would deserialize per call inside ``map_groups`` functions, so workers
memoize the materialized object per ref in a module-global cache — one
deserialization per worker process, the broadcast-join idiom from the Ray
guide without requiring actor pools inside grouped stages.
"""

from __future__ import annotations

import ray

_CACHE: dict[bytes, object] = {}


def get_cached(ref: "ray.ObjectRef"):
    key = ref.binary()
    if key not in _CACHE:
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]
