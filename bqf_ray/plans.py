"""Plan-choice observability.

Every auto-routed pipeline (budget-gated broadcast vs co-partitioned,
exact vs blocked-LSH, driver-vector vs node-sharded) announces the plan
it picked and the numbers that drove the choice through
:func:`plan_log` — one INFO line on the ``bqf_ray.plans`` logger, so a
100-TB operator can see WHY a run went down the scale path without
reading source.  Silent auto-switching (r3 verdict #4) is what this
kills.

Enable with ``logging.getLogger("bqf_ray.plans").setLevel("INFO")`` or
the standard root config; :func:`recent_plans` keeps the last few
decisions in-process for tools (``tools/query_stats``) to surface.
"""

from __future__ import annotations

import collections
import logging

logger = logging.getLogger("bqf_ray.plans")

_RECENT: collections.deque = collections.deque(maxlen=64)


def plan_log(op: str, plan: str, **numbers) -> None:
    """Record that ``op`` chose ``plan`` because of ``numbers``."""
    detail = " ".join(f"{k}={v}" for k, v in numbers.items())
    logger.info("%s -> %s (%s)", op, plan, detail)
    _RECENT.append({"op": op, "plan": plan, **numbers})


def recent_plans() -> list[dict]:
    """Plan decisions made in this process, oldest first."""
    return list(_RECENT)
