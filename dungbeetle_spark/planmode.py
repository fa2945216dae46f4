"""Plan-only construction mode (ADVICE r14, medium).

The fate family's frame builders materialize reference state at
DataFrame-CONSTRUCTION time — eager localCheckpoints, driver counts —
so a plan-only consumer (the public GET /tasks/<task>/explain
endpoint, plan audits, schema checks) used to launch corpus-scale
Spark jobs just to print a plan. Worse, even ``localCheckpoint
(eager=False)`` is not construction-free under AQE: creating the
checkpoint RDD forces ``AdaptiveSparkPlanExec`` to materialize every
shuffle stage below it, i.e. the "lazy" barrier still runs all but
the final stage as jobs.

``plan_only()`` threads a contextvar through ``build_dataframe`` call
sites (the callable-task signature stays ``(sess, args)``); inside
it, the builders construct PURE LAZY compositions: every checkpoint
goes through :func:`maybe_local_checkpoint`, which is the identity in
plan-only mode, and driver-blocking counts are skipped. Execution
paths never set the flag, so the timed/bench/job-layer shapes are
untouched.
"""

from __future__ import annotations

import contextvars
from contextlib import contextmanager

_PLAN_ONLY = contextvars.ContextVar("dungbeetle_plan_only", default=False)


@contextmanager
def plan_only():
    """Construct frames lazily (no Spark jobs) for plan inspection."""
    tok = _PLAN_ONLY.set(True)
    try:
        yield
    finally:
        _PLAN_ONLY.reset(tok)


def is_plan_only() -> bool:
    return _PLAN_ONLY.get()


def maybe_local_checkpoint(df, eager: bool = True):
    """``df.localCheckpoint(eager=...)`` on the execution path, the
    identity under ``plan_only()`` (any checkpoint — even lazy —
    forces AQE stage materialization at RDD-creation time)."""
    return df if is_plan_only() else df.localCheckpoint(eager=eager)
