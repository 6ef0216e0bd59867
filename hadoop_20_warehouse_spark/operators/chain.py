"""Job composition: ChainMapper/ChainReducer and JobControl analogs
(SURVEY.md §2.8) + global counters (§2.5).

- ``chain``: the reference composed ``[MAP+ / REDUCE MAP*]`` inside one
  job to avoid extra job launches and HDFS round-trips
  (mapred/lib/Chain.java:42, addMapper:162). In Spark every transform
  is already fused into one lazy plan, so chaining is plain function
  composition — provided for parity and pipeline readability.
- ``JobGraph``: JobControl ran a DAG of jobs when their dependencies
  finished (mapred/jobcontrol/JobControl.java:40). Spark's lazy DAG
  subsumes intra-query scheduling; ``JobGraph`` orders *actions*
  (writes) topologically for multi-output pipelines.
- ``with_counters``: job-wide named counters (mapred/Counters.java:53)
  → ``df.observe`` accumulates metrics on the exact rows that flow
  through the plan, collected after the action — same side-channel
  contract, zero extra passes.
"""

from __future__ import annotations

from collections.abc import Callable
from graphlib import TopologicalSorter

from pyspark.sql import Column, DataFrame
from pyspark.sql import Observation


def chain(*stages: Callable[[DataFrame], DataFrame]) -> Callable[[DataFrame], DataFrame]:
    """Compose transforms left-to-right: ``chain(m1, m2, r)(df)`` ==
    ``r(m2(m1(df)))`` — ChainMapper semantics, one fused plan."""

    def run(df: DataFrame) -> DataFrame:
        for stage in stages:
            df = stage(df)
        return df

    return run


class JobGraph:
    """JobControl analog: named actions with dependencies, run in
    topological order. Actions are thunks (usually ``lambda: df.write
    ...``); Spark parallelizes within each action, and independent
    actions could be submitted concurrently from threads if needed."""

    def __init__(self) -> None:
        self._actions: dict[str, Callable[[], object]] = {}
        self._deps: dict[str, set[str]] = {}

    def add(self, name: str, action: Callable[[], object], depends_on: list[str] | None = None):
        if name in self._actions:
            raise ValueError(f"duplicate job {name!r}")
        self._actions[name] = action
        self._deps[name] = set(depends_on or [])
        return self

    def run(self) -> dict[str, object]:
        order = list(TopologicalSorter(self._deps).static_order())
        return {name: self._actions[name]() for name in order}


def with_counters(df: DataFrame, name: str, **counters: Column) -> tuple[DataFrame, Observation]:
    """Attach named counters: ``df2, obs = with_counters(df, "job",
    n_bad=sum(...))``; after an action, ``obs.get`` returns the counter
    values — Counters/Reporter.incrCounter semantics
    (mapred/Counters.java:53) without a second pass."""
    obs = Observation(name)
    out = df.observe(obs, *[c.alias(k) for k, c in counters.items()])
    return out, obs
