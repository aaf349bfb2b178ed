"""Shared-subtree materialization with an explicit fault-tolerance knob.

The shared-subtree law (plans/subtree.py, NOTES_r12/r13) is fixed by
materializing a slim, codes-sized frame once so its multiple consumers
stop re-evaluating the expensive upstream subtree. The default mechanism
is ``localCheckpoint``: lineage is truncated into executor-local block
storage, which is FAST (no distributed filesystem round-trip) but NOT
fault-tolerant — Spark documents that if an executor holding checkpointed
blocks is lost, those partitions cannot be recomputed and the job fails
instead of recovering (ADVICE r13). On local[n] there is one executor and
the distinction is moot; on a 1000-executor 100 TB run, executor loss is
routine and a long job should prefer a recoverable materialization.

``SPARK_GRAFT_MATERIALIZE`` selects the mechanism process-wide:

- ``local`` (default): ``df.localCheckpoint(eager)`` — fastest, lost-
  executor risk as above. Right for interactive / short batch work.
- ``reliable``: ``df.checkpoint(eager)`` — writes to the SparkContext
  checkpoint dir (HDFS/S3 on a cluster; ``setCheckpointDir`` must have
  been called, Spark raises a descriptive error otherwise). Survives
  executor loss; costs a DFS write+read of the slim frame.
- ``off``: return ``df`` unchanged — full lineage, fully recomputable,
  re-pays the duplicate subtree evaluation. The escape hatch when even
  a slim materialization is unwanted (tiny inputs, debugging).

Only SLIM frames go through here (ids + fixed-width codes — never text
or embeddings); the checkpoint-boundary rule (NOTES_r13) further
restricts call sites to frames internal to self-join pyramids where
caller pushdown through the boundary is already impossible. The eager
per-round checkpoints inside connected_components accept the same
local-checkpoint tradeoff by design (bounded rounds, each cheap to
re-run from the previous round's frame) and keep calling
``localCheckpoint`` directly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_VALID = ("local", "reliable", "off")


def materialize_mode() -> str:
    mode = os.environ.get("SPARK_GRAFT_MATERIALIZE", "local").lower()
    if mode not in _VALID:
        raise ValueError(
            f"SPARK_GRAFT_MATERIALIZE={mode!r}; expected one of {_VALID}")
    return mode


def local_materialize(df: DataFrame, eager: bool = False) -> DataFrame:
    """Materialize a slim shared frame per the process-wide knob above."""
    mode = materialize_mode()
    if mode == "off":
        return df
    if mode == "reliable":
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
