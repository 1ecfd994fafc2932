"""Lineage truncation for iterative operators.

Driver-side loops (connected components, star contraction, BPE merge
training) rebuild a DataFrame each round; without truncation the plan
grows linearly with rounds and Catalyst analysis cost grows with it.
Two truncation modes:

- ``localCheckpoint`` (default): blocks live on executor local disk /
  memory. Fast, zero configuration — but on a real cluster the blocks
  die with their executor, so a lost executor fails the job.
- reliable ``checkpoint`` (``checkpoint_dir=...``): blocks land on the
  shared filesystem (HDFS/S3A path on a cluster, any directory on
  local mode), surviving executor loss — the hardened path for long
  iterative jobs at 100 TB, at the cost of a filesystem round-trip
  per round.

Mirrors the reference's durable-before-ack stance for state the
pipeline cannot afford to recompute (reference ingestor commit path:
``ingestor/ingestor.go`` ack-after-write), applied to iterative
operator state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_lineage(
    df: DataFrame, checkpoint_dir: str | None = None, eager: bool = False
) -> DataFrame:
    """Cut ``df``'s lineage: local checkpoint by default, reliable
    filesystem checkpoint when ``checkpoint_dir`` is given."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=eager)
