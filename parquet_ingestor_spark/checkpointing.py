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

#: The checkpoint dir last set through this module. SparkContext holds
#: ONE checkpoint dir: with ``eager=False`` the checkpoint
#: materializes at first action, under whatever dir is set *then* —
#: two operators interleaving different dirs in one session would land
#: blocks under each other's directory (correct results, broken
#: cleanup/lifetime expectations). We therefore (a) skip the re-set
#: when the dir is unchanged and (b) force eager materialization
#: whenever setting a dir that *differs* from the session's current
#: one, so the blocks land where the caller asked before anyone can
#: re-point the context.
_LAST_CHECKPOINT_DIR: str | None = None


def truncate_lineage(
    df: DataFrame, checkpoint_dir: str | None = None, eager: bool = False
) -> DataFrame:
    """Cut ``df``'s lineage: local checkpoint by default, reliable
    filesystem checkpoint when ``checkpoint_dir`` is given.

    One reliable checkpoint dir per session is the supported shape;
    passing a *different* dir mid-session is handled safely (the
    checkpoint goes eager so it lands under the requested dir) but
    costs an immediate materialization — prefer a single dir.
    """
    global _LAST_CHECKPOINT_DIR
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if checkpoint_dir != _LAST_CHECKPOINT_DIR:
        if _LAST_CHECKPOINT_DIR is not None:
            eager = True  # don't let a later re-point steal the blocks
        sc.setCheckpointDir(checkpoint_dir)
        _LAST_CHECKPOINT_DIR = checkpoint_dir
    return df.checkpoint(eager=eager)
