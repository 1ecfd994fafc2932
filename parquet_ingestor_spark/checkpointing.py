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


def latest_epoch_below(path: str, bound: int) -> int:
    """Largest ``epoch=N`` directory under ``path`` strictly below
    ``bound`` (-1 if none) — the replay-safe state floor for epoch-
    keyed foreachBatch state: a replayed batch re-reads the same
    pre-state and overwrites its own epoch, never double-folding.

    Only well-formed ``epoch=<digits>`` entries count; a stray
    temp/staging directory containing '=' is ignored rather than
    raising ValueError inside foreachBatch and failing the
    micro-batch. Shared by every epoch-keyed stream maintainer
    (sketches/scd/matview/mixture/incremental)."""
    import os

    if not os.path.isdir(path):
        return -1
    vs = [
        int(d.split("=", 1)[1])
        for d in os.listdir(path)
        if d.startswith("epoch=")
        and d.split("=", 1)[1].isdigit()
        and int(d.split("=", 1)[1]) < bound
    ]
    return max(vs, default=-1)


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
    if (
        df.sparkSession.conf.get(
            "spark.pqingestor.truncateLineage", "true"
        )
        == "false"
    ):
        # Plan-inspection escape hatch (r6 advisor): a checkpoint
        # boundary hides the materialization subplan from EXPLAIN, so
        # plan tests could no longer assert the pre-truncation
        # guarantees (md5-before-exchange, broadcast-not-cartesian).
        # With this conf the full lineage stays visible; NEVER set it
        # in production paths — iterative operators rely on truncation
        # to keep plans constant-size.
        return df
    if checkpoint_dir is None:
        # session-level opt-in to reliable checkpoints (r6 advisor):
        # library operators call truncate_lineage without plumbing a
        # dir through every signature, so the documented
        # survive-executor-loss path is reachable by setting
        # ``spark.pqingestor.checkpointDir`` once on the session.
        checkpoint_dir = df.sparkSession.conf.get(
            "spark.pqingestor.checkpointDir", None
        )
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if checkpoint_dir != _LAST_CHECKPOINT_DIR:
        if _LAST_CHECKPOINT_DIR is not None:
            eager = True  # don't let a later re-point steal the blocks
        sc.setCheckpointDir(checkpoint_dir)
        _LAST_CHECKPOINT_DIR = checkpoint_dir
    return df.checkpoint(eager=eager)


def gc_epoch_state(state_path: str, keep_last: int = 2) -> list[int]:
    """Retention for epoch-keyed streaming state directories
    (``.../epoch=N`` parquet written by ``stream_hll_users``,
    ``stream_scd2``, ``stream_dsir_weights``, …): delete all but the
    newest ``keep_last`` epochs and return the removed epoch ids.

    Why ``keep_last >= 2`` is the floor: a replayed micro-batch reads
    the largest epoch STRICTLY BELOW its own id — collecting down to
    one epoch would strand an in-flight replay of the latest batch
    with no pre-state. The GC itself is crash-safe in the same sense
    as the writers: deleting an old epoch twice is a no-op, and a
    crash mid-GC leaves only extra (still-consistent) epochs behind.
    Local-filesystem paths only, mirroring compact_parquet's guard —
    object stores do retention with lifecycle rules.
    """
    import shutil
    from urllib.parse import urlparse

    if urlparse(state_path).scheme not in ("", "file"):
        raise ValueError(
            f"gc_epoch_state handles local paths only, got {state_path!r}"
        )
    if keep_last < 2:
        raise ValueError("keep_last must be >= 2 (replay needs pre-state)")
    import os

    if not os.path.isdir(state_path):
        return []
    epochs = sorted(
        int(d.split("=")[1])
        for d in os.listdir(state_path)
        if d.startswith("epoch=") and d.split("=")[1].isdigit()
    )
    doomed = epochs[:-keep_last] if len(epochs) > keep_last else []
    for e in doomed:
        shutil.rmtree(os.path.join(state_path, f"epoch={e}"))
    return doomed
