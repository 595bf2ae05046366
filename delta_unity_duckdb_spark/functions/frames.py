"""DataFrame-level helpers shared across operators and workloads."""

from __future__ import annotations

from pyspark import StorageLevel

# Storage level for every localCheckpoint in the engine. The Dataset
# default (MEMORY_AND_DISK) Java-SERIALIZES each row on store and
# deserializes on every read; materializing a 5 M-row tokenized frame
# measured 9–14 s under the default vs 2.2–2.9 s with deserialized
# storage (round-8 profiling at sf100) — the checkpoint, not the work
# being checkpointed, dominated several reworked plans. Deserialized
# MEMORY_AND_DISK keeps the rows as-is in memory and still spills to
# disk under pressure, so the overflow posture is unchanged.
CKPT_DESER = StorageLevel.MEMORY_AND_DISK_DESER
