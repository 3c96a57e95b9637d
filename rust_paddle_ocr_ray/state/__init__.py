from .checkpoint import CheckpointedRun, shard_files

__all__ = ["CheckpointedRun", "shard_files"]
