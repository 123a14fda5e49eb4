"""Multi-chip execution: device meshes, tile-sharded rendering via
shard_map, and the collectives that replace the reference's thread pools
(SURVEY.md §2.3 mapping)."""
