"""Index shard layout, manifests and checkpoint/resume helpers."""
