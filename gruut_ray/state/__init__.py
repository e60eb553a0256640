"""Checkpoint/resume state: per-partition manifests."""
