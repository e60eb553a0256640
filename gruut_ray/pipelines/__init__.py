"""Composable Dataset pipelines: quality filter, dedup, similarity, stats."""
