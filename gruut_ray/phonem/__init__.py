"""Lexicon phonemization + G2P (stateful actor state)."""
