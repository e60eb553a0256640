"""Offline prep CLIs mirroring the reference's builder entry points
(gruut/lexicon2db.py, gruut/corpus2db.py, gruut/g2p.py train/predict/test,
gruut/pos.py train) — they produce the broadcast artifacts the Ray actor
stages load in ``__init__``."""
