"""gruut_ray — a Ray-Data-native web-scale text processing & quality-filter engine.

Re-implements the query/data-processing capabilities of rhasspy/gruut
(tokenization, text normalization, number/date/time/currency verbalization,
sentence segmentation, lexicon phonemization) as vectorized, batch-oriented
operators over ``ray.data.Dataset`` pipelines, and extends them with the
web-scale operations a training-data pipeline needs: language ID, quality
heuristics, n-gram perplexity, PII scrubbing, exact/fuzzy dedup, and
similarity search.

Reference (behavioral spec only, no code copied): /root/reference
(gruut 2.4.0) — see SURVEY.md for the file:line inventory.

Nothing in this package calls ``ray.init()``; the caller owns the Ray session.
"""

__version__ = "0.1.0"

from gruut_ray.api import (  # noqa: F401
    get_supported_languages, is_language_supported, sentences)
from gruut_ray.nlp.normalize import process_document, sentences_for_text  # noqa: F401
from gruut_ray.profiles import get_profile, resolve_lang  # noqa: F401
