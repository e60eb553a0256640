"""Quality-filter components (north rule): langid, heuristics, char-LM
perplexity, PII/toxicity scrub."""

from gruut_ray.quality.heuristics import (  # noqa: F401
    DEFAULT_THRESHOLDS,
    RULES_VERSION,
    DocStats,
    QualityThresholds,
    apply_rules,
    doc_stats,
    score_document,
)
from gruut_ray.quality.langid import DEFAULT_LANGS, LangIdModel  # noqa: F401
from gruut_ray.quality.ngram_lm import CharNgramLM, PerplexityScorer  # noqa: F401
from gruut_ray.quality.pii import scrub_text, toxicity_count  # noqa: F401
