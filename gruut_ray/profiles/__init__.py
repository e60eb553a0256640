"""Language registry + alias resolution (reference gruut/const.py:17-46,
gruut/utils.py:37-49)."""

from __future__ import annotations

import typing

import gruut_ray.profiles.en  # noqa: F401  (registers English hooks)
import gruut_ray.profiles.fr  # noqa: F401  (registers French liaison hook)
import gruut_ray.profiles.misc_hooks  # noqa: F401  (ca/fa post hooks)
from gruut_ray.profiles.base import (  # noqa: F401
    CompiledProfile,
    LanguageProfile,
    Time,
    compile_profile,
    get_whitespace,
    has_digit,
    normalize_whitespace,
)
from gruut_ray.profiles.data import ALL_PROFILES

LANG_ALIASES: typing.Dict[str, str] = {
    "ar": "ar",
    "ca": "ca-ce",
    "ca-ba": "ca-ce",
    "ca-no": "ca-ce",
    "ca-va": "ca-ce",
    "cs": "cs-cz",
    "de": "de-de",
    "en": "en-us",
    "en-gb": "en-us",
    "es": "es-es",
    "es-mx": "es-es",
    "fa": "fa",
    "fr": "fr-fr",
    "it": "it-it",
    "lb-lb": "lb",
    "nl": "nl",
    "nl-nl": "nl",
    "pt-br": "pt",
    "ru": "ru-ru",
    "sv": "sv-se",
    "sw": "sw",
    "zh": "zh-cn",
}

_REGISTRY: typing.Dict[str, LanguageProfile] = {p.lang: p for p in ALL_PROFILES}

DEFAULT_LANG = "en-us"


def resolve_lang(lang: str) -> str:
    """en_US -> en-us, en -> en-us (reference gruut/utils.py:37-49)."""
    lang = (lang or DEFAULT_LANG).replace("_", "-").lower()
    base = lang.split("/", 1)[0]
    if base in _REGISTRY:
        return base
    if base in LANG_ALIASES:
        return LANG_ALIASES[base]
    # en-XX -> en
    short = base.split("-", 1)[0]
    if short in _REGISTRY:
        return short
    if short in LANG_ALIASES:
        return LANG_ALIASES[short]
    return base


def register_profile(profile: LanguageProfile) -> None:
    """Register (or override) a profile — the engine's equivalent of
    constructing ``TextProcessor(settings={...})`` with custom settings
    (reference gruut/text_processor.py:72-100)."""
    from gruut_ray.profiles.base import _COMPILED_CACHE

    _REGISTRY[profile.lang] = profile
    _COMPILED_CACHE.pop(profile.lang, None)
    _FAST_COMPILED.clear()


def get_profile(lang: str) -> LanguageProfile:
    """Profile for a language; unknown languages get default settings
    (reference gruut/lang.py:193-195 falls back to bare settings)."""
    resolved = resolve_lang(lang)
    prof = _REGISTRY.get(resolved)
    if prof is None:
        prof = LanguageProfile(lang=resolved, begin_punctuations=(
            '"', "“", "«", "[", "(", "<", "„"),
            end_punctuations=('"', "”", "»", "]", ")", ">"))
        if len(_REGISTRY) < _MAX_CACHED_LANGS:  # dirty-data guard
            _REGISTRY[resolved] = prof
    return prof


# Memo keyed by the RAW lang string (pre-resolution): get_compiled sits on
# the per-token hot path of the normalizer, so alias resolution + registry
# lookup must not re-run per call.
_FAST_COMPILED: typing.Dict[str, CompiledProfile] = {}


_MAX_CACHED_LANGS = 4096  # dirty-data guard: unbounded raw-string keys
# from a corpus with garbage lang values would leak compiled profiles


def get_compiled(lang: str) -> CompiledProfile:
    cp = _FAST_COMPILED.get(lang)
    if cp is None:
        if len(_FAST_COMPILED) >= _MAX_CACHED_LANGS:
            _FAST_COMPILED.clear()
        cp = compile_profile(get_profile(lang))
        _FAST_COMPILED[lang] = cp
    return cp


def known_langs() -> typing.List[str]:
    """All registered languages, including user-registered profiles."""
    return sorted(_REGISTRY)


def short_lang(lang: str) -> str:
    """'en-US' / 'en_us' / 'en' → 'en' (single canonical helper; the
    quality, phonemize, and numwords layers all key state by short code)."""
    return (lang or "en").replace("_", "-").split("-", 1)[0].lower()
