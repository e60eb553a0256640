"""English behavior hooks (reference gruut/lang.py:269-423)."""

from __future__ import annotations

import re
import typing

from gruut_ray.profiles.base import Hooks, Time, register_hooks

# TTS and T.T.S. (reference gruut/lang.py:270-271)
_INITIALISM = re.compile(r"^\s*[A-Z]{2,}\s*$")
_INITIALISM_DOTS = re.compile(r"^(?:\s*[a-zA-Z]\.){1,}\s*$")

_NON_WORD = re.compile(r"^(\W|_)+$")
_ORDINAL = re.compile(r"^(-?[0-9][0-9,]*)(?:st|nd|rd|th).*$")

# Clock time, e.g. 4:01pm (reference gruut/lang.py:276-285)
_TIME = re.compile(
    r"""^((0?[0-9])|(1[0-1])|(1[2-9])|(2[0-3]))   # hours
         (?::
         ([0-5][0-9]))?                           # minutes
         \s*(a\.m\.|am|pm|p\.m\.|a\.m|p\.m)?      # am/pm
         $""",
    re.IGNORECASE | re.X,
)

_MAYBE_DATE = re.compile(r"[0-9]+[-/][0-9]+")
_MAYBE_TIME = re.compile(r"[0-9]+[:ap]", re.IGNORECASE)


def en_is_initialism(text: str) -> bool:
    return (_INITIALISM.match(text) is not None) or (
        _INITIALISM_DOTS.match(text) is not None
    )


def en_split_initialism(text: str) -> typing.List[str]:
    return list(text.replace(".", ""))


def en_is_non_word(text: str) -> bool:
    return _NON_WORD.match(text) is not None


def en_get_ordinal(text: str) -> typing.Optional[int]:
    m = _ORDINAL.match(text)
    if m is not None:
        return int(re.sub(r"[^0-9]", "", m.group(1)))
    return None


def en_parse_time(text: str) -> typing.Optional[Time]:
    m = _TIME.match(text.strip().lower())
    if m is None:
        return None
    hours = int(m.group(1))
    minutes = 0 if m.group(6) is None else int(m.group(6))
    period = m.group(7)
    if period is not None:
        period = "A.M." if "a" in period else "P.M."
    elif ":" not in text:
        # Require a colon when no am/pm so plain numbers aren't times
        return None
    return Time(hours=hours, minutes=minutes, period=period)


def en_verbalize_time(time: Time) -> typing.Iterable[str]:
    hour = time.hours
    if hour > 12:
        hour -= 12
    elif hour == 0:
        hour = 12
    yield str(hour)
    if time.minutes > 0:
        if time.minutes < 10:
            yield "oh"
        yield str(time.minutes)
    if time.period is not None:
        yield time.period


def en_is_maybe_date(s: str) -> bool:
    return _MAYBE_DATE.match(s) is not None


def en_is_maybe_time(s: str) -> bool:
    return _MAYBE_TIME.match(s) is not None


register_hooks(
    "en",
    Hooks(
        is_initialism=en_is_initialism,
        split_initialism=en_split_initialism,
        is_non_word=en_is_non_word,
        get_ordinal=en_get_ordinal,
        parse_time=en_parse_time,
        verbalize_time=en_verbalize_time,
        is_maybe_date=en_is_maybe_date,
        is_maybe_time=en_is_maybe_time,
    ),
)
