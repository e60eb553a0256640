"""gruut-compatible CLI: ``python -m gruut_ray [text...]``.

Mirrors the reference's command-line surface (gruut/__main__.py:191-316:
``-l/--language``, text args or stdin lines, ``--ssml``, ``--csv`` with
``id|text`` rows, feature toggles, ``--no-fail``) and its JSONL output —
one JSON object per sentence with the reference ``Sentence``/``Word``
dataclass fields (gruut/__main__.py:125-134, shape documented in the
reference README.md:195-280) — so existing gruut consumers can switch
without changing their downstream parsing.

Single-process like the reference CLI; corpus-scale work goes through the
Ray pipelines (``gruut_ray.pipelines``).  No ``ray.init`` here.
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
import typing

from gruut_ray.nlp.normalize import get_whitespace


def get_args(argv: typing.Optional[typing.Sequence[str]] = None):
    parser = argparse.ArgumentParser(prog="gruut_ray")
    parser.add_argument("-l", "--language", default="en-us",
                        help="Default language code (default: en-us)")
    parser.add_argument("text", nargs="*",
                        help="Text to tokenize (default: stdin lines)")
    parser.add_argument("--ssml", action="store_true",
                        help="Input text is SSML")
    parser.add_argument("--csv", action="store_true",
                        help="Input is id|text rows; output id|text|words|phonemes")
    parser.add_argument("--csv-delimiter", default="|")
    parser.add_argument("--espeak", action="store_true",
                        help="Use eSpeak phoneme variant of the language "
                             "data packs (reference --espeak)")
    parser.add_argument("--model-prefix", default="",
                        help="Sub-directory of language data packs to use "
                             "(reference --model-prefix; 'espeak' is the "
                             "variant shipped with gruut packs)")
    parser.add_argument("--stdin-format", choices=("auto", "lines",
                                                   "document"),
                        default="auto",
                        help="Interpret stdin as one text per line or one "
                             "whole document (auto: document for --ssml, "
                             "lines otherwise; reference --stdin-format)")
    parser.add_argument("--no-post-process", action="store_true",
                        help="Disable per-sentence post-processing hooks "
                             "(reference --no-post-process)")
    parser.add_argument("--debug", action="store_true",
                        help="Print DEBUG messages to stderr")
    parser.add_argument("--version", action="version",
                        version="gruut_ray engine (gruut 2.4.0 surface)")
    parser.add_argument("--no-numbers", action="store_true")
    parser.add_argument("--no-currency", action="store_true")
    parser.add_argument("--no-dates", action="store_true")
    parser.add_argument("--no-times", action="store_true")
    parser.add_argument("--no-pos", action="store_true")
    parser.add_argument("--no-lexicon", action="store_true")
    parser.add_argument("--no-g2p", action="store_true")
    parser.add_argument("--no-major-breaks", action="store_true")
    parser.add_argument("--no-minor-breaks", action="store_true")
    parser.add_argument("--no-punctuation", action="store_true")
    parser.add_argument("--no-fail", action="store_true",
                        help="Skip lines that raise instead of exiting")
    parser.add_argument("--word-separator", default=" ")
    parser.add_argument("--sentence-separator", default=". ")
    parser.add_argument("--phoneme-separator", default=" ")
    parser.add_argument("--phoneme-word-separator", default="#")
    return parser.parse_args(argv)


def _word_dict(w) -> dict:
    leading_ws, trailing_ws = get_whitespace(w.text_with_ws)
    return {
        "idx": w.idx,
        "text": w.text,
        "text_with_ws": w.text_with_ws,
        "leading_ws": leading_ws,
        "trailing_ws": trailing_ws,
        "sent_idx": w.sent_idx,
        "par_idx": w.par_idx,
        "lang": w.lang,
        "voice": w.voice,
        "pos": w.pos,
        "phonemes": list(w.phonemes) if w.phonemes else None,
        "is_major_break": w.is_major_break,
        "is_minor_break": w.is_minor_break,
        "is_punctuation": w.is_punctuation,
        "is_break": w.is_break,
        "is_spoken": w.is_spoken,
        "pause_before_ms": w.pause_before_ms,
        "pause_after_ms": w.pause_after_ms,
        "marks_before": w.marks_before,
        "marks_after": w.marks_after,
    }


def _sentence_dict(s) -> dict:
    return {
        "idx": s.idx,
        "par_idx": s.par_idx,
        "text": s.text,
        "text_with_ws": s.text_with_ws,
        "text_spoken": s.text_spoken,
        "lang": s.lang,
        "voice": s.voice,
        "words": [_word_dict(w) for w in s.words],
        "pause_before_ms": s.pause_before_ms,
        "pause_after_ms": s.pause_after_ms,
        "marks_before": None,
        "marks_after": None,
    }


def process_line(line: str, args) -> typing.List:
    """One input line → sentences with phonemes, via the library surface
    (one implementation shared with gruut_ray.sentences; flags map 1:1 to
    the reference CLI's, gruut/__main__.py:136-170)."""
    from gruut_ray.api import sentences

    return list(sentences(
        line,
        lang=args.language,
        ssml=args.ssml,
        espeak=args.espeak,
        major_breaks=not args.no_major_breaks,
        minor_breaks=not args.no_minor_breaks,
        punctuations=not args.no_punctuation,
        phonemes=not (args.no_lexicon and args.no_g2p),
        pos=not args.no_pos,
        verbalize_numbers=not args.no_numbers,
        verbalize_currency=not args.no_currency,
        verbalize_dates=not args.no_dates,
        verbalize_times=not args.no_times,
        post_process=not args.no_post_process,
    ))


def main(argv: typing.Optional[typing.Sequence[str]] = None,
         stdin: typing.Optional[typing.IO] = None,
         stdout: typing.Optional[typing.IO] = None) -> int:
    args = get_args(argv)
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout

    if args.debug:
        import logging

        logging.basicConfig(level=logging.DEBUG)
    if args.csv and args.stdin_format == "document":
        print("--csv reads one id|text row per line; it cannot combine "
              "with --stdin-format document", file=sys.stderr)
        return 2
    if args.model_prefix:
        if args.model_prefix != "espeak":
            print(f"unknown --model-prefix {args.model_prefix!r} "
                  "(only 'espeak' packs ship with gruut data)",
                  file=sys.stderr)
            return 2
        args.espeak = True

    if args.text:
        lines: typing.Iterable[str] = args.text
    elif args.stdin_format == "document" or \
            (args.stdin_format == "auto" and args.ssml):
        lines = [stdin.read()]
    else:
        lines = (line.rstrip("\n") for line in stdin)

    csv_writer = csv.writer(stdout, delimiter=args.csv_delimiter) \
        if args.csv else None

    for line in lines:
        if not line.strip():
            continue
        text_data: typing.List[str] = []
        if args.csv:
            row = next(csv.reader([line], delimiter=args.csv_delimiter))
            if len(row) < 2:
                continue
            # reference reads column 1 as text (gruut/__main__.py:102);
            # all original columns are echoed in the output row
            text_data, line = row, row[1]
        try:
            sents = process_line(line, args)
        except Exception:
            if args.no_fail:
                continue
            raise
        if csv_writer is not None:
            words = args.sentence_separator.join(
                args.word_separator.join(w.text for w in s.words
                                         if w.is_spoken)
                for s in sents)
            phonemes = args.phoneme_word_separator.join(
                args.phoneme_separator.join(w.phonemes)
                for s in sents for w in s.words if w.phonemes)
            csv_writer.writerow([*text_data, words, phonemes])
        else:
            for s in sents:
                stdout.write(json.dumps(_sentence_dict(s), ensure_ascii=False))
                stdout.write("\n")
    stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
