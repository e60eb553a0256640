"""Phonetisaurus FST G2P over numpy ``.npz`` graphs (from scratch).

The reference guesses pronunciations with a Phonetisaurus FST exported to
a numpy graph (``gruut/g2p_phonetisaurus.py:264-480``; graphs produced by
its ``bin/fst2npz.py``).  No ``.npz`` graph ships in this checkout (the
CRF is the primary guesser and is fully covered by
:mod:`gruut_ray.phonem.crf_g2p`), but the FORMAT and decoding semantics
are public and simple, so this module provides the same capability:

``.npz`` contents (reference ``PhonetisaurusGraph.__init__``):

* ``start_node``      — scalar int, the FST start state;
* ``edges``           — (N, 4) int array of
                        ``(from_node, to_node, ilabel, olabel)`` rows
                        SORTED by ``from_node`` (binary-searchable);
* ``edge_probs``      — (N,) float negative-log-prob edge costs;
* ``symbols``         — string array; symbol ``i`` is a ``|``-joined
                        cluster with ``_`` as the epsilon filler
                        (``"a|b"`` consumes/emits two units);
* ``final_nodes``     — sorted int array of accepting states;
* ``final_probs``     — matching float costs.

Decoding is the reference's shrinking-beam search: expand all queue
items one step (eps edges consume nothing; matching grapheme clusters
consume and emit), keep the ``beam`` cheapest, multiply the beam by
``beam_scale`` (floored at ``min_beam``) each round, finish when
``max_guesses`` accepting paths are found.  Results match the
reference's ordering (cost ascending, first-found wins ties).

Scale note: a graph loads once per actor (``FstG2P`` is picklable state
for ``map_batches`` actor pools) and guesses only lexicon misses; a
bounded per-model memo makes Zipf-repeated OOV words ~free.
"""

from __future__ import annotations

import typing

import numpy as np

EPS = "<eps>"


class FstG2P:
    """A loaded Phonetisaurus numpy graph: ``model(word) -> [phoneme...]``."""

    def __init__(self, graph: typing.Mapping[str, np.ndarray]):
        self.start_node = int(np.asarray(graph["start_node"]).item())
        self.edges = np.asarray(graph["edges"], dtype=np.int64)
        self.edge_probs = np.asarray(graph["edge_probs"], dtype=np.float64)
        self.symbols: typing.List[typing.Tuple[int, typing.List[str]]] = []
        for symbol_str in graph["symbols"]:
            parts = str(symbol_str).replace("_", "").split("|")
            self.symbols.append((len(parts), parts))
        self.final_nodes = np.asarray(graph["final_nodes"], dtype=np.int64)
        self.final_probs = np.asarray(graph["final_probs"], dtype=np.float64)

        # node -> [edge rows] built eagerly: actors hold the model for
        # millions of words, so the one-time O(N) pass beats the
        # reference's lazy searchsorted cache after the first few batches
        self._out: typing.Dict[int, typing.List[int]] = {}
        for idx, frm in enumerate(self.edges[:, 0].tolist()):
            self._out.setdefault(frm, []).append(idx)
        self._final: typing.Dict[int, float] = dict(
            zip(self.final_nodes.tolist(), self.final_probs.tolist()))
        self._cache: typing.Dict[str, typing.Tuple[str, ...]] = {}
        self._cache_max = 200_000

    @classmethod
    def load(cls, path: str) -> "FstG2P":
        return cls(np.load(path, allow_pickle=True))

    def guess(
        self,
        word: typing.Union[str, typing.Sequence[str]],
        beam: int = 500,
        min_beam: int = 100,
        beam_scale: float = 0.6,
        max_guesses: int = 1,
    ) -> typing.List[typing.List[str]]:
        """Up to ``max_guesses`` pronunciations, best (lowest cost) first.
        Same beam protocol and tie-handling as the reference g2p_one."""
        graphemes = list(word) if isinstance(word, str) else list(word)
        if not graphemes:
            return []
        current_beam = beam
        # (cost, node_or_None, remaining graphemes, output, is_final)
        q: typing.List[tuple] = [
            (0.0, self.start_node, graphemes, [], False)]
        best: typing.List[typing.Tuple[float, typing.Tuple[str, ...]]] = []
        seen: typing.Set[typing.Tuple[str, ...]] = set()

        while q:
            q_next: typing.List[tuple] = []
            done = False
            for cost, node, rest, output, is_final in q:
                if is_final:
                    phonemes = tuple(output)
                    if phonemes not in seen:
                        best.append((cost, phonemes))
                        seen.add(phonemes)
                    if len(best) >= max_guesses:
                        done = True
                        break
                    continue
                if not rest:
                    final_cost = self._final.get(node)
                    if final_cost is not None:
                        q_next.append((cost + final_cost, None, [],
                                       output, True))
                n_rest = len(rest)
                for idx in self._out.get(node, ()):
                    _, to_node, ilabel, olabel = self.edges[idx]
                    n_in, in_syms = self.symbols[ilabel]
                    if n_in > n_rest:
                        continue
                    if in_syms == [EPS]:
                        q_next.append((cost + self.edge_probs[idx],
                                       int(to_node), rest, output, False))
                    elif in_syms == rest[:n_in]:
                        q_next.append((cost + self.edge_probs[idx],
                                       int(to_node), rest[n_in:],
                                       output + self.symbols[olabel][1],
                                       False))
            if done:
                break
            q = sorted(q_next, key=lambda item: item[0])[:current_beam]
            current_beam = max(min_beam, int(current_beam * beam_scale))

        return [[p for p in phonemes if p]
                for _, phonemes in sorted(best, key=lambda it: it[0])
                [:max_guesses]]

    def __call__(self, word: str) -> typing.Sequence[str]:
        cached = self._cache.get(word)
        if cached is not None:
            return cached
        guesses = self.guess(word)
        result = tuple(guesses[0]) if guesses else ()
        if len(self._cache) >= self._cache_max:
            self._cache.clear()
        self._cache[word] = result
        return result


def write_graph(path: str, *, start_node: int, edges, edge_probs,
                symbols, final_nodes, final_probs) -> None:
    """Write a numpy Phonetisaurus graph in the reference's ``.npz``
    layout (the counterpart of its ``bin/fst2npz.py`` output) — used by
    tests and by users converting their own Phonetisaurus FSTs."""
    edges = np.asarray(edges, dtype=np.int64)
    order = np.argsort(edges[:, 0], kind="stable")  # format requires sort
    np.savez(
        path,
        start_node=np.int64(start_node),
        edges=edges[order],
        edge_probs=np.asarray(edge_probs, dtype=np.float64)[order],
        symbols=np.asarray(symbols, dtype=object),
        final_nodes=np.asarray(final_nodes, dtype=np.int64),
        final_probs=np.asarray(final_probs, dtype=np.float64),
    )
