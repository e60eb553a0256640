"""Pure-Python reader + Viterbi tagger for CRFsuite ``crf1d`` G2P models.

The reference guesses out-of-lexicon pronunciations with a pycrfsuite CRF
per language (``gruut/g2p.py:56-90``, model files
``gruut-lang-*/g2p/model.crf``).  pycrfsuite is not installable in this
environment, but the CRFsuite model format is public and simple (Naoaki
Okazaki's crfsuite, ``crf1d_model.c``/``cqdb.c``), so this module
implements it from scratch:

* file header: ``lCRF`` magic + section offsets;
* ``FEAT`` chunk: flat records ``(type, src, dst, float64 weight)`` where
  type 0 is a state feature (attribute → label) and type 1 a transition
  (label → label);
* labels and attributes: two CQDB string tables — only the backward
  (id → string) array is needed, the hash buckets are skipped.

Attributes follow pycrfsuite's dict-item encoding (``key:value`` with the
grapheme base64-coded by the reference's feature template,
``gruut/g2p.py:108-157``); labels are base64-coded phoneme groups joined
with ``|`` where ``_`` is the dropped epsilon phoneme.

Inference is max-sum Viterbi over (state + transition) scores — numpy
``argmax`` scans labels in id order, matching crfsuite's first-best
tie-breaking.  A model loads once per actor (``PhonemizeStage.__init__``)
in ~10-100 ms and tags only lexicon misses, so per-word cost is off the
hot path.
"""

from __future__ import annotations

import base64
import struct
import typing
import unicodedata

import numpy as np

EPS_PHONEME = "_"
PHONEME_JOIN = "|"

_HEADER = struct.Struct("<4sI4sIIIIIIIII")
_CQDB_HEADER = struct.Struct("<4sIIIII")
_FEAT_HEADER = struct.Struct("<4sII")


def _read_cqdb_backward(data: bytes, off: int) -> typing.List[str]:
    """id → string from a CQDB chunk's backward array (records are
    ``{uint32 id, uint32 ksize, key-bytes (NUL-terminated)}``)."""
    magic, _size, _flag, _bo, num, bwd = _CQDB_HEADER.unpack_from(data, off)
    if magic != b"CQDB":
        raise ValueError(f"bad CQDB chunk at {off}: {magic!r}")
    offsets = struct.unpack_from(f"<{num}I", data, off + bwd)
    out: typing.List[str] = [""] * num
    for i, ro in enumerate(offsets):
        rid, ksize = struct.unpack_from("<II", data, off + ro)
        if rid != i:
            raise ValueError(f"CQDB backward record id mismatch: {rid} != {i}")
        start = off + ro + 8
        out[i] = data[start:start + ksize].rstrip(b"\0").decode("utf-8")
    return out


def load_crf1d(path: str) -> typing.Tuple[
        typing.List[str],
        typing.Dict[str, typing.List[typing.Tuple[int, float]]],
        np.ndarray]:
    """Parse a CRFsuite crf1d model file into ``(labels, state, trans)``:
    raw label strings in id order, attribute string → [(label_id, weight)]
    state features, and the (L, L) transition matrix.  Shared by the G2P
    reader below and the POS reader (``gruut_ray.phonem.pos.CrfPos``) —
    the two differ only in feature templates and label decoding."""
    with open(path, "rb") as f:
        data = f.read()
    (magic, _fsize, ftype, version, _nf, _nl, _na, off_feat, off_labels,
     off_attrs, _off_lrefs, _off_arefs) = _HEADER.unpack_from(data, 0)
    if magic != b"lCRF" or ftype != b"FOMC":
        raise ValueError(f"not a crf1d model: {magic!r}/{ftype!r}")
    if version > 100:
        raise ValueError(f"unsupported crf1d version {version}")

    labels = _read_cqdb_backward(data, off_labels)
    attrs = _read_cqdb_backward(data, off_attrs)
    num_labels = len(labels)

    fmagic, _fsz, nfeat = _FEAT_HEADER.unpack_from(data, off_feat)
    if fmagic != b"FEAT":
        raise ValueError(f"bad FEAT chunk: {fmagic!r}")
    rec = np.frombuffer(
        data, offset=off_feat + 12, count=nfeat,
        dtype=np.dtype([("type", "<u4"), ("src", "<u4"), ("dst", "<u4"),
                        ("weight", "<f8")]))

    trans = np.zeros((num_labels, num_labels), dtype=np.float64)
    state: typing.Dict[str, typing.List[typing.Tuple[int, float]]] = {}
    t_mask = rec["type"] == 1
    trans[rec["src"][t_mask], rec["dst"][t_mask]] = rec["weight"][t_mask]
    s_rec = rec[~t_mask]
    for src, dst, w in zip(s_rec["src"].tolist(), s_rec["dst"].tolist(),
                           s_rec["weight"].tolist()):
        state.setdefault(attrs[src], []).append((dst, w))
    return labels, state, trans


class CrfG2P:
    """A loaded crf1d G2P model: ``model(word) -> [phoneme, ...]``.

    Mirrors the reference ``GraphemesToPhonemes`` contract
    (gruut/g2p.py:77-90): NFC-normalize, one label per grapheme, labels
    are b64-coded ``|``-joined phoneme groups, epsilon dropped.
    """

    def __init__(self, labels: typing.List[str],
                 state: typing.Dict[str, typing.List[typing.Tuple[int, float]]],
                 trans: np.ndarray):
        self.num_labels = len(labels)
        # decode b64 label strings once: label id -> [phoneme, ...]
        self.label_phonemes: typing.List[typing.List[str]] = []
        for coded in labels:
            decoded = base64.b64decode(coded).decode("utf-8")
            self.label_phonemes.append(
                [p for p in decoded.split(PHONEME_JOIN)
                 if p and p != EPS_PHONEME])
        self.state = state          # attr string -> [(label_id, weight)]
        self.trans = trans          # (L, L) float64
        # per-model memo: corpora are Zipf-distributed, so OOV words repeat
        # heavily within an actor's lifetime; Viterbi is ~0.5 ms/word in
        # pure Python + numpy, a dict hit is ~100 ns.  Bounded for
        # dirty-data corpora with unbounded unique garbage tokens.
        self._cache: typing.Dict[str, typing.Tuple[str, ...]] = {}
        self._cache_max = 200_000

    # -- model file ---------------------------------------------------------

    @classmethod
    def load(cls, path: str) -> "CrfG2P":
        return cls(*load_crf1d(path))

    # -- features (must match gruut/g2p.py:108-157 + pycrfsuite dict items) -

    @staticmethod
    def _b64(s: str) -> str:
        return base64.b64encode(s.encode()).decode("ascii")

    def _position_attrs(self, word: str, i: int) -> typing.List[str]:
        n = len(word)
        feats = ["bias", f"grapheme:{self._b64(word[i])}"]
        if i == 0:
            feats.append("begin")
        for j in range(1, 4):
            if i >= j:
                feats.append(f"grapheme-{j}:{self._b64(word[i - j])}")
        for j in range(1, 4):
            if i < n - j:
                feats.append(f"grapheme+{j}:{self._b64(word[i + j])}")
        if i == n - 1:
            feats.append("end")
        return feats

    # -- inference ----------------------------------------------------------

    def predict_label_ids(self, word: str) -> typing.List[int]:
        n = len(word)
        if n == 0:
            return []
        L = self.num_labels
        scores = np.zeros((n, L), dtype=np.float64)
        for i in range(n):
            row = scores[i]
            for attr in self._position_attrs(word, i):
                for label_id, w in self.state.get(attr, ()):
                    row[label_id] += w
        # Viterbi (max-sum); argmax scans ids ascending = crfsuite first-best
        back = np.zeros((n, L), dtype=np.int32)
        delta = scores[0].copy()
        for t in range(1, n):
            cand = delta[:, None] + self.trans
            back[t] = np.argmax(cand, axis=0)
            delta = cand[back[t], np.arange(L)] + scores[t]
        path = [int(np.argmax(delta))]
        for t in range(n - 1, 0, -1):
            path.append(int(back[t, path[-1]]))
        path.reverse()
        return path

    def __call__(self, word: str, normalize: bool = True,
                 ) -> typing.Sequence[str]:
        if normalize:
            word = unicodedata.normalize("NFC", word)
        cached = self._cache.get(word)
        if cached is not None:
            return cached
        phonemes: typing.List[str] = []
        for label_id in self.predict_label_ids(word):
            phonemes.extend(self.label_phonemes[label_id])
        if len(self._cache) >= self._cache_max:
            self._cache.clear()
        self._cache[word] = result = tuple(phonemes)
        return result


def write_crf1d(path: str, labels: typing.Sequence[str],
                attrs: typing.Sequence[str],
                state: typing.Sequence[typing.Tuple[int, int, float]],
                trans: typing.Sequence[typing.Tuple[int, int, float]],
                ) -> None:
    """Emit a CRFsuite crf1d model file (public format, Naoaki Okazaki's
    crfsuite crf1d_model.c / cqdb.c): header + FEAT chunk + label/attr
    CQDB string tables with backward arrays — exactly the sections
    :func:`load_crf1d` reads.  Used by the POS pack trainer
    (``gruut_ray.tools.train_pos_crf``) and the synthetic-model tests.

    ``state``: ``[(attr_id, label_id, weight)]``;
    ``trans``: ``[(src_label_id, dst_label_id, weight)]``.
    """
    recs = [(0, a, l, w) for a, l, w in state] \
        + [(1, s, d, w) for s, d, w in trans]
    feat_body = b"".join(struct.pack("<IIId", *r) for r in recs)
    feat_chunk = struct.pack("<4sII", b"FEAT", 12 + len(feat_body),
                             len(recs)) + feat_body

    def cqdb(strings: typing.Sequence[str]) -> bytes:
        header_size = struct.calcsize("<4sIIIII")
        body = b""
        offs = []
        cur = header_size
        for i, s in enumerate(strings):
            offs.append(cur)
            kb = s.encode() + b"\0"
            rec = struct.pack("<II", i, len(kb)) + kb
            body += rec
            cur += len(rec)
        bwd = cur
        body += struct.pack(f"<{len(strings)}I", *offs)
        return struct.pack("<4sIIIII", b"CQDB", header_size + len(body),
                           0, 0, len(strings), bwd) + body

    labels_chunk = cqdb(labels)
    attrs_chunk = cqdb(attrs)
    hdr_size = _HEADER.size
    off_feat = hdr_size
    off_labels = off_feat + len(feat_chunk)
    off_attrs = off_labels + len(labels_chunk)
    data = _HEADER.pack(
        b"lCRF", 0, b"FOMC", 100, len(recs),
        len(labels), len(attrs), off_feat, off_labels, off_attrs, 0, 0)
    data += feat_chunk + labels_chunk + attrs_chunk
    with open(path, "wb") as f:
        f.write(data)
