"""Minimal acyclic finite-state transducer (FST) term dictionary.

Closes the last declared non-goal of rounds 1-3: a real byte-serialized
FST dictionary.  Behavioral reference: ``FSTBuilder<T>`` / ``FST<T>`` /
``PersistentDictionaryFst`` in the reference engine
(``Src/Protsyk.PMS.FullText.Core/Automata/FST.cs:38-1788``,
``IndexTypes/Persistent/PersistentDictionaryFst.cs:10-80`` — behavior
observed, no code copied; byte layout is this repo's own).  Algorithm:
incremental construction of the minimal acyclic automaton from sorted
input (Daciuk, Mihov, Watson & Watson 2000, "Incremental construction
of minimal acyclic finite-state automata", Computational Linguistics
26(1)) with transducer outputs pushed toward the root (Mohri 2000);
the same scheme Lucene's FST uses.

Scale shape: construction is a single sequential pass over the SORTED
vocabulary (the term catalog is already sorted on disk), holding only
the current-word path plus the state register — the classic
single-writer dictionary build; lookups traverse the byte image
directly (offset-addressed states, children serialized before
parents), so a searcher can serve a multi-million-term dictionary from
one mmap-able buffer with O(len(term)) exact lookups and automaton
intersection for WILD/EDIT — no per-query decode of the vocabulary.

Outputs are pluggable like the reference's ``IFSTOutput<T>``:
``IntOutput`` (zigzag varints; sum/sub/min) and ``StringOutput``
(UTF-8 bytes; concat / suffix / longest-common-prefix).
"""

from __future__ import annotations

from typing import Iterable, Iterator

__all__ = [
    "IntOutput",
    "StringOutput",
    "FstBuilder",
    "Fst",
    "build_fst",
]


# ---------------------------------------------------------------------------
# varints (unsigned LEB128 over a bytearray)


def _write_uvarint(buf: bytearray, v: int) -> None:
    if v < 0x80:  # dominant case: labels/flags/small deltas
        buf.append(v)
        return
    while v >= 0x80:
        buf.append((v & 0x7F) | 0x80)
        v >>= 7
    buf.append(v)


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        try:
            b = data[pos]
        except IndexError:
            raise ValueError("corrupt FST image: varint runs past end of buffer") from None
        pos += 1
        out |= (b & 0x7F) << shift
        if b < 0x80:
            return out, pos
        shift += 7
        if shift > 63:
            # a run of continuation bytes in corrupt data would grow an
            # unbounded Python int; real offsets/counts fit 64 bits
            raise ValueError("corrupt FST image: over-long varint")


# ---------------------------------------------------------------------------
# output algebras


class IntOutput:
    """Integer outputs: sum/sub/min, zigzag-varint serialized.

    Supports negative values (the reference test set includes ``-2``;
    its VarInt cast does the same job via two's complement)."""

    code = 1
    zero = 0

    @staticmethod
    def sum(a: int, b: int) -> int:
        return a + b

    @staticmethod
    def sub(a: int, b: int) -> int:
        return a - b

    @staticmethod
    def common(a: int, b: int) -> int:
        return a if a < b else b

    @staticmethod
    def write(buf: bytearray, v: int) -> None:
        # explicit-branch zigzag: the classic (v << 1) ^ (v >> 63) trick
        # assumes 64-bit ints — on Python's unbounded ints it corrupts
        # any v >= 2**63 (the shifted high bits XOR into the low bits)
        _write_uvarint(buf, (v << 1) if v >= 0 else ((-v) << 1) - 1)

    @staticmethod
    def read(data: bytes, pos: int) -> tuple[int, int]:
        u, pos = _read_uvarint(data, pos)
        return ((u + 1) >> 1) * (-1 if u & 1 else 1), pos


class StringOutput:
    """Byte-string outputs: concat / suffix-after / longest common prefix
    (the reference's ``FSTStringOutput``).  Values are ``bytes``."""

    code = 2
    zero = b""

    @staticmethod
    def sum(a: bytes, b: bytes) -> bytes:
        return a + b

    @staticmethod
    def sub(a: bytes, b: bytes) -> bytes:
        if not b:
            return a
        if not a.startswith(b):
            raise ValueError("sub() of a non-prefix")
        return a[len(b) :]

    @staticmethod
    def common(a: bytes, b: bytes) -> bytes:
        n = min(len(a), len(b))
        i = 0
        while i < n and a[i] == b[i]:
            i += 1
        return a[:i]

    @staticmethod
    def write(buf: bytearray, v: bytes) -> None:
        _write_uvarint(buf, len(v))
        buf.extend(v)

    @staticmethod
    def read(data: bytes, pos: int) -> tuple[bytes, int]:
        n, pos = _read_uvarint(data, pos)
        return bytes(data[pos : pos + n]), pos + n


_OUTPUTS_BY_CODE = {IntOutput.code: IntOutput, StringOutput.code: StringOutput}

_MAGIC = b"RFST"


# ---------------------------------------------------------------------------
# builder


class _MutState:
    __slots__ = ("arcs", "final", "final_out")

    def __init__(self) -> None:
        # arcs: [label_codepoint, output, target_offset_or_None]; the
        # last arc of each path state leads to the next (still mutable)
        # path state until that child is frozen.
        self.arcs: list[list] = []
        self.final = False
        self.final_out = None


class FstBuilder:
    """Streaming minimal-FST builder over STRICTLY SORTED (term, output)
    pairs.  States are byte-serialized the moment they are frozen
    (children always freeze before parents), so peak memory is the
    register + the current word's path — not the automaton."""

    def __init__(self, output=IntOutput):
        self.out = output
        self._buf = bytearray()
        # state signature -> byte offset (the Daciuk register)
        self._register: dict[tuple, int] = {}
        self._path: list[_MutState] = [_MutState()]
        self._prev = ""
        self._n_terms = 0
        self._done = False

    # -- freezing ---------------------------------------------------------

    def _freeze(self, st: _MutState) -> int:
        key = (st.final, st.final_out, tuple(map(tuple, st.arcs)))
        off = self._register.get(key)
        if off is not None:
            return off
        off = len(self._buf)
        buf = self._buf
        out = self.out
        has_fout = st.final and st.final_out != out.zero
        _write_uvarint(buf, (1 if st.final else 0) | (2 if has_fout else 0))
        if has_fout:
            out.write(buf, st.final_out)
        _write_uvarint(buf, len(st.arcs))
        for label, aout, target in st.arcs:
            _write_uvarint(buf, label)
            delta = off - target  # children serialized earlier: delta >= 0
            has_out = aout != out.zero
            _write_uvarint(buf, (delta << 1) | (1 if has_out else 0))
            if has_out:
                out.write(buf, aout)
        self._register[key] = off
        return off

    def _freeze_tail(self, down_to: int) -> None:
        while len(self._path) > down_to + 1:
            child = self._path.pop()
            self._path[-1].arcs[-1][2] = self._freeze(child)

    # -- public API ---------------------------------------------------------

    def add(self, term: str, output) -> None:
        if self._done:
            raise RuntimeError("finish() already called")
        if term <= self._prev and self._n_terms:
            raise ValueError(
                f"terms must be strictly sorted: {term!r} after {self._prev!r}"
            )
        out = self.out
        prev = self._prev
        p = 0
        n = min(len(prev), len(term))
        while p < n and prev[p] == term[p]:
            p += 1
        self._freeze_tail(p)
        # extend the path with fresh states for the new suffix
        for ch in term[p:]:
            st = _MutState()
            self._path[-1].arcs.append([ord(ch), out.zero, None])
            self._path.append(st)
        last = self._path[-1]
        last.final = True
        last.final_out = out.zero

        # push the output along the shared prefix (Mohri): each prefix
        # arc keeps the common part; the rest is pushed into the child's
        # arcs / final output so every earlier word's total is preserved.
        cur = output
        for i in range(p):
            arc = self._path[i].arcs[-1]
            common = out.common(arc[1], cur)
            if common != arc[1]:
                diff = out.sub(arc[1], common)
                arc[1] = common
                child = self._path[i + 1]
                for a in child.arcs:
                    a[1] = out.sum(diff, a[1])
                if child.final:
                    child.final_out = out.sum(diff, child.final_out)
            cur = out.sub(cur, common)
        if len(term) == p:
            # term == prev is rejected above; term < prev impossible —
            # this arm only fires for the very first, empty term
            last.final_out = cur
        else:
            # the pushes above may have spilled onto this brand-new arc
            # (it shares the branch state with surviving old arcs); the
            # new word's leftover OVERWRITES it — the spilled part was
            # never owed to any earlier word through this arc.
            self._path[p].arcs[-1][1] = cur
        self._prev = term
        self._n_terms += 1

    def finish(self) -> "Fst":
        if self._done:
            raise RuntimeError("finish() already called")
        self._done = True
        self._freeze_tail(0)
        root = self._freeze(self._path[0])
        buf = self._buf
        footer = bytearray()
        _write_uvarint(footer, root)
        _write_uvarint(footer, self._n_terms)
        footer.append(self.out.code)
        footer.append(len(footer) + 1 + len(_MAGIC))  # footer size incl. this byte
        footer.extend(_MAGIC)
        buf.extend(footer)
        return Fst(bytes(buf))


def build_fst(pairs: Iterable[tuple[str, object]], output=IntOutput) -> "Fst":
    b = FstBuilder(output)
    for term, value in pairs:
        b.add(term, value)
    return b.finish()


# ---------------------------------------------------------------------------
# reader


class Fst:
    """Offset-addressed FST over one byte buffer (no deserialization)."""

    def __init__(self, data: bytes):
        if len(data) < len(_MAGIC) + 1 or data[-len(_MAGIC) :] != _MAGIC:
            raise ValueError("not an FST image (bad magic)")
        fsize = data[-len(_MAGIC) - 1]
        if fsize > len(data):
            raise ValueError("corrupt FST image: footer size exceeds image")
        footer = data[len(data) - fsize :]
        pos = 0
        self.root, pos = _read_uvarint(footer, pos)
        self.n_terms, pos = _read_uvarint(footer, pos)
        try:
            self.out = _OUTPUTS_BY_CODE[footer[pos]]
        except (KeyError, IndexError):
            raise ValueError("corrupt FST image: unknown output algebra code") from None
        if self.root >= len(data) - fsize and not (self.root == 0 and self.n_terms == 0):
            raise ValueError("corrupt FST image: root offset outside body")
        self.data = data
        # NOTE: only the footer is structurally validated here — a
        # TRUNCATED body spliced onto an intact footer can still load
        # and return misses for present terms.  Body corruption that
        # moves offsets/varints out of range raises a descriptive
        # 'corrupt FST image' error at traversal time (never a raw
        # IndexError); full integrity needs an external checksum over
        # the file (the sidecar store records nbytes per shard).

    def get_bytes(self) -> bytes:
        return self.data

    @classmethod
    def from_bytes(cls, data: bytes) -> "Fst":
        return cls(data)

    # -- state decode -------------------------------------------------------

    def _state(self, off: int):
        """-> (final, final_out, arcs_pos, n_arcs)"""
        data = self.data
        flags, pos = _read_uvarint(data, off)
        fout = self.out.zero
        if flags & 2:
            fout, pos = self.out.read(data, pos)
        n_arcs, pos = _read_uvarint(data, pos)
        return bool(flags & 1), fout, pos, n_arcs

    def _arcs(self, off: int, pos_n=None) -> Iterator[tuple[int, object, int]]:
        """Yield (label, output, target_offset) in label order.
        ``pos_n`` = (arcs_pos, n_arcs) from a _state call the caller
        already made — skips re-decoding the state header (the
        traversal hot paths visit every state via _state first)."""
        data = self.data
        if pos_n is None:
            _final, _fout, pos, n = self._state(off)
        else:
            pos, n = pos_n
        for _ in range(n):
            label, pos = _read_uvarint(data, pos)
            packed, pos = _read_uvarint(data, pos)
            aout = self.out.zero
            if packed & 1:
                aout, pos = self.out.read(data, pos)
            yield label, aout, off - (packed >> 1)

    # -- queries ------------------------------------------------------------

    def try_match(self, term: str):
        """Exact lookup: -> (True, output) | (False, None).

        Mirrors ``FST<T>.TryMatch`` (reference FST.cs:935)."""
        out = self.out
        off = self.root
        acc = out.zero
        for ch in term:
            c = ord(ch)
            hit = None
            for label, aout, target in self._arcs(off):
                if label == c:
                    hit = (aout, target)
                    break
                if label > c:
                    break
            if hit is None:
                return False, None
            acc = out.sum(acc, hit[0])
            off = hit[1]
        final, fout, _, _ = self._state(off)
        if not final:
            return False, None
        return True, out.sum(acc, fout)

    def __contains__(self, term: str) -> bool:
        return self.try_match(term)[0]

    def items(self) -> Iterator[tuple[str, object]]:
        """All (term, output) pairs in lexicographic term order."""
        out = self.out
        # stack: (state_off, acc_output, arc_iterator)
        final, fout, _, _ = self._state(self.root)
        if final:
            yield "", out.sum(out.zero, fout)
        stack = [(self._arcs(self.root), out.zero)]
        prefix: list[str] = []
        while stack:
            it, acc = stack[-1]
            nxt = next(it, None)
            if nxt is None:
                stack.pop()
                if prefix:
                    prefix.pop()
                continue
            label, aout, target = nxt
            prefix.append(chr(label))
            acc2 = out.sum(acc, aout)
            final, fout, apos, n_arcs = self._state(target)
            if final:
                yield "".join(prefix), out.sum(acc2, fout)
            stack.append((self._arcs(target, (apos, n_arcs)), acc2))

    def match(self, matcher) -> Iterator[str]:
        """All terms accepted by a DFA matcher, in sorted order
        (dictionary ∩ automaton — reference ``FST<T>.Match``,
        FST.cs:1004; used by PersistentDictionaryFst.GetTerms).

        ``matcher`` implements next(ch)->bool / pop() / is_final()
        (see :mod:`fulltextsearch_ray.dfa`)."""
        if matcher.is_final():
            final, _fout, _, _ = self._state(self.root)
            if final:
                yield ""
        stack = [self._arcs(self.root)]
        prefix: list[str] = []
        while stack:
            nxt = next(stack[-1], None)
            if nxt is None:
                stack.pop()
                if prefix:
                    prefix.pop()
                    matcher.pop()
                continue
            label, _aout, target = nxt
            ch = chr(label)
            if not matcher.next(ch):
                continue
            prefix.append(ch)
            final, _fout, apos, n_arcs = self._state(target)
            if final and matcher.is_final():
                yield "".join(prefix)
            stack.append(self._arcs(target, (apos, n_arcs)))

    def n_states(self) -> int:
        """Distinct serialized states (diagnostic; minimality checks)."""
        seen = set()
        todo = [self.root]
        while todo:
            off = todo.pop()
            if off in seen:
                continue
            seen.add(off)
            for _l, _o, t in self._arcs(off):
                todo.append(t)
        return len(seen)
