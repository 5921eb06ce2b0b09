"""FSST-style symbol-table string compression, vectorized in numpy.

Algorithmic family: FSST ("Fast Random Access String Compression",
VLDB 2020, see PAPERS.md): learn a table of up to 255 byte symbols
(1..8 bytes each) from a sample via iterated greedy parsing, then encode
every string as a sequence of 1-byte codes, escaping unmatched bytes.
The reference (whaleclub777/cryo) delegates string compression to the
parquet writer (/root/reference/crates/freeze/src/types/dataframes/export.rs:38-42);
we implement the codec itself, per BASELINE.json:north_rule.

Our container differs from the canonical FSST byte layout to allow a
fully vectorized decoder: unit codes and escaped literal bytes are kept
in two separate streams, so decoding is a gather + scatter with no
sequential scan. Encoding parses all strings in lockstep "waves"
(one unit per string per round), so the Python-level loop is bounded by
the longest string's unit count, not by total bytes — every round is
pure vectorized numpy over all still-active strings.
"""

from __future__ import annotations

import struct

import numpy as np

from .bits import get_blob, put_blob
from . import ints

MAX_SYMBOLS = 255  # code 255 reserved as escape marker
MAX_SYMBOL_LEN = 8
ESCAPE = 255
_TRAIN_ITERS = 2
_SAMPLE_BYTES = 1 << 15


# ---------------------------------------------------------------------------
# symbol table
# ---------------------------------------------------------------------------

class SymbolTable:
    """Immutable learned table; provides vectorized longest-match lookup."""

    def __init__(self, symbols: list[bytes]):
        if len(symbols) > MAX_SYMBOLS:
            raise ValueError("at most 255 symbols")
        self.symbols = symbols
        self.sym_lens = np.array([len(s) for s in symbols], dtype=np.int64)
        # per-length sorted key arrays for searchsorted lookup
        self._keys: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        by_len: dict[int, list[tuple[int, int]]] = {}
        for code, s in enumerate(symbols):
            if not 1 <= len(s) <= MAX_SYMBOL_LEN:
                raise ValueError("symbol length must be 1..8")
            key = int.from_bytes(s, "little")
            by_len.setdefault(len(s), []).append((key, code))
        for length, pairs in by_len.items():
            pairs.sort()
            keys = np.array([k for k, _ in pairs], dtype=np.uint64)
            codes = np.array([c for _, c in pairs], dtype=np.int64)
            self._keys[length] = (keys, codes)

    def serialize(self) -> bytes:
        parts = [struct.pack("<B", len(self.symbols))]
        parts.append(bytes(self.sym_lens.astype(np.uint8)))
        parts.extend(self.symbols)
        return b"".join(parts)

    @classmethod
    def deserialize(cls, buf: memoryview) -> tuple["SymbolTable", int]:
        (n,) = struct.unpack_from("<B", buf, 0)
        lens = np.frombuffer(buf, dtype=np.uint8, count=n, offset=1)
        pos = 1 + n
        symbols = []
        for ln in lens:
            symbols.append(bytes(buf[pos : pos + int(ln)]))
            pos += int(ln)
        return cls(symbols), pos

    def match(self, win8: np.ndarray, remaining: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Longest-match per position.

        win8: uint64 8-byte little-endian window at each position.
        remaining: bytes left in the string at each position (clamps
        matches so symbols never cross string boundaries).
        Returns (code, match_len); code == -1 where no symbol matches.
        """
        n = len(win8)
        code = np.full(n, -1, dtype=np.int64)
        mlen = np.zeros(n, dtype=np.int64)
        for length in range(MAX_SYMBOL_LEN, 0, -1):
            if length not in self._keys:
                continue
            keys, codes = self._keys[length]
            todo = (mlen == 0) & (remaining >= length)
            if not todo.any():
                continue
            mask = np.uint64((1 << (8 * length)) - 1) if length < 8 else np.uint64(0xFFFFFFFFFFFFFFFF)
            cand = win8[todo] & mask
            idx = np.searchsorted(keys, cand)
            idx_clip = np.minimum(idx, len(keys) - 1)
            hit = keys[idx_clip] == cand
            where = np.flatnonzero(todo)
            hit_pos = where[hit]
            code[hit_pos] = codes[idx_clip[hit]]
            mlen[hit_pos] = length
        return code, mlen


def _len_mask(lengths: np.ndarray) -> np.ndarray:
    """uint64 mask keeping the low ``length`` bytes (length 1..8, overflow-safe)."""
    shift = (np.minimum(lengths, 7).astype(np.uint64)) * np.uint64(8)
    mask = (np.uint64(1) << shift) - np.uint64(1)
    return np.where(lengths >= 8, np.uint64(0xFFFFFFFFFFFFFFFF), mask)


def _windows8(data: np.ndarray) -> np.ndarray:
    """uint64 little-endian 8-byte window starting at each position."""
    n = len(data)
    padded = np.concatenate((data, np.zeros(MAX_SYMBOL_LEN, dtype=np.uint8)))
    win = np.zeros(n, dtype=np.uint64)
    for i in range(MAX_SYMBOL_LEN):
        win |= padded[i : i + n].astype(np.uint64) << np.uint64(8 * i)
    return win


# ---------------------------------------------------------------------------
# greedy lockstep parse (shared by trainer and encoder)
# ---------------------------------------------------------------------------

def _parse(table: SymbolTable, data: np.ndarray, starts: np.ndarray, ends: np.ndarray):
    """Parse every string greedily; all strings advance in lockstep waves.

    Returns (str_idx, pos, codes, unit_lens) flat arrays over all emitted
    units, ordered round-major (re-sort by (str_idx, pos) for string order).
    code -1 means escape (unit_len 1, literal byte at pos).
    """
    n_pos = len(data)
    if n_pos:
        # end offset of the string covering each position
        lengths = ends - starts
        nonempty = lengths > 0
        str_end_at = np.repeat(ends[nonempty], lengths[nonempty])
        win8 = _windows8(data)
        remaining = str_end_at - np.arange(n_pos)
        code_at, mlen_at = table.match(win8, remaining)
        mlen_at = np.where(mlen_at == 0, 1, mlen_at)  # escapes consume 1 byte
    out_idx: list[np.ndarray] = []
    out_pos: list[np.ndarray] = []
    out_code: list[np.ndarray] = []
    out_len: list[np.ndarray] = []
    active = np.flatnonzero(ends > starts)
    cur = starts[active].copy()
    while len(active):
        c = code_at[cur]
        ml = mlen_at[cur]
        out_idx.append(active.copy())
        out_pos.append(cur.copy())
        out_code.append(c)
        out_len.append(ml)
        cur = cur + ml
        alive = cur < ends[active]
        active = active[alive]
        cur = cur[alive]
    if not out_idx:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty, empty, empty
    return (
        np.concatenate(out_idx),
        np.concatenate(out_pos),
        np.concatenate(out_code),
        np.concatenate(out_len),
    )


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def train(data: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> SymbolTable:
    """Learn a symbol table from (a deterministic sample of) the strings."""
    # deterministic sample: first strings up to ~64 KiB of bytes
    if len(ends):
        cut = int(np.searchsorted(ends, _SAMPLE_BYTES, side="right"))
        cut = max(1, min(cut + 1, len(ends)))
    else:
        cut = 0
    s_starts, s_ends = starts[:cut], ends[:cut]
    limit = int(s_ends[-1]) if cut else 0
    s_data = data[:limit]

    table = SymbolTable([])
    for _ in range(_TRAIN_ITERS):
        str_idx, pos, codes, ulens = _parse(table, s_data, s_starts, s_ends)
        if not len(pos):
            break
        order = np.lexsort((pos, str_idx))
        str_idx, pos, ulens = str_idx[order], pos[order], ulens[order]
        win8 = _windows8(s_data)
        rem = s_ends[str_idx] - pos
        cand_keys: list[np.ndarray] = []
        cand_lens: list[np.ndarray] = []
        # single units as candidates
        l1 = np.minimum(ulens, MAX_SYMBOL_LEN)
        cand_keys.append(win8[pos] & _len_mask(l1))
        cand_lens.append(l1)
        # concatenations of adjacent units within the same string
        if len(pos) > 1:
            adj = str_idx[:-1] == str_idx[1:]
            tot = ulens[:-1] + ulens[1:]
            ok = adj & (tot <= MAX_SYMBOL_LEN) & (tot <= rem[:-1])
            p = pos[:-1][ok]
            cand_keys.append(win8[p] & _len_mask(tot[ok]))
            cand_lens.append(tot[ok])
        keys = np.concatenate(cand_keys)
        lens = np.concatenate(cand_lens)
        # count (key, len) pairs
        comp = np.stack([keys, lens.astype(np.uint64)], axis=1)
        uniq, counts = np.unique(comp, axis=0, return_counts=True)
        gain = counts * uniq[:, 1].astype(np.int64)
        top = np.argsort(gain, kind="stable")[::-1][:MAX_SYMBOLS]
        symbols = [
            int(uniq[i, 0]).to_bytes(8, "little")[: int(uniq[i, 1])] for i in top
        ]
        table = SymbolTable(symbols)
    return table


# ---------------------------------------------------------------------------
# encode / decode payloads
# ---------------------------------------------------------------------------

def encode(data: np.ndarray, lengths: np.ndarray) -> bytes:
    """Encode concatenated utf8 ``data`` split per ``lengths``.

    Payload: table | n_strings | nested n_units blob | nested n_escape-
    positions blob | codes stream | literal stream.
    """
    lengths = lengths.astype(np.int64, copy=False)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    table = train(data, starts, ends)
    str_idx, pos, codes, ulens = _parse(table, data, starts, ends)
    order = np.lexsort((pos, str_idx))
    str_idx, pos, codes = str_idx[order], pos[order], codes[order]
    esc = codes < 0
    stream_a = np.where(esc, ESCAPE, codes).astype(np.uint8)
    stream_b = data[pos[esc]]
    n_units = np.bincount(str_idx, minlength=len(lengths)).astype(np.int64)
    parts: list[bytes] = [table.serialize(), struct.pack("<Q", len(lengths))]
    put_blob(parts, ints.encode_for(n_units))
    put_blob(parts, stream_a.tobytes())
    put_blob(parts, stream_b.tobytes())
    return b"".join(parts)


def decode(buf: memoryview) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode` -> (data bytes array, lengths)."""
    table, pos0 = SymbolTable.deserialize(buf)
    (n_strings,) = struct.unpack_from("<Q", buf, pos0)
    pos0 += 8
    units_blob, pos0 = get_blob(buf, pos0)
    a_blob, pos0 = get_blob(buf, pos0)
    b_blob, pos0 = get_blob(buf, pos0)
    n_units = ints.decode_for(units_blob)
    stream_a = np.frombuffer(a_blob, dtype=np.uint8)
    stream_b = np.frombuffer(b_blob, dtype=np.uint8)

    if len(stream_a) == 0:
        return np.empty(0, dtype=np.uint8), np.zeros(n_strings, dtype=np.int64)

    esc = stream_a == ESCAPE
    sym_lens_full = np.concatenate((table.sym_lens, np.zeros(max(0, 256 - len(table.sym_lens)), dtype=np.int64)))
    unit_out_len = np.where(esc, 1, sym_lens_full[stream_a])
    out_offsets = np.concatenate(([0], np.cumsum(unit_out_len)))
    total = int(out_offsets[-1])
    out = np.zeros(total, dtype=np.uint8)

    # escapes: single literal bytes
    out[out_offsets[:-1][esc]] = stream_b

    # symbols: scatter each symbol's bytes via a repeat/cumsum gather
    sym_mask = ~esc
    if sym_mask.any():
        sym_codes = stream_a[sym_mask].astype(np.int64)
        lens = sym_lens_full[sym_codes]
        dst_start = out_offsets[:-1][sym_mask]
        # flat destination indices: start_i + (0..len_i-1) for each unit
        reps = np.repeat(dst_start, lens)
        intra = np.arange(len(reps)) - np.repeat(
            np.concatenate(([0], np.cumsum(lens)[:-1])), lens
        )
        dst = reps + intra
        # flat source indices into concatenated symbol bytes
        sym_bytes = np.frombuffer(b"".join(table.symbols), dtype=np.uint8)
        sym_offs = np.concatenate(([0], np.cumsum(table.sym_lens)))
        src = np.repeat(sym_offs[sym_codes], lens) + intra
        out[dst] = sym_bytes[src]

    # per-string byte lengths: sum of unit_out_len grouped by string
    unit_ends = np.cumsum(n_units)
    cum = np.concatenate(([0], np.cumsum(unit_out_len)))
    str_byte_len = cum[unit_ends] - cum[unit_ends - n_units]
    return out, str_byte_len.astype(np.int64)
