"""Dynamic-Huffman block emission.

Equivalent of the reference's block writer (src/compress/bitstream.rs):
per-block frequency counting, Huffman tree construction with Kraft-sum length
limiting, and serialization of the block.  The hot paths are vectorized:
frequencies come from ``np.bincount`` over literal runs, and all symbol codes
for a block are emitted through one ``pack_bits`` scatter instead of a serial
bit loop.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np

from ..ops.bitio import BitWriter
from ..tables import (
    CLCL_ORDER,
    DIST_SYM_TO_DIST_BASE,
    DIST_SYM_TO_DIST_EXTRA,
    LENGTH_TO_LEN_EXTRA,
    LENGTH_TO_SYMBOL,
)

# Symbols produced by the parse layer (reference: src/compress/bitstream.rs:29-39).
# A literal run is (LITERAL_RUN, start, end) with absolute stream indices;
# a back-reference is (BACKREF, length, distance, dist_sym).
LITERAL_RUN = 0
BACKREF = 1


@dataclass
class LiteralRun:
    start: int
    end: int


@dataclass
class Backref:
    length: int
    distance: int
    dist_sym: int


def build_huffman_tree(
    frequencies: np.ndarray, length_limit: int
) -> tuple[np.ndarray, np.ndarray, bool]:
    """Optimal length-limited Huffman code for the given frequencies.

    Returns ``(lengths, codes, is_multi_symbol)``.  Alphabets with <= 1 used
    symbol get a single 1-bit code and ``is_multi_symbol == False``
    (reference: src/compress/bitstream.rs:198-325).
    """
    frequencies = np.asarray(frequencies, dtype=np.int64)
    n = len(frequencies)
    lengths = np.zeros(n, dtype=np.int64)
    codes = np.zeros(n, dtype=np.int64)

    used = np.nonzero(frequencies)[0]
    if len(used) <= 1:
        if len(used):
            lengths[used[0]] = 1
        return lengths, codes, False

    # Standard two-queue-equivalent heap construction.  Ties break on the
    # smallest node id for determinism.
    heap = [(int(frequencies[i]), int(i)) for i in used]
    heapq.heapify(heap)
    parents: dict[int, tuple[int, int]] = {}
    next_id = n
    while len(heap) > 1:
        f1, n1 = heapq.heappop(heap)
        f2, n2 = heapq.heappop(heap)
        parents[next_id] = (n1, n2)
        heapq.heappush(heap, (f1 + f2, next_id))
        next_id += 1

    # Walk the tree to assign depths.
    stack = [(heap[0][1], 0)]
    while stack:
        node, depth = stack.pop()
        if node < n:
            lengths[node] = depth
        else:
            left, right = parents[node]
            stack.append((left, depth + 1))
            stack.append((right, depth + 1))

    # Kraft-sum length limiting (reference: src/compress/bitstream.rs:264-308).
    max_length = int(lengths.max())
    if max_length > length_limit:
        counts = np.zeros(16, dtype=np.int64)
        for length in lengths:
            if length:
                counts[min(int(length), length_limit)] += 1
        total = int(
            sum(int(counts[i]) << (length_limit - i) for i in range(1, length_limit + 1))
        )
        while total > (1 << length_limit):
            i = length_limit - 1
            while counts[i] == 0:
                i -= 1
            counts[i] -= 1
            counts[length_limit] -= 1
            counts[i + 1] += 2
            total -= 1
        # Reassign: least frequent symbols get the longest codes.
        order = np.argsort(frequencies, kind="stable")
        length = length_limit
        for i in order:
            if frequencies[i] > 0:
                while counts[length] == 0:
                    length -= 1
                lengths[i] = length
                counts[length] -= 1

    # Canonical, bit-reversed code assignment.
    code = 0
    for length in range(1, length_limit + 1):
        for i in np.nonzero(lengths == length)[0]:
            codes[i] = int(
                format(code, f"0{length}b")[::-1], 2
            )
            code += 1
        code <<= 1
    assert code == 2 << length_limit, "length-limited tree must be complete"

    return lengths, codes, True


def write_block(
    writer: BitWriter,
    data,
    base_index: int,
    symbols: list,
    eof: bool,
) -> None:
    """Serialize one dynamic-Huffman block (reference: src/compress/bitstream.rs:41-196)."""
    frequencies = np.zeros(286, dtype=np.int64)
    dist_frequencies = np.zeros(30, dtype=np.int64)
    frequencies[256] = 1

    arr = np.frombuffer(bytes(data), dtype=np.uint8) if not isinstance(data, np.ndarray) else data

    for sym in symbols:
        if isinstance(sym, LiteralRun):
            counts = np.bincount(
                arr[sym.start - base_index : sym.end - base_index], minlength=256
            )
            frequencies[:256] += counts
        else:
            frequencies[LENGTH_TO_SYMBOL[sym.length - 3]] += 1
            dist_frequencies[sym.dist_sym] += 1

    lengths, codes, _ = build_huffman_tree(frequencies, 15)
    dist_lengths, dist_codes, _ = build_huffman_tree(dist_frequencies, 15)

    num_litlen = 286
    while num_litlen > 257 and lengths[num_litlen - 1] == 0:
        num_litlen -= 1
    num_dist = 30
    while num_dist > 1 and dist_lengths[num_dist - 1] == 0:
        num_dist -= 1

    # Code-length code: plain 0..15 values, no 16/17/18 run-length encoding
    # (reference: src/compress/bitstream.rs:103-141).
    cl_freq = np.bincount(
        np.concatenate([lengths[:num_litlen], dist_lengths[:num_dist]]),
        minlength=19,
    )[:19]
    cl_lengths, cl_codes, _ = build_huffman_tree(cl_freq, 7)

    writer.write_bits(0b101 if eof else 0b100, 3)  # BFINAL + BTYPE=dynamic
    writer.write_bits(num_litlen - 257, 5)
    writer.write_bits(num_dist - 1, 5)
    writer.write_bits(15, 4)  # HCLEN: always send all 19 CL code lengths
    for j in range(19):
        writer.write_bits(int(cl_lengths[CLCL_ORDER[j]]), 3)
    for length in np.concatenate([lengths[:num_litlen], dist_lengths[:num_dist]]):
        writer.write_bits(int(cl_codes[length]), int(cl_lengths[length]))

    # Emit all block symbols through one vectorized pack.  Each token is
    # (value, nbits); literal runs gather codes per byte, back-references
    # pack code+extra into single tokens.
    values: list[np.ndarray] = []
    nbits: list[np.ndarray] = []
    codes_u = codes.astype(np.uint64)
    lengths_u = lengths.astype(np.uint64)
    for sym in symbols:
        if isinstance(sym, LiteralRun):
            chunk = arr[sym.start - base_index : sym.end - base_index]
            values.append(codes_u[chunk])
            nbits.append(lengths_u[chunk])
        else:
            lsym = int(LENGTH_TO_SYMBOL[sym.length - 3])
            len_extra = int(LENGTH_TO_LEN_EXTRA[sym.length - 3])
            v1 = int(codes[lsym]) | ((sym.length - 3) & ((1 << len_extra) - 1)) << int(
                lengths[lsym]
            )
            n1 = int(lengths[lsym]) + len_extra
            dist_extra = int(DIST_SYM_TO_DIST_EXTRA[sym.dist_sym])
            v2 = int(dist_codes[sym.dist_sym]) | (
                sym.distance - int(DIST_SYM_TO_DIST_BASE[sym.dist_sym])
            ) << int(dist_lengths[sym.dist_sym])
            n2 = int(dist_lengths[sym.dist_sym]) + dist_extra
            values.append(np.array([v1, v2], dtype=np.uint64))
            nbits.append(np.array([n1, n2], dtype=np.uint64))
    values.append(np.array([int(codes[256])], dtype=np.uint64))
    nbits.append(np.array([int(lengths[256])], dtype=np.uint64))

    writer.write_packed(np.concatenate(values), np.concatenate(nbits))
