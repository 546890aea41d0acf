"""Batch-flat text kernels: tokenize/shingle a whole Arrow batch into
flat numpy arrays + per-doc offsets, so every downstream signature
(MinHash, SimHash, language-ID, rolling hash) is computed with numpy
segment ops (``np.minimum.reduceat`` / ``np.add.reduceat`` /
``np.bincount``) instead of a Python loop over documents.

This is the vectorization layer the 100 TB path needs: per-batch cost
is a handful of Arrow/numpy kernel calls regardless of row count.
Tokenization is ASCII word semantics (runs of ``[a-z0-9_]`` on the
lowercased text) — documented engine semantics, reproducible in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fupi_ray.functions.hashing import mix64, mix64_into, stable_hash


def _combined(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def arrow_offsets(arr: pa.Array) -> np.ndarray:
    """Zero-copy int64 offsets ``(n+1,)`` of a varlen Arrow array
    (string/binary and their large_ variants).

    THE single place that branches on the physical offset width
    (string/binary = int32, large_ = int64 — Arrow promotes when a
    block exceeds 2 GiB) and asserts the buffer is wide enough, so a
    silent garbage-offset read is impossible (ADVICE r2: hardcoded
    ``.view(np.int32)``). Both the text-signature kernels and the
    multimodal byte path build on this.
    """
    n = len(arr)
    t = arr.type
    if pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        width, odt = 8, np.int64
    elif pa.types.is_string(t) or pa.types.is_binary(t):
        width, odt = 4, np.int32
    else:
        raise TypeError(f"expected a string/binary varlen array, got {t}")
    buf = arr.buffers()[1]
    if len(buf) < (arr.offset + n + 1) * width:
        raise AssertionError(
            f"offset buffer too small for {t}: {len(buf)} bytes, "
            f"need {(arr.offset + n + 1) * width}"
        )
    offsets = np.frombuffer(buf, dtype=odt)[arr.offset : arr.offset + n + 1]
    return offsets.astype(np.int64)


def string_byte_view(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy ``(offsets int64 (n+1,), bytes uint8)`` view of a
    string/large_string Array's value buffer."""
    arr = _combined(arr)
    if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
        raise TypeError(f"expected string/large_string, got {arr.type}")
    offsets = arrow_offsets(arr)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return offsets, data


def flat_words(
    texts, split_pattern: str = r"[^a-z0-9_]+"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize every doc in one Arrow call.

    Returns ``(words, doc_idx, lengths)``: a flat object array of all
    non-empty tokens, the doc index of each token, and per-doc token
    counts (``len(lengths) == num docs``).
    """
    arr = _combined(texts)
    n = len(arr)
    lower = pc.utf8_lower(pc.fill_null(arr, ""))
    lst = _combined(pc.split_pattern_regex(lower, split_pattern))
    raw_lengths = np.diff(np.asarray(lst.offsets))
    values = lst.values
    vlen = pc.utf8_length(values).to_numpy(zero_copy_only=False)
    mask = vlen > 0
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), raw_lengths)[mask]
    keep = values.filter(pa.array(mask))
    words = keep.to_numpy(zero_copy_only=False)
    lengths = np.bincount(doc_idx, minlength=n).astype(np.int64)
    return words, doc_idx, lengths


def flat_tokens(
    texts, split_pattern: str = r"\s+"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``flat_words`` without the lowercase step: raw whitespace-run
    tokens (the duckdb twin is ``regexp_extract_all(text, '\\S+')``).
    Returns ``(tokens, doc_idx, lengths)`` with empty tokens dropped.
    """
    arr = _combined(texts)
    n = len(arr)
    lst = _combined(pc.split_pattern_regex(pc.fill_null(arr, ""), split_pattern))
    raw_lengths = np.diff(np.asarray(lst.offsets))
    values = lst.values
    vlen = pc.utf8_length(values).to_numpy(zero_copy_only=False)
    mask = vlen > 0
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), raw_lengths)[mask]
    keep = values.filter(pa.array(mask))
    tokens = keep.to_numpy(zero_copy_only=False)
    lengths = np.bincount(doc_idx, minlength=n).astype(np.int64)
    return tokens, doc_idx, lengths


def char_windows(
    texts, width: int, stride: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Fixed-``width`` CHARACTER windows at ``stride`` offsets for every
    doc of a batch, fully vectorized (one fancy-index gather over the
    concatenated buffer — no per-row Python).

    Window semantics match SQL ``substring(text, 1 + k*stride, width)``
    for ``k = 0 .. floor((n_chars-width)/stride)``; docs shorter than
    ``width`` chars emit no window. Returns
    ``(wins (m, width*cw) uint8, doc_idx (m,) int64, n_win (n,) int64, cw)``
    where ``cw`` is the bytes-per-char of the window encoding: 1 when
    the whole batch is ASCII (byte==char, zero-copy from the Arrow
    value buffer), else 4 (UTF-32-LE — a 1:1 encoding of the character
    window, so byte equality of windows == character equality). The two
    encodings never mix inside one batch; callers that group windows
    across batches should treat ``wins`` rows as opaque keys of a
    consistent corpus (mixed-script corpora should force cw=4 upstream
    or hash full codepoints).
    """
    arr = _combined(pc.fill_null(_combined(texts), ""))
    n = len(arr)
    offsets, data = string_byte_view(arr)
    byte_len = np.diff(offsets)
    nchars = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    if n == 0 or bool((byte_len == nchars).all()):
        cw = 1
        buf = data[offsets[0] : offsets[-1]]
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(byte_len, out=starts[1:])
        base = starts[:-1]
        clen = byte_len
    else:
        # non-ASCII batch: one C-level join + UTF-32 re-encode (no
        # per-row Python); 4x the bytes but still a single buffer pass
        cw = 4
        joined = "".join(arr.to_pylist())
        buf = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint8)
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(nchars, out=starts[1:])
        base = starts[:-1] * 4
        clen = nchars
    n_win = np.where(clen >= width, (clen - width) // stride + 1, 0).astype(np.int64)
    m = int(n_win.sum())
    if m == 0:
        return np.empty((0, width * cw), np.uint8), np.empty(0, np.int64), n_win, cw
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), n_win)
    first = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_win, out=first[1:])
    k = np.arange(m, dtype=np.int64) - np.repeat(first[:-1], n_win)
    startb = base[doc_idx] + k * (stride * cw)
    wins = buf[startb[:, None] + np.arange(width * cw, dtype=np.int64)[None, :]]
    return wins, doc_idx, n_win, cw


def list_windows(
    list_col, width: int, stride: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """``char_windows`` for list<int32> columns (pre-tokenized
    sequences): fixed-``width`` TOKEN windows at ``stride`` offsets per
    row, zero-copy from the list values buffer. Returns
    ``(wins (m, width*4) uint8, doc_idx, n_win, 4)`` — window rows are
    the little-endian int32 bytes, so byte equality == token equality.
    """
    arr = _combined(list_col)
    n = len(arr)
    offsets = np.asarray(arr.offsets).astype(np.int64)
    values = arr.values
    if values.type != pa.int32():
        values = values.cast(pa.int32())
    ew = 4
    buf = np.frombuffer(values.buffers()[1], dtype=np.uint8)[
        (values.offset + offsets[0]) * ew : (values.offset + offsets[-1]) * ew
    ]
    lens = np.diff(offsets)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    base = starts[:-1] * ew
    n_win = np.where(lens >= width, (lens - width) // stride + 1, 0).astype(np.int64)
    m = int(n_win.sum())
    if m == 0:
        return np.empty((0, width * ew), np.uint8), np.empty(0, np.int64), n_win, ew
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), n_win)
    first = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_win, out=first[1:])
    k = np.arange(m, dtype=np.int64) - np.repeat(first[:-1], n_win)
    startb = base[doc_idx] + k * (stride * ew)
    wins = buf[startb[:, None] + np.arange(width * ew, dtype=np.int64)[None, :]]
    return wins, doc_idx, n_win, ew


def merged_cut_segments(
    n: int,
    doc_rep: np.ndarray,
    starts_flat: np.ndarray,
    width: int,
    lengths: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Merge fixed-``width`` cut spans and return the complement.

    ``doc_rep`` (non-decreasing row index per span) and ``starts_flat``
    (ascending within each row) name the spans; ``lengths`` is each
    row's element count. Returns ``(seg_doc, seg_s, seg_e, removed,
    n_spans)``: kept ``[s, e)`` element segments ordered by
    ``(row, s)`` plus per-row removed-element counts and merged-span
    counts. Rows without spans contribute no segments — callers keep
    them verbatim.
    """
    mtot = len(starts_flat)
    if mtot == 0:
        z = np.zeros(n, dtype=np.int64)
        e = np.empty(0, np.int64)
        return e, e, e, z, z
    new = np.ones(mtot, dtype=bool)
    if mtot > 1:
        same = doc_rep[1:] == doc_rep[:-1]
        new[1:] = ~same | (starts_flat[1:] > starts_flat[:-1] + width)
    isl_s = starts_flat[new]
    last = np.empty(mtot, dtype=bool)
    last[:-1] = new[1:]
    last[-1] = True
    isl_e = starts_flat[last] + width
    isl_doc = doc_rep[new]
    n_spans = np.bincount(isl_doc, minlength=n).astype(np.int64)
    removed = np.bincount(
        isl_doc, weights=(isl_e - isl_s).astype(np.float64), minlength=n
    ).astype(np.int64)
    isl_first = np.ones(len(isl_doc), dtype=bool)
    if len(isl_doc) > 1:
        isl_first[1:] = isl_doc[1:] != isl_doc[:-1]
    prev_end = np.empty(len(isl_doc), dtype=np.int64)
    prev_end[isl_first] = 0
    if len(isl_doc) > 1:
        prev_end[1:][~isl_first[1:]] = isl_e[:-1][~isl_first[1:]]
    isl_last = np.empty(len(isl_doc), dtype=bool)
    isl_last[:-1] = isl_first[1:]
    isl_last[-1] = True
    seg_doc = np.concatenate([isl_doc, isl_doc[isl_last]])
    seg_s = np.concatenate([prev_end, isl_e[isl_last]])
    seg_e = np.concatenate([isl_s, lengths[isl_doc[isl_last]]])
    keep = seg_e > seg_s
    seg_doc, seg_s, seg_e = seg_doc[keep], seg_s[keep], seg_e[keep]
    order = np.lexsort((seg_s, seg_doc))
    return seg_doc[order], seg_s[order], seg_e[order], removed, n_spans


def multirange_gather(
    buf: np.ndarray, abs_starts: np.ndarray, seg_lens: np.ndarray
) -> np.ndarray:
    """Gather ``buf[abs_starts[j] : abs_starts[j]+seg_lens[j]]`` for all
    segments as ONE fancy index (no per-segment Python)."""
    tot = int(seg_lens.sum())
    if tot == 0:
        return np.empty(0, dtype=buf.dtype)
    shift = np.zeros(len(seg_lens), dtype=np.int64)
    np.cumsum(seg_lens[:-1], out=shift[1:])
    idx = np.arange(tot, dtype=np.int64) + np.repeat(abs_starts - shift, seg_lens)
    return buf[idx]


def flat_word_hashes(
    texts, split_pattern: str = r"[^a-z0-9_]+"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``flat_words`` + one vectorized stable hash over all tokens.

    Returns ``(word_hashes uint64, doc_idx, lengths)``.
    """
    words, doc_idx, lengths = flat_words(texts, split_pattern)
    if len(words) == 0:
        return np.empty(0, np.uint64), doc_idx, lengths
    return stable_hash(words), doc_idx, lengths


def doc_shingle_hashes(
    W: np.ndarray, lengths: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Word ``k``-gram mix-chain hashes for every doc of a batch.

    ``W`` is the flat word-hash array (docs concatenated in order),
    ``lengths`` the per-doc word counts. A gram hash is the chain
    ``mix64(...mix64(w_p ^ w_{p+1}) ... ^ w_{p+k-1})``; docs with
    ``0 < len < k`` chain all their words into one gram; empty docs get
    the single gram ``0``. Every doc emits >= 1 gram.

    Returns ``(grams uint64, gram_starts int64)`` where
    ``gram_starts`` has ``n+1`` entries delimiting each doc's grams —
    ready for ``np.minimum.reduceat``.
    """
    n = len(lengths)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=starts[1:])
    L = int(starts[-1])
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lengths)

    parts_docs: list[np.ndarray] = []
    parts_vals: list[np.ndarray] = []

    # full windows: positions whose k-window stays inside one doc.
    # Chain with caller-free scratch (mix64_into): the naive
    # ``g = mix64(g ^ W[...])`` allocates ~5 full-length temporaries
    # per chain step — k-1 steps over the whole flat array made this
    # the dominant memory traffic of the signature pass.
    if L >= k:
        m = L - k + 1
        g = W[:m].copy()
        tmp = np.empty(m, dtype=np.uint64)
        for off in range(1, k):
            np.bitwise_xor(g, W[off : off + m], out=g)
            mix64_into(g, tmp, g)
        valid = doc_of[:m] == doc_of[k - 1 : k - 1 + m]
        parts_docs.append(doc_of[:m][valid])
        parts_vals.append(g[valid])

    # short docs (0 < len < k): one gram chaining all words,
    # vectorized per length class (at most k-1 classes)
    for l in range(1, k):
        sel = np.nonzero(lengths == l)[0]
        if len(sel) == 0:
            continue
        pos = starts[sel]
        gg = W[pos].copy()
        for off in range(1, l):
            gg = mix64(gg ^ W[pos + off])
        parts_docs.append(sel)
        parts_vals.append(gg)

    # empty docs: single gram 0
    empty = np.nonzero(lengths == 0)[0]
    if len(empty):
        parts_docs.append(empty)
        parts_vals.append(np.zeros(len(empty), dtype=np.uint64))

    gram_doc = np.concatenate(parts_docs) if parts_docs else np.empty(0, np.int64)
    grams = np.concatenate(parts_vals) if parts_vals else np.empty(0, np.uint64)
    order = np.argsort(gram_doc, kind="stable")
    grams = grams[order]
    counts = np.bincount(gram_doc, minlength=n)
    gram_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=gram_starts[1:])
    return grams, gram_starts


_SIG_CHUNK_VALUES = 40_000  # ~320 KB of uint64 word hashes per slice:
# the signature kernels are stacks of full-array numpy passes (gram
# chain, per-perm mixes, scatter-min), so each slice must stay
# PRIVATE-L2-resident — with a full box of workers sharing one L3,
# anything bigger streams DRAM on every pass (measured ~2x on the
# 32-cpu signature stage). Every kernel stage is per-doc, so slicing
# is bit-identical.


def chunked_signatures(
    W: np.ndarray,
    lengths: np.ndarray,
    salts: np.ndarray,
    k: int,
    sig_fn,
    chunk_values: int = _SIG_CHUNK_VALUES,
) -> np.ndarray:
    """(n, P) signature matrix = ``sig_fn(doc_shingle_hashes(...))``
    computed in cache-sized doc slices. ``W`` is the flat word-hash
    array for the whole batch; output is bit-identical to one
    monolithic call."""
    n = len(lengths)
    if n == 0:
        return np.empty((0, len(salts)), dtype=np.uint64)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=starts[1:])
    outs: list[np.ndarray] = []
    s = 0
    while s < n:
        e = int(np.searchsorted(starts, starts[s] + chunk_values, side="left"))
        e = max(min(e, n), s + 1)
        grams, gstarts = doc_shingle_hashes(
            W[starts[s] : starts[e]], lengths[s:e], k
        )
        outs.append(sig_fn(grams, gstarts, salts).T)
        s = e
    return outs[0] if len(outs) == 1 else np.vstack(outs)


def minhash_signatures(
    grams: np.ndarray, gram_starts: np.ndarray, salts: np.ndarray
) -> np.ndarray:
    """(num_perm, n) MinHash signature matrix via vectorized mixing +
    ``np.minimum.reduceat`` (no per-doc Python). Every doc must own at
    least one gram (``doc_shingle_hashes`` guarantees it)."""
    n = len(gram_starts) - 1
    P = len(salts)
    out = np.empty((P, n), dtype=np.uint64)
    if n == 0:
        return out
    seg = gram_starts[:-1]
    # perm-at-a-time with two reused scratch rows: the working set is
    # one gram array (L3-sized) instead of a (chunk, G) tile plus ~10
    # mix64 temporaries — same math, memory traffic drops several-fold
    # (this kernel is bandwidth-bound; measured ~3x on 360k grams)
    G = len(grams)
    buf = np.empty(G, dtype=np.uint64)
    tmp = np.empty(G, dtype=np.uint64)
    for p in range(P):
        np.bitwise_xor(grams, salts[p], out=buf)
        mix64_into(buf, tmp, buf)
        np.minimum.reduceat(buf, seg, out=out[p])
    return out


_OPH_EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)
_OPH_C = np.uint64(0x9E3779B97F4A7C15)  # densification tie-break stride


def minhash_signatures_oph(
    grams: np.ndarray, gram_starts: np.ndarray, salts: np.ndarray
) -> np.ndarray:
    """(num_perm, n) one-permutation MinHash with rotation
    densification — same contract as ``minhash_signatures`` (P(lane
    equality) ≈ Jaccard; identical gram sets ⇒ identical signatures)
    at ~1/P the compute.

    Classic MinHash mixes every gram once PER permutation (P bandwidth
    passes over the gram array — the kernel is memory-bound). One-
    permutation hashing (Li, Owen & Zhang, NIPS 2012) mixes each gram
    ONCE, partitions the hash space into P buckets (``h % P``) and
    takes the per-doc minimum per bucket; empty buckets borrow the
    value of the nearest filled bucket to the right (circular) plus
    ``distance * C`` (rotation densification, Shrivastava & Li, ICML
    2014), so sparse docs still compare lane-by-lane. ``salts[0]``
    seeds the single permutation; the remaining salts are unused but
    keep the call signature interchangeable."""
    P = len(salts)
    n = len(gram_starts) - 1
    if n == 0:
        return np.empty((P, n), dtype=np.uint64)
    g = mix64(grams ^ salts[0])
    b = (g % np.uint64(P)).astype(np.int64)
    lengths = np.diff(gram_starts)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
    out = np.full(n * P, _OPH_EMPTY, dtype=np.uint64)
    np.minimum.at(out, doc_of * P + b, g)
    out = out.reshape(n, P)
    filled = out != _OPH_EMPTY
    if not filled.all():
        # densify only the docs that have empty lanes: nearest filled
        # lane to the right (circular) found in ONE suffix-min scan
        # over a doubled lane axis — bit-identical to the rotation
        # loop (value of that lane + distance * C) at O(1) passes
        # instead of O(P) full-matrix rolls
        rows = np.flatnonzero(~filled.all(axis=1))
        f = filled[rows]
        v = out[rows]
        pos = np.arange(2 * P, dtype=np.int64)
        ff = np.concatenate([f, f], axis=1)
        cand = np.where(ff, pos[None, :], np.int64(3 * P))
        near = np.minimum.accumulate(cand[:, ::-1], axis=1)[:, ::-1][:, :P]
        dist = (near - pos[None, :P]).astype(np.uint64)
        src = np.take_along_axis(v, (near % P).astype(np.int64), axis=1)
        with np.errstate(over="ignore"):
            out[rows] = np.where(f, v, src + _OPH_C * dist)
    return out.T


def simhash_values(W: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """64-bit SimHash per doc, batched: one (L, 64) bit matrix +
    ``np.add.reduceat`` over doc segments. Empty docs hash to 0."""
    n = len(lengths)
    sh = np.zeros(n, dtype=np.uint64)
    nz = np.nonzero(lengths > 0)[0]
    if len(nz) == 0:
        return sh
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=starts[1:])
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((W[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
    cnt = np.add.reduceat(bits, starts[nz], axis=0)  # (n_nz, 64)
    v = 2 * cnt - lengths[nz][:, None]
    with np.errstate(over="ignore"):
        sh[nz] = ((v > 0).astype(np.uint64) << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    return sh


def charset_bitmask(texts) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc distinct-byte 256-bit bitmask over the lowercased UTF-8
    text, fully vectorized (reads the Arrow value buffer directly).

    Returns ``(mask (n,4) uint64, sig (n,) uint64)`` where ``sig`` is a
    mix of the 4 mask words — equal masks <=> equal sigs is NOT
    guaranteed by sig alone, so always compare the mask words too.

    For ASCII text the byte set equals the character set, so Jaccard
    over these bitmasks matches duckdb's ``jaccard(lower(a), lower(b))``
    exactly. Non-ASCII text degrades to UTF-8-byte granularity
    (documented engine semantics).
    """
    arr = _combined(texts)
    n = len(arr)
    lower = _combined(pc.utf8_lower(pc.fill_null(arr, "")))
    offsets, data = string_byte_view(lower)
    codes = data[offsets[0] : offsets[-1]]
    lengths = np.diff(offsets)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
    # unique (doc, byte) pairs via one combined-key unique
    key = (doc_idx.astype(np.uint64) << np.uint64(8)) | codes.astype(np.uint64)
    uniq = np.unique(key)
    udoc = (uniq >> np.uint64(8)).astype(np.int64)
    ucode = (uniq & np.uint64(0xFF)).astype(np.int64)
    mask = np.zeros((n, 4), dtype=np.uint64)
    flat = mask.reshape(-1)
    lin = udoc * 4 + (ucode >> 6)
    np.bitwise_or.at(flat, lin, np.uint64(1) << (ucode & 63).astype(np.uint64))
    sig = mix64(mask[:, 0])
    for j in range(1, 4):
        sig = mix64(sig ^ mask[:, j])
    return mask, sig


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR)."""
    with np.errstate(over="ignore"):
        x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
        x = (x & np.uint64(0x3333333333333333)) + (
            (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
        )
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def rolling_min_hashes(texts, k: int, pows: np.ndarray) -> np.ndarray:
    """Winnowing-min rolling polynomial hash per doc, batched: one
    global shifted multiply-add over the concatenated byte buffer with
    doc-boundary masking, then ``np.minimum.reduceat`` per doc.
    Docs shorter than ``k`` bytes get 0."""
    arr = _combined(texts)
    n = len(arr)
    lower = _combined(pc.utf8_lower(pc.fill_null(arr, "")))
    offsets, data = string_byte_view(lower)
    codes = data[offsets[0] : offsets[-1]].astype(np.uint64)
    lengths = np.diff(offsets)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=starts[1:])
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
    out = np.zeros(n, dtype=np.uint64)
    L = int(starts[-1])
    if L < k:
        return out
    m = L - k + 1
    with np.errstate(over="ignore"):
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            acc += codes[j : j + m] * pows[j]
    valid = doc_of[:m] == doc_of[k - 1 : k - 1 + m]
    vdoc = doc_of[:m][valid]
    vacc = acc[valid]
    if len(vdoc) == 0:
        return out
    # per-doc min over contiguous segments
    seg_counts = np.bincount(vdoc, minlength=n)
    nz = np.nonzero(seg_counts > 0)[0]
    seg_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(seg_counts, out=seg_starts[1:])
    out[nz] = np.minimum.reduceat(vacc, seg_starts[nz])
    return out
