"""Vectorized similarity kernels used inside pandas/Arrow UDF batches.

These are the verification-stage kernels — the Spark analogue of the
reference's Cython merge-scan measures
(/root/reference/py_stringsimjoin/similarity_measure/jaccard.pyx:4-21,
cosine.pyx, dice.pyx, edit_distance.pyx:13-47). All operate on a whole Arrow
batch at once with numpy — no per-row Python in the formulas; the only Python
loops are over string-length (Levenshtein DP columns) or batch assembly.

Empty-set semantics (SURVEY.md §1.2): sim(∅,∅)=1.0 for jaccard/cosine/dice/
overlap-coefficient, sim(∅,X)=0.0. Scores are float64, NOT rounded
(the reference's default Cython kernels don't round; set_sim_join_cy.pyx:132).
"""

from __future__ import annotations

import numpy as np

SET_SIM_MEASURES = ("jaccard", "cosine", "dice", "overlap", "overlap_coefficient")

_SHIFT = np.int64(1) << np.int64(32)


def _flatten(arrays) -> tuple[np.ndarray, np.ndarray]:
    """list-of-int-arrays -> (flat int64 keys pair_id*2^32+token, lengths)."""
    n = len(arrays)
    lens = np.fromiter((0 if a is None else len(a) for a in arrays), np.int64, n)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64), lens
    flat = np.concatenate([np.asarray(a, dtype=np.int64) for a in arrays if a is not None and len(a)])
    # token ranks ≥ 2^32 would silently alias across pair ids — fail loudly
    # instead (a >4.29B-distinct-token vocabulary needs a wider encoding)
    if flat.size and int(flat.max()) >= int(_SHIFT):
        raise OverflowError(
            "token rank >= 2^32 overflows the (pair_id, rank) int64 key space"
        )
    ids = np.repeat(np.arange(n, dtype=np.int64), lens)
    return ids * _SHIFT + flat, lens


def batch_overlap(l_arrays, r_arrays) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact set-overlap per pair for a batch.

    ``l_arrays[i]`` / ``r_arrays[i]`` are sorted, duplicate-free int token-id
    arrays (token ranks). Returns (overlap, l_size, r_size) int64 arrays.
    Fully vectorized: encodes (pair_id, token) into one int64 key space and
    intersects the two key sets in one shot.
    """
    n = len(l_arrays)
    lk, l_lens = _flatten(l_arrays)
    rk, r_lens = _flatten(r_arrays)
    if len(lk) == 0 or len(rk) == 0:
        return np.zeros(n, np.int64), l_lens, r_lens
    common = np.intersect1d(lk, rk, assume_unique=True)
    overlap = np.bincount((common // _SHIFT).astype(np.int64), minlength=n).astype(np.int64)
    return overlap, l_lens, r_lens


def score_from_overlap(measure: str, overlap, l_size, r_size) -> np.ndarray:
    """Set-sim score formulas on vectorized overlap/sizes (float64)."""
    o = overlap.astype(np.float64)
    ls = l_size.astype(np.float64)
    rs = r_size.astype(np.float64)
    both_empty = (l_size == 0) & (r_size == 0)
    any_empty = (l_size == 0) | (r_size == 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        if measure == "jaccard":
            s = o / (ls + rs - o)
        elif measure == "cosine":
            s = o / np.sqrt(ls * rs)
        elif measure == "dice":
            s = 2.0 * o / (ls + rs)
        elif measure == "overlap":
            return o  # integer-valued; no empty-empty special case
        elif measure == "overlap_coefficient":
            s = o / np.minimum(ls, rs)
        else:
            raise ValueError(f"unknown measure {measure!r}")
    s = np.where(any_empty, 0.0, s)
    s = np.where(both_empty, 1.0, s)
    return s


def batch_set_sim(measure: str, l_arrays, r_arrays) -> np.ndarray:
    overlap, ls, rs = batch_overlap(l_arrays, r_arrays)
    return score_from_overlap(measure, overlap, ls, rs)


def _encode_strings(strs, max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """list[str] -> (codepoint matrix padded with -1, lengths)."""
    n = len(strs)
    lens = np.fromiter((len(s) for s in strs), np.int64, n)
    mat = np.full((n, max_len), -1, dtype=np.int64)
    for i, s in enumerate(strs):  # per-row fill; cheap vs the DP below
        if s:
            mat[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    return mat, lens


def batch_levenshtein(l_strs, r_strs) -> np.ndarray:
    """Levenshtein distance for a batch of string pairs.

    Vectorized across the batch: the DP loops run over string positions
    (<= max length), each step a numpy op over all pairs at once. The
    row-insertion dependency is resolved with the slope-1 running-minimum
    trick: e[j] = min(t[j], e[j-1]+1)  ==  cummin(t[j]-j)+j.
    """
    n = len(l_strs)
    if n == 0:
        return np.empty(0, np.int64)
    l_strs = ["" if s is None else s for s in l_strs]
    r_strs = ["" if s is None else s for s in r_strs]
    la = max((len(s) for s in l_strs), default=0)
    lb = max((len(s) for s in r_strs), default=0)
    A, alen = _encode_strings(l_strs, la)
    B, blen = _encode_strings(r_strs, lb)
    # B padded with -2 so pad never equals A's -1 pad (no phantom matches)
    B[B == -1] = -2

    prev = np.broadcast_to(np.arange(lb + 1, dtype=np.int64), (n, lb + 1)).copy()
    out = np.empty(n, dtype=np.int64)
    done = alen == 0
    out[done] = blen[done]
    jgrid = np.arange(1, lb + 1, dtype=np.int64)
    for i in range(1, la + 1):
        cost = (A[:, i - 1 : i] != B).astype(np.int64)  # (n, lb)
        t = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        # fold in cur[j-1]+1 chain: seed with cur[0]=i at j=0
        shifted = np.concatenate(
            [np.full((n, 1), i, dtype=np.int64), t - jgrid], axis=1
        )
        cur_rest = np.minimum.accumulate(shifted, axis=1)[:, 1:] + jgrid
        cur = np.concatenate([np.full((n, 1), i, dtype=np.int64), cur_rest], axis=1)
        newly = alen == i
        if newly.any():
            out[newly] = cur[newly, blen[newly]]
        prev = cur
    return out


def batch_cosine_embeddings(q: np.ndarray, X: np.ndarray) -> np.ndarray:
    """Cosine similarity matrix between query rows q (m,d) and X (n,d)."""
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    return qn @ xn.T


def _encode_bytes(strs, max_len: int, pad: int) -> tuple[np.ndarray, np.ndarray]:
    """list[str] -> (UTF-8 byte matrix padded with ``pad``, byte lengths)."""
    n = len(strs)
    bss = [b"" if s is None else s.encode("utf-8") for s in strs]
    lens = np.fromiter((len(b) for b in bss), np.int64, n)  # FULL lengths
    mat = np.full((n, max(max_len, 1)), pad, dtype=np.int16)
    for i, b in enumerate(bss):  # per-row fill; cheap vs the position loop
        b = b[:max_len]
        if b:
            mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return mat, lens


def batch_jaro(l_strs, r_strs) -> np.ndarray:
    """Jaro similarity for a batch of string pairs, DuckDB/rapidfuzz-parity.

    Semantics pinned against DuckDB's ``jaro_similarity`` (itself
    rapidfuzz-based) so apply_matcher results oracle exactly:

    * operates on UTF-8 BYTES (multi-byte codepoints count per byte),
    * either side empty (or NULL) -> 0.0 — including both-empty,
    * match window = max(0, max(|P|,|T|)//2 - 1); greedy first-untaken match,
    * transpositions t = (#mismatched matched positions) // 2,
    * score = (m/|P| + m/|T| + (m-t)/m) / 3 in exactly that float64 order.

    Vectorized across the batch like ``batch_levenshtein``: the only Python
    loops are over byte POSITIONS (<= max length) and batch assembly; each
    step is a numpy op over all pairs at once, so cost is O(n * la * lb)
    flat numpy work, no per-pair Python in the scan.
    """
    n = len(l_strs)
    if n == 0:
        return np.empty(0, np.float64)
    la_max = max((0 if s is None else len(s.encode("utf-8")) for s in l_strs), default=0)
    lb_max = max((0 if s is None else len(s.encode("utf-8")) for s in r_strs), default=0)
    A, alen = _encode_bytes(l_strs, la_max, pad=-1)
    B, blen = _encode_bytes(r_strs, lb_max, pad=-2)

    bound = np.maximum(np.maximum(alen, blen) // 2 - 1, 0)  # (n,)
    taken = np.zeros_like(B, dtype=bool)  # matched positions of T
    match_j = np.full((n, max(la_max, 1)), -1, dtype=np.int64)
    jidx = np.arange(B.shape[1], dtype=np.int64)
    for i in range(la_max):
        active = alen > i
        if not active.any():
            break
        lo = np.maximum(0, i - bound)[:, None]
        hi = np.minimum(blen, i + bound + 1)[:, None]
        cand = (B == A[:, i : i + 1]) & ~taken & (jidx >= lo) & (jidx < hi)
        cand[~active] = False
        has = cand.any(axis=1)
        first = np.argmax(cand, axis=1)  # first True per row (valid where has)
        rows = np.flatnonzero(has)
        taken[rows, first[rows]] = True
        match_j[rows, i] = first[rows]

    m = (match_j >= 0).sum(axis=1).astype(np.int64)
    # transpositions: k-th matched byte of P (in P order) vs k-th matched
    # byte of T (in T order); ragged-compare via cumsum scatter
    W = max(min(la_max, lb_max), 1)
    amask = match_j >= 0
    matA = np.full((n, W), -1, dtype=np.int16)
    ra, ca = np.nonzero(amask)
    ka = np.cumsum(amask, axis=1) - 1
    matA[ra, ka[ra, ca]] = A[ra, ca]
    matB = np.full((n, W), -3, dtype=np.int16)
    rb, cb = np.nonzero(taken)
    kb = np.cumsum(taken, axis=1) - 1
    matB[rb, kb[rb, cb]] = B[rb, cb]
    valid = matA != -1
    diffs = ((matA != matB) & valid).sum(axis=1).astype(np.int64)
    t = diffs // 2

    mf = m.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = (
            mf / alen.astype(np.float64)
            + mf / blen.astype(np.float64)
            + (mf - t.astype(np.float64)) / mf
        ) / 3.0
    sim = np.where((m == 0) | (alen == 0) | (blen == 0), 0.0, sim)
    return sim


def batch_jaro_winkler(l_strs, r_strs, prefix_weight: float = 0.1) -> np.ndarray:
    """Jaro-Winkler, DuckDB/rapidfuzz-parity (see ``batch_jaro``).

    Boost applies only when jaro > 0.7 (rapidfuzz's boost threshold):
    ``sim + prefix * weight * (1 - sim)`` with the common-prefix byte count
    capped at 4 — float op order pinned against DuckDB output.
    """
    sim = batch_jaro(l_strs, r_strs)
    n = len(l_strs)
    if n == 0:
        return sim
    A, alen = _encode_bytes(l_strs, 4, pad=-1)
    B, blen = _encode_bytes(r_strs, 4, pad=-2)
    eq = A[:, :4] == B[:, :4]
    prefix = np.minimum(
        np.cumprod(eq, axis=1).sum(axis=1),
        np.minimum(np.minimum(alen, blen), 4),
    ).astype(np.float64)
    boosted = sim + prefix * prefix_weight * (1.0 - sim)
    return np.where(sim > 0.7, boosted, sim)


def batch_monge_elkan(l_tok_lists, r_tok_lists, inner: str = "jaro_winkler") -> np.ndarray:
    """Monge-Elkan hybrid similarity for a batch of token-bag pairs.

    ME(L, R) = (1/|L|) * sum_{a in L} max_{b in R} inner(a, b) — the
    classic hybrid measure (py_stringmatching ``MongeElkan``; the reference
    consumes such measures through apply_matcher's arbitrary-function
    surface, /root/reference/py_stringsimjoin/matcher/apply_matcher.py:77).
    Asymmetric by definition: the average runs over the LEFT bag.

    * ``inner``: "jaro_winkler" (py_stringmatching's default secondary
      measure) or "jaro" — both bit-parity vs DuckDB's
      jaro_winkler_similarity / jaro_similarity (see ``batch_jaro``).
    * Both bags empty -> 1.0; exactly one empty -> 0.0 (the engine-wide
      empty convention, functions/sims.score_from_overlap).
    * Bit-reproducible across engines: max is arithmetic-free, the sum is a
      SEQUENTIAL fold in left-bag order (never pairwise/np.sum — numpy's
      pairwise summation would drift ulps vs DuckDB's ``list_reduce``
      fold), and the final divide is one correctly-rounded IEEE op.

    Vectorized across the batch: all cross-pairs (a, b) of every row are
    flattened into ONE ``batch_jaro[_winkler]`` call (flat numpy work, no
    per-pair Python in the scan); the segment max / fold run over the few
    tokens per row.
    """
    kern = {"jaro": batch_jaro, "jaro_winkler": batch_jaro_winkler}[inner]
    n = len(l_tok_lists)
    out = np.empty(n, dtype=np.float64)
    flat_l: list = []
    flat_r: list = []
    spans = []  # (row, n_l_tokens, n_r_tokens) for rows needing the kernel
    for i in range(n):
        lt = l_tok_lists[i] or []
        rt = r_tok_lists[i] or []
        if not lt and not rt:
            out[i] = 1.0
        elif not lt or not rt:
            out[i] = 0.0
        else:
            spans.append((i, len(lt), len(rt)))
            for a in lt:
                flat_l.extend([a] * len(rt))
                flat_r.extend(rt)
    if not spans:
        return out
    sims = kern(flat_l, flat_r)
    pos = 0
    for i, nl, nr in spans:
        block = sims[pos : pos + nl * nr].reshape(nl, nr)
        pos += nl * nr
        acc = 0.0
        for v in block.max(axis=1):  # sequential fold in left-bag order
            acc += float(v)
        out[i] = acc / nl
    return out


_NEG = -1.0e30  # -inf stand-in: survives arithmetic without NaN


def batch_needleman_wunsch(
    l_strs, r_strs, gap_cost: float = 1.0,
    match: float = 1.0, mismatch: float = 0.0,
) -> np.ndarray:
    """Global-alignment (Needleman–Wunsch) raw score for a batch of pairs.

    Classic DP with linear gap penalty; character similarity is
    ``match``/``mismatch`` on code-point equality (the identity sim_func
    py_stringmatching defaults to). Scores are raw (can be negative);
    borders are ``-i*gap_cost``. Vectorized across the batch like
    ``batch_levenshtein``: the in-row max chain ``cur[j] =
    max(t[j], cur[j-1]-g)`` is a running max of ``t[j]+j*g`` minus ``j*g``.
    None -> treated as ''.
    """
    n = len(l_strs)
    if n == 0:
        return np.empty(0, np.float64)
    g = float(gap_cost)
    l_strs = ["" if s is None else s for s in l_strs]
    r_strs = ["" if s is None else s for s in r_strs]
    la = max((len(s) for s in l_strs), default=0)
    lb = max((len(s) for s in r_strs), default=0)
    A, alen = _encode_strings(l_strs, la)
    B, blen = _encode_strings(r_strs, lb)
    B[B == -1] = -2

    jgrid = np.arange(1, lb + 1, dtype=np.float64)
    prev = np.broadcast_to(
        -g * np.arange(lb + 1, dtype=np.float64), (n, lb + 1)
    ).copy()
    out = np.empty(n, dtype=np.float64)
    done = alen == 0
    out[done] = -g * blen[done]
    for i in range(1, la + 1):
        sim = np.where(A[:, i - 1 : i] == B, match, mismatch)  # (n, lb)
        t = np.maximum(prev[:, :-1] + sim, prev[:, 1:] - g)
        w = np.concatenate(
            [np.full((n, 1), -g * i), t + jgrid * g], axis=1
        )
        run = np.maximum.accumulate(w, axis=1)
        cur = np.concatenate(
            [np.full((n, 1), -g * i), run[:, 1:] - jgrid * g], axis=1
        )
        newly = alen == i
        if newly.any():
            out[newly] = cur[newly, blen[newly]]
        prev = cur
    return out


def batch_smith_waterman(
    l_strs, r_strs, gap_cost: float = 1.0,
    match: float = 1.0, mismatch: float = 0.0,
) -> np.ndarray:
    """Local-alignment (Smith–Waterman) raw score for a batch of pairs.

    Same DP as NW with a zero floor per cell; the score is the max over
    the VALID region of each pair's matrix (padding columns/rows are
    masked out — the batch is rectangular, the matrices are not).
    """
    n = len(l_strs)
    if n == 0:
        return np.empty(0, np.float64)
    g = float(gap_cost)
    l_strs = ["" if s is None else s for s in l_strs]
    r_strs = ["" if s is None else s for s in r_strs]
    la = max((len(s) for s in l_strs), default=0)
    lb = max((len(s) for s in r_strs), default=0)
    A, alen = _encode_strings(l_strs, la)
    B, blen = _encode_strings(r_strs, lb)
    B[B == -1] = -2

    jgrid = np.arange(1, lb + 1, dtype=np.float64)
    jfull = np.arange(lb + 1, dtype=np.int64)
    colmask = jfull[None, :] <= blen[:, None]
    prev = np.zeros((n, lb + 1), dtype=np.float64)
    best = np.zeros(n, dtype=np.float64)
    for i in range(1, la + 1):
        sim = np.where(A[:, i - 1 : i] == B, match, mismatch)
        t = np.maximum(prev[:, :-1] + sim, prev[:, 1:] - g)
        u = np.maximum(t, 0.0)
        w = np.concatenate([np.zeros((n, 1)), u + jgrid * g], axis=1)
        run = np.maximum.accumulate(w, axis=1)
        cur = np.concatenate(
            [np.zeros((n, 1)), run[:, 1:] - jgrid * g], axis=1
        )
        cur = np.maximum(cur, 0.0)
        active = alen >= i
        rowmax = np.max(np.where(colmask, cur, 0.0), axis=1)
        best = np.where(active, np.maximum(best, rowmax), best)
        prev = cur
    return best


def batch_affine_gap(
    l_strs, r_strs, gap_start: float = 1.0, gap_continuation: float = 0.5,
    match: float = 1.0, mismatch: float = 0.0,
) -> np.ndarray:
    """Global alignment with affine gaps (Gotoh) for a batch of pairs.

    Three-state DP: M (match/mismatch), X (gap in the right string,
    vertical), Y (gap in the left string, horizontal); opening a gap costs
    ``gap_start``, extending it ``gap_continuation``; direction switches
    pass through M (standard Gotoh). Score = max(M, X, Y) at the full
    prefix lengths. Y's in-row recurrence ``Y[j] = max(M[j-1]-gs,
    Y[j-1]-gc)`` vectorizes with the running-max slope trick.
    """
    n = len(l_strs)
    if n == 0:
        return np.empty(0, np.float64)
    gs, gc = float(gap_start), float(gap_continuation)
    l_strs = ["" if s is None else s for s in l_strs]
    r_strs = ["" if s is None else s for s in r_strs]
    la = max((len(s) for s in l_strs), default=0)
    lb = max((len(s) for s in r_strs), default=0)
    A, alen = _encode_strings(l_strs, la)
    B, blen = _encode_strings(r_strs, lb)
    B[B == -1] = -2

    jgrid = np.arange(1, lb + 1, dtype=np.float64)
    # row 0: M=[0,-inf...], X=-inf, Y[j>=1]=-gs-(j-1)*gc
    M = np.full((n, lb + 1), _NEG)
    M[:, 0] = 0.0
    X = np.full((n, lb + 1), _NEG)
    Y = np.full((n, lb + 1), _NEG)
    if lb:
        Y[:, 1:] = -gs - (jgrid - 1.0) * gc

    def _final(Mr, Xr, Yr, rows):
        sc = np.maximum(np.maximum(Mr, Xr), Yr)
        return sc[rows, blen[rows]]

    out = np.empty(n, dtype=np.float64)
    done = alen == 0
    if done.any():
        out[done] = _final(M, X, Y, np.flatnonzero(done))
    for i in range(1, la + 1):
        sim = np.where(A[:, i - 1 : i] == B, match, mismatch)
        Mi = np.full((n, lb + 1), _NEG)
        Mi[:, 1:] = sim + np.maximum(np.maximum(M, X), Y)[:, :-1]
        Xi = np.maximum(M - gs, X - gc)
        w = np.concatenate(
            [np.full((n, 1), _NEG), Mi[:, :-1] - gs + jgrid * gc], axis=1
        )
        run = np.maximum.accumulate(w, axis=1)
        Yi = np.full((n, lb + 1), _NEG)
        if lb:
            Yi[:, 1:] = run[:, 1:] - jgrid * gc
        newly = alen == i
        if newly.any():
            out[newly] = _final(Mi, Xi, Yi, np.flatnonzero(newly))
        M, X, Y = Mi, Xi, Yi
    return out


def batch_soft_tfidf(
    l_toks, l_ws, r_toks, r_ws,
    inner_threshold: float = 0.9, inner: str = "jaro_winkler",
) -> np.ndarray:
    """Soft TF-IDF (Cohen–Ravikumar–Fienberg) for a batch of pairs.

    score(L, R) = Σ_{x ∈ L, m(x) > θ}  (w(x)/‖L‖) · (w(ŷ)/‖R‖) · m(x)

    where m(x) = max_{y∈R} inner(x, y), ŷ its argmax, and ‖·‖ the L2 norm
    of the side's token weights. Caller supplies per-row token arrays with
    ALIGNED weight arrays, tokens SORTED ascending — every fold here (the
    norms' Σw², the score Σ) runs sequentially in that order, and the
    argmax tie-break is the code-point-largest y, so the result is
    bit-identical to the driver oracle's SQL formulation (list_reduce
    folds over ``ORDER BY tok`` lists + ``max(y) WHERE s = max(s)``).

    Empty conventions follow the engine: both sides empty -> 1.0, one
    empty -> 0.0. The inner kernel runs once over the flattened cross
    pairs of the whole batch (same shape as ``batch_monge_elkan``).
    """
    import math

    kern = {"jaro": batch_jaro, "jaro_winkler": batch_jaro_winkler}[inner]
    n = len(l_toks)
    out = np.empty(n, dtype=np.float64)
    flat_l: list = []
    flat_r: list = []
    spans = []
    for i in range(n):
        lt = l_toks[i] if l_toks[i] is not None else []
        rt = r_toks[i] if r_toks[i] is not None else []
        if len(lt) == 0 and len(rt) == 0:
            out[i] = 1.0
        elif len(lt) == 0 or len(rt) == 0:
            out[i] = 0.0
        else:
            spans.append((i, len(lt), len(rt)))
            for a in lt:
                flat_l.extend([a] * len(rt))
                flat_r.extend(rt)
    if not spans:
        return out
    sims = kern(flat_l, flat_r)
    pos = 0
    for i, nl, nr in spans:
        block = sims[pos : pos + nl * nr].reshape(nl, nr)
        pos += nl * nr
        lt, lw = l_toks[i], l_ws[i]
        rt, rw = r_toks[i], r_ws[i]
        nrm_l = 0.0
        for w in lw:
            nrm_l = nrm_l + w * w
        nrm_l = math.sqrt(nrm_l)
        nrm_r = 0.0
        for w in rw:
            nrm_r = nrm_r + w * w
        nrm_r = math.sqrt(nrm_r)
        acc = 0.0
        for k in range(nl):
            row = block[k]
            m = row.max()
            if m > inner_threshold:
                # tie-break: code-point-largest matching token
                best_j = -1
                for j in range(nr):
                    if row[j] == m and (best_j < 0 or rt[j] > rt[best_j]):
                        best_j = j
                acc = acc + ((lw[k] / nrm_l) * (rw[best_j] / nrm_r)) * float(m)
        out[i] = acc
    return out

def batch_tversky(l_arrays, r_arrays, alpha: float = 0.5, beta: float = 0.5) -> np.ndarray:
    """Tversky index for a batch of token-set pairs (py_stringmatching
    ``TverskyIndex``; reference consumes it through apply_matcher's
    arbitrary-function surface, apply_matcher.py:77).

    T(A, B) = |A∩B| / (|A∩B| + α|A\\B| + β|B\\A|). α=β=0.5 degenerates to
    Dice, α=β=1 to Jaccard; the parameterized asymmetric form is the reason
    to ship it. Empty conventions follow the engine-wide rule
    (both empty → 1.0, exactly one empty → 0.0).
    """
    overlap, l_size, r_size = batch_overlap(l_arrays, r_arrays)
    o = overlap.astype(np.float64)
    ls = l_size.astype(np.float64)
    rs = r_size.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        s = o / (o + alpha * (ls - o) + beta * (rs - o))
    s = np.where((l_size == 0) | (r_size == 0), 0.0, s)
    s = np.where((l_size == 0) & (r_size == 0), 1.0, s)
    return s


def batch_bag_distance(l_strs, r_strs) -> np.ndarray:
    """Multiset (bag) distance per string pair: max(|A\\B|, |B\\A|) over
    character multisets (py_stringmatching ``BagDistance``; a cheap lower
    bound on edit distance — Bartolini/Ciaccia/Patella's bag filter).

    Returns the raw integer distance as float64 (same contract as the
    ``edit_distance`` measure: callers threshold with ``<=``).

    Vectorized: one pass builds a (row, char) count matrix for each side
    over the batch-local alphabet via ``np.add.at``; the common multiset
    size is ``min(counts_l, counts_r).sum(axis=1)``.
    """
    n = len(l_strs)
    lens_l = np.fromiter((len(s or "") for s in l_strs), np.int64, n)
    lens_r = np.fromiter((len(s or "") for s in r_strs), np.int64, n)
    concat = "".join(s or "" for s in l_strs) + "".join(s or "" for s in r_strs)
    if not concat:
        return np.zeros(n, dtype=np.float64)
    codes = np.frombuffer(concat.encode("utf-32-le"), dtype=np.uint32)
    alphabet, compact = np.unique(codes, return_inverse=True)
    v = len(alphabet)
    total_l = int(lens_l.sum())
    rows = np.concatenate([
        np.repeat(np.arange(n, dtype=np.int64), lens_l),
        np.repeat(np.arange(n, dtype=np.int64), lens_r),
    ])
    cl = np.zeros((n, v), dtype=np.int64)
    cr = np.zeros((n, v), dtype=np.int64)
    np.add.at(cl, (rows[:total_l], compact[:total_l]), 1)
    np.add.at(cr, (rows[total_l:], compact[total_l:]), 1)
    common = np.minimum(cl, cr).sum(axis=1)
    return np.maximum(lens_l - common, lens_r - common).astype(np.float64)


def batch_generalized_jaccard(
    l_tok_lists, r_tok_lists, inner: str = "jaro", threshold: float = 0.5
) -> np.ndarray:
    """Generalized Jaccard hybrid similarity for a batch of token-set pairs
    (py_stringmatching ``GeneralizedJaccard``: inner sim_func default jaro,
    threshold 0.5; reference surface apply_matcher.py:77).

    Token pairs with inner(a,b) ≥ threshold are greedily matched in
    descending score order, each token used at most once; with M the
    matched set, GJ = Σ_{(a,b)∈M} inner(a,b) / (|L| + |R| - |M|).
    Both sides empty → 1.0, exactly one empty → 0.0.

    Vectorized like ``batch_monge_elkan``: every row's cross-pairs flatten
    into ONE jaro/jaro_winkler kernel call; only the greedy matching (a few
    tokens per row) runs in Python, with a sequential sum fold so the score
    is bit-reproducible against an independent scalar implementation.
    """
    kern = {"jaro": batch_jaro, "jaro_winkler": batch_jaro_winkler}[inner]
    n = len(l_tok_lists)
    out = np.empty(n, dtype=np.float64)
    flat_l: list = []
    flat_r: list = []
    spans = []
    for i in range(n):
        lt = l_tok_lists[i] or []
        rt = r_tok_lists[i] or []
        if not lt and not rt:
            out[i] = 1.0
        elif not lt or not rt:
            out[i] = 0.0
        else:
            spans.append((i, len(lt), len(rt)))
            for a in lt:
                flat_l.extend([a] * len(rt))
                flat_r.extend(rt)
    if not spans:
        return out
    sims = kern(flat_l, flat_r)
    pos = 0
    for i, nl, nr in spans:
        block = sims[pos : pos + nl * nr].reshape(nl, nr)
        pos += nl * nr
        cand = np.argwhere(block >= threshold)
        # descending by score with ties in row-major (left-token) insertion
        # order — py_stringmatching's stable `sorted(..., reverse=True)`;
        # reversing an ascending stable sort would flip tie order and change
        # which token pair a tied score greedily claims
        order = np.argsort(
            -block[cand[:, 0], cand[:, 1]], kind="stable"
        ) if len(cand) else []
        used_l = np.zeros(nl, dtype=bool)
        used_r = np.zeros(nr, dtype=bool)
        acc = 0.0
        matched = 0
        for j in order:
            a, b = cand[j]
            if not used_l[a] and not used_r[b]:
                used_l[a] = True
                used_r[b] = True
                acc += float(block[a, b])
                matched += 1
        out[i] = acc / float(nl + nr - matched)
    return out
