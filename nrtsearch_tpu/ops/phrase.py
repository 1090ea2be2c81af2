"""Device-side phrase verification: vectorized position matching.

Replaces the per-candidate host Python loop (the round-2 `query/eval.py`
phrase stage, the largest remaining "CPU engine wearing a TPU costume"
area) with one statically-shaped XLA program over ALL candidates at once:

  1. **Entry lookup**: for every (candidate doc, phrase term) pair, a
     vectorized binary search over the term's doc-sorted postings run
     (log2(df) rounds of gathers) finds the postings entry index.
  2. **Window gather**: each entry's position list (CSR over postings
     entries, device-resident) is gathered into a fixed [C, T, L] window
     (L = pow2 of the max per-entry position count among the query's
     terms, so no positions are ever truncated — exactness holds).
  3. **Alignment check**: for every base position p of the first term,
     membership of p + offset_t in term t's (sorted) window is resolved
     with an in-register binary search over the L lanes. Exact phrases
     require all terms aligned; sloppy phrases accumulate the per-term
     nearest-position displacement and compare against the slop budget
     (the same greedy nearest-position approximation of Lucene's sloppy
     freq as the host path, so device and host agree bit-for-bit).
  4. **Scoring**: phrase freq -> BM25 tf norm * summed idf, scattered to
     dense [D] score/match arrays on device.

Phrase-prefix queries (reference query/MatchPhrasePrefixQuery.java ->
Lucene MultiPhrasePrefixQuery) ride the same kernel: the expansion set of
the last term is a second window group whose membership is OR-reduced
(min-displacement for sloppy) across expansions.

Reference parity: Lucene PhraseQuery / exact+sloppy scoring consumed via
QueryNodeMapper (server/query/QueryNodeMapper.java:171-204).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

INT_MAX = np.int32(2**31 - 1)


def _pow2(n: int, minimum: int = 1) -> int:
    b = minimum
    while b < n:
        b <<= 1
    return b


def _search_entries(post_docs, off, ln, cand, steps: int):
    """Vectorized binary search of ``cand`` [C] in one postings run.
    Returns (entry_pos [C], found [C])."""
    C = cand.shape[0]
    lo = jnp.zeros((C,), jnp.int32)
    hi = jnp.maximum(ln, 0) * jnp.ones((C,), jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        v = post_docs[off + jnp.minimum(mid, jnp.maximum(ln - 1, 0))]
        go_hi = v < cand
        return (jnp.where(go_hi, mid + 1, lo), jnp.where(go_hi, hi, mid))

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    pos = jnp.minimum(lo, jnp.maximum(ln - 1, 0))
    found = (lo < ln) & (post_docs[off + pos] == cand)
    return pos, found


def _gather_window(pos_flat, pos_offs, entry, found, L: int):
    """[C] entries -> sorted position windows [C, L] (INT_MAX padded) and
    their valid lengths [C]."""
    start = pos_offs[entry]
    w_len = jnp.where(found, pos_offs[entry + 1] - start, 0)
    iota = jnp.arange(L, dtype=jnp.int32)
    idx = jnp.clip(start[:, None] + iota[None, :], 0, pos_flat.shape[0] - 1)
    w = pos_flat[idx]
    valid = iota[None, :] < w_len[:, None]
    return jnp.where(valid, w, INT_MAX), w_len


def _window_lookup(w, want):
    """For sorted windows ``w`` [C, L] (INT_MAX padded) and targets ``want``
    [C, L]: binary search -> (value at insertion point, value before it).
    Vectorized over all C x L lanes; log2(L) take_along_axis rounds."""
    C, L = w.shape
    lo = jnp.zeros_like(want)
    hi = jnp.full_like(want, L)
    for _ in range(max(int(L).bit_length(), 1)):
        # guard converged lanes: an unguarded extra round at lo == hi == L
        # would gather out of bounds (fill mode) and run lo past L
        active = lo < hi
        mid = (lo + hi) // 2
        v = jnp.take_along_axis(w, jnp.minimum(mid, L - 1), axis=1)
        go_hi = active & (v < want)
        lo = jnp.where(go_hi, mid + 1, lo)
        hi = jnp.where(active & ~go_hi, mid, hi)
    at = jnp.take_along_axis(w, jnp.minimum(lo, L - 1), axis=1)
    before = jnp.take_along_axis(
        w, jnp.clip(lo - 1, 0, L - 1), axis=1
    )
    at = jnp.where(lo < L, at, INT_MAX)
    before = jnp.where(lo > 0, before, INT_MAX)
    return at, before


@functools.partial(
    jax.jit, static_argnames=("slop", "steps", "win_steps")
)
def phrase_freqs(
    post_docs,     # i32 [P_pad] device doc-sorted postings (flat)
    pos_flat,      # i32 [PP_pad] device flat positions (CSR values)
    pos_offs,      # i32 [PE_pad] device CSR offsets per postings entry
    term_offs,     # i32 [T] postings-run starts (fixed phrase terms, in order)
    term_lens,     # i32 [T] run lengths
    req_offs,      # i32 [T] required relative positions
    exp_offs,      # i32 [E] expansion runs (E=0 -> plain phrase)
    exp_lens,      # i32 [E]
    exp_req,       # i32 [] shared required offset of the expansion slot
    cand,          # i32 [C] candidate docs (INT_MAX padded)
    *,
    slop: int,
    steps: int,     # binary-search rounds over postings runs
    win_steps: int,  # L as a static: window length (pow2)
):
    """Phrase frequency per candidate doc, fully on device. Returns
    (freqs i32 [C]). Padded candidates (INT_MAX) return 0."""
    L = win_steps
    T = term_offs.shape[0]
    E = exp_offs.shape[0]

    def window_for(off, ln):
        pos, found = _search_entries(post_docs, off, ln, cand, steps)
        return _gather_window(pos_flat, pos_offs, off + pos, found, L)

    wins = [window_for(term_offs[t], term_lens[t]) for t in range(T)]
    base = jnp.where(
        wins[0][0] != INT_MAX, wins[0][0] - req_offs[0], INT_MAX
    )  # [C, L] candidate anchor positions
    base_valid = base != INT_MAX

    if slop == 0:
        ok = base_valid
        for t in range(1, T):
            want = jnp.where(base_valid, base + req_offs[t], INT_MAX - 1)
            at, _ = _window_lookup(wins[t][0], want)
            ok = ok & (at == want)
        if E:
            ewins = [window_for(exp_offs[e], exp_lens[e]) for e in range(E)]
            want = jnp.where(base_valid, base + exp_req, INT_MAX - 1)
            any_m = jnp.zeros_like(base_valid)
            for e in range(E):
                at, _ = _window_lookup(ewins[e][0], want)
                any_m = any_m | (at == want)
            ok = ok & any_m
        return jnp.sum(ok, axis=1, dtype=jnp.int32)

    # sloppy: independent nearest-position displacement per non-base slot,
    # summed and compared against the slop budget (host parity)
    total = jnp.zeros(base.shape, jnp.float32)
    ok = base_valid
    for t in range(1, T):
        want = jnp.where(base_valid, base + req_offs[t], INT_MAX - 1)
        at, before = _window_lookup(wins[t][0], want)
        d = jnp.minimum(
            jnp.abs(at.astype(jnp.float32) - want.astype(jnp.float32)),
            jnp.abs(before.astype(jnp.float32) - want.astype(jnp.float32)),
        )
        has = (at != INT_MAX) | (before != INT_MAX)
        total = total + jnp.where(has, d, jnp.inf)
        ok = ok & has
    if E:
        ewins = [window_for(exp_offs[e], exp_lens[e]) for e in range(E)]
        want = jnp.where(base_valid, base + exp_req, INT_MAX - 1)
        best = jnp.full(base.shape, jnp.inf)
        for e in range(E):
            at, before = _window_lookup(ewins[e][0], want)
            d = jnp.minimum(
                jnp.abs(at.astype(jnp.float32) - want.astype(jnp.float32)),
                jnp.abs(before.astype(jnp.float32) - want.astype(jnp.float32)),
            )
            has = (at != INT_MAX) | (before != INT_MAX)
            best = jnp.minimum(best, jnp.where(has, d, jnp.inf))
        total = total + best
        ok = ok & jnp.isfinite(best)
    ok = ok & (total <= slop)
    return jnp.sum(ok, axis=1, dtype=jnp.int32)


@jax.jit
def phrase_scatter(
    freqs,        # i32 [C]
    cand,         # i32 [C] (INT_MAX padded)
    doc_lens,     # f32 [D_pad]
    sum_idf,      # f32 []
    boost,        # f32 []
    k1,           # f32 []
    b,            # f32 []
    avgdl,        # f32 []
):
    """Phrase-freq BM25 scoring + scatter to dense [D] (scores, match)."""
    D = doc_lens.shape[0]
    real = (cand < D) & (freqs > 0)
    safe = jnp.where(real, cand, 0)
    f = freqs.astype(jnp.float32)
    dl = doc_lens[safe]
    tf_norm = f / (f + k1 * (1.0 - b + b * dl / avgdl))
    val = jnp.where(real, boost * sum_idf * tf_norm, 0.0)
    scores = jnp.zeros(D, jnp.float32).at[safe].add(val)
    match = jnp.zeros(D, bool).at[safe].max(real)
    return scores, match


# ---------------------------------------------------------------------------
# Host-side driver: device-position cache + padding/bucketing
# ---------------------------------------------------------------------------


def device_positions(tfi):
    """Lazily upload a TextFieldIndex's position CSR to device (cached on
    the tfi instance). Returns (pos_flat_dev, pos_offs_dev, entry_lens_host)
    or None when the field indexed no positions."""
    if tfi.positions is None or tfi.position_offsets is None:
        return None
    cached = getattr(tfi, "_device_pos", None)
    if cached is not None:
        return cached
    import jax

    pp = _pow2(max(len(tfi.positions), 1))
    flat = np.full(pp, INT_MAX, np.int32)
    flat[: len(tfi.positions)] = tfi.positions
    pe = _pow2(len(tfi.position_offsets))
    offs = np.zeros(pe, np.int32)
    offs[: len(tfi.position_offsets)] = tfi.position_offsets
    entry_lens = np.diff(tfi.position_offsets).astype(np.int32)
    out = (jax.device_put(flat), jax.device_put(offs), entry_lens)
    object.__setattr__(tfi, "_device_pos", out)
    return out


def max_positions(tfi, entry_lens: np.ndarray, terms) -> int:
    """Max per-entry position count over the given terms (window size L)."""
    m = 1
    for t in terms:
        tid = tfi.terms.get(t)
        if tid is None:
            continue
        off, ln = int(tfi.offsets[tid]), int(tfi.lengths[tid])
        if ln:
            m = max(m, int(entry_lens[off : off + ln].max()))
    return m


def run_phrase(
    tfi,
    cand_ids: np.ndarray,          # host int64/32 candidate doc ids
    terms: list,                   # fixed phrase terms, in order
    req_offsets: list,             # required relative positions (same len)
    slop: int,
    *,
    expansions: list = (),         # prefix-expanded last-slot terms
    exp_req: int = 0,
):
    """Device phrase-freq over candidates. Returns (freqs_dev [C_pad] i32,
    cand_pad [C_pad] i32 host) — INT_MAX-padded, aligned — or None when the
    device path cannot run (no positions, or no fixed anchor term)."""
    dev = device_positions(tfi)
    if dev is None or not terms:
        return None
    pos_flat, pos_offs, entry_lens = dev
    lk = [tfi.lookup(t) for t in terms]
    if any(ln == 0 for _, ln in lk):
        C = _pow2(len(cand_ids), minimum=128)
        cand = np.full(C, INT_MAX, np.int32)
        cand[: len(cand_ids)] = cand_ids
        return jnp.zeros(C, jnp.int32), cand
    elk = [tfi.lookup(t) for t in expansions]
    elk = [(o, ln) for o, ln in elk if ln]
    if expansions and not elk:
        # an expansion slot with no surviving expansions matches nothing
        C = _pow2(len(cand_ids), minimum=128)
        cand = np.full(C, INT_MAX, np.int32)
        cand[: len(cand_ids)] = cand_ids
        return jnp.zeros(C, jnp.int32), cand
    L = _pow2(
        max_positions(tfi, entry_lens, list(terms) + list(expansions)),
        minimum=8,
    )
    C = _pow2(len(cand_ids), minimum=128)
    cand = np.full(C, INT_MAX, np.int32)
    cand[: len(cand_ids)] = cand_ids
    max_df = max(
        [ln for _, ln in lk] + [ln for _, ln in elk] + [2]
    )
    steps = int(np.ceil(np.log2(max_df))) + 1
    freqs = phrase_freqs(
        tfi.doc_ids, pos_flat, pos_offs,
        jnp.asarray(np.asarray([o for o, _ in lk], np.int32)),
        jnp.asarray(np.asarray([ln for _, ln in lk], np.int32)),
        jnp.asarray(np.asarray(req_offsets, np.int32)),
        jnp.asarray(np.asarray([o for o, _ in elk], np.int32)),
        jnp.asarray(np.asarray([ln for _, ln in elk], np.int32)),
        jnp.asarray(np.int32(exp_req)),
        jnp.asarray(cand),
        slop=int(slop), steps=steps, win_steps=L,
    )
    return freqs, cand
