"""Stage-level kernel profile at bench shapes (run on the TPU).

Times gather / merge / finish variants separately so optimization effort goes
where the milliseconds are. Each number includes the ~35 ms axon dispatch
floor once.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NUM_DOCS = int(os.environ.get("P_NUM_DOCS", 1_000_000))
BATCH = int(os.environ.get("P_BATCH", 32))
K = int(os.environ.get("P_TOPK", 100))
ITERS = int(os.environ.get("P_ITERS", 5))


def t(run, label):
    run()  # compile
    run()
    best = min(
        (lambda s: (run(), time.perf_counter() - s)[1])(time.perf_counter())
        for _ in range(ITERS)
    )
    print(f"{label:44s} {best*1e3:9.1f} ms", file=sys.stderr)
    return best


def main():
    from nrtsearch_tpu.models.flagship import SyntheticCorpus
    from nrtsearch_tpu.ops import merge_scoring as ms
    from nrtsearch_tpu.ops.pallas_merge import gather_runs_pallas

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"device: {dev}", file=sys.stderr)
    corpus = SyntheticCorpus(NUM_DOCS, 100_000, 48, seed=42)
    model = corpus.to_model()
    # stage profile uses the FULL-width (unpruned) program shapes
    b = model.compile_queries(corpus.sample_queries(BATCH, 4))
    print(f"run_len={b.run_len} "
          f"R={b.term_offsets.shape[1]} width={b.run_len*b.term_offsets.shape[1]}",
          file=sys.stderr)
    offs = jnp.asarray(b.term_offsets)
    lens = jnp.asarray(b.term_lengths)
    w = jnp.asarray(b.term_weights)
    nt = jnp.asarray(b.n_terms)
    rl = b.run_len

    if not on_tpu:
        raise SystemExit("profile requires TPU")

    # -- gather (device arrays passed as ARGS: closed-over arrays become
    # compile-time constants that the remote compile service rejects) -------
    @jax.jit
    def do_gather(post_docs, post_impacts, offs, lens, w):
        return gather_runs_pallas(post_docs, post_impacts, offs, lens, w, rl)

    R = offs.shape[1]
    t(lambda: np.asarray(
        do_gather(model.doc_ids, model.impacts, offs, lens, w)[0][0, 0, 0]
    ), "gather")
    docs0, contribs0 = do_gather(model.doc_ids, model.impacts, offs, lens, w)

    # -- merge ----------------------------------------------------------------
    @jax.jit
    def do_merge(d, c):
        return ms.merge_sorted_runs(d, c, use_pallas=True)

    from nrtsearch_tpu.ops.pallas_merge import (
        finish_mask_pallas, gather_runs_pallas as _gp, merge_sorted_runs_alt)

    @jax.jit
    def do_gather_alt(post_docs, post_impacts, offs, lens, w):
        return _gp(post_docs, post_impacts, offs, lens, w, rl, alternating=True)

    @jax.jit
    def do_merge_alt(d, c):
        return merge_sorted_runs_alt(d, c)

    t(lambda: np.asarray(
        do_gather_alt(model.doc_ids, model.impacts, offs, lens, w)[0][0, 0, 0]
    ), "gather (alternating)")
    docs_a, contribs_a = do_gather_alt(model.doc_ids, model.impacts, offs, lens, w)
    t(lambda: np.asarray(do_merge_alt(docs_a, contribs_a)[0][0, 0]),
      "merge (alternating, pair-fused)")
    docs_m2, contribs_m2 = do_merge_alt(docs_a, contribs_a)

    @jax.jit
    def do_finish_pallas(d, c):
        masked = finish_mask_pallas(d, c, nt, max_seg=R, require_all=False)
        ts_, pos = ms._hierarchical_topk(masked, K)
        hits = (masked > -np.inf).sum(axis=-1)
        return ts_, pos, hits

    t(lambda: np.asarray(do_finish_pallas(docs_m2, contribs_m2)[0][0, 0]),
      "finish: pallas mask + hier topk")

    t(lambda: np.asarray(do_merge(docs0, contribs0)[0][0, 0]), "merge (bitonic pallas)")
    docs_m, contribs_m = do_merge(docs0, contribs0)

    # -- finish variants --------------------------------------------------------

    @jax.jit
    def fin_scan(d, c):
        return ms._finish(d, c, nt, K, False, max_seg=R)

    @jax.jit
    def fin_scan_counts(d, c):
        return ms._finish(d, c, nt, K, True, max_seg=R)

    @jax.jit
    def fin_cumsum(d, c):
        return ms._finish(d, c, nt, K, False, max_seg=0)

    t(lambda: np.asarray(fin_scan(docs_m, contribs_m)[0][0, 0]),
      "finish: bounded scan, no counts")
    t(lambda: np.asarray(fin_scan_counts(docs_m, contribs_m)[0][0, 0]),
      "finish: bounded scan + counts")
    t(lambda: np.asarray(fin_cumsum(docs_m, contribs_m)[0][0, 0]),
      "finish: cumsum")

    # -- top_k alone -------------------------------------------------------------
    masked = jnp.where(docs_m != ms.DOC_SENTINEL, contribs_m, -jnp.inf)

    @jax.jit
    def tk(m):
        return jax.lax.top_k(m, K)

    t(lambda: np.asarray(tk(masked)[0][0, 0]), "lax.top_k [B, width]")

    # two-stage top-k: per-chunk then global
    C = 16384
    N = masked.shape[-1]
    if N % C == 0:
        @jax.jit
        def tk2(m):
            mc = m.reshape(BATCH, N // C, C)
            s1, i1 = jax.lax.top_k(mc, K)
            flat = s1.reshape(BATCH, -1)
            s2, i2 = jax.lax.top_k(flat, K)
            return s2, i2

        t(lambda: np.asarray(tk2(masked)[0][0, 0]), f"two-stage top_k (C={C})")

    # full fused step for reference (already jitted with arrays as args)
    t(lambda: np.asarray(ms.merge_score_topk(
        model.doc_ids, model.impacts, offs, lens, w, nt,
        run_len=rl, k=K, use_pallas=True,
    )[0][0, 0]), "FULL fused step")


if __name__ == "__main__":
    main()
