"""Batched solve driver with iteration chunking + lane compaction.

A vmapped ``while_loop`` convoys: every lane pays the batch-maximum trip
count (bench measured median 19 / p90 37 / max 73 iterations on the
free-time OBCA batch — so >70% of the device time iterated already-
converged lanes). This driver runs the solver's chunked API
(:class:`..solver.ipm.IPMState`) in fixed-size iteration chunks and
*compacts* the unconverged lanes into smaller padded buckets between
chunks:

    init (B) -> iterate chunk (B) -> gather unconverged (B/4)
             -> iterate chunk     -> gather (B/16) -> run to completion
             -> scatter all carries back -> finalize (B)

Each distinct bucket size is one extra XLA compile (it_cap is traced, so
chunk boundaries don't recompile). The reference has no analogue — its
IPOPT solves are serial (src/obca.py:1052-1056); this is the TPU-native
equivalent of "every solve costs only its own iterations".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gather(tree, idx):
    return jax.tree.map(lambda a: a[idx], tree)


def solve_compacted(solve, data_b, z0_b, *, chunk=16, min_bucket=16,
                    shrink=4, max_iters=None, device=None):
    """Solve a batch with chunked iteration + lane compaction.

    Args:
      solve: a ``make_obca_solver`` product (carries .init/.iterate/
        .finalize attributes).
      data_b, z0_b: problem/initializer pytrees with leading batch dim B.
      chunk: iterations per chunk (all lanes in a bucket share it_cap).
      min_bucket: once the active set fits here, run to completion.
      shrink: bucket size divisor between compactions (buckets are
        B, B/shrink, B/shrink^2, ... — each size is one extra compile).
      max_iters: total iteration bound (defaults to the solver options').
    Returns:
      (IPMResult batch, stats dict) — stats has 'lane_iters' (per-lane
      executed iterations), 'dispatched_lane_iters' (bucket_size x trip
      summed over calls — the number the FLOP accounting must scale by),
      and 'calls'.
    """
    kw = {"device": device} if device is not None else {}
    vinit = jax.jit(jax.vmap(solve.init), **kw)
    vfin = jax.jit(jax.vmap(solve.finalize), **kw)
    viter = jax.jit(jax.vmap(solve.iterate, in_axes=(0, 0, None)), **kw)

    B = int(np.asarray(jax.tree.leaves(z0_b)[0]).shape[0])
    master = vinit(data_b, z0_b)
    if max_iters is None:
        max_iters = 10 ** 9  # solver's opt.max_iters clamps internally

    stats = {"dispatched_lane_iters": 0, "calls": 0}
    idx = np.arange(B)          # master indices of the current bucket
    cur_st, cur_data = master, data_b
    size = B
    cap = 0
    while True:
        at_tail = size <= min_bucket
        cap = max_iters if at_tail else cap + chunk
        it_before = np.asarray(cur_st.it)
        cur_st = viter(cur_st, cur_data, cap)
        it_after = np.asarray(cur_st.it)
        trip = int(np.max(it_after - it_before))
        stats["dispatched_lane_iters"] += size * trip
        stats["calls"] += 1
        # scatter the bucket back into the master carry (padded lanes are
        # duplicates of real lanes — identical values, order irrelevant)
        jidx = jnp.asarray(idx)
        master = jax.tree.map(
            lambda m, c: m.at[jidx].set(c), master, cur_st)
        done = np.asarray(cur_st.done) | (it_after >= max_iters)
        if done.all() or at_tail:
            break
        rem = idx[~done]
        # next bucket: smallest allowed size that fits the active set
        while size > min_bucket and size // shrink >= len(rem):
            size //= shrink
        pad = np.resize(rem, size)   # cycle the active lanes as padding
        cur_st = _gather(master, pad)
        cur_data = _gather(data_b, pad)
        idx = pad

    stats["lane_iters"] = int(np.asarray(master.it).sum())
    return vfin(master, data_b), stats
