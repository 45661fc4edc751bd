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

Remote-device discipline: every chunk boundary is exactly THREE device
calls — one jitted iterate, one jitted gather-or-scatter, one fetch of
the (it, done) vectors. The first version of this driver did the
gather/scatter with eager per-leaf ops (~19 dispatches each) and was
latency-murdered over the remote-TPU tunnel (7 solves/s vs the
monolithic while_loop's 168).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


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

    # Single-dispatch helpers (jit caches per bucket-size shape):
    #   iterate a bucket AND report its (it, done) in the same call,
    #   gather a bucket out of the master carry + problem data,
    #   scatter a bucket back into the master carry.
    @functools.partial(jax.jit, **kw)
    def viter_probe(st, data, cap):
        st = jax.vmap(solve.iterate, in_axes=(0, 0, None))(st, data, cap)
        return st, st.it, st.done

    @functools.partial(jax.jit, **kw)
    def vgather(master, data_all, idx):
        return (jax.tree.map(lambda a: a[idx], master),
                jax.tree.map(lambda a: a[idx], data_all))

    @functools.partial(jax.jit, **kw)
    def vscatter(master, cur, idx):
        return jax.tree.map(lambda m, c: m.at[idx].set(c), master, cur)

    B = int(np.asarray(jax.tree.leaves(z0_b)[0]).shape[0])
    master = vinit(data_b, z0_b)
    if max_iters is None:
        max_iters = 10 ** 9  # solver's opt.max_iters clamps internally

    stats = {"dispatched_lane_iters": 0, "calls": 0}
    idx = np.arange(B)          # master indices of the current bucket
    cur_st, cur_data = master, data_b
    size = B
    cap = 0
    it_before = np.zeros(B, np.int32)
    while True:
        at_tail = size <= min_bucket
        cap = max_iters if at_tail else cap + chunk
        cur_st, it_d, done_d = viter_probe(cur_st, cur_data, cap)
        # ONE host round trip per chunk: the iteration counters + done
        # flags of the bucket (a few KB)
        it_after, done = jax.device_get((it_d, done_d))
        trip = int(np.max(it_after - it_before[: len(it_after)]))
        stats["dispatched_lane_iters"] += size * trip
        stats["calls"] += 1
        master = vscatter(master, cur_st, jnp.asarray(idx))
        done = done | (it_after >= max_iters)
        if done.all() or at_tail:
            break
        rem = idx[~done]
        # next bucket: smallest allowed size that fits the active set
        while size > min_bucket and size // shrink >= len(rem):
            size //= shrink
        pad = np.resize(rem, size)   # cycle the active lanes as padding
        # padded lanes are duplicates of real lanes — identical values,
        # scatter order irrelevant
        cur_st, cur_data = vgather(master, data_b, jnp.asarray(pad))
        remap = {m: i for i, m in enumerate(idx)}
        it_before = np.asarray([it_after[remap[m]] if m in remap else 0
                                for m in pad], np.int32)
        idx = pad

    res = vfin(master, data_b)
    stats["lane_iters"] = int(np.asarray(res.iters).sum())
    return res, stats
