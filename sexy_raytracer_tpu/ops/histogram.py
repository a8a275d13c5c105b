"""Dense weighted histogram (segment-sum into a dense table) on TPU.

The backward pass of every texture/table gather is

    dTable[i, c] = sum over rays r with idx[r] == i of g[r, c]

— a scatter-add. XLA's TPU scatter is row-serial (~13.6 ms for 131k rows
into a 524k-row table, measured device-side through the axon tunnel).

Two scatter-free implementations live here:

* ``dense_histogram`` (default, ``_dense_histogram_direct``) — ONE Pallas
  kernel plus a tiny XLA prologue. Entries are cut into ``CH``-entry
  chunks; the prologue computes, per 2048-bin output window, the compacted
  list of chunks holding any index in that window (the same
  worklist-by-scalar-prefetch structure as the clustered find kernel,
  ops/pallas_find.py). The kernel then runs grid-per-window: for each
  active chunk it builds a [WIN/kpack, CH] one-hot over the high part of
  the local bin index, packs (low part x channel) onto 128 lanes, and
  accumulates the window with one MXU matmul. Duplicate indices simply
  accumulate. Work scales with *actual (chunk, window) locality* — ~4.2k
  pairs (~35 G MAC) for the whole 4-bounce flagship backward, measured on
  real render indices — instead of the fixed ~6 dispatched XLA stages of
  the sort-based path, each of which pays multi-ms launch overhead on
  this backend (tools/profile_histogram.py: the sort pipeline's stages
  alone are 4-9 ms each; the full sorted histogram is ~13 ms/call).
  All-zero gradient rows (dead ray lanes — most of the wavefront after
  bounce 1) are routed to an out-of-range sentinel so they cost nothing.

* ``dense_histogram_sorted`` — the round-3 sort + cumsum + segment-sum
  pipeline, kept as an A/B reference and adversarial-distribution
  fallback (its cost is distribution-independent).

Used by ops/lookup.py for the shading-atlas and packed-row-table VJPs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 2048  # dense output bins per placement window
CH = 512    # baseline entries per worklist chunk (direct path)
# SMEM budget for the scalar-prefetched worklist [nw, nch+1] i32: v5e SMEM
# is 1 MiB and Mosaic rejects larger prefetch operands (measured: a
# 524k-entry call with CH=512 built a 1.18 MB worklist and failed to
# compile). CH doubles until the worklist fits.
WORKLIST_BYTES_MAX = 320 * 1024


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _place_kernel(win, cpad, tex_ref, seg_ref, out_ref):
    """Grid (NW,). Places one WIN-wide output window.

    Entry-on-lanes layout throughout (no padded minor dims):
    tex_ref [1, 1, win] int32 (global bin ids; out-of-window entries ok),
    seg_ref [1, cpad, win] f32 (channels on sublanes),
    out_ref [win // kpack, 128] f32 where column l*cpad+c holds bin
    ``row*kpack + l`` channel ``c``.
    """
    w = pl.program_id(0)
    kpack = 128 // cpad
    n_hi = win // kpack

    local = tex_ref[0] - w * win                        # [1, win] int32
    in_win = (local >= 0) & (local < win)
    hi = jnp.where(in_win, local // kpack, -1)          # OOR -> no one-hot hit
    lo = jnp.where(in_win, local % kpack, kpack)

    # one-hot over the high part: [n_hi(sublanes), win entries(lanes)]
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (n_hi, win), 0)
    oh = (hi == hi_iota).astype(jnp.float32)

    # pack (low part, channel) onto sublanes: vT[l*cpad + c, e] = seg[c, e]
    seg_t = seg_ref[0]                                  # [cpad, win]
    parts = [jnp.where(lo == l, seg_t, 0.0) for l in range(kpack)]
    v_t = jnp.concatenate(parts, axis=0)                # [128, win]

    # HIGHEST precision: the MXU's default single bf16 pass rounds the
    # f32 values (integer counts above 2^8 come back wrong); the one-hot
    # matrix is exact either way but the values need full f32.
    out_ref[...] = jax.lax.dot_general(
        oh, v_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                   # [n_hi, 128]


def dense_histogram(idx, vals, n_bins: int):
    """sum_{r: idx[r]==i} vals[r] -> [n_bins, C] float32, scatter-free.

    ``idx``: [R] int32 (out-of-range entries are dropped);
    ``vals``: [R, C] float32. Rows whose value vector is entirely zero are
    dropped too (they contribute nothing; routing them to the sentinel
    keeps dead ray lanes out of the worklist).
    """
    with jax.named_scope("dense_histogram"):
        return _dense_histogram_direct(idx, vals, n_bins)


def dense_histogram_sorted(idx, vals, n_bins: int):
    """Sort-based histogram (round-3 path); kept for A/B comparison."""
    with jax.named_scope("dense_histogram_sorted"):
        return _dense_histogram(idx, vals, n_bins)


def _cpad_for(C: int) -> int:
    cpad = 1
    while cpad < C or 128 % cpad:
        cpad *= 2
    assert cpad <= 128
    return cpad


def _direct_kernel(win, cpad, ch, lists_ref, idx_ref, val_ref, out_ref):
    """Grid (NW,). Accumulates one WIN-wide output window from its active
    chunks (scalar-prefetched worklist, like the find kernel's cluster
    lists).

    idx_ref [NCH, 1, CH] int32 global bin ids (sentinel >= NW*WIN drops),
    val_ref [NCH, cpad, CH] f32 (channels on sublanes),
    out_ref [win // kpack, 128] f32: column l*cpad+c holds bin
    ``row*kpack + l`` channel ``c``.
    """
    w = pl.program_id(0)
    kpack = 128 // cpad
    n_hi = win // kpack
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (n_hi, ch), 0)

    def body(k, acc):
        c = lists_ref[w, 1 + k]
        local = idx_ref[c] - w * win                   # [1, CH]
        in_win = (local >= 0) & (local < win)
        hi = jnp.where(in_win, local // kpack, -1)     # -1 -> no one-hot hit
        lo = jnp.where(in_win, local % kpack, kpack)
        oh = (hi == hi_iota).astype(jnp.float32)       # [n_hi, CH]
        seg = val_ref[c]                               # [cpad, CH]
        parts = [jnp.where(lo == l, seg, 0.0) for l in range(kpack)]
        v_t = jnp.concatenate(parts, axis=0)           # [128, CH]
        # HIGHEST: full-f32 products (Mosaic supports only DEFAULT and
        # HIGHEST; a single bf16 pass would round every gradient value to
        # 8 mantissa bits). The one-hot side is exact either way.
        return acc + jax.lax.dot_general(
            oh, v_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    out_ref[...] = jax.lax.fori_loop(
        0, lists_ref[w, 0], body, jnp.zeros((n_hi, 128), jnp.float32)
    )


def _dense_histogram_direct(idx, vals, n_bins: int):
    R = idx.shape[0]
    C = vals.shape[1]
    cpad = _cpad_for(C)

    # The kernel keeps idx + vals VMEM-resident across the window grid;
    # past ~8 MiB of values, split the entry stream and sum the partial
    # histograms (a 524k-entry C=16 call would otherwise need 33 MiB).
    r_max = (8 << 20) // (4 * cpad)
    if R > r_max:
        k = -(-R // r_max)
        part = -(-R // k)
        out = None
        for i in range(k):
            piece = _dense_histogram_direct(
                idx[i * part:(i + 1) * part],
                vals[i * part:(i + 1) * part],
                n_bins,
            )
            out = piece if out is None else out + piece
        return out
    kpack = 128 // cpad
    n_hi = WIN // kpack
    nw = -(-n_bins // WIN)
    sent = nw * WIN  # in no window: local == WIN fails in_win everywhere

    live = jnp.any(vals != 0.0, axis=1)
    idx = jnp.where(live & (idx >= 0) & (idx < n_bins), idx, sent)
    vals = vals.astype(jnp.float32)

    ch = CH
    while nw * (-(-R // ch) + 1) * 4 > WORKLIST_BYTES_MAX:
        ch *= 2
    nch = -(-R // ch)
    rpad = nch * ch
    if rpad != R:
        idx = jnp.concatenate([idx, jnp.full((rpad - R,), sent, jnp.int32)])
        vals = jnp.concatenate([vals, jnp.zeros((rpad - R, C), jnp.float32)])
    if cpad != C:
        vals = jnp.pad(vals, ((0, 0), (0, cpad - C)))

    idx_r = idx.reshape(nch, 1, ch)
    vals_t = vals.reshape(nch, ch, cpad).transpose(0, 2, 1)  # [NCH, cpad, CH]

    # worklist: per window, ascending ids of the chunks that touch it.
    # Per-chunk window BITMASK via OR-reductions in vector layout: the
    # old widx == arange(nw) compare materialized a [nch, ch, nw] boolean
    # (~100 MB at the 786k-bin shade-atlas backward, ADVICE r4), and the
    # scatter-max replacement ran row-serially in scalar space (1.1 ms
    # per call x 4 bounces, round-5 diag). n_words OR-reduces over the
    # entry axis build [nch, ceil(nw/32)] masks with zero scatters.
    widx = idx.reshape(nch, ch) // WIN                       # sent//WIN == nw
    n_words = -(-(nw + 1) // 32)
    wword = widx // 32
    val1 = jnp.int32(1) << (widx % 32)                       # [nch, ch]
    bits = jnp.stack(
        [
            jax.lax.reduce(
                jnp.where(wword == w, val1, 0),
                jnp.int32(0), jax.lax.bitwise_or, [1],
            )
            for w in range(n_words)
        ],
        axis=1,
    )                                                        # [nch, n_words]
    warange = jnp.arange(nw, dtype=jnp.int32)
    touch = (
        (jnp.take(bits, warange // 32, axis=1) >> (warange % 32)[None, :])
        & 1
    ) > 0                                                    # [nch, nw]
    count = jnp.sum(touch, axis=0, dtype=jnp.int32)          # [nw]
    # compact ascending active-chunk ids per window via running-count +
    # one scatter — the old jnp.sort of the [nw, nch] key matrix was the
    # single most expensive backward op on the axon backend (1.1 ms per
    # call x 4 bounces, round-5 diag); cumsum preserves the ascending
    # (deterministic) order the kernel's f32 accumulation relies on
    tT = touch.T                                             # [nw, nch]
    pos = jnp.cumsum(tT.astype(jnp.int32), axis=1) - 1       # [nw, nch]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (nw, nch), 0)
    ids = jax.lax.broadcasted_iota(jnp.int32, (nw, nch), 1)
    flat_dst = jnp.where(tT, row_i * nch + pos, nw * nch)    # drop inactive
    body = (
        jnp.zeros((nw * nch,), jnp.int32)
        .at[flat_dst.reshape(-1)].set(ids.reshape(-1), mode="drop")
        .reshape(nw, nch)
    )
    lists = jnp.concatenate([count[:, None], body], axis=1)  # [nw, nch+1]

    out = pl.pallas_call(
        functools.partial(_direct_kernel, WIN, cpad, ch),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nw,),
            in_specs=[
                pl.BlockSpec((nch, 1, ch), lambda w, s: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nch, cpad, ch), lambda w, s: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_hi, 128), lambda w, s: (w, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nw * n_hi, 128), jnp.float32),
        interpret=_interpret(),
    )(lists, idx_r, vals_t)

    return out.reshape(nw * WIN, cpad)[:n_bins, :C]


def _dense_histogram(idx, vals, n_bins: int):
    R = idx.shape[0]
    C = vals.shape[1]
    cpad = 1
    while cpad < C or 128 % cpad:
        cpad *= 2
    assert cpad <= 128
    kpack = 128 // cpad

    nw = -(-n_bins // WIN)
    n_pad = nw * WIN

    # Always pad at least one sentinel row (idx = n_pad): the compacted
    # stream then ends in a never-placed sentinel, so the overflow clamp in
    # `take` below can never alias a real in-window bin. Without it, an
    # all-unique idx stream with R a multiple of 8 and >= WIN made
    # tex_u[rpad-1] a real bin and overcounted it WIN-fold.
    rpad = max(-(-(R + 1) // 8) * 8, WIN)
    if rpad != R:
        idx = jnp.concatenate([idx, jnp.full((rpad - R,), n_pad, jnp.int32)])
        vals = jnp.concatenate([vals, jnp.zeros((rpad - R, C), vals.dtype)])
    # clamp out-of-range to the sentinel bin n_pad (sorts last, never placed)
    idx = jnp.where((idx >= 0) & (idx < n_bins), idx, n_pad)

    # 1. sort by idx
    perm = jnp.arange(rpad, dtype=jnp.int32)
    sk, sperm = jax.lax.sort([idx, perm], num_keys=1)
    sv = vals[sperm].astype(jnp.float32)

    # 2. cumsum; segment sums = S[end] - S[previous end]
    S = jnp.cumsum(sv, axis=0)
    is_end = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones((1,), bool)])

    # 3. compact (unique idx, cumsum-at-end) pairs to the front; ranks are
    # nondecreasing in idx, so the compacted stream is idx-sorted too
    rank = jnp.cumsum(
        jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    ) - 1
    ckey = jnp.where(is_end, rank.astype(jnp.int32), rpad)
    _, cperm = jax.lax.sort([ckey, perm], num_keys=1)
    valid = ckey[cperm] < rpad
    tex_u = jnp.where(valid, sk[cperm], n_pad)          # [rpad]
    S_u = S[cperm]
    seg = S_u - jnp.concatenate([jnp.zeros((1, C)), S_u[:-1]], axis=0)

    # 4. regular [NW, WIN] window-entry layout via one gather
    bounds = jnp.arange(nw, dtype=jnp.int32) * WIN
    starts = jnp.searchsorted(tex_u, bounds, side="left").astype(jnp.int32)
    take = jnp.minimum(
        starts[:, None] + jnp.arange(WIN, dtype=jnp.int32)[None, :],
        rpad - 1,
    )                                                   # [NW, WIN]
    flat = take.reshape(-1)
    win_tex = tex_u[flat].reshape(nw, 1, WIN)
    win_seg = seg[flat]                                 # [NW*WIN, C]
    if cpad != C:
        win_seg = jnp.pad(win_seg, ((0, 0), (0, cpad - C)))
    win_seg = win_seg.reshape(nw, WIN, cpad).transpose(0, 2, 1)

    out = pl.pallas_call(
        functools.partial(_place_kernel, WIN, cpad),
        grid=(nw,),
        in_specs=[
            pl.BlockSpec((1, 1, WIN), lambda w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cpad, WIN), lambda w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((WIN // kpack, 128), lambda w: (w, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw * (WIN // kpack), 128), jnp.float32),
        interpret=_interpret(),
    )(win_tex, win_seg)

    # [nw * win/kpack, kpack * cpad] -> [n_pad, cpad] -> [n_bins, C]
    out = out.reshape(n_pad, cpad)
    return out[:n_bins, :C]
