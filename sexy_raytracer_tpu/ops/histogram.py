"""Dense weighted histogram (segment-sum into a dense table) on TPU.

The backward pass of every texture/table gather is

    dTable[i, c] = sum over rays r with idx[r] == i of g[r, c]

— a scatter-add. XLA's TPU scatter is row-serial (~11 ms for 131k rows
into a 786k-row table, measured device-side), and the round-1 one-hot
matmul backward cost R x rows x W x C MACs (~12 ms). This module does it
in ~R log R + N work with no scatter at all:

1. sort (idx, g) by idx — XLA TPU sort is fast (~0.5 ms for 131k keys);
2. inclusive cumsum; per-segment sums = differences of the cumsum at
   consecutive segment ends;
3. compact the (unique idx, segment sum) pairs to the front with a second
   sort by rank — after which *at most WIN unique indices fall in any
   WIN-wide index window*, so each window's entries are a regular-size
   slice of the compacted stream;
4. gather those slices into a regular [NW, WIN] layout and let a Pallas
   kernel place each window: a [entries, WIN/KPACK] one-hot over the high
   part of the local index is built entirely in VMEM, the low part x
   channels are packed into 128 lanes, and the window is written with ONE
   MXU matmul (contraction = entries — the MXU-friendly shape). No HBM
   one-hot, no scatter.

Used by ops/lookup.py for the shading-atlas and texture-atlas VJPs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 2048  # dense output bins per placement window


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
    ``vals``: [R, C] float32.
    """
    with jax.named_scope("dense_histogram"):
        return _dense_histogram(idx, vals, n_bins)


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
